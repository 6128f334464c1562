"""cp_cals_tpu — a TPU-native Concurrent-ALS framework for CP decomposition.

Brand-new JAX/XLA/Pallas implementation of the capabilities of CP-CALS
(HPAC reference at /root/reference): many CP decompositions of varying rank
fitted to one dense tensor simultaneously, jackknife resampling via the
masked-fiber trick, line-search extrapolation, NNLS constraints — re-designed
around rank-bucketed batched arrays sharded over a TPU device mesh instead of
column-packed CPU buffers.
"""

from .config import (
    AlsParams,
    CalsParams,
    LineSearchMethod,
    MttkrpMethod,
    UpdateMethod,
)
from .ktensor import (
    Ktensor,
    RandomKtensorSpec,
    denormalize,
    normalize_full,
    normalize_mode,
    random_ktensor,
    spec_to_ktensor,
    to_tensor,
)

__version__ = "0.1.0"
