from .error import fast_error, reconstruction_error
from .gramians import gramian, gramians, hadamard_all, hadamard_but_one
from .khatri_rao import khatri_rao, khatri_rao_chain
from .mttkrp import (
    als_iteration_flops,
    mttkrp,
    mttkrp_batched,
    mttkrp_flops,
)
from .update import (
    padded_hadamard,
    update_factor_nnls,
    update_factor_unconstrained,
)
