#!/bin/bash
# Build the UNMODIFIED reference CP-CALS against scipy's bundled OpenBLAS
# (via shim.c) and the bench_ref baseline-measurement driver.
#
# The reference's own CMake (WITH_OPENBLAS) wants a system OpenBLAS install;
# this host only has netlib blas (slow, unfair to the baseline), so we
# compile the reference sources directly with the same flags CMake would use
# (-O3 -march=native -ffast-math -fopenmp, CMakeLists.txt:209-226) and link
# the scipy OpenBLAS 0.3.27 through forwarding shims.
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference
SCIPY_LIBS=/opt/venv/lib/python3.12/site-packages/scipy.libs
OPENBLAS=$(ls "$SCIPY_LIBS"/libscipy_openblas-*.so)
OUT=build
mkdir -p "$OUT"

CXXFLAGS=(-std=c++17 -O3 -march=native -ffast-math -fopenmp -DNDEBUG
  -DCALS_OPENBLAS=1 "-DSOURCE_DIR=\"$REF\"" -I. -I"$REF/include"
  -I"$REF/include/utils" -I"$REF/extern")

gcc -O2 -fPIC -c shim.c -o "$OUT/shim.o" -I.

SRCS=(
  "$REF/src/cals_blas.cpp"
  "$REF/src/tensor.cpp"
  "$REF/src/matrix.cpp"
  "$REF/src/ktensor.cpp"
  "$REF/src/multi_ktensor.cpp"
  "$REF/src/als.cpp"
  "$REF/src/cals.cpp"
  "$REF/src/utils/mttkrp.cpp"
  "$REF/src/utils/update.cpp"
  "$REF/src/utils/error.cpp"
  "$REF/src/utils/line_search.cpp"
  "$REF/src/utils/utils.cpp"
  "$REF/extern/rectangular_lsap/rectangular_lsap.cpp"
)

OBJS=()
for s in "${SRCS[@]}"; do
  o="$OUT/$(basename "${s%.*}").o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $s"
    g++ "${CXXFLAGS[@]}" -c "$s" -o "$o"
  fi
  OBJS+=("$o")
done

echo "LINK bench_ref"
g++ "${CXXFLAGS[@]}" bench_ref.cpp "${OBJS[@]}" "$OUT/shim.o" "$OPENBLAS" \
  -Wl,-rpath,"$SCIPY_LIBS" -o "$OUT/bench_ref"
echo OK
