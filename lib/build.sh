#!/bin/sh
# Build the C shared library and its smoke test.
#   sh lib/build.sh
# Run the test with the package importable:
#   PYTHONPATH=/root/repo JAX_PLATFORMS=cpu ./lib/test_capi
set -e
cd "$(dirname "$0")"

CFLAGS="$(python3-config --includes) -O2 -fPIC"
LDFLAGS="$(python3-config --embed --ldflags)"

g++ $CFLAGS -shared amgcl_tpu_c.cpp -o libamgcl_tpu_c.so $LDFLAGS
gcc -O2 test_capi.c -o test_capi -L. -lamgcl_tpu_c -Wl,-rpath,"$(pwd)" $LDFLAGS
echo "built libamgcl_tpu_c.so and test_capi"
