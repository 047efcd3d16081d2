#!/bin/sh
# Build the native extension + the C++ benchmark baseline.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O2 -shared -fPIC -I"$PYINC" fastload.cpp -o "../lsqrrecipes_tpu/io/_native$EXT"
g++ -O3 -march=native ransac_baseline.cpp -o ransac_baseline
echo "built _native$EXT and ransac_baseline"
