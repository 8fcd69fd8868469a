#!/bin/bash
# Run the @pytest.mark.tpu kernel-equality subset on the real chip.
#
# These tests compare the Mosaic-COMPILED Pallas kernels against their jnp
# oracles (the CPU suite only covers interpret mode). First-ever run pays
# ~15 min of remote compiles; results land in the per-host
# .bench_cache/<hostname>/ so subsequent runs on the same host take
# ~2-5 min. One TPU process at a time on this box.
#
# Usage: bash tools/run_tpu_tests.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
PXT_TPU_TESTS=1 PYTHONPATH="$PWD:/root/.axon_site" \
    timeout 5400 python -m pytest tests/ -m tpu -q "$@"
