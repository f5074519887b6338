#!/bin/bash
# Round-4 on-chip validation runbook: run everything that needs the real
# TPU once the tunnel is back.  Usage: bash tools/round4_tpu_runbook.sh
set -x
cd /root/repo

# 0. sanity
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. per-config benchmark (the judge's BENCH_r04_configs.json)
timeout 3600 python tools/bench_configs.py --sweep 16,24,32 \
    --json BENCH_r04_configs.json

# 2. headline bench
timeout 600 python bench.py

# 3. end-to-end streaming bench (BENCH_r04_e2e.json)
timeout 1800 python tools/bench_e2e.py --json BENCH_r04_e2e.json

# 4. device test suite
DABMOD_TEST_ON_TPU=1 timeout 3600 python -m pytest tests/ -q \
    2>&1 | tee TESTS_TPU_r04.txt | tail -3

# 5. per-stage profile of the two tightest configs
timeout 600 python tools/profile_stages.py "8.192" 16
timeout 600 python tools/profile_stages.py "full" 16
