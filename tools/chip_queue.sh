#!/bin/bash
# Sequential on-chip measurement queue (run AFTER bench --pe finishes).
# Each leg rides bench.py's own probe retry; logs land in repo root.
cd /root/repo
export BWAMEM_BENCH_PROBE_BUDGET=3600
echo "=== sa_intv=8 e2e ==="
BENCH_SA_INTV=8 timeout 4800 python bench.py --e2e > bench_sa8.out 2> bench_sa8.err
cat bench_sa8.out
echo "=== sa_intv=16 e2e ==="
BENCH_SA_INTV=16 timeout 4800 python bench.py --e2e > bench_sa16.out 2> bench_sa16.err
cat bench_sa16.out
echo "=== batch=32768 e2e ==="
BWAMEM_BENCH_BATCH=32768 timeout 4800 python bench.py --e2e > bench_b32k.out 2> bench_b32k.err
cat bench_b32k.out
echo "=== queue done ==="
