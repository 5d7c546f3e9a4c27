#!/bin/sh
# Round-4 TPU measurement sequence — run the moment the relay recovers.
# Ordered by value; each step is independently skippable on failure.
# Usage: sh scripts/tpu_round4_sequence.sh [outdir]
set -x
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r4}
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)

# 0. health probe (fast fail if relay is down)
timeout 180 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128),jnp.bfloat16); (x@x).block_until_ready(); print('PROBE_OK')" || exit 1

# 1. headline bench (default: scan views + bf16 weights, per-view protocol)
BENCH_CHILD=1 timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_default.log"

# 1b. fused GN->conv kernel: first the compile+numerics gate (standalone
#     AND scan-wrapped Mosaic compiles — the scoped-vmem OOM only shows in
#     loop context), then the bench delta
PYTHONPATH=.:/root/.axon_site timeout 1800 python scripts/compile_gn_conv_tpu.py 2>&1 | tee "$OUT/gn_gate.log" \
  && BENCH_CHILD=1 XMASK3D_FUSED_GN=1 timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_fusedgn.log"

# 1c. view batching: B views per dispatch amortize the small decoder/CLIP
#     ops' MXU underutilization (same protocol; views are independent)
BENCH_CHILD=1 BENCH_VIEW_BATCH=2 timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_vb2.log"
BENCH_CHILD=1 BENCH_VIEW_BATCH=4 timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_vb4.log"

# 2. protocol-ceiling qualification (VERDICT r3 #9)
BENCH_CHILD=1 BENCH_SIZE=worst timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_worst.log"

# 3. scene-reuse mode number (flag-gated; for the record, not the headline)
BENCH_CHILD=1 BENCH_SCENE_REUSE=1 timeout 2400 python bench.py 2>&1 | tee "$OUT/bench_reuse.log"

# 4. e2e profile with the trunk/run_3d split (attribute the ~10ms glue)
PYTHONPATH=.:/root/.axon_site timeout 3600 python scripts/profile_e2e.py 2>&1 | tee "$OUT/profile_e2e.log"

# 5. TPU train step retest (VERDICT r3 #8 — crashes the relay worker as of
#    2026-08-17; re-test each round, LAST because it may kill the worker)
PYTHONPATH=.:/root/.axon_site timeout 1800 python scripts/train_step_tpu.py 2>&1 | tee "$OUT/train_step.log"

# 6. device-hier re-execution crash retest (after the worker-crash test,
#    since both can wedge the relay)
BENCH_CHILD=1 BENCH_DEVICE_HIER=1 timeout 1200 python bench.py 2>&1 | tee "$OUT/bench_device_hier.log"
echo "SEQUENCE_DONE"
