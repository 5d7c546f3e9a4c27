#!/bin/sh
# Late round-4 TPU measurement sequence — run when the relay recovers.
# Ordered by value; each step independently skippable on failure.
# Per-step exit codes land in $OUT/status so callers (relay_watch.sh)
# can distinguish partial from full success despite the `tee` pipes.
# Usage: sh scripts/tpu_r4late_sequence.sh [outdir]
set -x
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r4l}
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)
export PYTHONPATH=.:/root/.axon_site

# 0. health probe (fast fail if relay is down)
timeout 180 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128),jnp.bfloat16); (x@x).block_until_ready(); print('PROBE_OK')" || exit 1

# 1. headline bench: fresh official run with the fused k5 stem + latest tree
{ BENCH_CHILD=1 timeout 2400 python bench.py 2>&1; echo "bench rc=$?" >> "$OUT/status"; } | tee "$OUT/bench_default.log"

# 2. pixel-decoder piecewise profile (new profiler; 7.9 ms vs <1 ms FLOPs
#    bound — find where the waste is: op q_tile, dense remainder, layer)
{ timeout 3600 python scripts/profile_pixel.py 2>&1; echo "profile_pixel rc=$?" >> "$OUT/status"; } | tee "$OUT/profile_pixel.log"

# 3. sustained train steps — the step-2 "worker crash" was OUR Hungarian
#    NaN loop (fixed, commit 1381465); retest sustained execution
{ timeout 1800 python scripts/train_step_tpu.py --steps 10 --lr-scale 0.01 2>&1; echo "train_tiny rc=$?" >> "$OUT/status"; } | tee "$OUT/train_tiny.log"

# 4. flagship-shape train steps on-chip (first sustained attempt; record
#    per-step time for BASELINE.md)
{ timeout 3000 python scripts/train_step_tpu.py --full --steps 5 --lr-scale 0.01 2>&1; echo "train_full rc=$?" >> "$OUT/status"; } | tee "$OUT/train_full.log"

echo "SEQUENCE_DONE"
