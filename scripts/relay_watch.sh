#!/bin/sh
# Probe the TPU relay until it answers, then run the given sequence script.
# Usage: sh scripts/relay_watch.sh scripts/tpu_r4late_sequence.sh /tmp/tpu_r4l
# Exits non-zero after MAX_PROBES failed probes (default 45 ~= bench.py's
# BENCH_MAX_WAIT=2700s) and propagates the sequence script's exit status.
cd "$(dirname "$0")/.."
SEQ=${1:-scripts/tpu_r4late_sequence.sh}
OUT=${2:-/tmp/tpu_r4l}
MAX_PROBES=${MAX_PROBES:-45}
export PYTHONPATH=.:/root/.axon_site
i=0
while true; do
    i=$((i + 1))
    if timeout 150 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128),jnp.bfloat16); (x@x).block_until_ready(); print('PROBE_OK')" 2>>"$OUT.probe.log" | grep -q PROBE_OK; then
        echo "relay up after $i probes ($(date -u +%H:%M:%SZ)); running $SEQ"
        sh "$SEQ" "$OUT"
        exit $?
    fi
    if [ "$i" -ge "$MAX_PROBES" ]; then
        echo "relay still down after $i probes ($(date -u +%H:%M:%SZ)); giving up" >&2
        exit 1
    fi
    echo "probe $i failed ($(date -u +%H:%M:%SZ)); retry in 60s (stderr: $OUT.probe.log)"
    sleep 60
done
