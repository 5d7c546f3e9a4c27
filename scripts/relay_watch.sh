#!/bin/sh
# Probe the TPU relay until it answers, then run the given sequence script.
# Usage: sh scripts/relay_watch.sh scripts/tpu_r4late_sequence.sh /tmp/tpu_r4l
cd "$(dirname "$0")/.."
SEQ=${1:-scripts/tpu_r4late_sequence.sh}
OUT=${2:-/tmp/tpu_r4l}
export PYTHONPATH=.:/root/.axon_site
i=0
while true; do
    i=$((i + 1))
    if timeout 150 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128),jnp.bfloat16); (x@x).block_until_ready(); print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK; then
        echo "relay up after $i probes ($(date -u +%H:%M:%SZ)); running $SEQ"
        sh "$SEQ" "$OUT"
        exit 0
    fi
    echo "probe $i failed ($(date -u +%H:%M:%SZ)); retry in 60s"
    sleep 60
done
