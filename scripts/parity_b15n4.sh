#!/bin/sh
# Push-button B15N4 hIoU parity run (reference README.md:79: 70.0 / 69.8 / 70.2
# hIoU / mIoU_base / mIoU_novel; protocol run/infer.py:375-694).
#
# Given the released assets, converts all three torch checkpoints into one
# npz and runs the full whole-scene protocol (all accepted views per scene,
# multi-view voting, KD-tree fill, base/novel routing + geometric-mean
# ensemble), emitting the hIoU table. Multi-host: run this same script on
# every host of the slice (jax.distributed env) — scenes shard by
# jax.process_index and the IoU meters all-reduce (engine/infer_cli.py:300).
#
# Real run:
#   XMASK3D_CKPT=/assets/b15n4.pth.tar SD_CKPT=/assets/sd-v1-3.ckpt \
#   CLIP_CKPT=/assets/open_clip_pytorch_model.bin \
#   SCANNET_3D=/assets/scannet_3d SCANNET_2D=/assets/scannet_2d \
#   CAPTION_JSON=/assets/caption_view_scannet_vit-gpt2-image-captioning_.json \
#   sh scripts/parity_b15n4.sh [outdir]
#
# Dry run (no assets; synthetic stand-ins prove the exact command wiring):
#   sh scripts/parity_b15n4.sh --dry-run [outdir]
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=.:tests:${PYTHONPATH}

if [ "$1" = "--dry-run" ]; then
    OUT=${2:-/tmp/parity_b15n4_dry}
    mkdir -p "$OUT"
    echo "== dry run: synthetic stand-ins into $OUT =="
    # force CPU: the dev box exports JAX_PLATFORMS=axon for the TPU relay,
    # but the dry run is by construction a no-chip path.
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python - "$OUT" <<'EOF'
import sys
from pathlib import Path

import numpy as np

out = Path(sys.argv[1])
# stand-in dataset: 1 scene, 2 views, real on-disk layout
from mini_scannet import build_mini_scannet
build_mini_scannet(out / "data", n_views=2)

# stand-in converted weights: tiny reference-format state dict -> npz via
# the REAL converter (dims read off the tiny model tree, same flow as
# tests/test_checkpoint_e2e.py::test_tiny_conversion_loads_and_runs)
import jax
import jax.numpy as jnp

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import synthetic_batch
from xmask3d_tpu.engine.builder import init_model

caps = Capacities(max_points=512, max_voxels=256, max_targets=8)
cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
cfg.max_points, cfg.max_voxels, cfg.max_targets = 512, 256, 8
cfg.mask_shape = [24, 32]
batch = synthetic_batch(1, caps, seed=0, num_points=400, image_size=(64, 64),
                        mask_shape=(24, 32), context_length=16, vocab_size=512)
batch = jax.tree_util.tree_map(jnp.asarray, batch)
model, variables, _ = init_model(cfg, batch, tiny=True)


def flatten(tree, prefix=""):
    o = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            o.update(flatten(v, f"{prefix}{k}/"))
        else:
            o[f"{prefix}{k}"] = v
    return o


from ref_state_dict import build_state_dict, tiny_manifest_from_model
from xmask3d_tpu.checkpoint.convert_xmask3d import convert_xmask3d_checkpoint

manifest = tiny_manifest_from_model(model, flatten(variables["params"]))
arrays, _ = build_state_dict(manifest, values="random")
params, stats = convert_xmask3d_checkpoint(
    {f"module.{k}": v for k, v in arrays.items()}
)
np.savez(out / "converted.npz",
         **{f"params/{k}": np.asarray(v) for k, v in params.items()},
         **{f"batch_stats/{k}": np.asarray(v) for k, v in stats.items()})
print("dry-run fixtures ready")
EOF
    # the rc file keeps the python exit status visible through the tee
    # pipeline (sh pipelines return tee's status — ADVICE round-4 class)
    ( PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python -m xmask3d_tpu.engine.infer_cli \
        --config configs/scannet/xmask3d_scannet_B15N4.yaml \
        --tiny --allow_hash_tokenizer --converted "$OUT/converted.npz" \
        data_root "$OUT/data/scannet_3d" data_root_2d "$OUT/data/scannet_2d" \
        caption_path "$OUT/data/caption.json" \
        max_points 4096 max_voxels 4096 max_targets 8 mask_shape [24,32] \
        2>&1; echo $? > "$OUT/.rc" ) | tee "$OUT/infer.log"
    [ "$(cat "$OUT/.rc")" -eq 0 ]
    echo "== dry run complete; table above =="
    exit 0
fi

OUT=${1:-/tmp/parity_b15n4}
mkdir -p "$OUT"
: "${XMASK3D_CKPT:?set XMASK3D_CKPT=/path/to/b15n4.pth.tar}"
: "${SD_CKPT:?set SD_CKPT=/path/to/sd-v1-3.ckpt}"
: "${CLIP_CKPT:?set CLIP_CKPT=/path/to/open_clip ViT-L-14 weights}"
: "${SCANNET_3D:?set SCANNET_3D=/path/to/scannet_3d}"
: "${SCANNET_2D:?set SCANNET_2D=/path/to/scannet_2d}"
: "${CAPTION_JSON:?set CAPTION_JSON=/path/to/caption json}"

if [ ! -f "$OUT/converted_b15n4.npz" ]; then
    ( python scripts/convert_checkpoints.py \
        --xmask3d "$XMASK3D_CKPT" --sd "$SD_CKPT" --clip "$CLIP_CKPT" \
        --out "$OUT/converted_b15n4.npz" 2>&1; echo $? > "$OUT/.rc" ) \
        | tee "$OUT/convert.log"
    [ "$(cat "$OUT/.rc")" -eq 0 ]
fi

# whole-val-set protocol; scenes shard across jax processes automatically.
# EXTRA_OPTS appends config overrides (e.g. "max_points 131072").
( python -m xmask3d_tpu.engine.infer_cli \
    --config configs/scannet/xmask3d_scannet_B15N4.yaml \
    --converted "$OUT/converted_b15n4.npz" \
    data_root "$SCANNET_3D" data_root_2d "$SCANNET_2D" \
    caption_path "$CAPTION_JSON" \
    $EXTRA_OPTS 2>&1; echo $? > "$OUT/.rc" ) | tee "$OUT/infer.log"
[ "$(cat "$OUT/.rc")" -eq 0 ]

echo "== reference B15N4 (README.md:79): hIoU 70.0 / mIoU_base 69.8 / mIoU_novel 70.2 =="
