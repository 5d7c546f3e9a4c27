#!/usr/bin/env bash
# Dataset staging helper (capability parity with the reference
# scripts/download_datasets.sh: interactive fetch of the preprocessed
# scannet_3d / scannet_2d / scannet_3d_200 tarballs).
#
# This build environment has no network egress; the script verifies/unpacks
# pre-staged tarballs from $XMASK3D_DATA_TARBALLS when present, and prints
# the expected layout otherwise.
set -euo pipefail

DATA_DIR=${1:-data}
SRC=${XMASK3D_DATA_TARBALLS:-}

layout() {
  cat <<EOF
Expected layout under $DATA_DIR:
  scannet_3d/train/*.pth       # (coords, colors, label20) per scene
  scannet_3d/val/*.pth
  scannet_2d/<scene>/color/*.jpg
  scannet_2d/<scene>/depth/*.png
  scannet_2d/<scene>/pose/*.txt
  scannet_2d/<scene>/label/*.png
  scannet_3d_200/...           # ScanNet200 labels (optional)
  caption/caption_view_scannet_vit-gpt2-image-captioning_.json
Stage tarballs in \$XMASK3D_DATA_TARBALLS to unpack automatically.
EOF
}

mkdir -p "$DATA_DIR"
if [[ -z "$SRC" ]]; then
  echo "XMASK3D_DATA_TARBALLS not set and this environment has no egress."
  layout
  exit 0
fi

for tb in scannet_3d scannet_2d scannet_3d_200; do
  if [[ -f "$SRC/$tb.tar.gz" ]]; then
    echo "unpacking $tb ..."
    tar -xzf "$SRC/$tb.tar.gz" -C "$DATA_DIR"
  fi
done
layout
