#!/bin/sh
# Resume training from the latest orbax checkpoint in the experiment dir
# (reference run/resume.sh:1-33 semantics; orbax step dirs replace
# model_last.pth.tar).
set -x

while [ "$#" -gt 0 ]; do
    case "$1" in
        --exp_dir=*) exp_dir="${1#*=}" ;;
        --config=*) config="${1#*=}" ;;
        *) echo "Unknown parameter: $1"; exit 1 ;;
    esac
    shift
done

if [ -z "$exp_dir" ] || [ -z "$config" ]; then
    echo "Usage: sh run/resume.sh --exp_dir=XX --config=XX"
    exit 1
fi

mkdir -p "${exp_dir}"

export PYTHONPATH=".:${PYTHONPATH}"
python -u -m xmask3d_tpu.engine.train \
  --config "${config}" \
  --save_path "${exp_dir}" \
  --resume "${exp_dir}/model" \
  2>&1 | tee -a "${exp_dir}/resume-$(date +"%Y%m%d_%H%M").log"
