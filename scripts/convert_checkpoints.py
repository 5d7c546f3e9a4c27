"""Assemble a full eval parameter tree from the three torch sources.

The reference loads weights from three places (SURVEY.md §3.4/§3.5): the
released XMask3D trainable checkpoint (b15n4.pth.tar — XMask3dCheckpointer),
the SD v1 checkpoint (sd-v1-3.ckpt — LdmCheckpointer) and open_clip ViT-L-14.
This CLI runs all three converters and writes a ready-to-load npz of flat
params + batch_stats for xmask3d_tpu.

Usage:
  python scripts/convert_checkpoints.py \
      --xmask3d b15n4.pth.tar --sd sd-v1-3.ckpt --clip ViT-L-14.pt \
      --out converted_b15n4.npz
  (any subset may be given; sd:// and odise:// URLs resolve via the model
  zoo cache.)
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    sys.path.insert(0, ".")
    from xmask3d_tpu.checkpoint.convert_torch import (
        convert_open_clip,
        convert_sd_checkpoint,
        load_torch_state,
    )
    from xmask3d_tpu.checkpoint.convert_xmask3d import convert_xmask3d_checkpoint
    from xmask3d_tpu.utils.model_zoo import resolve

    p = argparse.ArgumentParser()
    p.add_argument("--xmask3d", default="")
    p.add_argument("--sd", default="")
    p.add_argument("--clip", default="")
    p.add_argument("--arch_3d", default="MinkUNet34C")
    p.add_argument("--arch_binary", default="MinkUNet18A")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    params, stats = {}, {}
    if args.sd:
        sd = convert_sd_checkpoint(resolve(args.sd))
        ldm = "backbone/feature_extractor/ldm_extractor"
        for mod, tree in sd.items():
            for k, v in tree.items():
                params[f"{ldm}/{mod}/{k}"] = v
        print(f"SD: {sum(len(t) for t in sd.values())} tensors")
    if args.clip:
        clip = convert_open_clip(load_torch_state(resolve(args.clip)))
        for k, v in clip.items():
            params[f"clip/{k}"] = v
        print(f"CLIP: {len(clip)} tensors")
    if args.xmask3d:
        tp, ts = convert_xmask3d_checkpoint(
            resolve(args.xmask3d), arch_3d=args.arch_3d,
            arch_binary=args.arch_binary,
        )
        params.update(tp)
        stats.update(ts)
        print(f"XMask3D trainables: {len(tp)} params, {len(ts)} stats")

    np.savez(
        args.out,
        **{f"params/{k}": v for k, v in params.items()},
        **{f"batch_stats/{k}": v for k, v in stats.items()},
    )
    print(f"wrote {args.out}: {len(params)} params, {len(stats)} batch stats")


if __name__ == "__main__":
    main()
