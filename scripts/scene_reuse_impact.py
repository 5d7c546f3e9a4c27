"""Numerics-impact harness for the scene-reuse serving mode (VERDICT r2 #6).

Runs the SAME synthetic multi-view scenes through both inference protocols —
the reference per-view protocol (3D branch recomputed per view,
run/infer.py:457-482) and the scene-reuse mode (one 3D pass per scene,
engine/scene_reuse.py) — and reports per-point prediction agreement for the
fused / 2D / 3D streams. This quantifies the protocol divergence so the
flag can default on the moment real-data hIoU validation is possible.

Usage (CPU, tiny model):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python scripts/scene_reuse_impact.py [--scenes 3] [--views 4]
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--points", type=int, default=1500)
    args = p.parse_args()

    import __graft_entry__ as g
    from xmask3d_tpu.data.synthetic import synthetic_scene
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer_cli import make_infer_step, run_scene
    from xmask3d_tpu.engine.scene_reuse import (
        make_reuse_infer_step,
        make_scene_3d_step,
        run_scene_reuse,
        scene_caps_from_view_caps,
    )

    cfg, caps, batch = g._tiny_cfg_and_batch()
    cfg.arch_3d = "MinkUNet14A"
    cfg.arch_binary_head = "MinkUNet14A"
    cfg.dec_layers = 2
    cfg.pixel_enc_layers = 2
    model, variables, statics = init_model(cfg, batch, tiny=True)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)

    infer_step, route_2d = make_infer_step(model, cfg)
    scene_caps = scene_caps_from_view_caps(caps, factor=4)
    scene_3d_step = make_scene_3d_step(model)
    reuse_step, reuse_route = make_reuse_infer_step(model, cfg)

    agree = {k: [] for k in ("pred", "pred_2d", "pred_3d")}
    for si in range(args.scenes):
        scene = synthetic_scene(
            caps, seed=10 + si, num_points=args.points, num_views=args.views,
            num_classes=cfg.classes, image_size=(64, 64),
            mask_shape=tuple(cfg.mask_shape), context_length=16, vocab_size=512,
        )
        ref = run_scene(
            scene, infer_step, route_2d, variables, statics, caps,
            cfg.classes, cfg.test_classes,
        )
        got = run_scene_reuse(
            scene, scene_3d_step, reuse_step, reuse_route, variables, statics,
            caps, scene_caps, num_base=cfg.classes,
            num_classes=cfg.test_classes, voxel_size=0.05,
        )
        for k in agree:
            agree[k].append(float((ref[k] == got[k]).mean()))
        print(f"# scene {si}: " + " ".join(
            f"{k}={agree[k][-1]:.3f}" for k in agree
        ), flush=True)

    summary = {
        f"agreement_{k}": round(float(np.mean(v)), 4) for k, v in agree.items()
    }
    summary["scenes"] = args.scenes
    summary["views_per_scene"] = args.views
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
