"""Accuracy-proxy validation for the serving flags (VERDICT r3 next-step #5).

Runs the SAME synthetic multi-view scenes through the fp32 per-view
reference protocol (the accuracy baseline) and each serving configuration,
and reports per-point prediction flip rates for the three streams
(pred / pred_2d / pred_3d):

  bf16_compute          compute_dtype=bfloat16, fp32 weight storage
                        (the config default, configs/scannet/*.yaml)
  bf16_weights          bf16 compute + bf16 weight storage
                        (the bench serving default, bench.py BENCH_BF16_PARAMS)
  scene_reuse           bf16 compute+storage + one-3D-pass-per-scene
                        (bench BENCH_SCENE_REUSE=1, engine/scene_reuse.py)

All variants share ONE set of fp32-initialized weights, so flips measure
the serving config alone. Results are recorded in BASELINE.md with the
keep/gate decision; re-run with --size full on a real chip the moment
checkpoints/data stage.

Usage (CPU, tiny model):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python scripts/serving_agreement.py [--scenes 3] [--views 4]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--points", type=int, default=1500)
    p.add_argument("--size", choices=["tiny", "full"], default="tiny")
    args = p.parse_args()

    import __graft_entry__ as g
    from xmask3d_tpu.data.synthetic import synthetic_scene
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer_cli import (
        cast_params_bf16,
        make_infer_step,
        run_scene,
    )
    from xmask3d_tpu.engine.scene_reuse import (
        make_reuse_infer_step,
        make_scene_3d_step,
        run_scene_reuse,
        scene_caps_from_view_caps,
    )

    if args.size == "tiny":
        cfg, caps, batch = g._tiny_cfg_and_batch()
        cfg.arch_3d = "MinkUNet14A"
        cfg.arch_binary_head = "MinkUNet14A"
        cfg.dec_layers = 2
        cfg.pixel_enc_layers = 2
        image, ctx, vocab = (64, 64), 16, 512
        tiny = True
    else:
        from xmask3d_tpu.config import load_config
        from xmask3d_tpu.data.batching import Capacities
        from xmask3d_tpu.data.synthetic import synthetic_batch

        cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
        caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
        image, ctx, vocab = (512, 512), 77, 49408
        batch = synthetic_batch(
            1, caps, seed=0, num_points=20000, image_size=image,
            mask_shape=tuple(cfg.mask_shape), context_length=ctx,
            vocab_size=vocab,
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        tiny = False

    # ONE weight set (fp32), shared by every variant
    cfg.compute_dtype = "float32"
    model32, variables, statics = init_model(cfg, batch, tiny=tiny)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)

    from xmask3d_tpu.engine.builder import model_config_from_cfg

    cfg.compute_dtype = "bfloat16"
    model16 = type(model32)(cfg=model_config_from_cfg(cfg, tiny=tiny))

    variables_bf16 = cast_params_bf16(variables)

    step32, route32 = make_infer_step(model32, cfg)
    step16, route16 = make_infer_step(model16, cfg)
    scene_caps = scene_caps_from_view_caps(caps, factor=4)
    scene_3d_step = make_scene_3d_step(model16)
    reuse_step, reuse_route = make_reuse_infer_step(model16, cfg)

    def per_view(step, route, vs, scene):
        return run_scene(
            scene, step, route, vs, statics, caps, cfg.classes, cfg.test_classes
        )

    # int8 W8A8 was RETIRED from the model wiring in round 5: dynamic
    # activation quantization measured 3x slower full-model on v5e
    # (BASELINE.md round 4) with no accuracy story; ops/int8_quant.py stays
    # as a tested standalone op pending calibrated static scales + a fused
    # quantize+conv kernel.
    variants = {
        "bf16_compute": lambda scene: per_view(step16, route16, variables, scene),
        "bf16_weights": lambda scene: per_view(step16, route16, variables_bf16, scene),
        "scene_reuse": lambda scene: run_scene_reuse(
            scene, scene_3d_step, reuse_step, reuse_route, variables_bf16,
            statics, caps, scene_caps, num_base=cfg.classes,
            num_classes=cfg.test_classes, voxel_size=0.05,
        ),
    }
    flips = {v: {k: [] for k in ("pred", "pred_2d", "pred_3d")} for v in variants}

    for si in range(args.scenes):
        scene = synthetic_scene(
            caps, seed=10 + si, num_points=args.points, num_views=args.views,
            num_classes=cfg.classes, image_size=image,
            mask_shape=tuple(cfg.mask_shape), context_length=ctx,
            vocab_size=vocab,
        )
        base = per_view(step32, route32, variables, scene)
        for vname, fn in variants.items():
            got = fn(scene)
            for k in ("pred", "pred_2d", "pred_3d"):
                flips[vname][k].append(float((base[k] != got[k]).mean()))
        print(
            f"# scene {si}: "
            + " ".join(
                f"{v}.{k}={flips[v][k][-1]:.4f}"
                for v in variants for k in ("pred",)
            ),
            flush=True,
        )

    summary = {"size": args.size, "scenes": args.scenes,
               "views_per_scene": args.views}
    for vname in variants:
        for k in ("pred", "pred_2d", "pred_3d"):
            summary[f"flip_{vname}_{k}"] = round(
                float(np.mean(flips[vname][k])), 4
            )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
