"""AOT-prove the FLAGSHIP train step at real B15N4 shapes (VERDICT r2 #2).

Lowers + compiles jit(train_step) with the full-scale program — 512^2 image,
65536-point / 49152-voxel caps, MinkUNet34C + MinkUNet18A, SD v1 backbone,
ViT-L/14 CLIP, 9 decoder layers, batch 1/device — entirely from abstract
ShapeDtypeStructs (no weights materialized), and records
`compiled.memory_analysis()` peak temp/argument bytes with and without
`remat_backbone`. This retires the "full-scale training never compiled
anywhere" risk without TPU access (the reference's equivalent evidence is
"DDP trains on a 24 GB GPU", run/train.py:113-187).

Usage:
  PYTHONPATH=/root/repo python scripts/aot_flagship.py [--lower-only]
      [--remat {off,on,both}] [--out AOT_FLAGSHIP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU-relay plugin out

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sds_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def build_abstract_state_and_args(cfg, caps, remat: bool):
    from functools import partial

    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import model_config_from_cfg, zero_statics
    from xmask3d_tpu.engine.train_step import TrainState, make_optimizer
    from xmask3d_tpu.models.xmask3d import XMask3D

    cfg.remat_backbone = remat
    mc = model_config_from_cfg(cfg, tiny=False)
    model = XMask3D(cfg=mc)

    batch = synthetic_batch(
        1, caps, seed=0, num_points=30000, image_size=(512, 512),
        mask_shape=tuple(cfg.mask_shape),
    )
    batch_s = sds_tree(batch)
    statics_s = sds_tree(zero_statics(model, cfg))

    rngs = {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)}
    t0 = time.time()
    var_s = jax.eval_shape(partial(model.init, train=True), rngs, batch_s, statics_s)
    t_init_trace = time.time() - t0
    params_s = var_s["params"]
    stats_s = var_s.get("batch_stats", {})

    optimizer = make_optimizer(cfg.lr_3d, cfg.lr_others, total_steps=100)
    opt_s = jax.eval_shape(optimizer.init, params_s)
    key_s = sds_tree(jax.random.PRNGKey(0))
    state_s = TrainState(
        params=params_s, batch_stats=stats_s, opt_state=opt_s,
        step=jax.ShapeDtypeStruct((), jnp.int32), rng=key_s,
    )
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params_s)
    )
    return model, optimizer, state_s, batch_s, statics_s, n_params, t_init_trace


def run_variant(cfg, caps, remat: bool, lower_only: bool):
    from xmask3d_tpu.engine.train_step import make_train_step

    (model, optimizer, state_s, batch_s, statics_s, n_params,
     t_init_trace) = build_abstract_state_and_args(cfg, caps, remat)
    train_step = make_train_step(model, optimizer, dict(cfg.loss_weight))

    t0 = time.time()
    lowered = jax.jit(train_step, donate_argnums=(0,)).lower(
        state_s, batch_s, statics_s, jax.ShapeDtypeStruct((), jnp.float32)
    )
    t_lower = time.time() - t0
    out = {
        "remat_backbone": remat,
        "n_params": n_params,
        "init_trace_s": round(t_init_trace, 1),
        "lower_s": round(t_lower, 1),
    }
    print(f"[remat={remat}] lowered in {t_lower:.1f}s "
          f"({n_params/1e6:.1f}M params)", flush=True)
    if lower_only:
        return out

    t0 = time.time()
    compiled = lowered.compile()
    out["compile_s"] = round(time.time() - t0, 1)
    mem = compiled.memory_analysis()
    for k in (
        "temp_size_in_bytes", "argument_size_in_bytes", "output_size_in_bytes",
        "alias_size_in_bytes", "generated_code_size_in_bytes",
    ):
        v = getattr(mem, k, None)
        if v is not None:
            out[k] = int(v)
    # peak live ~= args (weights+opt state+batch) + temps - donated aliases
    if "temp_size_in_bytes" in out:
        out["peak_estimate_gib"] = round(
            (out.get("argument_size_in_bytes", 0) + out["temp_size_in_bytes"]
             - out.get("alias_size_in_bytes", 0)) / 2**30, 2,
        )
    print(f"[remat={remat}] compiled in {out['compile_s']}s: "
          f"{ {k: v for k, v in out.items() if 'bytes' in k or 'gib' in k} }",
          flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lower-only", action="store_true")
    p.add_argument("--remat", choices=["off", "on", "both"], default="both")
    p.add_argument("--out", default="AOT_FLAGSHIP.json")
    args = p.parse_args(argv)

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.engine.builder import capacities_from_cfg

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(root, "configs/scannet/xmask3d_scannet_B15N4.yaml")
    )
    caps = capacities_from_cfg(cfg)
    print(f"caps: {caps}, image 512^2, batch 1, arch {cfg.arch_3d}", flush=True)

    variants = {"off": [False], "on": [True], "both": [False, True]}[args.remat]
    results = []
    for remat in variants:
        results.append(run_variant(cfg, caps, remat, args.lower_only))

    payload = {
        "config": "B15N4 flagship",
        "image": 512,
        "batch_per_device": 1,
        "caps": {"points": caps.max_points, "voxels": caps.max_voxels,
                 "targets": caps.max_targets},
        "variants": results,
    }
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
