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

# --mesh DxM needs D*M virtual devices BEFORE jax import (VERDICT r3 #7)
for _i, _a in enumerate(sys.argv):
    if _a == "--mesh" and _i + 1 < len(sys.argv):
        _d, _m = (int(x) for x in sys.argv[_i + 1].split("x"))
        _flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{_flags} --xla_force_host_platform_device_count={_d * _m}"
        )

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


def _sharded_sds(tree, mesh, rule):
    """ShapeDtypeStructs with NamedShardings attached, chosen per-leaf by
    rule(path_keys, leaf_struct, mesh)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
            for p in path
        )
        sh = rule(keys, leaf, mesh)
        leaves.append(
            jax.ShapeDtypeStruct(jnp.shape(leaf), jnp.result_type(leaf), sharding=sh)
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def run_sharded_variant(cfg, caps, remat: bool, data: int, model_axis: int,
                        lower_only: bool, act_shard: bool = False):
    """Compile the flagship train step under a (data x model) mesh with
    parallel/mesh.py shardings; memory_analysis is then PER-DEVICE (the
    SPMD program), proving (or refuting) the per-chip HBM fit under TP
    (VERDICT r3 next-step #7). act_shard additionally constrains the SD
    UNet/VAE block activations to shard spatially over `model`
    (parallel/mesh.py:activation_sharding) — the lever for batch-1 temps,
    which kernel-only TP leaves replicated."""
    import contextlib

    from jax.sharding import NamedSharding, PartitionSpec as P

    from xmask3d_tpu.engine.train_step import make_train_step
    from xmask3d_tpu.parallel.mesh import (
        activation_sharding, create_mesh, param_sharding_rules,
    )

    mesh = create_mesh(data, model_axis)
    (model, optimizer, state_s, batch_s, statics_s, n_params,
     t_init_trace) = build_abstract_state_and_args(cfg, caps, remat)
    if data > 1:
        # one sample per data-shard: rebuild the batch at global batch=data
        from xmask3d_tpu.data.synthetic import synthetic_batch

        batch_s = sds_tree(synthetic_batch(
            data, caps, seed=0, num_points=30000, image_size=(512, 512),
            mask_shape=tuple(cfg.mask_shape),
        ))
    train_step = make_train_step(model, optimizer, dict(cfg.loss_weight))

    def tp_rule(keys, leaf, mesh):
        # opt-state leaves repeat the param path tail, so the same kernel-
        # name heuristics apply (mu/nu trees end in .../<layer>/kernel)
        return param_sharding_rules(keys, leaf, mesh)

    def batch_rule(keys, leaf, mesh):
        if jnp.ndim(leaf) >= 1:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    repl = lambda keys, leaf, mesh: NamedSharding(mesh, P())  # noqa: E731
    state_sh = _sharded_sds(state_s, mesh, tp_rule)
    batch_sh = _sharded_sds(batch_s, mesh, batch_rule)
    statics_sh = _sharded_sds(statics_s, mesh, repl)
    scale_sh = jax.ShapeDtypeStruct(
        (), jnp.float32, sharding=NamedSharding(mesh, P())
    )

    out = {
        "mesh": {"data": data, "model": model_axis},
        "remat_backbone": remat,
        "act_shard": act_shard,
        "n_params": n_params,
        "init_trace_s": round(t_init_trace, 1),
    }
    act_ctx = (
        activation_sharding(mesh) if act_shard else contextlib.nullcontext()
    )
    t0 = time.time()
    with mesh, act_ctx:
        lowered = jax.jit(train_step, donate_argnums=(0,)).lower(
            state_sh, batch_sh, statics_sh, scale_sh
        )
    out["lower_s"] = round(time.time() - t0, 1)
    print(f"[mesh {data}x{model_axis} remat={remat} act={act_shard}] "
          f"lowered in {out['lower_s']}s", flush=True)
    if lower_only:
        return out
    t0 = time.time()
    compiled = lowered.compile()
    out["compile_s"] = round(time.time() - t0, 1)
    mem = compiled.memory_analysis()
    for k in (
        "temp_size_in_bytes", "argument_size_in_bytes", "output_size_in_bytes",
        "alias_size_in_bytes",
    ):
        v = getattr(mem, k, None)
        if v is not None:
            out[k] = int(v)
    if "temp_size_in_bytes" in out:
        out["per_device_peak_estimate_gib"] = round(
            (out.get("argument_size_in_bytes", 0) + out["temp_size_in_bytes"]
             - out.get("alias_size_in_bytes", 0)) / 2**30, 2,
        )
    print(f"[mesh {data}x{model_axis} remat={remat}] compiled in "
          f"{out['compile_s']}s: "
          f"{ {k: v for k, v in out.items() if 'bytes' in k or 'gib' in k} }",
          flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lower-only", action="store_true")
    p.add_argument("--remat", choices=["off", "on", "both"], default="both")
    p.add_argument("--mesh", default=None,
                   help="DATAxMODEL (e.g. 1x4): compile the sharded train "
                        "step on a virtual CPU mesh instead of single-device")
    p.add_argument("--act-shard", action="store_true",
                   help="with --mesh: also shard SD UNet/VAE block "
                        "activations spatially over the model axis")
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
        if args.mesh:
            d, m = (int(x) for x in args.mesh.split("x"))
            results.append(
                run_sharded_variant(cfg, caps, remat, d, m, args.lower_only,
                                    act_shard=args.act_shard)
            )
        else:
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
