"""Honest in-net timing of the FULL eval/infer step (chained-scan).

Chains the complete XMask3D eval forward (+ ensemble/routing) through a
lax.scan carry at the bench shapes, so the slope is pure device compute —
comparable against the sum of per-component numbers (BASELINE.md) to
attribute glue cost. Scan lengths stay SMALL (the relay's remote-compile
service dies on very large programs; the full model body is already big).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_e2e.py \
       [--n-short 1] [--n-long 3] [--reps 5]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, "scripts")
from profile_sd import measure  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-short", type=int, default=1)
    p.add_argument("--n-long", type=int, default=3)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--only", type=str, default="",
                   help="run only sections whose label contains this substring")
    args = p.parse_args()

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer import ensemble_and_route
    from xmask3d_tpu.engine.infer_cli import cast_params_bf16

    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    batch = synthetic_batch(1, caps, seed=0, num_points=20000,
                            image_size=(512, 512),
                            mask_shape=tuple(cfg.mask_shape))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)
    variables = cast_params_bf16(variables)
    mc = model.cfg

    def chain(b, c):
        # the carry must touch EVERY compute input, or XLA hoists the
        # untouched branches out of the scan (LICM) and they get timed as
        # zero — chaining only img silently excluded the whole 3D branch
        # (MinkUNets run off voxel_feats) in the first version of this tool
        b = dict(b)
        b["img"] = b["img"] + (c * 1e-12).astype(b["img"].dtype)
        b["voxel_feats"] = b["voxel_feats"] + (c * 1e-12).astype(
            b["voxel_feats"].dtype
        )
        return b

    def eval_fn(v, c):
        b = chain(batch, c)
        _, outputs = model.apply(
            v, b, statics, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        return jnp.sum(
            outputs["fused_pred_feature"].astype(jnp.float32)
        )

    def infer_fn(v, c):
        b = chain(batch, c)
        _, outputs = model.apply(
            v, b, statics, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        routed = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        return jnp.sum(routed["pred"].astype(jnp.float32))

    def trunk_fn(v, c):
        b = chain(batch, c)
        out = model.apply(
            v, b, statics, False,
            method=lambda m, bb, ss, t: m._trunk(bb, ss, t),
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return jnp.sum(out["pred_masks"].astype(jnp.float32))

    def trunk_full_fn(v, c):
        # trunk_fn consumes only pred_masks, so XLA DCEs the binary
        # MinkUNet head and the pred_3d reconstruct gathers (they feed
        # nothing downstream of that sum) — this variant consumes all
        # three trunk products, isolating "trunk minus DCE'd 3D outputs"
        b = chain(batch, c)
        out = model.apply(
            v, b, statics, False,
            method=lambda m, bb, ss, t: m._trunk(bb, ss, t),
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return (
            jnp.sum(out["pred_masks"].astype(jnp.float32))
            + jnp.sum(out["pred_3d"].astype(jnp.float32))
            + jnp.sum(out["binary_scores"].astype(jnp.float32))
        )

    def eval_full_fn(v, c):
        # eval_fn consumes only fused_pred_feature, which does NOT depend
        # on the MaskCLIP embeddings — they get DCE'd there. This variant
        # pays for everything the real infer step needs.
        b = chain(batch, c)
        _, outputs = model.apply(
            v, b, statics, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        return (
            jnp.sum(outputs["fused_pred_feature"].astype(jnp.float32))
            + jnp.sum(outputs["mask_embed_clip"].astype(jnp.float32))
            + jnp.sum(outputs["pred_logits"].astype(jnp.float32))
        )

    def run3d_fn(v, c):
        b = chain(batch, c)
        out = model.apply(
            v, b, statics, False,
            method=lambda m, bb, ss, t: m.run_3d(bb, train=t),
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return sum(
            jnp.sum(x).astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")
        )

    def _run3d_partial(v, c, keys):
        # decompose run_3d by DCE: consuming only imp_condition keeps just
        # the main MinkUNet (the per-point pred_3d gather and the whole
        # binary UNet feed nothing); adding pred_3d adds the 32768x768
        # reconstruct gather; adding binary_scores adds the binary UNet
        b = chain(batch, c)
        out = model.apply(
            v, b, statics, False,
            method=lambda m, bb, ss, t: m.run_3d(bb, train=t),
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return sum(jnp.sum(out[k]).astype(jnp.float32) for k in keys)

    def run3d_main_fn(v, c):
        return _run3d_partial(v, c, ("imp_condition",))

    def run3d_nogather_fn(v, c):
        return _run3d_partial(v, c, ("imp_condition", "binary_scores"))

    def run3d_nobinary_fn(v, c):
        return _run3d_partial(v, c, ("imp_condition", "pred_3d"))

    sections = [
        ("3D branch (run_3d)", run3d_fn),
        ("run_3d main UNet only", run3d_main_fn),
        ("run_3d main+binary (no pred_3d gather)", run3d_nogather_fn),
        ("run_3d main+gather (no binary)", run3d_nobinary_fn),
        ("trunk (backbone+decoders+3D)", trunk_fn),
        ("trunk FULL (+binary head+gathers)", trunk_full_fn),
        ("eval forward (fused feat)", eval_fn),
        ("eval FULL (+MaskCLIP+logits)", eval_full_fn),
        ("infer step (+ensemble/route)", infer_fn),
    ]
    for label, fn in sections:
        if args.only and args.only not in label:
            continue
        measure(label, fn, args.n_short, args.n_long, args.reps,
                variables=variables)


if __name__ == "__main__":
    main()
