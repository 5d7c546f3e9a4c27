"""Attribute the eval tail: everything eval_forward does AFTER _trunk.

Round-4 profile_e2e split: trunk 39.97 ms/view, full eval forward
55.69 ms/view -> ~15.7 ms of tail (MaskCLIP embed + mask resizes + point
projection + votes/routing + panoptic filter + paint_and_fuse). This tool
times each tail piece standalone at bench shapes (chained-scan, T_long -
T_short slope) so the 15.7 ms can be attacked piece by piece.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_eval_tail.py \
       [--n-short 2] [--n-long 10] [--reps 5] [--only clip_embed,...]
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
    p.add_argument("--n-short", type=int, default=2)
    p.add_argument("--n-long", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    jnp.ones((128, 128)).sum().block_until_ready()  # relay health ping

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer_cli import cast_params_bf16
    from xmask3d_tpu.losses.fuser import (
        paint_and_fuse,
        panoptic_mask_filter,
        project_masks_to_points,
    )

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
    ns, nl, reps = args.n_short, args.n_long, args.reps

    # One real trunk pass for correctly-shaped tail inputs
    trunk = jax.jit(
        lambda v, b: model.apply(
            v, b, statics, False,
            method=lambda m, bb, ss, t: m._trunk(bb, ss, t),
            rngs={"points": jax.random.PRNGKey(0)},
        )
    )(variables, batch)
    trunk = jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        trunk,
    )
    pred_masks = trunk["pred_masks"]
    images = trunk["images"]
    mask_embed = trunk["mask_embed"]
    pred_3d = trunk["pred_3d"]
    binary_scores = trunk["binary_scores"]
    print("pred_masks", pred_masks.shape, pred_masks.dtype,
          "mask_embed", mask_embed.shape, flush=True)

    b, q = pred_masks.shape[:2]
    mh, mw = mc.mask_shape if hasattr(mc, "mask_shape") else cfg.mask_shape
    s = 224  # CLIP image size
    xl, yl = batch["x_label"], batch["y_label"]
    pv = batch["point_valid"]

    def chained(x, c):
        return x + (c * 1e-12).astype(x.dtype)

    # ---- full tail (eval_forward given precomputed trunk) -------------- #
    if want("tail_all"):
        def tail_all(v, c):
            tr = dict(trunk)
            tr["pred_masks"] = chained(pred_masks, c)
            # replay eval_forward's tail on the frozen trunk outputs
            out = model.apply(
                v, dict(batch), statics, False, precomp_3d={
                    "imp_condition": jnp.zeros(
                        (b, mask_embed.shape[-1]), pred_masks.dtype
                    ),
                    "pred_3d": chained(pred_3d, c),
                    "binary_scores": binary_scores,
                },
                rngs={"points": jax.random.PRNGKey(0)},
            )
            return jnp.sum(out[1]["fused_pred_feature"].astype(jnp.float32))

        # NOTE: this still reruns the 2D trunk (backbone needs the images);
        # use (tail_all - trunk) from profile_e2e instead. Skipped by
        # default; the per-piece sections below are the attribution.

    # ---- MaskCLIP embed (resizes + encode) ------------------------------ #
    if want("clip_embed"):
        def clip_embed(v, c):
            out = model.apply(
                v, chained(images, c), chained(pred_masks, c),
                method=lambda m, i, pm: m._clip_mask_embed(i, pm),
            )
            return jnp.sum(out.astype(jnp.float32))

        measure("MaskCLIP embed (resizes+encode)", clip_embed, ns, nl, reps,
                variables=variables)

    if want("clip_encode"):
        img224 = jax.image.resize(images, (b, s, s, 3), "bilinear",
                                  antialias=False)
        m224 = jax.image.resize(pred_masks, (b, q, s, s), "bilinear",
                                antialias=False)

        def clip_encode(v, c):
            out = model.apply(
                v, chained(img224, c), chained(m224, c),
                method=lambda m, i, pm: m.clip.encode_image_with_mask(i, pm),
            )
            return jnp.sum(out.astype(jnp.float32))

        measure("CLIP encode_image_with_mask only", clip_encode, ns, nl,
                reps, variables=variables)

    # ---- resizes --------------------------------------------------------- #
    if want("resize"):
        def r224(_, c):
            pm = chained(pred_masks, c)
            out = jax.image.resize(pm, (b, q, s, s), "bilinear",
                                   antialias=False)
            return jnp.sum(out.astype(jnp.float32))

        measure(f"mask resize {pred_masks.shape[-2:]}->224^2", r224, ns, nl,
                reps, variables=jnp.zeros(()))

        def rmshape(_, c):
            pm = chained(pred_masks, c)
            out = jax.image.resize(pm, (b, q, mh, mw), "bilinear",
                                   antialias=False)
            return jnp.sum(out.astype(jnp.float32))

        measure(f"mask resize ->({mh},{mw})", rmshape, ns, nl, reps,
                variables=jnp.zeros(()))

    # ---- point projection gathers --------------------------------------- #
    masks_mshape = jax.image.resize(pred_masks, (b, q, mh, mw), "bilinear",
                                    antialias=False)
    if want("project"):
        import os

        for form in ("lane", "row"):
            os.environ["XMASK3D_POINT_GATHER"] = form

            def proj(_, c, _form=form):
                mm = chained(masks_mshape, c)
                out = project_masks_to_points(mm, xl, yl)
                return jnp.sum(out.astype(jnp.float32))

            measure(f"project_masks_to_points x2 ({form})",
                    lambda _, c: proj(_, c) + proj(_, c + 1), ns, nl, reps,
                    variables=jnp.zeros(()))
        os.environ.pop("XMASK3D_POINT_GATHER", None)

    # ---- votes + routing + panoptic filter ------------------------------- #
    m3d_logits = project_masks_to_points(masks_mshape, xl, yl)
    if want("route"):
        def route(_, c):
            ml = chained(m3d_logits, c)
            mask_3d_full = (jax.nn.sigmoid(ml) > 0.5) & pv[:, None, :]
            binary_sig = jax.nn.sigmoid(binary_scores.astype(jnp.float32))
            mf = mask_3d_full.astype(jnp.float32)
            vote = jnp.einsum("bqp,bp->bq", mf, binary_sig) / (
                mf.sum(-1) + 1e-10
            )
            return jnp.sum(vote)

        measure("binary vote einsum", route, ns, nl, reps,
                variables=jnp.zeros(()))

    if want("panoptic"):
        scores = jax.nn.sigmoid(
            jnp.sum(mask_embed.astype(jnp.float32), -1) * 0.01
        )
        keep = scores > 0.3

        def pano(_, c):
            mm = chained(masks_mshape, c)
            fm, fv = panoptic_mask_filter(scores, mm, keep)
            return jnp.sum(fm.astype(jnp.float32)) + jnp.sum(fv)

        measure("panoptic_mask_filter", pano, ns, nl, reps,
                variables=jnp.zeros(()))

    if want("paint"):
        mask_3d = m3d_logits > 0.0
        q_valid = jnp.ones((b, q), bool)

        def paint(v, c):
            out = model.apply(
                v, chained(mask_embed, c).astype(pred_3d.dtype),
                chained(pred_3d, c),
                method=lambda m, me, p3: paint_and_fuse(
                    mask_3d, q_valid, me, p3, pv, m.fuser
                ),
            )
            return jnp.sum(out["fused"].astype(jnp.float32))

        measure("paint_and_fuse", paint, ns, nl, reps, variables=variables)


if __name__ == "__main__":
    main()
