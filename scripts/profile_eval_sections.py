"""Differential sectioning of eval_forward: attribute the ~12 ms/view gap
between the trunk and the full eval forward (NOTES_ROUND5.md:88-91).

Runs the FULL eval_forward but consumes successively larger output sets;
XLA dead-code-eliminates everything not feeding the consumed sum, so the
DELTA between consecutive sections is the device cost of the added stage.
Chained-scan timing (slope of n_long - n_short), same methodology as
profile_e2e.py.

Sections (cumulative):
  trunk         pred_masks + pred_3d + binary_scores (the _trunk products)
  +logits       + pred_logits            (category bank + cal_pred_logits)
  +clip         + mask_embed_clip        (MaskCLIP resize + masked ViT pass)
  +votes        + pred_labels/scores     (mask_shape resize, full projection,
                                          binary votes, routing softmax)
  +panoptic     + final_mask_3d/valid    (panoptic filter + final projection)
  +fuse         + fused/2d features      (paint_and_fuse)
  +route        + ensemble_and_route     (the engine/infer device tail)

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_eval_sections.py \
       [--n-short 1] [--n-long 3] [--reps 5] [--only trunk,+clip]
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
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

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
        b = dict(b)
        b["img"] = b["img"] + (c * 1e-12).astype(b["img"].dtype)
        b["voxel_feats"] = b["voxel_feats"] + (c * 1e-12).astype(
            b["voxel_feats"].dtype
        )
        return b

    def ssum(x):
        return jnp.sum(x.astype(jnp.float32))

    TRUNK = ("pred_masks", "pred_3d", "binary_scores")
    SECTIONS = [
        ("trunk", TRUNK),
        ("+logits", TRUNK + ("pred_logits",)),
        ("+clip", TRUNK + ("pred_logits", "mask_embed_clip")),
        ("+votes", TRUNK + ("pred_logits", "mask_embed_clip", "pred_labels",
                            "pred_scores")),
        ("+panoptic", TRUNK + ("pred_logits", "mask_embed_clip",
                               "pred_labels", "pred_scores",
                               "final_mask_3d", "final_mask_valid")),
        ("+fuse", TRUNK + ("pred_logits", "mask_embed_clip", "pred_labels",
                           "pred_scores", "final_mask_3d", "final_mask_valid",
                           "fused_pred_feature", "2d_pred_feature",
                           "covered")),
    ]

    def section_fn(keys):
        def fn(v, c):
            b = chain(batch, c)
            _, outputs = model.apply(
                v, b, statics, train=False,
                rngs={"points": jax.random.PRNGKey(0)},
            )
            return sum(ssum(outputs[k]) for k in keys)

        return fn

    def route_fn(v, c):
        b = chain(batch, c)
        _, outputs = model.apply(
            v, b, statics, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        routed = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        consumed = sum(ssum(outputs[k]) for k in TRUNK)
        return (
            consumed
            + ssum(routed["pred"]) + ssum(routed["pred_3d"])
            + ssum(routed["feat_2d"]) + ssum(routed["binary_pred"])
        )

    prev = None
    results = []
    for name, keys in SECTIONS + [("+route", None)]:
        if only is not None and name not in only:
            continue
        fn = route_fn if keys is None else section_fn(keys)
        per = measure(name, fn, args.n_short, args.n_long, args.reps,
                      variables=variables)
        ms = per * 1e3
        delta = None if prev is None else ms - prev
        prev = ms
        results.append((name, ms, delta))
        if delta is not None:
            print(f"    delta vs previous section: +{delta:6.2f} ms", flush=True)

    print("\nsummary:")
    for name, ms, delta in results:
        print(f"  {name:11s} {ms:8.2f}" + (f" (+{delta:.2f})" if delta else ""))


if __name__ == "__main__":
    main()
