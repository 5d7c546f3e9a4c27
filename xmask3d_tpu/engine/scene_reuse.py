"""Scene-level 3D-reuse serving mode (flag-gated: XMASK3D_SCENE_REUSE=1).

The reference inference protocol re-voxelizes and re-runs BOTH sparse UNets
for every view of a scene (run/infer.py:457-482) — ~20 ms/view of the
~68 ms view on v5e. This mode voxelizes the scene ONCE, runs the 3D branch
once per scene (`XMask3D.run_3d`), keeps its per-point outputs resident on
device, and per view gathers the view's rows to feed the 2D pipeline
(`eval_forward(precomp_3d=...)`).

This is a deliberate protocol divergence: the 3D UNets see whole-scene
context instead of per-view crops (and no per-view voxelization jitter), so
the numerics differ from the reference protocol. It stays OFF by default
until validated on real-data hIoU; scripts/scene_reuse_impact.py measures
the per-point prediction agreement between the two protocols on synthetic
scenes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.data.batching import Capacities, _pad1, stack_hierarchies
from xmask3d_tpu.data.voxelizer import Voxelizer
from xmask3d_tpu.engine.infer import (
    SceneVoter,
    ensemble_and_route,
    fill_and_route_2d,
    nearest_covered_match,
)
from xmask3d_tpu.ops.sparse_conv import build_hierarchy


def scene_caps_from_view_caps(caps: Capacities, factor: int = 4) -> Capacities:
    """Whole-scene capacities: scenes hold several views' worth of points."""
    return Capacities(
        max_points=caps.max_points * factor,
        max_voxels=caps.max_voxels * factor,
        max_targets=caps.max_targets,
        num_levels=caps.num_levels,
        level_divisors=caps.level_divisors,
    )


def scene_3d_batch(
    locs: np.ndarray,  # (N, 3) float scene points
    colors: np.ndarray,  # (N, 3) float 0..255 (or None -> ones)
    scene_caps: Capacities,
    voxel_size: float = 0.02,
    input_color: bool = True,
) -> Dict[str, np.ndarray]:
    """Voxelize the WHOLE scene once (eval pipeline: no augmentation) into a
    `run_3d`-ready batch dict. Points beyond capacity are dropped (marked in
    point_valid), matching the per-view capacity semantics."""
    n = len(locs)
    if colors is None:
        colors = np.full((n, 3), 127.5, np.float32)
    vox = Voxelizer(voxel_size=voxel_size)
    coords, vfeats, _, inds_rec = vox.voxelize(
        locs, colors, np.zeros((n,), np.int64)
    )
    v = scene_caps.max_voxels
    coords = coords[:v].astype(np.int32)
    h = build_hierarchy(coords, scene_caps.level_caps())

    p = scene_caps.max_points
    if input_color:
        feats = vfeats[:, :3] / 127.5 - 1.0
    else:
        feats = np.ones((len(coords), 3), np.float32)
    pv = np.zeros((p,), bool)
    pv[: min(n, p)] = True
    ir = _pad1(inds_rec.astype(np.int32), p)
    pv &= ir < v
    return {
        "hierarchy": stack_hierarchies([h]),
        "voxel_feats": _pad1(feats.astype(np.float32), v)[None],
        "inds_reconstruct": np.where(pv, ir, 0)[None],
        "point_valid": pv[None],
    }


def make_scene_3d_step(model):
    """jit: scene batch -> device-resident per-point 3D outputs.

    The output carries the scene batch's `point_valid` so consumers can
    exclude scene points that were dropped at capacity or whose voxel
    overflowed — gathers against the scene tables clamp silently, so a
    consumer that skips this mask votes wrong features (ADVICE r3)."""

    @jax.jit
    def step(variables, scene_batch):
        out = model.apply(
            variables, scene_batch, False, method=type(model).run_3d
        )
        out["point_valid"] = scene_batch["point_valid"]
        return out

    return step


def make_reuse_infer_step(model, cfg):
    """jit: per-view eval forward consuming the scene's 3D outputs.

    `view_point_ids` (B, P_view) indexes the scene's point rows for this
    view (-1 = padding); the gathers run inside the jit so the big scene
    feature tensors never leave the device.
    """
    mc = model.cfg

    @jax.jit
    def infer_step(variables, batch, statics, scene3d, view_point_ids):
        # shared id/validity/gather semantics with the scanned serving path
        # (-1 and out-of-range ids are never voted by the caller; the
        # gathers clip to a real row)
        from xmask3d_tpu.engine.serve import resolve_vote_ids

        _, _, precomp = resolve_vote_ids(
            {"point_valid": batch["point_valid"],
             "vote_point_ids": view_point_ids},
            scene3d,
        )
        _, outputs = model.apply(
            variables, batch, statics, train=False, precomp_3d=precomp,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return ensemble_and_route(
            outputs,
            base_category=mc.base_category,
            novel_category=mc.novel_category,
            num_test_classes=mc.num_test_classes,
            base_ratio=cfg.base_ratio,
            novel_ratio=cfg.novel_ratio,
        )

    route_2d = jax.jit(
        partial(
            fill_and_route_2d,
            base_category=mc.base_category,
            novel_category=mc.novel_category,
        )
    )
    return infer_step, route_2d


def run_scene_reuse(
    scene,
    scene_3d_step,
    infer_step,
    route_2d,
    variables,
    statics,
    caps: Capacities,
    scene_caps: Capacities,
    num_base: int,
    num_classes: int,
    voxel_size: float = 0.02,
    input_color: bool = True,
):
    """Scene-reuse counterpart of engine/infer_cli.run_scene: one 3D pass
    per scene, one 2D pass per view, same voting/fill protocol."""
    from xmask3d_tpu.data.batching import collate_views

    n_pts = len(scene["coords"])
    sb = scene_3d_batch(
        scene["coords"], scene.get("colors"), scene_caps,
        voxel_size=voxel_size, input_color=input_color,
    )
    # host copy of the scene batch's validity: scene points dropped at
    # capacity or whose voxel overflowed must not be voted — the device
    # gathers against the scene tables clamp out-of-range ids silently, so
    # those rows would otherwise carry last-row/voxel-0 features (ADVICE r3)
    scene_pv = np.asarray(sb["point_valid"])[0]
    sb = jax.tree_util.tree_map(jnp.asarray, sb)
    scene3d = scene_3d_step(variables, sb)

    voters = {
        k: SceneVoter(n_pts, num_classes) for k in ("pred", "pred_2d", "pred_3d")
    }
    for view in scene["views"]:
        batch = collate_views([view["sample"]], caps, num_base=num_base)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        pv = np.asarray(batch["point_valid"])[0]
        # shared row->scene-id mapping (mask-based, scene validity enforced)
        from xmask3d_tpu.engine.infer import view_scene_ids

        rows, sids, keep = view_scene_ids(view["visible"], pv, scene_pv)
        ids = np.full((1, pv.shape[0]), -1, np.int32)
        ids[0, rows[keep]] = sids[keep]
        preds = infer_step(variables, batch, statics, scene3d, jnp.asarray(ids))

        coords_p = np.zeros((pv.shape[0], 3), np.float32)
        coords_p[rows] = scene["coords"][sids]
        covered = np.asarray(preds["covered_2d"])[0]
        match = nearest_covered_match(coords_p, covered, pv)
        pred_2d = route_2d(
            preds["feat_2d"],
            jnp.asarray(match)[None],
            preds["binary_pred"].astype(jnp.float32),
            preds["text"],
            preds["logit_scale"],
        )
        for key, arr in (
            ("pred", preds["pred"]),
            ("pred_2d", pred_2d),
            ("pred_3d", preds["pred_3d"]),
        ):
            voters[key].add_view(sids[keep], np.asarray(arr)[0][rows[keep]])
    return {k: v.finalize(scene["coords"]) for k, v in voters.items()}
