"""Scanned scene-inference serving step.

The reference's inference protocol forwards a scene one view at a time and
votes per point (run/infer.py:375-694). Dispatching each view as its own
device program pays a host round-trip per view — ~20 ms/view through the
dev relay, ~1-2 ms/view even on production hosts. The TPU-native serving
shape runs the WHOLE scene inside one device program: `lax.scan` over view
indices into a stacked view buffer, with the vote state in the scan carry.
Per-view semantics are unchanged (batch-1 sequential forwards, on-device
voting via `device_vote_add`); only the dispatch boundary moves from
per-view to per-scene.

Used by bench.py (BENCH_SCAN_VIEWS, default on) and available for real
serving via `make_scene_scan_step`. The scan body is traced once, so the
compiled program is the same size as a single infer step.

Point-id plumbing: when each view's rows map to different scene points
(real serving), the stacked view batch must carry `vote_point_ids`
(B, P_view) int32 — the scene point row each view row votes for, -1 for
padding. Rows whose id is negative, out of vote-table range, or (in
scene-reuse mode) maps to a scene point the scene batch dropped
(`scene3d["point_valid"]`) are excluded from the vote. Without that key,
rows vote under their own index — correct only when every view indexes one
shared point table (the synthetic bench).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from xmask3d_tpu.engine.infer import device_vote_add, ensemble_and_route


def resolve_vote_ids(batch, scene3d=None):
    """Per-view vote ids + validity (+ scene-reuse precomp gathers).

    Returns (ids, valid, precomp_3d_or_None). Without `vote_point_ids` in
    the batch, rows vote under their own index (shared-point-table bench
    shape). With it, -1 marks padding. In scene-reuse mode, rows whose id
    is out of the scene table's range or whose scene point was dropped
    (capacity / voxel overflow, `scene3d["point_valid"]`) are masked out of
    the vote — the gathers clamp silently, so an unmasked consumer would
    vote last-row/voxel-0 features (ADVICE r3)."""
    pv = batch["point_valid"]
    if "vote_point_ids" in batch:
        ids = batch["vote_point_ids"].astype(jnp.int32)
    else:
        ids = jnp.broadcast_to(jnp.arange(pv.shape[1]), pv.shape)
    valid = pv
    if scene3d is None:
        return ids, valid, None
    scene_rows = scene3d["pred_3d"].shape[1]
    gids = jnp.clip(ids, 0, scene_rows - 1)
    precomp = {
        "imp_condition": scene3d["imp_condition"],
        "pred_3d": jnp.take_along_axis(
            scene3d["pred_3d"], gids[..., None], axis=1
        ),
        "binary_scores": jnp.take_along_axis(
            scene3d["binary_scores"], gids, axis=1
        ),
    }
    valid = valid & (ids >= 0) & (ids < scene_rows)
    if "point_valid" in scene3d:
        valid = valid & jnp.take_along_axis(scene3d["point_valid"], gids, axis=1)
    return ids, valid, precomp


def make_view_body(model, cfg):
    """One view's forward + route + vote update, as a plain (un-jitted)
    function usable standalone or inside a scan.

    Signature: view_body(variables, batch, statics, votes, counter,
    scene3d=None) -> (votes, counter). `scene3d` is the optional
    scene-reuse precompute (engine/scene_reuse.py)."""
    mc = model.cfg

    def view_body(variables, batch, statics, votes, counter, scene3d=None):
        p_view = batch["point_valid"].shape[1]
        identity_ids = "vote_point_ids" not in batch
        ids, valid, precomp = resolve_vote_ids(batch, scene3d)
        kwargs = {} if precomp is None else {"precomp_3d": precomp}
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)}, **kwargs,
        )
        routed = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        pred = routed["pred"]
        if (
            identity_ids
            and p_view == votes.shape[0]
            and batch["point_valid"].shape[0] == 1
        ):
            # point ids are the identity here (the per-view capacity IS the
            # vote table), so the scatter-add in device_vote_add degenerates
            # to a masked one-hot accumulate — much cheaper than a TPU
            # scatter over 32k rows
            upd = valid[0].astype(jnp.int32)
            onehot = jax.nn.one_hot(pred[0], votes.shape[1], dtype=jnp.int32)
            return votes + onehot * upd[:, None], counter + upd
        return device_vote_add(
            votes, counter, ids.reshape(-1), pred.reshape(-1),
            valid.reshape(-1),
        )

    return view_body


def make_scene_scan_step(model, cfg, scene_reuse: bool = False):
    """jit(scene_scan)(variables, stacked_views, idxseq, statics, votes,
    counter[, scene3d]) -> (votes, counter).

    `stacked_views`: the per-view batch pytree with a leading view axis
    (tree_map(stack) over identically-shaped view batches). `idxseq` (V,)
    int32 selects which stacked view each scan step consumes (permits
    cycling a bounded distinct-view buffer)."""
    view_body = make_view_body(model, cfg)

    def scene_scan(variables, stacked, idxseq, statics, votes, counter,
                   *extra):
        def body(carry, i):
            b = jax.tree_util.tree_map(lambda x: x[i], stacked)
            return view_body(variables, b, statics, *carry, *extra), None

        (votes, counter), _ = jax.lax.scan(body, (votes, counter), idxseq)
        return votes, counter

    if scene_reuse:
        return jax.jit(scene_scan)
    return jax.jit(lambda v, s, i, st, vo, co: scene_scan(v, s, i, st, vo, co))


def fresh_vote_state(max_points: int, num_classes: int):
    return (
        jnp.zeros((max_points, num_classes), jnp.int32),
        jnp.zeros((max_points,), jnp.int32),
    )


def stack_scene_views(scene, caps, num_base: int):
    """Collate a ScanNetSceneViews scene dict into the stacked pytree for
    make_scene_scan_step, with per-view scene point ids plumbed.

    View row r holds the r-th visible scene point (the layout
    ScanNetSceneViews.scene produces), so `vote_point_ids[v, r]` is the
    scene row that view v's row r votes for; rows that are capacity padding
    or whose voxel overflowed (interior point_valid holes — use the MASK,
    never a prefix count) stay -1 and are excluded by resolve_vote_ids.

    Returns (stacked, idxseq, n_scene_points); size the vote table with
    fresh_vote_state(n_scene_points, ...) — scene ids are NOT clamped to
    the per-view capacity."""
    import numpy as np

    from xmask3d_tpu.data.batching import collate_views
    from xmask3d_tpu.engine.infer import view_scene_ids

    batches = []
    for view in scene["views"]:
        b = collate_views([view["sample"]], caps, num_base=num_base)
        pv = np.asarray(b["point_valid"][0])
        rows, sids, keep = view_scene_ids(view["visible"], pv)
        ids = np.full((1, pv.shape[0]), -1, np.int32)
        ids[0, rows[keep]] = sids[keep]
        b["vote_point_ids"] = ids
        batches.append(b)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], 0), *batches
    )
    idxseq = jnp.arange(len(batches), dtype=jnp.int32)
    return stacked, idxseq, len(scene["coords"])
