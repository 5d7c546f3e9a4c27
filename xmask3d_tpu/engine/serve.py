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
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from xmask3d_tpu.engine.infer import device_vote_add, ensemble_and_route


def make_view_body(model, cfg):
    """One view's forward + route + vote update, as a plain (un-jitted)
    function usable standalone or inside a scan.

    Signature: view_body(variables, batch, statics, votes, counter,
    scene3d=None) -> (votes, counter). `scene3d` is the optional
    scene-reuse precompute (engine/scene_reuse.py)."""
    mc = model.cfg

    def view_body(variables, batch, statics, votes, counter, scene3d=None):
        p_view = batch["point_valid"].shape[1]
        ids = jnp.broadcast_to(jnp.arange(p_view), batch["point_valid"].shape)
        kwargs = {}
        if scene3d is not None:
            kwargs["precomp_3d"] = {
                "imp_condition": scene3d["imp_condition"],
                "pred_3d": jnp.take_along_axis(
                    scene3d["pred_3d"], ids[..., None], axis=1
                ),
                "binary_scores": jnp.take_along_axis(
                    scene3d["binary_scores"], ids, axis=1
                ),
            }
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)}, **kwargs,
        )
        routed = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        pred = routed["pred"]
        if p_view == votes.shape[0] and batch["point_valid"].shape[0] == 1:
            # point ids are the identity here (the per-view capacity IS the
            # vote table), so the scatter-add in device_vote_add degenerates
            # to a masked one-hot accumulate — much cheaper than a TPU
            # scatter over 32k rows
            valid = batch["point_valid"][0]
            upd = valid.astype(jnp.int32)
            onehot = jax.nn.one_hot(pred[0], votes.shape[1], dtype=jnp.int32)
            return votes + onehot * upd[:, None], counter + upd
        return device_vote_add(
            votes, counter, ids.reshape(-1), pred.reshape(-1),
            batch["point_valid"].reshape(-1),
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
