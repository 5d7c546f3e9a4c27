"""Whole-scene inference: per-view forward + ensemble + multi-view voting.

Capability parity with the reference run/infer.py:338-790 (validate):
- per view: eval forward, geometric-mean ensemble of fused-feature logits
  with MaskCLIP open logits per final 3D mask (infer.py:585-612) using
  base_ratio/novel_ratio, base/novel binary routing (infer.py:604-640),
  per-point vote accumulation (infer.py:642-647);
- per scene: argmax of votes, nearest-neighbor fill of never-seen points via
  KDTree (infer.py:682-694), IoU meters split base/novel.

The per-view ensemble/routing runs on device inside one jit; voting and the
KD-tree fill stay on host (tiny work, dynamic shapes).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.utils.metrics import hiou


def ensemble_and_route(
    outputs: Dict[str, jnp.ndarray],
    base_category: Sequence[int],
    novel_category: Sequence[int],
    num_test_classes: int,
    base_ratio: float = 0.65,
    novel_ratio: float = 0.35,
) -> Dict[str, jnp.ndarray]:
    """Per-point class predictions for one view (device side).

    Returns dict of (B, P) int32 predictions: 'pred' (fused+open ensemble),
    'pred_2d', 'pred_3d', plus 'point_valid_pred' mask.
    """
    text = outputs["text_embed_test"]
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    logit_scale = outputs["logit_scale"]

    def norm(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    fused = norm(outputs["fused_pred_feature"].astype(jnp.float32))
    feat2d = norm(outputs["2d_pred_feature"].astype(jnp.float32))
    feat3d = norm(outputs["pure3d_pred_feature"].astype(jnp.float32))

    logits = jax.nn.softmax(
        logit_scale * jnp.einsum("bpc,lc->bpl", fused, text), axis=-1
    )
    open_embed = norm(outputs["final_pred_open_embedding"].astype(jnp.float32))
    open_logits = jax.nn.softmax(
        logit_scale * jnp.einsum("bqc,lc->bql", open_embed, text), axis=-1
    )

    ncls = text.shape[0]
    overlap = jnp.isin(
        jnp.arange(ncls), jnp.asarray(list(base_category))
    ).astype(jnp.float32)

    # geometric-mean ensemble per final 3D mask (infer.py:585-602).
    # Later masks overwrite earlier ones on shared points, as in the
    # reference's sequential loop — emulate with a "last covering mask"
    # index per point.
    mask_3d = outputs["final_mask_3d"] & outputs["final_mask_valid"][:, :, None]
    q = mask_3d.shape[1]
    q_ids = jnp.arange(q)[None, :, None]
    last_q = jnp.max(jnp.where(mask_3d, q_ids, -1), axis=1)  # (B, P)
    covered = last_q >= 0
    open_per_point = jnp.take_along_axis(
        open_logits, jnp.clip(last_q, 0)[:, :, None], axis=1
    )  # (B, P, L)

    def geo(a, b, r):
        return jnp.log(jnp.clip(a, 1e-30) ** r * jnp.clip(b, 1e-30) ** (1 - r))

    ens = geo(logits, open_per_point, base_ratio) * overlap + geo(
        logits, open_per_point, novel_ratio
    ) * (1 - overlap)
    logits_final = jnp.where(covered[..., None], ens, jnp.log(jnp.clip(logits, 1e-30)))

    binary_pred = outputs["binary_pred"].astype(jnp.float32)[..., None]
    neg = jnp.asarray(-1e10, jnp.float32)
    base_cols = jnp.isin(jnp.arange(ncls), jnp.asarray(list(base_category)))
    novel_cols = jnp.isin(jnp.arange(ncls), jnp.asarray(list(novel_category)))

    def route(lg):
        lg_novel = jnp.where(base_cols, neg, lg)
        lg_base = jnp.where(novel_cols, neg, lg)
        return binary_pred * lg_base + (1 - binary_pred) * lg_novel

    pred = jnp.argmax(route(logits_final), axis=-1)
    logits_3d = logit_scale * jnp.einsum("bpc,lc->bpl", feat3d, text)
    return {
        "pred": pred.astype(jnp.int32),
        "pred_3d": jnp.argmax(route(logits_3d), -1).astype(jnp.int32),
        "covered_2d": outputs["covered"],
        # the 2D branch prediction needs the per-view nearest-covered fill
        # first (reference infer.py:527-548); the host computes the match
        # indices from coords, then fill_and_route_2d finishes on device.
        "feat_2d": feat2d,
        "binary_pred": binary_pred[..., 0],
        "text": text,
        "logit_scale": logit_scale,
    }


def fill_and_route_2d(
    feat_2d: jnp.ndarray,  # (B, P, C) normalized painted 2D features
    match_idx: jnp.ndarray,  # (B, P) int32: nearest covered point per point
    binary_pred: jnp.ndarray,  # (B, P) float {0,1}
    text: jnp.ndarray,  # (L, C) normalized text bank
    logit_scale: jnp.ndarray,
    base_category: Sequence[int],
    novel_category: Sequence[int],
) -> jnp.ndarray:
    """Per-view KDTree fill of zero-2D-feature points + binary routing of the
    2D logits (reference run/infer.py:527-548 fill, :617-642 routing).

    `match_idx` is identity for covered points and the nearest covered
    point's index for uncovered ones (host KDTree on the view's coords);
    the feature gather and the P x L logits stay on device.
    """
    filled = jnp.take_along_axis(feat_2d, match_idx[..., None], axis=1)
    logits = logit_scale * jnp.einsum(
        "bpc,lc->bpl", filled.astype(jnp.float32), text
    )
    ncls = text.shape[0]
    neg = jnp.asarray(-1e10, jnp.float32)
    base_cols = jnp.isin(jnp.arange(ncls), jnp.asarray(list(base_category)))
    novel_cols = jnp.isin(jnp.arange(ncls), jnp.asarray(list(novel_category)))
    lg_novel = jnp.where(base_cols, neg, logits)
    lg_base = jnp.where(novel_cols, neg, logits)
    routed = binary_pred[..., None] * lg_base + (1 - binary_pred[..., None]) * lg_novel
    return jnp.argmax(routed, -1).astype(jnp.int32)


def nearest_covered_match(
    coords: np.ndarray, covered: np.ndarray, valid: np.ndarray
) -> np.ndarray:
    """Host side of the per-view fill: for every valid uncovered point, the
    index of the nearest valid covered point (identity elsewhere)."""
    from scipy.spatial import cKDTree

    p = len(covered)
    match = np.arange(p, dtype=np.int32)
    cov = covered & valid
    unc = (~covered) & valid
    if not cov.any() or not unc.any():
        return match
    cov_idx = np.where(cov)[0]
    tree = cKDTree(coords[cov_idx])
    _, nn = tree.query(coords[np.where(unc)[0]], k=1)
    match[unc] = cov_idx[nn].astype(np.int32)
    return match


def kdtree_fill(
    coords: np.ndarray, values: np.ndarray, known: np.ndarray
) -> np.ndarray:
    """Fill unknown rows with the nearest known row's value
    (reference infer.py:682-694, sklearn KDTree -> scipy cKDTree)."""
    from scipy.spatial import cKDTree

    if known.all() or not known.any():
        return values
    tree = cKDTree(coords[known])
    _, nn = tree.query(coords[~known], k=1)
    out = values.copy()
    known_idx = np.where(known)[0]
    out[~known] = values[known_idx[nn]]
    return out


def view_scene_ids(visible, pv, scene_pv=None):
    """Map view rows to scene point ids under the static-capacity layout.

    View row r holds the r-th visible scene point (the order
    ScanNetSceneViews.scene / synthetic_scene produce). Returns
    (rows, sids, keep): aligned arrays over min(#visible, P_cap) entries;
    `keep` is the vote mask — the batch's point_valid at those rows
    (interior voxel-overflow holes included; NEVER a prefix count, see
    collate_views' `pv &= ir < v`) and, when `scene_pv` is given, the
    scene batch's validity at the target scene point (dropped scene points
    must not be voted — gathers clamp silently).
    """
    sids = np.where(visible)[0][: pv.shape[0]]
    rows = np.arange(len(sids))
    keep = np.asarray(pv[: len(sids)], bool).copy()
    if scene_pv is not None:
        keep &= sids < len(scene_pv)
        keep &= scene_pv[np.clip(sids, 0, len(scene_pv) - 1)]
    return rows, sids, keep


def device_vote_add(votes, counter, point_ids, preds, valid):
    """On-device SceneVoter.add_view: one scatter-add per view.

    votes (P, C) i32, counter (P,) i32 live in device HBM for the whole
    scene; point_ids/preds/valid are per-view (N,). The TPU-native voting
    design: the multi-view loop (reference infer.py:642-647) keeps its
    state on device and transfers one argmax per scene instead of one
    prediction per view — host<->device traffic is per-scene, not per-view.
    """
    import jax.numpy as jnp

    upd = valid.astype(jnp.int32)
    # negative ids must map to a truly out-of-range sentinel: .at keeps
    # numpy negative-index semantics even under mode="drop", so a raw -1
    # would increment the LAST point's row instead of being dropped
    ids = jnp.where(point_ids >= 0, point_ids, votes.shape[0])
    votes = votes.at[ids, preds].add(upd, mode="drop")
    counter = counter.at[ids].add(upd, mode="drop")
    return votes, counter


class SceneVoter:
    """Multi-view per-point class voting for one scene
    (reference infer.py:395-427, 642-694)."""

    def __init__(self, num_points: int, num_classes: int):
        self.votes = np.zeros((num_points, num_classes), np.int32)
        self.counter = np.zeros((num_points,), np.int32)

    def add_view(self, point_ids: np.ndarray, preds: np.ndarray):
        self.votes[point_ids, preds] += 1
        self.counter[point_ids] += 1

    def finalize(self, coords: np.ndarray) -> np.ndarray:
        pred = self.votes.argmax(1)
        seen = self.counter > 0
        return kdtree_fill(coords, pred, seen)


def evaluate_scene_predictions(
    pred: np.ndarray,
    gt: np.ndarray,
    num_classes: int,
    base_category: Sequence[int],
    novel_category: Sequence[int],
    ignore: Sequence[int] = (255,),
) -> Dict[str, np.ndarray]:
    """Histogram IoU accumulators for one scene (host)."""
    keep = ~np.isin(gt, list(ignore))
    p, g = pred[keep], gt[keep]
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    target = np.zeros(num_classes)
    for c in range(num_classes):
        pi, gi = p == c, g == c
        inter[c] = (pi & gi).sum()
        union[c] = (pi | gi).sum()
        target[c] = gi.sum()
    return {"inter": inter, "union": union, "target": target}


def summarize_iou(
    acc: Dict[str, np.ndarray],
    base_category: Sequence[int],
    novel_category: Sequence[int],
) -> Dict[str, float]:
    iou = acc["inter"] / np.maximum(acc["union"], 1e-10)
    miou_base = float(iou[list(base_category)].mean())
    miou_novel = float(iou[list(novel_category)].mean())
    return {
        "mIoU_base": miou_base,
        "mIoU_novel": miou_novel,
        "hIoU": hiou(miou_base, miou_novel),
        "mIoU": float(iou.mean()),
    }
