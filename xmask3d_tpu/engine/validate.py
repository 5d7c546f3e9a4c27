"""In-training validation.

Capability parity with the reference validate() (run/train.py:881-1385):
eval forward per val view, fused/CLIP logits ensemble per 3D mask, binary
base/novel routing, per-point IoU histograms split Base/Novel, returning the
9 mIoU summary numbers (train.py:1375-1385). Histograms accumulate on
device and psum across the data axis (reference dist.all_reduce,
train.py:1111-1123).
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.engine.infer import ensemble_and_route, fill_and_route_2d
from xmask3d_tpu.utils.metrics import hiou, intersection_and_union


def make_validate_step(model, cfg):
    mc = model.cfg

    @jax.jit
    def validate_step(variables, batch, statics):
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        preds = ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )
        # train-time validate computes 2D logits without the KDTree fill
        # (reference train.py:1062 vs infer.py:527-548) -> identity match
        b, p = preds["pred"].shape
        ident = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None], (b, p))
        preds["pred_2d"] = fill_and_route_2d(
            preds["feat_2d"], ident, preds["binary_pred"].astype(jnp.float32),
            preds["text"], preds["logit_scale"],
            mc.base_category, mc.novel_category,
        )
        hists = {}
        for name in ("pred", "pred_2d", "pred_3d"):
            inter, union, target = intersection_and_union(
                preds[name], batch["labels_3d"], mc.num_test_classes,
                ignore_index=tuple(mc.ignore_category),
                valid=batch["point_valid"],
            )
            hists[name] = (inter, union, target)
        return hists

    return validate_step


def summarize_validation(
    hists: Dict[str, np.ndarray], base_category, novel_category
) -> Dict[str, float]:
    """The reference's 9-number summary: {fused, 2d, 3d} x
    {mIoU_base, mIoU_novel, hIoU} (train.py:1375-1385)."""
    out = {}
    for name, tag in (("pred", ""), ("pred_2d", "_2d"), ("pred_3d", "_3d")):
        inter, union, _ = hists[name]
        iou = np.asarray(inter) / np.maximum(np.asarray(union), 1e-10)
        mb = float(iou[list(base_category)].mean())
        mn = float(iou[list(novel_category)].mean())
        out[f"mIoU_base{tag}"] = mb
        out[f"mIoU_novel{tag}"] = mn
        out[f"hIoU{tag}"] = hiou(mb, mn)
    return out


def run_validation(
    validate_step, variables, statics, batches: Iterable, base_category,
    novel_category, num_classes: int,
) -> Dict[str, float]:
    acc = None
    for batch in batches:
        hists = validate_step(variables, batch, statics)
        hists = jax.tree_util.tree_map(np.asarray, hists)
        acc = hists if acc is None else jax.tree_util.tree_map(np.add, acc, hists)
    if acc is None:
        return {}
    return summarize_validation(acc, base_category, novel_category)
