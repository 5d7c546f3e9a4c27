"""Whole-scene inference entry point (reference run/infer.sh -> run/infer.py).

Per scene: iterate all accepted views, run the jit eval forward + on-device
ensemble/routing, accumulate per-point votes on host, KD-tree fill, report
hIoU / mIoU_base / mIoU_novel (reference infer.py:338-790).

TPU-first difference: the whole per-view compute (model + ensemble +
routing + argmax) is ONE jit program; only the integer vote scatter and the
KD-tree fill run on host.

CLI: python -m xmask3d_tpu.engine.infer_cli --config ... [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import collate_views
from xmask3d_tpu.engine.builder import capacities_from_cfg, init_model
from xmask3d_tpu.engine.infer import (
    SceneVoter,
    ensemble_and_route,
    evaluate_scene_predictions,
    fill_and_route_2d,
    nearest_covered_match,
    view_scene_ids,
    summarize_iou,
)
from xmask3d_tpu.utils.logging import get_logger

logger = get_logger()


def get_parser():
    p = argparse.ArgumentParser("xmask3d_tpu inference")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("--converted", default="",
                   help="converted-weights npz from "
                        "scripts/convert_checkpoints.py (the reference "
                        "b15n4.pth.tar + sd-v1 + open_clip load path)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model variant (CPU smoke runs)")
    p.add_argument("--num_scenes", type=int, default=0)
    p.add_argument("--save_ply", default="",
                   help="directory for GT/pred PLY dumps (infer.py:268-335)")
    p.add_argument("--allow_hash_tokenizer", action="store_true",
                   help="permit the HashTokenizer fallback on real data "
                        "(from-scratch runs only; incompatible with "
                        "pretrained CLIP weights)")
    p.add_argument("--scene_reuse", action="store_true",
                   default=os.environ.get("XMASK3D_SCENE_REUSE", "0") == "1",
                   help="voxelize each scene once and reuse its 3D features "
                        "across views (engine/scene_reuse.py; protocol "
                        "divergence from the reference — validate hIoU "
                        "before relying on it)")
    p.add_argument("--bf16_params", action="store_true",
                   default=os.environ.get("XMASK3D_BF16_PARAMS", "0") == "1",
                   help="store weights in bf16 for serving (halves weight "
                        "HBM traffic; compute already runs in the model "
                        "dtype — validate hIoU before relying on it)")
    p.add_argument("opts", nargs="*")
    return p


def cast_params_bf16(variables):
    """Serving-mode weight cast: params fp32 -> bf16, batch_stats untouched
    (BN running stats stay fp32)."""
    import jax.numpy as _jnp

    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map(
        lambda x: x.astype(_jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == _jnp.float32 else x,
        variables["params"],
    )
    return variables


def make_infer_step(model, cfg):
    mc = model.cfg

    @jax.jit
    def infer_step(variables, batch, statics):
        _, outputs = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        preds = ensemble_and_route(
            outputs,
            base_category=mc.base_category,
            novel_category=mc.novel_category,
            num_test_classes=mc.num_test_classes,
            base_ratio=cfg.base_ratio,
            novel_ratio=cfg.novel_ratio,
        )
        return preds

    route_2d = jax.jit(
        partial(
            fill_and_route_2d,
            base_category=mc.base_category,
            novel_category=mc.novel_category,
        )
    )
    return infer_step, route_2d


def run_scene(
    scene, infer_step, route_2d, variables, statics, caps, num_base, num_classes
):
    """Multi-view voting over one scene dict from ScanNetSceneViews.scene.

    Accumulates the fused-ensemble, 2D-branch, and 3D-branch predictions
    (reference infer.py:642-647 scene_pred / scene_pred_2d / scene_pred_3d),
    with the per-view nearest-covered fill of the 2D features
    (infer.py:527-548) before the 2D logits.
    """
    n_pts = len(scene["coords"])
    voters = {
        k: SceneVoter(n_pts, num_classes) for k in ("pred", "pred_2d", "pred_3d")
    }
    for view in scene["views"]:
        batch = collate_views([view["sample"]], caps, num_base=num_base)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        preds = infer_step(variables, batch, statics)
        pv = np.asarray(batch["point_valid"])[0]
        # view row r <-> r-th visible scene point; select by the actual
        # pv MASK (interior voxel-overflow holes), never a prefix count
        rows, sids, keep = view_scene_ids(view["visible"], pv)

        # host: nearest covered neighbor per uncovered point of this view
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


def main(argv=None):
    args = get_parser().parse_args(argv)
    cfg = load_config(args.config, args.opts)
    caps = capacities_from_cfg(cfg)

    if args.synthetic:
        from xmask3d_tpu.data.synthetic import synthetic_batch

        kw = {}
        if args.tiny:
            kw = dict(num_points=400, image_size=(64, 64),
                      mask_shape=tuple(cfg.mask_shape), context_length=16,
                      vocab_size=512)
        batch0 = synthetic_batch(1, caps, seed=0, num_classes=cfg.classes, **kw)
        batch0 = jax.tree_util.tree_map(jnp.asarray, batch0)
        model, variables, statics = init_model(cfg, batch0, tiny=args.tiny)
        if args.converted:
            from xmask3d_tpu.checkpoint.load_converted import apply_converted

            variables = jax.tree_util.tree_map(np.asarray, variables)
            variables, applied_p, applied_s = apply_converted(
                variables, args.converted
            )
            logger.info(
                f"loaded {len(applied_p)} params + {len(applied_s)} "
                f"batch_stats from {args.converted}"
            )
        if args.bf16_params:
            variables = cast_params_bf16(variables)
        infer_step, route_2d = make_infer_step(model, cfg)
        preds = infer_step(variables, batch0, statics)
        p_cap = preds["pred"].shape[1]
        pred_2d = route_2d(
            preds["feat_2d"],
            jnp.tile(jnp.arange(p_cap, dtype=jnp.int32)[None], (1, 1)),
            preds["binary_pred"].astype(jnp.float32),
            preds["text"],
            preds["logit_scale"],
        )
        logger.info(
            f"synthetic inference ok: pred shape {preds['pred'].shape}, "
            f"pred_2d shape {pred_2d.shape}"
        )
        if not args.num_scenes:
            return
        # --num_scenes N: the FULL whole-scene protocol (voting, KD-tree
        # fill, hIoU meters) over synthetic multi-view scenes — the
        # asset-free end-to-end drive of the evaluation loop
        from xmask3d_tpu.data.synthetic import synthetic_scene

        kw2 = dict(kw) if args.tiny else dict(
            image_size=(512, 512), mask_shape=tuple(cfg.mask_shape),
            context_length=77, vocab_size=49408,
        )
        kw2.pop("num_points", None)
        scenes = (
            synthetic_scene(
                caps, seed=100 + i, num_points=1200, num_views=3,
                num_classes=cfg.test_classes, **kw2,
            )
            for i in range(args.num_scenes)
        )
        return run_eval_scenes(
            scenes, args.num_scenes, cfg=cfg, caps=caps, variables=variables,
            statics=statics, infer_step=infer_step, route_2d=route_2d,
            num_base=cfg.classes,
        )

    from xmask3d_tpu.data.scannet import ScanNetConfig, ScanNetSceneViews
    from xmask3d_tpu.data.tokenizer import require_real_tokenizer
    from xmask3d_tpu.engine.builder import data_tokenizer

    ds_cfg = ScanNetConfig(
        data_root=cfg.data_root,
        data_root_2d=cfg.data_root_2d,
        caption_path=cfg.caption_path,
        label_2d=cfg.label_2d,
        base_category=cfg.category_split.base_category,
        novel_category=cfg.category_split.novel_category,
        ignore_category=cfg.category_split.ignore_category,
        voxel_size=cfg.voxel_size,
        split="val",
        scannet200=cfg.scannet200,
    )
    tok = data_tokenizer(cfg, tiny=args.tiny)
    require_real_tokenizer(tok, args.allow_hash_tokenizer)
    ds = ScanNetSceneViews(ds_cfg, caps, tok)

    n = args.num_scenes or len(ds.data_paths)
    scene0 = ds.scene(0)
    batch0 = collate_views(
        [scene0["views"][0]["sample"]], caps, num_base=len(ds_cfg.base_category)
    )
    batch0 = jax.tree_util.tree_map(jnp.asarray, batch0)
    # --tiny also applies to real data (CPU smoke runs over fixture scenes)
    model, variables, statics = init_model(cfg, batch0, tiny=args.tiny)
    if args.ckpt:
        from xmask3d_tpu.checkpoint.orbax_io import Checkpointer
        from xmask3d_tpu.engine.train_step import (
            create_train_state,
            make_optimizer,
        )

        opt = make_optimizer(cfg.lr_3d, cfg.lr_others, 1)
        state = create_train_state(model, variables, opt)
        state, _ = Checkpointer(args.ckpt).restore(state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.converted:
        from xmask3d_tpu.checkpoint.load_converted import apply_converted

        variables = jax.tree_util.tree_map(np.asarray, variables)
        variables, applied_p, applied_s = apply_converted(
            variables, args.converted
        )
        logger.info(
            f"loaded {len(applied_p)} params + {len(applied_s)} batch_stats "
            f"from {args.converted}"
        )
    if args.bf16_params:
        variables = cast_params_bf16(variables)
        logger.info("bf16 weight storage ON (serving mode)")

    if args.scene_reuse:
        from xmask3d_tpu.engine.scene_reuse import (
            make_reuse_infer_step,
            make_scene_3d_step,
            run_scene_reuse,
            scene_caps_from_view_caps,
        )

        scene_caps = scene_caps_from_view_caps(caps)
        scene_3d_step = make_scene_3d_step(model)
        infer_step, route_2d = make_reuse_infer_step(model, cfg)
        logger.info("scene-reuse mode ON (one 3D pass per scene)")
    else:
        infer_step, route_2d = make_infer_step(model, cfg)
        scene_3d_step = scene_caps = None
    # distributed eval: shard scenes across processes like the reference's
    # DistributedSampler infer (run/infer.py:170-187), metrics all-reduced
    pid, nproc = jax.process_index(), jax.process_count()
    my_ids = [i for i in range(n) if i % nproc == pid]
    return run_eval_scenes(
        ((ds.scene(i) if i else scene0) for i in my_ids), len(my_ids),
        cfg=cfg, caps=caps, variables=variables, statics=statics,
        infer_step=infer_step, route_2d=route_2d,
        num_base=len(ds_cfg.base_category),
        scene_reuse=args.scene_reuse, scene_3d_step=scene_3d_step,
        scene_caps=scene_caps, save_ply=args.save_ply,
        all_reduce=nproc > 1,
    )


def all_reduce_acc(acc_s):
    """Sum one stream's IoU histogram accumulators across processes
    (the reference's dist.all_reduce on the meters, run/infer.py:648-652).
    Histogram counts are integers; int32 transport is exact where fp32
    would round above 2^24 on whole-val-set runs."""
    from jax.experimental import multihost_utils

    out = {}
    for k, v in acc_s.items():
        v = np.asarray(v, np.int64)
        assert (np.abs(v) < 2**31).all()
        gathered = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(v, jnp.int32)),
            np.int64,
        )
        out[k] = gathered.sum(axis=0).astype(np.float64)
    return out


def run_eval_scenes(scene_iter, n, *, cfg, caps, variables, statics,
                    infer_step, route_2d, num_base, scene_reuse=False,
                    scene_3d_step=None, scene_caps=None, save_ply="",
                    all_reduce=False):
    """The full whole-scene evaluation protocol over an iterator of scene
    dicts: per-view forward + ensemble + routing, multi-view voting, KD-tree
    fill, and base/novel/hIoU meters for the three prediction streams
    (reference run/infer.py:338-790). With all_reduce=True (multi-process
    runs) the IoU accumulators are summed across hosts before summarizing —
    the reference's dist.all_reduce on the meters."""
    streams = ("pred", "pred_2d", "pred_3d")
    # per-class zero vectors, NOT scalar 0: a process with an empty scene
    # shard must still contribute shape-(num_classes,) accumulators to the
    # cross-process allgather
    acc = {
        s: {k: np.zeros(cfg.test_classes, np.float64)
            for k in ("inter", "union", "target")}
        for s in streams
    }
    t0 = time.time()
    for scene in scene_iter:
        if scene_reuse:
            from xmask3d_tpu.engine.scene_reuse import run_scene_reuse

            pred = run_scene_reuse(
                scene, scene_3d_step, infer_step, route_2d, variables,
                statics, caps, scene_caps, num_base,
                cfg.test_classes, voxel_size=cfg.voxel_size,
                input_color=cfg.input_color,
            )
        else:
            pred = run_scene(
                scene, infer_step, route_2d, variables, statics, caps,
                num_base, cfg.test_classes,
            )
        for s in streams:
            m = evaluate_scene_predictions(
                pred[s], scene["labels"].astype(np.int64), cfg.test_classes,
                cfg.category_split.base_category,
                cfg.category_split.novel_category,
                ignore=tuple(cfg.test_ignore_label) + (255,),
            )
            for k in acc[s]:
                acc[s][k] = acc[s][k] + m[k]
        if save_ply:
            from xmask3d_tpu.utils.visualization import save_colored_point_cloud

            save_colored_point_cloud(
                f"{save_ply}/{scene['name']}_pred.ply", scene["coords"],
                pred["pred"],
            )
            save_colored_point_cloud(
                f"{save_ply}/{scene['name']}_gt.ply", scene["coords"],
                scene["labels"].astype(np.int64),
            )
        logger.info(f"scene {scene['name']} done ({len(scene['views'])} views)")
    dt = time.time() - t0
    if all_reduce:
        acc = {s: all_reduce_acc(acc[s]) for s in streams}
    summary = {}
    for s in streams:
        si = summarize_iou(
            acc[s], cfg.category_split.base_category,
            cfg.category_split.novel_category,
        )
        suffix = "" if s == "pred" else "_" + s.split("_")[1]
        summary.update({k + suffix: v for k, v in si.items()})
    summary["scenes_per_sec"] = n / dt
    logger.info(str(summary))
    return summary


if __name__ == "__main__":
    main()
