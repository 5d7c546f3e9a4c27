"""Training entry point.

Capability parity with the reference run/train.py:main/main_worker/train_net
(arg+YAML parsing, seeding, distributed setup, epoch loop with contra-loss
warmup gating, per-iter LR schedule, metric logging, checkpoint cadence,
periodic validation) — re-expressed as: one mesh, one jit-compiled
train_step, host data pipeline feeding sharded batches.

CLI: python -m xmask3d_tpu.engine.train --config configs/scannet/...yaml \
        [KEY VALUE ...]        (same override contract as util/config.py)
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.config import Config, load_config
from xmask3d_tpu.checkpoint.orbax_io import Checkpointer
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.engine.builder import capacities_from_cfg, init_model
from xmask3d_tpu.engine.train_step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from xmask3d_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from xmask3d_tpu.utils.logging import MetricsWriter, get_logger

logger = get_logger()


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("xmask3d_tpu training")
    p.add_argument("--config", required=True)
    p.add_argument("--save_path", default="runs/default")
    p.add_argument("--resume", default="")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (no ScanNet assets needed)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model variant (smoke runs)")
    p.add_argument("--allow_hash_tokenizer", action="store_true",
                   help="permit the HashTokenizer fallback on real data "
                        "(from-scratch runs only; incompatible with "
                        "pretrained CLIP weights)")
    p.add_argument("opts", nargs="*", help="KEY VALUE override pairs")
    return p


def make_data_iter(
    cfg: Config,
    caps: Capacities,
    synthetic: bool,
    tiny: bool = False,
    split: str = "train",
    allow_hash_tokenizer: bool = False,
):
    """Build a batch iterator for the given split.

    Returns (iterator, samples_per_host, dataset): samples_per_host is the
    number of per-host samples per epoch (dataset length incl. the `loop`
    multiplier, reference train.py:229-264), or None for synthetic data.
    `dataset` is the ScanNetViews instance (None for synthetic) — the
    trainer sets `.epoch` on the val dataset before each validation pass so
    val-view iteration is deterministic (reference train.py:321).
    """
    if synthetic:
        from xmask3d_tpu.data.synthetic import synthetic_batch

        kw = {}
        if tiny:
            kw = dict(num_points=400, image_size=(64, 64),
                      mask_shape=tuple(cfg.mask_shape), context_length=16,
                      vocab_size=512)
        # distinct seed streams per split: the val stream must never be the
        # train stream (reference uses a separate val loader, train.py:260-264)
        seed0 = 0 if split == "train" else 1_000_000

        def it():
            seed = seed0
            while True:
                yield synthetic_batch(
                    cfg.batch_size, caps, seed=seed, num_classes=cfg.classes, **kw
                )
                seed += 1

        return it(), None, None

    from xmask3d_tpu.data.scannet import ScanNetConfig, ScanNetViews
    from xmask3d_tpu.data.tokenizer import require_real_tokenizer
    from xmask3d_tpu.engine.builder import data_tokenizer

    train = split == "train"
    ds_cfg = ScanNetConfig(
        data_root=cfg.data_root,
        data_root_2d=cfg.data_root_2d,
        caption_path=cfg.caption_path,
        label_2d=cfg.label_2d,
        base_category=cfg.category_split.base_category,
        novel_category=cfg.category_split.novel_category,
        ignore_category=cfg.category_split.ignore_category,
        voxel_size=cfg.voxel_size,
        split=split,
        aug=cfg.aug if train else False,
        loop=cfg.loop if train else 1,
        input_color=cfg.input_color,
        scannet200=cfg.scannet200,
    )
    tok = data_tokenizer(cfg, tiny=tiny)
    require_real_tokenizer(tok, allow_hash_tokenizer)
    ds = ScanNetViews(ds_cfg, caps, tok, seed=cfg.manual_seed)

    # shard by host (replaces DistributedSampler, train.py:229-233)
    order0 = np.random.RandomState(cfg.manual_seed).permutation(len(ds))
    order0 = order0[jax.process_index() :: max(jax.process_count(), 1)]

    def index_iter():
        i = 0
        while True:
            yield [
                order0[(i + k) % len(order0)] for k in range(cfg.batch_size)
            ]
            i += cfg.batch_size

    workers = int(cfg.get("workers", 0))
    if workers > 0 and train:
        # parallel batch construction (reference DataLoader workers,
        # train.py:210-244); scene reads hit the RAM cache in ScanNetViews.
        # Val stays serial: prefetched val batches would be built before
        # the trainer sets ds.epoch, breaking deterministic view iteration.
        from xmask3d_tpu.data.prefetch import parallel_map_iterator

        iterator = parallel_map_iterator(ds.batch, index_iter(), workers)
    else:
        iterator = (ds.batch(idx) for idx in index_iter())
    return iterator, len(order0), ds


def val_batch_count(val_samples, batch_size: int, val_batches_default: int = 4) -> int:
    """Batches per validation pass: the reference validates the ENTIRE val
    split every eval_freq (train.py:881-1385), so real datasets use
    ceil(|val| / batch); synthetic smoke runs (val_samples is None) keep
    the bounded val_batches knob."""
    if val_samples is not None:
        return max(1, -(-val_samples // batch_size))
    return val_batches_default


def main(argv=None):
    args = get_parser().parse_args(argv)
    cfg = load_config(args.config, args.opts)
    caps = capacities_from_cfg(cfg)
    np.random.seed(cfg.manual_seed)

    mesh_shape = cfg.get("mesh_shape", {"data": -1, "model": 1})
    mesh = create_mesh(mesh_shape.get("data", -1), mesh_shape.get("model", 1))
    logger.info(f"mesh: {mesh}")

    data, n_samples, _ = make_data_iter(
        cfg, caps, args.synthetic, tiny=args.tiny,
        allow_hash_tokenizer=args.allow_hash_tokenizer,
    )
    first = next(data)
    batch0 = jax.tree_util.tree_map(jnp.asarray, first)

    logger.info("=> creating model ...")
    model, variables, statics = init_model(cfg, batch0, tiny=args.tiny)
    variables = {"params": shard_params(variables["params"], mesh),
                 "batch_stats": variables["batch_stats"]}

    # dataset-derived epoch accounting (reference train.py:229-264:
    # len(dataset) already includes the `loop` multiplier); synthetic runs
    # fall back to the steps_per_epoch config knob.
    if n_samples is not None:
        steps_per_epoch = max(1, n_samples // cfg.batch_size)
    else:
        steps_per_epoch = max(1, cfg.get("steps_per_epoch", 100))
    total_steps = cfg.epochs * steps_per_epoch
    optimizer = make_optimizer(
        cfg.lr_3d, cfg.lr_others, total_steps,
        schedule=cfg.learning_rate_type, power=cfg.power,
    )
    state = create_train_state(model, variables, optimizer, seed=cfg.manual_seed)

    train_step = make_train_step(model, optimizer, dict(cfg.loss_weight))
    train_step = jax.jit(train_step, donate_argnums=(0,))

    ckpt = Checkpointer(os.path.join(args.save_path, "model"))
    start_epoch = cfg.start_epoch
    resumed_best_iou = 0.0
    if args.resume:
        state, meta = ckpt.restore(state)
        start_epoch = meta["step"] // steps_per_epoch
        resumed_best_iou = float(meta.get("best_iou", 0.0))
        logger.info(
            f"resumed from step {meta['step']} (best_iou {resumed_best_iou:.4f})"
        )

    writer = MetricsWriter(args.save_path)
    statics_dev = jax.tree_util.tree_map(jnp.asarray, statics)

    # held-out validation stream (reference val loader, train.py:260-264)
    val_data = None
    val_ds = None
    best_iou = resumed_best_iou
    if cfg.evaluate:
        val_data, val_samples, val_ds = make_data_iter(
            cfg, caps, args.synthetic, tiny=args.tiny, split="val",
            allow_hash_tokenizer=args.allow_hash_tokenizer,
        )

    for epoch in range(start_epoch, cfg.epochs):
        contra_on = jnp.asarray(
            1.0 if (cfg.mask_contra_3d and epoch >= cfg.start_contra) else 0.0
        )
        t_data = t_step = 0.0
        for it in range(steps_per_epoch):
            t0 = time.time()
            batch = shard_batch(next(data) if epoch or it else first, mesh)
            t1 = time.time()
            state, metrics = train_step(state, batch, statics_dev, contra_on)
            metrics["loss_total"].block_until_ready()
            t2 = time.time()
            t_data += t1 - t0
            t_step += t2 - t1
            step = int(state.step)
            if step % cfg.print_freq == 0:
                skip = ("loss_ce_", "loss_mask_", "loss_dice_", "metric_")
                host = {
                    k: float(v) for k, v in metrics.items()
                    if not k.startswith(skip)
                }
                inter = np.asarray(metrics["metric_train_inter"])
                union = np.asarray(metrics["metric_train_union"])
                host["train_mIoU"] = float(
                    (inter / np.maximum(union, 1e-10)).mean()
                )
                logger.info(
                    f"epoch {epoch} it {it} step {step} "
                    f"loss {host['loss_total']:.4f} mIoU {host['train_mIoU']:.3f} "
                    f"data {t_data:.1f}s step {t_step:.1f}s"
                )
                writer.add_scalars(host, step, prefix="train/")
        # periodic validation on the held-out split
        # (reference train.py:881-1385 validate())
        if cfg.evaluate and (epoch + 1) % cfg.eval_freq == 0:
            from xmask3d_tpu.engine.validate import (
                make_validate_step,
                run_validation,
            )

            if val_ds is not None:
                # deterministic val-view iteration (reference train.py:321)
                val_ds.epoch = epoch - 1
            validate_step = make_validate_step(model, cfg)
            variables_eval = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            n_val = val_batch_count(
                val_samples, cfg.batch_size, cfg.get("val_batches", 4)
            )
            val_batches = (
                shard_batch(next(val_data), mesh) for _ in range(n_val)
            )
            summary = run_validation(
                validate_step, variables_eval, statics_dev, val_batches,
                cfg.category_split.base_category,
                cfg.category_split.novel_category,
                cfg.test_classes,
            )
            logger.info(f"val epoch {epoch}: {summary}")
            writer.add_scalars(summary, int(state.step), prefix="val/")
            best_iou = max(best_iou, summary.get("hIoU", 0.0))

        if (epoch + 1) % cfg.save_freq == 0:
            ckpt.save(int(state.step), state, best_iou=best_iou)
            logger.info(
                f"saved checkpoint at step {int(state.step)} "
                f"(best_iou {best_iou:.4f})"
            )
    writer.close()


if __name__ == "__main__":
    main()
