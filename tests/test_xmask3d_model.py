"""End-to-end tiny-config XMask3D forward (train + eval)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import synthetic_batch
from xmask3d_tpu.engine.builder import init_model, build_statics

# compile-heavy: builds/compiles a full tiny model (excluded from make test-fast)
pytestmark = pytest.mark.e2e

TINY_CAPS = Capacities(max_points=512, max_voxels=256, max_targets=8)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    cfg.max_points = TINY_CAPS.max_points
    cfg.max_voxels = TINY_CAPS.max_voxels
    cfg.max_targets = TINY_CAPS.max_targets
    cfg.mask_shape = [24, 32]
    batch = synthetic_batch(
        2, TINY_CAPS, seed=0, num_points=400, image_size=(64, 64),
        mask_shape=(24, 32), context_length=16, vocab_size=512,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch, tiny=True)
    return cfg, model, variables, statics, batch


def test_eval_forward(tiny_setup):
    cfg, model, variables, statics, batch = tiny_setup
    _, outputs = model.apply(
        variables, batch, statics, train=False,
        rngs={"points": jax.random.PRNGKey(0)},
    )
    p = TINY_CAPS.max_points
    assert outputs["fused_pred_feature"].shape == (2, p, 768)
    assert outputs["pred_logits"].shape == (2, 50, cfg.test_classes + 1)
    assert outputs["mask_embed_clip"].shape[:2] == (2, 50)
    assert np.isfinite(np.asarray(outputs["fused_pred_feature"])).all()
    assert np.isfinite(np.asarray(outputs["pred_logits"])).all()


def test_train_forward_losses(tiny_setup):
    cfg, model, variables, statics, batch = tiny_setup
    (losses, outputs), _ = model.apply(
        variables, batch, statics, train=True,
        rngs={"points": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    expected = {
        "loss_ce", "loss_mask", "loss_dice", "loss_3d", "loss_3d_pure",
        "loss_3d_contra", "loss_explicit_contra", "loss_explicit_contra_3d",
        "loss_explicit_contra_2d_pre", "loss_binary",
    }
    assert expected.issubset(losses.keys())
    # aux layers 0..8 present
    for i in range(9):
        assert f"loss_ce_{i}" in losses
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
        if not k.startswith("metric_"):
            assert np.asarray(v).ndim == 0, k
    assert "metric_train_inter" in losses  # train-time IoU meters


@pytest.mark.slow
@pytest.mark.parametrize(
    "config",
    [
        "configs/scannet/xmask3d_scannet_B12N7.yaml",
        "configs/scannet/xmask3d_scannet_B10N9.yaml",
        "configs/scannet/xmask3d_scannet_B150N50.yaml",
    ],
)
def test_other_benchmark_configs_end_to_end(config):
    """B12N7 / B10N9 / ScanNet200-B150N50 category splits through the tiny
    end-to-end forward: different base/novel partitions change CategoryEmbed
    text-bank sizes, target compaction, and the routed logit column counts;
    the 200-class config also exercises the meta-file vocabulary side-car
    and 150/200-way heads."""
    cfg = load_config(config)
    cfg.max_points = TINY_CAPS.max_points
    cfg.max_voxels = TINY_CAPS.max_voxels
    cfg.max_targets = TINY_CAPS.max_targets
    cfg.mask_shape = [24, 32]
    batch = synthetic_batch(
        1, TINY_CAPS, seed=1, num_points=400, image_size=(64, 64),
        mask_shape=(24, 32), context_length=16, vocab_size=512,
        num_classes=cfg.classes,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch, tiny=True)
    (losses, _), _ = model.apply(
        variables, batch, statics, train=True,
        rngs={"points": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(losses["loss_ce"])).all()
    _, outputs = model.apply(
        variables, batch, statics, train=False,
        rngs={"points": jax.random.PRNGKey(0)},
    )
    assert outputs["pred_logits"].shape == (1, 50, cfg.test_classes + 1)
    assert np.isfinite(np.asarray(outputs["pred_logits"])).all()
