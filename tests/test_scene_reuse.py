"""Scene-level 3D-reuse serving mode (engine/scene_reuse.py).

1. Consistency: eval_forward(precomp_3d=run_3d(batch)) must equal the plain
   eval_forward exactly — the precomp path is a pure refactor of the trunk.
2. End-to-end: run_scene_reuse on a synthetic multi-view scene produces
   full-scene predictions with the same contract as the per-view protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as g
from xmask3d_tpu.engine.builder import init_model

# compile-heavy: builds/compiles a full tiny model (excluded from make test-fast)
pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def tiny_model():
    cfg, caps, batch = g._tiny_cfg_and_batch()
    cfg.arch_3d = "MinkUNet14A"
    cfg.arch_binary_head = "MinkUNet14A"
    cfg.dec_layers = 2
    cfg.pixel_enc_layers = 2
    model, variables, statics = init_model(cfg, batch, tiny=True)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)
    return cfg, caps, batch, model, variables, statics


def test_precomp_3d_matches_full_eval(tiny_model):
    cfg, caps, batch, model, variables, statics = tiny_model

    def full(variables, batch):
        _, out = model.apply(
            variables, batch, statics, train=False,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return out["fused_pred_feature"], out["pred_logits"], out["binary_sig"]

    def reuse(variables, batch):
        three_d = model.apply(
            variables, batch, False, method=type(model).run_3d
        )
        _, out = model.apply(
            variables, batch, statics, train=False, precomp_3d=three_d,
            rngs={"points": jax.random.PRNGKey(0)},
        )
        return out["fused_pred_feature"], out["pred_logits"], out["binary_sig"]

    ref = jax.jit(full)(variables, batch)
    got = jax.jit(reuse)(variables, batch)
    for r, o in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_run_scene_reuse_end_to_end(tiny_model):
    cfg, caps, _, model, variables, statics = tiny_model
    from xmask3d_tpu.data.synthetic import synthetic_scene
    from xmask3d_tpu.engine.scene_reuse import (
        make_reuse_infer_step,
        make_scene_3d_step,
        run_scene_reuse,
        scene_caps_from_view_caps,
    )

    scene = synthetic_scene(
        caps, seed=3, num_points=1200, num_views=2, num_classes=cfg.classes,
        image_size=(64, 64), mask_shape=tuple(cfg.mask_shape),
        context_length=16, vocab_size=512,
    )
    scene_caps = scene_caps_from_view_caps(caps, factor=4)
    scene_3d_step = make_scene_3d_step(model)
    infer_step, route_2d = make_reuse_infer_step(model, cfg)
    pred = run_scene_reuse(
        scene, scene_3d_step, infer_step, route_2d, variables, statics,
        caps, scene_caps, num_base=cfg.classes, num_classes=cfg.test_classes,
        voxel_size=0.05,
    )
    for k in ("pred", "pred_2d", "pred_3d"):
        assert pred[k].shape == (len(scene["coords"]),)
        assert pred[k].min() >= 0 and pred[k].max() < cfg.test_classes
