"""Fused-stem path (xmask3d.run_3d): both 3D UNets' k5 stems as one conv.

The serving optimization concatenates the two stem kernels along the output
dim and runs a single sparse conv over the shared kmap5 table
(XMASK3D_FUSED_STEM, default on). It must be a pure refactor: identical
param tree, and run_3d outputs numerically equal to the per-UNet stems.
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
    return cfg, caps, batch, model, variables, statics


def _run3d(model, variables, batch):
    out = model.apply(variables, batch, False, method=type(model).run_3d)
    return jax.tree_util.tree_map(np.asarray, out)


def test_fused_stem_matches_separate(tiny_model, monkeypatch):
    _, _, batch, model, variables, _ = tiny_model
    monkeypatch.setenv("XMASK3D_FUSED_STEM", "1")
    fused = _run3d(model, variables, batch)
    monkeypatch.setenv("XMASK3D_FUSED_STEM", "0")
    sep = _run3d(model, variables, batch)
    for k in ("imp_condition", "pred_3d", "binary_scores"):
        np.testing.assert_allclose(
            fused[k].astype(np.float32), sep[k].astype(np.float32),
            rtol=2e-2, atol=2e-2,
        )
        # the contraction per output column is unchanged, so agreement
        # should in fact be much tighter than the bf16-tolerance above
        mismatch = np.mean(
            np.abs(fused[k].astype(np.float32) - sep[k].astype(np.float32))
        )
        assert mismatch < 1e-3, (k, mismatch)


def test_fused_stem_param_tree_unchanged(tiny_model, monkeypatch):
    cfg, _, batch, model, variables, _ = tiny_model
    monkeypatch.setenv("XMASK3D_FUSED_STEM", "0")
    model2, variables2, _ = init_model(cfg, batch, tiny=True)
    p1 = jax.tree_util.tree_structure(variables)
    p2 = jax.tree_util.tree_structure(variables2)
    assert p1 == p2
    # identical values too: flax derives param RNG from the path, so the
    # weights-only pre-pass must not change initialization
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables, variables2,
    )
