import pytest
import numpy as np
import jax
import jax.numpy as jnp

from xmask3d_tpu.ops.sparse_conv import build_hierarchy, stack_hierarchies
from xmask3d_tpu.models.minkunet import mink_unet

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e

CAPS = (256, 128, 64, 32, 16)


def make_batch(batch=2, n=180, seed=0):
    rng = np.random.RandomState(seed)
    hs, feats = [], np.zeros((batch, CAPS[0], 3), np.float32)
    for b in range(batch):
        c = np.unique(rng.randint(0, 20, size=(n, 3)), axis=0).astype(np.int32)
        hs.append(build_hierarchy(c, CAPS))
        feats[b, : len(c)] = rng.randn(len(c), 3)
    return jax.tree_util.tree_map(jnp.asarray, stack_hierarchies(hs)), jnp.asarray(feats)


def test_minkunet_forward_shapes():
    h, feats = make_batch()
    model = mink_unet(out_channels=12, arch="MinkUNet14A")
    variables = model.init(jax.random.PRNGKey(0), feats, h, train=False)
    bottleneck, out = model.apply(variables, feats, h, train=False)
    assert bottleneck.shape == (2, CAPS[4], 256)
    assert out.shape == (2, CAPS[0], 12)
    assert np.isfinite(np.asarray(out)).all()
    # padded voxels stay zero
    valid = np.asarray(h.levels[0].valid)
    assert np.abs(np.asarray(out)[~valid]).max() == 0


def test_minkunet_train_mode_updates_batch_stats():
    h, feats = make_batch(batch=1, n=100, seed=1)
    model = mink_unet(out_channels=4, arch="MinkUNet14A")
    variables = model.init(jax.random.PRNGKey(0), feats, h, train=True)
    (_, out), mutated = model.apply(
        variables, feats, h, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_masked_batchnorm_matches_torch_running_stats():
    """Torch updates running_var with the UNBIASED estimator while
    normalizing with the biased one (torch BatchNorm1d semantics; ME's
    MinkowskiBatchNorm wraps torch BN). Eval-mode output after one train
    step must therefore match torch exactly for converted checkpoints."""
    import torch

    from xmask3d_tpu.models.minkunet import MaskedBatchNorm

    rng = np.random.RandomState(0)
    x = rng.randn(2, 17, 5).astype(np.float32)

    bn = MaskedBatchNorm()
    variables = bn.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones((2, 17), bool), train=True
    )
    _, mutated = bn.apply(
        variables,
        jnp.asarray(x),
        jnp.ones((2, 17), bool),
        train=True,
        mutable=["batch_stats"],
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}
    y_eval = bn.apply(variables, jnp.asarray(x), jnp.ones((2, 17), bool), train=False)

    tbn = torch.nn.BatchNorm1d(5, momentum=0.1)
    tbn.train()
    xt = torch.from_numpy(x.reshape(-1, 5))
    tbn(xt)
    tbn.eval()
    yt = tbn(xt).detach().numpy().reshape(2, 17, 5)

    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(y_eval), yt, atol=1e-5, rtol=1e-5)
