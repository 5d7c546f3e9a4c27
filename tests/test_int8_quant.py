"""QDense/QConv: nn.Dense/nn.Conv drop-in parity + W8A8 quantization error.

The int8 serving mode (XMASK3D_INT8, ops/int8_quant.py) must (a) be a
bit-compatible drop-in when OFF — same param tree, same math as the flax
layers it replaced in models/{vae,sd_unet,clip}.py — and (b) stay within
the expected W8A8 rounding envelope when ON.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from xmask3d_tpu.ops.int8_quant import QConv, QDense, set_int8


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    set_int8(None)


def test_qdense_matches_nn_dense_when_off():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (3, 7, 96))
    ref = nn.Dense(128, dtype=jnp.float32)
    q = QDense(128, dtype=jnp.float32)
    v = ref.init(k, x)
    # identical param tree -> the reference's params load directly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a.shape), np.asarray(b.shape)),
        v, q.init(k, x),
    )
    set_int8(False)
    np.testing.assert_allclose(
        np.asarray(ref.apply(v, x)), np.asarray(q.apply(v, x)), rtol=1e-6
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(kernel_size=(1, 1)),
        dict(kernel_size=(3, 3), padding=1),
        dict(kernel_size=(3, 3), strides=(2, 2), padding="VALID"),
    ],
)
def test_qconv_matches_nn_conv_when_off(kw):
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (1, 10, 10, 64))
    ref = nn.Conv(96, dtype=jnp.float32, **kw)
    q = QConv(96, dtype=jnp.float32, **kw)
    v = ref.init(k, x)
    set_int8(False)
    got = q.apply(v, x)
    want = ref.apply(v, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_int8_error_envelope_dense():
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (64, 256))
    q = QDense(256, dtype=jnp.float32)
    v = q.init(k, x)
    set_int8(False)
    base = np.asarray(q.apply(v, x))
    set_int8(True)
    quant = np.asarray(q.apply(v, x))
    rel = np.linalg.norm(quant - base) / np.linalg.norm(base)
    assert 0 < rel < 0.02, rel  # W8A8 per-token/per-channel rounding


def test_int8_error_envelope_conv():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (1, 16, 16, 128))
    q = QConv(128, kernel_size=(3, 3), padding=1, dtype=jnp.float32)
    v = q.init(k, x)
    set_int8(False)
    base = np.asarray(q.apply(v, x))
    set_int8(True)
    quant = np.asarray(q.apply(v, x))
    rel = np.linalg.norm(quant - base) / np.linalg.norm(base)
    assert 0 < rel < 0.03, rel  # per-tensor act scale is coarser than per-token


def test_small_layers_stay_exact_when_on():
    """Layers under the size floor (contraction or out dim < 64) keep the
    exact path even with the mode enabled — they concentrate quantization
    damage (time embeddings, heads) and contribute no time."""
    k = jax.random.PRNGKey(4)
    x = jax.random.normal(k, (5, 32))
    q = QDense(256, dtype=jnp.float32)
    v = q.init(k, x)
    set_int8(False)
    base = np.asarray(q.apply(v, x))
    set_int8(True)
    np.testing.assert_array_equal(base, np.asarray(q.apply(v, x)))
