"""paint_and_fuse / panoptic_mask_filter vs naive reference-style loops."""

import numpy as np
import jax
import jax.numpy as jnp

from xmask3d_tpu.losses.fuser import (
    masked_mean,
    paint_and_fuse,
    panoptic_mask_filter,
    project_masks_to_points,
)


def test_project_masks_to_points():
    rng = np.random.RandomState(0)
    masks = rng.randn(2, 3, 8, 10).astype(np.float32)
    x = rng.randint(0, 8, (2, 5))
    y = rng.randint(0, 10, (2, 5))
    out = np.asarray(
        project_masks_to_points(jnp.asarray(masks), jnp.asarray(x), jnp.asarray(y))
    )
    for b in range(2):
        for q in range(3):
            for p in range(5):
                assert out[b, q, p] == masks[b, q, x[b, p], y[b, p]]


def identity_fuser(f2d, f3d):
    return 0.5 * (f2d + f3d)


def test_paint_and_fuse_matches_loop():
    rng = np.random.RandomState(1)
    b, q, p, c = 2, 4, 16, 6
    mask3d = rng.rand(b, q, p) > 0.6
    qv = np.ones((b, q), bool)
    pv = np.ones((b, p), bool)
    pv[:, -3:] = False
    embeds = rng.randn(b, q, c).astype(np.float32)
    pred3d = rng.randn(b, p, c).astype(np.float32)

    out = paint_and_fuse(
        jnp.asarray(mask3d), jnp.asarray(qv), jnp.asarray(embeds),
        jnp.asarray(pred3d), jnp.asarray(pv), identity_fuser,
    )
    # naive loop (reference fuser.py:6-53)
    for bi in range(b):
        painted = np.zeros((p, c))
        counter = np.zeros((p,))
        for qi in range(q):
            m = mask3d[bi, qi] & pv[bi]
            painted[m] += embeds[bi, qi]
            counter[m] += 1
        feat2d = painted / np.maximum(counter[:, None], 1e-5)
        covered = counter >= 1
        fused = np.where(
            covered[:, None], 0.5 * (feat2d + pred3d[bi]), pred3d[bi]
        )
        np.testing.assert_allclose(np.asarray(out["fused"])[bi], fused, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["counter"])[bi], counter)


def test_paint_and_fuse_empty_fallback():
    b, q, p, c = 1, 3, 8, 4
    mask3d = np.zeros((b, q, p), bool)
    out = paint_and_fuse(
        jnp.asarray(mask3d), jnp.ones((b, q), bool),
        jnp.ones((b, q, c)), jnp.zeros((b, p, c)), jnp.ones((b, p), bool),
        identity_fuser,
    )
    # fallback paints query 0 onto point 0 (reference fuser.py:19-20)
    assert np.asarray(out["counter"])[0, 0] == 1


def test_panoptic_filter_matches_loop():
    rng = np.random.RandomState(2)
    b, q, h, w = 2, 5, 6, 7
    scores = rng.rand(b, q).astype(np.float32)
    masks = rng.randn(b, q, h, w).astype(np.float32) * 2
    keep = np.ones((b, q), bool)
    keep[0, 3] = False

    final, valid = panoptic_mask_filter(
        jnp.asarray(scores), jnp.asarray(masks), jnp.asarray(keep)
    )
    final, valid = np.asarray(final), np.asarray(valid)

    for bi in range(b):
        sig = 1 / (1 + np.exp(-masks[bi]))
        prob = np.where(keep[bi][:, None, None], scores[bi][:, None, None] * sig, -1e30)
        claim = prob.argmax(0)
        for qi in range(q):
            m = (claim == qi) & (sig[qi] >= 0.5) & keep[bi, qi]
            orig = (sig[qi] >= 0.5).sum()
            v = m.sum() > 0 and orig > 0 and keep[bi, qi]
            assert valid[bi, qi] == v
            np.testing.assert_array_equal(final[bi, qi], m if v else np.zeros_like(m))


def test_masked_mean():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    m = jnp.asarray([[True, True, False, False]])
    out = np.asarray(masked_mean(x, m, axis=1))
    np.testing.assert_allclose(out[0], [1.5, 2.5, 3.5])


def test_point_gather_forms_identical(monkeypatch):
    """The transposed row-gather form of project_masks_to_points must equal
    the lane-gather form exactly (XMASK3D_POINT_GATHER=row is a pure
    layout change for TPU gather throughput)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from xmask3d_tpu.losses.fuser import project_masks_to_points

    key = jax.random.PRNGKey(0)
    masks = jax.random.normal(key, (2, 7, 24, 32))
    xl = jax.random.randint(key, (2, 100), -2, 26)  # incl. out-of-range
    yl = jax.random.randint(jax.random.PRNGKey(1), (2, 100), 0, 34)
    a = np.asarray(project_masks_to_points(masks, xl, yl))
    monkeypatch.setenv("XMASK3D_POINT_GATHER", "row")
    b = np.asarray(project_masks_to_points(masks, xl, yl))
    np.testing.assert_array_equal(a, b)
