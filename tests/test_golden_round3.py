"""Round-3 golden parity tests vs CPU-runnable reference code (VERDICT
round-2 "missing #3"): the diffusion schedule and the vendored mask2former
SetCriterion's class/mask losses, run UNMODIFIED from /root/reference as
numeric oracles (same stub machinery as test_golden_reference.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from golden_utils import install_m2f_misc_stub, load_ref_module  # noqa: E402


# ---------------------------------------------------------------------------
# Diffusion schedule (reference gaussian_diffusion.py:61-91 betas, :190
# q_sample; respace.py spacing; diffusion_builder.py:5-43)
# ---------------------------------------------------------------------------


def test_beta_schedules_vs_reference():
    gd = load_ref_module("models.modeling.diffusion.gaussian_diffusion")

    from xmask3d_tpu.models.diffusion import make_betas

    for schedule in ("linear", "ldm_linear", "cosine"):
        for steps in (1000, 250):
            ref = gd.get_named_beta_schedule(schedule, steps)
            ours = make_betas(schedule, steps)
            np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=0)


def test_respaced_betas_vs_reference():
    builder = load_ref_module("models.modeling.diffusion.diffusion_builder")

    from xmask3d_tpu.models.diffusion import GaussianDiffusion

    for respacing in ("ddim50", "100", "10,20,30"):
        ref = builder.create_gaussian_diffusion(
            steps=1000, noise_schedule="ldm_linear", timestep_respacing=respacing
        )
        ours = GaussianDiffusion.create(
            steps=1000, noise_schedule="ldm_linear", timestep_respacing=respacing
        )
        np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12, atol=0)
        np.testing.assert_allclose(
            ours.alphas_cumprod, ref.alphas_cumprod, rtol=1e-12, atol=0
        )


def test_q_sample_vs_reference():
    """q_sample at t=0 (the pipeline's only noising step, ldm.py:515-543)
    and at arbitrary t, vs the reference GaussianDiffusion.q_sample."""
    builder = load_ref_module("models.modeling.diffusion.diffusion_builder")
    import jax.numpy as jnp

    from xmask3d_tpu.models.diffusion import GaussianDiffusion

    ref = builder.create_gaussian_diffusion(
        steps=1000, noise_schedule="ldm_linear"
    )
    ours = GaussianDiffusion.create(steps=1000, noise_schedule="ldm_linear")

    rng = np.random.RandomState(11)
    x = rng.randn(3, 4, 8, 8).astype(np.float32)
    noise = rng.randn(3, 4, 8, 8).astype(np.float32)
    for t in ([0, 0, 0], [0, 500, 999]):
        tq = np.asarray(t, np.int64)
        out_ref = ref.q_sample(
            torch.from_numpy(x), torch.from_numpy(tq), torch.from_numpy(noise)
        ).numpy()
        out = np.asarray(
            ours.q_sample(jnp.asarray(x), jnp.asarray(tq, jnp.int32), jnp.asarray(noise))
        )
        np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# SetCriterion loss_labels / loss_masks (vendored mask2former
# criterion.py:129-197, incl. uncertainty point sampling)
# ---------------------------------------------------------------------------


def _make_ref_criterion(crit_mod, num_classes, num_points):
    return crit_mod.SetCriterion(
        num_classes=num_classes,
        matcher=None,
        class_weight=2.0,
        mask_weight=5.0,
        dice_weight=5.0,
        num_layers=0,
        eos_coef=0.1,
        losses=["labels", "masks"],
        num_points=num_points,
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )


def test_loss_labels_vs_reference():
    install_m2f_misc_stub()
    crit_mod = load_ref_module("mask2former.modeling.criterion")
    import jax.numpy as jnp

    from xmask3d_tpu.losses.criterion import loss_labels

    b, q, t, ncls = 2, 12, 5, 7
    rng = np.random.RandomState(21)
    logits = rng.randn(b, q, ncls + 1).astype(np.float32)
    tlabels = rng.randint(0, ncls, (b, t)).astype(np.int32)
    # match: a distinct query per target, per scene
    match = np.stack([rng.permutation(q)[:t] for _ in range(b)]).astype(np.int32)

    crit = _make_ref_criterion(crit_mod, ncls, num_points=16)
    indices = [
        (torch.from_numpy(match[i].astype(np.int64)), torch.arange(t))
        for i in range(b)
    ]
    targets = [
        {"labels": torch.from_numpy(tlabels[i].astype(np.int64))} for i in range(b)
    ]
    ref = crit.loss_labels(
        {"pred_logits": torch.from_numpy(logits)}, targets, indices, float(t * b)
    )["loss_ce"].item()

    ours = float(
        loss_labels(
            jnp.asarray(logits),
            jnp.asarray(tlabels),
            jnp.ones((b, t), bool),
            jnp.asarray(match),
            eos_coef=0.1,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_loss_masks_vs_reference(monkeypatch):
    """Point-sampled sigmoid-CE + dice mask losses with uncertainty
    importance sampling, both sides fed the SAME random point draws (the
    reference's torch.rand is patched to replay our jax draws, like the
    matcher golden test)."""
    install_m2f_misc_stub()
    crit_mod = load_ref_module("mask2former.modeling.criterion")
    import jax
    import jax.numpy as jnp

    from xmask3d_tpu.losses.criterion import loss_masks

    b, q, t, h, w = 2, 10, 4, 24, 24
    num_points, oversample = 64, 3.0
    n_boxes = b * t
    n_sampled = int(num_points * oversample)
    n_unc = int(0.75 * num_points)
    n_rand = num_points - n_unc

    rng = np.random.RandomState(22)
    masks = rng.randn(b, q, h, w).astype(np.float32)
    tmasks = (rng.rand(b, t, h, w) > 0.5).astype(np.float32)
    match = np.stack([rng.permutation(q)[:t] for _ in range(b)]).astype(np.int32)
    num_masks = float(n_boxes)

    # replay our jax point draws on the torch side, in call order
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    coords1 = np.asarray(jax.random.uniform(k1, (n_boxes, n_sampled, 2)))
    coords2 = np.asarray(jax.random.uniform(k2, (n_boxes, n_rand, 2)))
    draws = [coords1, coords2]

    def fixed_rand(*size, **kw):
        arr = draws.pop(0)
        assert tuple(size) == arr.shape, (size, arr.shape)
        return torch.from_numpy(arr.copy())

    monkeypatch.setattr(torch, "rand", fixed_rand)

    crit = _make_ref_criterion(crit_mod, 7, num_points=num_points)
    indices = [
        (torch.from_numpy(match[i].astype(np.int64)), torch.arange(t))
        for i in range(b)
    ]
    targets = [{"masks": torch.from_numpy(tmasks[i])} for i in range(b)]
    ref = crit.loss_masks(
        {"pred_masks": torch.from_numpy(masks)}, targets, indices, num_masks
    )
    ref_ce, ref_dice = ref["loss_mask"].item(), ref["loss_dice"].item()

    l_ce, l_dice = loss_masks(
        key,
        jnp.asarray(masks),
        jnp.asarray(tmasks),
        jnp.ones((b, t), bool),
        jnp.asarray(match),
        jnp.asarray(num_masks),
        num_points=num_points,
        oversample_ratio=oversample,
        importance_sample_ratio=0.75,
    )
    np.testing.assert_allclose(float(l_ce), ref_ce, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l_dice), ref_dice, rtol=1e-4, atol=1e-5)
