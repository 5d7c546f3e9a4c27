import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.models.diffusion import GaussianDiffusion, make_betas, space_timesteps
from xmask3d_tpu.models.ldm_extractor import LDM_TINY
from xmask3d_tpu.models.backbone import FeatureExtractorBackbone

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e


def test_beta_schedules():
    for name in ["linear", "ldm_linear", "cosine"]:
        betas = make_betas(name, 100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas < 1).all()
    assert len(space_timesteps(1000, "ddim50")) == 50


def test_q_sample_t0_nearly_identity():
    d = GaussianDiffusion.create(steps=1000, noise_schedule="ldm_linear")
    x = jnp.ones((2, 4, 4, 4))
    noise = jnp.zeros_like(x)
    t = jnp.zeros((2,), jnp.int32)
    out = d.q_sample(x, t, noise)
    np.testing.assert_allclose(np.asarray(out), np.sqrt(1 - 0.00085), rtol=1e-4)


def test_tiny_backbone_forward():
    cfg = LDM_TINY
    model = FeatureExtractorBackbone(ldm_cfg=cfg, out_features=("s2", "s3", "s4", "s5"))
    img = jnp.zeros((1, 64, 64, 3))
    prefix = jnp.zeros((1, 768))
    uncond = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, prefix, uncond)
    feats = model.apply(variables, img, prefix, uncond)
    shapes = model.output_shape()
    for name, spec in shapes.items():
        st = spec["stride"]
        assert feats[name].shape == (1, 64 // st, 64 // st, 512), name
    assert set(feats) == set(shapes)


def test_feature_strides_sd_v1():
    from xmask3d_tpu.models.ldm_extractor import LDM_SD_V1

    strides = LDM_SD_V1.feature_strides()
    # encoder taps (5,7) -> 4,8; unet taps (2,5,8,11) -> 64,32,16,8;
    # decoder taps (2,5) -> 8,4  (reference ldm.py:255-310 bookkeeping)
    assert strides == [4, 8, 64, 32, 16, 8, 8, 4]


def test_slide_forward_matches_single_on_constant_image():
    """slide_forward (reference feature_extractor.py:169-226) at 2x the
    training crop: on a constant image every window sees identical content,
    so each tile of the full-size maps must equal the single_forward output
    of one crop, and shapes must scale to the full resolution."""
    cfg = LDM_TINY
    model = FeatureExtractorBackbone(ldm_cfg=cfg, out_features=("s2", "s3", "s4", "s5"))
    crop = 64
    img1 = jnp.full((1, crop, crop, 3), 0.3)
    img2 = jnp.full((1, 2 * crop, 2 * crop, 3), 0.3)
    prefix = jnp.zeros((1, 768))
    uncond = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img1, prefix, uncond)

    single = model.apply(variables, img1, prefix, uncond)
    slid = model.apply(
        variables, img2, prefix, uncond, crop, method=model.slide_forward
    )
    shapes = model.output_shape()
    for name, spec in shapes.items():
        st = spec["stride"]
        hw = crop // st
        assert slid[name].shape == (1, 2 * hw, 2 * hw, 512), name
        for yi in range(2):
            for xi in range(2):
                tile = slid[name][:, yi * hw : (yi + 1) * hw, xi * hw : (xi + 1) * hw]
                np.testing.assert_allclose(
                    np.asarray(tile), np.asarray(single[name]),
                    rtol=2e-5, atol=2e-5, err_msg=f"{name} tile {yi},{xi}",
                )
