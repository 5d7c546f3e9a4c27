"""Round-4 golden parity tests (VERDICT r3 missing #4 / next-step #4):
the ODISE decoder + prediction heads, PooledMaskEmbed, MaskCLIP attn-mask
construction, the PositionalLinear implicit captioner, and the
FeatureExtractorBackbone grouping — all run UNMODIFIED from /root/reference
as numeric oracles. Classes whose modules have un-stubbable import chains
(odise.py pulls maskformer_model, ldm.py pulls stable-diffusion) are exec'd
from source via golden_utils.load_ref_classes.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from golden_utils import load_ref_classes, load_ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xmask3d_tpu.checkpoint.convert_torch import apply_flat_updates, lin_w  # noqa: E402


def _strip_prefix(flat, prefix):
    return {k[len(prefix):]: v for k, v in flat.items()}


# ---------------------------------------------------------------------------
# PositionalLinear + implicit captioner conditioning (ldm.py:574-676)
# ---------------------------------------------------------------------------


def _trunc_normal():
    return lambda t, std=1.0: torch.nn.init.trunc_normal_(t, std=std)


def test_positional_linear_vs_reference():
    ns = load_ref_classes(
        "models/modeling/meta_arch/ldm.py", ["PositionalLinear"],
        {"trunc_normal_": _trunc_normal()},
    )
    torch.manual_seed(0)
    ref = ns["PositionalLinear"](in_features=8, out_features=12, seq_len=5)
    ref.eval()

    from xmask3d_tpu.models.ldm_extractor import PositionalLinear

    ours = PositionalLinear(out_features=12, seq_len=5)
    x2 = np.random.RandomState(1).randn(3, 8).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x2))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    apply_flat_updates(params, {
        "linear/kernel": lin_w(ref.linear.weight.detach().numpy()),
        "linear/bias": ref.linear.bias.detach().numpy(),
        "positional_embedding": ref.positional_embedding.detach().numpy(),
    })

    with torch.no_grad():
        # 2-D input: unsqueeze + positional embedding (ldm.py:583-586)
        ref2 = ref(torch.from_numpy(x2)).numpy()
    got2 = np.asarray(ours.apply({"params": params}, jnp.asarray(x2)))
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-6)

    # 3-D input: plain linear, NO positional embedding
    x3 = np.random.RandomState(2).randn(2, 5, 8).astype(np.float32)
    with torch.no_grad():
        ref3 = ref(torch.from_numpy(x3)).numpy()
    got3 = np.asarray(ours.apply({"params": params}, jnp.asarray(x3)))
    np.testing.assert_allclose(got3, ref3, rtol=1e-5, atol=1e-6)


def test_implicit_captioner_conditioning_vs_reference():
    """cond_inputs/cond_emb arithmetic (ldm.py:656-668) with a pass-through
    LdmExtractor so the reference captioner's own forward runs verbatim."""
    seq, width, dim_latent, time_dim = 6, 16, 8, 20

    class FakeLdm:
        uncond_inputs = torch.randn(1, seq, width,
                                    generator=torch.Generator().manual_seed(3))

        def embed_text(self, texts):
            return self.uncond_inputs

        class unet:
            time_embed = [types.SimpleNamespace(out_features=time_dim)]

        class ldm:  # set_requires_grad walks ldm.ldm.model.parameters()
            class model:
                @staticmethod
                def parameters():
                    return iter(())

    class FakeLdmExtractor(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()
            self.ldm = FakeLdm()

        def forward(self, batched_inputs):
            return batched_inputs

    ns = load_ref_classes(
        "models/modeling/meta_arch/ldm.py",
        ["PositionalLinear", "LdmImplicitCaptionerExtractor"],
        {"trunc_normal_": _trunc_normal(), "LdmExtractor": FakeLdmExtractor},
    )
    torch.manual_seed(4)
    ref = ns["LdmImplicitCaptionerExtractor"](
        learnable_time_embed=True, num_timesteps=1, dim_latent=dim_latent,
        clip=None,
    )
    ref.eval()
    # nonzero alphas so the tanh gates actually mix
    with torch.no_grad():
        ref.alpha_cond.copy_(torch.randn_like(ref.alpha_cond) * 0.5)
        ref.alpha_cond_time_embed.copy_(
            torch.randn_like(ref.alpha_cond_time_embed) * 0.5
        )

    prefix = np.random.RandomState(5).randn(2, dim_latent).astype(np.float32)
    with torch.no_grad():
        out = ref.forward({"img": torch.zeros(2, 3, 8, 8)},
                          torch.from_numpy(prefix))
    ref_cond = out["cond_inputs"].numpy()
    ref_emb = out["cond_emb"].numpy()

    # ours: same weights into the condition() method
    from xmask3d_tpu.models.ldm_extractor import (
        LdmConfig, LdmImplicitCaptionerExtractor, LDM_TINY,
    )
    from xmask3d_tpu.models.sd_unet import UNET_TINY
    import dataclasses

    cfg = dataclasses.replace(
        LDM_TINY,
        text=dataclasses.replace(LDM_TINY.text, width=width, context_length=seq),
        unet=dataclasses.replace(UNET_TINY, model_channels=time_dim // 4),
    )
    ours = LdmImplicitCaptionerExtractor(cfg, dim_latent=dim_latent)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(prefix),
        jnp.asarray(FakeLdm.uncond_inputs.numpy()), method=type(ours).condition,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    apply_flat_updates(params, {
        "clip_project/linear/kernel": lin_w(
            ref.clip_project.linear.weight.detach().numpy()),
        "clip_project/linear/bias": ref.clip_project.linear.bias.detach().numpy(),
        "clip_project/positional_embedding":
            ref.clip_project.positional_embedding.detach().numpy(),
        "alpha_cond": ref.alpha_cond.detach().numpy(),
        "time_embed_project/linear/kernel": lin_w(
            ref.time_embed_project.linear.weight.detach().numpy()),
        "time_embed_project/linear/bias":
            ref.time_embed_project.linear.bias.detach().numpy(),
        "time_embed_project/positional_embedding":
            ref.time_embed_project.positional_embedding.detach().numpy(),
        "alpha_cond_time_embed": ref.alpha_cond_time_embed.detach().numpy(),
    })
    cond, emb = ours.apply(
        {"params": params}, jnp.asarray(prefix),
        jnp.asarray(FakeLdm.uncond_inputs.numpy()), method=type(ours).condition,
    )
    np.testing.assert_allclose(np.asarray(cond), ref_cond, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# PooledMaskEmbed (odise.py:550-597) + MaskPooling (odise.py:509-548)
# ---------------------------------------------------------------------------


def _load_odise_classes(names):
    m2f = load_ref_module(
        "mask2former.modeling.transformer_decoder.mask2former_transformer_decoder"
    )
    return load_ref_classes(
        "models/modeling/meta_arch/odise.py", names,
        {
            "MultiScaleMaskedTransformerDecoder":
                m2f.MultiScaleMaskedTransformerDecoder,
            "MLP": m2f.MLP,
        },
    )


def _pme_weight_map(ref):
    return {
        "pool_norm/scale": ref.pool_proj[0].weight.detach().numpy(),
        "pool_norm/bias": ref.pool_proj[0].bias.detach().numpy(),
        "pool_proj/kernel": lin_w(ref.pool_proj[1].weight.detach().numpy()),
        "pool_proj/bias": ref.pool_proj[1].bias.detach().numpy(),
        "embed_norm/scale": ref.mask_embed[0].weight.detach().numpy(),
        "embed_norm/bias": ref.mask_embed[0].bias.detach().numpy(),
        **{
            f"embed_mlp/layer_{i}/{p}": (
                lin_w(lay.weight.detach().numpy()) if p == "kernel"
                else lay.bias.detach().numpy()
            )
            for i, lay in enumerate(ref.mask_embed[1].layers)
            for p in ("kernel", "bias")
        },
        "logit_scale": ref.logit_scale.detach().numpy().reshape(()),
    }


def test_pooled_mask_embed_vs_reference():
    ns = _load_odise_classes(["MaskPooling", "PooledMaskEmbed"])
    torch.manual_seed(6)
    ref = ns["PooledMaskEmbed"](hidden_dim=16, mask_dim=16, projection_dim=24)
    ref.eval()

    b, q, h, w = 2, 5, 8, 8
    rng = np.random.RandomState(7)
    dec_out = rng.randn(b, q, 16).astype(np.float32)
    mask_feat = rng.randn(b, 16, h, w).astype(np.float32)
    pred_masks = (rng.randn(b, q, h, w) * 2).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(dec_out), None, torch.from_numpy(mask_feat),
            None, torch.from_numpy(pred_masks),
        )

    from xmask3d_tpu.models.mask_decoder import PooledMaskEmbed

    ours = PooledMaskEmbed(hidden_dim=16, mask_dim=16, projection_dim=24)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(dec_out),
        jnp.asarray(mask_feat.transpose(0, 2, 3, 1)), jnp.asarray(pred_masks),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    apply_flat_updates(params, _pme_weight_map(ref))
    got = ours.apply(
        {"params": params}, jnp.asarray(dec_out),
        jnp.asarray(mask_feat.transpose(0, 2, 3, 1)), jnp.asarray(pred_masks),
    )
    np.testing.assert_allclose(
        np.asarray(got["mask_embed"]), out_ref["mask_embed"].numpy(),
        rtol=2e-3, atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["mask_pooled_features"]),
        out_ref["mask_pooled_features"].numpy(), rtol=2e-3, atol=3e-4,
    )
    np.testing.assert_allclose(
        float(got["logit_scale"]), out_ref["logit_scale"].item(), rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# ODISE decoder + forward_prediction_heads (odise.py:349-491)
# ---------------------------------------------------------------------------


def test_odise_decoder_vs_reference():
    ns = _load_odise_classes(
        ["PseudoClassEmbed", "MaskPooling", "PooledMaskEmbed",
         "ODISEMultiScaleMaskedTransformerDecoder"]
    )
    hidden, queries, heads, ffn, layers, ncls, mdim, proj = 32, 6, 4, 64, 3, 7, 32, 48
    torch.manual_seed(8)
    ref = ns["ODISEMultiScaleMaskedTransformerDecoder"](
        class_embed=ns["PseudoClassEmbed"](num_classes=ncls),
        post_mask_embed=ns["PooledMaskEmbed"](
            hidden_dim=hidden, mask_dim=mdim, projection_dim=proj
        ),
        in_channels=hidden,
        mask_classification=True,
        num_classes=ncls,
        hidden_dim=hidden,
        num_queries=queries,
        nheads=heads,
        dim_feedforward=ffn,
        dec_layers=layers,
        pre_norm=False,
        mask_dim=mdim,
        enforce_input_project=False,
    )
    ref.eval()

    b = 2
    rng = np.random.RandomState(9)
    feats = [rng.randn(b, hidden, s, s).astype(np.float32) for s in (4, 8, 16)]
    mask_feat = rng.randn(b, mdim, 16, 16).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            [torch.from_numpy(f) for f in feats], torch.from_numpy(mask_feat)
        )

    # convert the reference weights through the REAL converter section
    from xmask3d_tpu.checkpoint.convert_xmask3d import convert_mask_decoder

    sd = {
        f"sem_seg_head.predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    conv = {}
    convert_mask_decoder(sd, conv, dec_layers=layers)
    flat = _strip_prefix(conv, "mask_decoder/")

    from xmask3d_tpu.models.mask_decoder import ODISEMaskedTransformerDecoder

    ours = ODISEMaskedTransformerDecoder(
        num_classes=ncls, hidden_dim=hidden, num_queries=queries, heads=heads,
        ffn_dim=ffn, dec_layers=layers, mask_dim=mdim, projection_dim=proj,
    )
    feats_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    mf_nhwc = jnp.asarray(mask_feat.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.PRNGKey(0), feats_nhwc, mf_nhwc)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    applied = apply_flat_updates(params, flat)
    assert len(applied) == len(flat)
    got = ours.apply({"params": params}, feats_nhwc, mf_nhwc)

    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), out_ref["pred_logits"].numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_masks"]), out_ref["pred_masks"].numpy(),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["mask_embed"]), out_ref["mask_embed"].numpy(),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["mask_pooled_features"]),
        out_ref["mask_pooled_features"].numpy(), rtol=1e-3, atol=1e-3,
    )
    assert len(got["aux_outputs"]) == len(out_ref["aux_outputs"]) == layers
    for got_aux, ref_aux in zip(got["aux_outputs"], out_ref["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(got_aux["pred_masks"]), ref_aux["pred_masks"].numpy(),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(got_aux["mask_embed"]), ref_aux["mask_embed"].numpy(),
            rtol=1e-3, atol=1e-3,
        )


# ---------------------------------------------------------------------------
# MaskCLIP attention-mask construction (clip.py:240-310)
# ---------------------------------------------------------------------------


def test_maskclip_attn_mask_vs_reference():
    ns = load_ref_classes(
        "models/modeling/meta_arch/clip.py", ["ClipAdapter", "MaskCLIP"],
        {
            "open_clip": types.SimpleNamespace(),
            "T": types.SimpleNamespace(
                Compose=lambda *a, **k: None, Resize=lambda *a, **k: None,
                Normalize=lambda *a, **k: None,
                InterpolationMode=types.SimpleNamespace(BICUBIC=None),
            ),
            "comm": types.SimpleNamespace(),
            "rearrange": None,
            "ensemble_logits_with_labels": None,
            "EmbeddedText": None,
            "EmbeddedImage": None,
            "OrderedDict": __import__("collections").OrderedDict,
            "namedtuple": __import__("collections").namedtuple,
        },
    )
    patch, size, width = 4, 16, 12
    grid = size // patch
    captured = {}

    fake = types.SimpleNamespace()
    fake.clip_preprocess = lambda img: img
    fake.clip = types.SimpleNamespace(
        visual=types.SimpleNamespace(
            conv1=torch.nn.Conv2d(3, width * 64 // 64 * 4, patch, stride=patch),
            positional_embedding=torch.zeros(grid * grid + 1, width),
        )
    )
    # conv1.out_channels drives num_heads = out_channels // 64
    fake.clip.visual.conv1 = torch.nn.Conv2d(3, 128, patch, stride=patch)

    def capture(image, attn_mask, num_mask_tokens):
        captured["attn_mask"] = attn_mask
        captured["n"] = num_mask_tokens
        return torch.zeros(1)

    fake._mask_clip_forward = capture

    b, q = 2, 3
    rng = np.random.RandomState(10)
    mask = (rng.randn(b, q, size, size) * 2).astype(np.float32)
    image = rng.rand(b, 3, size, size).astype(np.float32)
    ns["MaskCLIP"].encode_image_with_mask(
        fake, torch.from_numpy(image), torch.from_numpy(mask)
    )
    heads = 128 // 64
    t = q + 1 + grid * grid
    ref_mask = captured["attn_mask"].reshape(b, heads, t, t).numpy()
    assert captured["n"] == q
    # identical across heads
    np.testing.assert_array_equal(ref_mask[:, 0], ref_mask[:, 1])

    from xmask3d_tpu.models.clip import mask_attn_blocked

    got = np.asarray(mask_attn_blocked(jnp.asarray(mask), patch))[:, 0]
    np.testing.assert_array_equal(got, ref_mask[:, 0])


# ---------------------------------------------------------------------------
# FeatureExtractorBackbone grouping (feature_extractor.py:75-167)
# ---------------------------------------------------------------------------

# reference tap strides for SD v1 with encoder taps (5,7), unet output-block
# taps (2,5,8,11), decoder taps (2,5) — derived from the reference tap
# semantics (ldm.py:255-310): encoder level idx//2 -> 2^lv; unet output
# level 3 - idx//3 at latent stride 8; decoder stride 8 / 2^(idx//3)
REF_SD_TAP_STRIDES = [4, 8, 64, 32, 16, 8, 8, 4]


def test_backbone_grouping_vs_reference():
    import sys

    # stubs for the names feature_extractor.py imports
    from golden_utils import _register

    backbone_mod = types.ModuleType("detectron2.modeling.backbone")

    class Backbone(torch.nn.Module):
        pass

    backbone_mod.Backbone = Backbone
    resnet_mod = types.ModuleType("detectron2.modeling.backbone.resnet")

    class _Block(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    resnet_mod.BottleneckBlock = _Block

    class ResNet:
        @staticmethod
        def make_stage(block_class, num_blocks, **kw):
            return [torch.nn.Identity() for _ in range(num_blocks)]

    resnet_mod.ResNet = ResNet
    modeling = types.ModuleType("detectron2.modeling")
    modeling.__path__ = []
    structures = types.ModuleType("detectron2.structures")

    class ImageList:
        @staticmethod
        def from_tensors(tensors, divisibility):
            return types.SimpleNamespace(tensor=torch.stack(list(tensors)))

    structures.ImageList = ImageList
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = lambda *a, **k: (lambda x: x)
    tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    for name, mod in [
        ("detectron2.modeling", modeling),
        ("detectron2.modeling.backbone", backbone_mod),
        ("detectron2.modeling.backbone.resnet", resnet_mod),
        ("detectron2.structures", structures),
        ("torchvision", tv),
        ("torchvision.transforms", tvt),
    ]:
        if name not in sys.modules:
            _register(name, mod)

    fe_mod = load_ref_module("models.modeling.backbone.feature_extractor")

    class FakeExtractor(torch.nn.Module):
        feature_dims = [8] * len(REF_SD_TAP_STRIDES)
        feature_strides = REF_SD_TAP_STRIDES
        grouped_indices = [[i] for i in range(len(REF_SD_TAP_STRIDES))]

    ref = fe_mod.FeatureExtractorBackbone(
        feature_extractor=FakeExtractor(),
        out_features=["s2", "s3", "s4", "s5"],
        backbone_in_size=(512, 512),
        projection_dim=16,
        use_checkpoint=False,
        slide_training=False,
    )

    from xmask3d_tpu.models.backbone import FeatureExtractorBackbone as Ours
    from xmask3d_tpu.models.ldm_extractor import LDM_SD_V1

    ours = Ours(ldm_cfg=LDM_SD_V1, projection_dim=16)
    # our stride derivation must match the reference's tap strides
    assert LDM_SD_V1.feature_strides() == REF_SD_TAP_STRIDES
    grouping = ours._grouping()

    # same stride->indices grouping, same sorted order, same names
    assert list(grouping.keys()) == sorted(ref._out_feature_strides.values())
    ref_groups = {
        ref._out_feature_strides[name]: idxs
        for name, idxs in zip(ref._out_features, ref._sorted_grouped_indices)
    }
    assert grouping == ref_groups
    ours_shapes = ours.output_shape()
    assert set(ours_shapes) == set(ref._out_features)
    for name in ref._out_features:
        assert ours_shapes[name]["stride"] == ref._out_feature_strides[name]
        assert ours_shapes[name]["channels"] == 16


# ---------------------------------------------------------------------------
# cal_pred_logits + synonym ensemble (xmask3d.py:129-143, helper.py:71-97)
# ---------------------------------------------------------------------------


def test_cal_pred_logits_vs_reference():
    helper = load_ref_module("models.modeling.meta_arch.helper")
    ns = load_ref_classes(
        "models/xmask3d.py", ["XMASK3d"],
        {
            "ensemble_logits_with_labels": helper.ensemble_logits_with_labels,
            "PC_Processor": None, "PC_Binary_Processor": None,
            "FeatureExtractorBackbone": None, "LdmImplicitCaptionerExtractor": None,
            "MaskFormerHead": None, "MSDeformAttnPixelDecoder": None,
            "ODISEMultiScaleMaskedTransformerDecoder": None,
            "PseudoClassEmbed": None, "PooledMaskEmbed": None,
            "CategoryEmbed": None, "Criterion": None, "HungarianMatcher": None,
            "ImageList": None, "sem_seg_postprocess": None,
        },
    )
    rng = np.random.RandomState(12)
    b, q, c, l = 2, 6, 16, 5
    mask_embed = rng.randn(b, q, c).astype(np.float32)
    text_embed = rng.randn(l, c).astype(np.float32)
    null_embed = rng.randn(1, c).astype(np.float32)
    outputs = {
        "mask_embed": torch.from_numpy(mask_embed),
        "text_embed": torch.from_numpy(text_embed),
        "null_embed": torch.from_numpy(null_embed),
        "labels": [[f"l{i}"] for i in range(l)],  # singleton groups (configs)
        "logit_scale": torch.tensor(50.0),
    }
    with torch.no_grad():
        ref = ns["XMASK3d"].cal_pred_logits(None, outputs).numpy()

    from xmask3d_tpu.models.xmask3d import cal_pred_logits

    got = np.asarray(cal_pred_logits(
        jnp.asarray(mask_embed), jnp.asarray(text_embed),
        jnp.asarray(null_embed), jnp.asarray(50.0),
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ensemble_logits_with_labels_vs_reference():
    """Multi-synonym groups (max and mean reduction) vs helper.py:71-97."""
    helper = load_ref_module("models.modeling.meta_arch.helper")

    from xmask3d_tpu.models.clip import ensemble_logits_with_labels

    rng = np.random.RandomState(13)
    groups = [["a"], ["b1", "b2", "b3"], ["c1", "c2"]]
    sizes = [len(g) for g in groups]
    logits = rng.randn(2, 4, sum(sizes)).astype(np.float32)
    for method in ("max", "mean"):
        ref = helper.ensemble_logits_with_labels(
            torch.from_numpy(logits), groups, ensemble_method=method
        ).numpy()
        got = np.asarray(
            ensemble_logits_with_labels(jnp.asarray(logits), sizes, method)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Full MSDeformAttn pixel decoder (msdeformattn.py:176-358): 2 encoder
# layers + FPN step, weights moved through the real converter section
# ---------------------------------------------------------------------------


def test_pixel_decoder_vs_reference():
    import sys

    from golden_utils import install_m2f_misc_stub

    install_m2f_misc_stub()
    # earlier goldens may have registered ops.functions as a BARE package
    # (no __init__ body), so `from ..functions import MSDeformAttnFunction`
    # inside ms_deform_attn.py would fail; pin the names explicitly
    fns = load_ref_module(
        "mask2former.modeling.pixel_decoder.ops.functions.ms_deform_attn_func"
    )
    pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.functions"]
    pkg.MSDeformAttnFunction = fns.MSDeformAttnFunction
    pkg.ms_deform_attn_core_pytorch = fns.ms_deform_attn_core_pytorch
    px = load_ref_module(
        "mask2former.modeling.pixel_decoder.msdeformattn"
    )
    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec

    cdim, mdim, heads, ffn, layers = 32, 32, 4, 64, 2
    torch.manual_seed(14)
    input_shape = {
        "s2": ShapeSpec(channels=48, stride=4),
        "s3": ShapeSpec(channels=48, stride=8),
        "s4": ShapeSpec(channels=48, stride=16),
        "s5": ShapeSpec(channels=48, stride=32),
    }
    ref = px.MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=heads,
        transformer_dim_feedforward=ffn,
        transformer_enc_layers=layers,
        conv_dim=cdim,
        mask_dim=mdim,
        norm="GN",
        transformer_in_features=["s3", "s4", "s5"],
        common_stride=4,
    )
    ref.eval()

    rng = np.random.RandomState(15)
    feats = {
        name: rng.randn(1, 48, 64 // spec.stride * 4, 64 // spec.stride * 4)
        .astype(np.float32)
        for name, spec in input_shape.items()
    }
    with torch.no_grad():
        mask_feat_ref, _, ms_ref = ref.forward_features(
            {k: torch.from_numpy(v) for k, v in feats.items()}
        )

    from xmask3d_tpu.checkpoint.convert_xmask3d import convert_pixel_decoder

    sd = {
        f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    conv = {}
    convert_pixel_decoder(sd, conv, enc_layers=layers)
    flat = _strip_prefix(conv, "pixel_decoder/")

    from xmask3d_tpu.checkpoint.convert_torch import apply_flat_updates
    from xmask3d_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    ours = MSDeformAttnPixelDecoder(
        conv_dim=cdim, mask_dim=mdim, heads=heads, points=4,
        enc_layers=layers, ffn_dim=ffn,
    )
    feats_nhwc = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in feats.items()
    }
    variables = ours.init(jax.random.PRNGKey(0), feats_nhwc)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    applied = apply_flat_updates(params, flat)
    assert len(applied) == len(flat)
    mask_feat, ms = ours.apply({"params": params}, feats_nhwc)

    np.testing.assert_allclose(
        np.asarray(mask_feat).transpose(0, 3, 1, 2), mask_feat_ref.numpy(),
        rtol=2e-3, atol=2e-3,
    )
    assert len(ms) == len(ms_ref) == 3
    for got, want in zip(ms, ms_ref):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=2e-3, atol=2e-3,
        )
