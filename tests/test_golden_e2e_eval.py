"""End-to-end eval-forward golden: the REFERENCE eval chain composed from
its own torch modules vs our eval_forward, on shared converted weights.

Covers the composition the per-module goldens cannot: the order-sensitive
interaction of binary voting + routing (reference models/xmask3d.py:356-389),
panoptic-style mask filtering (:416-439), mask paint + fuse (:441-479),
cal_pred_logits (:129-143), and then the whole-view ensemble + routing +
voting block of run/infer.py:484-648 executed VERBATIM from the reference
source (exec_ref_block) against our engine/infer.py equivalents.

Real reference modules in the chain: MSDeformAttnPixelDecoder,
ODISEMultiScaleMaskedTransformerDecoder (+ PooledMaskEmbed, PseudoClassEmbed,
MaskPooling), MaskFormerHead, FeatureMerger, ensemble_logits_with_labels, and
the unmodified XMASK3d.forward / run/infer.py ensemble code. Stubbed with
SHARED fixed tensors on both sides (each covered by its own golden):
the 3D UNet branches, the SD feature backbone, and the CLIP towers.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))
from golden_utils import (  # noqa: E402
    exec_ref_block,
    install_m2f_misc_stub,
    load_ref_classes,
    load_ref_module,
)

# ---------------------------------------------------------------------------
# shared tiny dimensions
# ---------------------------------------------------------------------------
B = 1
P = 40  # points
V = 20  # voxels
Q = 6  # queries
NCLS_TRAIN = 5
L_TEST = 7
HID, MDIM, HEADS, FFN = 32, 32, 4, 64
DEC_LAYERS, ENC_LAYERS = 3, 2
PROJ = 48
IMG = 64
MH, MW = 12, 16  # mask_shape
BASE = (0, 2, 4)
NOVEL = (1, 3, 5, 6)
BASE_RATIO, NOVEL_RATIO = 0.65, 0.35
SCORE_THRESH = 0.2

_R = np.random.RandomState(42)
BB_FEATS = {
    "s2": _R.randn(B, 48, 16, 16).astype(np.float32),
    "s3": _R.randn(B, 48, 8, 8).astype(np.float32),
    "s4": _R.randn(B, 48, 4, 4).astype(np.float32),
    "s5": _R.randn(B, 48, 2, 2).astype(np.float32),
}
VOX_PRED3D = _R.randn(V, PROJ).astype(np.float32)
VOX_BINARY = (_R.randn(V, 1) * 2).astype(np.float32)
INDS_RECON = _R.randint(0, V, size=(P,)).astype(np.int64)
X_LABEL = _R.randint(0, MH, size=(P,)).astype(np.int64)
Y_LABEL = _R.randint(0, MW, size=(P,)).astype(np.int64)
COORDS = _R.randn(P, 3).astype(np.float32) * 2.0
TEXT_BANK = _R.randn(L_TEST, PROJ).astype(np.float32)
NULL_EMBED = _R.randn(1, PROJ).astype(np.float32)
IMG_RAW = (_R.rand(B, 3, IMG, IMG) * 255).astype(np.float32)
CLIP_STUB_FEAT = _R.randn(16 * 16, PROJ).astype(np.float32)
BINARY_LABEL = _R.choice([0.0, 1.0, 255.0], size=(P, 1), p=[0.4, 0.4, 0.2]).astype(
    np.float32
)


def _ref_cfg():
    ns = types.SimpleNamespace
    return ns(
        classes=NCLS_TRAIN,
        num_queries=Q,
        pixel_mean=[123.675, 116.28, 103.53],
        pixel_std=[58.395, 57.12, 57.375],
        mask_shape=[MH, MW],
        test_ignore_label=[L_TEST, 255],
        binary_2d_thresh=0.5,
        scores_keep_thresh=SCORE_THRESH,
        data_ratio=0.267,
        category_split=ns(
            base_category=list(BASE),
            novel_category=list(NOVEL),
            all_category=list(range(L_TEST)),
            ignore_category=[255],
        ),
        base_ratio=BASE_RATIO,
        novel_ratio=NOVEL_RATIO,
        label=[f"c{i}" for i in range(NCLS_TRAIN)],
        all_label=[f"t{i}" for i in range(L_TEST)],
    )


# ---------------------------------------------------------------------------
# reference model assembly (real forward, real head modules, stub towers)
# ---------------------------------------------------------------------------


def _load_ref_head_classes():
    install_m2f_misc_stub()
    fns = load_ref_module(
        "mask2former.modeling.pixel_decoder.ops.functions.ms_deform_attn_func"
    )
    pkg = sys.modules["mask2former.modeling.pixel_decoder.ops.functions"]
    pkg.MSDeformAttnFunction = fns.MSDeformAttnFunction
    pkg.ms_deform_attn_core_pytorch = fns.ms_deform_attn_core_pytorch
    px = load_ref_module("mask2former.modeling.pixel_decoder.msdeformattn")
    m2f_dec = load_ref_module(
        "mask2former.modeling.transformer_decoder.mask2former_transformer_decoder"
    )
    odise_ns = load_ref_classes(
        "models/modeling/meta_arch/odise.py",
        ["PseudoClassEmbed", "MaskPooling", "PooledMaskEmbed",
         "ODISEMultiScaleMaskedTransformerDecoder"],
        {
            "MultiScaleMaskedTransformerDecoder":
                m2f_dec.MultiScaleMaskedTransformerDecoder,
            "MLP": m2f_dec.MLP,
        },
    )
    from typing import Callable, Dict, Optional, Union

    head_ns = load_ref_classes(
        "third_party/Mask2Former/mask2former/modeling/meta_arch/mask_former_head.py",
        ["MaskFormerHead"],
        {
            "configurable": sys.modules["detectron2.config"].configurable,
            "ShapeSpec": sys.modules["detectron2.layers"].ShapeSpec,
            "Conv2d": sys.modules["detectron2.layers"].Conv2d,
            "get_norm": sys.modules["detectron2.layers"].get_norm,
            "weight_init": sys.modules["fvcore.nn.weight_init"],
            "build_transformer_decoder": None,
            "build_pixel_decoder": None,
            "deepcopy": __import__("copy").deepcopy,
            "Dict": Dict, "Union": Union, "Callable": Callable,
            "Optional": Optional,
        },
    )
    return px, odise_ns, head_ns


class _ClipStub(torch.nn.Module):
    """Deterministic MaskCLIP stand-in: mask-sigmoid pooling of a fixed
    random pixel-feature table (the real MaskCLIP is goldened separately in
    test_golden_round4.py::test_maskclip_attn_mask_vs_reference)."""

    def forward(self, images, pred_masks):
        m = pred_masks.sigmoid().flatten(2)  # (B, Q, h*w)
        f = torch.from_numpy(CLIP_STUB_FEAT)
        emb = (m @ f) / (m.sum(-1, keepdim=True) + 1.0)
        return {"mask_embed_clip": emb}

    def embed_text(self, captions):
        out = types.SimpleNamespace()
        out.text_embed = torch.zeros(len(captions), PROJ)
        return out


def _build_reference_model():
    px, odise_ns, head_ns = _load_ref_head_classes()
    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec
    helper = load_ref_module("models.modeling.meta_arch.helper")
    fuser_mod = load_ref_module("models.utils.fuser")

    xns = load_ref_classes(
        "models/xmask3d.py",
        ["XMASK3d"],
        {
            "ImageList": _ImageListStub,
            "ensemble_logits_with_labels": helper.ensemble_logits_with_labels,
        },
    )

    torch.manual_seed(3)
    input_shape = {
        "s2": ShapeSpec(channels=48, stride=4),
        "s3": ShapeSpec(channels=48, stride=8),
        "s4": ShapeSpec(channels=48, stride=16),
        "s5": ShapeSpec(channels=48, stride=32),
    }
    pixel_decoder = px.MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=HEADS,
        transformer_dim_feedforward=FFN,
        transformer_enc_layers=ENC_LAYERS,
        conv_dim=HID,
        mask_dim=MDIM,
        norm="GN",
        transformer_in_features=["s3", "s4", "s5"],
        common_stride=4,
    )
    predictor = odise_ns["ODISEMultiScaleMaskedTransformerDecoder"](
        class_embed=odise_ns["PseudoClassEmbed"](num_classes=NCLS_TRAIN),
        post_mask_embed=odise_ns["PooledMaskEmbed"](
            hidden_dim=HID, mask_dim=MDIM, projection_dim=PROJ
        ),
        in_channels=HID,
        mask_classification=True,
        num_classes=NCLS_TRAIN,
        hidden_dim=HID,
        num_queries=Q,
        nheads=HEADS,
        dim_feedforward=FFN,
        dec_layers=DEC_LAYERS,
        pre_norm=False,
        mask_dim=MDIM,
        enforce_input_project=False,
    )
    head = head_ns["MaskFormerHead"](
        input_shape=input_shape,
        num_classes=NCLS_TRAIN,
        pixel_decoder=pixel_decoder,
        loss_weight=1.0,
        ignore_value=255,
        transformer_predictor=predictor,
        transformer_in_feature="multi_scale_pixel_decoder",
    )
    fuser = fuser_mod.FeatureMerger(feature_dim=PROJ)

    # assemble XMASK3d without running __init__ (which hardcodes the
    # full-size architecture); forward/cal_pred_logits run VERBATIM
    RefX = xns["XMASK3d"]
    ref = RefX.__new__(RefX)
    torch.nn.Module.__init__(ref)
    cfg = _ref_cfg()
    ref.cfg = cfg
    ref.pixel_mean = cfg.pixel_mean
    ref.pixel_std = cfg.pixel_std
    ref.size_divisibility = 64
    ref.seq_len = 77
    ref.ignore_label = cfg.category_split.ignore_category
    ref.pc_decoder = _PCStub()
    ref.pc_binary_head = _PCBinaryStub()
    ref.backbone = _BackboneStub()
    ref.sem_seg_head = head
    ref.criterion = types.SimpleNamespace(
        fuser=fuser, fc1=torch.nn.Identity(), clip=_ClipStub(), weight_dict={}
    )
    ref.category_head = _CategoryStub()
    ref.clip_head = ref.criterion.clip
    ref.binary_loss_func = None
    return ref, pixel_decoder, predictor, fuser


class _ImageListStub:
    def __init__(self, tensor):
        self.tensor = tensor

    @staticmethod
    def from_tensors(tensors, size_divisibility=0):
        return _ImageListStub(torch.stack(list(tensors)))


class _PCStub(torch.nn.Module):
    def forward(self, sinput):
        return (
            torch.zeros(V, 16),
            torch.from_numpy(VOX_PRED3D),
            torch.zeros(V, dtype=torch.long),
        )


class _PCBinaryStub(torch.nn.Module):
    def forward(self, sinput):
        return torch.from_numpy(VOX_BINARY)


class _BackboneStub(torch.nn.Module):
    def forward(self, images, imp_condition):
        return {k: torch.from_numpy(v) for k, v in BB_FEATS.items()}


class _CategoryStub(torch.nn.Module):
    """CategoryEmbed eval surface (odise.py:674-700): fixed test text bank
    + null embed + singleton synonym groups, identity text_proj."""

    def __init__(self):
        super().__init__()
        self.clip = _ClipStub()
        self.text_proj = torch.nn.Identity()

    def forward(self, outputs, targets=None):
        return {
            "text_embed": torch.from_numpy(TEXT_BANK),
            "null_embed": torch.from_numpy(NULL_EMBED),
            "labels": [[name] for name in _ref_cfg().all_label],
        }


def _ref_batch():
    return {
        "label_2d": torch.zeros(B, MH, MW),
        "sinput": None,
        "captions": ["a room"],
        "inds_reconstruct": torch.from_numpy(INDS_RECON),
        "img": torch.from_numpy(IMG_RAW),
        "ori_coords": torch.cat(
            [torch.zeros(P, 1), torch.from_numpy(COORDS)], dim=1
        ),
        "x_label": torch.from_numpy(X_LABEL),
        "y_label": torch.from_numpy(Y_LABEL),
    }


# ---------------------------------------------------------------------------
# our model: the real eval_forward with the same stub seams
# ---------------------------------------------------------------------------


def _build_our_model():
    from xmask3d_tpu.losses.fuser import FeatureMerger
    from xmask3d_tpu.models.mask_decoder import (
        CategoryEmbed,
        ODISEMaskedTransformerDecoder,
    )
    from xmask3d_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from xmask3d_tpu.models.xmask3d import XMask3D, XMask3DConfig

    cfg = XMask3DConfig(
        num_classes=NCLS_TRAIN,
        num_test_classes=L_TEST,
        num_queries=Q,
        mask_shape=(MH, MW),
        projection_dim=PROJ,
        base_category=BASE,
        novel_category=NOVEL,
        ignore_category=(255,),
        binary_2d_thresh=0.5,
        scores_keep_thresh=SCORE_THRESH,
        dec_layers=DEC_LAYERS,
        pixel_enc_layers=ENC_LAYERS,
    )

    class TailXMask3D(XMask3D):
        """XMask3D with the stubbed towers replaced by the SAME fixed
        tensors the reference stubs return; pixel/mask decoder, category
        embed, fuser and the whole eval_forward stay the real code."""

        def setup(self):
            c = self.cfg
            self.pixel_decoder = MSDeformAttnPixelDecoder(
                conv_dim=HID, mask_dim=MDIM, heads=HEADS, points=4,
                enc_layers=c.pixel_enc_layers, ffn_dim=FFN,
            )
            self.mask_decoder = ODISEMaskedTransformerDecoder(
                num_classes=c.num_classes, hidden_dim=HID,
                num_queries=c.num_queries, heads=HEADS, ffn_dim=FFN,
                dec_layers=c.dec_layers, mask_dim=MDIM,
                projection_dim=c.projection_dim,
            )
            self.category_embed = CategoryEmbed(embed_dim=c.projection_dim)
            self.fuser = FeatureMerger(feature_dim=c.projection_dim)

        def _trunk(self, batch, statics, train, precomp_3d=None):
            feats = {k: batch["bb_" + k] for k in ("s2", "s3", "s4", "s5")}
            mask_features, ms_feats = self.pixel_decoder(feats)
            outputs = self.mask_decoder(ms_feats, mask_features)
            outputs["pred_3d"] = batch["t_pred_3d"]
            outputs["binary_scores"] = batch["t_binary_scores"]
            outputs["images"] = batch["img"] / 255.0
            return outputs

        def _clip_mask_embed(self, img01, pred_masks):
            b, q = pred_masks.shape[:2]
            m = jax.nn.sigmoid(pred_masks.astype(jnp.float32)).reshape(b, q, -1)
            f = jnp.asarray(CLIP_STUB_FEAT)
            return (m @ f) / (m.sum(-1, keepdims=True) + 1.0)

    return TailXMask3D(cfg=cfg)


def _our_batch():
    pred_3d = VOX_PRED3D[INDS_RECON]  # (P, PROJ)
    binary = VOX_BINARY[INDS_RECON][:, 0]  # (P,)
    return {
        "img": jnp.asarray(IMG_RAW.transpose(0, 2, 3, 1)),
        "x_label": jnp.asarray(X_LABEL[None]),
        "y_label": jnp.asarray(Y_LABEL[None]),
        "point_valid": jnp.ones((B, P), bool),
        "t_pred_3d": jnp.asarray(pred_3d[None]),
        "t_binary_scores": jnp.asarray(binary[None]),
        **{
            "bb_" + k: jnp.asarray(v.transpose(0, 2, 3, 1))
            for k, v in BB_FEATS.items()
        },
    }


def _convert_weights(our_params, pixel_decoder, predictor, fuser):
    from xmask3d_tpu.checkpoint.convert_torch import apply_flat_updates
    from xmask3d_tpu.checkpoint.convert_xmask3d import (
        convert_mask_decoder,
        convert_pixel_decoder,
    )

    sd = {
        f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
        for k, v in pixel_decoder.state_dict().items()
    }
    sd.update(
        {
            f"sem_seg_head.predictor.{k}": v.detach().numpy()
            for k, v in predictor.state_dict().items()
        }
    )
    conv = {}
    convert_pixel_decoder(sd, conv, enc_layers=ENC_LAYERS)
    convert_mask_decoder(sd, conv, dec_layers=DEC_LAYERS)
    conv["fuser/linear/kernel"] = fuser.linear.weight.detach().numpy().T
    conv["fuser/linear/bias"] = fuser.linear.bias.detach().numpy()
    conv["category_embed/null_embed"] = NULL_EMBED
    params = jax.tree_util.tree_map(np.asarray, our_params)
    applied = apply_flat_updates(params, conv)
    assert len(applied) == len(conv), sorted(set(conv) - set(applied))
    return params


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def e2e_run():
    ref, pixel_decoder, predictor, fuser = _build_reference_model()
    ref.eval()
    with torch.no_grad():
        _, ref_out = ref(_ref_batch())

    model = _build_our_model()
    batch = _our_batch()
    statics = {"text_embed_test": jnp.asarray(TEXT_BANK)}
    variables = model.init(jax.random.PRNGKey(0), batch, statics, train=False)
    params = _convert_weights(variables["params"], pixel_decoder, predictor, fuser)
    _, ours = jax.jit(
        lambda p, b, s: model.apply({"params": p}, b, s, train=False)
    )(params, batch, statics)
    return ref_out, jax.tree_util.tree_map(np.asarray, ours)


def test_eval_forward_chain_vs_reference(e2e_run):
    ref_out, ours = e2e_run

    # pred_logits through the real converted decoder + cal_pred_logits
    np.testing.assert_allclose(
        ours["pred_logits"], ref_out["pred_logits"].numpy(), rtol=2e-3, atol=2e-3
    )
    # binary head routing input
    np.testing.assert_array_equal(
        ours["binary_pred"][0], ref_out["binary_pred"].numpy()[:, 0]
    )
    # panoptic filtering: same surviving masks, same projected points
    valid = ours["final_mask_valid"][0].astype(bool)
    ref_masks = ref_out["final_mask_3d"][0].numpy()
    assert valid.sum() == ref_masks.shape[0]
    np.testing.assert_array_equal(ours["final_mask_3d"][0][valid], ref_masks)
    # open (CLIP) embeddings of surviving masks
    np.testing.assert_allclose(
        ours["final_pred_open_embedding"][0][valid],
        ref_out["final_pred_open_embedding"][0].numpy(),
        rtol=2e-3, atol=2e-3,
    )
    # painted + fused + pure-3d per-point features
    np.testing.assert_allclose(
        ours["2d_pred_feature"][0], ref_out["2d_pred_feature"][0].numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        ours["fused_pred_feature"][0], ref_out["fused_pred_feature"][0].numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        ours["pure3d_pred_feature"][0], ref_out["pure3d_pred_feature"][0].numpy(),
        rtol=2e-3, atol=2e-3,
    )


def test_infer_ensemble_chain_vs_reference(e2e_run):
    """run/infer.py:484-648 executed verbatim vs engine/infer.py."""
    from sklearn.neighbors import KDTree

    import torch.nn.functional as F

    ref_out, ours = e2e_run

    ns = {
        "outputs": dict(ref_out),
        "binary_label_3d": torch.from_numpy(BINARY_LABEL.copy()),
        "args": _ref_cfg(),
        "ori_coords_3d": torch.cat(
            [torch.zeros(P, 1), torch.from_numpy(COORDS)], dim=1
        ),
        "mask_2d": torch.arange(P),
        "inds_reconstruct": torch.from_numpy(INDS_RECON),
        "scene_pred": torch.zeros(P, L_TEST, dtype=torch.long),
        "scene_pred_2d": torch.zeros(P, L_TEST, dtype=torch.long),
        "scene_pred_3d": torch.zeros(P, L_TEST, dtype=torch.long),
        "counter": torch.zeros(P, dtype=torch.long),
        "KDTree": KDTree,
        "torch": torch,
        "F": F,
    }
    exec_ref_block(
        "run/infer.py",
        'fused_feature = outputs["fused_pred_feature"]',
        "counter[mask_2d] += 1",
        ns,
    )

    from xmask3d_tpu.engine.infer import (
        ensemble_and_route,
        fill_and_route_2d,
        nearest_covered_match,
    )

    outs_j = {k: jnp.asarray(v) for k, v in ours.items() if k != "aux_outputs"}
    res = ensemble_and_route(
        outs_j, BASE, NOVEL, L_TEST, base_ratio=BASE_RATIO,
        novel_ratio=NOVEL_RATIO,
    )
    np.testing.assert_array_equal(
        np.asarray(res["pred"][0]), ns["logits_pred"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(res["pred_3d"][0]), ns["logits_pred_3d"].numpy()
    )
    covered = np.asarray(res["covered_2d"][0])
    match = nearest_covered_match(COORDS, covered, np.ones(P, bool))
    pred_2d = fill_and_route_2d(
        res["feat_2d"], jnp.asarray(match[None]), res["binary_pred"],
        res["text"], res["logit_scale"], BASE, NOVEL,
    )
    np.testing.assert_array_equal(
        np.asarray(pred_2d[0]), ns["logits_pred_2d"].numpy()
    )
    # the multi-view vote increments land identically
    votes = np.zeros((P, L_TEST), np.int64)
    votes[np.arange(P), np.asarray(res["pred"][0])] += 1
    np.testing.assert_array_equal(votes, ns["scene_pred"].numpy())
