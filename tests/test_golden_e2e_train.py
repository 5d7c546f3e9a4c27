"""End-to-end TRAIN-forward golden: the REFERENCE training chain composed
from its own torch modules vs our train_forward, on shared converted weights.

The eval-side counterpart (test_golden_e2e_eval.py) pins the inference
composition; this pins the training composition the per-loss goldens cannot:
targets-from-label_2d (reference models/xmask3d.py:189-224), matcher +
labels/masks losses over final+aux layers (models/utils/criterion.py:209-376),
MaskCLIP-embed plumbing, panoptic filtering + mask_mapper fusion inside the
criterion (:260-345), loss_exact (:184-207), loss_contra (:39-182), the
caption cosine losses and binary BCE (models/xmask3d.py:239-297), and the
weight-dict filtering at the end of the reference train forward (:299-304).

Randomness (matcher point draws, uncertainty point sampling) is shared by
replaying our jax draws into the reference's torch.rand in call order — the
protocol proven per-loss in test_golden_reference.py (matcher) and
test_golden_round3.py (loss_masks). Our per-layer keys are captured from the
real train_forward's top-level jax.random.split via a spy, so the test runs
the REAL code path (vmapped matcher/losses) unmodified.

Stubbed with SHARED fixed tensors on both sides (each covered by its own
golden): the 3D UNet branches, the SD feature backbone, and the CLIP towers.
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
import test_golden_e2e_eval as E  # noqa: E402  (shared dims/stubs/converter)
from golden_utils import load_ref_classes, load_ref_module  # noqa: E402

NUM_POINTS = 32  # matcher + mask-loss point budget (reference uses 12544)
N_LAYERS = E.DEC_LAYERS + 1  # final + aux prediction heads
IGNORE_LABEL = E.NCLS_TRAIN  # compacted CE ignore sentinel (= len(base))
DATA_RATIO = 0.267

_R = np.random.RandomState(77)
TRAIN_TEXT_BANK = _R.randn(E.NCLS_TRAIN, E.PROJ).astype(np.float32)
CAPTION_EMBED = _R.randn(E.B, E.PROJ).astype(np.float32)
# every train class present so np.unique == our precomputed target_labels
LABEL2D = _R.randint(0, E.NCLS_TRAIN, size=(E.B, E.IMG, E.IMG)).astype(np.int64)
TARGET_LABELS = np.unique(LABEL2D[0]).astype(np.int32)  # sorted, T = NCLS
NT = E.B * len(TARGET_LABELS)
LABELS_3D = _R.randint(0, E.NCLS_TRAIN + 1, size=(E.P,)).astype(np.int64)
# novel-heavy binary labels so the 1.8x novel-dominance rule can fire
BINARY_3D = _R.choice(
    [0.0, 1.0, 255.0], size=(E.P,), p=[0.7, 0.2, 0.1]
).astype(np.float32)

LOSS_KEYS = (
    ["loss_ce", "loss_mask", "loss_dice"]
    + [f"loss_{k}_{i}" for i in range(N_LAYERS - 1) for k in ("ce", "mask", "dice")]
    + ["loss_3d", "loss_3d_pure", "loss_3d_contra",
       "loss_explicit_contra", "loss_explicit_contra_3d",
       "loss_explicit_contra_2d_pre", "loss_binary"]
)


# ---------------------------------------------------------------------------
# reference: real Criterion/matcher/mask_mapper grafted into the eval build
# ---------------------------------------------------------------------------


class _TrainCategoryStub(torch.nn.Module):
    """CategoryEmbed train surface (odise.py:600-665): fixed train text bank
    + null embed + singleton synonym groups; identity text_proj; caption
    text tower returns a fixed embedding (towers goldened separately)."""

    def __init__(self):
        super().__init__()
        self.clip = types.SimpleNamespace(
            embed_text=lambda captions: types.SimpleNamespace(
                text_embed=torch.from_numpy(CAPTION_EMBED.copy())
            )
        )
        self.text_proj = torch.nn.Identity()

    def forward(self, outputs, targets=None):
        return {
            "text_embed": torch.from_numpy(TRAIN_TEXT_BANK),
            "null_embed": torch.from_numpy(E.NULL_EMBED),
            "labels": [[f"c{i}"] for i in range(E.NCLS_TRAIN)],
        }


def _build_ref_train_model():
    ref, pixel_decoder, predictor, fuser = E._build_reference_model()

    m2f_criterion = load_ref_module("mask2former.modeling.criterion")
    matcher_mod = load_ref_module("mask2former.modeling.matcher")
    fuser_mod = load_ref_module("models.utils.fuser")
    RefCriterion = load_ref_classes(
        "models/utils/criterion.py",
        ["Criterion"],
        {
            "SetCriterion": m2f_criterion.SetCriterion,
            "get_world_size": lambda: 1,
            "MaskCLIP": None,
            "FeatureMerger": None,
            "mask_mapper": fuser_mod.mask_mapper,
            "is_dist_avail_and_initialized": lambda: False,
        },
    )["Criterion"]

    # build the full Criterion without __init__ (which instantiates CLIP):
    # SetCriterion state via its real __init__, Criterion extras by hand
    crit = RefCriterion.__new__(RefCriterion)
    m2f_criterion.SetCriterion.__init__(
        crit,
        num_classes=E.NCLS_TRAIN,
        matcher=matcher_mod.HungarianMatcher(
            cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=NUM_POINTS
        ),
        class_weight=2.0,
        mask_weight=5.0,
        dice_weight=5.0,
        num_layers=N_LAYERS - 1,
        eos_coef=0.1,
        losses=["labels", "masks"],
        num_points=NUM_POINTS,
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    crit.fuser = fuser
    crit.fc1 = torch.nn.Identity()
    crit.fc2 = torch.nn.Identity()
    crit.criterion = torch.nn.CrossEntropyLoss(ignore_index=IGNORE_LABEL)
    crit.ignore_label = IGNORE_LABEL
    crit.mask_contra_3d = True
    crit.contra_criterion = torch.nn.CosineSimilarity()
    crit.cfg = ref.cfg
    crit.clip = E._ClipStub()
    # all-ones weights: we compare unweighted values; the filter semantics
    # (reference xmask3d.py:299-304 drops keys missing from weight_dict)
    # stay exercised
    crit.weight_dict = {k: 1.0 for k in LOSS_KEYS}

    ref.criterion = crit
    ref.clip_head = crit.clip
    ref.category_head = _TrainCategoryStub()
    ref.binary_loss_func = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([DATA_RATIO])
    )
    ref.cfg.ignore_label = IGNORE_LABEL
    ref.cfg.data_ratio = DATA_RATIO
    ref.cfg.caption_contra = True
    ref.cfg.caption_contra_2d_pre = True
    ref.cfg.caption_contra_3d = True
    ref.train()
    return ref, pixel_decoder, predictor, fuser


def _ref_train_batch():
    b = E._ref_batch()
    b.update(
        {
            "label_2d": torch.from_numpy(LABEL2D.astype(np.float32)),
            "captions": ["a tiny room"] * E.B,
            "labels_3d": torch.from_numpy(LABELS_3D),
            "binary_label_3d": torch.from_numpy(BINARY_3D),
        }
    )
    return b


# ---------------------------------------------------------------------------
# ours: the real train_forward with the same stub seams
# ---------------------------------------------------------------------------


def _build_our_train_model():
    from xmask3d_tpu.losses.fuser import FeatureMerger
    from xmask3d_tpu.models.mask_decoder import (
        CategoryEmbed,
        ODISEMaskedTransformerDecoder,
    )
    from xmask3d_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from xmask3d_tpu.models.xmask3d import XMask3D, XMask3DConfig

    cfg = XMask3DConfig(
        num_classes=E.NCLS_TRAIN,
        num_test_classes=E.L_TEST,
        num_queries=E.Q,
        mask_shape=(E.MH, E.MW),
        projection_dim=E.PROJ,
        base_category=E.BASE,
        novel_category=E.NOVEL,
        ignore_category=(255,),
        ignore_label=IGNORE_LABEL,
        data_ratio=DATA_RATIO,
        num_points=NUM_POINTS,
        dec_layers=E.DEC_LAYERS,
        pixel_enc_layers=E.ENC_LAYERS,
        caption_contra=True,
        caption_contra_2d_pre=True,
        caption_contra_3d=True,
        mask_contra_3d=True,
    )

    class TailTrainXMask3D(XMask3D):
        """XMask3D with stubbed towers replaced by the SAME fixed tensors
        the reference stubs return; decoders, category embed, fuser and the
        whole train_forward stay the real code."""

        def setup(self):
            c = self.cfg
            self.pixel_decoder = MSDeformAttnPixelDecoder(
                conv_dim=E.HID, mask_dim=E.MDIM, heads=E.HEADS, points=4,
                enc_layers=c.pixel_enc_layers, ffn_dim=E.FFN,
            )
            self.mask_decoder = ODISEMaskedTransformerDecoder(
                num_classes=c.num_classes, hidden_dim=E.HID,
                num_queries=c.num_queries, heads=E.HEADS, ffn_dim=E.FFN,
                dec_layers=c.dec_layers, mask_dim=E.MDIM,
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
            f = jnp.asarray(E.CLIP_STUB_FEAT)
            return (m @ f) / (m.sum(-1, keepdims=True) + 1.0)

        def embed_captions(self, tokens):
            return jnp.asarray(CAPTION_EMBED)

    return TailTrainXMask3D(cfg=cfg)


def _our_train_batch():
    b = E._our_batch()
    t = len(TARGET_LABELS)
    b.update(
        {
            "label_2d": jnp.asarray(LABEL2D.astype(np.int32)),
            "target_labels": jnp.asarray(TARGET_LABELS[None]),
            "target_valid": jnp.ones((E.B, t), bool),
            "caption_tokens": jnp.zeros((E.B, 16), jnp.int32),
            "labels_3d": jnp.asarray(LABELS_3D[None].astype(np.int32)),
            "binary_label_3d": jnp.asarray(BINARY_3D[None]),
        }
    )
    return b


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def train_run():
    ref, pixel_decoder, predictor, fuser = _build_ref_train_model()

    model = _build_our_train_model()
    batch = _our_train_batch()
    statics = {"text_embed_train": jnp.asarray(TRAIN_TEXT_BANK)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, statics, train=True,
    )
    params = E._convert_weights(
        variables["params"], pixel_decoder, predictor, fuser
    )

    # run the REAL train_forward eagerly, capturing its per-layer point keys
    # from the top-level split(rng, 2 * n_layers)
    captured = []
    real_split = jax.random.split

    def split_spy(key, num=2):
        out = real_split(key, num)
        if not isinstance(key, jax.core.Tracer) and int(num) == 2 * N_LAYERS:
            captured.append(out)
        return out

    jax.random.split = split_spy
    try:
        our_losses, our_outputs = model.apply(
            {"params": params}, batch, statics, train=True,
            rngs={"points": jax.random.PRNGKey(7)},
        )
    finally:
        jax.random.split = real_split
    assert len(captured) == 1, "expected exactly one 2*n_layers key split"
    keys = captured[0]

    # replay our jax point draws on the torch side, in reference call order:
    # per prediction layer (final first, aux after every mid loss — the
    # reference runs aux matcher/losses at the END of Criterion.forward, with
    # no torch.rand caller in between): matcher rand per image, then the two
    # uncertainty-sampling rands (ops/point_sample.py:49-60 protocol, proven
    # per-loss in test_golden_round3.py). Pairing order differs: our
    # loss_masks rows are TARGET-ordered, the reference's are QUERY-ascending
    # (scipy linear_sum_assignment row order), so the per-pair draws are
    # permuted by the layer's (recomputed, key-identical) match.
    from xmask3d_tpu.losses.matcher import hungarian_match

    t = len(TARGET_LABELS)
    tl = jnp.asarray(TARGET_LABELS[None])
    tv = jnp.ones((E.B, t), bool)
    tmasks = (
        jnp.asarray(LABEL2D.astype(np.int32))[:, None] == tl[:, :, None, None]
    ).astype(jnp.float32)
    all_logits = [our_outputs["pred_logits"]] + [
        a["pred_logits"] for a in our_outputs["aux_outputs"]
    ]
    all_masks = [our_outputs["pred_masks"]] + [
        a["pred_masks"] for a in our_outputs["aux_outputs"]
    ]

    n_sampled = int(NUM_POINTS * 3.0)
    n_rand = NUM_POINTS - int(0.75 * NUM_POINTS)
    draws = []
    for j in range(N_LAYERS):
        ka, kb = keys[2 * j], keys[2 * j + 1]
        m = np.asarray(jax.random.uniform(ka, (E.B, NUM_POINTS, 2)))
        for i in range(E.B):  # reference matcher draws per image
            draws.append(m[i : i + 1])
        match_j = np.asarray(
            hungarian_match(
                ka, all_logits[j], all_masks[j], tl, tmasks, tv,
                num_points=NUM_POINTS, cost_class=2.0, cost_mask=5.0,
                cost_dice=5.0,
            )
        )  # (B, T) query index per target — same key => same draws/assignment
        k1, k2 = real_split(kb)
        c1 = np.asarray(
            jax.random.uniform(k1, (NT, n_sampled, 2))
        ).reshape(E.B, t, n_sampled, 2)
        c2 = np.asarray(
            jax.random.uniform(k2, (NT, n_rand, 2))
        ).reshape(E.B, t, n_rand, 2)
        perm = [np.argsort(match_j[i]) for i in range(E.B)]
        draws.append(np.concatenate([c1[i][perm[i]] for i in range(E.B)]))
        draws.append(np.concatenate([c2[i][perm[i]] for i in range(E.B)]))

    pending = list(draws)

    def fixed_rand(*size, **kw):
        if size and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        arr = pending.pop(0)
        assert tuple(size) == arr.shape, (tuple(size), arr.shape)
        return torch.from_numpy(arr.copy())

    real_rand = torch.rand
    torch.rand = fixed_rand
    try:
        with torch.no_grad():
            ref_losses, ref_outputs = ref(_ref_train_batch())
    finally:
        torch.rand = real_rand
    assert not pending, f"{len(pending)} unused replayed draws"

    our_losses = {k: np.asarray(v) for k, v in our_losses.items()}
    return ref_losses, ref_outputs, our_losses, our_outputs


def test_train_losses_vs_reference(train_run):
    ref_losses, _, our_losses, _ = train_run
    assert set(LOSS_KEYS) == set(ref_losses.keys())
    for k in LOSS_KEYS:
        np.testing.assert_allclose(
            our_losses[k], float(ref_losses[k]), rtol=2e-4, atol=1e-5,
            err_msg=k,
        )


def test_train_fused_features_vs_reference(train_run):
    _, ref_outputs, _, our_outputs = train_run
    ref_fused = np.stack(
        [f.numpy() for f in ref_outputs["fused_pred_feature"]]
    )
    np.testing.assert_allclose(
        np.asarray(our_outputs["fused_pred_feature"]), ref_fused,
        rtol=1e-4, atol=1e-5,
    )
    ref_clip = ref_outputs["mask_embed_clip"].numpy()
    np.testing.assert_allclose(
        np.asarray(our_outputs["mask_embed_clip"]), ref_clip,
        rtol=1e-4, atol=1e-5,
    )
