"""Round-5 goldens: loss_contra and mask_mapper vs the REFERENCE code.

Replaces builder-authored oracles with the reference implementation itself:
- Criterion.loss_contra (models/utils/criterion.py:39-182) executed verbatim
  (MaskCLIP stubbed out — loss_contra consumes precomputed embeddings).
- mask_mapper (models/utils/fuser.py:6-53) imported and run as-is.
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
    install_m2f_misc_stub,
    load_ref_classes,
    load_ref_module,
)


def _load_ref_criterion_class():
    install_m2f_misc_stub()
    m2f_criterion = load_ref_module("mask2former.modeling.criterion")
    return load_ref_classes(
        "models/utils/criterion.py",
        ["Criterion"],
        {
            "SetCriterion": m2f_criterion.SetCriterion,
            "get_world_size": lambda: 1,
            "MaskCLIP": None,
            "FeatureMerger": None,
            "mask_mapper": None,
            "is_dist_avail_and_initialized": lambda: False,
        },
    )["Criterion"]


def _binary_labels(rng, p, p_novel, p_base, p_ignore):
    return rng.choice(
        [0.0, 1.0, 255.0], size=(p,), p=[p_novel, p_base, p_ignore]
    ).astype(np.float32)


@pytest.mark.parametrize(
    "case", ["mixed", "novel_heavy", "base_heavy", "none_dominant"]
)
def test_loss_contra_vs_reference(case):
    B, Q, P, C = 3, 8, 400, 16
    MH, MW = 24, 32
    rng = np.random.RandomState({"mixed": 0, "novel_heavy": 1,
                                 "base_heavy": 3, "none_dominant": 2}[case])

    mask_logits = (rng.randn(B, Q, MH, MW) * 2).astype(np.float32)
    clip_embed = rng.randn(B, Q, C).astype(np.float32)
    feat_3d = rng.randn(B, P, C).astype(np.float32)
    fused = rng.randn(B, P, C).astype(np.float32)
    mask_embed = rng.randn(B, Q, C).astype(np.float32)
    x_label = rng.randint(0, MH, size=(B, P)).astype(np.int64)
    y_label = rng.randint(0, MW, size=(B, P)).astype(np.int64)

    if case == "mixed":
        binary = np.stack([
            _binary_labels(rng, P, 0.8, 0.15, 0.05),  # novel-dominant scene
            _binary_labels(rng, P, 0.05, 0.9, 0.05),  # base-dominant scene
            _binary_labels(rng, P, 0.35, 0.55, 0.10),
        ])
    elif case == "novel_heavy":
        binary = np.stack([_binary_labels(rng, P, 0.95, 0.05, 0.0)
                           for _ in range(B)])
    elif case == "base_heavy":
        # all-base labels: base_num_ > 20 * novel_num_ and > 150 points ->
        # the base-dominant rule fires; top-1 of many flagged masks
        binary = np.ones((B, P), np.float32)
    else:  # nothing qualifies: all-ignore labels defeat both dominance rules
        binary = np.full((B, P), 255.0, np.float32)

    # reference, verbatim (loss_contra only touches self.cfg.mask_shape)
    RefCriterion = _load_ref_criterion_class()
    self_ns = types.SimpleNamespace(
        cfg=types.SimpleNamespace(mask_shape=[MH, MW])
    )
    outputs = {
        "pred_masks": torch.from_numpy(mask_logits),
        "mask_embed": torch.from_numpy(mask_embed),
        "mask_embed_clip": torch.from_numpy(clip_embed),
        "fused_pred_feature": [torch.from_numpy(f) for f in fused],
        "pure3d_pred_feature": [torch.from_numpy(f) for f in feat_3d],
    }
    with torch.no_grad():
        ref_loss, _ = RefCriterion.loss_contra(
            self_ns,
            [torch.from_numpy(x) for x in x_label],
            [torch.from_numpy(y) for y in y_label],
            None,
            None,
            [torch.from_numpy(b) for b in binary],
            outputs,
        )
    ref = float(ref_loss["loss_3d_contra"])

    # ours: same mask->point projection the model applies
    # (models/xmask3d.py:463-472), then the batched loss
    from xmask3d_tpu.losses.criterion import loss_contra
    from xmask3d_tpu.losses.fuser import project_masks_to_points

    m3d_logits = project_masks_to_points(
        jnp.asarray(mask_logits), jnp.asarray(x_label), jnp.asarray(y_label)
    )
    mask_3d = jax.nn.sigmoid(m3d_logits) >= 0.5
    got = float(
        loss_contra(
            mask_3d,
            jnp.asarray(mask_logits),
            jnp.asarray(clip_embed),
            jnp.asarray(feat_3d),
            jnp.asarray(binary),
            jnp.ones((B, P), bool),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mask_mapper_vs_reference():
    """paint_and_fuse vs the imported reference mask_mapper (fuser.py:6-53),
    with a real shared FeatureMerger on both sides."""
    fuser_mod = load_ref_module("models.utils.fuser")

    B, Q, P, C = 2, 5, 60, 12
    MH, MW = 16, 20
    rng = np.random.RandomState(7)
    # mask VALUES (the criterion passes filtered masks; >= 0.5 membership)
    masks = rng.rand(B, Q, MH, MW).astype(np.float32)
    # make one scene's masks all-empty to hit the [0][0]=True fallback
    masks[1] *= 0.3
    embeds = rng.randn(B, Q, C).astype(np.float32)
    pred3d = rng.randn(B, P, C).astype(np.float32)
    x_label = rng.randint(0, MH, size=(B, P)).astype(np.int64)
    y_label = rng.randint(0, MW, size=(B, P)).astype(np.int64)

    torch.manual_seed(11)
    ref_fuser = fuser_mod.FeatureMerger(feature_dim=C)
    cfg = types.SimpleNamespace(caption_contra_2d_pre=True)
    with torch.no_grad():
        out, out_2d, out_3d, _ = fuser_mod.mask_mapper(
            [torch.from_numpy(x) for x in x_label],
            [torch.from_numpy(y) for y in y_label],
            torch.from_numpy(masks),
            torch.from_numpy(embeds),
            [torch.from_numpy(f) for f in pred3d],
            ref_fuser,
            torch.nn.Identity(),
            torch.nn.Identity(),
            cfg,
        )

    from xmask3d_tpu.losses.fuser import (
        FeatureMerger,
        paint_and_fuse,
        project_masks_to_points,
    )

    ours_fuser = FeatureMerger(feature_dim=C)
    variables = ours_fuser.init(
        jax.random.PRNGKey(0), jnp.zeros((1, C)), jnp.zeros((1, C))
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["linear"]["kernel"] = ref_fuser.linear.weight.detach().numpy().T
    params["linear"]["bias"] = ref_fuser.linear.bias.detach().numpy()

    mask_3d = (
        project_masks_to_points(
            jnp.asarray(masks), jnp.asarray(x_label), jnp.asarray(y_label)
        )
        >= 0.5
    )
    got = paint_and_fuse(
        mask_3d,
        jnp.ones((B, Q), bool),
        jnp.asarray(embeds),
        jnp.asarray(pred3d),
        jnp.ones((B, P), bool),
        lambda a, b: ours_fuser.apply({"params": params}, a, b),
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got["fused"])[b], out[b].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["feat_2d"])[b], out_2d[b].numpy(), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(pred3d[b], out_3d[b].numpy())
