"""SD UNet + text-encoder converter coverage (tiny architecture)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmask3d_tpu.checkpoint.convert_torch import (
    apply_flat_updates,
    convert_sd_text_encoder,
    convert_sd_unet,
)
from xmask3d_tpu.models.ldm_extractor import LDM_TINY, LdmExtractor
from tests.test_converters import _flatten, _unflatten_prefix, _lookup

# compile-heavy kernel/model tests (excluded from make test-fast)
pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def tiny_params():
    model = LdmExtractor(LDM_TINY)
    img = jnp.zeros((1, 64, 64, 3))
    cond = jnp.zeros((1, LDM_TINY.text.context_length, LDM_TINY.text.width))
    toks = jnp.zeros((1, LDM_TINY.text.context_length), jnp.int32)
    variables = jax.jit(
        lambda r, i, c, t: model.init(r, i, c, t, method=model.init_all)
    )(jax.random.PRNGKey(0), img, cond, toks)
    return variables["params"]


def _unet_torch_key(parts, cfg):
    """Inverse of convert_sd_unet's naming."""
    p = "model.diffusion_model"
    kind = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
    n_lv = len(cfg.ch_mult)
    head = parts[0]

    def res_sub(sub):
        return {
            "in_norm": "in_layers.0", "in_conv": "in_layers.2",
            "emb_proj": "emb_layers.1", "out_norm": "out_layers.0",
            "out_conv": "out_layers.3", "skip": "skip_connection",
        }[sub]

    def attn_path(rest):
        # rest like ["block_0", "attn1", "to_q", "kernel"] or
        # ["norm"|"proj_in"|"proj_out", ...]
        if rest[0] in ("norm", "proj_in", "proj_out"):
            return rest[0]
        sub = rest[1]
        if sub in ("attn1", "attn2"):
            proj = rest[2]
            return f"transformer_blocks.0.{sub}." + (
                "to_out.0" if proj == "to_out" else proj
            )
        if sub.startswith("norm"):
            return f"transformer_blocks.0.{sub}"
        if sub == "ff_geglu":
            return "transformer_blocks.0.ff.net.0.proj"
        if sub == "ff_out":
            return "transformer_blocks.0.ff.net.2"
        raise KeyError(rest)

    if head == "time_embed_0":
        return f"{p}.time_embed.0.{kind}"
    if head == "time_embed_2":
        return f"{p}.time_embed.2.{kind}"
    if head == "in_conv":
        return f"{p}.input_blocks.0.0.{kind}"
    if head == "out_norm":
        return f"{p}.out.0.{kind}"
    if head == "out_conv":
        return f"{p}.out.2.{kind}"

    toks = head.split("_")
    if toks[0] == "down":
        lv = int(toks[1])
        per = cfg.num_res_blocks + 1  # res(+attn) blocks + downsample slot
        if toks[2] == "downsample":
            idx = 1 + lv * per + cfg.num_res_blocks
            return f"{p}.input_blocks.{idx}.0.op.{kind}"
        i = int(toks[3])
        idx = 1 + lv * per + i
        if toks[2] == "res":
            return f"{p}.input_blocks.{idx}.0.{res_sub(parts[1])}.{kind}"
        return f"{p}.input_blocks.{idx}.1.{attn_path(parts[1:])}.{kind}"
    if toks[0] == "mid":
        if toks[1] == "res":
            blk = 0 if toks[2] == "0" else 2
            return f"{p}.middle_block.{blk}.{res_sub(parts[1])}.{kind}"
        return f"{p}.middle_block.1.{attn_path(parts[1:])}.{kind}"
    if toks[0] == "up":
        lv = int(toks[1])
        r = n_lv - 1 - lv
        if toks[2] == "upsample":
            idx = r * (cfg.num_res_blocks + 1) + cfg.num_res_blocks
            sub = 2 if lv in cfg.attention_levels else 1
            return f"{p}.output_blocks.{idx}.{sub}.conv.{kind}"
        i = int(toks[3])
        idx = r * (cfg.num_res_blocks + 1) + i
        if toks[2] == "res":
            return f"{p}.output_blocks.{idx}.0.{res_sub(parts[1])}.{kind}"
        return f"{p}.output_blocks.{idx}.1.{attn_path(parts[1:])}.{kind}"
    raise KeyError(head)


def test_sd_unet_converter_covers_all_params(tiny_params):
    cfg = LDM_TINY.unet
    flat = _flatten(tiny_params)
    unet_leaves = {k: v for k, v in flat.items() if k.startswith("unet/")}
    sd = {}
    for name, arr in unet_leaves.items():
        arr = np.asarray(arr)
        parts = name.split("/")[1:]
        tkey = _unet_torch_key(parts, cfg)
        if parts[-1] == "kernel" and arr.ndim == 4:
            sd[tkey] = np.transpose(arr, (3, 2, 0, 1))
        elif parts[-1] == "kernel":
            sd[tkey] = np.transpose(arr, (1, 0))
        else:
            sd[tkey] = arr
    converted = convert_sd_unet(
        sd, ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
        attention_levels=cfg.attention_levels,
    )
    tree = _unflatten_prefix(unet_leaves)
    applied = apply_flat_updates(tree, converted, strict=True)
    missing = set(k[len("unet/"):] for k in unet_leaves) - set(applied)
    assert not missing, f"converter missed: {sorted(missing)[:10]}"
    for name in applied:
        np.testing.assert_allclose(
            _lookup(tree, name), np.asarray(unet_leaves[f"unet/{name}"]), atol=1e-6
        )


def test_sd_text_encoder_converter_covers(tiny_params):
    tcfg = LDM_TINY.text
    flat = _flatten(tiny_params)
    leaves = {k: v for k, v in flat.items() if k.startswith("text_encoder/")}
    p = "cond_stage_model.transformer.text_model"
    sd = {}
    for name, arr in leaves.items():
        arr = np.asarray(arr)
        parts = name.split("/")[1:]
        if parts[0] == "token_embedding":
            sd[f"{p}.embeddings.token_embedding.weight"] = arr
        elif parts[0] == "positional_embedding":
            sd[f"{p}.embeddings.position_embedding.weight"] = arr
        elif parts[0] == "text_projection":
            pass  # SD text encoder has none; converter emits identity
        elif parts[0] == "ln_final":
            kind = "weight" if parts[1] == "scale" else "bias"
            sd[f"{p}.final_layer_norm.{kind}"] = arr
        else:  # transformer/resblock_i/...
            i = parts[1].split("_")[1]
            s = f"{p}.encoder.layers.{i}"
            kind = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
            if parts[2] == "attn":
                if parts[3] == "in_proj":
                    w = arr.T if parts[-1] == "kernel" else arr
                    q, k, v = np.split(w, 3, axis=0)
                    for nm, val in zip("qkv", (q, k, v)):
                        sd[f"{s}.self_attn.{nm}_proj.{kind}"] = val
                else:
                    sd[f"{s}.self_attn.out_proj.{kind}"] = (
                        arr.T if parts[-1] == "kernel" else arr
                    )
            elif parts[2] in ("ln_1", "ln_2"):
                ln = "layer_norm1" if parts[2] == "ln_1" else "layer_norm2"
                sd[f"{s}.{ln}.{kind}"] = arr
            elif parts[2] == "mlp_c_fc":
                sd[f"{s}.mlp.fc1.{kind}"] = arr.T if parts[-1] == "kernel" else arr
            elif parts[2] == "mlp_c_proj":
                sd[f"{s}.mlp.fc2.{kind}"] = arr.T if parts[-1] == "kernel" else arr
    converted = convert_sd_text_encoder(sd, layers=tcfg.layers)
    tree = _unflatten_prefix(leaves)
    applied = apply_flat_updates(tree, converted, strict=True)
    missing = set(k[len("text_encoder/"):] for k in leaves) - set(applied)
    assert not missing, f"converter missed: {sorted(missing)}"
