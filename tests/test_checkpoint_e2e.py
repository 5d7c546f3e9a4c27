"""End-to-end checkpoint-conversion proof on synthetic reference-format
fixtures (VERDICT r3 missing #2 / next-step #3).

tests/ref_state_dict.py builds the EXACT key/shape inventory of a
b15n4.pth.tar-style checkpoint straight from the reference sources,
independently of the converter. These tests then prove, without real assets:

1. the converter consumes every checkpoint key (nothing silently dropped)
   and never asks for a key the reference would not save (KeyError);
2. critical wirings carry the right tensors (BN mean vs var, per-layer norm
   assignment, flat-vs-nested SyncBN naming) via unique tag values;
3. converted shapes are the documented torch->Flax transforms at
   non-square layers (transpose/permutation errors change shapes);
4. a converted checkpoint LOADS into real model variables and the eval
   forward runs finite (tiny variant, full arch topology).

The day real assets stage, parity is a run, not a debug session.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_state_dict import (
    INTENTIONALLY_UNCONSUMED,
    build_state_dict,
    tiny_manifest_from_model,
    xmask3d_state_dict_manifest,
)
from xmask3d_tpu.checkpoint.convert_torch import apply_flat_updates
from xmask3d_tpu.checkpoint.convert_xmask3d import convert_xmask3d_checkpoint

# compile-heavy: builds/compiles a full tiny model (excluded from make test-fast)
pytestmark = pytest.mark.e2e


class RecordingSD(dict):
    """state_dict that records consumed keys and raises on unknown ones."""

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()
        self.misses = set()

    def __getitem__(self, k):
        if k not in self:
            self.misses.add(k)
            raise KeyError(f"converter requested a key the reference "
                           f"checkpoint does not contain: {k}")
        self.consumed.add(k)
        return super().__getitem__(k)


@pytest.fixture(scope="module")
def converted_full():
    manifest = xmask3d_state_dict_manifest()
    arrays, tags = build_state_dict(manifest)
    # the real file carries DDP's `module.` prefix (util/util.py:17-21)
    sd = RecordingSD({f"module.{k}": v for k, v in arrays.items()})
    # _strip runs first, so consumption is tracked on stripped keys
    import xmask3d_tpu.checkpoint.convert_xmask3d as cx

    stripped = RecordingSD(arrays)
    orig = cx._strip
    cx._strip = lambda _sd: stripped
    try:
        params, stats = convert_xmask3d_checkpoint(dict(sd))
    finally:
        cx._strip = orig
    return manifest, tags, stripped, params, stats


def test_converter_consumes_every_checkpoint_key(converted_full):
    manifest, _, sd, _, _ = converted_full
    assert not sd.misses  # converter never asked for a nonexistent key
    ignorable = {
        k for k in manifest
        if any(k.endswith(s) or k == s for s in INTENTIONALLY_UNCONSUMED)
    }
    leftover = set(manifest) - sd.consumed - ignorable
    assert not leftover, (
        f"{len(leftover)} checkpoint keys silently dropped by the converter: "
        f"{sorted(leftover)[:10]}"
    )


def test_critical_wirings_carry_the_right_tensors(converted_full):
    _, tags, _, params, stats = converted_full

    def const(arr):
        a = np.asarray(arr)
        v = a.reshape(-1)[0]
        assert (a == v).all(), "converted tensor is not the single-source tag"
        return float(v)

    # ME BN (SyncBN-converted, nested .bn): scale<-weight, mean<-running_mean,
    # var<-running_var — a swap anywhere here silently corrupts every BN
    assert const(params["pc_decoder/MinkUNet_0/bn0/scale"]) == tags[
        "pc_decoder.encoder.bn0.bn.weight"]
    assert const(stats["pc_decoder/MinkUNet_0/bn0/mean"]) == tags[
        "pc_decoder.encoder.bn0.bn.running_mean"]
    assert const(stats["pc_decoder/MinkUNet_0/bn0/var"]) == tags[
        "pc_decoder.encoder.bn0.bn.running_var"]
    # torch BN (flat naming) on the binary head
    assert const(params["pc_binary_head/bn/scale"]) == tags[
        "pc_binary_head.batch_norm.weight"]
    assert const(stats["pc_binary_head/bn/var"]) == tags[
        "pc_binary_head.batch_norm.running_var"]
    # block-level: downsample BN distinct from block conv norms
    assert const(stats["pc_decoder/MinkUNet_0/block2_0/downsample_norm/mean"]) == tags[
        "pc_decoder.encoder.block2.0.downsample.1.bn.running_mean"]
    # mask decoder norm wiring: norm1<-cross.norm, norm2<-self.norm, norm3<-ffn.norm
    md = "sem_seg_head.predictor"
    assert const(params["mask_decoder/layer_4/norm1/scale"]) == tags[
        f"{md}.transformer_cross_attention_layers.4.norm.weight"]
    assert const(params["mask_decoder/layer_4/norm2/scale"]) == tags[
        f"{md}.transformer_self_attention_layers.4.norm.weight"]
    assert const(params["mask_decoder/layer_4/norm3/scale"]) == tags[
        f"{md}.transformer_ffn_layers.4.norm.weight"]
    # cross vs self attention projections come from the right layer stacks
    assert const(params["mask_decoder/layer_2/cross_attn/q_proj/kernel"]) == tags[
        f"{md}.transformer_cross_attention_layers.2.multihead_attn.in_proj_weight"]
    assert const(params["mask_decoder/layer_2/self_attn/out_proj/kernel"]) == tags[
        f"{md}.transformer_self_attention_layers.2.self_attn.out_proj.weight"]
    # pixel decoder: per-level input projs + norms, per-layer deform attn
    pdk = "sem_seg_head.pixel_decoder"
    assert const(params["pixel_decoder/input_proj_2/kernel"]) == tags[
        f"{pdk}.input_proj.2.0.weight"]
    assert const(params["pixel_decoder/input_norm_2/scale"]) == tags[
        f"{pdk}.input_proj.2.1.weight"]
    assert const(params["pixel_decoder/encoder_layer_5/sampling_offsets/kernel"]) == tags[
        f"{pdk}.transformer.encoder.layers.5.self_attn.sampling_offsets.weight"]
    assert const(params["pixel_decoder/level_embed_1"]) == tags[
        f"{pdk}.transformer.level_embed"]
    # backbone projection: GN rides the conv module in torch
    assert const(params["backbone/proj_3/norm2/scale"]) == tags[
        "backbone.feature_projections.3.0.conv2.norm.weight"]
    assert const(params["backbone/proj_2/shortcut/kernel"]) == tags[
        "backbone.feature_projections.2.0.shortcut.weight"]
    # captioner + heads
    assert const(params["backbone/feature_extractor/alpha_cond_time_embed"]) == tags[
        "backbone.feature_extractor.alpha_cond_time_embed"]
    assert const(params["category_embed/null_embed"]) == tags[
        "category_head.null_embed"]
    assert const(params["fuser/linear/kernel"]) == tags["criterion.fuser.linear.weight"]
    # post-mask-embed: LayerNorm & MLP from the right Sequential slots
    assert const(params["mask_decoder/post_mask_embed/pool_norm/scale"]) == tags[
        f"{md}.post_mask_embed.pool_proj.0.weight"]
    assert const(params["mask_decoder/post_mask_embed/embed_mlp/layer_2/kernel"]) == tags[
        f"{md}.post_mask_embed.mask_embed.1.layers.2.weight"]


def test_converted_shapes_are_the_documented_transforms(converted_full):
    _, _, _, params, stats = converted_full
    expect = {
        # ME kernels keep (K, Cin, Cout); kernel-1 collapses to (Cin, Cout)
        "pc_decoder/MinkUNet_0/conv0/kernel": (125, 3, 32),
        "pc_decoder/MinkUNet_0/conv1/kernel": (8, 32, 32),
        "pc_decoder/MinkUNet_0/block1_0/conv1/kernel": (27, 32, 32),
        "pc_decoder/MinkUNet_0/final/kernel": (1, 96, 256),
        "pc_decoder/MinkUNet_0/block2_0/downsample_conv/kernel": (1, 32, 64),
        "pc_decoder/MinkUNet_0/convtr4/kernel": (8, 256, 256),
        # torch Linear (out,in) -> Flax (in,out)
        "pc_decoder/point2text_adapter/kernel": (256, 768),
        "pc_binary_head/fc/kernel": (256, 1),
        "pixel_decoder/encoder_layer_0/sampling_offsets/kernel": (256, 192),
        "pixel_decoder/encoder_layer_0/linear1/kernel": (256, 1024),
        "mask_decoder/layer_0/ffn1/kernel": (256, 2048),
        "mask_decoder/post_mask_embed/embed_mlp/layer_2/kernel": (256, 768),
        "backbone/feature_extractor/time_embed_project/linear/kernel": (768, 1280),
        "fuser/linear/kernel": (1536, 768),
        # torch Conv2d (out,in,kh,kw) -> Flax (kh,kw,in,out)
        "backbone/proj_2/conv1/kernel": (1, 1, 1280, 128),
        "backbone/proj_2/conv2/kernel": (3, 3, 128, 128),
        "backbone/proj_2/conv3/kernel": (1, 1, 128, 512),
        "pixel_decoder/input_proj_0/kernel": (1, 1, 512, 256),
        "pixel_decoder/layer_1/kernel": (3, 3, 256, 256),
        "pixel_decoder/mask_features/kernel": (1, 1, 256, 256),
        # embeddings / misc
        "mask_decoder/query_feat": (50, 256),
        "pixel_decoder/level_embed_0": (256,),
        "category_embed/null_embed": (1, 768),
        "backbone/feature_extractor/alpha_cond": (1, 77, 768),
        "backbone/feature_extractor/time_embed_project/positional_embedding":
            (1, 1, 1280),
        "mask_decoder/post_mask_embed/logit_scale": (),
    }
    for k, shape in expect.items():
        assert k in params, f"missing converted param {k}"
        assert tuple(params[k].shape) == shape, (
            f"{k}: {params[k].shape} != {shape}"
        )
    assert tuple(stats["pc_decoder/MinkUNet_0/bn0/mean"].shape) == (32,)


@pytest.fixture(scope="module")
def tiny_setup():
    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model

    caps = Capacities(max_points=512, max_voxels=256, max_targets=8)
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    cfg.max_points, cfg.max_voxels, cfg.max_targets = 512, 256, 8
    cfg.mask_shape = [24, 32]
    batch = synthetic_batch(
        1, caps, seed=0, num_points=400, image_size=(64, 64),
        mask_shape=(24, 32), context_length=16, vocab_size=512,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch, tiny=True)
    return model, variables, statics, batch


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, name + "/"))
        else:
            out[name] = v
    return out


def test_tiny_conversion_loads_and_runs(tiny_setup):
    """Reference-format fixture (tiny dims) -> convert -> load into REAL
    variables (strict shape check in apply_flat_updates) -> eval forward."""
    model, variables, statics, batch = tiny_setup
    flat = _flatten(variables["params"])

    # tiny dims read off the actual model tree (naming independence is
    # proven by the full-manifest tests above; this one proves load+run)
    manifest = tiny_manifest_from_model(model, flat)

    arrays, _ = build_state_dict(manifest, values="random")
    params, stats = convert_xmask3d_checkpoint(
        {f"module.{k}": v for k, v in arrays.items()}
    )

    applied_p = apply_flat_updates(variables["params"], params, strict=True)
    applied_s = apply_flat_updates(variables["batch_stats"], stats, strict=True)
    assert len(applied_p) == len(params)
    assert len(applied_s) == len(stats)

    # loaded values visible in the tree
    got = np.asarray(variables["params"]["fuser"]["linear"]["kernel"])
    np.testing.assert_array_equal(
        got, arrays["criterion.fuser.linear.weight"].T
    )

    _, outputs = model.apply(
        variables, batch, statics, train=False,
        rngs={"points": jax.random.PRNGKey(0)},
    )
    assert outputs["pred_logits"].shape[0] == 1
    assert np.isfinite(np.asarray(outputs["pred_logits"])).all()


def test_converted_npz_roundtrip(tiny_setup, tmp_path):
    """The scripts/convert_checkpoints.py npz format loads through
    checkpoint/load_converted.apply_converted (the infer CLI --converted
    path) with identical values."""
    from xmask3d_tpu.checkpoint.load_converted import apply_converted

    model, variables, _, _ = tiny_setup
    flat = _flatten(variables["params"])
    some = dict(list(flat.items())[:5])
    bundle = {f"params/{k}": np.asarray(v) for k, v in some.items()}
    bundle["batch_stats/pc_decoder/MinkUNet_0/bn0/mean"] = np.full(
        np.asarray(
            variables["batch_stats"]["pc_decoder"]["MinkUNet_0"]["bn0"]["mean"]
        ).shape, 3.25, np.float32,
    )
    path = tmp_path / "conv.npz"
    np.savez(path, **bundle)

    target = jax.tree_util.tree_map(np.asarray, variables)
    target, applied_p, applied_s = apply_converted(target, str(path))
    assert len(applied_p) == 5 and len(applied_s) == 1
    got = np.asarray(
        target["batch_stats"]["pc_decoder"]["MinkUNet_0"]["bn0"]["mean"]
    )
    np.testing.assert_array_equal(got, 3.25)
