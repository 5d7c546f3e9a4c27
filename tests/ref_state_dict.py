"""Reference-format XMask3D checkpoint manifest (keys + shapes), written
independently of the converter, straight from the reference sources.

The b15n4.pth.tar-style checkpoint is `model.state_dict()` of the DDP-wrapped
SyncBN-converted XMASK3d (reference run/train.py:355-390 saves
`model.state_dict()`; run/infer.py:181-182 applies
`ME.MinkowskiSyncBatchNorm.convert_sync_batchnorm` +
`torch.nn.SyncBatchNorm.convert_sync_batchnorm` before load, and training
does the same, so BN keys use the converted names). Frozen towers
(SD ldm_extractor, all ClipAdapter/MaskCLIP instances) override
`state_dict()` to return empty (models/modeling/meta_arch/helper.py:38-39,
clip.py:105-106), so none of their keys appear.

Sources for each section:
- MinkUNet: models/modeling/meta_arch/mink_unet.py:44-116 construction,
  ME MinkowskiBatchNorm nests the torch BN as `<name>.bn` so keys are
  `<name>.bn.weight` etc.; ME BasicBlock is conv1/norm1/conv2/norm2 (+
  downsample Sequential(conv, bn)) with expansion 1.
- PC processors: models/modeling/meta_arch/pc_processor.py:6-60.
- Backbone projections: models/modeling/backbone/feature_extractor.py:36-49
  (detectron2 BottleneckBlock: conv1/conv2/conv3 bias-free Conv2d each with
  a GN `norm` child; `shortcut` iff in_channels != out_channels).
- Implicit captioner: models/modeling/meta_arch/ldm.py:574-625
  (PositionalLinear = linear + (1, seq, out) positional_embedding;
  alpha_cond zeros_like(uncond_inputs) i.e. (1, 77, 768);
  alpha_cond_time_embed (time_embed_out,)).
- Pixel decoder: third_party/Mask2Former/.../pixel_decoder/msdeformattn.py
  (input_proj.{i} = Sequential(Conv2d k1 with bias, GroupNorm);
  transformer.level_embed (3, d); encoder.layers.{i}.self_attn.* MSDeformAttn
  linears; adapter_1/layer_1 bias-free Conv2d with GN norm child;
  mask_features Conv2d k1 WITH bias), dims pinned by models/xmask3d.py:68-77
  (conv_dim=mask_dim=256, ffn 1024, 6 layers, 3 levels, 8 heads, 4 points).
- Predictor: third_party/Mask2Former/.../mask2former_transformer_decoder.py
  :271-332 (9 layers of self/cross/ffn each with a single `norm`;
  query_feat/query_embed/level_embed nn.Embedding; mask_embed MLP 3x;
  input_proj = empty Sequentials since in_channels==hidden_dim;
  class_embed replaced by parameterless PseudoClassEmbed, odise.py:342) and
  odise.py:550-571 PooledMaskEmbed, dims from models/xmask3d.py:81-97
  (hidden 256, ffn 2048, dec_layers 9, projection_dim 768).
- category_head.null_embed: odise.py:626; text_embed buffer is registered
  non-persistent (odise.py:623-625) so it is NOT in the checkpoint;
  text_proj is Identity for projection_dim=-1 (odise.py:619-620,
  xmask3d.py:125).
- criterion: fuser.linear = Linear(2*768, 768) (models/utils/fuser.py:64-67);
  empty_weight buffer (num_classes+1,) (Mask2Former criterion.py:120-122).
- binary_loss_func.pos_weight buffer (1,) (models/xmask3d.py:45-47).
"""

from typing import Dict, List, Tuple

import numpy as np

# MinkUNet variant tables (reference mink_unet.py:181-243)
MINK_VARIANTS = {
    "MinkUNet34C": ((32, 64, 128, 256, 256, 128, 96, 96), (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet18A": ((32, 64, 128, 256, 128, 128, 96, 96), (2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet14A": ((32, 64, 128, 256, 128, 128, 96, 96), (1, 1, 1, 1, 1, 1, 1, 1)),
}

# SD v1 tap channel dims for encoder taps (5,7), unet output-block taps
# (2,5,8,11), vae decoder taps (2,5) — reference models/xmask3d.py:50-53
# block indices over SD v1 (vae ch 128 x (1,2,4,4) x2 blocks; unet 320 x
# (1,2,4,4) x (2+1) output blocks; decoder 512-start x 3 blocks/level).
SD_V1_TAP_DIMS = [512, 512, 1280, 1280, 640, 320, 512, 512]


def _me_bn(out: Dict, name: str, ch: int) -> None:
    """SyncBN-converted MinkowskiBatchNorm: params nested under `.bn`."""
    out[f"{name}.bn.weight"] = (ch,)
    out[f"{name}.bn.bias"] = (ch,)
    out[f"{name}.bn.running_mean"] = (ch,)
    out[f"{name}.bn.running_var"] = (ch,)
    out[f"{name}.bn.num_batches_tracked"] = ()


def _torch_bn(out: Dict, name: str, ch: int) -> None:
    out[f"{name}.weight"] = (ch,)
    out[f"{name}.bias"] = (ch,)
    out[f"{name}.running_mean"] = (ch,)
    out[f"{name}.running_var"] = (ch,)
    out[f"{name}.num_batches_tracked"] = ()


def _linear(out: Dict, name: str, d_in: int, d_out: int, bias=True) -> None:
    out[f"{name}.weight"] = (d_out, d_in)
    if bias:
        out[f"{name}.bias"] = (d_out,)


def _me_conv(out: Dict, name: str, cin: int, cout: int, k: int) -> None:
    """ME kernel: (k^3, cin, cout); kernel_size=1 collapses to (cin, cout)
    (MinkowskiEngine convolution kernel layout)."""
    if k == 1:
        out[f"{name}.kernel"] = (cin, cout)
    else:
        out[f"{name}.kernel"] = (k**3, cin, cout)


def minkunet_keys(prefix: str, arch: str, in_ch: int, out_ch: int,
                  init_dim: int = 32) -> Dict[str, Tuple[int, ...]]:
    """MinkUNetBase state_dict keys/shapes (mink_unet.py:44-116)."""
    planes, layers = MINK_VARIANTS[arch]
    out: Dict[str, Tuple[int, ...]] = {}
    _me_conv(out, f"{prefix}.conv0p1s1", in_ch, init_dim, 5)
    _me_bn(out, f"{prefix}.bn0", init_dim)

    def blocks(i, inplanes, p):
        for j in range(layers[i]):
            b = f"{prefix}.block{i + 1}.{j}"
            cin = inplanes if j == 0 else p
            _me_conv(out, f"{b}.conv1", cin, p, 3)
            _me_bn(out, f"{b}.norm1", p)
            _me_conv(out, f"{b}.conv2", p, p, 3)
            _me_bn(out, f"{b}.norm2", p)
            if j == 0 and cin != p:
                _me_conv(out, f"{b}.downsample.0", cin, p, 1)
                _me_bn(out, f"{b}.downsample.1", p)
        return p

    inplanes = init_dim
    for s in range(4):  # encoder: conv{s+1}p{2^s}s2 keeps channels
        _me_conv(out, f"{prefix}.conv{s + 1}p{2**s}s2", inplanes, inplanes, 2)
        _me_bn(out, f"{prefix}.bn{s + 1}", inplanes)
        inplanes = blocks(s, inplanes, planes[s])
    skip = [init_dim, planes[0], planes[1], planes[2]]  # stride-1..8 skips
    for d in range(4):  # decoder: convtr{4+d}p{2^(4-d)}s2
        _me_conv(out, f"{prefix}.convtr{4 + d}p{2**(4 - d)}s2",
                 inplanes, planes[4 + d], 2)
        _me_bn(out, f"{prefix}.bntr{4 + d}", planes[4 + d])
        inplanes = blocks(4 + d, planes[4 + d] + skip[3 - d], planes[4 + d])
    _me_conv(out, f"{prefix}.final", planes[7], out_ch, 1)
    return out


def bottleneck_proj_keys(prefix: str, d_in: int, d_out: int) -> Dict:
    """detectron2 BottleneckBlock inside feature_projections.{i}.0."""
    mid = d_out // 4
    out: Dict[str, Tuple[int, ...]] = {}
    for conv, (ci, co, k) in [
        ("conv1", (d_in, mid, 1)), ("conv2", (mid, mid, 3)), ("conv3", (mid, d_out, 1)),
    ]:
        out[f"{prefix}.{conv}.weight"] = (co, ci, k, k)
        out[f"{prefix}.{conv}.norm.weight"] = (co,)
        out[f"{prefix}.{conv}.norm.bias"] = (co,)
    if d_in != d_out:
        out[f"{prefix}.shortcut.weight"] = (d_out, d_in, 1, 1)
        out[f"{prefix}.shortcut.norm.weight"] = (d_out,)
        out[f"{prefix}.shortcut.norm.bias"] = (d_out,)
    return out


def positional_linear_keys(prefix: str, d_in: int, d_out: int, seq: int) -> Dict:
    out: Dict[str, Tuple[int, ...]] = {}
    _linear(out, f"{prefix}.linear", d_in, d_out)
    out[f"{prefix}.positional_embedding"] = (1, seq, d_out)
    return out


def xmask3d_state_dict_manifest(
    arch_3d: str = "MinkUNet34C",
    arch_binary: str = "MinkUNet18A",
    num_classes: int = 15,
    num_queries: int = 50,
    tap_dims: List[int] = tuple(SD_V1_TAP_DIMS),
    proj_dim: int = 512,       # FeatureExtractorBackbone projection_dim
    conv_dim: int = 256,       # pixel decoder / predictor hidden
    latent_dim: int = 768,     # CLIP latent / SD conditioning width
    seq_len: int = 77,
    time_embed_dim: int = 1280,  # 4 * unet model_channels
    last_dim: int = 256,       # PC_Processor last_dim
    enc_layers: int = 6,
    dec_layers: int = 9,
    ffn_enc: int = 1024,
    ffn_dec: int = 2048,
    n_levels: int = 3,
    n_heads: int = 8,
    n_points: int = 4,
) -> Dict[str, Tuple[int, ...]]:
    """Every key of the reference checkpoint's state_dict with its shape."""
    sd: Dict[str, Tuple[int, ...]] = {}

    # --- pc_decoder / pc_binary_head (pc_processor.py:6-60) ---
    sd.update(minkunet_keys("pc_decoder.encoder", arch_3d, 3, last_dim))
    _linear(sd, "pc_decoder.point2text_adapter", last_dim, latent_dim)
    _linear(sd, "pc_decoder.decoder", last_dim, latent_dim)
    sd.update(minkunet_keys("pc_binary_head.encoder", arch_binary, 3, 256))
    _torch_bn(sd, "pc_binary_head.batch_norm", 256)
    _linear(sd, "pc_binary_head.fc", 256, 1)

    # --- binary loss buffer (xmask3d.py:45-47) ---
    sd["binary_loss_func.pos_weight"] = (1,)

    # --- backbone projections + captioner ---
    for i, d in enumerate(tap_dims):
        sd.update(bottleneck_proj_keys(
            f"backbone.feature_projections.{i}.0", d, proj_dim))
    fx = "backbone.feature_extractor"
    sd.update(positional_linear_keys(
        f"{fx}.clip_project", latent_dim, latent_dim, seq_len))
    sd[f"{fx}.alpha_cond"] = (1, seq_len, latent_dim)
    sd.update(positional_linear_keys(
        f"{fx}.time_embed_project", latent_dim, time_embed_dim, 1))
    sd[f"{fx}.alpha_cond_time_embed"] = (time_embed_dim,)

    # --- pixel decoder ---
    pd = "sem_seg_head.pixel_decoder"
    for i in range(n_levels):
        sd[f"{pd}.input_proj.{i}.0.weight"] = (conv_dim, proj_dim, 1, 1)
        sd[f"{pd}.input_proj.{i}.0.bias"] = (conv_dim,)
        sd[f"{pd}.input_proj.{i}.1.weight"] = (conv_dim,)
        sd[f"{pd}.input_proj.{i}.1.bias"] = (conv_dim,)
    sd[f"{pd}.transformer.level_embed"] = (n_levels, conv_dim)
    for li in range(enc_layers):
        s = f"{pd}.transformer.encoder.layers.{li}"
        _linear(sd, f"{s}.self_attn.sampling_offsets",
                conv_dim, n_heads * n_levels * n_points * 2)
        _linear(sd, f"{s}.self_attn.attention_weights",
                conv_dim, n_heads * n_levels * n_points)
        _linear(sd, f"{s}.self_attn.value_proj", conv_dim, conv_dim)
        _linear(sd, f"{s}.self_attn.output_proj", conv_dim, conv_dim)
        for ln in ("norm1", "norm2"):
            sd[f"{s}.{ln}.weight"] = (conv_dim,)
            sd[f"{s}.{ln}.bias"] = (conv_dim,)
        _linear(sd, f"{s}.linear1", conv_dim, ffn_enc)
        _linear(sd, f"{s}.linear2", ffn_enc, conv_dim)
    sd[f"{pd}.adapter_1.weight"] = (conv_dim, proj_dim, 1, 1)
    sd[f"{pd}.adapter_1.norm.weight"] = (conv_dim,)
    sd[f"{pd}.adapter_1.norm.bias"] = (conv_dim,)
    sd[f"{pd}.layer_1.weight"] = (conv_dim, conv_dim, 3, 3)
    sd[f"{pd}.layer_1.norm.weight"] = (conv_dim,)
    sd[f"{pd}.layer_1.norm.bias"] = (conv_dim,)
    sd[f"{pd}.mask_features.weight"] = (conv_dim, conv_dim, 1, 1)
    sd[f"{pd}.mask_features.bias"] = (conv_dim,)

    # --- predictor ---
    md = "sem_seg_head.predictor"
    for emb in ("query_feat", "query_embed"):
        sd[f"{md}.{emb}.weight"] = (num_queries, conv_dim)
    sd[f"{md}.level_embed.weight"] = (n_levels, conv_dim)
    for li in range(dec_layers):
        ca = f"{md}.transformer_cross_attention_layers.{li}"
        sa = f"{md}.transformer_self_attention_layers.{li}"
        ff = f"{md}.transformer_ffn_layers.{li}"
        for base, attn in ((ca, "multihead_attn"), (sa, "self_attn")):
            sd[f"{base}.{attn}.in_proj_weight"] = (3 * conv_dim, conv_dim)
            sd[f"{base}.{attn}.in_proj_bias"] = (3 * conv_dim,)
            _linear(sd, f"{base}.{attn}.out_proj", conv_dim, conv_dim)
            sd[f"{base}.norm.weight"] = (conv_dim,)
            sd[f"{base}.norm.bias"] = (conv_dim,)
        _linear(sd, f"{ff}.linear1", conv_dim, ffn_dec)
        _linear(sd, f"{ff}.linear2", ffn_dec, conv_dim)
        sd[f"{ff}.norm.weight"] = (conv_dim,)
        sd[f"{ff}.norm.bias"] = (conv_dim,)
    sd[f"{md}.decoder_norm.weight"] = (conv_dim,)
    sd[f"{md}.decoder_norm.bias"] = (conv_dim,)
    for i in range(3):
        _linear(sd, f"{md}.mask_embed.layers.{i}", conv_dim, conv_dim)
    pme = f"{md}.post_mask_embed"
    sd[f"{pme}.pool_proj.0.weight"] = (conv_dim,)
    sd[f"{pme}.pool_proj.0.bias"] = (conv_dim,)
    _linear(sd, f"{pme}.pool_proj.1", conv_dim, conv_dim)
    sd[f"{pme}.mask_embed.0.weight"] = (conv_dim,)
    sd[f"{pme}.mask_embed.0.bias"] = (conv_dim,)
    _linear(sd, f"{pme}.mask_embed.1.layers.0", conv_dim, conv_dim)
    _linear(sd, f"{pme}.mask_embed.1.layers.1", conv_dim, conv_dim)
    _linear(sd, f"{pme}.mask_embed.1.layers.2", conv_dim, latent_dim)
    sd[f"{pme}.logit_scale"] = ()

    # --- category head + criterion ---
    sd["category_head.null_embed"] = (1, latent_dim)
    _linear(sd, "criterion.fuser.linear", 2 * latent_dim, latent_dim)
    sd["criterion.empty_weight"] = (num_classes + 1,)
    return sd


# Keys present in the checkpoint that the converter intentionally ignores:
# BN bookkeeping counters, loss-side buffers (re-derived from config), and
# the class-balance buffer the criterion rebuilds from eos_coef.
INTENTIONALLY_UNCONSUMED = (
    ".num_batches_tracked",
    "criterion.empty_weight",
    "binary_loss_func.pos_weight",
)


def tiny_manifest_from_model(model, flat_params) -> Dict[str, Tuple[int, ...]]:
    """Reference-checkpoint manifest with dims read off a built (tiny)
    model's flattened param tree — shared by the tiny-conversion test and
    the parity runbook's dry run (scripts/parity_b15n4.sh --dry-run)."""
    tap_dims = []
    i = 0
    while f"backbone/proj_{i}/conv1/kernel" in flat_params:
        tap_dims.append(flat_params[f"backbone/proj_{i}/conv1/kernel"].shape[2])
        i += 1
    cp = flat_params["backbone/feature_extractor/clip_project/positional_embedding"]
    tp = flat_params["backbone/feature_extractor/time_embed_project/linear/kernel"]
    manifest = xmask3d_state_dict_manifest(
        arch_3d=model.cfg.arch_3d,
        arch_binary=model.cfg.arch_binary_head,
        num_classes=model.cfg.num_classes,
        num_queries=model.cfg.num_queries,
        tap_dims=tap_dims,
        proj_dim=flat_params["backbone/proj_0/conv3/kernel"].shape[3],
        conv_dim=flat_params["pixel_decoder/mask_features/kernel"].shape[3],
        latent_dim=model.cfg.projection_dim,
        seq_len=cp.shape[1],
        time_embed_dim=tp.shape[1],
        enc_layers=model.cfg.pixel_enc_layers,
        dec_layers=model.cfg.dec_layers,
    )
    # tiny clip_project output width = SD text-conditioning width, not 768
    cond_w = cp.shape[2]
    manifest["backbone.feature_extractor.clip_project.linear.weight"] = (
        cond_w, model.cfg.projection_dim)
    manifest["backbone.feature_extractor.clip_project.linear.bias"] = (cond_w,)
    manifest["backbone.feature_extractor.clip_project.positional_embedding"] = (
        1, cp.shape[1], cond_w)
    manifest["backbone.feature_extractor.alpha_cond"] = (1, cp.shape[1], cond_w)
    return manifest


def build_state_dict(manifest: Dict[str, Tuple[int, ...]], values: str = "tags"):
    """Manifest -> {key: fp32 array}; returns (sd, tag_of_key).

    values="tags": every tensor is a unique constant (wiring checks).
    values="random": small random values that keep a forward numerically
    sane (running_var near 1, everything else ~N(0, 0.02))."""
    rng = np.random.RandomState(0)
    sd, tags = {}, {}
    for i, (k, shape) in enumerate(sorted(manifest.items())):
        tag = float(i + 1)
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0, np.int64)
        elif values == "tags":
            sd[k] = np.full(shape, tag, np.float32)
        elif k.endswith("running_var"):
            sd[k] = np.ones(shape, np.float32)
        else:
            sd[k] = rng.normal(0.0, 0.02, shape).astype(np.float32)
        tags[k] = tag
    return sd, tags
