"""Model + statics construction (the reference's XMASK3d.__init__ plus the
CategoryEmbed text-bank precompute, odise.py:623-626 / 666-673).

`statics` are frozen host-precomputed constants fed to every forward:
  text_embed_train: (L_train, 768) CLIP text bank of train label names
  text_embed_test:  (L_test, 768) bank of all label names
  uncond_tokens:    (1, T) tokenized ""
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.config import Config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.tokenizer import build_tokenizer
from xmask3d_tpu.models.clip import CLIP_CONFIGS
from xmask3d_tpu.models.ldm_extractor import LDM_SD_V1, LDM_TINY
from xmask3d_tpu.models.xmask3d import XMask3D, XMask3DConfig


def model_config_from_cfg(cfg: Config, tiny: bool = False) -> XMask3DConfig:
    ldm = LDM_TINY if tiny else LDM_SD_V1
    clip_name = "ViT-tiny" if tiny else cfg.get("clip_name", "ViT-L-14")
    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    return XMask3DConfig(
        num_classes=cfg.classes,
        num_test_classes=cfg.test_classes,
        num_queries=cfg.num_queries,
        arch_3d=cfg.arch_3d,
        arch_binary_head=cfg.arch_binary_head,
        mask_shape=tuple(cfg.mask_shape),
        clip_name=clip_name,
        ldm=ldm,
        base_category=tuple(cfg.category_split.base_category),
        novel_category=tuple(cfg.category_split.novel_category),
        ignore_category=tuple(cfg.category_split.ignore_category),
        ignore_label=cfg.ignore_label,
        data_ratio=cfg.data_ratio,
        binary_2d_thresh=cfg.binary_2d_thresh,
        scores_keep_thresh=cfg.scores_keep_thresh,
        caption_contra=cfg.caption_contra,
        caption_contra_2d_pre=cfg.caption_contra_2d_pre,
        caption_contra_3d=cfg.caption_contra_3d,
        mask_contra_3d=cfg.mask_contra_3d,
        loss_weight=dict(cfg.loss_weight),
        dec_layers=cfg.get("dec_layers", 9),
        pixel_enc_layers=cfg.get("pixel_enc_layers", 6),
        remat_backbone=bool(cfg.get("remat_backbone", False)),
        dtype=dtype,
    )


def data_tokenizer(cfg: Config, tiny: bool = False):
    """Caption tokenizer matching the model's text towers (vocab size and
    context length come from the CLIP config the model will use — the tiny
    towers run context 16 / vocab 512, so real-data loaders must tokenize
    accordingly or the caption positional embeddings clash)."""
    name = "ViT-tiny" if tiny else cfg.get("clip_name", "ViT-L-14")
    text_cfg = CLIP_CONFIGS[name][0]
    return build_tokenizer(
        cfg.get("clip_bpe_vocab", ""),
        vocab_size=text_cfg.vocab_size,
        context_length=text_cfg.context_length,
    )


def capacities_from_cfg(cfg: Config) -> Capacities:
    return Capacities(
        max_points=cfg.get("max_points", 65536),
        max_voxels=cfg.get("max_voxels", 49152),
        max_targets=cfg.get("max_targets", 24),
    )


def build_statics(
    model: XMask3D,
    params,
    cfg: Config,
    tokenizer=None,
) -> Dict[str, jnp.ndarray]:
    """Precompute the frozen CLIP text banks + uncond tokens on host."""
    mc = model.cfg
    text_cfg = CLIP_CONFIGS[mc.clip_name][0]
    if tokenizer is None:
        tokenizer = build_tokenizer(
            cfg.get("clip_bpe_vocab", ""),
            vocab_size=text_cfg.vocab_size,
            context_length=text_cfg.context_length,
        )

    def embed(texts: List[str]) -> jnp.ndarray:
        toks = jnp.asarray(tokenizer(texts))
        return model.apply(params, toks, method=lambda m, t: m.embed_captions(t))

    train_labels = list(cfg.label)
    test_labels = list(cfg.all_label)
    return {
        "text_embed_train": embed(train_labels),
        "text_embed_test": embed(test_labels),
        "uncond_tokens": jnp.asarray(tokenizer([""])),
    }


def zero_statics(model: XMask3D, cfg: Config) -> Dict[str, jnp.ndarray]:
    """Shape-only statics for init/tracing (before params exist)."""
    mc = model.cfg
    text_cfg = CLIP_CONFIGS[mc.clip_name][0]
    return {
        "text_embed_train": jnp.zeros((cfg.classes, mc.projection_dim)),
        "text_embed_test": jnp.zeros((cfg.test_classes, mc.projection_dim)),
        "uncond_tokens": jnp.zeros((1, text_cfg.context_length), jnp.int32),
    }


def _materialize_by_shape(shapes, seed: int):
    """Fill an eval_shape variables pytree with sane deterministic values:
    norm scales get 1, biases/stats 0, everything else N(0, 0.02). Used by
    shape-only init (compile-free); values only need to keep a forward
    finite, not train well. Host numpy throughout — per-leaf jax dispatches
    cost ~30 s on a single-core box."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.RandomState(seed)
    leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
        last = name.rsplit("/", 1)[-1]
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            leaves.append(jnp.zeros(leaf.shape, leaf.dtype))
        elif last in ("scale", "gamma") or name.endswith("var"):
            leaves.append(jnp.ones(leaf.shape, leaf.dtype))
        elif last in ("bias", "beta", "mean") or leaf.ndim == 0:
            leaves.append(jnp.zeros(leaf.shape, leaf.dtype))
        else:
            leaves.append(
                jnp.asarray(
                    (0.02 * rng.randn(*leaf.shape)).astype(np.float32), leaf.dtype
                )
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def init_model(
    cfg: Config, batch, tiny: bool = False, seed: int = 0,
    init_mode: str = "value",
) -> Tuple[XMask3D, Any, Dict[str, jnp.ndarray]]:
    """Build model, init variables on the given example batch, compute
    statics. Returns (model, variables, statics).

    init_mode="value" runs the real (jit-compiled) flax init.
    init_mode="shape" traces init under jax.eval_shape (NO compile/execute —
    on a CPU mesh the compiled init alone costs minutes) and materializes
    parameters by shape; for compile-validation paths like dryrun_multichip
    where parameter values are irrelevant.
    """
    mc = model_config_from_cfg(cfg, tiny=tiny)
    model = XMask3D(cfg=mc)
    statics0 = zero_statics(model, cfg)
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "points": jax.random.PRNGKey(seed + 1),
    }
    # init on the train path: it exercises every submodule (incl. the CLIP
    # text tower used for captions/statics), so all params are created.
    if init_mode == "shape":
        import os
        import time

        _t = time.time()
        shapes = jax.eval_shape(partial(model.init, train=True), rngs, batch, statics0)
        if os.environ.get("XMASK3D_TIME_INIT") == "1":
            print(f"  [init] eval_shape: {time.time()-_t:.1f}s", flush=True)
            _t = time.time()
        variables = _materialize_by_shape(shapes, seed)
        if os.environ.get("XMASK3D_TIME_INIT") == "1":
            print(f"  [init] materialize: {time.time()-_t:.1f}s", flush=True)
    else:
        # jit the init: eager init dispatches thousands of tiny host ops.
        init_fn = jax.jit(partial(model.init, train=True))
        variables = init_fn(rngs, batch, statics0)
    variables = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    import os as _os
    import time as _time

    _t = _time.time()
    statics = build_statics(model, variables, cfg)
    if _os.environ.get("XMASK3D_TIME_INIT") == "1":
        print(f"  [init] build_statics: {_time.time()-_t:.1f}s", flush=True)
    return model, variables, statics
