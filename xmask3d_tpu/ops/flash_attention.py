"""Pallas flash attention (forward) for TPU.

Replaces the reference's optional xformers acceleration of the SD UNet
attention (installation.md:22-27) with a TPU-native blockwise-softmax
kernel: online max/sum accumulation over KV blocks, no (Tq, Tk) score
materialization in HBM. Used on the eval path of the SD UNet/VAE attention
(models/sd_unet.py, models/vae.py) where sequence length reaches 4096 at
512x512 inputs; training falls back to the XLA formulation (whose backward
is handled by autodiff).

Interface: flash_attention(q, k, v) with q (B, H, Tq, D), k/v (B, H, Tk, D),
optional additive bias broadcastable to (B, H, Tq, Tk) is NOT supported in
the kernel (the UNet attention has none); use plain attention when masks
are needed (CLIP/MaskCLIP paths).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                      scale: float, dg_scores: bool = True):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        if dg_scores:
            # contract the head dim of BOTH operands directly — avoids
            # materializing k.T per KV block (Mosaic lowers the transpose
            # as a real relayout at small d)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, bk)
        else:
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    n_blocks = kv_len // block_k
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,  # (B, H, Tk, D)
    # 512/512 measured ~2x faster than 256/256 on v5e for the SD level-0
    # 4096-token self-attn (0.54 vs 1.17 ms/iter, scripts/profile_sd.py);
    # neutral at 1024 tokens. Blocks clamp to the sequence length below.
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dg_scores: bool = True,
) -> jnp.ndarray:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if d > 256:
        # wide single-head attention (VAE mid block, d=512): the kernel holds
        # the full (tk, d) K/V in VMEM (~8.4 MB at tk=4096 bf16), so shrink
        # the query block to keep scratch under the ~16 MB VMEM budget
        block_q = min(block_q, 256)
    elif d <= 64 and block_q == 512 and block_k == 512:
        # narrow heads (SD UNet d=40): (1024,1024) measured 0.54 vs
        # 0.61 ms for (512,512) on the 4096-token self-attn (v5e, round 4,
        # scripts/profile_attn_variants.py); (2048,2048) OOMs scoped VMEM
        block_q = block_k = 1024
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    if tq % block_q or tk % block_k:
        # shapes in this pipeline are powers of two; fall back otherwise
        return reference_attention(q, k, v)
    scale = 1.0 / math.sqrt(d)

    bh = b * h
    qr = q.reshape(bh, tq, d)
    kr = k.reshape(bh, tk, d)
    vr = v.reshape(bh, tk, d)

    grid = (bh, tq // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, kv_len=tk, block_k=block_k, scale=scale,
            dg_scores=dg_scores,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, tq, d)


def reference_attention(q, k, v):
    """Plain XLA attention (the oracle for the kernel test, and the
    fallback for unsupported shapes / training backward)."""
    d = q.shape[-1]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32) / math.sqrt(d),
        k.astype(jnp.float32),
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def _flash_diff(q, k, v):
    return flash_attention(q, k, v)


def _flash_diff_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _flash_diff_bwd(res, g):
    # recompute backward through the XLA formulation (materializes scores —
    # acceptable: grads only flow through the UNet for the conditioning path)
    q, k, v = res
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q, k, v):
    """Dispatch: Pallas flash kernel on TPU backends for supported shapes,
    XLA reference otherwise. Differentiable everywhere.

    XMASK3D_FLASH_IMPL=xla forces the XLA reference (A/B + fault isolation)."""
    import os

    backend = jax.default_backend()
    tq, tk = q.shape[2], k.shape[2]
    d = q.shape[-1]
    # the kernel stages the full (tk, d) K and V blocks in VMEM; gate on
    # their actual byte size, not d alone — at fp32 (compute_dtype unset)
    # tk=4096 d=512 K+V is ~16.8 MB and the kernel can fail VMEM allocation
    # at compile time (ADVICE r3). 10 MB leaves room for q/o blocks+scratch;
    # the bf16 serving shapes (8.4 MB at tk=4096 d=512) stay on the kernel.
    kv_bytes = 2 * tk * d * jnp.dtype(k.dtype).itemsize
    supported = (
        os.environ.get("XMASK3D_FLASH_IMPL", "pallas") != "xla"
        and backend == "tpu"
        and tq % 128 == 0
        and tk % 128 == 0
        and d <= 512
        and kv_bytes <= 10 * 1024 * 1024
    )
    if supported:
        return _flash_diff(q, k, v)
    return reference_attention(q, k, v)
