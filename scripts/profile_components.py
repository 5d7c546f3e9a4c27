"""Per-component timing on the current backend (TPU or CPU).

Times each hot block of the pipeline in isolation to locate throughput
bottlenecks: SD VAE encode / UNet / VAE decode, MinkUNets, pixel decoder,
mask decoder, MaskCLIP, and a raw dispatch round trip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


_SYNC_FLOOR = [0.0]


def bench_fn(name, fn, *args, n=20):
    """Times fn with a scalar-sum sink (one tiny D2H per iteration) and
    subtracts the measured dispatch+sync floor — on relay-backed dev
    backends the floor is tens of ms and would otherwise swamp every
    component number."""
    f = jax.jit(
        lambda *a: sum(
            jnp.sum(x).astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(fn(*a))
            if hasattr(x, "dtype")
        )
    )
    s = float(np.asarray(f(*args)))  # compile + warm
    t0 = time.time()
    for _ in range(n):
        s += float(np.asarray(f(*args)))
    dt = max(0.0, (time.time() - t0) / n - _SYNC_FLOOR[0])
    print(f"{name:32s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)

    # 0. dispatch round trip — becomes the sync floor subtracted from
    # every component number below
    f_id = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    _SYNC_FLOOR[0] = bench_fn("dispatch+D2H roundtrip (floor)", f_id, x, n=30)

    # 1. SD VAE encoder (512^2)
    from xmask3d_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    img = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    vv = jax.jit(vae.init)(key, img)
    enc = jax.jit(lambda v, x: vae.apply(v, x, method=vae.encode))
    lat, _ = enc(vv, img)
    bench_fn("VAE encode 512^2", enc, vv, img)
    dec = jax.jit(lambda v, z: vae.apply(v, z, method=vae.decode))
    bench_fn("VAE decode 64^2->512^2", dec, vv, lat)

    # 2. SD UNet (64^2 latent)
    from xmask3d_tpu.models.sd_unet import SDUNet, UNetConfig

    unet = SDUNet(UNetConfig(), dtype=jnp.bfloat16)
    zz = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    tt = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768), jnp.bfloat16)
    uv = jax.jit(unet.init)(key, zz, tt, ctx)
    ufn = jax.jit(lambda v, z, t, c: unet.apply(v, z, t, c))
    bench_fn("SD UNet 64^2", ufn, uv, zz, tt, ctx)

    # 3. MinkUNet34C on 24k voxels
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.models.minkunet import mink_unet

    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    b = synthetic_batch(1, caps, seed=0, num_points=20000, image_size=(64, 64))
    h = jax.tree_util.tree_map(jnp.asarray, b["hierarchy"])
    feats = jnp.asarray(b["voxel_feats"], jnp.bfloat16)
    mu = mink_unet(out_channels=256, arch="MinkUNet34C", dtype=jnp.bfloat16)
    muv = jax.jit(lambda k, f, hh: mu.init(k, f, hh, False))(key, feats, h)
    mfn = jax.jit(lambda v, f, hh: mu.apply(v, f, hh, False))
    bench_fn("MinkUNet34C 24k voxels", mfn, muv, feats, h)

    # 4. MaskCLIP ViT-L (50 masks)
    from xmask3d_tpu.models.clip import build_clip

    clip = build_clip("ViT-L-14", dtype=jnp.bfloat16)
    ci = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    toks = jnp.zeros((1, 77), jnp.int32)
    cv = jax.jit(clip.init)(key, toks, ci)
    masks = jnp.zeros((1, 50, 224, 224), jnp.bfloat16)
    cfn = jax.jit(
        lambda v, i, m: clip.apply(v, i, m, method=clip.encode_image_with_mask)
    )
    bench_fn("MaskCLIP ViT-L 50 masks", cfn, cv, ci, masks)

    # 5. pixel decoder + mask decoder at 512^2 scale
    from xmask3d_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from xmask3d_tpu.models.mask_decoder import ODISEMaskedTransformerDecoder

    feats512 = {
        "s2": jnp.zeros((1, 128, 128, 512), jnp.bfloat16),
        "s3": jnp.zeros((1, 64, 64, 512), jnp.bfloat16),
        "s4": jnp.zeros((1, 32, 32, 512), jnp.bfloat16),
        "s5": jnp.zeros((1, 16, 16, 512), jnp.bfloat16),
    }
    pd = MSDeformAttnPixelDecoder(dtype=jnp.bfloat16)
    pv = jax.jit(pd.init)(key, feats512)
    pfn = jax.jit(lambda v, f: pd.apply(v, f))
    mask_feats, ms = pfn(pv, feats512)
    bench_fn("pixel decoder 512^2", pfn, pv, feats512)

    md = ODISEMaskedTransformerDecoder(dtype=jnp.bfloat16)
    mv = jax.jit(md.init)(key, list(ms), mask_feats)
    mdfn = jax.jit(lambda v, a, b_: md.apply(v, list(a), b_))
    bench_fn("mask decoder", mdfn, mv, tuple(ms), mask_feats)

    # 6. mask->point gather, lane-gather vs transposed row-gather forms
    # (losses/fuser.py project_masks_to_points; XMASK3D_POINT_GATHER)
    import os

    from xmask3d_tpu.losses.fuser import project_masks_to_points

    pm = jax.random.normal(key, (1, 50, 240, 320), jnp.bfloat16)
    xl = jax.random.randint(key, (1, 32768), 0, 240)
    yl = jax.random.randint(key, (1, 32768), 0, 320)
    for form in ("lane", "row"):
        os.environ["XMASK3D_POINT_GATHER"] = form
        gfn = jax.jit(lambda m, a, b_: project_masks_to_points(m, a, b_))
        bench_fn(f"mask point gather ({form})", gfn, pm, xl, yl)
    os.environ.pop("XMASK3D_POINT_GATHER", None)

    # 7. fused GN->SiLU->conv vs unfused at the VAE's level-0 shape
    from xmask3d_tpu.ops.gn_conv import (
        _gn_silu_conv_fused,
        gn_silu_conv_reference,
    )

    xg = jax.random.normal(key, (1, 512, 512, 128), jnp.bfloat16)
    sc = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    wg = jax.random.normal(key, (3, 3, 128, 128), jnp.float32) * 0.05
    bg = jnp.zeros((128,), jnp.float32)
    bench_fn("GN+SiLU+conv3x3 unfused 512^2",
             jax.jit(lambda *a: gn_silu_conv_reference(*a)), xg, sc, bi, wg, bg)
    if jax.default_backend() == "tpu":
        bench_fn(
            "GN+SiLU+conv3x3 FUSED 512^2",
            jax.jit(lambda x, s, b2, w, b3: _gn_silu_conv_fused(
                x, s, b2, w, b3, 32, 1e-6, 16)),
            xg, sc, bi, wg, bg,
        )


if __name__ == "__main__":
    main()
