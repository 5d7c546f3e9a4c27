"""FLOPs / MFU roofline table for the eval hot path (VERDICT r4 item 3).

Counts XLA's own post-optimization FLOPs (compiled.cost_analysis()) for the
full infer step and its big components at bench shapes, so the measured
in-net times (BASELINE.md, profile_e2e/profile_sd chained-scan numbers) can
be turned into achieved TF/s and compared against the chip peak. Run the
FLOPs count on CPU (deterministic, no chip needed):

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_backend_optimization_level=0 \
  python scripts/mfu_table.py [--only infer,vae_enc,...]

Matmul/conv FLOPs are backend-independent; opt level 0 skips the slow
XLA:CPU fusion passes without changing the dot/conv count. The one
backend-dependent piece — Pallas sparse-conv kernels — is handled by
forcing XMASK3D_*_IMPL=xla so the gather+matmul formulation (same
arithmetic) is what gets counted.

Peak used downstream: 189.6 bf16 TF/s measured on the dev v5e-lite chip
(4096^3 matmul probe, BASELINE.md round 4).
"""

from __future__ import annotations

import argparse
import os
import sys

# count the XLA formulation of the sparse convs (identical arithmetic to
# the Pallas band kernel, but countable by cost_analysis)
os.environ.setdefault("XMASK3D_SPCONV_IMPL", "xla")
os.environ.setdefault("XMASK3D_DEFORM_IMPL", "xla")
os.environ.setdefault("XMASK3D_FLASH_IMPL", "xla")

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def flops_of(name, fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
        print(f"{name:44s} {fl/1e9:10.2f} GFLOP  {by/1e9:8.2f} GB touched",
              flush=True)
        return fl
    except Exception as e:  # keep going; partial tables are still useful
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        return float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="",
                   help="comma list: infer,trunk,run3d,vae_enc,unet,vae_dec,"
                        "pixel,maskclip")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    print("backend:", jax.default_backend(), flush=True)

    from xmask3d_tpu.config import load_config
    from xmask3d_tpu.data.batching import Capacities
    from xmask3d_tpu.data.synthetic import synthetic_batch
    from xmask3d_tpu.engine.builder import init_model
    from xmask3d_tpu.engine.infer import ensemble_and_route
    from xmask3d_tpu.engine.infer_cli import cast_params_bf16

    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    batch = synthetic_batch(1, caps, seed=0, num_points=20000,
                            image_size=(512, 512),
                            mask_shape=tuple(cfg.mask_shape))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model, variables, statics = init_model(cfg, batch)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)
    variables = cast_params_bf16(variables)
    mc = model.cfg
    rngs = {"points": jax.random.PRNGKey(0)}

    if want("infer"):
        def infer_fn(v, b):
            _, outputs = model.apply(v, b, statics, train=False, rngs=rngs)
            routed = ensemble_and_route(
                outputs, mc.base_category, mc.novel_category,
                mc.num_test_classes, cfg.base_ratio, cfg.novel_ratio,
            )
            return (jnp.sum(routed["pred"].astype(jnp.float32))
                    + jnp.sum(outputs["fused_pred_feature"].astype(jnp.float32))
                    + jnp.sum(outputs["mask_embed_clip"].astype(jnp.float32)))

        flops_of("infer step FULL (eval fwd + route)", infer_fn,
                 variables, batch)

    if want("trunk"):
        def trunk_fn(v, b):
            out = model.apply(
                v, b, statics, False,
                method=lambda m, bb, ss, t: m._trunk(bb, ss, t), rngs=rngs)
            return (jnp.sum(out["pred_masks"].astype(jnp.float32))
                    + jnp.sum(out["pred_3d"].astype(jnp.float32))
                    + jnp.sum(out["binary_scores"].astype(jnp.float32)))

        flops_of("trunk FULL", trunk_fn, variables, batch)

    if want("run3d"):
        def run3d_fn(v, b):
            out = model.apply(
                v, b, statics, False,
                method=lambda m, bb, ss, t: m.run_3d(bb, train=t), rngs=rngs)
            return sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree_util.tree_leaves(out)
                       if hasattr(x, "dtype"))

        flops_of("3D branch (run_3d)", run3d_fn, variables, batch)

    # SD pieces at bench shapes (same constructions as profile_sd.py)
    def leaves_sum(tree):
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "dtype"))

    if want("vae_enc") or want("unet") or want("vae_dec"):
        from xmask3d_tpu.models.vae import AutoencoderKL, VAEConfig

        key = jax.random.PRNGKey(0)
        dt = jnp.bfloat16
        img = jax.random.normal(key, (1, 512, 512, 3), dt) * 0.1 + 0.5
        vae = AutoencoderKL(VAEConfig(), dtype=dt)
        vv = jax.jit(vae.init)(key, img)

        if want("vae_enc"):
            flops_of("VAE encode (latent+taps)",
                     lambda v, x: leaves_sum(
                         vae.apply(v, x, method=vae.encode)), vv, img)

        lat = jax.jit(lambda v, x: vae.apply(v, x, method=vae.encode))(
            vv, img)[0]
        if want("vae_dec"):
            def dec_taps(v, x):
                _, taps = vae.apply(v, x, method=vae.decode)
                return leaves_sum(taps)  # rgb unused -> tail DCE'd (in-net)

            flops_of("VAE decode (taps only, in-net)", dec_taps, vv, lat)

        if want("unet"):
            from xmask3d_tpu.models.sd_unet import SDUNet, UNetConfig

            unet = SDUNet(UNetConfig(), dtype=dt)
            cond = jax.random.normal(key, (1, 77, 768), dt)
            t_emb = jnp.zeros((1,), jnp.int32)
            uv = jax.jit(unet.init)(key, lat, t_emb, cond)

            def unet_taps(v, x):
                _, taps = unet.apply(v, x, t_emb, cond)
                return leaves_sum(taps)  # eps unused -> head DCE'd

            flops_of("SD UNet (taps only, in-net)", unet_taps, uv, lat)

    if want("pixel"):
        from xmask3d_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

        key = jax.random.PRNGKey(0)
        dt = jnp.bfloat16
        feats = {
            "s2": jax.random.normal(key, (1, 128, 128, 512), dt),
            "s3": jax.random.normal(key, (1, 64, 64, 512), dt),
            "s4": jax.random.normal(key, (1, 32, 32, 512), dt),
            "s5": jax.random.normal(key, (1, 16, 16, 512), dt),
        }
        pdec = MSDeformAttnPixelDecoder(dtype=dt)
        pv = jax.jit(pdec.init)(key, feats)
        flops_of("pixel decoder (6 layers + FPN)",
                 lambda v, f: sum(jnp.sum(t).astype(jnp.float32)
                                  for t in jax.tree_util.tree_leaves(
                                      pdec.apply(v, f))), pv, feats)


if __name__ == "__main__":
    main()
