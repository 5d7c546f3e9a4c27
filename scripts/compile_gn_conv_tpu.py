"""Compile + validate the fused GN->SiLU->conv3x3 kernel on the real TPU.

Round-4 finding: interpret-mode validation is NOT sufficient — the first
on-chip attempt died in Mosaic ("Rotate with non-32-bit data": pltpu.roll
on bf16 lowers to tpu.dynamic_rotate which has no bf16 path on v5e). The
kernel now uses static slice+concat; this script is the gate that must
pass before XMASK3D_FUSED_GN=1 is measured in bench.py (sequence step 1b).

Runs, per representative VAE/UNet resblock shape:
  1. jit lower+compile of the fused kernel (exercises the remote Mosaic
     AOT compiler — the exact thing that failed),
  2. one execution, compared against gn_silu_conv_reference on-chip.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/compile_gn_conv_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ["XMASK3D_FUSED_GN"] = "1"

import jax
import jax.numpy as jnp

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from xmask3d_tpu.ops.gn_conv import (
        fused_available,
        gn_silu_conv,
        gn_silu_conv_reference,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    # (B, H, W, C, Cout): VAE decoder level-0/1 + encoder blocks at 512^2
    shapes = [
        (1, 512, 512, 128, 128),   # VAE enc block 0 / dec level 0
        (1, 256, 256, 256, 256),   # enc block 1 / dec level 1
        (1, 256, 256, 256, 128),   # dec level-1 -> level-0 channel drop
        (1, 128, 128, 512, 512),   # enc block 2
    ]
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ok = True
    for bsz, h, w, c, cout in shapes:
        if not fused_available((bsz, h, w, c), cout, dtype):
            print(f"  ({h},{w},{c})->{cout}: fused path NOT available, skip")
            continue
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (bsz, h, w, c), dtype)
        scale = jax.random.normal(ks[1], (c,), jnp.float32) * 0.1 + 1.0
        bias = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
        wk = jax.random.normal(ks[3], (3, 3, c, cout), jnp.float32) * 0.05
        b = jax.random.normal(ks[4], (cout,), jnp.float32) * 0.1

        fn = jax.jit(gn_silu_conv)
        lowered = fn.lower(x, scale, bias, wk, b)
        compiled = lowered.compile()  # <- the remote Mosaic AOT compile
        print(f"  ({h},{w},{c})->{cout}: compile OK", flush=True)

        # ALSO compile a scan-wrapped variant: the first on-chip failure
        # mode (scoped-vmem OOM, 19.18M > 16M) only reproduced inside the
        # bench program's while-loop context, not standalone
        def scanned(xx, sc, bi, wk_, b_):
            def body(carry, _):
                out = gn_silu_conv(carry, sc, bi, wk_, b_)
                return out.astype(carry.dtype) if out.shape == carry.shape \
                    else carry, jnp.sum(out.astype(jnp.float32))
            return jax.lax.scan(body, xx, None, length=2)[1]

        jax.jit(scanned).lower(x, scale, bias, wk, b).compile()
        print(f"  ({h},{w},{c})->{cout}: scanned compile OK", flush=True)

        out = compiled(x, scale, bias, wk, b)
        ref = jax.jit(gn_silu_conv_reference)(x, scale, bias, wk, b)
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        rel = err / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-8)
        good = bool(rel < 0.02)
        ok &= good
        print(
            f"  ({h},{w},{c})->{cout}: exec max_abs_err={float(err):.4f} "
            f"rel={float(rel):.5f} {'OK' if good else 'MISMATCH'}",
            flush=True,
        )
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
