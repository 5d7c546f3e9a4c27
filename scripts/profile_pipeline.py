"""Time the real pipeline at three granularities: trunk / eval_forward /
infer_step, plus H2D staging of one view batch."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xmask3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from xmask3d_tpu.config import load_config
from xmask3d_tpu.data.batching import Capacities
from xmask3d_tpu.data.synthetic import synthetic_batch
from xmask3d_tpu.engine.builder import init_model
from xmask3d_tpu.engine.infer import ensemble_and_route


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:24s} {(time.time() - t0) / n * 1e3:9.1f} ms", flush=True)


def main():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    print("building batch...", flush=True)
    host_batch = synthetic_batch(1, caps, seed=0, num_points=20000,
                                 image_size=(512, 512), mask_shape=(240, 320))
    t0 = time.time()
    batch = jax.tree_util.tree_map(jnp.asarray, host_batch)
    jax.block_until_ready(batch["img"])
    print(f"H2D staging of one view: {(time.time()-t0)*1e3:.0f} ms", flush=True)

    print("init...", flush=True)
    model, variables, statics = init_model(cfg, batch)
    statics = jax.tree_util.tree_map(jnp.asarray, statics)
    mc = model.cfg

    trunk = jax.jit(
        lambda v, b, s: model.apply(
            v, b, s, False, method=lambda m, bb, ss, t: m._trunk(bb, ss, t),
        )["pred_masks"]
    )
    timeit("trunk", trunk, variables, batch, statics)

    evalf = jax.jit(
        lambda v, b, s: model.apply(
            v, b, s, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )[1]["fused_pred_feature"]
    )
    timeit("eval_forward", evalf, variables, batch, statics)

    @jax.jit
    def infer_step(v, b, s):
        _, outputs = model.apply(
            v, b, s, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        return ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )["pred"]

    timeit("infer_step", infer_step, variables, batch, statics)


if __name__ == "__main__":
    main()
