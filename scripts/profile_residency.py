"""Determine whether distinct pre-staged view batches incur per-dispatch
upload costs (relay residency semantics)."""

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


def main():
    cfg = load_config("configs/scannet/xmask3d_scannet_B15N4.yaml")
    caps = Capacities(max_points=32768, max_voxels=24576, max_targets=24)
    batch0 = jax.tree_util.tree_map(
        jnp.asarray,
        synthetic_batch(1, caps, seed=0, num_points=20000, image_size=(512, 512)),
    )
    model, variables, statics = init_model(cfg, batch0)
    mc = model.cfg

    @jax.jit
    def infer_step(v, b, s):
        _, outputs = model.apply(
            v, b, s, train=False, rngs={"points": jax.random.PRNGKey(0)}
        )
        return ensemble_and_route(
            outputs, mc.base_category, mc.novel_category, mc.num_test_classes,
            cfg.base_ratio, cfg.novel_ratio,
        )["pred"]

    _ = np.asarray(infer_step(variables, batch0, statics)).sum()

    print("staging 5 views...", flush=True)
    t0 = time.time()
    views = []
    for v in range(5):
        b = synthetic_batch(1, caps, seed=100 + v, num_points=20000,
                            image_size=(512, 512))
        b = jax.tree_util.tree_map(jnp.asarray, b)
        jax.block_until_ready(b["img"])
        views.append(b)
    print(f"staged in {time.time()-t0:.1f}s", flush=True)

    for rep in range(3):
        t0 = time.time()
        for b in views:
            p = infer_step(variables, b, statics)
            _ = np.asarray(p).sum()
        print(f"pass {rep}: {(time.time()-t0)/5*1e3:.0f} ms/view", flush=True)


if __name__ == "__main__":
    main()
