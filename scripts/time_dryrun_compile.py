"""Time the dryrun_multichip train-step compile, in pieces.

Run in a child env with CPU devices forced, e.g.:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/time_dryrun_compile.py

Prints lower/compile wall times so compile-cost regressions are
attributable; used to bisect the round-4 MULTICHIP rc=124 timeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

t0 = time.time()

from __graft_entry__ import _tiny_cfg_and_batch

print(f"[{time.time()-t0:7.1f}s] repo imports done", flush=True)
from xmask3d_tpu.engine.builder import init_model
from xmask3d_tpu.engine.train_step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from xmask3d_tpu.parallel.mesh import create_mesh, shard_batch, shard_params

n_devices = 8
model_axis = 2
mesh = create_mesh(data=n_devices // model_axis, model=model_axis)

cfg, caps, batch = _tiny_cfg_and_batch(batch=max(2, n_devices // model_axis))
cfg.arch_3d = "MinkUNet14A"
cfg.arch_binary_head = "MinkUNet14A"
cfg.dec_layers = 2
cfg.pixel_enc_layers = 2
model, variables, statics = init_model(
    cfg, batch, tiny=True,
    init_mode=os.environ.get("TIME_INIT_MODE", "shape"),
)
print(f"[{time.time()-t0:7.1f}s] init_model done", flush=True)

variables = {
    "params": shard_params(variables["params"], mesh),
    "batch_stats": variables["batch_stats"],
}
optimizer = make_optimizer(cfg.lr_3d, cfg.lr_others, total_steps=100)
state = create_train_state(model, variables, optimizer)
print(f"[{time.time()-t0:7.1f}s] state ready", flush=True)

if os.environ.get("TIME_FWD_ONLY") == "1":
    # forward-only loss bisect: how much of the compile is the backward?
    from xmask3d_tpu.engine.train_step import weight_losses

    def fwd(state, batch, statics, contra_on):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        (losses, _), _ = model.apply(
            variables, batch, statics, train=True,
            rngs={"points": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        return weight_losses(losses, dict(cfg.loss_weight), contra_on=contra_on), losses

    train_step = jax.jit(fwd)

    def loss_of(out):
        return float(out[0])
else:
    train_step = jax.jit(
        make_train_step(model, optimizer, dict(cfg.loss_weight)),
        donate_argnums=(0,),
    )

    def loss_of(out):
        return float(out[1]["loss_total"])
batch = shard_batch(batch, mesh)
statics = jax.tree_util.tree_map(jnp.asarray, statics)

with mesh:
    t1 = time.time()
    lowered = train_step.lower(state, batch, statics, jnp.asarray(1.0))
    t2 = time.time()
    print(f"[{t2-t0:7.1f}s] lower done: {t2-t1:.1f}s", flush=True)
    compiled = lowered.compile()
    t3 = time.time()
    print(f"[{t3-t0:7.1f}s] compile done: {t3-t2:.1f}s", flush=True)
    out = compiled(state, batch, statics, jnp.asarray(1.0))
    loss = loss_of(out)
    t4 = time.time()
    print(f"[{t4-t0:7.1f}s] run done: {t4-t3:.1f}s loss={loss:.4f}", flush=True)
