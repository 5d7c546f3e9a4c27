"""Training step: loss weighting, two-group AdamW, frozen-tree masking.

Capability parity with the reference training loop core
(run/train.py:152-169 two-group AdamW; :292-307 contra warmup gating;
:537-541 step; :574-586 per-iter cosine/poly LR). One jit-compiled
train_step(state, batch, statics, contra_on) -> (state, metrics) with donated
state; gradient all-reduce comes from pjit shardings (replacing DDP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xmask3d_tpu.utils.lr_schedule import cosine_lr, poly_lr


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


# parameter-group labeling (reference train.py:157-166)
def param_label(path_keys) -> str:
    name = "/".join(str(k) for k in path_keys)
    if "pc_decoder" in name or "pc_binary_head" in name:
        return "3d"
    frozen_markers = (
        "ldm_extractor/vae",
        "ldm_extractor/unet",
        "ldm_extractor/text_encoder",
        "ldm_extractor/shared_noise",
        "clip/",
    )
    if any(m in name for m in frozen_markers) or name.startswith("clip"):
        return "frozen"
    return "others"


def label_tree(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    labels = []
    for path, _ in flat:
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        labels.append(param_label(keys))
    return jax.tree_util.tree_unflatten(treedef, labels)


def make_optimizer(
    lr_3d: float,
    lr_others: float,
    total_steps: int,
    schedule: str = "cosine",
    power: float = 0.9,
    weight_decay: float = 0.01,
):
    """Two-group AdamW (torch defaults: b1 .9, b2 .999, eps 1e-8, wd 0.01)
    with per-iteration cosine/poly LR (reference train.py:574-586)."""

    def sched(base):
        if schedule == "cosine":
            return lambda step: cosine_lr(base, step, total_steps)
        return lambda step: poly_lr(base, step, total_steps, power)

    def adamw(base_lr):
        return optax.adamw(
            learning_rate=sched(base_lr), b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        )

    return optax.multi_transform(
        {
            "3d": adamw(lr_3d),
            "others": adamw(lr_others),
            "frozen": optax.set_to_zero(),
        },
        label_tree,
    )


def weight_losses(
    losses: Dict[str, jnp.ndarray],
    loss_weight: Dict[str, float],
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    contra_on: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Apply the weight dict incl. aux copies; contra_on gates
    loss_3d_contra (reference train.py:292-307 epoch gating)."""
    total = 0.0
    for k, v in losses.items():
        if k.startswith("loss_ce"):
            w = class_weight
        elif k.startswith("loss_mask"):
            w = mask_weight
        elif k.startswith("loss_dice"):
            w = dice_weight
        elif k in loss_weight:
            w = loss_weight[k]
        else:
            continue
        v = v * w
        if k == "loss_3d_contra" and contra_on is not None:
            v = v * contra_on
        total = total + v
    return total


def make_train_step(model, optimizer, loss_weight: Dict[str, float], cfg=None):
    """Build the jit-able train step closure.

    Usage: jit with donate_argnums=(0,) and shardings from parallel/mesh.py.
    """

    def train_step(
        state: TrainState, batch, statics, contra_on: jnp.ndarray
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, points_rng = jax.random.split(state.rng)
        labels = label_tree(state.params)

        def loss_fn(params):
            # Frozen towers (SD VAE/UNet/text, CLIP) get zero updates
            # (optax.set_to_zero, mirroring the reference optimizer's
            # exclusion at train.py:160-162). stop_gradient on those LEAVES
            # makes that structural: XLA skips their weight-grad einsums and
            # the ~5 GB of frozen cotangent buffers, while gradients still
            # flow THROUGH the SD UNet activations to the trainable
            # conditioning path (clip_project / alpha_cond / time_embed).
            params = jax.tree_util.tree_map(
                lambda p, l: jax.lax.stop_gradient(p) if l == "frozen" else p,
                params, labels,
            )
            variables = {"params": params, "batch_stats": state.batch_stats}
            (losses, _), mutated = model.apply(
                variables, batch, statics, train=True,
                rngs={"points": points_rng},
                mutable=["batch_stats"],
            )
            total = weight_losses(losses, loss_weight, contra_on=contra_on)
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss_total": total, **losses}
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
                rng=rng,
            ),
            metrics,
        )

    return train_step


def create_train_state(model, variables, optimizer, seed: int = 0) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )
