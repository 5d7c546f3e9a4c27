"""Learning-rate schedules (reference: util/util.py:106-121, applied per-iter
at run/train.py:574-586). Pure functions of the global step -> usable both
inside optax schedules and standalone.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr(base_lr: float, curr_iter, max_iter: int, power: float = 0.9):
    return base_lr * (1 - jnp.asarray(curr_iter) / max_iter) ** power


def cosine_lr(base_lr: float, curr_iter, max_iter: int):
    return base_lr * 0.5 * (1 + jnp.cos(jnp.pi * jnp.asarray(curr_iter) / max_iter))
