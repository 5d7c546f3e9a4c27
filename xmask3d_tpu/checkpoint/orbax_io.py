"""Checkpoint save/load via orbax.

Capability parity with the reference checkpointing
(models/checkpoint/odise_checkpointer.py:67-182 + util/util.py:17-21):
saves {step/epoch, trainable params, batch_stats, optimizer state,
best_iou}; frozen submodules (CLIP, SD VAE/UNet/text encoder) are excluded
from checkpoints — the TPU equivalent of the reference's
ignored_state_dict protocol (helper.py:29-49, clip.py:92-106) — and restored
from their own converted source checkpoints instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from xmask3d_tpu.engine.train_step import param_label

_FROZEN = "frozen"


def _partition(params):
    """Split params into (trainable, frozen) by the optimizer labeling."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    trainable, frozen = {}, {}
    for path, value in flat:
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", None))) for p in path)
        name = "/".join(keys)
        label = param_label(keys)
        (frozen if label == _FROZEN else trainable)[name] = value
    return trainable, frozen


def _unflatten(flat: Dict[str, Any]):
    out: Dict[str, Any] = {}
    for name, value in flat.items():
        node = out
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


class Checkpointer:
    """Orbax-backed checkpoint manager (save_freq cadence handled by the
    caller, like reference train.py:354-390)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state, best_iou: float = 0.0, extra: Optional[dict] = None):
        trainable, _ = _partition(state.params)
        payload = {
            "trainable": trainable,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "meta": {"step": int(step), "best_iou": float(best_iou), **(extra or {})},
        }
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore trainable params / stats / opt state into `state`.

        Frozen params keep their current (converted) values — the reference's
        ignored-keys filtering (odise_checkpointer.py:77-130).
        """
        step = step if step is not None else self.manager.latest_step()
        trainable, frozen = _partition(state.params)
        template = {
            "trainable": trainable,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "meta": {"step": 0, "best_iou": 0.0},
        }
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(template))
        merged_flat = dict(restored["trainable"])
        merged_flat.update(frozen)
        params = _unflatten(merged_flat)
        new_state = state.replace(
            params=params,
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return new_state, restored["meta"]
