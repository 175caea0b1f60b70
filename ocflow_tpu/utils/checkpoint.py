"""Orbax checkpointing with named param subtrees.

Replaces Lightning's ModelCheckpoint (reference test.py:67-70) and the
staged-training checkpoint surgery: TwoStage models splice a pretrained flow
net / inpainter out of stage-1 checkpoints (reference model.py:948-954,
1133-1135) — ``load_subtree`` does exactly that by path.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Best-k checkpointing on a monitored metric (min mode), like the
    reference's ModelCheckpoint(monitor='monitored_loss', save_top_k=1)."""

    def __init__(self, directory: str, max_to_keep: int = 1, mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m["monitored_loss"],
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, monitored_loss: float):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_to_pure(state)),
            metrics={"monitored_loss": float(monitored_loss)},
        )
        self._mgr.wait_until_finished()

    def restore(self, step: int | None = None, template: Any = None):
        if step is None:
            step = self._mgr.best_step()
            if step is None:
                step = self._mgr.latest_step()
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_to_pure(template))
            )
        return self._mgr.restore(step)

    @property
    def best_step(self):
        return self._mgr.best_step()

    @property
    def latest_step(self):
        return self._mgr.latest_step()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot save of a pytree (the reference's bare save_state_dict,
    flow_model.py:170-171)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_pure(tree))
    ckptr.wait_until_finished()


def load_pytree(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), _to_pure(template))
    return ckptr.restore(os.path.abspath(path))


def load_subtree(path: str, keys: str | list[str], template: Any = None) -> Any:
    """Load a checkpoint and extract a nested subtree by '/'-separated path —
    the TPU-native version of ``ckpt.flow_pred`` attribute surgery.

    The checkpoint may be LARGER than the template (e.g. a full TrainState
    export or a combined stage checkpoint spliced for only its ``params``):
    when the templated restore rejects the structure mismatch, fall back to
    a raw restore and slice the subtree from it."""
    if isinstance(keys, str):
        keys = keys.split("/")
    try:
        tree = load_pytree(path, template)
    except (ValueError, KeyError):
        tree = load_pytree(path)
    for k in keys:
        tree = tree[k]
    return tree


def _to_pure(tree: Any) -> Any:
    """Strip non-array leaves (apply_fn, tx) from TrainState-like pytrees."""
    from ocflow_tpu.train.state import TrainState

    if isinstance(tree, TrainState):
        return {
            "step": tree.step,
            "params": tree.params,
            "batch_stats": tree.batch_stats,
            "opt_state": tree.opt_state,
        }
    return tree
