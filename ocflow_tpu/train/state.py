"""Train state: params + optimizer + (optional) BatchNorm statistics."""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import optax
from flax import core
from flax import struct


class TrainState(struct.PyTreeNode):
    """Like flax's TrainState but carrying batch_stats for BN networks."""

    step: jax.Array
    params: core.FrozenDict[str, Any] | dict
    batch_stats: core.FrozenDict[str, Any] | dict
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **kwargs,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None, **kwargs):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
            **kwargs,
        )


def create_train_state(
    net, rng: jax.Array, sample_input, tx: optax.GradientTransformation, **apply_kwargs
) -> TrainState:
    """Initialize a network and wrap it in a TrainState."""
    variables = net.init(rng, sample_input, **apply_kwargs)
    return TrainState.create(
        apply_fn=net.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
