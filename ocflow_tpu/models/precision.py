"""Mixed-precision policy: bf16 compute, fp32 master params.

The flagship PWC family threads a ``dtype`` attribute (models/pwc_net.py).
For the rest of the zoo this module provides the uniform TPU-native policy
instead of per-module plumbing: cast the float leaves of the variables and
inputs to bf16 at apply time (a free cast XLA fuses into the first use),
run the whole network on the MXU in bf16, and cast float outputs — and any
mutated BatchNorm statistics — back to fp32. Master params, optimizer state,
and losses stay fp32; only the network body runs half-precision. This is the
same recipe as the reference-world torch.autocast, expressed functionally.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating-point leaves to ``dtype``; leave ints/bools untouched."""

    def leaf(x):
        if isinstance(x, (jax.Array, jnp.ndarray)) or hasattr(x, "dtype"):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(leaf, tree)


def resolve_dtype(name: Any):
    """'bfloat16'/'float32'/None/np.dtype → jnp dtype or None."""
    if name is None or name == "float32":
        return None
    if isinstance(name, str):
        return jnp.dtype(name)
    return name


def apply_mixed(
    apply_fn: Callable,
    variables: dict,
    *args,
    dtype=jnp.bfloat16,
    mutable=False,
    **kwargs,
):
    """``apply_fn`` under the bf16 policy.

    Casts variables + positional array args to ``dtype``, runs the network,
    and returns float outputs in fp32. With ``mutable`` (e.g.
    ``['batch_stats']``), the mutated collections are cast back to fp32 so
    running statistics accumulate at full precision across steps.

    ``dtype=None`` is a transparent pass-through (fp32 parity path).
    """
    if dtype is None:
        return apply_fn(variables, *args, mutable=mutable, **kwargs) if mutable \
            else apply_fn(variables, *args, **kwargs)

    cast_vars = cast_floating(variables, dtype)
    cast_args = tuple(cast_floating(a, dtype) for a in args)
    if mutable:
        out, updates = apply_fn(cast_vars, *cast_args, mutable=mutable, **kwargs)
        return cast_floating(out, jnp.float32), cast_floating(updates, jnp.float32)
    out = apply_fn(cast_vars, *cast_args, **kwargs)
    return cast_floating(out, jnp.float32)
