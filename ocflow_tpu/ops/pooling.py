"""2x2 max pooling with argmax indices + the matching max-unpool.

The reference's ENet blocks rely on ``nn.MaxPool2d(return_indices=True)`` /
``nn.MaxUnpool2d`` (efficient_flow_net.py:68-69, 66). JAX has no unpool op;
here the 2x2/stride-2 case is derived with a reshape trick — pool windows
become explicit (2, 2) axes, argmax is taken over them, and unpooling is a
one-hot multiply + reshape. Fully dense, no gathers/scatters: it vectorizes
onto the VPU and jits under pjit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to_even(x: jax.Array) -> jax.Array:
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        # ceil_mode max pooling: pad with -inf so padding never wins
        x = jnp.pad(
            x,
            ((0, 0), (0, ph), (0, pw), (0, 0)),
            constant_values=-jnp.inf,
        )
    return x


def max_pool_2x2_with_argmax(x: jax.Array):
    """Args: x [B, H, W, C]. Returns (pooled [B,ceil(H/2),ceil(W/2),C],
    argmax [B,ceil(H/2),ceil(W/2),C] int32 in {0..3} = 2*dy + dx)."""
    x = _pad_to_even(x)
    b, h, w, c = x.shape
    win = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(win, axis=3).astype(jnp.int32)
    pooled = jnp.max(win, axis=3)
    return pooled, idx


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """Plain 2x2/stride-2 ceil-mode max pool."""
    return max_pool_2x2_with_argmax(x)[0]


def max_unpool_2x2(x: jax.Array, idx: jax.Array, out_size=None) -> jax.Array:
    """Scatter pooled values back to their argmax positions.

    Args:
        x: [B, h, w, C] values; idx: [B, h, w, C] from the paired pool.
        out_size: optional (H, W) to crop the 2h x 2w canvas (odd inputs).
    """
    b, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=3)  # [B,h,w,4,C]
    win = x[:, :, :, None, :] * onehot
    win = win.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    out = win.reshape(b, h * 2, w * 2, c)
    if out_size is not None:
        out = out[:, : out_size[0], : out_size[1]]
    return out
