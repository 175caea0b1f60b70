"""Spatial self-attention ops, including a memory-efficient blockwise path.

The reference's ``Self_Attn`` (gated_conv_inpainting_net.py:284-317) builds a
dense (H·W)x(H·W) attention matrix — at Sintel-native 436x1024/4 resolution
that is ~(27k)^2 and cannot materialize, which is why the reference only runs
inpainting at 64x128–96x128 crops (SURVEY.md §5). ``blockwise_attention``
computes the same softmax attention exactly but streams over key/value blocks
with a running max/sum (flash-attention recurrence) via ``lax.scan``, so full
resolution becomes feasible: memory is O(N·block) instead of O(N^2). XLA maps
the inner matmuls onto the MXU; a Pallas fusion is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q kᵀ) v over tokens. q,k: [B, N, D]; v: [B, N, C]."""
    attn = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k), axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn, v)


def _blockwise_fwd_impl(q, k, v, block_size):
    """Flash forward; returns (out, logsumexp [B,N,1])."""
    b, n, d = q.shape
    c = v.shape[-1]
    nb = n // block_size
    kb = k.reshape(b, nb, block_size, d)
    vb = v.reshape(b, nb, block_size, c)
    qf = q.astype(jnp.float32)

    def body(carry, kv):
        m, l, acc = carry  # running max [B,N,1], sum [B,N,1], accum [B,N,C]
        kblk, vblk = kv
        s = jnp.einsum(
            "bnd,bkd->bnk", qf, kblk.astype(jnp.float32)
        )  # [B, N, block]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale + jnp.einsum(
            "bnk,bkc->bnc", p, vblk.astype(jnp.float32)
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, n, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, n, 1), jnp.float32),
        jnp.zeros((b, n, c), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        body, init, (jnp.swapaxes(kb, 0, 1), jnp.swapaxes(vb, 0, 1))
    )
    return (acc / l).astype(v.dtype), m + jnp.log(l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blockwise_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, block_size: int = 1024
) -> jax.Array:
    """Exact streaming softmax attention (flash recurrence over KV blocks).

    Args:
        q, k: [B, N, D]; v: [B, N, C]. N must be divisible by block_size
        (pad externally if needed).

    Returns:
        [B, N, C], numerically equal to ``dense_attention`` (fp32 accumulators).

    Custom VJP: letting autodiff differentiate the forward scan saves the
    per-block scores as residuals — f32[nb, B, N, block] = 12.25 GB at the
    448x1024 inpainting resolution, a measured HBM OOM that made full-res
    GAN *training* impossible (inference was fine). The backward here is
    the FlashAttention adjoint: save only (q, k, v, out, logsumexp) and
    recompute each block's probabilities on the fly, so training memory is
    O(N·block) like the forward.
    """
    out, _ = _blockwise_fwd_impl(q, k, v, block_size)
    return out


def _blockwise_fwd(q, k, v, block_size):
    out, lse = _blockwise_fwd_impl(q, k, v, block_size)
    return out, (q, k, v, out, lse)


def _blockwise_bwd(block_size, res, g):
    q, k, v, out, lse = res
    b, n, d = q.shape
    c = v.shape[-1]
    nb = n // block_size
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    # D_i = sum_c dout_ic * out_ic  (softmax-jacobian row term)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    kb = jnp.swapaxes(k.reshape(b, nb, block_size, d), 0, 1)
    vb = jnp.swapaxes(v.reshape(b, nb, block_size, c), 0, 1)

    def body(dq_acc, kv):
        kblk, vblk = kv
        s = jnp.einsum("bnd,bkd->bnk", qf, kblk.astype(jnp.float32))
        p = jnp.exp(s - lse)  # normalized probabilities of this block
        dv_blk = jnp.einsum("bnk,bnc->bkc", p, gf)
        dp = jnp.einsum("bnc,bkc->bnk", gf, vblk.astype(jnp.float32))
        ds = p * (dp - delta)
        dq_acc = dq_acc + jnp.einsum(
            "bnk,bkd->bnd", ds, kblk.astype(jnp.float32))
        dk_blk = jnp.einsum("bnk,bnd->bkd", ds, qf)
        return dq_acc, (dk_blk, dv_blk)

    dq, (dks, dvs) = jax.lax.scan(
        body, jnp.zeros((b, n, d), jnp.float32), (kb, vb)
    )
    dk = jnp.swapaxes(dks, 0, 1).reshape(b, n, d)
    dv = jnp.swapaxes(dvs, 0, 1).reshape(b, n, c)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


blockwise_attention.defvjp(_blockwise_fwd, _blockwise_bwd)


def spatial_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_threshold: int = 4096,
    block_size: int = 1024,
) -> jax.Array:
    """Dispatch dense vs blockwise by token count. q,k: [B,N,D]; v: [B,N,C]."""
    n = q.shape[1]
    if n > block_threshold and n % block_size == 0:
        return blockwise_attention(q, k, v, block_size)
    return dense_attention(q, k, v)
