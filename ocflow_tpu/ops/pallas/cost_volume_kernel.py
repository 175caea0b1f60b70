"""Fused Pallas TPU cost-volume kernel.

The XLA path (ops/cost_volume.py) lowers to ~(2d+1)^2 separate
pad/slice/mul/reduce fusions; in situ (inside the PWC forward) the extra HBM
round trips and layout copies cost ~20+ ms of the 78 ms Sintel-res forward.
This kernel keeps the f1 tile, the haloed f2 tile and the output tile
resident in VMEM and computes all (2d+1)^2 channel-mean correlations in one
pass.

Mosaic-friendly design (found the hard way):
- inputs are pre-transposed so W is the LANE dim and C the sublane dim;
  the x-shift is then one lane-roll + aligned lane slice per shift
  (unaligned sublane slices / sublane rolls explode compile time);
- the y-shift slices an outer (untiled) dim — free;
- output layout is [B, K, H, W] (full-tile stores), transposed back outside;
- the grid chunks H so the VMEM working set stays under the ~16 MB scoped
  limit at Sintel-res PWC level 2.

Numerics match the reference exactly (mean over channels,
correlation_layer.py:37); channel order k = dy_idx*(2d+1)+dx_idx.

Custom VJP: backward runs on the XLA path as parallel pad+slice+add mirrors
(fused by XLA; see _bwd for why a Pallas backward is not viable under
current Mosaic layout rules). Falls back to the XLA forward automatically
off-TPU or when the working set cannot fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ocflow_tpu.ops.cost_volume import cost_volume as cost_volume_xla

# Scoped-VMEM budget for one grid step (bytes); v5e has 16 MB.
_VMEM_BUDGET = 11 * 1024 * 1024


def _kernel(f1_ref, f2p_ref, out_ref, *, num_shifts: int, chunk: int, width: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hh = pl.program_id(1)
    f1 = f1_ref[0].astype(jnp.float32)  # [chunk, C, W]
    inv_c = 1.0 / f1.shape[1]
    # The dx roll depends only on j, and the dy shift is a FREE static slice
    # on the (untiled) outer dim — so roll the whole (chunk + 2d)-row window
    # once per j instead of once per (i, j): 2d+1 rolls per tile, not
    # (2d+1)^2 (measured ~25% off the kernel at PWC level-1/2 shapes).
    win = f2p_ref[0, pl.ds(hh * chunk, chunk + num_shifts - 1), :, :].astype(
        jnp.float32
    )  # [chunk+2d, C, W+2d]
    for j in range(num_shifts):
        # rolled[..., x] = win[..., x + j]: roll left by j == roll right
        # by (size - j); pltpu.roll wants non-negative shifts
        rolled = (
            win if j == 0 else pltpu.roll(win, shift=win.shape[2] - j, axis=2)
        )
        rolled = rolled[:, :, :width]
        for i in range(num_shifts):
            corr = jnp.sum(f1 * rolled[i : i + chunk], axis=1) * inv_c
            out_ref[0, i * num_shifts + j, :, :] = corr.astype(out_ref.dtype)


def _pick_chunk(h: int, w: int, c: int, d: int, itemsize: int):
    """Largest H-chunk whose working set fits the VMEM budget."""
    n = 2 * d + 1
    for chunks in (1, 2, 4, 7, 8, 14, 16, 28):
        if h % chunks:
            continue
        th = h // chunks
        # Mosaic block constraint: the out block's sublane dim (th) must be a
        # multiple of 8 unless it equals the full array dim
        if th != h and th % 8:
            continue
        fixed = (h + 2 * d) * c * (w + 2 * d) * itemsize  # f2p block (full H)
        per = (
            th * c * w * itemsize  # f1 block
            + n * n * th * w * itemsize  # out block
            + th * c * w * 4  # f1 fp32 copy
            + (th + 2 * d) * c * (w + 2 * d) * 4 * 2  # win fp32 + rolled copy
            + th * c * w * 4  # product temporary
        )
        if fixed + per <= _VMEM_BUDGET:
            return th
    return None


def _forward_pallas(
    f1: jax.Array, f2: jax.Array, max_displacement: int,
    interpret: bool = False, transpose_out: bool = True,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1.shape
    d = max_displacement
    n = 2 * d + 1
    nk = n * n
    th = _pick_chunk(h, w, c, d, f1.dtype.itemsize)
    assert th is not None, "caller must check fits_vmem first"

    f1t = jnp.transpose(f1, (0, 1, 3, 2))  # [B, H, C, W]
    f2p = jnp.pad(
        jnp.transpose(f2, (0, 1, 3, 2)), ((0, 0), (d, d), (0, 0), (d, d))
    )  # [B, H+2d, C, W+2d]

    kernel = functools.partial(_kernel, num_shifts=n, chunk=th, width=w)
    out_khw = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, c, w), lambda i, hh: (i, hh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h + 2 * d, c, w + 2 * d),
                lambda i, hh: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nk, th, w), lambda i, hh: (i, 0, hh, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nk, h, w), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * nk,
            bytes_accessed=(2 * b * h * w * c + b * h * w * nk) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1t, f2p)
    if not transpose_out:
        return out_khw  # [B, K, H, W] (channel-major, lane dim W)
    return jnp.transpose(out_khw, (0, 2, 3, 1))  # → [B, H, W, K]


def fits_vmem(shape, max_displacement: int, itemsize: int = 2) -> bool:
    _, h, w, c = shape
    return _pick_chunk(h, w, c, max_displacement, itemsize) is not None


def cost_volume_fused_flat(
    f1: jax.Array, f2: jax.Array, max_displacement: int = 4
) -> jax.Array:
    """Inference-only fused cost volume emitting the FLAT channel-major
    layout ``[B, (2d+1)^2, H*W]`` the conv-group kernel consumes.

    The Pallas kernel already computes ``[B, K, H, W]`` internally
    (full-tile stores); this entry point skips the kernel-exit NHWC
    transpose AND the decoder-entry ``nhwc_to_flat`` of the K corr
    channels — pwc_fast assembles the decoder input by a cheap axis-1
    concat of flat blocks instead (no custom VJP: the gradient-carrying
    path keeps the NHWC ``cost_volume_fused``)."""
    b, h, w, c = f1.shape
    nk = (2 * max_displacement + 1) ** 2
    if jax.default_backend() == "tpu" and fits_vmem(
        f1.shape, max_displacement, f1.dtype.itemsize
    ):
        out_khw = _forward_pallas(
            f1, f2, max_displacement, transpose_out=False)
        return out_khw.reshape(b, nk, h * w)
    out = cost_volume_xla(f1, f2, max_displacement)  # NHWC fallback
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, nk, h * w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_fused(f1: jax.Array, f2: jax.Array, max_displacement: int = 4):
    """Fused cost volume (Pallas on TPU, XLA fallback elsewhere/too-large)."""
    return _forward_impl(f1, f2, max_displacement)


def _forward_impl(f1, f2, max_displacement):
    if jax.default_backend() == "tpu" and fits_vmem(
        f1.shape, max_displacement, f1.dtype.itemsize
    ):
        return _forward_pallas(f1, f2, max_displacement)
    return cost_volume_xla(f1, f2, max_displacement)


def _fwd(f1, f2, max_displacement):
    return _forward_impl(f1, f2, max_displacement), (f1, f2)


def _bwd(max_displacement, residuals, g):
    """Backward: the XLA mirror — parallel pad+static-slice+add shifts
    (fused well by XLA; a chained dynamic_update_slice formulation compiles
    pathologically slowly).

    A Pallas backward kernel was built (round 2, commit 2632404),
    interpreter-correct but never viable on real TPUs: the per-shift
    gradient slices sit on the sublane dim (dynamic sublane starts need
    provable 8-alignment -> Mosaic rejects) and the value-level workaround
    materializes the whole [chunk, 81, W+2d] gradient window per dy
    (347 MB VMEM at PWC level 3). It was deleted rather than shipped
    disabled; see git history if the layout redesign (nk on lanes with a
    128-pad) is ever attempted."""
    f1, f2 = residuals
    return _bwd_xla_mirror(max_displacement, f1, f2, g)


def _bwd_xla_mirror(max_displacement, f1, f2, g):
    b, h, w, c = f1.shape
    d = max_displacement
    n = 2 * d + 1
    inv_c = 1.0 / c

    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    df1 = jnp.zeros_like(f1, dtype=jnp.float32)
    df2 = jnp.zeros_like(f2, dtype=jnp.float32)
    for i in range(n):
        for j in range(n):
            k = i * n + j
            gk = g[..., k : k + 1].astype(jnp.float32)  # [B,H,W,1]
            shifted = f2p[:, i : i + h, j : j + w, :].astype(jnp.float32)
            # dL/df1[y,x,c] = (1/C) sum_k g_k[y,x] * f2p[y+i, x+j, c]
            df1 = df1 + gk * shifted
            # dL/df2[y2,x2,c] = (1/C) sum_k g_k[y2+d-i, x2+d-j] * f1[same]
            q = jnp.pad(
                gk * f1.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0))
            )
            df2 = df2 + q[:, 2 * d - i : 2 * d - i + h, 2 * d - j : 2 * d - j + w, :]
    return (df1 * inv_c).astype(f1.dtype), (df2 * inv_c).astype(f2.dtype)


cost_volume_fused.defvjp(_fwd, _bwd)
