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
(fused by XLA; a Pallas backward is a later optimization). Falls back to the
XLA forward automatically off-TPU or when the working set cannot fit.
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
    for i in range(num_shifts):
        rows = f2p_ref[0, pl.ds(hh * chunk + i, chunk), :, :].astype(
            jnp.float32
        )  # [chunk, C, W+2d]
        for j in range(num_shifts):
            # shifted[..., x] = rows[..., x + j]: roll left by j == roll right
            # by (size - j); pltpu.roll wants non-negative shifts
            shifted = (
                rows
                if j == 0
                else pltpu.roll(rows, shift=rows.shape[2] - j, axis=2)
            )
            shifted = shifted[:, :, :width]
            corr = jnp.sum(f1 * shifted, axis=1) * inv_c  # [chunk, W]
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
            + th * c * (w + 2 * d) * 4 * 2  # rows fp32 + one rolled copy
            + th * c * w * 4  # product temporary
        )
        if fixed + per <= _VMEM_BUDGET:
            return th
    return None


def _forward_pallas(
    f1: jax.Array, f2: jax.Array, max_displacement: int, interpret: bool = False
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
    return jnp.transpose(out_khw, (0, 2, 3, 1))  # → [B, H, W, K]


def fits_vmem(shape, max_displacement: int, itemsize: int = 2) -> bool:
    _, h, w, c = shape
    return _pick_chunk(h, w, c, max_displacement, itemsize) is not None


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------


def _bwd_kernel(g_ref, f2p_ref, f1p_ref, gp_ref, df1_ref, df2_ref, *,
                num_shifts: int, chunk: int, width: int, d: int, inv_c: float):
    """One grid step computes ``chunk`` rows of BOTH df1 and df2.

    df1[y,x,c] = (1/C) sum_k g[k,y,x]   * f2p[y+i, x+j, c]
    df2[y,x,c] = (1/C) sum_k gp[k,y+2d-i,x+2d-j] * f1p[y+2d-i, x+2d-j, c]

    with k = i*num_shifts+j. Layouts as the forward: features [rows, C, W']
    (W on lanes, C on sublanes), gradients [nk, rows, W'].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hh = pl.program_id(1)
    n = num_shifts
    wp = width + 2 * d
    g = g_ref[0].astype(jnp.float32)  # [nk, chunk, W]
    c = f1p_ref.shape[2]
    acc1 = jnp.zeros((chunk, c, width), jnp.float32)
    acc2 = jnp.zeros((chunk, c, width), jnp.float32)
    for i in range(n):
        rows2 = f2p_ref[0, pl.ds(hh * chunk + i, chunk), :, :].astype(
            jnp.float32)  # [chunk, C, W+2d]
        off = 2 * d - i
        rows1 = f1p_ref[0, pl.ds(hh * chunk + off, chunk), :, :].astype(
            jnp.float32)  # [chunk, C, W+2d]
        # gp layout [1, rows, nk, lanes] (rows OUTER — dynamic sublane
        # starts would need provable 8-alignment); the per-k selection
        # happens at VALUE level, like g[k] in the df1 path
        gpw = gp_ref[0, pl.ds(hh * chunk + off, chunk), :, :].astype(
            jnp.float32)  # [chunk, nk, W+2d]
        for j in range(n):
            k = i * n + j
            # df1 += g_k * f2p(y+i, x+j): lane shift j on f2p rows
            sh2 = rows2 if j == 0 else pltpu.roll(rows2, shift=wp - j, axis=2)
            acc1 += g[k][:, None, :] * sh2[:, :, :width]
            # df2 += (gp_k · f1p)(y+2d-i, x+2d-j): lane shift (2d-j)
            prod = gpw[:, k, :][:, None, :] * rows1
            sj = 2 * d - j
            shp = prod if sj == 0 else pltpu.roll(prod, shift=wp - sj, axis=2)
            acc2 += shp[:, :, :width]
    df1_ref[0, :, :, :] = (acc1 * inv_c).astype(df1_ref.dtype)
    df2_ref[0, :, :, :] = (acc2 * inv_c).astype(df2_ref.dtype)


_BWD_VMEM_BUDGET = 100 * 1024 * 1024  # v5e VMEM is 128 MB
_USE_PALLAS_BWD = False  # see _bwd: Mosaic layout constraints, WIP


def _pick_bwd_chunk(h: int, w: int, c: int, d: int, itemsize: int):
    """Largest H-chunk for which the backward working set fits VMEM."""
    n = 2 * d + 1
    nk = n * n
    wp = w + 2 * d
    hp = h + 2 * d
    fixed = (hp * c * wp * itemsize) * 2 + nk * hp * wp * itemsize  # f1p,f2p,gp
    for chunks in (1, 2, 4, 7, 8, 14, 16, 28, 56):
        if h % chunks:
            continue
        th = h // chunks
        if th != h and th % 8:
            continue
        per = (
            nk * th * w * itemsize  # g block
            + 2 * th * c * w * 4  # acc1 + acc2
            + nk * th * w * 4  # g fp32 copy
            + 4 * th * c * wp * 4  # rows fp32 + rolled copies + prod
        )
        if fixed + per <= _BWD_VMEM_BUDGET:
            return th
    return None


def _bwd_pallas(f1, f2, g, max_displacement: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1.shape
    d = max_displacement
    n = 2 * d + 1
    nk = n * n
    th = _pick_bwd_chunk(h, w, c, d, f1.dtype.itemsize)
    assert th is not None

    gt = jnp.transpose(g, (0, 3, 1, 2))  # [B, nk, H, W]
    gp = jnp.pad(
        jnp.transpose(g, (0, 1, 3, 2)), ((0, 0), (d, d), (0, 0), (d, d))
    )  # [B, H+2d, nk, W+2d] — rows outer
    f1p = jnp.pad(
        jnp.transpose(f1, (0, 1, 3, 2)), ((0, 0), (d, d), (0, 0), (d, d)))
    f2p = jnp.pad(
        jnp.transpose(f2, (0, 1, 3, 2)), ((0, 0), (d, d), (0, 0), (d, d)))

    kernel = functools.partial(
        _bwd_kernel, num_shifts=n, chunk=th, width=w, d=d, inv_c=1.0 / c)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, hh: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    df1t, df2t = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, nk, th, w), lambda i, hh: (i, 0, hh, 0),
                         memory_space=pltpu.VMEM),
            full((1, h + 2 * d, c, w + 2 * d)),
            full((1, h + 2 * d, c, w + 2 * d)),
            full((1, h + 2 * d, nk, w + 2 * d)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, c, w), lambda i, hh: (i, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, c, w), lambda i, hh: (i, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, c, w), f1.dtype),
            jax.ShapeDtypeStruct((b, h, c, w), f2.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * w * c * nk,
            bytes_accessed=(4 * b * h * w * c + 2 * b * h * w * nk)
            * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gt, f2p, f1p, gp)
    df1 = jnp.transpose(df1t, (0, 1, 3, 2))
    df2 = jnp.transpose(df2t, (0, 1, 3, 2))
    return df1, df2


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
    """Backward: fused Pallas kernel on TPU (one VMEM-resident pass over the
    81 shifts for BOTH grads), else the XLA mirror — parallel
    pad+static-slice+add shifts (a chained dynamic_update_slice formulation
    compiles pathologically slowly)."""
    f1, f2 = residuals
    # The Pallas backward below is interpreter-correct but does not yet
    # compile efficiently on real TPUs: the per-shift gradient slices sit
    # on the sublane dim (dynamic sublane starts need provable 8-alignment
    # -> Mosaic rejects), and the value-level workaround materializes the
    # whole [chunk, 81, W+2d] gradient window per dy (347 MB VMEM at PWC
    # level 3). Until the gradient layout is redesigned (e.g. nk on lanes
    # with a 128-pad, or a flat rows*lanes layout with width padded to a
    # lane multiple), the XLA mirror is both correct and adequate.
    if _USE_PALLAS_BWD and jax.default_backend() == "tpu" and _pick_bwd_chunk(
        f1.shape[1], f1.shape[2], f1.shape[3], max_displacement,
        f1.dtype.itemsize,
    ) is not None:
        return _bwd_pallas(f1, f2, g, max_displacement)
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
