"""W-packed siamese-encoder level kernel (the small-cout MXU fix).

Problem (PERF.md round-3 profile): the encoder's fine levels dominate its
4.6 ms — level 0 alone is 2.7 ms — because their convs have cout 16-64:
a GEMM with 16 output channels fills 16/128 MXU rows, so XLA and the
generic conv-group kernel both run them at ~25 TFLOP/s regardless of
formulation (reference structure: models/networks/cost_volume_flow_net.py
:30-47 — three 3x3 convs per level, the first stride 2).

Fix: pack P = 128/cout consecutive OUTPUT columns into the channel dim, so
every GEMM computes [P*cout = 128, K] x [K, M] — full MXU rows. The price
is a denser-than-needed lhs (taps of the P packed phases overlap by only
one column), an accepted ~2-3x FLOP overhead on convs that were running at
~12% utilization.

Layout ("H-pair + W-pack", all static, Mosaic-aligned):

- A level's data is [B/2, 2 * P * c, (H/2) * 128]: channel index =
  (parity, q, c) where ``parity`` is the row LSB (H-pair), ``q`` the packed
  column phase, ``c`` the feature channel; lanes are 2 images x 64 packed
  columns (pack_lanes order). One such block per level, H-pair so that the
  NEXT level's stride-2 conv sees exactly one input lane-row per output
  row — its 3 row taps {2r-1, 2r, 2r+1} become THE SAME lane window at
  offsets {r-1, r, r} with parity selecting the channel half. No stride-2
  row gather, no 2x-row GEMM waste, no phase splits.
- Within a packed column, a 3x3 tap's dx lives in the lhs weight algebra
  (phase p reads q in {p-1, p, p+1}); only the one-column overlap at packed
  -column boundaries needs data movement: a masked lane roll of the c
  (aligned) edge rows into a small scratch.
- Chaining levels 0-2 keeps this layout end-to-end; entry/exit are ONE XLA
  transpose each (the same count the unpacked path pays), and levels with
  cout >= 96 continue on the generic conv-group kernel.

Every GEMM in the level then reads the shared-window scratches directly at
aligned lane offsets; the only VPU work is the two edge rolls per conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA-side layout helpers
# ---------------------------------------------------------------------------


def pack_image_hpair(x: jax.Array, p_in: int, c_pad: int | None = None):
    """NHWC [B, H, W, C] -> H-pair/W-pack flat [B/2, 2*p_in*Cp, (H/2)*(2*W/p_in)].

    Channel order (parity, q, c); lanes = 2 images side by side (pack_lanes
    order: row r = [imgA row r | imgB row r]). One XLA transpose."""
    b, h, w, c = x.shape
    cp = c if c_pad is None else c_pad
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    wp = w // p_in
    x = x.reshape(b // 2, 2, h // 2, 2, wp, p_in, cp)
    # [b2, img, h2, par, wp, q, c] -> [b2, (par, q, c), h2, (img, wp)]
    x = jnp.transpose(x, (0, 3, 5, 6, 2, 1, 4))
    return x.reshape(b // 2, 2 * p_in * cp, (h // 2) * 2 * wp)


def unpack_hpair(y: jax.Array, h: int, w: int, c: int, p: int) -> jax.Array:
    """H-pair/W-pack flat [B/2, 2*p*c, (h/2)*(2*w/p)] -> NHWC [B, h, w, c]."""
    b2 = y.shape[0]
    wp = w // p
    y = y.reshape(b2, 2, p, c, h // 2, 2, wp)
    # [b2, par, q, c, h2, img, wp] -> [b2, img, h2, par, wp, q, c]
    y = jnp.transpose(y, (0, 5, 4, 1, 6, 2, 3))
    return y.reshape(b2 * 2, h, w, c)


# ---------------------------------------------------------------------------
# lhs (weight) builders — all [P*cout, K] with the tap algebra baked in
# ---------------------------------------------------------------------------


def _pair_lhs_main(w, p, c, dy):
    """[3,3,c,c] -> [p*c, p*c] for tap row dy: entry[(ph,o),(q,ci)] =
    w[dy+1, q-ph+1, ci, o] for |q-ph| <= 1."""
    lhs = jnp.zeros((p, c, p, c), w.dtype)
    for ph in range(p):
        for dq in (-1, 0, 1):
            q = ph + dq
            if 0 <= q < p:
                lhs = lhs.at[ph, :, q, :].set(
                    jnp.transpose(w[dy + 1, dq + 1], (1, 0)))
    return lhs.reshape(p * c, p * c)


def _pair_lhs_edge(w, p, c, dy, side):
    """Edge lhs [p*c, c]: left (side=0) feeds phase 0 from the previous
    packed column's last feature group; right (side=1) feeds phase p-1."""
    lhs = jnp.zeros((p, c, c), w.dtype)
    ph = 0 if side == 0 else p - 1
    dx = 0 if side == 0 else 2
    lhs = lhs.at[ph].set(jnp.transpose(w[dy + 1, dx], (1, 0)))
    return lhs.reshape(p * c, c)


def _s2_lhs_parity(w, p, p_in, c_in, c_pad, cout, parity_rows):
    """Stride-2 lhs over one or both parity halves of the input block.

    parity_rows: list of (k_row_of_w, ) per parity included, e.g. [(0,)] for
    the dy=-1 GEMM (parity 1 only, w row 0) or [(1,), (2,)] for the dy=0/+1
    GEMM (parity 0 -> w row 1, parity 1 -> w row 2). Output phase ph taps
    input q = 2*ph + dx for dx in {-1,0,1}."""
    blocks = []
    for (krow,) in parity_rows:
        lhs = jnp.zeros((p, cout, p_in, c_pad), w.dtype)
        for ph in range(p):
            for dx in (-1, 0, 1):
                q = 2 * ph + dx
                if 0 <= q < p_in:
                    lhs = lhs.at[ph, :, q, :c_in].set(
                        jnp.transpose(w[krow, dx + 1], (1, 0)))
        blocks.append(lhs.reshape(p * cout, p_in * c_pad))
    return jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]


def _s2_lhs_edge(w, p, p_in, c_in, c_pad, cout, krow):
    """Edge lhs [p*cout, p_in*c_pad] over a rolled full-parity scratch: only
    phase 0's dx=-1 tap (input q = -1 = previous packed column's q_in-1
    group) is nonzero."""
    lhs = jnp.zeros((p, cout, p_in, c_pad), w.dtype)
    lhs = lhs.at[0, :, p_in - 1, :c_in].set(jnp.transpose(w[krow, 0], (1, 0)))
    return lhs.reshape(p * cout, p_in * c_pad)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _enc_kernel(*refs, th, halo, w_lanes, w_img, p, c, p_in, c_pad, dtype,
                interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (x_ref, l_m1, l_01, le_m1, le_0, le_p1,
     pm_refs1, pe_l1, pe_r1, pm_refs2, pe_l2, pe_r2,
     b0_ref, b1_ref, b2_ref, out_ref,
     X, E0, E1, S0, S1, S2, EL, ER, sem) = refs

    t = pl.program_id(1)
    b = pl.program_id(0)
    R = th + 2 * halo
    c_half = p_in * c_pad  # one parity half of the input block
    mW = w_lanes

    # input window: th+5 H-pair rows starting at t*th (HBM pre-padded by 3)
    cp = pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(t * th * mW, (th + 5) * mW)], X.at[:, :],
        sem.at[0])
    cp.start()
    cp.wait()

    def maskroll_left(rows):
        """rows shifted one packed column to the RIGHT (lane +1): lane j
        then holds column j-1; first column of each image zeroed."""
        col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) % w_img
        r32 = pltpu.roll(rows.astype(jnp.float32), shift=1, axis=1)
        return jnp.where(col >= 1, r32, 0.0).astype(rows.dtype)

    def maskroll_right(rows):
        col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) % w_img
        r32 = pltpu.roll(rows.astype(jnp.float32),
                         shift=rows.shape[1] - 1, axis=1)
        return jnp.where(col < w_img - 1, r32, 0.0).astype(rows.dtype)

    # rolled full-parity edge scratches for the stride-2 conv
    E0[:, :] = maskroll_left(X[pl.ds(0, c_half), :])
    E1[:, :] = maskroll_left(X[pl.ds(c_half, c_half), :])

    def gemm(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def zero_halo(S, v):
        if halo <= v:
            return
        nz = (halo - v) * mW

        @pl.when(t == 0)
        def _():
            S[:, pl.ds(v * mW, nz)] = jnp.zeros((128, nz), S.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            S[:, pl.ds((halo + th) * mW, nz)] = jnp.zeros((128, nz), S.dtype)

    # ---- stride-2 conv: out window rows [0, R) ----
    m = R * mW
    acc = gemm(l_m1[:, :], X[pl.ds(c_half, c_half), pl.ds(0, m)])        # dy=-1
    acc += gemm(l_01[:, :], X[:, pl.ds(mW, m)])                          # dy=0,+1
    acc += gemm(le_m1[:, :], E1[:, pl.ds(0, m)])
    acc += gemm(le_0[:, :], E0[:, pl.ds(mW, m)])
    acc += gemm(le_p1[:, :], E1[:, pl.ds(mW, m)])
    acc += b0_ref[:, :1]
    acc = jnp.where(acc >= 0, acc, 0.1 * acc)
    S0[:, :] = acc.astype(S0.dtype)
    zero_halo(S0, 0)

    # ---- pair convs ----
    def pair(Sin, Sout, pm_refs, pe_l, pe_r, b_ref, v):
        EL[:, :] = maskroll_left(Sin[pl.ds(128 - c, c), :])
        ER[:, :] = maskroll_right(Sin[pl.ds(0, c), :])
        mv = (R - 2 * v) * mW
        acc = None
        for dyi in range(3):
            off = (v - 1 + dyi) * mW
            g = gemm(pm_refs[dyi][:, :], Sin[:, pl.ds(off, mv)])
            g += gemm(pe_l[dyi][:, :], EL[pl.ds(0, c), pl.ds(off, mv)])
            g += gemm(pe_r[dyi][:, :], ER[pl.ds(0, c), pl.ds(off, mv)])
            acc = g if acc is None else acc + g
        acc += b_ref[:, :1]
        acc = jnp.where(acc >= 0, acc, 0.1 * acc)
        Sout[pl.ds(0, 128), pl.ds(v * mW, mv)] = acc.astype(Sout.dtype)
        zero_halo(Sout, v)

    pair(S0, S1, pm_refs1, pe_l1, pe_r1, b1_ref, 1)
    pair(S1, S2, pm_refs2, pe_l2, pe_r2, b2_ref, 2)

    # ---- emit H-pair packed: out rows [t*th, t*th+th) = window [2, 2+th) ----
    for r in range(th):
        par = r % 2
        out_ref[0, pl.ds(par * 128, 128), pl.ds((r // 2) * mW, mW)] = (
            S2[:, pl.ds((halo + r) * mW, mW)])


def enc_level_packed(
    x: jax.Array,
    w0: jax.Array, b0: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    h: int,
    c_in: int,
    c: int,
    w_img: int = 64,
    th: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One encoder level (stride-2 conv + two convs, LeakyReLU 0.1) on
    H-pair/W-packed data.

    x: [B2, 2*p_in*c_pad, h*(2*w_img)] — H-pair rows == h (the level's
       OUTPUT height), p_in = 2*(128//c), c_pad = 16-aligned c_in.
    Returns [B2, 256, (h/2)*(2*w_img)] in the same family layout with
    p_out = 128//c.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = 128 // c
    assert p * c == 128, (p, c)
    p_in = 2 * p
    c_pad = _ceil_to(c_in, 4)
    assert x.shape[1] == 2 * p_in * c_pad, (x.shape, p_in, c_pad)
    w_lanes = 2 * w_img
    assert x.shape[2] == h * w_lanes
    assert h % 2 == 0
    b2sz = x.shape[0]
    dtype = x.dtype
    halo = 2
    if th is None:
        th = next(t for t in (56, 28, 16, 14, 8, 4, 2) if h % t == 0)
    assert h % th == 0 and th % 2 == 0 and th >= halo

    # HBM pre-pad: 3 H-pair rows top (s2 needs pair r-1 for out row r-halo),
    # 2 bottom
    xp = jnp.pad(
        x.reshape(b2sz, x.shape[1], h, w_lanes),
        ((0, 0), (0, 0), (3, 2), (0, 0)),
    ).reshape(b2sz, x.shape[1], (h + 5) * w_lanes)

    l_m1 = _s2_lhs_parity(w0, p, p_in, c_in, c_pad, c, [(0,)]).astype(dtype)
    l_01 = _s2_lhs_parity(w0, p, p_in, c_in, c_pad, c, [(1,), (2,)]).astype(dtype)
    le_m1 = _s2_lhs_edge(w0, p, p_in, c_in, c_pad, c, 0).astype(dtype)
    le_0 = _s2_lhs_edge(w0, p, p_in, c_in, c_pad, c, 1).astype(dtype)
    le_p1 = _s2_lhs_edge(w0, p, p_in, c_in, c_pad, c, 2).astype(dtype)
    pm1 = [_pair_lhs_main(w1, p, c, dy).astype(dtype) for dy in (-1, 0, 1)]
    pel1 = [_pair_lhs_edge(w1, p, c, dy, 0).astype(dtype) for dy in (-1, 0, 1)]
    per1 = [_pair_lhs_edge(w1, p, c, dy, 1).astype(dtype) for dy in (-1, 0, 1)]
    pm2 = [_pair_lhs_main(w2, p, c, dy).astype(dtype) for dy in (-1, 0, 1)]
    pel2 = [_pair_lhs_edge(w2, p, c, dy, 0).astype(dtype) for dy in (-1, 0, 1)]
    per2 = [_pair_lhs_edge(w2, p, c, dy, 1).astype(dtype) for dy in (-1, 0, 1)]
    bt = [jnp.tile(b.astype(jnp.float32), p).reshape(-1, 1)
          for b, p_ in ((b0, p), (b1, p), (b2, p))]

    R = th + 2 * halo
    c_half = p_in * c_pad
    vmem = pltpu.VMEM
    kern = functools.partial(
        _enc_kernel, th=th, halo=halo, w_lanes=w_lanes, w_img=w_img, p=p,
        c=c, p_in=p_in, c_pad=c_pad, dtype=dtype, interpret=interpret)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vspec = pl.BlockSpec(memory_space=vmem)
    in_specs = [any_spec] + [vspec] * 5 + [vspec] * 3 * 6 + [vspec] * 3

    out = pl.pallas_call(
        lambda *r: kern(
            r[0], r[1], r[2], r[3], r[4], r[5],
            r[6:9], r[9:12], r[12:15], r[15:18], r[18:21], r[21:24],
            r[24], r[25], r[26], r[27], *r[28:]),
        grid=(b2sz, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 256, (th // 2) * w_lanes),
                               lambda b, t: (b, 0, t), memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b2sz, 256, (h // 2) * w_lanes), dtype),
        scratch_shapes=[
            vmem((2 * c_half, (th + 5) * w_lanes), dtype),  # X
            vmem((c_half, (th + 5) * w_lanes), dtype),      # E0
            vmem((c_half, (th + 5) * w_lanes), dtype),      # E1
            vmem((128, R * w_lanes), dtype),                # S0
            vmem((128, R * w_lanes), dtype),                # S1
            vmem((128, R * w_lanes), dtype),                # S2
            vmem((c, R * w_lanes), dtype),                  # EL
            vmem((c, R * w_lanes), dtype),                  # ER
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, l_m1, l_01, le_m1, le_0, le_p1,
      *pm1, *pel1, *per1, *pm2, *pel2, *per2, *bt)
    return out
