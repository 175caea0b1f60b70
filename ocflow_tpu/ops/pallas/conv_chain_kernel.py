"""Fused multi-conv ("conv group") Pallas TPU kernel.

Motivation (PERF.md roofline): the PWC decoder + context block runs at XLA's
per-conv shape ceiling (~81 TFLOP/s, ~2x under the HBM-bound roofline) and
the DenseNet concat growth materializes ~1 GB of concatenated activations
per Sintel-res forward (reference structure:
/root/reference/models/networks/cost_volume_flow_net.py:90-112,176-183).
This kernel executes a CHAIN of 3x3 convolutions over a VMEM-resident tile,
expressing every conv as canonical MXU GEMMs, so

- concat growth is free: each conv output lives in its own VMEM scratch and
  later convs read multiple blocks (a K-split GEMM per block) instead of a
  materialized concatenation;
- intermediate activations never round-trip HBM within a group.

Layout contract (chosen so every slice is Mosaic-aligned):

- Arrays move through the kernel as ``[C (sublane), H*W (lane)]`` per batch
  element, i.e. channel-major with the flattened spatial dim on lanes.
- A 3x3 tap (dy, dx) of a dilation-d conv decomposes as
    out[r, x] += sum_dy  W[dy,dx]^T @ in[r + (dy-1)d, x + (dx-1)d]
  The dy shift is a LANE SLICE at offset ``row*W`` (aligned whenever W is a
  multiple of 128); the dx shift is applied on the OUTPUT side as a lane
  roll of the fp32 partial sum with the columns that crossed a row boundary
  masked to zero — exact zero-padding semantics. All GEMMs are canonical
  ``[Cout, K] x [K, M]`` with K = a block's (16-aligned) channel count and
  M a multiple of 256.
- Each grid step (b, t) emits ``th`` output rows; chained convs need a halo
  of ``sum(dilations)`` valid input rows on each side, provided by
  pre-padding the inputs in HBM (zero rows) and DMA-ing an overlapping
  ``th + 2*halo`` row window per step.

Constraints: W % 128 == 0, H % th == 0, channel counts padded to a multiple
of 16 (bf16 sublane tile). The flagship uses this for pyramid levels 2
(W=256) and 3 (W=128); coarser levels stay on XLA (W < 128).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass(frozen=True)
class ConvSpec:
    """One conv in the group.

    reads: block ids this conv consumes. Block ids 0..n_inputs-1 are the
    kernel inputs; block id n_inputs+j is conv j's output.
    cout: logical output channels (padded to 16 internally).
    dilation: tap spacing (stride is always 1, padding SAME-with-zeros).
    act: apply LeakyReLU(0.1).
    emit: write this conv's output to HBM.
    """

    reads: tuple[int, ...]
    cout: int
    dilation: int = 1
    act: bool = True
    emit: bool = False
    # im2col mode (single-read convs only): build a [9*Cin, M] rhs in VMEM
    # from 9 shifted masked copies and run ONE GEMM with K = 9*Cin. Wins
    # when Cin is small (16-64): the per-dy K=Cin GEMMs starve the MXU's
    # contraction dim, im2col restores K >= 128.
    im2col: bool = False
    # W8A8 output: store this conv's output int8 in the quantized stripe
    # (scale supplied via conv_group's ``quant``). v5e int8 MXU runs ~2x
    # bf16 (tools/spike_int8.py: 325-371 TOP/s vs ~186). Only meaningful
    # when the kernel runs with quant enabled; p3 (non-im2col) specs only.
    q8: bool = False
    # stride-2 mode (im2col only, reading a stride-2 kernel INPUT): the
    # input arrives W-pair channel-packed (2*Cin channels at W/2 cols, see
    # pwc_fast._pack_w_kernel for the tap algebra) so W-stride-2 vanishes
    # into the contraction; H-stride-2 is handled by computing the stride-1
    # conv over a 2x-row window and writing back only the even rows (one
    # aligned lane slice per output row). Row strides stay Mosaic-aligned
    # throughout — no per-lane gathers, no phase splits (the measured dead
    # end of the parity-phase formulation, PERF.md).
    stride: int = 1
    # W-packed data domain (im2col modes only): this conv's OUTPUT holds
    # ``pack`` image columns per lane as channel groups (``cout`` must be
    # pack * the conv's real Cout); a stride-2 pack conv consumes a
    # ``2*pack``-group input. Purely a WEIGHT-layout feature — the kernel
    # rhs builds are pack-agnostic (full-group blocks + lane rolls). Used
    # for the encoder's level-0 chain, whose output no pyramid consumer
    # ever reads unpacked (PERF.md round-5 "packed level-0").
    pack: int = 1


def _pack_weights(w_hwio: jax.Array, k_pad: int, cout_pad: int) -> jax.Array:
    """[3,3,Cin,Cout] HWIO -> [9*cout_pad, k_pad], rows grouped dy-major.

    Row block ``(dy*3+dx)*cout_pad : +cout_pad`` holds W[dy,dx]^T. The kernel
    slices a [3*cout_pad, k] dy-group at once, computing the three dx
    partials in one GEMM (fewer, bigger MXU dispatches).
    """
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3, "conv_group supports 3x3 kernels"
    w = jnp.transpose(w_hwio, (0, 1, 3, 2)).reshape(9, cout, cin)
    w = jnp.pad(w, ((0, 0), (0, cout_pad - cout), (0, k_pad - cin)))
    return w.reshape(9 * cout_pad, k_pad)


def _pack_weights_im2col(w_hwio: jax.Array, k_pad: int, cout_pad: int) -> jax.Array:
    """[3,3,Cin,Cout] HWIO -> [cout_pad, 9*k_pad] for the im2col GEMM:
    column block ``(dy*3+dx)*k_pad : +k_pad`` holds W[dy,dx] (Cin-major)."""
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3
    w = jnp.transpose(w_hwio, (3, 0, 1, 2))  # [Cout, 3, 3, Cin]
    w = jnp.pad(w, ((0, cout_pad - cout), (0, 0), (0, 0), (0, k_pad - cin)))
    return w.reshape(cout_pad, 9 * k_pad)


def _pack_weights_im2col_s2(w_hwio: jax.Array, k_pad: int, cout_pad: int) -> jax.Array:
    """[3,3,Cin,Cout] -> [cout_pad, 6*k_pad] for the stride-2 im2col GEMM on
    W-pair packed input (packed col p = orig cols (2p, 2p+1) as (lo, hi)
    channel halves). Output col j of the stride-2 conv taps orig cols
    {2j-1, 2j, 2j+1} = packed col j-1's hi half and packed col j's lo+hi —
    two packed taps (dxp in {-1, 0}) per dy. Column block
    ``(dy*2 + dxp+1)*k_pad : +k_pad`` holds that tap's weights."""
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3 and 2 * cin <= k_pad
    z = jnp.zeros((3, 2, k_pad, cout), w_hwio.dtype)
    z = z.at[:, 0, cin:2 * cin].set(w_hwio[:, 0])  # dxp=-1: hi = orig 2j-1
    z = z.at[:, 1, :cin].set(w_hwio[:, 1])         # dxp=0:  lo = orig 2j
    z = z.at[:, 1, cin:2 * cin].set(w_hwio[:, 2])  #         hi = orig 2j+1
    z = jnp.transpose(z, (3, 0, 1, 2)).reshape(cout, 6 * k_pad)
    return jnp.pad(z, ((0, cout_pad - cout), (0, 0)))


def _pack_weights_im2col_s2p(
    w_hwio: jax.Array, k_pad: int, cout_pad: int, pack: int
) -> jax.Array:
    """Stride-2 weights for a W-PACKED-OUTPUT conv: input ``2*pack``-group
    W-packed (group g of lane w' = orig col ``2*pack*w' + g``, channels
    ``g*Cin + ci``), output ``pack``-group packed (rows ``p*Cout + co`` =
    orig output col ``pack*w' + p``).

    Output phase p, kernel tap dx reads orig col ``2*(pack*w'+p)+dx-1`` =
    input group ``g = 2p+dx-1``: g == -1 comes from the ROLLED-RIGHT rhs
    block's last group (lane w'-1), every other g from the PLAIN block —
    the exact 2-blocks-per-dy rhs the kernel's stride-2 branch already
    builds, so packed output needs NO kernel change, only these weights.
    ``pack=1`` reduces to :func:`_pack_weights_im2col_s2`. The point of
    pack>1: pixels move from the GEMM's streaming dim M into otherwise
    idle MXU output rows — M halves at equal K for small-Cout convs
    (encoder level 0, PERF.md round-5 "packed level-0")."""
    kh, kw, cin, cout = w_hwio.shape
    p_in = 2 * pack
    assert kh == 3 and kw == 3 and p_in * cin <= k_pad
    # block dxp=0 = rolled-right (lane w'-1), dxp=1 = plain (kernel layout)
    z = jnp.zeros((3, 2, k_pad, pack * cout), w_hwio.dtype)
    for p in range(pack):
        for dx in range(3):
            g = 2 * p + dx - 1
            blk, src = (0, p_in - 1) if g == -1 else (1, g)
            z = z.at[:, blk, src * cin:(src + 1) * cin,
                     p * cout:(p + 1) * cout].set(w_hwio[:, dx])
    z = jnp.transpose(z, (3, 0, 1, 2)).reshape(pack * cout, 6 * k_pad)
    return jnp.pad(z, ((0, cout_pad - pack * cout), (0, 0)))


def _pack_weights_im2col_packed(
    w_hwio: jax.Array, k_pad: int, cout_pad: int, pack: int
) -> jax.Array:
    """Stride-1 im2col weights on ``pack``-group W-packed data (both input
    and output packed the same way; input block channels ``g*Cin + ci``).

    Output phase p, tap dx reads orig col ``pack*w' + p + dx - 1``: group
    ``q = p+dx-1`` — interior q from the PLAIN block, q == -1 from the
    lane-rolled-RIGHT copy of the last group only, q == pack from the
    rolled-LEFT copy of group 0 only. The kernel builds the matching LEAN
    rhs (per dy: plain ``cb`` rows + two ``cb/pack``-row rolled stubs), so
    K = 3*(pack+2)*Cin instead of the naive 9*pack*Cin — one fewer MXU
    pass for the packed encoder pairs (K 288 -> 192 at pack 2, Cin 16).
    Column block layout per dy (width ``kdy = (pack+2)*k_grp``):
    ``[plain pack*k_grp | rr k_grp | rl k_grp]`` with ``k_grp = k_pad/pack``.
    """
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3
    # group slots inside a packed block sit at REAL-cin stride (the
    # producing conv emits rows p*cout+co contiguously); the kernel's lean
    # stub slices need 16-row alignment
    assert pack * cin == k_pad and cin % 16 == 0, (
        "lean packed rhs needs 16-aligned cin groups filling the block")
    kdy = (pack + 2) * cin
    z = jnp.zeros((3, kdy, pack * cout), w_hwio.dtype)
    for p in range(pack):
        for dx in range(3):
            q = p + dx - 1
            if q < 0:
                off = pack * cin  # rr stub (last group, lane w'-1)
            elif q >= pack:
                off = (pack + 1) * cin  # rl stub (group 0, lane w'+1)
            else:
                off = q * cin
            z = z.at[:, off:off + cin,
                     p * cout:(p + 1) * cout].set(w_hwio[:, dx])
    z = jnp.transpose(z, (2, 0, 1)).reshape(pack * cout, 3 * kdy)
    return jnp.pad(z, ((0, cout_pad - pack * cout), (0, 0)))


def _is_contig(reads: tuple[int, ...]) -> bool:
    return all(b == reads[0] + i for i, b in enumerate(reads))


def _kernel_body(*refs, specs, n_inputs, th, halo, w_lanes, w_img,
                 valid, offs, out_ids, strided, interpret):
    """Shared-stripe kernel: ALL blocks live in ONE VMEM scratch ``S`` of
    shape [C_total, R*W], block ``bid`` at channel rows
    ``offs[bid]:offs[bid+1]``, spatial data at its WINDOW-row position.
    Because reads are always within the producing block's valid span, a
    conv reading a consecutive block range is ONE dy-GEMM over the whole
    range (K = sum of the range's channels) — small later blocks no longer
    starve the MXU contraction dim."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_convs = len(specs)
    n_weights = sum(
        1 if (s.im2col or _is_contig(s.reads)) else len(s.reads)
        for s in specs
    )
    pos = 0
    in_refs = refs[pos:pos + n_inputs]; pos += n_inputs
    w_refs = refs[pos:pos + n_weights]; pos += n_weights
    b_refs = refs[pos:pos + n_convs]; pos += n_convs
    out_refs = refs[pos:pos + len(out_ids)]; pos += len(out_ids)
    S = refs[pos]; pos += 1
    has_im2col = any(s.im2col for s in specs)
    if has_im2col:
        rhs_ref = refs[pos]; pos += 1
    sin_refs = {}
    for i in strided:
        sin_refs[i] = refs[pos]; pos += 1
    sems = refs[pos]

    t = pl.program_id(1)
    b = pl.program_id(0)
    R = th + 2 * halo

    # DMA the input windows into their stripes (stride-2 inputs get a 2x-row
    # window in their own scratch — their S stripe slot stays unused)
    copies = []
    for i, src in enumerate(in_refs):
        if i in sin_refs:
            c = pltpu.make_async_copy(
                src.at[b, :, pl.ds(t * th * 2 * w_lanes, (2 * R + 2) * w_lanes)],
                sin_refs[i].at[:, :],
                sems.at[i],
            )
        else:
            c = pltpu.make_async_copy(
                src.at[b, :, pl.ds(t * th * w_lanes, R * w_lanes)],
                S.at[pl.ds(offs[i], offs[i + 1] - offs[i]), :],
                sems.at[i],
            )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    def _zero_halo(oj, cout_pad, v):
        # Zero-padding semantics of the chain: each conv's input is the
        # previous output zero-padded at the IMAGE boundary, but halo rows
        # outside the image hold conv-of-padding (bias-contaminated) values.
        # Zero them on the first/last tile so downstream convs read zeros.
        if halo <= v:
            return
        nz = (halo - v) * w_lanes

        @pl.when(t == 0)
        def _():
            S[pl.ds(oj, cout_pad), pl.ds(v * w_lanes, nz)] = jnp.zeros(
                (cout_pad, nz), S.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            S[pl.ds(oj, cout_pad), pl.ds((halo + th) * w_lanes, nz)] = (
                jnp.zeros((cout_pad, nz), S.dtype))

    w_idx = 0
    for j, spec in enumerate(specs):
        d = spec.dilation
        v = valid[n_inputs + j]  # first valid output row within the window
        m_rows = R - 2 * v
        m = m_rows * w_lanes
        cout_pad = _ceil_to(spec.cout, 16)
        contig = spec.im2col or _is_contig(spec.reads)
        my_w = w_refs[w_idx:w_idx + (1 if contig else len(spec.reads))]
        w_idx += 1 if contig else len(spec.reads)
        if spec.stride == 2:
            # stride-2 im2col on a W-pair packed input: 6 taps (3 dy x 2
            # packed dx), rhs built from the 2x-row window, ONE stride-1
            # GEMM over ALL rows, even rows written back (H-subsample as
            # R aligned lane slices). The 2x GEMM M is cheap next to any
            # per-lane-gather/phase-split alternative (PERF.md dead ends).
            bid = spec.reads[0]
            cb = offs[bid + 1] - offs[bid]
            sin = sin_refs[bid]
            m2 = 2 * R * w_lanes
            colc = jax.lax.broadcasted_iota(jnp.int32, (cb, m2), 1) % w_img
            rdt = rhs_ref.dtype
            for dyi in range(3):
                rows = sin[pl.ds(0, cb), pl.ds(dyi * w_lanes, m2)]
                for dxpi in range(2):
                    if dxpi == 1:
                        sh = rows
                    else:
                        # packed tap j-1: roll right one col, zero each
                        # image's col 0 (left zero-pad semantics)
                        sh = jnp.where(
                            colc >= 1,
                            pltpu.roll(rows.astype(jnp.float32), shift=1,
                                       axis=1),
                            0.0,
                        ).astype(rdt)
                    rhs_ref[pl.ds((dyi * 2 + dxpi) * cb, cb), pl.ds(0, m2)] = sh
            acc = jax.lax.dot_general(
                my_w[0][:, :], rhs_ref[pl.ds(0, 6 * cb), pl.ds(0, m2)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += b_refs[j][:, :1]
            if spec.act:
                acc = jnp.where(acc >= 0, acc, acc * 0.1)
            oj = offs[n_inputs + j]
            # stride-1 column block q is centered at sin row q+1; window
            # output row r (v=0, abs row t*th - halo + r) is input row
            # 2*(t*th - halo + r) = sin row 2r+1 -> q = 2r (even rows).
            accs = acc.astype(S.dtype)
            for r in range(R):
                S[pl.ds(oj, cout_pad), pl.ds(r * w_lanes, w_lanes)] = (
                    accs[:, 2 * r * w_lanes:(2 * r + 1) * w_lanes])
            _zero_halo(oj, cout_pad, 0)
            continue
        if spec.im2col and spec.pack > 1:
            # LEAN packed rhs (see _pack_weights_im2col_packed): per dy the
            # plain block plus two one-group rolled stubs — K = 3*(pack+2)*
            # cin instead of 9*pack*cin (one fewer MXU pass at pack 2)
            bid = spec.reads[0]
            cb = offs[bid + 1] - offs[bid]
            cinr = cb // spec.pack
            kdy = (spec.pack + 2) * cinr
            colr = jax.lax.broadcasted_iota(jnp.int32, (cinr, m), 1) % w_img
            rdt = rhs_ref.dtype
            for dyi in range(3):
                row0 = v + (dyi - 1)  # pack>1 implies dilation 1
                base = dyi * kdy
                rows = S[pl.ds(offs[bid], cb), pl.ds(row0 * w_lanes, m)]
                rhs_ref[pl.ds(base, cb), pl.ds(0, m)] = rows
                last = S[pl.ds(offs[bid] + cb - cinr, cinr),
                         pl.ds(row0 * w_lanes, m)]
                rr = jnp.where(
                    colr >= 1,
                    pltpu.roll(last.astype(jnp.float32), shift=1, axis=1),
                    0.0,
                ).astype(rdt)
                rhs_ref[pl.ds(base + cb, cinr), pl.ds(0, m)] = rr
                first = S[pl.ds(offs[bid], cinr), pl.ds(row0 * w_lanes, m)]
                rl = jnp.where(
                    colr < w_img - 1,
                    pltpu.roll(first.astype(jnp.float32), shift=m - 1,
                               axis=1),
                    0.0,
                ).astype(rdt)
                rhs_ref[pl.ds(base + cb + cinr, cinr), pl.ds(0, m)] = rl
            acc = jax.lax.dot_general(
                my_w[0][:, :], rhs_ref[pl.ds(0, 3 * kdy), pl.ds(0, m)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif spec.im2col:
            # one GEMM with K = 9*Cin: rhs built from 9 shifted masked
            # copies of the (single) input block
            bid = spec.reads[0]
            cb = offs[bid + 1] - offs[bid]
            colc = jax.lax.broadcasted_iota(jnp.int32, (cb, m), 1) % w_img
            rdt = rhs_ref.dtype
            for dyi in range(3):
                row0 = v + (dyi - 1) * d
                rows = S[pl.ds(offs[bid], cb), pl.ds(row0 * w_lanes, m)]
                # Mosaic can only rotate 32-bit data — roll in fp32
                # (same pattern as the cost-volume kernel's lane shifts)
                rows32 = rows.astype(jnp.float32)
                for dxi in range(3):
                    dx = (dxi - 1) * d
                    if dx == 0:
                        sh = rows
                    else:
                        # rhs col x holds in[x+dx]; zero if x+dx leaves
                        # the image (zero-pad semantics)
                        keep = (colc < w_img - dx) if dx > 0 else (colc >= -dx)
                        sh = jnp.where(
                            keep,
                            pltpu.roll(rows32, shift=(m - dx) % m, axis=1),
                            0.0,
                        ).astype(rdt)
                    rhs_ref[pl.ds((dyi * 3 + dxi) * cb, cb), pl.ds(0, m)] = sh
            acc = jax.lax.dot_general(
                my_w[0][:, :], rhs_ref[pl.ds(0, 9 * cb), pl.ds(0, m)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # one GEMM per dy over the whole (consecutive) read range:
            # lhs rows are [W[dy,-d]^T; W[dy,0]^T; W[dy,+d]^T], K = range C
            p3 = jnp.zeros((3 * cout_pad, m), jnp.float32)
            if contig:
                k0 = offs[spec.reads[0]]
                K = offs[spec.reads[-1] + 1] - k0
                ranges = [(my_w[0], k0, K)]
            else:
                ranges = [
                    (wr, offs[bid], offs[bid + 1] - offs[bid])
                    for wr, bid in zip(my_w, spec.reads)
                ]
            for dyi in range(3):
                row0 = v + (dyi - 1) * d  # window coords
                for w_ref, k0, K in ranges:
                    rhs = S[pl.ds(k0, K), pl.ds(row0 * w_lanes, m)]
                    lhs = w_ref[pl.ds(dyi * 3 * cout_pad, 3 * cout_pad), :]
                    p3 += jax.lax.dot_general(
                        lhs, rhs,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            acc = p3[cout_pad:2 * cout_pad, :]
            # dx-roll masking at IMAGE boundaries: when several images are
            # packed side by side on lanes (w_img < w_lanes), a tap must not
            # cross from one image into its lane neighbor
            col = jax.lax.broadcasted_iota(jnp.int32, (cout_pad, m), 1) % w_img
            for dxi in (0, 2):
                dx = (dxi - 1) * d
                p = p3[dxi * cout_pad:(dxi + 1) * cout_pad, :]
                # out[., x] += p[., x+dx]: roll left by dx then zero columns
                # whose source crossed a row boundary (zero-pad semantics)
                keep = (col < w_img - dx) if dx > 0 else (col >= -dx)
                rolled = pltpu.roll(p, shift=(m - dx) % m, axis=1)
                acc += jnp.where(keep, rolled, 0.0)
        acc += b_refs[j][:, :1]
        if spec.act:
            acc = jnp.where(acc >= 0, acc, acc * 0.1)
        oj = offs[n_inputs + j]
        S[pl.ds(oj, cout_pad), pl.ds(v * w_lanes, m)] = acc.astype(S.dtype)
        _zero_halo(oj, cout_pad, v)

    for o, cid in enumerate(out_ids):
        ch = offs[cid + 1] - offs[cid]
        out_refs[o][0, :, :] = S[
            pl.ds(offs[cid], ch), pl.ds(halo * w_lanes, th * w_lanes)]


def conv_group(
    inputs: Sequence[jax.Array],
    weights: Sequence[Sequence[jax.Array]],
    biases: Sequence[jax.Array],
    specs: Sequence[ConvSpec],
    h: int,
    w: int,
    th: int = 8,
    w_img: int | None = None,
    interpret: bool = False,
    in_strides: Sequence[int] | None = None,
) -> list[jax.Array]:
    """Run a fused conv chain.

    inputs: list of [B, C_i, H*W] arrays (flat spatial lanes, C 16-aligned
            with zero padding). A stride-2 input (``in_strides[i] == 2``) is
            instead [B, C_i, (2H)*W]: the W-pair channel-packed form of a
            2H x 2W image (C_i = 16-aligned 2*C_orig), consumed only by
            ``stride=2`` specs.
    weights: weights[j][r] = [3,3,Cin_r,Cout_j] HWIO for conv j reading
            specs[j].reads[r]. For stride-2 specs, Cin_r is the ORIGINAL
            (unpacked) channel count; tap packing happens here.
    biases: biases[j] = [Cout_j].
    w_img: image width when several images are packed side by side on the
            lane dim (``w`` = pack * w_img); dx taps are masked at image
            boundaries. Defaults to ``w`` (one image per lane row).
    Returns the emitted conv outputs as [B, Cout_pad, H*W] (channel-padded).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    specs = tuple(specs)
    n_inputs = len(inputs)
    if w_img is None:
        w_img = w
    if in_strides is None:
        in_strides = (1,) * n_inputs
    in_strides = tuple(in_strides)
    assert w % 128 == 0 and h % th == 0 and w % w_img == 0
    bsz = inputs[0].shape[0]
    dtype = inputs[0].dtype

    # validity: first valid row of each block within a window. A stride-2
    # conv's input window is sized to cover ALL R output rows, so its
    # output block is valid from row 0.
    valid: list[int] = [0] * n_inputs
    for s in specs:
        if s.stride == 2:
            assert s.im2col and len(s.reads) == 1, "stride-2 implies im2col"
            assert s.reads[0] < n_inputs and in_strides[s.reads[0]] == 2
            valid.append(0)
        else:
            assert all(
                bid >= n_inputs or in_strides[bid] == 1 for bid in s.reads
            ), "stride-2 inputs are only readable by stride-2 convs"
            valid.append(max(valid[bid] for bid in s.reads) + s.dilation)
    out_ids = [n_inputs + j for j, s in enumerate(specs) if s.emit]
    halo = max(valid[cid] for cid in out_ids)
    # The first/last-tile zeroing of conv-of-padding halo rows assumes an
    # interior tile's window never crosses an image edge: halo <= th.
    assert halo <= th or h <= th, (
        f"halo {halo} > tile {th}: grow th or split the chain")
    R = th + 2 * halo
    strided = tuple(i for i in range(n_inputs) if in_strides[i] == 2)

    in_ch = [int(x.shape[1]) for x in inputs]
    for c in in_ch:
        assert c % 16 == 0, "pad input channels to a multiple of 16"

    # pre-pad rows in HBM: halo zero rows for stride-1 inputs; a stride-2
    # input needs 2*halo+1 rows each side (output row t*th-halo needs input
    # row 2*(t*th-halo)-1; window start then lands at row 2*t*th exactly)
    padded = []
    for i, x in enumerate(inputs):
        if in_strides[i] == 2:
            hi, p_in = 2 * h, 2 * halo + 1
            assert x.shape[2] == hi * w, (x.shape, hi, w)
            padded.append(
                jnp.pad(x.reshape(bsz, x.shape[1], hi, w),
                        ((0, 0), (0, 0), (p_in, p_in), (0, 0))).reshape(
                            bsz, x.shape[1], (hi + 2 * p_in) * w))
        else:
            padded.append(
                jnp.pad(x.reshape(bsz, x.shape[1], h, w),
                        ((0, 0), (0, 0), (halo, halo), (0, 0))).reshape(
                            bsz, x.shape[1], (h + 2 * halo) * w))

    block_ch = list(in_ch) + [_ceil_to(s.cout, 16) for s in specs]
    offs = [0]
    for c in block_ch:
        offs.append(offs[-1] + c)
    packed_w = []
    for j, s in enumerate(specs):
        cp = block_ch[n_inputs + j]
        if s.pack > 1:
            assert s.im2col and s.dilation == 1, (
                "pack>1 needs im2col mode with dilation 1")
        if s.stride == 2:
            if s.pack > 1:
                packed_w.append(_pack_weights_im2col_s2p(
                    weights[j][0], block_ch[s.reads[0]], cp,
                    s.pack).astype(dtype))
            else:
                packed_w.append(_pack_weights_im2col_s2(
                    weights[j][0], block_ch[s.reads[0]], cp).astype(dtype))
            continue
        if s.im2col:
            assert len(s.reads) == 1, "im2col supports single-read convs"
            if s.pack > 1:
                packed_w.append(_pack_weights_im2col_packed(
                    weights[j][0], block_ch[s.reads[0]], cp,
                    s.pack).astype(dtype))
            else:
                packed_w.append(_pack_weights_im2col(
                    weights[j][0], block_ch[s.reads[0]], cp).astype(dtype))
            continue
        per_block = [
            _pack_weights(weights[j][r], block_ch[bid], cp).astype(dtype)
            for r, bid in enumerate(s.reads)
        ]
        if _is_contig(s.reads):
            # one lhs over the whole stripe range: K-concat in read order
            packed_w.append(jnp.concatenate(per_block, axis=1))
        else:
            packed_w.extend(per_block)
    packed_b = [
        jnp.pad(biases[j].astype(jnp.float32),
                (0, block_ch[n_inputs + j] - biases[j].shape[0])).reshape(-1, 1)
        for j in range(len(specs))
    ]

    kern = functools.partial(
        _kernel_body, specs=specs, n_inputs=n_inputs, th=th,
        halo=halo, w_lanes=w, w_img=w_img, valid=tuple(valid),
        offs=tuple(offs), out_ids=tuple(out_ids), strided=strided,
        interpret=interpret,
    )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pltpu.VMEM
    in_specs = (
        [any_spec] * n_inputs
        + [pl.BlockSpec(memory_space=vmem)] * len(packed_w)
        + [pl.BlockSpec(memory_space=vmem)] * len(packed_b)
    )
    out_specs = [
        pl.BlockSpec((1, block_ch[cid], th * w), lambda b, t: (b, 0, t),
                     memory_space=vmem)
        for cid in out_ids
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, block_ch[cid], h * w), dtype)
        for cid in out_ids
    ]
    scratch = [vmem((offs[-1], R * w), dtype)]  # shared block stripes
    im2col_specs = [(j, s) for j, s in enumerate(specs) if s.im2col]
    if im2col_specs:
        k_max = max(
            (6 if s.stride == 2 else 9) * block_ch[s.reads[0]]
            for _, s in im2col_specs)
        m_max = max(
            (2 * R if s.stride == 2 else R - 2 * valid[n_inputs + j]) * w
            for j, s in im2col_specs)
        scratch.append(vmem((k_max, m_max), dtype))
    for i in strided:
        scratch.append(vmem((block_ch[i], (2 * R + 2) * w), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((max(n_inputs, 1),)))

    flops = 0
    for j, s in enumerate(specs):
        if s.stride == 2:
            flops += 2 * 6 * block_ch[n_inputs + j] * block_ch[s.reads[0]] * (
                2 * R * w)
            continue
        mj = (R - 2 * valid[n_inputs + j]) * w
        k = sum(block_ch[bid] for bid in s.reads)
        flops += 2 * 9 * block_ch[n_inputs + j] * k * mj
    flops *= bsz * (h // th)

    outs = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(int(np.prod(x.shape)) for x in padded) * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*padded, *packed_w, *packed_b)
    return list(outs) if isinstance(outs, (list, tuple)) else [outs]


# ---------------------------------------------------------------------------
# W8A8 quantized conv group (serving path)
# ---------------------------------------------------------------------------
#
# v5e's int8 MXU path runs ~2x bf16 (tools/spike_int8.py: 325-371 TOP/s vs
# ~186 measured; 394 TOPS spec). This variant executes the p3 (per-dy GEMM)
# conv chain with int8 operands and int32 accumulation:
#
# - activations live int8 in the stripe; each block has ONE static scale
#   s_b (value = q * s_b). Per-read-block scales FOLD INTO THE WEIGHTS
#   before per-output-channel quantization, so a K-concat GEMM over blocks
#   with different scales is still a single int8 GEMM;
# - the epilogue works in the OUTPUT-scale domain: acc = i32 * (wscale *
#   s_read / s_out) + bias/s_out, LeakyReLU commutes with the positive
#   scale, and the store is round+clip to int8 — one multiply-add per
#   element beyond the bf16 path;
# - dx rolls happen on the int32 partials (Mosaic rolls need 32-bit data,
#   which the int32 accumulator provides for free);
# - int8 VMEM tiling is (32, 128): q8 block channel counts and cout pads
#   are 32-aligned.
#
# Non-q8 specs (e.g. the flow head / context conv whose outputs feed XLA)
# still run the int8 GEMM over the quantized stripe but write bf16 straight
# to their output windows; they must not be read by later specs.


def _ceil32(c: int) -> int:
    return _ceil_to(c, 32)


def fold_quant_weights(w_list, read_scales, cout_pad, read_widths=None):
    """Fold per-read-block activation scales into the concatenated weight,
    then quantize per output channel. Returns (wq [3,3,K,cout_pad] int8,
    wscale [cout_pad] f32) with W ≈ wq * wscale / s_read (per block).
    ``read_widths``: stripe width of each read block (>= its logical cin;
    the extra K rows are zero weights against zero-padded channels)."""
    if read_widths is None:
        read_widths = [w.shape[2] for w in w_list]
    wf = jnp.concatenate(
        [
            jnp.pad(w.astype(jnp.float32) * s,
                    ((0, 0), (0, 0), (0, rw - w.shape[2]), (0, 0)))
            for w, s, rw in zip(w_list, read_scales, read_widths)
        ],
        axis=2)
    cout = wf.shape[3]
    wmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    wscale = jnp.maximum(wmax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    wq = jnp.pad(wq, ((0, 0), (0, 0), (0, 0), (0, cout_pad - cout)))
    wscale = jnp.pad(wscale, (0, cout_pad - cout))
    return wq, wscale


def _pack_weights_q8(wq, cout_pad):
    """[3,3,K,cout_pad] int8 -> [9*cout_pad, K] rows grouped dy-major
    (the q8 twin of _pack_weights; K is already the folded concat)."""
    k = wq.shape[2]
    w = jnp.transpose(wq, (0, 1, 3, 2)).reshape(9 * cout_pad, k)
    return w


def _pack_weights_q8_im2col(wq, cout_pad):
    """[3,3,K,cout_pad] int8 -> [cout_pad, 9*K] (the q8 twin of
    _pack_weights_im2col; K is the folded read-block width)."""
    k = wq.shape[2]
    return jnp.transpose(wq, (3, 0, 1, 2)).reshape(cout_pad, 9 * k)


def _pack_weights_q8_s2(w_hwio, s_in, k_pad, cout_pad):
    """Stride-2 im2col weights, quantized: fold the input scale, quantize
    per output channel over the REAL taps, then lay out the 6-tap
    (3 dy x 2 packed dx) structure of _pack_weights_im2col_s2.
    Returns (wq [cout_pad, 6*k_pad] int8, wscale [cout_pad] f32)."""
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3 and 2 * cin <= k_pad
    wf = w_hwio.astype(jnp.float32) * s_in
    wmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    wscale = jnp.maximum(wmax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127)
    z = jnp.zeros((3, 2, k_pad, cout), jnp.float32)
    z = z.at[:, 0, cin:2 * cin].set(wq[:, 0])  # dxp=-1: hi = orig 2j-1
    z = z.at[:, 1, :cin].set(wq[:, 1])         # dxp=0:  lo = orig 2j
    z = z.at[:, 1, cin:2 * cin].set(wq[:, 2])  #         hi = orig 2j+1
    z = jnp.transpose(z, (3, 0, 1, 2)).reshape(cout, 6 * k_pad)
    z = jnp.pad(z, ((0, cout_pad - cout), (0, 0))).astype(jnp.int8)
    return z, jnp.pad(wscale, (0, cout_pad - cout))


def _q8_kernel_body(*refs, specs, th, halo, w_lanes, w_img, valid,
                    stripe, offs, k_ranges, out_ids, has_b16, stored16,
                    in_stride, has_rhs):
    """Conv chain over an int8 stripe S8 plus an optional bf16 side stripe
    S16 for non-q8 blocks that later specs read (e.g. the flow head feeding
    the up-flow phase conv). A spec's GEMM dtype follows its read stripe:
    int8 x int8 -> int32 for q8 reads, bf16 -> f32 otherwise. ``offs[bid]``
    is the block's offset within its own stripe; ``k_ranges[j]`` the
    (start, K) of spec j's contiguous read range.

    Modes mirror the bf16 kernel: p3 (per-dy GEMM over a contiguous read
    range, dx on the int32 partials), im2col (single-read, int8 rhs built
    from 9 shifted masked copies — rolls ride an f32 cast, exact for int8
    codes), and stride-2 im2col (W-pair packed int8 input in its own
    scratch, even-row write-back). q8 specs may EMIT: the raw int8 codes
    ship from the stripe at the end (the caller dequantizes with the
    spec's scale, or feeds them to the next q8 group directly)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_convs = len(specs)
    pos = 0
    x_ref = refs[pos]; pos += 1
    w_refs = refs[pos:pos + n_convs]; pos += n_convs
    d_refs = refs[pos:pos + n_convs]; pos += n_convs  # dq [cout_pad, 1] f32
    b_refs = refs[pos:pos + n_convs]; pos += n_convs  # bias(/s_out) [cout_pad, 1]
    out_refs = refs[pos:pos + len(out_ids)]; pos += len(out_ids)
    S8 = refs[pos]; pos += 1
    S16 = None
    if has_b16:
        S16 = refs[pos]; pos += 1
    if has_rhs:
        rhs_ref = refs[pos]; pos += 1
    if in_stride == 2:
        sin_ref = refs[pos]; pos += 1
    sem = refs[pos]

    t = pl.program_id(1)
    b = pl.program_id(0)
    R = th + 2 * halo

    if in_stride == 2:
        c = pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(t * th * 2 * w_lanes, (2 * R + 2) * w_lanes)],
            sin_ref.at[:, :],
            sem,
        )
    else:
        c = pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(t * th * w_lanes, R * w_lanes)],
            S8.at[pl.ds(0, x_ref.shape[1]), :],
            sem,
        )
    c.start()
    c.wait()

    def _zero_halo(S, oj, cout_pad, v):
        if halo <= v:
            return
        nz = (halo - v) * w_lanes

        @pl.when(t == 0)
        def _():
            S[pl.ds(oj, cout_pad), pl.ds(v * w_lanes, nz)] = jnp.zeros(
                (cout_pad, nz), S.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            S[pl.ds(oj, cout_pad), pl.ds((halo + th) * w_lanes, nz)] = (
                jnp.zeros((cout_pad, nz), S.dtype))

    for j, spec in enumerate(specs):
        d = spec.dilation
        v = valid[1 + j]
        m = (R - 2 * v) * w_lanes
        is_q_read = stripe[spec.reads[0]] == "q"
        cout_pad = _ceil32(spec.cout) if is_q_read else _ceil_to(
            spec.cout, 16)
        k0, K = k_ranges[j]
        bid = 1 + j

        if spec.stride == 2:
            # stride-2 im2col on the W-pair packed int8 input (see the bf16
            # kernel body for the tap algebra): 6 taps, one int8 GEMM over
            # the 2x-row window, even rows written back as codes
            m2 = 2 * R * w_lanes
            colc = jax.lax.broadcasted_iota(jnp.int32, (K, m2), 1) % w_img
            for dyi in range(3):
                rows = sin_ref[pl.ds(k0, K), pl.ds(dyi * w_lanes, m2)]
                for dxpi in range(2):
                    if dxpi == 1:
                        sh = rows
                    else:
                        sh = jnp.where(
                            colc >= 1,
                            pltpu.roll(rows.astype(jnp.float32), shift=1,
                                       axis=1),
                            0.0,
                        ).astype(jnp.int8)
                    rhs_ref[pl.ds((dyi * 2 + dxpi) * K, K), pl.ds(0, m2)] = sh
            acc_i = jax.lax.dot_general(
                w_refs[j][:, :], rhs_ref[pl.ds(0, 6 * K), pl.ds(0, m2)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = (acc_i.astype(jnp.float32) * d_refs[j][:, :1]
                   + b_refs[j][:, :1])
            if spec.act:
                acc = jnp.where(acc >= 0, acc, acc * 0.1)
            assert spec.q8, "stride-2 q8 specs must write int8 codes"
            q = jnp.clip(jnp.round(acc), -127.0, 127.0).astype(jnp.int8)
            oj = offs[bid]
            for r in range(R):
                S8[pl.ds(oj, cout_pad), pl.ds(r * w_lanes, w_lanes)] = (
                    q[:, 2 * r * w_lanes:(2 * r + 1) * w_lanes])
            _zero_halo(S8, oj, cout_pad, 0)
            continue

        if spec.im2col:
            assert is_q_read, "im2col q8 specs read the int8 stripe"
            colc = jax.lax.broadcasted_iota(jnp.int32, (K, m), 1) % w_img
            for dyi in range(3):
                row0 = v + (dyi - 1) * d
                rows = S8[pl.ds(k0, K), pl.ds(row0 * w_lanes, m)]
                rows32 = rows.astype(jnp.float32)
                for dxi in range(3):
                    dx = (dxi - 1) * d
                    if dx == 0:
                        sh = rows
                    else:
                        keep = (colc < w_img - dx) if dx > 0 else (colc >= -dx)
                        sh = jnp.where(
                            keep,
                            pltpu.roll(rows32, shift=(m - dx) % m, axis=1),
                            0.0,
                        ).astype(jnp.int8)
                    rhs_ref[pl.ds((dyi * 3 + dxi) * K, K), pl.ds(0, m)] = sh
            acc_i = jax.lax.dot_general(
                w_refs[j][:, :], rhs_ref[pl.ds(0, 9 * K), pl.ds(0, m)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            S_in = S8 if is_q_read else S16
            acc_dt = jnp.int32 if is_q_read else jnp.float32
            p3 = jnp.zeros((3 * cout_pad, m), acc_dt)
            for dyi in range(3):
                row0 = v + (dyi - 1) * d
                rhs = S_in[pl.ds(k0, K), pl.ds(row0 * w_lanes, m)]
                lhs = w_refs[j][pl.ds(dyi * 3 * cout_pad, 3 * cout_pad), :]
                p3 += jax.lax.dot_general(
                    lhs, rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
            acc_i = p3[cout_pad:2 * cout_pad, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (cout_pad, m), 1) % w_img
            for dxi in (0, 2):
                dx = (dxi - 1) * d
                pp = p3[dxi * cout_pad:(dxi + 1) * cout_pad, :]
                keep = (col < w_img - dx) if dx > 0 else (col >= -dx)
                rolled = pltpu.roll(pp, shift=(m - dx) % m, axis=1)
                acc_i = acc_i + jnp.where(keep, rolled,
                                          jnp.zeros((), acc_i.dtype))
        acc = acc_i.astype(jnp.float32) * d_refs[j][:, :1] + b_refs[j][:, :1]
        if spec.act:
            acc = jnp.where(acc >= 0, acc, acc * 0.1)
        if spec.q8:
            q = jnp.clip(jnp.round(acc), -127.0, 127.0).astype(jnp.int8)
            S8[pl.ds(offs[bid], cout_pad), pl.ds(v * w_lanes, m)] = q
            _zero_halo(S8, offs[bid], cout_pad, v)
        elif bid in stored16:
            c16 = _ceil_to(spec.cout, 16)
            S16[pl.ds(offs[bid], c16), pl.ds(v * w_lanes, m)] = (
                acc[:c16].astype(S16.dtype))
            _zero_halo(S16, offs[bid], c16, v)
        if spec.emit and not spec.q8:
            r0 = (halo - v) * w_lanes
            o_idx = out_ids.index(bid)
            out_refs[o_idx][0, :, :] = acc[
                :out_refs[o_idx].shape[1], r0:r0 + th * w_lanes
            ].astype(out_refs[o_idx].dtype)

    # q8 emits ship the raw stripe codes (int8) after the chain completes
    for o_idx, cid in enumerate(out_ids):
        if not specs[cid - 1].q8:
            continue
        out_refs[o_idx][0, :, :] = S8[
            pl.ds(offs[cid], out_refs[o_idx].shape[1]),
            pl.ds(halo * w_lanes, th * w_lanes)]


def conv_group_q8(
    x_q8: jax.Array,
    in_scale,
    weights: Sequence[Sequence[jax.Array]],
    biases: Sequence[jax.Array],
    specs: Sequence[ConvSpec],
    spec_scales: Sequence,
    h: int,
    w: int,
    th: int = 16,
    w_img: int | None = None,
    interpret: bool = False,
    in_stride: int = 1,
) -> list[jax.Array]:
    """W8A8 fused conv chain (serving only).

    x_q8: ONE [B, C0, H*W] int8 input (C0 a multiple of 32), holding
        values ≈ x / in_scale. With ``in_stride=2`` the input is instead
        [B, C0, (2H)*W]: the W-pair channel-packed int8 form of a 2H x 2W
        image (see conv_group), consumed only by ``stride=2`` specs.
    spec_scales[j]: output scale for spec j (required when specs[j].q8;
        ignored otherwise). Emitted q8 outputs return the RAW int8 codes
        (dequantize with the spec's scale, or chain into the next q8
        group); emitted non-q8 outputs come back bf16, already de-scaled.
        Specs are 3x3 convs in p3 mode (contiguous reads, per-dy GEMMs),
        im2col mode, or stride-2 im2col mode; reads live in ONE stripe:
        the int8 stripe (input + q8 spec outputs) or the bf16 side stripe
        (non-q8 spec outputs that later specs read — their GEMM runs bf16;
        e.g. the up-flow phase conv reading the full-precision flow
        head)."""
    specs = tuple(specs)
    if w_img is None:
        w_img = w
    assert w % 128 == 0 and h % th == 0 and w % w_img == 0
    bsz = x_q8.shape[0]
    c0 = int(x_q8.shape[1])
    assert c0 % 32 == 0, "pad the q8 input to a multiple of 32 channels"
    assert x_q8.dtype == jnp.int8
    assert in_stride in (1, 2)

    n_blocks = 1 + len(specs)
    read_by = [set() for _ in range(n_blocks)]
    valid = [0]
    for j, s in enumerate(specs):
        if s.stride == 2:
            assert s.im2col and s.reads == (0,) and in_stride == 2
            valid.append(0)
            read_by[0].add(j)
            continue
        assert s.stride == 1 and _is_contig(s.reads)
        if s.im2col:
            assert len(s.reads) == 1
        for bid in s.reads:
            assert bid < 1 + j
            assert bid > 0 or in_stride == 1, (
                "a stride-2 input is only readable by stride-2 specs")
            read_by[bid].add(j)
        valid.append(max(valid[bid] for bid in s.reads) + s.dilation)
    stripe = ["q"] + ["q" if s.q8 else "b" for s in specs]
    stored16 = frozenset(
        bid for bid in range(1, n_blocks)
        if stripe[bid] == "b" and read_by[bid]
    )
    out_ids = [1 + j for j, s in enumerate(specs) if s.emit]
    halo = max(valid[cid] for cid in out_ids)
    assert halo <= th or h <= th
    R = th + 2 * halo

    # per-stripe offsets: q8 blocks 32-aligned in S8, stored bf16 blocks
    # 16-aligned in S16; other blocks occupy no stripe space. A stride-2
    # input lives in its own window scratch, not the stripe.
    offs = [0] * n_blocks
    width = [0] * n_blocks
    o8 = o16 = 0
    width[0] = c0
    if in_stride == 1:
        o8 = c0
    for bid in range(1, n_blocks):
        if stripe[bid] == "q":
            width[bid] = _ceil32(specs[bid - 1].cout)
            offs[bid] = o8
            o8 += width[bid]
        elif bid in stored16:
            width[bid] = _ceil_to(specs[bid - 1].cout, 16)
            offs[bid] = o16
            o16 += width[bid]
    k_ranges = []
    for j, s in enumerate(specs):
        kinds = {stripe[bid] for bid in s.reads}
        assert len(kinds) == 1, "a GEMM cannot mix int8 and bf16 blocks"
        if stripe[s.reads[0]] == "b":
            assert all(bid in stored16 for bid in s.reads)
            # a q8 spec reading the bf16 stripe would compute with ceil16
            # cout padding while its int8 stripe slot is ceil32-wide
            assert not s.q8, "q8 specs must read the int8 stripe"
        assert s.q8 or s.emit or (1 + j) in stored16, (
            "a non-q8, non-emitted, never-read conv is dead")
        # contiguous same-stripe block ids have contiguous offsets
        k_ranges.append((offs[s.reads[0]],
                         offs[s.reads[-1]] + width[s.reads[-1]]
                         - offs[s.reads[0]]))

    if in_stride == 2:
        hi, p_in = 2 * h, 2 * halo + 1
        assert x_q8.shape[2] == hi * w, (x_q8.shape, hi, w)
        padded = jnp.pad(
            x_q8.reshape(bsz, c0, hi, w),
            ((0, 0), (0, 0), (p_in, p_in), (0, 0))
        ).reshape(bsz, c0, (hi + 2 * p_in) * w)
    else:
        padded = jnp.pad(
            x_q8.reshape(bsz, c0, h, w),
            ((0, 0), (0, 0), (halo, halo), (0, 0))
        ).reshape(bsz, c0, (h + 2 * halo) * w)

    block_scales = [in_scale] + [
        spec_scales[j] if specs[j].q8 else None for j in range(len(specs))
    ]
    dtype16 = jnp.bfloat16
    packed_w, packed_d, packed_b = [], [], []
    for j, s in enumerate(specs):
        is_q_read = stripe[s.reads[0]] == "q"
        cp = _ceil32(s.cout) if is_q_read else _ceil_to(s.cout, 16)
        read_widths = [width[bid] for bid in s.reads]
        s_out = spec_scales[j] if s.q8 else 1.0
        if s.stride == 2:
            wq, wscale = _pack_weights_q8_s2(
                weights[j][0], block_scales[0], width[0], cp)
            packed_w.append(wq)
            packed_d.append((wscale / s_out).reshape(-1, 1))
        elif is_q_read:
            read_scales = [block_scales[bid] for bid in s.reads]
            wq, wscale = fold_quant_weights(weights[j], read_scales, cp,
                                            read_widths)
            if s.im2col:
                packed_w.append(_pack_weights_q8_im2col(wq, cp))
            else:
                packed_w.append(_pack_weights_q8(wq, cp))
            packed_d.append((wscale / s_out).reshape(-1, 1))
        else:
            per = [
                _pack_weights(wr, rw, cp).astype(dtype16)
                for wr, rw in zip(weights[j], read_widths)
            ]
            packed_w.append(jnp.concatenate(per, axis=1))
            packed_d.append(jnp.full((cp, 1), 1.0 / s_out, jnp.float32))
        bias = jnp.pad(biases[j].astype(jnp.float32),
                       (0, cp - biases[j].shape[0]))
        packed_b.append((bias / s_out).reshape(-1, 1))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    im2col_specs = [(j, s) for j, s in enumerate(specs) if s.im2col]
    kern = functools.partial(
        _q8_kernel_body, specs=specs, th=th, halo=halo, w_lanes=w,
        w_img=w_img, valid=tuple(valid), stripe=tuple(stripe),
        offs=tuple(offs), k_ranges=tuple(k_ranges),
        out_ids=tuple(out_ids), has_b16=bool(stored16),
        stored16=stored16, in_stride=in_stride,
        has_rhs=bool(im2col_specs),
    )
    vmem = pltpu.VMEM
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=vmem)] * (3 * len(specs))
    )
    out_ch = [
        _ceil32(specs[cid - 1].cout) if specs[cid - 1].q8
        else _ceil_to(specs[cid - 1].cout, 16)
        for cid in out_ids
    ]
    out_specs = [
        pl.BlockSpec((1, ch, th * w), lambda b, t: (b, 0, t),
                     memory_space=vmem)
        for ch in out_ch
    ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (bsz, ch, h * w),
            jnp.int8 if specs[cid - 1].q8 else jnp.bfloat16)
        for ch, cid in zip(out_ch, out_ids)
    ]
    scratch = [vmem((max(o8, 1), R * w), jnp.int8)]
    if stored16:
        scratch.append(vmem((o16, R * w), dtype16))
    if im2col_specs:
        k_max = max(
            (6 if s.stride == 2 else 9) * width[s.reads[0]]
            for _, s in im2col_specs)
        m_max = max(
            (2 * R if s.stride == 2 else R - 2 * valid[1 + j]) * w
            for j, s in im2col_specs)
        scratch.append(vmem((k_max, m_max), jnp.int8))
    if in_stride == 2:
        scratch.append(vmem((c0, (2 * R + 2) * w), jnp.int8))
    scratch.append(pltpu.SemaphoreType.DMA)

    flops = 0
    for j, s in enumerate(specs):
        cp = _ceil32(s.cout) if stripe[s.reads[0]] == "q" else (
            _ceil_to(s.cout, 16))
        if s.stride == 2:
            flops += 2 * 6 * cp * width[0] * (2 * R * w)
            continue
        mj = (R - 2 * valid[1 + j]) * w
        k = sum(width[bid] for bid in s.reads)
        flops += 2 * 9 * cp * k * mj
    flops *= bsz * (h // th)

    outs = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(np.prod(padded.shape)),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded, *packed_w, *packed_d, *packed_b)
    return list(outs) if isinstance(outs, (list, tuple)) else [outs]


def quantize_q8(x: jax.Array, scale) -> jax.Array:
    """value -> int8 code: round(clip(x / scale)) (symmetric, zero-point 0)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0
    ).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, manual XLA backward
# ---------------------------------------------------------------------------


def _single_conv(x, w, b, dilation, act):
    """One conv in NHWC (XLA), matching the kernel's semantics."""
    pad = dilation
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(x.dtype)
    return jnp.where(y >= 0, y, 0.1 * y) if act else y


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def conv_group_diff(inputs, weights, biases, specs, h, w, th, w_img=None,
                    interpret=False):
    """Differentiable fused conv chain.

    Forward = the Pallas ``conv_group`` kernel (TPU); backward = a manual
    XLA adjoint over the emitted block activations (every block is emitted
    as a residual, so nothing is rematerialized: din flows through
    transposed convs, dW/db through single-conv VJPs — the exact ops XLA's
    own autodiff would emit, fed by the kernel's activations).

    inputs/outputs use the NHWC convention of the flax modules; flat-layout
    conversion happens inside. Returns every conv's output (NHWC, logical
    channels) — callers pick what they need; XLA DCEs unused emissions only
    on the non-diff path, so prefer ``conv_group`` for inference.

    A fully-fused Pallas adjoint kernel (fp32 gradient stripe in VMEM, all
    9 taps of dW and dx as two GEMMs per conv against a tap-rolled gradient
    stack) was built, proven grad-exact on the TPU, and REMOVED after
    measurement (commit 6a52fb2, PERF.md "Pallas chain adjoint"): 27.4 ms
    vs 23.4 ms for this XLA adjoint at the L2 decoder shape — XLA's conv
    VJPs run at ~59% of bf16 peak here and the kernel's window DMA +
    gradient-stripe serialization costs more than the fusion saves.
    """
    outs, _ = _diff_fwd_impl(
        inputs, weights, biases, specs, h, w, th, w_img, interpret)
    return outs


def _diff_fwd_impl(inputs, weights, biases, specs, h, w, th, w_img, interpret):
    emit_all = tuple(
        ConvSpec(reads=s.reads, cout=s.cout, dilation=s.dilation, act=s.act,
                 emit=True, im2col=s.im2col)
        for s in specs
    )
    pack = 1
    if w_img is not None and w_img != w:
        pack = w // w_img
    flat_inputs = []
    for x in inputs:
        xf = nhwc_to_flat(x)
        if pack > 1:
            xf = pack_lanes(xf, h, w_img, pack)
        flat_inputs.append(xf)
    outs_f = conv_group(
        flat_inputs, weights, biases, emit_all, h, w, th=th, w_img=w_img,
        interpret=interpret)
    acts = []
    for o, s in zip(outs_f, emit_all):
        if pack > 1:
            o = unpack_lanes(o, h, w_img, pack)
        acts.append(flat_to_nhwc(o, h, w_img if pack > 1 else w, s.cout))
    return acts, (inputs, weights, acts)


def _diff_fwd(inputs, weights, biases, specs, h, w, th, w_img, interpret):
    acts, res = _diff_fwd_impl(
        inputs, weights, biases, specs, h, w, th, w_img, interpret)
    return acts, res


def _diff_bwd(specs, h, w, th, w_img, interpret, res, gouts):
    inputs, weights, acts = res
    n_inputs = len(inputs)

    def block_val(bid):
        return inputs[bid] if bid < n_inputs else acts[bid - n_inputs]

    # Cotangent accumulation runs in the COMPUTE dtype (bf16 under mixed
    # precision), not forced fp32: each dx_b is a full conv-VJP output
    # (fp32-accumulated inside the MXU) and at most 6 of them sum per
    # block — the same precision XLA autodiff of the bf16 flax module
    # uses, while fp32 buffers here doubled the adjoint's HBM traffic
    # (VERDICT r3 #4a). Bias grads still reduce in fp32 (a 0-d sum over
    # B*H*W elements is where bf16 actually loses bits).
    gblk = {}
    dws = [None] * len(specs)
    dbs = [None] * len(specs)
    for j in reversed(range(len(specs))):
        s = specs[j]
        g = gouts[j]
        if (n_inputs + j) in gblk:
            g = g + gblk.pop(n_inputs + j).astype(g.dtype)
        if s.act:
            cj = acts[j]
            g = g * jnp.where(cj >= 0, 1.0, 0.1).astype(g.dtype)
        dbs[j] = jnp.sum(
            g.astype(jnp.float32), axis=(0, 1, 2)
        ).astype(biases_dtype(weights, j))
        dacc = g.astype(block_val(s.reads[0]).dtype)
        dwj = []
        for r, bid in enumerate(s.reads):
            x_b = block_val(bid)
            _, vjp = jax.vjp(
                lambda xx, ww: _single_conv(xx, ww, jnp.zeros(
                    (s.cout,), x_b.dtype), s.dilation, False),
                x_b, weights[j][r])
            dx_b, dw_br = vjp(dacc)
            dwj.append(dw_br.astype(weights[j][r].dtype))
            prev = gblk.get(bid)
            gblk[bid] = dx_b if prev is None else prev + dx_b
        dws[j] = dwj
    dins = [
        gblk.get(r, jnp.zeros_like(inputs[r])).astype(inputs[r].dtype)
        for r in range(n_inputs)
    ]
    return dins, dws, dbs


def biases_dtype(weights, j):
    return weights[j][0].dtype


conv_group_diff.defvjp(_diff_fwd, _diff_bwd)


def pack_lanes(x: jax.Array, h: int, w: int, pack: int) -> jax.Array:
    """[B, C, H*W] -> [B/pack, C, H*(pack*W)]: ``pack`` batch images laid
    side by side on lanes (row r = [imgA row r | imgB row r | ...]).
    Pass ``w_img=w`` to conv_group so taps stay within each image."""
    b, c, _ = x.shape
    assert b % pack == 0
    x = x.reshape(b // pack, pack, c, h, w)
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b // pack, c, h * pack * w)


def unpack_lanes(x: jax.Array, h: int, w: int, pack: int) -> jax.Array:
    """Inverse of pack_lanes."""
    bp, c, _ = x.shape
    x = x.reshape(bp, c, h, pack, w)
    return jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(bp * pack, c, h * w)


def nhwc_to_flat(x: jax.Array, c_pad: int | None = None) -> jax.Array:
    """[B,H,W,C] -> [B,C_pad,H*W] (channel-major, 16-aligned)."""
    b, h, w, c = x.shape
    cp = _ceil_to(c, 16) if c_pad is None else c_pad
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    return x


def flat_to_nhwc(x: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """[B,C_pad,H*W] -> [B,H,W,c] (drops channel padding)."""
    b = x.shape[0]
    return jnp.transpose(x[:, :c].reshape(b, -1, h, w), (0, 2, 3, 1))
