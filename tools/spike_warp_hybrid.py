"""Microbench: bounded-correction hybrid block-gather warp vs per-pixel.

Per-2x2-output-block [3,3,4C] packed descriptors (1.83 ms at lvl-1 vs 3.08
per-pixel, PERF.md round-4) are exact only when the block's integer-flow
span <= 2 per axis; real flows violate ~4-7% of blocks. Hybrid: block
gather + a fixed-budget per-pixel correction gather over violating blocks,
scattered over the block result (VERDICT r4 #7).

MEASURED DEAD END (round 5, kept as the reproducible spike): exact within
budget, but 2.2x SLOWER than the per-pixel gather — per-pixel 3.68 ms vs
hybrid 7.99 ms at the lvl-1 shape; the window-select batched matmul +
violator nonzero-sort + correction scatter cost more than the descriptor
reduction saves. Harness note: the scan carry must consume the FULL
channel dim — a sliced consume lets XLA narrow the gather slice and fakes
a 20x win (back-slice trap, PERF.md).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_warp_hybrid.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from ocflow_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 8, 112, 256, 32
BUDGET_FRAC = 0.125

rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
# realistic coherent flow + boundary noise: smooth field + 8% salty pixels
base = rng.standard_normal((B, 7, 16, 2)) * 6.0
flow = jax.image.resize(jnp.asarray(base), (B, H, W, 2), "bilinear")
salt = rng.uniform(size=(B, H, W, 1)) < 0.012
flow = jnp.asarray(
    np.where(salt, rng.standard_normal((B, H, W, 2)) * 5.0, np.asarray(flow)),
    jnp.float32)


def coords(flow):
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = flow[..., 0] + xx[None]
    y = flow[..., 1] + yy[None]
    return x, y


def pack4(img):
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    return jnp.concatenate(
        [p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]],
        axis=-1)  # [H, W, 4C]


def per_pixel(img1, x, y):
    """Current production path: packed [1,1,4C] per-pixel gather."""
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    s = pack4(img1)
    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)
    g = jax.lax.gather(
        s, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1)),
        slice_sizes=(1, 1, 4 * C),
        mode=jax.lax.GatherScatterMode.CLIP).reshape(-1, 2, 2, C)
    two = jnp.arange(2, dtype=jnp.float32)[None]
    fx = x.reshape(-1)[:, None]
    fy = y.reshape(-1)[:, None]
    wx = jnp.maximum(0, 1 - jnp.abs(fx - (x0.reshape(-1)[:, None] + two)))
    wy = jnp.maximum(0, 1 - jnp.abs(fy - (y0.reshape(-1)[:, None] + two)))
    out = jnp.einsum("nyxc,ny,nx->nc", g, wy.astype(g.dtype),
                     wx.astype(g.dtype))
    return out.reshape(H, W, C)


def hybrid(img1, x, y):
    HB, WB = H // 2, W // 2
    NB = HB * WB
    K = int(NB * BUDGET_FRAC)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    s = pack4(img1)

    x0b = x0.reshape(HB, 2, WB, 2).transpose(0, 2, 1, 3).reshape(NB, 2, 2)
    y0b = y0.reshape(HB, 2, WB, 2).transpose(0, 2, 1, 3).reshape(NB, 2, 2)
    base_x = jnp.minimum(x0b.min(axis=(1, 2)), W - 3)
    base_y = jnp.minimum(y0b.min(axis=(1, 2)), H - 3)
    ox = x0b - base_x[:, None, None]  # [NB, 2, 2] in [0..]
    oy = y0b - base_y[:, None, None]
    violate = (ox.max(axis=(1, 2)) > 2) | (oy.max(axis=(1, 2)) > 2)

    # block gather: [NB, 3, 3, 4C]
    starts = jnp.stack([base_y, base_x], axis=-1)
    g = jax.lax.gather(
        s, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(3, 3, 4 * C),
        mode=jax.lax.GatherScatterMode.CLIP)
    # per-pixel select from the window: batched [4, 9] x [9, 4C] matmul
    sel = (jnp.arange(3)[None, None, None] == oy[..., None]).astype(g.dtype)
    selx = (jnp.arange(3)[None, None, None] == ox[..., None]).astype(g.dtype)
    wsel = jnp.einsum("brsp,brsq->brspq", sel, selx).reshape(NB, 4, 9)
    gp = jnp.einsum("bkp,bpc->bkc", wsel, g.reshape(NB, 9, 4 * C))
    gp = gp.reshape(NB, 2, 2, 2, 2, C)  # [block, r, s, ty, tx, C]

    # correction: per-pixel gather for up to K violating blocks
    idx = jnp.nonzero(violate, size=K, fill_value=NB)[0]
    cx0 = jnp.take(x0b, jnp.minimum(idx, NB - 1), axis=0)  # [K, 2, 2]
    cy0 = jnp.take(y0b, jnp.minimum(idx, NB - 1), axis=0)
    cstarts = jnp.stack([cy0.reshape(-1), cx0.reshape(-1)], axis=-1)
    cg = jax.lax.gather(
        s, cstarts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1)),
        slice_sizes=(1, 1, 4 * C),
        mode=jax.lax.GatherScatterMode.CLIP).reshape(K, 2, 2, 2, 2, C)
    gp = gp.at[idx].set(cg, mode="drop")

    # hat weights per pixel, applied to the [2,2] taps
    xb = x.reshape(HB, 2, WB, 2).transpose(0, 2, 1, 3).reshape(NB, 2, 2)
    yb = y.reshape(HB, 2, WB, 2).transpose(0, 2, 1, 3).reshape(NB, 2, 2)
    two = jnp.arange(2, dtype=jnp.float32)
    wx = jnp.maximum(0, 1 - jnp.abs(
        xb[..., None] - (x0b[..., None].astype(jnp.float32) + two)))
    wy = jnp.maximum(0, 1 - jnp.abs(
        yb[..., None] - (y0b[..., None].astype(jnp.float32) + two)))
    out = jnp.einsum("brsyxc,brsy,brsx->brsc", gp, wy.astype(gp.dtype),
                     wx.astype(gp.dtype))
    out = out.reshape(HB, WB, 2, 2, C).transpose(0, 2, 1, 3, 4).reshape(
        H, W, C)
    return out, violate.sum()


@jax.jit
def run_pp(img, flow):
    x, y = coords(flow)
    return jax.vmap(per_pixel)(img, x, y)


@jax.jit
def run_hy(img, flow):
    x, y = coords(flow)
    out, nv = jax.vmap(hybrid)(img, x, y)
    return out, nv


ITERS = 30


def make_scan(warp_fn):
    # bench.py methodology: chain BOTH img and flow through the scan carry
    # (flow must vary or XLA hoists the coordinate/sort work), subtract the
    # relay RTT via a no-op fetch
    @jax.jit
    def run(img, flow):
        def body(carry, _):
            im, fl = carry
            x, y = coords(fl)
            r = jax.vmap(warp_fn)(im, x, y)
            out = r[0] if isinstance(r, tuple) else r
            im = im + (out * 1e-6).astype(im.dtype)  # FULL C: a sliced consume lets XLA narrow the gather (harness trap)
            fl = fl + out[..., :2].astype(jnp.float32) * 1e-3
            return (im, fl), None

        (im, fl), _ = jax.lax.scan(body, (img, flow), None, length=ITERS)
        return jnp.sum(im.astype(jnp.float32)) + jnp.sum(fl)

    return run


@jax.jit
def fetch_baseline(img):
    return jnp.sum(img.astype(jnp.float32))


def timeit(run, img, flow):
    float(run(img, flow))  # compile
    t0 = time.perf_counter()
    float(fetch_baseline(img))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(img, flow))
    return (time.perf_counter() - t0 - rtt) / ITERS * 1e3


# correctness first
o1 = run_pp(img, flow)
o2, nv = run_hy(img, flow)
nvs = np.asarray(nv)
print("violating blocks per img:", nvs, "of", (H // 2) * (W // 2),
      f"budget {int((H // 2) * (W // 2) * BUDGET_FRAC)}", flush=True)
err = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32)).max()
print("maxerr hybrid vs per-pixel:", err, flush=True)

t_pp = timeit(make_scan(per_pixel), img, flow)
t_hy = timeit(make_scan(hybrid), img, flow)
print(f"per-pixel: {t_pp:.3f} ms   hybrid: {t_hy:.3f} ms", flush=True)
