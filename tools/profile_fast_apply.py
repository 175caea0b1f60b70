"""Component profile of the fused FlowNetCV serving path on the real TPU.

Times each hot stage of models/pwc_fast.fast_apply in isolation (chained
through a scan carry per the relay-safe methodology in bench.py) and prints
a table plus the residual vs the full forward — the "glue" (coarse levels,
layout ops, normalize at coarse levels) that no micro row captures.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fast_apply.py

PROFILE_Q8=1 additionally profiles the W8A8 serving path (full forward +
the two fine-level int8 kernels) with dummy scales — kernel speed is
scale-independent, so this skips the calibrate_q8 compile.
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, iters=20):
    """Median-of-3 chained-scan timing, relay round trip removed."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fetch(x):
        leaf = x[0] if isinstance(x, tuple) else x
        return jnp.sum(jnp.ravel(jnp.asarray(leaf, jnp.float32))[:1])

    float(fn(*args))
    t_fetch = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fetch(args[-1]))
        t_fetch.append(time.perf_counter() - t0)
    overhead = float(np.median(t_fetch))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - overhead, 0.0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from ocflow_tpu.models import FlowNetCV
    from ocflow_tpu.models import pwc_fast as pf
    from ocflow_tpu.ops.cost_volume import normalize_features
    from ocflow_tpu.ops.pallas.cost_volume_kernel import (
        cost_volume_fused_flat as cv_flat,
    )
    from ocflow_tpu.ops.resize import resize_bilinear
    from ocflow_tpu.ops.warp import warp
    from ocflow_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import os

    q8_mode = os.environ.get("PROFILE_Q8", "0") == "1"
    ITERS = 20
    b, h, w = 8, 448, 1024
    rng = np.random.default_rng(0)

    # dummy W8A8 scales: kernel speed is independent of scale VALUES, so
    # the profile skips the calibrate_q8 replay compile
    if q8_mode:
        s = jnp.float32(0.05)
        q8 = {f"dec{i}": {"in": s, "growth": [s] * 5} for i in range(5)}
    else:
        q8 = None

    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 6)), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.bfloat16))
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), variables)
    p = variables["params"]

    def scan_chain(body):
        """body(carry) -> (new_carry, probe); times ITERS chained calls."""
        def wrapped(carry):
            def step(c, _):
                return body(c)
            out, _ = jax.lax.scan(step, carry, None, length=ITERS)
            return jnp.sum(jnp.ravel(jnp.asarray(
                jax.tree_util.tree_leaves(out)[0], jnp.float32))[:1])
        return jax.jit(wrapped)

    class _Rows(list):  # print incrementally so timeouts keep progress
        def append(self, row):
            super().append(row)
            print(f"{row[0]:<38} {row[1] * 1e3:7.2f}", flush=True)

    rows = _Rows()

    # ---- full forward ----
    def full_body(c):
        flow, _ = pf.fast_apply(variables, c)
        d = jnp.concatenate([flow, flow, flow], axis=-1)
        return c + d.astype(c.dtype) * 1e-6, None
    rows.append(("fast_apply (full)", timed(scan_chain(full_body), x, iters=ITERS)))

    if q8_mode:
        def full_q8_body(c):
            flow, _ = pf.fast_apply(variables, c, q8=q8)
            d = jnp.concatenate([flow, flow, flow], axis=-1)
            return c + d.astype(c.dtype) * 1e-6, None
        rows.append(("fast_apply (full, q8)",
                     timed(scan_chain(full_q8_body), x, iters=ITERS)))

    # ---- encoder (cat batch 16) ----
    xe = jnp.concatenate([x[..., :3], x[..., 3:]], axis=0)

    def enc_body(c):
        feats = pf._encoder_fused(p["SiameseEncoder_0"], c)
        s = jnp.sum(feats[5].astype(jnp.float32)) * 1e-12
        return c + s.astype(c.dtype), None
    rows.append(("encoder_fused x16", timed(scan_chain(enc_body), xe, iters=ITERS)))

    # ---- per-level micro benches at the two fine levels ----
    # f1: 112x256 C=32; f2: 56x128 C=64 (FlowNetCV encoder growth)
    for tag, (hl, wl, c, dec_key, up_keys) in {
        "f1": (112, 256, 32, None, None),          # level handled by _fused_level2
        "f2": (56, 128, 64, "DenseDecoder_3", ("Deconv_6", "Deconv_7")),
    }.items():
        feat1 = jnp.asarray(rng.normal(size=(b, hl, wl, c)), jnp.bfloat16)
        feat2 = jnp.asarray(rng.normal(size=(b, hl, wl, c)), jnp.bfloat16)
        flow0 = jnp.asarray(rng.normal(size=(b, hl, wl, 2)) * 2, jnp.bfloat16)
        upf = jnp.asarray(rng.normal(size=(b, hl, wl, 2)), jnp.bfloat16)

        def warp_body(carry, feat2=feat2):
            fl, s = carry
            wv = warp(feat2, fl, align_corners=False)
            return (fl + jnp.mean(wv.astype(jnp.float32)).astype(fl.dtype) * 1e-9, s), None
        rows.append((f"warp {tag}", timed(scan_chain(warp_body), (flow0, 0.0), iters=ITERS)))

        def norm_body(carry, feat1=feat1, feat2=feat2):
            s = carry
            a, bn = normalize_features([feat1 + s.astype(feat1.dtype), feat2])
            return jnp.mean(a.astype(jnp.float32)) * 1e-9 + jnp.mean(
                bn.astype(jnp.float32)) * 1e-9, None
        rows.append((f"normalize {tag}", timed(scan_chain(norm_body), jnp.float32(0), iters=ITERS)))

        def cv_body(carry, feat1=feat1, feat2=feat2):
            s = carry
            corr = cv_flat(feat1 + s.astype(feat1.dtype), feat2, 4)
            return jnp.mean(corr.astype(jnp.float32)) * 1e-9, None
        rows.append((f"cost_volume_flat {tag}", timed(scan_chain(cv_body), jnp.float32(0), iters=ITERS)))

        nk = (2 * 4 + 1) ** 2  # 81
        c0 = nk + c + 4
        corr_f = jnp.asarray(rng.normal(size=(b, nk, hl * wl)), jnp.bfloat16)

        def assemble(s, feat1=feat1, flow0=flow0, upf=upf, corr_f=corr_f,
                     c0=c0, hl=hl, wl=wl):
            rest = jnp.concatenate(
                [feat1 + s.astype(feat1.dtype), flow0, upf], axis=-1)
            rest_f = pf.nhwc_to_flat(rest, c_pad=rest.shape[-1])
            pieces = [corr_f, rest_f]
            if pf._ceil16(c0) != c0:
                pieces.append(jnp.zeros((b, pf._ceil16(c0) - c0, hl * wl),
                                        corr_f.dtype))
            return jnp.concatenate(pieces, axis=1)

        xf0 = jnp.asarray(
            rng.normal(size=(b, pf._ceil16(c0), hl * wl)), jnp.bfloat16)

        if dec_key is None:
            def run_kernel(xf, hl=hl, wl=wl, c0=c0):
                fl2 = pf._fused_level2(
                    p["DenseDecoder_4"], p["ContextNetwork_0"], None,
                    th=pf._tile_for(hl, None), xf=xf,
                    xf_shape=(b, hl, wl, c0))
                return jnp.mean(fl2.astype(jnp.float32))
        else:
            def run_kernel(xf, hl=hl, wl=wl, c0=c0, dec_key=dec_key,
                           up_keys=up_keys):
                _, _, up_fl, up_ft = pf._fused_dense_decoder(
                    p[dec_key], None, th=pf._tile_for(hl, None),
                    upfeat=p[up_keys[1]], upflow=p[up_keys[0]],
                    xf=xf, xf_shape=(b, hl, wl, c0))
                return (jnp.mean(up_fl.astype(jnp.float32))
                        + jnp.mean(up_ft.astype(jnp.float32)))

        def k_body(carry, xf0=xf0, run_kernel=run_kernel):
            s = carry
            return run_kernel(xf0 + s.astype(xf0.dtype)) * 1e-9, None
        t_kernel = timed(scan_chain(k_body), jnp.float32(0), iters=ITERS)
        rows.append((f"kernel {tag}", t_kernel))

        if q8_mode:
            if dec_key is None:
                def run_kernel_q8(xf, hl=hl, wl=wl, c0=c0):
                    fl2 = pf._fused_level2(
                        p["DenseDecoder_4"], p["ContextNetwork_0"], None,
                        th=pf._tile_for(hl, None), xf=xf,
                        xf_shape=(b, hl, wl, c0), q8=q8["dec4"])
                    return jnp.mean(fl2.astype(jnp.float32))
            else:
                def run_kernel_q8(xf, hl=hl, wl=wl, c0=c0, dec_key=dec_key,
                                  up_keys=up_keys):
                    up_fl, up_ft = pf._fused_dense_decoder_q8(
                        p[dec_key], xf, (b, hl, wl, c0), q8["dec3"],
                        p[up_keys[1]], p[up_keys[0]],
                        th=pf._tile_for(hl, None))
                    return (jnp.mean(up_fl.astype(jnp.float32))
                            + jnp.mean(up_ft.astype(jnp.float32)))

            def kq_body(carry, xf0=xf0, run_kernel_q8=run_kernel_q8):
                sc = carry
                return run_kernel_q8(xf0 + sc.astype(xf0.dtype)) * 1e-9, None
            rows.append((f"kernel {tag} q8",
                         timed(scan_chain(kq_body), jnp.float32(0),
                               iters=ITERS)))

        # assembly timed IN CONTEXT: the Pallas call takes xf as a real
        # buffer operand, so the concat/transpose cannot be DCE'd/fused
        # away the way a pure-reduction consumer could
        def asm_k_body(carry, assemble=assemble, run_kernel=run_kernel):
            s = carry
            return run_kernel(assemble(s)) * 1e-9, None
        t_asm = timed(scan_chain(asm_k_body), jnp.float32(0), iters=ITERS)
        rows.append((f"xf assembly {tag} (asm+kern - kern)",
                     max(t_asm - t_kernel, 0.0)))

    # ---- final resize ----
    fl2 = jnp.asarray(rng.normal(size=(b, 112, 256, 2)), jnp.float32)

    def rs_body(carry):
        f = carry
        out = resize_bilinear(f, 448, 1024, align_corners=True) * 20.0
        return f + jnp.mean(out) * 1e-9, None
    rows.append(("final resize x20", timed(scan_chain(rs_body), fl2, iters=ITERS)))

    total = rows[0][1]
    accounted = sum(v for k, v in rows[1:])
    print(f"\n{'stage':<38} ms")
    for k, v in rows:
        print(f"{k:<38} {v * 1e3:7.2f}")
    print(f"{'sum of micro rows':<38} {accounted * 1e3:7.2f}")
    print(f"{'residual (coarse levels + glue)':<38} {(total - accounted) * 1e3:7.2f}")


if __name__ == "__main__":
    main()
