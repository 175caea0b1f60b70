"""int8 vs bf16 GEMM throughput spike on the v5e MXU (round-4 re-run).

The round-3 spike concluded int8xint8->int32 runs at bf16 rate (~183
TFLOP/s), contradicting the 394 TOPS int8 spec. VERDICT r3 flagged the
harness as suspect (layout, preferred_element_type, dead-row
back-slicing). This harness removes every known artifact:

- every output row is CONSUMED (full reduction feeds the scan carry, so
  Mosaic cannot back-slice dead rows);
- the GEMM input is perturbed from the carry so the loop body cannot be
  hoisted (relay-safe chained-scan timing per bench.py methodology);
- both an XLA dot_general and a Pallas-kernel formulation are measured,
  each at several tile shapes, fp32-accumulation bf16 alongside as the
  control (known ~183 TFLOP/s at these shapes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_int8.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ocflow_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    ITERS = 400
    M = N = K = 2048
    flops = 2 * M * N * K * ITERS

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    def timed(fn, arg):
        fn(arg)  # compile + warm
        fetch = jax.jit(lambda c: jnp.sum(c).astype(jnp.float32) + 1)
        float(fetch(arg))  # warm the fetch program too
        t_f = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fetch(arg))
            t_f.append(time.perf_counter() - t0)
        rtt = float(np.median(t_f))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(arg))
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - rtt, 1e-9)

    def report(tag, t):
        print(f"{tag:<44} {t * 1e3 / ITERS:8.3f} ms/it "
              f"{flops / t / 1e12:7.1f} TOP/s", flush=True)

    # Chain the GEMM OUTPUT MATRIX into the next iteration's input: a scalar
    # sum carry lets XLA algebraically collapse sum(A@B) into
    # rowsum(A)·colsum(B) and the GEMM vanishes (the round-4 first-cut
    # harness measured an impossible 1.5 PFLOP/s this way). A full-matrix
    # data dependency forces every output element to exist.
    def xla_int8(a0):
        def step(a, _):
            g = jax.lax.dot_general(
                a, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return a8 + (g & 1).astype(jnp.int8), None
        out, _ = jax.lax.scan(step, a0, None, length=ITERS)
        return jnp.sum(out.astype(jnp.int32))

    def xla_bf16(a0):
        def step(a, _):
            g = jax.lax.dot_general(
                a, bbf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return abf + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-12), None
        out, _ = jax.lax.scan(step, a0, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    report("xla bf16 2048^3 (control)", timed(jax.jit(xla_bf16), abf))
    report("xla int8->int32 2048^3", timed(jax.jit(xla_int8), a8))

    # ---- Pallas kernel, full-K blocks ----
    def make_pallas(bm, bn, in_dtype, acc_dtype):
        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)

        return pl.pallas_call(
            kern,
            grid=(M // bm, N // bn),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        )

    for bm, bn in ((512, 512), (256, 1024), (256, 512), (512, 1024)):
        gemm8 = make_pallas(bm, bn, jnp.int8, jnp.int32)
        gemmb = make_pallas(bm, bn, jnp.bfloat16, jnp.float32)

        def pl_int8(a0, gemm8=gemm8):
            def step(a, _):
                g = gemm8(a, b8)
                return a8 + (g & 1).astype(jnp.int8), None
            out, _ = jax.lax.scan(step, a0, None, length=ITERS)
            return jnp.sum(out.astype(jnp.int32))

        def pl_bf16(a0, gemmb=gemmb):
            def step(a, _):
                g = gemmb(a, bbf)
                return abf + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-12), None
            out, _ = jax.lax.scan(step, a0, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        try:
            report(f"pallas bf16 bm={bm} bn={bn}",
                   timed(jax.jit(pl_bf16), abf))
        except Exception as e:  # noqa: BLE001
            print(f"pallas bf16 bm={bm} bn={bn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        try:
            report(f"pallas int8 bm={bm} bn={bn}",
                   timed(jax.jit(pl_int8), a8))
        except Exception as e:  # noqa: BLE001
            print(f"pallas int8 bm={bm} bn={bn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
