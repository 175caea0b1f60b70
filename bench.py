"""Benchmark: Sintel-resolution (448x1024) flow inference pairs/sec/chip on
the flagship FlowNetCV (PWC) model, bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

The driver-set north star is >=5000 pairs/sec/chip (BASELINE.json); the
reference publishes no numbers, so vs_baseline is value/5000.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ocflow_tpu.models import FlowNetCV
    from ocflow_tpu.models.pwc_fast import fast_apply
    from ocflow_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import os

    on_tpu = jax.default_backend() == "tpu"
    h, w = (448, 1024) if on_tpu else (64, 128)  # CPU fallback for smoke runs
    # B=8 is the measured v5e operating point since the round-3 kernel work
    # (358 vs 344 pairs/s at B=16, 286 at B=32 — HBM working-set pressure;
    # PERF.md "Round-3 late"). BENCH_BATCH overrides for A/B runs.
    batch = int(os.environ.get("BENCH_BATCH", 8)) if on_tpu else 2

    net = FlowNetCV()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, 6)), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.bfloat16))
    variables = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), variables)

    # the fused-Pallas inference path (tested against net.apply in
    # tests/test_pwc_fast.py) needs W/4 % 128 == 0; fall back to the flax
    # forward on the CPU smoke shape. BENCH_Q8=1 routes the L2 dense block
    # through the W8A8 int8 kernel (scales calibrated on the bench batch;
    # accuracy bound in tests/test_pwc_fast.py::test_fast_apply_q8_close_
    # to_bf16 and PERF.md round-4).
    # W8A8 serving is the default on TPU (BENCH_Q8=0 for pure bf16):
    # +11% throughput, accuracy measured on semi-trained weights at
    # +0.65% EPE vs the bf16 path (3.101 -> 3.121 px against GT;
    # PERF.md round-4 "W8A8 accuracy").
    q8 = None
    if on_tpu and os.environ.get("BENCH_Q8", "1") != "0":
        from ocflow_tpu.models.pwc_fast import calibrate_q8

        # calibrate on a HELD-OUT batch (different seed): calibrating on the
        # benched batch itself would flatter the quoted accuracy bound
        xc = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, x.shape), jnp.bfloat16)
        q8 = jax.jit(calibrate_q8)(variables, xc)
    if on_tpu:
        apply_fn = lambda v, a: fast_apply(v, a, q8=q8)  # noqa: E731
    else:
        apply_fn = lambda v, a: net.apply(v, a)  # noqa: E731

    iters = 20 if on_tpu else 2

    # N forwards inside ONE jit call, CHAINED through the scan carry: a
    # loop-invariant body gets hoisted by XLA CSE (one forward instead of N),
    # and the axon relay's block_until_ready is not a true sync — only a
    # value fetch is. Feeding the output back into the input forces N real
    # sequential forwards; relay latency is measured separately and removed.
    @jax.jit
    def forward_n(variables, x):
        def body(carry, _):
            flow, _ = apply_fn(variables, carry)
            delta = jnp.concatenate([flow, flow, flow], axis=-1)
            return carry + delta.astype(carry.dtype) * 1e-6, None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fetch_baseline(x):
        return jnp.sum(x.astype(jnp.float32))

    float(forward_n(variables, x))  # compile + warmup
    float(fetch_baseline(x))

    t0 = time.perf_counter()
    float(fetch_baseline(x))
    overhead = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(forward_n(variables, x))
    dt = max(time.perf_counter() - t0 - overhead, 1e-9)

    pairs_per_sec = batch * iters / dt
    target = 5000.0
    result = {
        "metric": f"flownetcv_{h}x{w}_"
                  f"{'w8a8' if q8 is not None else 'bf16'}_inference",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / target, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
