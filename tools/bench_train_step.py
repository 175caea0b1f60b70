"""Time the unsupervised occ-aware train step on the real TPU.

The relay pipelines async dispatches (PERF.md "methodology note"): N
chained jitted step calls complete in ~(device time + ONE round trip),
so per-step = (wall - rtt) / iters with rtt measured by a no-op fetch.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_step.py \
        --occ_method fb_consistency --occ_resolution quarter

Reference regime being timed: FlowStageModel occ-aware
(/root/reference/models/model.py:366-409) at 448x1024 batch 8.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--occ_method", default="fb_consistency",
                    choices=["range_map", "fb_consistency"])
    ap.add_argument("--occ_resolution", default="quarter",
                    choices=["full", "half", "quarter"])
    ap.add_argument("--photo_resolution", default="full",
                    choices=["full", "half", "quarter"])
    ap.add_argument("--fast_forward", default="both",
                    choices=["both", "backward", "off"])
    ap.add_argument("--q8_backward", action="store_true",
                    help="W8A8 kernels for the no-grad backward decode")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ocflow_tpu import models
    from ocflow_tpu.train import steps
    from ocflow_tpu.train.state import create_train_state
    from ocflow_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    h, w = (448, 1024) if on_tpu else (64, 128)

    hparams = {
        "model": "pwc",
        "photo_weight": 4.0,
        "smooth1_weight": 0.5,
        "smooth2_weight": 0.0,
        "occ_aware": True,
        "occ_method": args.occ_method,
        "occ_resolution": args.occ_resolution,
        "photo_resolution": args.photo_resolution,
        "fast_forward": args.fast_forward,
        "compute_dtype": "bfloat16",
    }
    net = models.FlowNetCV(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (args.batch, h, w, 6)), jnp.float32)
    # lr=0: identical per-step compute (adam still runs all its math), but
    # the loss stays at its step-0 value — a stable sanity check. With a
    # real lr, 10 steps of occ-aware training on RANDOM NOISE can collapse
    # into the all-occluded minimum of the mask-normalized photometric
    # loss (sum(err*vis)/sum(vis) -> 0/eps; fb-consistency has no
    # occlusion penalty), which made the printed loss a noisy function of
    # rounding realizations rather than a check.
    state = create_train_state(
        net, jax.random.PRNGKey(0), x[:1], optax.adam(0.0))
    if args.q8_backward and on_tpu:
        from ocflow_tpu.models.precision import cast_floating
        from ocflow_tpu.models.pwc_fast import calibrate_q8

        vb = {"params": cast_floating(state.params, jnp.bfloat16)}
        hparams["q8_backward"] = jax.jit(calibrate_q8)(
            vb, x.astype(jnp.bfloat16))
    train_step, _ = steps.make_unsupervised_flow_step(hparams)
    batch = {"images": x}

    @jax.jit
    def fetch_baseline(a):
        return jnp.sum(a.astype(jnp.float32))

    # compile + warmup
    state, m = train_step(state, batch)
    float(m["loss"])
    float(fetch_baseline(x))

    t0 = time.perf_counter()
    float(fetch_baseline(x))
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = train_step(state, batch)
    loss = float(m["loss"])
    wall = time.perf_counter() - t0

    ms = (wall - rtt) / args.iters * 1e3
    print(
        f"occ={args.occ_method}/{args.occ_resolution} "
        f"photo={args.photo_resolution} fast={args.fast_forward} "
        f"B={args.batch} {h}x{w}: {ms:.1f} ms/step = "
        f"{args.batch / ms * 1e3:.1f} pairs/s (rtt {rtt*1e3:.1f} ms, "
        f"loss {loss:.4f})"
    )


if __name__ == "__main__":
    main()
