"""Inference CLI: run a flow (or joint flow+occ) model over an image folder
and dump flow color visualizations / .flo files.

    python infer.py --model pwc --checkpoint checkpoints/... \
        --input path/to/frames --output out/
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="OCFlow-TPU inference")
    parser.add_argument("--model", default="pwc")
    parser.add_argument("--family", default="flow", choices=["flow", "flow_occ"])
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--input", required=True, help="folder of frames")
    parser.add_argument("--output", default="flow_out")
    parser.add_argument("--iext", default="png")
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--save_flo", action="store_true")
    parser.add_argument(
        "--q8", action="store_true",
        help="W8A8 serving (pwc + fused path only): int8 dense decoders, "
             "calibrated on the first batch — +11%% throughput at ~+1%% "
             "EPE on trained weights (PERF.md)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ocflow_tpu import data, models
    from ocflow_tpu.data.flow_io import write_flo
    from ocflow_tpu.utils import flow_to_image
    from ocflow_tpu.utils.checkpoint import load_subtree

    net = models.build(args.family, args.model)
    ds = data.build_dataset(
        "ImagesFromFolder",
        root=args.input,
        iext=args.iext,
        image_size=tuple(args.image_size) if args.image_size else None,
    )
    sample = jnp.asarray(ds[0]["images"])[None]
    variables = net.init(jax.random.PRNGKey(0), sample)
    if args.checkpoint:
        params = load_subtree(
            args.checkpoint, "params", template={"params": variables["params"]}
        )
        variables = {**variables, "params": params}

    q8 = None
    if args.q8 and args.family == "flow" and args.model == "pwc":
        from ocflow_tpu.models.pwc_fast import calibrate_q8

        q8 = jax.jit(calibrate_q8)(variables, sample)

    @jax.jit
    def predict(x):
        if args.family == "flow" and args.model == "pwc":
            # fused Pallas serving path when shapes/backend allow
            from ocflow_tpu.models.pwc_fast import maybe_fast_apply

            fast = maybe_fast_apply(variables, x, q8=q8)
            if fast is not None:
                return fast[0]
        out = net.apply(variables, x)
        if isinstance(out, tuple):
            return out[0]
        return out

    os.makedirs(args.output, exist_ok=True)
    import imageio.v2 as iio

    for i in range(len(ds)):
        batch = jnp.asarray(ds[i]["images"])[None]
        flow = np.asarray(predict(batch))[0]
        iio.imwrite(
            os.path.join(args.output, f"flow_{i:05d}.png"), flow_to_image(flow)
        )
        if args.save_flo:
            write_flo(os.path.join(args.output, f"flow_{i:05d}.flo"), flow)
    print(f"wrote {len(ds)} flow fields to {args.output}")


if __name__ == "__main__":
    main()
