"""Evaluation CLI: flow quality (EPE, KITTI outliers, occlusion F1) or
inpainting quality (PSNR, SSIM, optionally FID) over a dataset.

    python evaluate.py --task flow --model pwc --checkpoint ... \
        --dataset MpiSintelClean --root /data/sintel/training
    python evaluate.py --task inpainting --model simple --checkpoint ... \
        --dataset MpiSintelCleanInpainting --root ...
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser(description="OCFlow-TPU evaluation")
    parser.add_argument("--task", default="flow", choices=["flow", "flow_occ", "inpainting"])
    parser.add_argument("--model", default="pwc")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--dataset", default="SyntheticFlow")
    parser.add_argument("--root", default="")
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument(
        "--dataset_size", type=int, default=None,
        help="sample count for Synthetic* procedural datasets")
    parser.add_argument(
        "--dataset_seed", type=int, default=None,
        help="generation seed for Synthetic* datasets (use a seed different "
        "from training for a held-out evaluation set)")
    parser.add_argument("--with_fid", action="store_true")
    parser.add_argument(
        "--inception_weights",
        default="",
        help="npz from ocflow_tpu.metrics.inception.convert_torch_inception "
        "(the pytorch-fid weights); required for --with_fid",
    )
    parser.add_argument(
        "--allow_random_fid",
        action="store_true",
        help="compute FID on RANDOM inception features (relative comparisons "
        "only; absolute values are meaningless)",
    )
    args = parser.parse_args()

    if args.with_fid and not args.inception_weights and not args.allow_random_fid:
        parser.error(
            "--with_fid needs --inception_weights (convert the pytorch-fid "
            "checkpoint with ocflow_tpu.metrics.inception.convert_torch_inception); "
            "pass --allow_random_fid to knowingly compute a random-feature FID"
        )

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ocflow_tpu import data, metrics, models
    from ocflow_tpu.utils.checkpoint import load_subtree

    kwargs = {}
    if args.dataset.startswith("Synthetic"):
        if args.dataset_size:
            kwargs["size"] = args.dataset_size
        if args.dataset_seed is not None:
            kwargs["seed"] = args.dataset_seed
        if args.image_size:
            kwargs["image_size"] = tuple(args.image_size)
    else:
        kwargs["root"] = args.root
        if args.image_size:
            kwargs["image_size"] = tuple(args.image_size)
    ds = data.build_dataset(args.dataset, **kwargs)
    loader = data.DataLoader(ds, args.batch_size, drop_last=False)

    family = {"flow": "flow", "flow_occ": "flow_occ", "inpainting": "inpainting"}[args.task]
    net = models.build(family, args.model)
    sample = next(iter(loader))

    if args.task == "inpainting":
        init_args = (jnp.asarray(sample["image"][:1]), jnp.asarray(sample["occ"][:1]))
    else:
        init_args = (jnp.asarray(sample["images"][:1]),)
    variables = net.init(jax.random.PRNGKey(0), *init_args)
    if args.checkpoint:
        params = load_subtree(
            args.checkpoint, "params", template={"params": variables["params"]}
        )
        variables = {**variables, "params": params}

    results = {}
    if args.task in ("flow", "flow_occ"):
        @jax.jit
        def predict(x):
            out = net.apply(variables, x)
            return out if isinstance(out, tuple) else (out, None)

        epes, f1s = [], []
        for batch in loader:
            out = predict(jnp.asarray(batch["images"]))
            flow_pred = out[0]
            epes.append(float(metrics.evaluate_flow(jnp.asarray(batch["flow"]), flow_pred)))
            if args.task == "flow_occ" and "occ" in batch:
                f1s.append(float(metrics.occlusion_f1(out[1], jnp.asarray(batch["occ"]))))
        results["epe"] = float(np.mean(epes))
        if f1s:
            results["occlusion_f1"] = float(np.mean(f1s))
    else:
        @jax.jit
        def inpaint(imgs, masks):
            out = net.apply(variables, imgs, masks)
            return out[1] if isinstance(out, tuple) else out

        batches = list(loader)
        results["psnr"] = metrics.calculate_psnr(inpaint, batches)
        results["ssim"] = metrics.calculate_ssim(inpaint, batches)
        if args.with_fid:
            import sys

            if not args.inception_weights:
                print(
                    "WARNING: computing FID with RANDOM inception features "
                    "(--allow_random_fid); the absolute value is meaningless",
                    file=sys.stderr,
                )
            inc_net, inc_vars = metrics.init_inception(
                jax.random.PRNGKey(1), args.inception_weights or None
            )

            @jax.jit
            def extract(imgs):
                from ocflow_tpu.ops.resize import resize_bilinear

                x = resize_bilinear(jnp.asarray(imgs), 299, 299)
                return inc_net.apply(inc_vars, x)[0]

            results["fid"] = metrics.calculate_fid(inpaint, batches, extract)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
