"""EPE-vs-GT accuracy A/B of the W8A8 serving variants on trained weights.

Loads the 40-epoch checkpoint from /tmp/epe_run, runs the fused serving
forward on the test split (bf16 / q8-decoders / +ctx / +enc) and prints
mean EPE against the synthetic GT flow.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ocflow_tpu.models import FlowNetCV
from ocflow_tpu.models.pwc_fast import fast_apply, calibrate_q8
from ocflow_tpu.train import config as config_lib
from ocflow_tpu.train import loop
from ocflow_tpu.utils.checkpoint import CheckpointManager
from ocflow_tpu.utils import enable_compilation_cache

enable_compilation_cache()

cfg = config_lib.load_config("/tmp/epe_run/cfg.yaml")
cfg.device_cache = False
train_loader, val_loader, test_loader = loop.make_loaders(cfg)

mgr = CheckpointManager("/tmp/epe_run/ckpt")
restored = mgr.restore()
params = restored["params"]
params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
variables = {"params": params}

batches = [b for b in test_loader]
print(f"{len(batches)} test batches", flush=True)
xb = jnp.asarray(batches[0]["images"], jnp.bfloat16)

q8_full = jax.jit(lambda v, x: calibrate_q8(v, x, encoder=True, ctx=True))(
    variables, xb)
q8_dec = {k: v for k, v in q8_full.items() if k not in ("enc", "ctx")}
q8_ctx = {k: v for k, v in q8_full.items() if k != "enc"}

arms = [("bf16", None), ("q8_dec", q8_dec), ("q8_dec+ctx", q8_ctx),
        ("q8_all", q8_full)]

for name, q8 in arms:
    fn = jax.jit(lambda v, x: fast_apply(v, x, q8=q8)[0])
    epes = []
    for b in batches:
        x = jnp.asarray(b["images"], jnp.bfloat16)
        flow = np.asarray(fn(variables, x).astype(jnp.float32))
        gt = np.asarray(b["flow"])
        epes.append(np.linalg.norm(flow - gt, axis=-1).mean())
    print(f"{name}: EPE {np.mean(epes):.4f}", flush=True)
