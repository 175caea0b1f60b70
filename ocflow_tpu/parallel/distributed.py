"""Multi-host initialization (the reference's abandoned DDP scaffolding —
commented accelerator='ddp' and global_rank guards, SURVEY.md §2.9 — maps to
jax.distributed + per-host data sharding here).

Covered by a real 2-process CPU cluster test (Gloo collectives,
tests/test_distributed.py) — the JAX analog of a multi-node smoke test.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Initialize multi-host JAX. Returns True if a multi-process runtime is
    active afterwards.

    - With explicit arguments (coordinator/num_processes/process_id) a failed
      init RAISES: a typo'd coordinator must not silently degrade a planned
      multi-host job to single-host.
    - With no arguments, auto-detection is attempted (TPU pods discover the
      topology from the environment) and single-process environments fall
      back cleanly — but the fallback is logged, never silent.
    """
    # Don't probe jax.process_count() here: it initializes the XLA backend,
    # after which jax.distributed.initialize refuses to run. Check the
    # distributed client state directly instead.
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return jax.process_count() > 1  # already initialized
    except (ImportError, AttributeError):  # pragma: no cover - jax internals
        pass
    explicit = any(v is not None for v in (coordinator_address, num_processes, process_id))
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        else:
            jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if explicit:
            raise RuntimeError(
                f"jax.distributed.initialize failed with explicit cluster "
                f"config (coordinator={coordinator_address!r}, "
                f"num_processes={num_processes}, process_id={process_id}): {e}"
            ) from e
        log.info("single-process run (no cluster env detected): %s", e)
        return False
    return jax.process_count() > 1


def is_main_process() -> bool:
    """The rank-0 logging guard (reference global_rank == 0 checks)."""
    return jax.process_index() == 0


def local_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading."""
    return jax.process_index(), jax.process_count()


def global_mean_metrics(metrics: dict) -> dict:
    """Across-process mean of a {name: float} metrics dict.

    Multi-host eval loops average only their local data shard; decisions
    made from those local means (best-checkpoint, early stopping) would
    diverge across hosts — a divergent early stop is a cluster hang. This
    allgathers the per-host means and returns their mean on every host
    (mean-of-means: exact when per-host batch counts match, the case for
    our sharded loaders; reference analog: Lightning's sync_dist reduce).
    Single-process: identity.
    """
    import jax

    if jax.process_count() == 1 or not metrics:
        return dict(metrics)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = jnp.asarray([float(metrics[k]) for k in keys], jnp.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    mean = gathered.mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
