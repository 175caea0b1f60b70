"""Multi-host initialization (the reference's abandoned DDP scaffolding —
commented accelerator='ddp' and global_rank guards, SURVEY.md §2.9 — maps to
jax.distributed + per-host data sharding here)."""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None, **kwargs) -> None:
    """Initialize multi-host JAX. On single-host setups this is a no-op; on
    TPU pods jax.distributed discovers the topology from the environment."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address:
            jax.distributed.initialize(coordinator_address, **kwargs)
        else:
            jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process run (no cluster env) — fine
        pass


def is_main_process() -> bool:
    """The rank-0 logging guard (reference global_rank == 0 checks)."""
    return jax.process_index() == 0


def local_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading."""
    return jax.process_index(), jax.process_count()
