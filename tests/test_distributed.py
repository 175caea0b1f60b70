"""Multi-host smoke tests: a real 2-process CPU cluster (Gloo collectives)
through ``ocflow_tpu.parallel.distributed`` — the JAX analog of the
reference's never-exercised DDP path (SURVEY.md §2.9)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ocflow_tpu.parallel import distributed

    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ok = distributed.initialize(
        f"localhost:{port}", num_processes=n, process_id=pid
    )
    assert ok, "initialize() returned False on a real cluster"
    assert distributed.local_shard_info() == (pid, n)
    assert distributed.is_main_process() == (pid == 0)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.ones(4) * (pid + 1))
    total = float(gathered.sum())
    assert total == 4.0 * sum(range(1, n + 1)), total
    print(f"worker {pid} ok")
    """
)


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    n, port = 2, _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in ["/root/repo", env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(n), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok" in out


def test_explicit_bad_config_raises():
    """A broken explicit cluster config must raise, not silently degrade to
    single-host (VERDICT round-1 weak #7). An *unreachable* coordinator is a
    fatal C++ abort in jax (client.h), so the catchable path exercised here
    is config validation."""
    code = textwrap.dedent(
        """
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ocflow_tpu.parallel import distributed
        try:
            distributed.initialize(
                "localhost:45678", num_processes=2, process_id=7,
                initialization_timeout=2,
            )
        except RuntimeError as e:
            assert "explicit cluster config" in str(e), e
            print("raised as expected")
        else:
            raise SystemExit("initialize() swallowed an explicit-config failure")
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in ["/root/repo", env.get("PYTHONPATH", "")] if p
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "raised as expected" in out.stdout


_WORKER_DATA = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ocflow_tpu.parallel import distributed

    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    assert distributed.initialize(
        f"localhost:{port}", num_processes=n, process_id=pid)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from ocflow_tpu.data.pipeline import DataLoader
    from ocflow_tpu.data.datasets import Dataset

    class Ints(Dataset):
        def __len__(self):
            return 16
        def __getitem__(self, i):
            return {"x": np.float32([i, 2.0 * i]), "y": np.float32([3.0 * i])}

    # 1) per-host loaders see DISJOINT shards covering the dataset
    loader = DataLoader(Ints(), batch_size=4, shuffle=False,
                        shard_index=pid, num_shards=n)
    seen = sorted(int(b["x"][j, 0]) for b in loader for j in range(4))
    mine = np.zeros(16, np.float32)
    mine[seen] = 1.0
    cover = np.asarray(multihost_utils.process_allgather(jnp.asarray(mine)))
    assert cover.sum(axis=0).tolist() == [1.0] * 16, cover  # disjoint + full

    # 2) data-parallel SGD over the 2-process global mesh == single-process
    # full-batch SGD (computed locally as the reference: data deterministic)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices())
    assert len(devs) == n  # one cpu device per process
    mesh = Mesh(devs, ("data",))
    xs = np.arange(16, dtype=np.float32).reshape(16, 1)
    xs = np.concatenate([xs, 2.0 * xs], 1)
    ys = 3.0 * xs[:, :1]
    w0 = jnp.zeros((2, 1), jnp.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    # reference: plain local full-batch GD
    w_ref = w0
    for _ in range(5):
        w_ref = w_ref - 0.01 * jax.grad(loss)(w_ref, xs, ys)

    xsh = multihost_utils.host_local_array_to_global_array(
        xs[pid * 8:(pid + 1) * 8], mesh, P("data"))
    ysh = multihost_utils.host_local_array_to_global_array(
        ys[pid * 8:(pid + 1) * 8], mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(w, x, y):
        return w - 0.01 * jax.grad(loss)(w, x, y)

    w = jax.device_put(w0, rep)
    for _ in range(5):
        w = step(w, xsh, ysh)
    # w is replicated: the local shard IS the full array
    np.testing.assert_allclose(
        np.asarray(w.addressable_data(0)), np.asarray(w_ref), rtol=1e-6)

    # 3) global_mean_metrics: every host sees the cross-host mean
    g = distributed.global_mean_metrics({"loss": float(pid + 1)})
    assert abs(g["loss"] - (sum(range(1, n + 1)) / n)) < 1e-6, g
    print(f"worker {pid} data ok")
    """
)


@pytest.mark.slow
def test_two_process_sharded_data_and_metrics(tmp_path):
    """VERDICT r4 #7: per-host disjoint data shards, global-mesh training
    equivalence with the single-process run, and allgather'd eval metrics —
    on a real 2-process Gloo cluster."""
    n, port = 2, _free_port()
    script = tmp_path / "worker_data.py"
    script.write_text(_WORKER_DATA)
    env = dict(os.environ)
    # conftest exports --xla_force_host_platform_device_count=8; the workers
    # need ONE local cpu device each so the global mesh is (2,)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in ["/root/repo", env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(n), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} data ok" in out
