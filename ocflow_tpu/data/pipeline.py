"""Host input pipeline: seeded splits, threaded prefetching loader, and
device placement.

Replaces the reference's Lightning DataModule (lightning_datamodule.py:8-70):
80/10/10 seeded split, shuffle-train-only, worker-parallel decode — but with
per-host sharding over the data mesh and double-buffered device prefetch
instead of pin_memory.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from ocflow_tpu.data.datasets import Dataset, DATASET_REGISTRY


class Subset(Dataset):
    def __init__(self, dataset: Dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)
        self.size = len(self.indices)
        self.replicates = 1

    def __getitem__(self, index):
        return self.dataset[self.indices[index % self.size]]


class CacheDataset(Dataset):
    """In-memory sample cache around any dataset.

    First access of an index pays the underlying decode/generation cost;
    later epochs are RAM reads. For procedural datasets (SyntheticFlowWarp
    generates ~0.4 s/sample of cv2 work) and small real splits this turns a
    host-bound run into a device-bound one on few-core hosts. Thread-safe
    for the loader's worker pool (worst case a sample is generated twice).
    Budget: one 448x1024 flow pair is ~15 MB — size the dataset to RAM.
    """

    def __init__(self, dataset: Dataset):
        self.dataset = dataset
        self._cache: dict = {}
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        with self._lock:
            sample = self._cache.get(index)
        if sample is None:
            sample = self.dataset[index]
            with self._lock:
                self._cache[index] = sample
        return sample


def random_split(dataset: Dataset, fractions=(0.8, 0.1, 0.1), seed: int = 42):
    """Deterministic split (reference lightning_datamodule.py:50-53 uses
    torch.random_split with seed 42; here a numpy permutation)."""
    n = len(dataset)
    perm = np.random.default_rng(seed).permutation(n)
    sizes = [int(f * n) for f in fractions[:-1]]
    sizes.append(n - sum(sizes))
    out, start = [], 0
    for s in sizes:
        out.append(Subset(dataset, perm[start : start + s]))
        start += s
    return out


class DataLoader:
    """Map-style loader: shuffling, batching, worker-thread decode, drop_last.

    Yields dicts of stacked numpy arrays [B, ...]. Decoding (file IO, cv2) is
    GIL-releasing, so a thread pool gets real parallelism without the fork
    overhead of torch's worker processes.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 6,
        drop_last: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            idx = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            idx = np.arange(n)
        # per-host contiguous shard (multi-process data loading)
        return idx[self.shard_index :: self.num_shards]

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        if self.num_workers <= 0:
            # torch DataLoader semantics: num_workers=0 loads synchronously
            # in the calling thread (useful for debugging/determinism)
            yield from self._iter_batches(idx, nb, map)
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            yield from self._iter_batches(idx, nb, pool.map)

    def _iter_batches(self, idx, nb, map_fn):
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            samples = list(map_fn(self.dataset.__getitem__, chunk))
            yield {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch of an iterator (double buffering).

    Producer exceptions are re-raised in the consumer — a crashing loader
    must fail the training loop loudly, not silently truncate the epoch."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def device_iterator(loader, mesh=None, prefetch_size: int = 2):
    """Iterate batches placed on device; with a mesh, batch dim sharded over
    the 'data' axis (the HBM double-buffer replacing pin_memory).

    Ragged final batches (eval loaders keep them) are padded up to the mesh
    size by repeating the last sample so the batch dim stays divisible —
    mean metrics over such a batch are very slightly biased toward the
    repeated sample, which is fine for monitoring.
    """
    import jax
    import numpy as np

    from ocflow_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None
    n_dev = mesh.devices.size if mesh is not None else 1

    def place(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        b = next(iter(batch.values())).shape[0]
        if b % n_dev:
            pad = n_dev - (b % n_dev)
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    yield from prefetch((place(b) for b in loader), prefetch_size)


def build_dataset(name: str, **kwargs):
    try:
        ctor = DATASET_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown dataset {name!r}; have {sorted(DATASET_REGISTRY)}")
    return ctor(**kwargs)
