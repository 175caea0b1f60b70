"""Data layer tests: flow IO round trips, synthetic occlusions, datasets on a
generated mini-Sintel tree, loader/split determinism."""

import os

import numpy as np
import pytest

from ocflow_tpu import data


def test_flo_round_trip(tmp_path, rng):
    flow = rng.standard_normal((17, 23, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    data.write_flo(p, flow)
    back = data.read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_kitti_png_round_trip(tmp_path, rng):
    flow = (rng.standard_normal((16, 16, 2)) * 10).astype(np.float32)
    p = str(tmp_path / "x.png")
    data.write_kitti_png_flow(p, flow)
    back = data.read_kitti_png_flow(p)
    np.testing.assert_allclose(back[..., :2], flow, atol=1 / 64)


def test_static_occlusion(rng):
    m = data.static_random_occlusion(rng, 64, 64, ratio=0.5)
    assert m.shape == (64, 64, 1)
    assert m.sum() == 32 * 32


def test_free_form_occlusion(rng):
    m = data.free_form_occlusion(rng, 64, 64, ratio=0.3)
    assert m.shape == (64, 64, 1)
    assert m.sum() / m.size >= 0.9 * 0.3
    assert set(np.unique(m)) <= {0.0, 1.0}


def make_mini_sintel(root, n_scenes=2, n_frames=3, h=100, w=150):
    """Generate a Sintel-layout tree with random pngs + flo files."""
    import imageio.v2 as iio

    from ocflow_tpu.data.flow_io import write_flo

    rng = np.random.default_rng(0)
    for s in range(n_scenes):
        scene = f"scene_{s}"
        for sub in ("clean", "flow", "occlusions"):
            os.makedirs(os.path.join(root, sub, scene), exist_ok=True)
        for f in range(1, n_frames + 1):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            iio.imwrite(os.path.join(root, "clean", scene, f"frame_{f:04d}.png"), img)
            if f < n_frames:
                write_flo(
                    os.path.join(root, "flow", scene, f"frame_{f:04d}.flo"),
                    rng.standard_normal((h, w, 2)).astype(np.float32),
                )
                occ = (rng.uniform(size=(h, w)) > 0.7).astype(np.uint8) * 255
                iio.imwrite(
                    os.path.join(root, "occlusions", scene, f"frame_{f:04d}.png"), occ
                )


def test_mpi_sintel_datasets(tmp_path):
    root = str(tmp_path)
    make_mini_sintel(root)
    ds = data.build_dataset("MpiSintelClean", root=root)
    assert len(ds) == 4  # 2 scenes x 2 pairs
    s = ds[0]
    assert s["images"].shape == (64, 128, 6)  # cropped to /64
    assert s["flow"].shape == (64, 128, 2)
    assert s["images"].min() >= -1.0 and s["images"].max() <= 1.0

    ds2 = data.build_dataset("MpiSintelFlowOccClean", root=root, image_size=(64, 64))
    s2 = ds2[0]
    assert s2["images"].shape == (64, 64, 6)
    assert s2["flow"].shape == (64, 64, 2)
    assert s2["occ"].shape == (64, 64, 1)
    assert set(np.unique(s2["occ"])) <= {0.0, 1.0}

    ds3 = data.build_dataset("MpiSintelCleanInpainting", root=root, occlusion_ratio=0.3)
    s3 = ds3[0]
    assert s3["image"].shape == (64, 128, 3)
    assert s3["occluded"].shape == (64, 128, 3)
    # occluded pixels are zeroed
    assert np.all(s3["occluded"][s3["occ"][..., 0] > 0] == 0)


def test_flying_chairs2(tmp_path):
    import imageio.v2 as iio

    from ocflow_tpu.data.flow_io import write_flo

    rng = np.random.default_rng(0)
    for i in range(4):
        for k in (1, 2):
            iio.imwrite(
                str(tmp_path / f"{i:05d}-img_{k}.png"),
                rng.integers(0, 255, (64, 64, 3), np.uint8),
            )
        write_flo(
            str(tmp_path / f"{i:05d}-flow_01.flo"),
            rng.standard_normal((64, 64, 2)).astype(np.float32),
        )
        iio.imwrite(
            str(tmp_path / f"{i:05d}-occ_01.png"),
            (rng.uniform(size=(64, 64)) > 0.5).astype(np.uint8) * 255,
        )
    ds = data.build_dataset("FlyingChairs2", root=str(tmp_path))
    assert len(ds) == 4
    s = ds[0]
    assert s["images"].shape == (64, 64, 6)
    assert s["occ"].shape == (64, 64, 1)


def test_kitti2015_dataset(tmp_path):
    import imageio.v2 as iio

    from ocflow_tpu.data.flow_io import write_kitti_png_flow

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "image_2")
    os.makedirs(tmp_path / "flow_occ")
    # KITTI-style: images slightly larger than a /64 multiple (e.g. 375x1242)
    h, w = 72, 136
    gt = {}
    for i in range(3):
        for suffix in ("10", "11"):
            iio.imwrite(
                str(tmp_path / "image_2" / f"{i:06d}_{suffix}.png"),
                rng.integers(0, 255, (h, w, 3), np.uint8),
            )
        flow = rng.uniform(-30, 30, (h, w, 2)).astype(np.float32)
        write_kitti_png_flow(str(tmp_path / "flow_occ" / f"{i:06d}_10.png"), flow)
        gt[i] = flow

    ds = data.build_dataset("KITTI2015", root=str(tmp_path))
    assert len(ds) == 3
    s = ds[0]
    assert s["images"].shape == (64, 128, 6)  # center-cropped to /64
    assert s["flow"].shape == (64, 128, 2)
    assert s["valid"].shape == (64, 128, 1)
    assert s["valid"].min() >= 0 and s["valid"].max() == 1.0
    # 16-bit round trip: 1/64 px quantization
    crop = gt[0][4 : 4 + 64, 4 : 4 + 128]
    err = np.abs(s["flow"] - crop * s["valid"]).max()
    assert err < 1 / 32, err

    ds_small = data.build_dataset("KITTI2015", root=str(tmp_path), image_size=(32, 64))
    s2 = ds_small[1]
    assert s2["flow"].shape == (32, 64, 2)
    assert set(np.unique(s2["valid"])) <= {0.0, 1.0}


def test_split_and_loader_determinism():
    ds = data.SyntheticFlow(size=20, image_size=(32, 32))
    train, val, test = data.random_split(ds, (0.8, 0.1, 0.1), seed=42)
    assert len(train) == 16 and len(val) == 2 and len(test) == 2
    # no index overlap
    all_idx = train.indices + val.indices + test.indices
    assert sorted(all_idx) == list(range(20))

    loader = data.DataLoader(train, batch_size=4, shuffle=True, seed=1)
    b1 = [b["images"].sum() for b in loader]
    loader2 = data.DataLoader(train, batch_size=4, shuffle=True, seed=1)
    b2 = [b["images"].sum() for b in loader2]
    assert b1 == b2  # same seed+epoch => same order
    loader2.set_epoch(1)
    b3 = [b["images"].sum() for b in loader2]
    assert b1 != b3  # reshuffles across epochs


def test_loader_sharding():
    ds = data.SyntheticFlow(size=16, image_size=(16, 16))
    shard0 = data.DataLoader(ds, batch_size=2, shard_index=0, num_shards=2)
    shard1 = data.DataLoader(ds, batch_size=2, shard_index=1, num_shards=2)
    n0 = sum(1 for _ in shard0)
    n1 = sum(1 for _ in shard1)
    assert n0 == n1 == 4


def test_prefetch_order():
    out = list(data.prefetch(iter(range(10)), size=3))
    assert out == list(range(10))


def test_prefetch_propagates_producer_exception():
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = data.prefetch(boom(), size=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_loader_num_workers_zero_synchronous():
    ds = data.SyntheticFlow(size=8, image_size=(16, 16))
    loader = data.DataLoader(ds, batch_size=4, num_workers=0)
    batches = list(loader)
    assert len(batches) == 2 and batches[0]["images"].shape == (4, 16, 16, 6)


def test_cache_dataset_counts_and_values():
    class Counting(data.SyntheticFlow):
        calls = 0

        def __getitem__(self, index):
            Counting.calls += 1
            return super().__getitem__(index)

    ds = data.CacheDataset(Counting(size=4, image_size=(16, 16)))
    import numpy as np

    a = ds[1]
    b = ds[1]
    assert Counting.calls == 1  # second access served from cache
    assert all(np.array_equal(a[k], b[k]) for k in a)
    assert len(ds) == 4


def test_synthetic_inpainting_dataset():
    """SyntheticInpainting fulfils the _InpaintingDataset contract:
    deterministic per (seed, index), occluded = image * (1 - occ), mask
    ratio near the requested value."""
    ds = data.SyntheticInpainting(size=4, image_size=(64, 96),
                                  occlusion_ratio=0.4, seed=1)
    a, b = ds[1], ds[1]
    assert set(a) == {"occluded", "image", "occ"}
    assert a["image"].shape == (64, 96, 3) and a["occ"].shape == (64, 96, 1)
    assert np.array_equal(a["image"], b["image"])
    np.testing.assert_allclose(
        a["occluded"], a["image"] * (1 - a["occ"]), atol=1e-6)
    ratio = a["occ"].mean()
    assert 0.05 < ratio < 0.8, ratio
    assert not np.array_equal(ds[0]["image"], ds[1]["image"])
    assert np.abs(a["image"]).max() <= 1.0


def test_device_cache_loader_matches_dataloader():
    """DeviceCacheLoader yields the same batches (same seed/epoch order) as
    DataLoader, as committed device arrays, including the ragged eval
    batch; float entries are cast to cache_dtype."""
    import jax
    import jax.numpy as jnp

    ds = data.SyntheticFlow(size=10, image_size=(16, 16))
    host = data.DataLoader(ds, 4, shuffle=True, seed=3, num_workers=0,
                           drop_last=True)
    dev = data.DeviceCacheLoader(ds, 4, shuffle=True, seed=3, num_workers=0,
                                 drop_last=True, cache_dtype="float32")
    host.set_epoch(2)
    dev.set_epoch(2)
    hb = list(host)
    db = list(dev)
    assert len(hb) == len(db) == 2
    for h, d in zip(hb, db):
        for k in h:
            assert isinstance(d[k], jax.Array)
            np.testing.assert_allclose(np.asarray(d[k]), h[k], atol=1e-6)

    # bf16 cache + ragged eval batch. Served batches are fp32 (the round-4
    # worker-fault workaround, data/pipeline.py) but their VALUES carry the
    # bf16 storage quantization of the HBM cache.
    dev16 = data.DeviceCacheLoader(ds, 4, shuffle=False, num_workers=0,
                                   drop_last=False)
    batches = list(dev16)
    assert len(batches) == 3 and batches[-1]["images"].shape[0] == 2
    assert batches[0]["images"].dtype == jnp.float32
    got = np.asarray(batches[0]["images"])
    np.testing.assert_array_equal(
        got, np.asarray(got, np.float32).astype(jnp.bfloat16).astype(np.float32))
    # metric/supervision targets are never quantized
    assert batches[0]["flow"].dtype == jnp.float32
