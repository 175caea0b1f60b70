"""Golden parity for the FID InceptionV3 + weight converter.

torchvision isn't installed in this environment (and the reference's FID
weights live behind a URL — zero egress), so this test carries a minimal
torch mirror of the pytorch-fid InceptionV3 (pool3 path) whose module names
match the torchvision/pytorch-fid ``state_dict`` layout exactly (reference
inpainting_metrics/fid/inception.py:205-328). Random weights are as good as
trained ones for proving the converter + architecture: identical weights +
identical input must give identical pool3 features, and identical features
give identical FID through the shared Fréchet formula (fid.py:123-174).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ocflow_tpu.metrics import fid as fid_mod  # noqa: E402
from ocflow_tpu.metrics.inception import (  # noqa: E402
    convert_torch_inception,
    init_inception,
)

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (run in CI/round-end)


class TBasicConv(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avg(x, fid=True):
    return tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not fid)


class TInceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(i, pool_features, kernel_size=1)

    def forward(self, x):
        b2 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat(
            [self.branch1x1(x), b2, b3, self.branch_pool(_avg(x))], 1
        )


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasicConv(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b2 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat(
            [self.branch3x3(x), b2, tF.max_pool2d(x, 3, stride=2)], 1
        )


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(i, 192, kernel_size=1)

    def forward(self, x):
        b2 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        b3 = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        return torch.cat(
            [self.branch1x1(x), b2, b3, self.branch_pool(_avg(x))], 1
        )


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasicConv(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b1 = self.branch3x3_2(self.branch3x3_1(x))
        b2 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b1, b2, tF.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(i, 192, kernel_size=1)

    def forward(self, x):
        b2 = self.branch3x3_1(x)
        b2 = torch.cat([self.branch3x3_2a(b2), self.branch3x3_2b(b2)], 1)
        b3 = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        b3 = torch.cat([self.branch3x3dbl_3a(b3), self.branch3x3dbl_3b(b3)], 1)
        if self.pool == "max":
            pooled = tF.max_pool2d(x, 3, stride=1, padding=1)
        else:
            pooled = _avg(x, fid=self.pool == "fid_avg")
        return torch.cat(
            [self.branch1x1(x), b2, b3, self.branch_pool(pooled)], 1
        )


class TFIDInceptionV3(tnn.Module):
    """pytorch-fid InceptionV3 pool3 path, torchvision state_dict names."""

    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, pool="fid_avg")
        self.Mixed_7c = TInceptionE(2048, pool="max")
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    ref = TFIDInceptionV3()
    # warm BN running stats so eval-mode parity is non-trivial
    ref.train()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for _ in range(2):
            ref(torch.rand(2, 3, 299, 299, generator=g) * 2 - 1)
    ref.eval()

    tmp = tmp_path_factory.mktemp("inception")
    sd_path = tmp / "fid_inception.pth"
    torch.save(ref.state_dict(), sd_path)
    npz_path = tmp / "fid_inception.npz"
    convert_torch_inception(str(sd_path), str(npz_path))

    net, variables = init_inception(jax.random.PRNGKey(0), str(npz_path))
    return ref, net, variables


def test_inception_pool3_parity(converted):
    ref, net, variables = converted
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats, t_logits = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_feats, j_logits = net.apply(variables, jnp.asarray(x))
    assert np.abs(np.asarray(j_feats) - t_feats.numpy()).max() < 1e-3
    assert np.abs(np.asarray(j_logits) - t_logits.numpy()).max() < 1e-3


def test_fid_matches_torch_pipeline(converted):
    """Same weights + same images → FID through our machinery matches a
    torch-side computation of the identical formula within 1e-3."""
    ref, net, variables = converted
    rng = np.random.default_rng(1)
    imgs1 = rng.uniform(-1, 1, (8, 299, 299, 3)).astype(np.float32)
    imgs2 = (imgs1 + rng.normal(0, 0.2, imgs1.shape)).clip(-1, 1).astype(np.float32)

    def extract(batch):
        return net.apply(variables, jnp.asarray(batch))[0]

    ours = fid_mod.calculate_fid_given_imgs(imgs1, imgs2, extract, batch_size=4)

    with torch.no_grad():
        a1 = ref(torch.tensor(imgs1.transpose(0, 3, 1, 2)))[0].numpy()
        a2 = ref(torch.tensor(imgs2.transpose(0, 3, 1, 2)))[0].numpy()
    m1, s1 = np.mean(a1, 0), np.cov(a1, rowvar=False)
    m2, s2 = np.mean(a2, 0), np.cov(a2, rowvar=False)
    theirs = fid_mod.frechet_distance(m1, s1, m2, s2)
    assert abs(ours - theirs) < 1e-3 * max(1.0, abs(theirs)), (ours, theirs)


def test_init_inception_refuses_partial_weights(tmp_path):
    np.savez(tmp_path / "partial.npz", **{"params/Dense_0/bias": np.zeros(1008)})
    with pytest.raises(ValueError, match="missing"):
        init_inception(jax.random.PRNGKey(0), str(tmp_path / "partial.npz"))
