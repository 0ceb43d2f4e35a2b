"""Numeric golden for the FID InceptionV3 trunk vs a torch replica.

Builds torchvision's inception_v3 feature extractor structure in torch
(exact module/attribute naming, BatchNorm eps=1e-3 eval mode, the
count_include_pad avg-pools, VALID max-pools), randomizes weights AND
BN running statistics, exports the state dict through our importer
(metrics/inception.py), and requires the Flax pool3 features to match.

This pins the three classic FID-parity traps: BN running-stat math,
avg-pool padding semantics, and the conv stride/padding layout — end to
end through the actual importer (reference FID: /root/reference/src/
metrics.py:150-223 via torchvision inception_v3).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

from image_restoration_and_enhancement_tpu.metrics.inception import (  # noqa: E402
    InceptionV3Features,
    import_inception_torch_state,
)

TN = torch.nn


class TBasic(TN.Module):
    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = TN.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = TN.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return TN.functional.relu(self.bn(self.conv(x)))


def _avg3(x):
    return TN.functional.avg_pool2d(x, 3, stride=1, padding=1)


class TIncA(TN.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasic(cin, 64, 1)
        self.branch5x5_1 = TBasic(cin, 48, 1)
        self.branch5x5_2 = TBasic(48, 64, 5, p=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, p=1)
        self.branch_pool = TBasic(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg3(x)),
        ], 1)


class TIncB(TN.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasic(cin, 384, 3, s=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            TN.functional.max_pool2d(x, 3, stride=2),
        ], 1)


class TIncC(TN.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasic(cin, 192, 1)
        self.branch7x7_1 = TBasic(cin, c7, 1)
        self.branch7x7_2 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = TBasic(cin, c7, 1)
        self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = TBasic(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avg3(x))], 1)


class TIncD(TN.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasic(cin, 192, 1)
        self.branch3x3_2 = TBasic(192, 320, 3, s=2)
        self.branch7x7x3_1 = TBasic(cin, 192, 1)
        self.branch7x7x3_2 = TBasic(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            TN.functional.max_pool2d(x, 3, stride=2),
        ], 1)


class TIncE(TN.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TBasic(cin, 320, 1)
        self.branch3x3_1 = TBasic(cin, 384, 1)
        self.branch3x3_2a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = TBasic(cin, 448, 1)
        self.branch3x3dbl_2 = TBasic(448, 384, 3, p=1)
        self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = TBasic(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(_avg3(x))], 1)


class TInception(TN.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
        self.Mixed_5b = TIncA(192, 32)
        self.Mixed_5c = TIncA(256, 64)
        self.Mixed_5d = TIncA(288, 64)
        self.Mixed_6a = TIncB(288)
        self.Mixed_6b = TIncC(768, 128)
        self.Mixed_6c = TIncC(768, 160)
        self.Mixed_6d = TIncC(768, 160)
        self.Mixed_6e = TIncC(768, 192)
        self.Mixed_7a = TIncD(768)
        self.Mixed_7b = TIncE(1280)
        self.Mixed_7c = TIncE(2048)

    def forward(self, x):
        mp = lambda v: TN.functional.max_pool2d(v, 3, stride=2)
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(mp(x)))
        x = mp(x)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean((2, 3))  # pool3 -> [B, 2048]


def test_inception_pool3_features_match_torch_replica():
    torch.manual_seed(0)
    tnet = TInception().eval()
    # randomize BN running stats: the default zeros/ones would vacuously
    # pass even with broken BN math
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, TN.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    params = import_inception_torch_state(
        {k: v.numpy() for k, v in tnet.state_dict().items()})

    rng = np.random.RandomState(0)
    x01 = rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32)
    ours = np.asarray(InceptionV3Features().apply({"params": params}, x01))

    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    xt = (torch.from_numpy(x01.transpose(0, 3, 1, 2)) - torch.from_numpy(mean)) \
        / torch.from_numpy(std)
    with torch.no_grad():
        ref = tnet(xt).numpy()

    assert ours.shape == ref.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)
