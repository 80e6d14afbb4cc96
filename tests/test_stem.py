"""Frozen stem geometry + torch-import golden parity.

The torch modules built here are minimal test fixtures reconstructing the
published stem architecture (SURVEY §2.3) so the importer's layout mapping and
the fused NHWC compute can be golden-checked end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.stem import (
    init_obj_detector, init_vgg_partial, obj_detector, obj_detector_features,
    stem_features, vgg_partial,
)
from videonavqa_tpu.utils import torch_import as ti

torch = pytest.importorskip("torch")
nn = torch.nn


class _TorchObjDetect(nn.Module):
    """Fixture mirroring ObjDetectCNN's published layer graph (back-to-back convs,
    BN+ReLU+pool per block, pool3 skipped in feature mode)."""

    def __init__(self, num_filters=32, nb_classes=5, tail_hidden=16):
        super().__init__()
        self.bn_input = nn.BatchNorm2d(128)
        f = num_filters
        self.conv11, self.conv12 = nn.Conv2d(128, f, 3, padding=1), nn.Conv2d(f, f, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(f)
        self.conv21, self.conv22 = nn.Conv2d(f, f, 3, padding=1), nn.Conv2d(f, f, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(f)
        self.conv31, self.conv32 = nn.Conv2d(f, f, 3, padding=1), nn.Conv2d(f, f, 3, padding=1)
        self.bn3 = nn.BatchNorm2d(f)
        self.fc_tail1 = nn.Linear(f * 6 * 5, tail_hidden)
        self.bn_tail1 = nn.BatchNorm1d(tail_hidden)
        self.fc_tail2 = nn.Linear(tail_hidden, nb_classes)

    def features(self, x):
        h = self.bn_input(x)
        h = torch.relu(self.bn1(self.conv12(self.conv11(h))))
        h = torch.max_pool2d(h, 2)
        h = torch.relu(self.bn2(self.conv22(self.conv21(h))))
        h = torch.max_pool2d(h, 2)
        h = torch.relu(self.bn3(self.conv32(self.conv31(h))))
        return h

    def forward(self, x):
        h = torch.max_pool2d(self.features(x), 2)
        h = h.reshape(h.shape[0], -1)
        h = torch.relu(self.bn_tail1(self.fc_tail1(h)))
        return self.fc_tail2(h)


def _randomize_bn_stats(m, rng):
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d)):
            mod.running_mean.copy_(torch.from_numpy(rng.randn(mod.num_features).astype(np.float32) * 0.1))
            mod.running_var.copy_(torch.from_numpy(1 + 0.1 * rng.rand(mod.num_features).astype(np.float32)))


def test_obj_detector_import_matches_torch():
    rng = np.random.RandomState(0)
    m = _TorchObjDetect()
    with torch.no_grad():
        _randomize_bn_stats(m, rng)
    m.eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params, state = ti.import_obj_detector(sd)

    x = rng.randn(2, 40, 52, 128).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_feat = m.features(xt).numpy().transpose(0, 2, 3, 1)
        ref_out = m(xt).numpy()

    got_feat = obj_detector_features(params, state, jnp.asarray(x), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_feat), ref_feat, atol=2e-4)
    assert got_feat.shape == (2, 10, 13, 32)

    got_out, _ = obj_detector(params, state, jnp.asarray(x), train=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_out), ref_out, atol=2e-4)


def test_vgg_partial_import_and_geometry():
    rng = np.random.RandomState(1)
    feats = nn.Sequential(
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(), nn.Conv2d(64, 64, 3, padding=1),
        nn.ReLU(), nn.MaxPool2d(2), nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2))
    vgg = nn.Module()
    vgg.features = feats
    vgg.eval()
    sd = {k: v.detach().numpy() for k, v in vgg.state_dict().items()}

    params = ti.import_vgg_partial(sd)
    x = rng.rand(1, 160, 208, 3).astype(np.float32)
    with torch.no_grad():
        ref = feats(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = vgg_partial(params, jnp.asarray(x), dtype=jnp.float32)
    assert got.shape == (1, 40, 52, 128)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_stem_features_full_geometry_and_frozen():
    key = jax.random.PRNGKey(0)
    vgg_params = init_vgg_partial(key)
    det_params, det_state = init_obj_detector(key, num_filters=512)
    video = jax.random.uniform(key, (2, 3, 160, 208, 3))

    feats = stem_features(vgg_params, det_params, det_state, video, dtype=jnp.float32)
    assert feats.shape == (2, 3, 10, 13, 512)
    assert feats.dtype == jnp.float32

    # stop_gradient: d(feats)/d(video-dependent loss) wrt vgg params must be zero
    def loss(p):
        return jnp.sum(stem_features(p, det_params, det_state, video, dtype=jnp.float32))
    g = jax.grad(loss)(vgg_params)
    assert all(float(jnp.abs(v).max()) == 0.0
               for layer in jax.tree_util.tree_leaves(g) for v in [layer])
