"""Weight path validation for DeepSentibank.

The reference downloads its pretrained caffemodel and validates features by
recomputing them and comparing to stored values
(reference: featurizer/sbpycaffe_img_featurizer.py:57-67 auto-download;
tests/test_compare_sbcmdlinetf.py:1-40 norm-diff regression). This box has
no egress, so the *weight path* is what is validated instead, end to end:

1. torch round-trip — a torch model with the exact Sentibank topology
   (grouped convs, ceil-mode pools, caffe-LRN) is converted through
   ``load_torch_weights`` and must reproduce torch's fc7 on a real photo.
   This is the proof that dropping the real DeepSentibank weights (from the
   caffemodel, via torch or caffe blobs) reproduces reference features.
2. golden regression — deterministic caffe-layout blobs loaded through
   ``load_caffe_weights`` must reproduce committed fc7 values on the real
   photo (tests/data/golden_fc7.npz), guarding preprocess + architecture +
   converter against regressions, in the reference's own stored-vs-
   recomputed style.
3. npz persistence + auto-load — the featurizer picks up weights from the
   conventional path (the role of the reference's model auto-download).
"""

import os

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.models.preprocess import (
    default_mean_image,
    preprocess_batch,
)
from columbiaimagesearch_tpu.models.sentibank import (
    SentibankFeaturizer,
    load_caffe_weights,
    load_torch_weights,
    load_weights_npz,
    save_weights_npz,
    sentibank_features,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="module")
def hopper_batch():
    img = np.asarray(Image.open(os.path.join(DATA, "grace_hopper.jpg"))
                     .convert("RGB"))
    # two distinct "images": the photo and a flipped copy
    x = preprocess_batch([img, img[:, ::-1]], default_mean_image())
    return np.asarray(x)


def _deterministic_caffe_blobs(seed=0):
    """Caffe-layout blobs with trained-net-like scales (gaussian fillers),
    generated host-side so the values are stable across jax/torch versions."""
    r = np.random.RandomState(seed)

    def conv(out_c, in_c, k):
        return (0.01 * r.randn(out_c, in_c, k, k).astype(np.float32),
                0.1 * np.ones(out_c, np.float32))

    def fc(out_c, in_c):
        return (0.005 * r.randn(out_c, in_c).astype(np.float32),
                0.1 * np.ones(out_c, np.float32))

    return {
        "conv1": conv(96, 3, 11), "conv2": conv(256, 48, 5),
        "conv3": conv(384, 256, 3), "conv4": conv(384, 192, 3),
        "conv5": conv(256, 192, 3),
        "fc6": fc(4096, 9216), "fc7": fc(4096, 4096),
        "fc8-t": fc(2089, 4096),
    }


def test_torch_roundtrip_reproduces_fc7(hopper_batch):
    """Same weights, same input: torch fc7 == JAX fc7 (converter proof)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    class TorchSentibank(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 96, 11, stride=4)
            self.conv2 = tnn.Conv2d(96, 256, 5, padding=2, groups=2)
            self.conv3 = tnn.Conv2d(256, 384, 3, padding=1)
            self.conv4 = tnn.Conv2d(384, 384, 3, padding=1, groups=2)
            self.conv5 = tnn.Conv2d(384, 256, 3, padding=1, groups=2)
            self.fc6 = tnn.Linear(9216, 4096)
            self.fc7 = tnn.Linear(4096, 4096)
            self.fc8 = tnn.Linear(4096, 2089)
            self.pool = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.lrn = tnn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0)

        def forward(self, x):  # x: NCHW
            x = self.lrn(self.pool(torch.relu(self.conv1(x))))
            x = self.lrn(self.pool(torch.relu(self.conv2(x))))
            x = torch.relu(self.conv3(x))
            x = torch.relu(self.conv4(x))
            x = self.pool(torch.relu(self.conv5(x)))
            x = x.flatten(1)  # NCHW flatten == caffe fc6 input order
            x = torch.relu(self.fc6(x))
            return torch.relu(self.fc7(x))

    torch.manual_seed(0)
    net = TorchSentibank().eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(
            hopper_batch.transpose(0, 3, 1, 2).copy())).numpy()

    params = load_torch_weights(net.state_dict())
    got = np.asarray(sentibank_features(params, hopper_batch))

    assert ref.shape == got.shape == (2, 4096)
    assert np.linalg.norm(ref) > 1.0  # non-degenerate activations
    # cosine per image + elementwise tolerance (op-order differences only)
    for i in range(2):
        cos = (ref[i] @ got[i]) / (np.linalg.norm(ref[i])
                                   * np.linalg.norm(got[i]) + 1e-30)
        assert cos > 0.99999, cos
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-4)


def test_golden_fc7_regression(hopper_batch):
    """Converter-loaded deterministic weights reproduce committed features
    on the real photo (the reference's stored-vs-recomputed method)."""
    params = load_caffe_weights(_deterministic_caffe_blobs())
    got = np.asarray(sentibank_features(params, hopper_batch))
    assert np.linalg.norm(got[0]) > 1e-3  # alive through all 8 layers

    golden_path = os.path.join(DATA, "golden_fc7.npz")
    if not os.path.exists(golden_path):  # pragma: no cover - regeneration
        np.savez(golden_path, fc7=got)
        pytest.skip("golden file regenerated; rerun")
    with np.load(golden_path) as z:
        expected = z["fc7"]
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)


def test_npz_persistence_and_autoload(tmp_path, monkeypatch, hopper_batch):
    params = load_caffe_weights(_deterministic_caffe_blobs(seed=1))
    path = str(tmp_path / "sentibank.npz")
    save_weights_npz(params, path)
    loaded = load_weights_npz(path)
    a = np.asarray(sentibank_features(params, hopper_batch))
    b = np.asarray(sentibank_features(loaded, hopper_batch))
    np.testing.assert_array_equal(a, b)

    # the featurizer auto-loads from $SENTIBANK_WEIGHTS
    monkeypatch.setenv("SENTIBANK_WEIGHTS", path)
    feat = SentibankFeaturizer()
    assert feat.pretrained
    c = feat.featurize_batch([np.asarray(
        Image.open(os.path.join(DATA, "grace_hopper.jpg")).convert("RGB"))])
    np.testing.assert_allclose(c[0], a[0], rtol=1e-4, atol=1e-5)

    # without the env or artifact: random init, flagged not-pretrained
    monkeypatch.setenv("SENTIBANK_WEIGHTS", str(tmp_path / "missing.npz"))
    feat2 = SentibankFeaturizer()
    assert not feat2.pretrained
