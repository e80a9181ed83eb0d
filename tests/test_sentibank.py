"""DeepSentibank parity vs a torch CPU oracle built from the same weights.

torch's Conv2d(groups=2) + LocalResponseNorm use exactly Caffe's semantics
(LRN: k + alpha/n * sum window), so transplanting identical weights into both
stacks and comparing fc7 is an independent end-to-end check of the Flax net
and of the Caffe weight converter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from columbiaimagesearch_tpu.models.preprocess import (  # noqa: E402
    CROP,
    OFF,
    default_mean_image,
    preprocess_batch,
    preprocess_device,
    resize_host,
)
from columbiaimagesearch_tpu.models.sentibank import (  # noqa: E402
    NUM_ANP_CLASSES,
    SentibankFeaturizer,
    load_caffe_weights,
    sentibank_features,
    sentibank_logits,
)


def make_caffe_blobs(rng):
    """Random weights in Caffe blob layout (out, in/g, kh, kw), small scale
    so activations stay in a sane range through 8 layers."""
    def conv(out_c, in_c, k):
        return (rng.randn(out_c, in_c, k, k).astype(np.float32) * 0.05,
                rng.randn(out_c).astype(np.float32) * 0.05)

    def fc(out_c, in_c):
        return (rng.randn(out_c, in_c).astype(np.float32) * 0.01,
                rng.randn(out_c).astype(np.float32) * 0.01)

    return {
        "conv1": conv(96, 3, 11),
        "conv2": conv(256, 48, 5),     # groups 2
        "conv3": conv(384, 256, 3),
        "conv4": conv(384, 192, 3),    # groups 2
        "conv5": conv(256, 192, 3),    # groups 2
        "fc6": fc(4096, 256 * 6 * 6),
        "fc7": fc(4096, 4096),
        "fc8-t": fc(NUM_ANP_CLASSES, 4096),
    }


class TorchSentibank(torch.nn.Module):
    def __init__(self, blobs):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 96, 11, stride=4)
        self.conv2 = torch.nn.Conv2d(96, 256, 5, padding=2, groups=2)
        self.conv3 = torch.nn.Conv2d(256, 384, 3, padding=1)
        self.conv4 = torch.nn.Conv2d(384, 384, 3, padding=1, groups=2)
        self.conv5 = torch.nn.Conv2d(384, 256, 3, padding=1, groups=2)
        self.fc6 = torch.nn.Linear(256 * 6 * 6, 4096)
        self.fc7 = torch.nn.Linear(4096, 4096)
        self.fc8 = torch.nn.Linear(4096, NUM_ANP_CLASSES)
        self.lrn = torch.nn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0)
        self.pool = torch.nn.MaxPool2d(3, 2, ceil_mode=True)
        names = ["conv1", "conv2", "conv3", "conv4", "conv5", "fc6", "fc7",
                 "fc8-t"]
        mods = [self.conv1, self.conv2, self.conv3, self.conv4, self.conv5,
                self.fc6, self.fc7, self.fc8]
        with torch.no_grad():
            for n, m in zip(names, mods):
                w, b = blobs[n]
                m.weight.copy_(torch.from_numpy(w))
                m.bias.copy_(torch.from_numpy(b))

    def forward(self, x):  # x: NCHW
        r = torch.relu
        x = self.lrn(self.pool(r(self.conv1(x))))
        x = self.lrn(self.pool(r(self.conv2(x))))
        x = r(self.conv3(x))
        x = r(self.conv4(x))
        x = self.pool(r(self.conv5(x)))
        x = torch.flatten(x, 1)  # NCHW flatten = caffe order
        x = r(self.fc6(x))
        fc7 = r(self.fc7(x))
        return self.fc8(fc7), fc7


@pytest.fixture(scope="module")
def nets():
    rng = np.random.RandomState(0)
    blobs = make_caffe_blobs(rng)
    params = load_caffe_weights(blobs)
    tnet = TorchSentibank(blobs).eval()
    x = rng.rand(2, CROP, CROP, 3).astype(np.float32) * 50.0
    return params, tnet, x


def test_fc7_and_logits_match_torch_oracle(nets):
    params, tnet, x = nets
    feats = np.asarray(sentibank_features(params, x))
    logits = np.asarray(sentibank_logits(params, x))
    with torch.no_grad():
        tl, tf = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(feats, tf.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(logits, tl.numpy(), rtol=2e-3, atol=2e-3)
    assert feats.shape == (2, 4096)
    assert (feats >= 0).all()  # post-ReLU fc7


def test_preprocess_semantics():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
    mean = default_mean_image()
    out = np.asarray(preprocess_device(img[None], mean))[0]
    # Manual: crop, BGR, subtract.
    want = img[OFF:OFF + CROP, OFF:OFF + CROP, ::-1].astype(np.float32) - mean
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_resize_host_shapes_and_modes():
    rng = np.random.RandomState(2)
    assert resize_host(rng.randint(0, 255, (123, 77, 3), dtype=np.uint8)).shape \
        == (256, 256, 3)
    assert resize_host(rng.randint(0, 255, (50, 60), dtype=np.uint8)).shape \
        == (256, 256, 3)  # grayscale fix
    assert resize_host(rng.randint(0, 255, (50, 60, 4), dtype=np.uint8)).shape \
        == (256, 256, 3)  # RGBA fix


def test_featurizer_facade():
    rng = np.random.RandomState(3)
    f = SentibankFeaturizer(seed=0)
    imgs = [rng.randint(0, 255, (100 + i * 13, 80, 3), dtype=np.uint8)
            for i in range(3)]
    feats = f.featurize_batch(imgs)
    assert feats.shape == (3, 4096)
    single = f.featurize(imgs[0])
    np.testing.assert_allclose(single, feats[0], rtol=1e-4, atol=1e-4)


def test_load_torch_weights_matches(nets):
    from columbiaimagesearch_tpu.models.sentibank import (
        load_torch_weights,
        sentibank_features,
    )

    params, tnet, x = nets
    params2 = load_torch_weights(tnet.state_dict())
    f1 = np.asarray(sentibank_features(params, x))
    f2 = np.asarray(sentibank_features(params2, x))
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-5)


def test_featurize_buffers_pipelined_matches_single_wave():
    """Batches past PIPELINE_CHUNK take the decode-ahead double-buffered
    path; features and per-image status must match the one-wave path
    chunk-for-chunk, including a decode failure mid-batch."""
    import io

    from PIL import Image

    rng = np.random.RandomState(4)
    f = SentibankFeaturizer(seed=0)
    bufs = []
    for i in range(7):
        img = rng.randint(0, 255, (60, 50, 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="JPEG", quality=90)
        bufs.append(b.getvalue())
    bufs[4] = b"not an image"
    bufs = bufs * 2  # 14 buffers, failures at 4 and 11
    old_chunk = SentibankFeaturizer.PIPELINE_CHUNK
    SentibankFeaturizer.PIPELINE_CHUNK = 3  # force >1 pipeline chunks
    try:
        feats_p, status_p = f.featurize_buffers(bufs)
    finally:
        SentibankFeaturizer.PIPELINE_CHUNK = old_chunk
    feats_1, status_1 = f.featurize_buffers(bufs)
    assert [int(s) for s in status_p] == [int(s) for s in status_1]
    assert sum(1 for s in status_p if int(s) != 0) == 2
    np.testing.assert_allclose(np.asarray(feats_p), np.asarray(feats_1),
                               rtol=2e-3, atol=2e-3)
