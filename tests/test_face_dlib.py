"""Import-exact dlib face net: torch-twin converter validation.

Same method as the Sentibank converter test
(tests/test_sentibank_weights.py): build an INDEPENDENT twin of the net in
torch implementing dlib's layer semantics from the documented rules (conv
padding k//2 only when stride==1, per-channel affine, zero-padded
top-left-aligned residual adds, VALID 2x2 avg-pool skips), feed both the
same dlib-layout random weights through :func:`load_dlib_weights`, and
require the 128-d outputs to agree to float tolerance.
"""

import numpy as np
import pytest

from columbiaimagesearch_tpu.models.face_dlib import (
    BLOCKS,
    DlibExactFaceEmbedder,
    dlib_face_embeddings,
    load_dlib_weights,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _dlib_blobs(seed=0):
    """Random weights in dlib's native layout with trained-like scales."""
    r = np.random.RandomState(seed)
    blobs = {}

    def con(i, cout, cin, k):
        blobs[f"con{i}"] = (0.1 * r.randn(cout, cin, k, k)).astype(
            np.float32)
        blobs[f"affine{i}"] = (
            (1.0 + 0.1 * r.randn(cout)).astype(np.float32),
            (0.05 * r.randn(cout)).astype(np.float32))

    con(0, 32, 3, 7)
    ci = 1
    cin = 32
    for n, down in BLOCKS:
        con(ci, n, cin, 3)
        con(ci + 1, n, n, 3)
        ci += 2
        cin = max(cin, n)
    blobs["fc"] = (0.05 * r.randn(256, 128)).astype(np.float32)
    return blobs


def _torch_add(a, b):
    """dlib tt::add: zero-pad both (top-left aligned) to max dims."""
    C = max(a.shape[1], b.shape[1])
    H = max(a.shape[2], b.shape[2])
    W = max(a.shape[3], b.shape[3])

    def pad_to(t):
        return F.pad(t, (0, W - t.shape[3], 0, H - t.shape[2],
                         0, C - t.shape[1]))

    return pad_to(a) + pad_to(b)


def _torch_forward(blobs, chips):
    """Twin in torch (channels-first), written directly from dlib's rules —
    no shared code with the jax implementation."""
    mean = torch.tensor([122.782, 117.001, 104.298])
    x = (torch.from_numpy(chips) - mean[None, :, None, None]) / 256.0

    def conv(x, i, stride):
        w = torch.from_numpy(blobs[f"con{i}"])
        pad = w.shape[2] // 2 if stride == 1 else 0
        x = F.conv2d(x, w, stride=stride, padding=pad)
        g, b = blobs[f"affine{i}"]
        return x * torch.from_numpy(g)[None, :, None, None] \
            + torch.from_numpy(b)[None, :, None, None]

    x = F.relu(conv(x, 0, 2))
    x = F.max_pool2d(x, 3, stride=2)
    ci = 1
    for n, down in BLOCKS:
        y = F.relu(conv(x, ci, 2 if down else 1))
        y = conv(y, ci + 1, 1)
        skip = F.avg_pool2d(x, 2, stride=2) if down else x
        x = F.relu(_torch_add(skip, y))
        ci += 2
    x = x.mean(dim=(2, 3))
    return (x @ torch.from_numpy(blobs["fc"])).numpy()


def test_torch_twin_reproduces_embedding():
    blobs = _dlib_blobs(0)
    rng = np.random.RandomState(1)
    chips = rng.randint(0, 255, (2, 3, 150, 150)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_forward(blobs, chips)

    params = load_dlib_weights(blobs)
    got = np.asarray(dlib_face_embeddings(
        params, np.transpose(chips, (0, 2, 3, 1))))

    assert got.shape == ref.shape == (2, 128)
    for i in range(len(got)):
        cos = float(np.dot(got[i], ref[i])
                    / (np.linalg.norm(got[i]) * np.linalg.norm(ref[i])))
        assert cos > 0.9999, cos
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_topology_is_29_convs():
    """The reference net is a 29-conv ResNet (dlib anet_type): stem + 14
    blocks x 2."""
    assert 1 + 2 * len(BLOCKS) == 29
    # channel schedule 32 -> 64 -> 128 -> 256 with downs between levels
    downs = [n for n, d in BLOCKS if d]
    assert downs == [32, 64, 128, 256]


def test_embedder_facade_contract():
    """float64 output, bbox plumbing, determinism."""
    emb = DlibExactFaceEmbedder(seed=0)
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (220, 180, 3), dtype=np.uint8)
    bbox = {"left": 30, "top": 40, "right": 150, "bottom": 170}
    f1 = emb.featurize(img, bbox)
    f2 = emb.featurize(img, bbox)
    assert f1.dtype == np.float64 and f1.shape == (128,)
    np.testing.assert_array_equal(f1, f2)
    chips = rng.randint(0, 255, (3, 150, 150, 3)).astype(np.uint8)
    out = emb.featurize_chips(chips)
    assert out.shape == (3, 128) and out.dtype == np.float64
