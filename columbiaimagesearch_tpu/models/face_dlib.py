"""Exact-topology dlib face_recognition_model_v1 variant (folded-BN).

The generic embedder in ``models/face.py`` uses GroupNorm and 1x1-conv
projections — training-friendly, but structurally unable to load real dlib
weights. This module is the *import-exact* variant PARITY.md used to name
as the gap: it reproduces dlib's 29-conv metric ResNet layer for layer
(reference contract: cufacesearch/featurizer/dlib_featurizer.py:50-105,
net definition dlib/dnn examples ``anet_type``):

- **affine layers** (per-channel scale+shift — the inference-time folded
  form of dlib's batch norm) in place of GroupNorm;
- **dlib convolution padding rule**: pad = k//2 when stride == 1, pad = 0
  when strided (so the 7x7/2 stem and every downsampling 3x3/2 conv run
  VALID);
- **dlib residual adds**: tensors of different shapes are added as though
  zero-padded (top-left aligned) to the elementwise max of their dims —
  this is how dlib grows channels (32->64->128->256) without projection
  convs, and how the 8->3 vs 8->4 spatial mismatch after the third
  down-block resolves;
- identity skips, with 2x2/2 VALID average pooling on down blocks;
- global average pool then a bias-free fc to 128-d.

Weights load from a dict in dlib's native tensor layout via
:func:`load_dlib_weights` ([out, in, kh, kw] convs, [ch] affine pairs,
[in, out] fc). The conversion math is validated end-to-end against an
independent torch twin (tests/test_face_dlib.py, the same method as the
Sentibank converter, tests/test_sentibank_weights.py). Parsing dlib's
``.dat`` serialization container is intentionally out of scope — the
pretrained file is unreachable in this environment (zero egress), and the
numerical import path is the part that must be right when it arrives.
"""

import jax
import jax.numpy as jnp
import numpy as np

CHIP_SIZE = 150
EMBED_DIM = 128
RGB_MEAN = (122.782, 117.001, 104.298)

#: (channels, is_down_block) for the 14 residual blocks, forward order:
#: alevel4 (3x ares32), alevel3 (ares_down32 + 3x ares64),
#: alevel2 (ares_down64 + 2x ares128), alevel1 (ares_down128 + 2x ares256),
#: alevel0 (ares_down256). 14 blocks x 2 convs + stem = 29 convs.
BLOCKS = ((32, False), (32, False), (32, False),
          (32, True), (64, False), (64, False), (64, False),
          (64, True), (128, False), (128, False),
          (128, True), (256, False), (256, False),
          (256, True))


def _conv(x, w, stride):
    """dlib conv: padding k//2 when stride==1, VALID when strided."""
    k = w.shape[0]
    pad = ((k // 2, k // 2),) * 2 if stride == 1 else ((0, 0), (0, 0))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _affine(x, g, b):
    return x * g[None, None, None, :] + b[None, None, None, :]


def _dlib_add(a, b):
    """Add as though zero-padded (top-left aligned) to max dims — dlib's
    tt::add semantics for mismatched tensors."""
    H = max(a.shape[1], b.shape[1])
    W = max(a.shape[2], b.shape[2])
    C = max(a.shape[3], b.shape[3])

    def pad_to(t):
        return jnp.pad(t, ((0, 0), (0, H - t.shape[1]),
                           (0, W - t.shape[2]), (0, C - t.shape[3])))

    return pad_to(a) + pad_to(b)


def _block(x, p, down):
    """dlib block<N>: affine(con 3x3/1(relu(affine(con 3x3/stride(x)))));
    residual: relu(skip (+) block) with an avg-pooled skip on down blocks."""
    stride = 2 if down else 1
    y = _conv(x, p["w1"], stride)
    y = _affine(y, p["g1"], p["b1"])
    y = jax.nn.relu(y)
    y = _conv(y, p["w2"], 1)
    y = _affine(y, p["g2"], p["b2"])
    if down:
        skip = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    else:
        skip = x
    return jax.nn.relu(_dlib_add(skip, y))


@jax.jit
def dlib_face_embeddings(params, chips):
    """[N, 150, 150, 3] float32 (0..255 RGB) -> [N, 128] float32.

    Input scaling matches dlib's input_rgb_image: (x - mean) / 256.
    """
    mean = jnp.asarray(RGB_MEAN, dtype=jnp.float32)
    x = (chips - mean[None, None, None, :]) / 256.0
    x = _conv(x, params["stem"]["w"], 2)                      # 150 -> 72
    x = _affine(x, params["stem"]["g"], params["stem"]["b"])
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(                                 # 72 -> 35
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for i, (_, down) in enumerate(BLOCKS):
        x = _block(x, params["blocks"][i], down)
    x = jnp.mean(x, axis=(1, 2))                               # avg pool all
    return jnp.dot(x, params["fc"])                            # bias-free


def init_params(seed: int = 0):
    """Random params in the model's own (HWIO) layout."""
    rng = np.random.RandomState(seed)

    def conv(kh, kw, cin, cout):
        fan = kh * kw * cin
        return (rng.randn(kh, kw, cin, cout) / np.sqrt(fan)).astype(
            np.float32)

    params = {"stem": {"w": conv(7, 7, 3, 32),
                       "g": np.ones(32, np.float32),
                       "b": np.zeros(32, np.float32)}}
    blocks = []
    cin = 32
    for n, down in BLOCKS:
        blocks.append({
            "w1": conv(3, 3, cin, n),
            "g1": np.ones(n, np.float32), "b1": np.zeros(n, np.float32),
            "w2": conv(3, 3, n, n),
            "g2": np.ones(n, np.float32), "b2": np.zeros(n, np.float32),
        })
        cin = max(cin, n)
    params["blocks"] = blocks
    params["fc"] = (rng.randn(256, EMBED_DIM) / 16.0).astype(np.float32)
    return jax.tree.map(jnp.asarray, params)


def load_dlib_weights(blobs):
    """dlib-layout blobs -> model params.

    :param blobs: dict with, in forward order:
        - ``con0`` .. ``con28``: [num_filters, in_ch, kh, kw] float32
          (dlib's native filter layout; con0 is the 7x7 stem)
        - ``affine0`` .. ``affine28``: (gamma [ch], beta [ch]) pairs
        - ``fc``: [256, 128] (input-major, bias-free)
    :returns: params pytree for :func:`dlib_face_embeddings`
    """
    def conv(i):
        w = np.asarray(blobs[f"con{i}"], dtype=np.float32)
        # [out, in, kh, kw] -> [kh, kw, in, out]
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    def aff(i):
        g, b = blobs[f"affine{i}"]
        return (jnp.asarray(np.asarray(g, np.float32)),
                jnp.asarray(np.asarray(b, np.float32)))

    g0, b0 = aff(0)
    params = {"stem": {"w": conv(0), "g": g0, "b": b0}}
    blocks = []
    ci = 1
    for _ in BLOCKS:
        g1, b1 = aff(ci)
        g2, b2 = aff(ci + 1)
        blocks.append({"w1": conv(ci), "g1": g1, "b1": b1,
                       "w2": conv(ci + 1), "g2": g2, "b2": b2})
        ci += 2
    params["blocks"] = blocks
    params["fc"] = jnp.asarray(np.asarray(blobs["fc"], np.float32))
    return params


WEIGHTS_ENV = "DLIB_FACE_WEIGHTS"


def default_weights_path():
    """Conventional pretrained-weights location: $DLIB_FACE_WEIGHTS or
    ``<package>/models/weights/dlib_face.npz`` (the role of the
    reference's auto-downloaded dlib_face_recognition_resnet_model_v1.dat,
    featurizer/dlib_featurizer.py:1-47; no egress here, so weights are
    dropped once via scripts/drop_weights.py)."""
    import os

    env = os.environ.get(WEIGHTS_ENV)
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "dlib_face.npz")


def save_params_npz(params, path):
    """Persist params as a flat npz (keys ``stem/w``, ``blocks/3/w1``,
    ``fc``)."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {"fc": np.asarray(params["fc"])}
    for k, v in params["stem"].items():
        flat[f"stem/{k}"] = np.asarray(v)
    for i, blk in enumerate(params["blocks"]):
        for k, v in blk.items():
            flat[f"blocks/{i}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path):
    """Load params persisted by :func:`save_params_npz`."""
    with np.load(path) as z:
        params = {"fc": jnp.asarray(z["fc"]), "stem": {}, "blocks": []}
        n_blocks = 1 + max(int(k.split("/")[1]) for k in z.files
                           if k.startswith("blocks/"))
        params["blocks"] = [{} for _ in range(n_blocks)]
        for key in z.files:
            if key.startswith("stem/"):
                params["stem"][key.split("/")[1]] = jnp.asarray(z[key])
            elif key.startswith("blocks/"):
                _, i, k = key.split("/")
                params["blocks"][int(i)][k] = jnp.asarray(z[key])
    return params


def load_default_weights():
    """Load dropped pretrained weights from the conventional path, or
    None (random init)."""
    import os

    path = default_weights_path()
    if path and os.path.exists(path):
        return load_params_npz(path)
    return None


class DlibExactFaceEmbedder:
    """FaceEmbedder-compatible facade over the import-exact net
    (``featurize(img, bbox) -> 128-d float64``, reference contract
    featurizer/dlib_featurizer.py:86-105)."""

    feat_size = EMBED_DIM
    feat_type = "dlib"

    def __init__(self, params=None, seed: int = 0, aligner=None):
        if params is None:
            params = load_default_weights()
        self.pretrained = params is not None
        self.params = params if params is not None else init_params(seed)
        self.aligner = aligner

    def featurize(self, img, bbox):
        return self.featurize_batch(img, [bbox])[0]

    def featurize_batch(self, img, bboxes):
        from columbiaimagesearch_tpu.models.face import extract_chip

        if self.aligner is not None:
            chips = self.aligner.align(img, bboxes).astype(np.float32)
        else:
            chips = np.stack([extract_chip(img, b)
                              for b in bboxes]).astype(np.float32)
        out = np.asarray(dlib_face_embeddings(self.params, chips))
        return out.astype(np.float64)

    def featurize_chips(self, chips):
        out = np.asarray(dlib_face_embeddings(
            self.params, np.asarray(chips, dtype=np.float32)))
        return out.astype(np.float64)
