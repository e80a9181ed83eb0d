"""Batched 128-d face embedder — TPU counterpart of the dlib face pipeline.

The reference embeds faces with dlib's ``face_recognition_model_v1`` (a
29-conv ResNet over 150x150 aligned chips, producing 128-d float64
descriptors; reference: cufacesearch/featurizer/dlib_featurizer.py:50-105).
This module provides the same contract as a batched Flax model:

- topology mirrors dlib's metric-learning net (conv32 7x7/2 + maxpool, then
  residual levels 32x3, 64x4, 128x3, 256x4, global average pool, biasless
  fc128), so trained dlib weights can be ported by a converter;
- chips are cut from detection bboxes with dlib-style 25% context padding and
  resized on the host, normalized on device with dlib's input scaling
  ((x - rgb_mean) / 256);
- output is cast to float64 at the host boundary, matching the reference's
  storage convention (featsio.py:24-39).
"""


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CHIP_SIZE = 150
EMBED_DIM = 128
# dlib input_rgb_image average pixel values.
RGB_MEAN = (122.782, 117.001, 104.298)


class _ResBlock(nn.Module):
    features: int
    down: bool = False

    @nn.compact
    def __call__(self, x):
        stride = (2, 2) if self.down else (1, 1)
        y = nn.Conv(self.features, (3, 3), strides=stride, padding=1,
                    use_bias=False)(x)
        y = nn.GroupNorm(num_groups=None, group_size=self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.GroupNorm(num_groups=None, group_size=self.features)(y)
        if self.down or x.shape[-1] != self.features:
            x = nn.avg_pool(x, (2, 2), strides=stride, padding="SAME") \
                if self.down else x
            x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return nn.relu(x + y)


class FaceResNet(nn.Module):
    """dlib face_recognition_model_v1-compatible topology."""

    @nn.compact
    def __call__(self, x):
        # x: [N, 150, 150, 3] float32, already (x - mean)/256 normalized.
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=None, group_size=32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for _ in range(3):
            x = _ResBlock(32)(x)
        x = _ResBlock(64, down=True)(x)
        for _ in range(3):
            x = _ResBlock(64)(x)
        x = _ResBlock(128, down=True)(x)
        for _ in range(2):
            x = _ResBlock(128)(x)
        x = _ResBlock(256, down=True)(x)
        for _ in range(2):
            x = _ResBlock(256)(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(EMBED_DIM, use_bias=False, name="fc128")(x)
        return x


@jax.jit
def face_embeddings(params, chips):
    """[N, 150, 150, 3] float32 (0..255 RGB) -> [N, 128] float32."""
    mean = jnp.asarray(RGB_MEAN, dtype=jnp.float32)
    x = (chips - mean[None, None, None, :]) / 256.0
    return FaceResNet().apply({"params": params}, x)


def init_params(seed: int = 0):
    model = FaceResNet()
    dummy = jnp.zeros((1, CHIP_SIZE, CHIP_SIZE, 3), dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def default_weights_path():
    """$FACE_WEIGHTS or ``<package>/models/weights/face.npz`` (the role of
    the reference's dlib model auto-download,
    featurizer/dlib_featurizer.py:1-47; no egress here — drop converted or
    self-trained weights into place once)."""
    import os

    env = os.environ.get("FACE_WEIGHTS")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "face.npz")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_weights_npz(params, path):
    """Persist the (nested) Flax params as a flat npz."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(params))


def load_weights_npz(path):
    with np.load(path) as z:
        params = {}
        for key in z.files:
            node = params
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return params


def load_default_weights():
    import os

    path = default_weights_path()
    if path and os.path.exists(path):
        return load_weights_npz(path)
    return None


def extract_chip(img, bbox, padding: float = 0.25):
    """Cut a face chip from a bbox dict with dlib-style context padding and
    resize to 150x150 (host-side; the alignment role of dlib's
    get_face_chip)."""
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    left, top = float(bbox["left"]), float(bbox["top"])
    right, bottom = float(bbox["right"]), float(bbox["bottom"])
    bw, bh = right - left, bottom - top
    left = int(max(0, round(left - padding * bw)))
    top = int(max(0, round(top - padding * bh)))
    right = int(min(w, round(right + padding * bw)))
    bottom = int(min(h, round(bottom + padding * bh)))
    if right <= left or bottom <= top:
        chip = np.zeros((CHIP_SIZE, CHIP_SIZE, 3), dtype=np.uint8)
    else:
        crop = img[top:bottom, left:right, :3].astype(np.uint8)
        chip = np.asarray(Image.fromarray(crop).resize(
            (CHIP_SIZE, CHIP_SIZE), Image.BILINEAR))
    return chip


class FaceEmbedder:
    """Featurizer facade with the reference's contract
    (``featurize(img, bbox) -> 128-d float64``;
    reference: featurizer/dlib_featurizer.py:86-105) plus a batched path."""

    feat_size = EMBED_DIM
    feat_type = "dlib"

    def __init__(self, params=None, seed: int = 0, aligner=None):
        """:param aligner: optional FaceAligner (models.face_align) — when
        set, chips are landmark-aligned like the reference's dlib pipeline
        instead of padded bbox crops."""
        if params is None:
            params = load_default_weights()
        self.pretrained = params is not None
        self.params = params if params is not None else init_params(seed)
        self.aligner = aligner

    def featurize(self, img, bbox):
        return self.featurize_batch(img, [bbox])[0]

    def featurize_batch(self, img, bboxes):
        """One image, many bboxes -> [len(bboxes), 128] float64."""
        if self.aligner is not None:
            chips = self.aligner.align(img, bboxes).astype(np.float32)
        else:
            chips = np.stack([extract_chip(img, b)
                              for b in bboxes]).astype(np.float32)
        out = np.asarray(face_embeddings(self.params, chips))
        return out.astype(np.float64)

    def featurize_chips(self, chips):
        """[N, 150, 150, 3] uint8/float -> [N, 128] float64 (bulk path)."""
        out = np.asarray(face_embeddings(self.params,
                                         np.asarray(chips, dtype=np.float32)))
        return out.astype(np.float64)
