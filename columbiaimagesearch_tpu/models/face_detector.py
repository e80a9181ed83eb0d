"""TPU-native sliding-window face detector (conv-HOG + linear template).

The reference detects faces with dlib's HOG + linear-SVM frontal face
detector scanning an image pyramid on CPU
(reference: cufacesearch/detector/dlib_detector.py:10-35). The TPU-first
equivalent expresses the same pipeline as convolutions so the whole scan runs
on the MXU/VPU in one jit per pyramid level:

- gradients and orientation-channel responses are elementwise ops,
- HOG cells are an 8x8 average pool, block normalization a local reduce,
- the 80x80 linear template is one VALID convolution producing the dense
  score map for every window position simultaneously,
- the 5/6-factor pyramid reuses a fixed set of bucketed (static) shapes.

The template is trainable on device (``train`` — logistic regression over
HOG features), so the detector is self-contained without external model
downloads; a converter can inject dlib's SVM weights when available.

Output contract matches the reference: list of dicts with ``left``, ``top``,
``right``, ``bottom``, ``score``.
"""


import jax
import jax.numpy as jnp
import numpy as np

CELL = 8           # pixels per HOG cell
N_ORIENT = 8       # orientation channels
WINDOW = 80        # detection window in pixels
TCELLS = WINDOW // CELL  # template size in cells
PYRAMID_RATIO = 5.0 / 6.0
DEFAULT_UPSAMPLING = 1

_ANGLES = np.pi * np.arange(N_ORIENT) / N_ORIENT


@jax.jit
def hog_features(img):
    """[H, W] float32 grayscale -> [H//8, W//8, N_ORIENT] HOG-like cells."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
    gy = jnp.zeros_like(img).at[1:-1, :].set(img[2:, :] - img[:-2, :])
    cos = jnp.asarray(np.cos(_ANGLES), dtype=jnp.float32)
    sin = jnp.asarray(np.sin(_ANGLES), dtype=jnp.float32)
    # Unsigned orientation energy: |g . d_theta| per channel.
    proj = jnp.abs(gx[..., None] * cos + gy[..., None] * sin)  # [H, W, O]
    H, W = img.shape
    ch, cw = H // CELL, W // CELL
    cells = proj[:ch * CELL, :cw * CELL].reshape(ch, CELL, cw, CELL, N_ORIENT)
    cells = cells.mean(axis=(1, 3))  # [ch, cw, O]
    # Block normalization: divide by local energy.
    energy = jnp.sqrt(jnp.sum(cells ** 2, axis=-1, keepdims=True) + 1e-4)
    return cells / energy


@jax.jit
def score_map(feats, template, bias):
    """Dense window scores: one VALID conv of the [10,10,O] template."""
    out = jax.lax.conv_general_dilated(
        feats[None], template[..., None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0, :, :, 0] + bias


def _bucket(size: int) -> int:
    """Round up to a small set of static shapes to bound recompiles."""
    b = 96
    while b < size:
        b = int(b * 1.5)
    return b


def default_template_path():
    """Conventional trained-template location: $FACE_TEMPLATE or
    ``<package>/models/weights/face_template.npz`` (the role of the
    reference's dlib detector model auto-download,
    featurizer/dlib_featurizer.py:1-47; no egress here, so the artifact is
    trained/committed via scripts/train_face_template.py)."""
    import os

    env = os.environ.get("FACE_TEMPLATE")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "face_template.npz")


class ConvHOGFaceDetector:
    """Sliding-window detector with the reference detector's contract."""

    def __init__(self, template=None, bias=None, threshold=0.5,
                 nms_iou=0.4, min_size=WINDOW):
        if template is None:
            loaded = self._load_default()
            if loaded is not None:
                template, file_bias = loaded
                if bias is None:
                    bias = file_bias
        if template is None:
            rng = np.random.RandomState(0)
            template = 0.01 * rng.randn(TCELLS, TCELLS, N_ORIENT)
        self.template = jnp.asarray(template, dtype=jnp.float32)
        self.bias = float(bias) if bias is not None else 0.0
        self.threshold = threshold
        self.nms_iou = nms_iou
        self.min_size = min_size

    @staticmethod
    def _load_default():
        import os

        path = default_template_path()
        if path and os.path.exists(path):
            with np.load(path) as z:
                return z["template"], float(z["bias"])
        return None

    def save_template(self, path=None):
        import os

        path = path or default_template_path()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, template=np.asarray(self.template),
                 bias=np.float32(self.bias))
        return path

    # ----------------------------------------------------------- detection

    def run(self, img, up_sample=DEFAULT_UPSAMPLING):
        """Detect; returns (bboxes, scores) like dlib's ``detector.run``."""
        from PIL import Image

        img = np.asarray(img)
        if img.ndim == 3:
            img = img.astype(np.float32).mean(axis=2)
        else:
            img = img.astype(np.float32)
        scale0 = 2.0 ** int(up_sample)
        if scale0 != 1.0:
            h, w = img.shape
            img = np.asarray(Image.fromarray(img).resize(
                (int(w * scale0), int(h * scale0)), Image.BILINEAR))

        boxes, scores = [], []
        scale = 1.0
        cur = img
        while min(cur.shape) >= self.min_size:
            bh, bw = _bucket(cur.shape[0]), _bucket(cur.shape[1])
            padded = np.zeros((bh, bw), dtype=np.float32)
            padded[:cur.shape[0], :cur.shape[1]] = cur
            feats = hog_features(jnp.asarray(padded))
            smap = np.asarray(score_map(feats, self.template,
                                        jnp.float32(self.bias)))
            # Mask windows that touch the padding.
            max_cy = (cur.shape[0] // CELL) - TCELLS
            max_cx = (cur.shape[1] // CELL) - TCELLS
            ys, xs = np.nonzero(smap > self.threshold)
            for y, x in zip(ys, xs):
                if y > max_cy or x > max_cx:
                    continue
                px, py = x * CELL, y * CELL
                boxes.append(np.array([px, py, px + WINDOW, py + WINDOW])
                             / scale / scale0)
                scores.append(float(smap[y, x]))
            scale *= PYRAMID_RATIO
            nh = int(round(img.shape[0] * scale))
            nw = int(round(img.shape[1] * scale))
            if min(nh, nw) < self.min_size:
                break
            cur = np.asarray(Image.fromarray(img).resize((nw, nh),
                                                         Image.BILINEAR))

        if not boxes:
            return [], []
        boxes = np.stack(boxes)
        scores = np.asarray(scores)
        keep = _nms(boxes, scores, self.nms_iou)
        return boxes[keep], scores[keep]

    def detect_from_img(self, img, up_sample=DEFAULT_UPSAMPLING):
        """Reference contract (detector/dlib_detector.py:22-35): list of
        bbox dicts with score."""
        boxes, scores = self.run(img, up_sample)
        return [
            {"left": int(round(b[0])), "top": int(round(b[1])),
             "right": int(round(b[2])), "bottom": int(round(b[3])),
             "score": float(s)}
            for b, s in zip(boxes, scores)
        ]

    # ------------------------------------------------------------ training

    def train(self, pos_imgs, neg_imgs, steps=300, lr=0.05, seed=0,
              neg_weight=1.0):
        """Fit the linear template on device (logistic regression over HOG
        features of 80x80 window crops).

        The loss is class-balanced (each class contributes equally to the
        mean regardless of pool sizes), with ``neg_weight`` scaling the
        negative class further. Without balancing, a positive-heavy pool
        drags the bias up and zero-gradient (flat) windows score
        ``bias > 0`` — firing on featureless regions."""
        def feats_of(stack):
            out = [np.asarray(hog_features(jnp.asarray(
                np.asarray(im, dtype=np.float32)
                if np.asarray(im).ndim == 2
                else np.asarray(im, dtype=np.float32).mean(axis=2))))
                [:TCELLS, :TCELLS, :]
                for im in stack]
            return np.stack(out)

        Xp, Xn = feats_of(pos_imgs), feats_of(neg_imgs)
        X = jnp.asarray(np.concatenate([Xp, Xn]).reshape(len(Xp) + len(Xn), -1))
        y = jnp.asarray(np.concatenate(
            [np.ones(len(Xp)), np.zeros(len(Xn))]).astype(np.float32))
        sw = np.concatenate([
            np.full(len(Xp), 0.5 / max(len(Xp), 1)),
            np.full(len(Xn), 0.5 * neg_weight / max(len(Xn), 1)),
        ]).astype(np.float32)
        sw = jnp.asarray(sw / sw.sum())

        @jax.jit
        def fit(w, b):
            def loss_fn(params):
                w, b = params
                logits = X @ w + b
                return jnp.sum(sw * (
                    jnp.maximum(logits, 0) - logits * y
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                )) + 1e-4 * jnp.sum(w * w)

            def step(params, _):
                g = jax.grad(loss_fn)(params)
                return (params[0] - lr * g[0], params[1] - lr * g[1]), None

            (w, b), _ = jax.lax.scan(step, (w, b), None, length=steps)
            return w, b

        w0 = jnp.zeros(X.shape[1], dtype=jnp.float32)
        w, b = fit(w0, jnp.float32(0.0))
        self.template = jnp.asarray(w).reshape(TCELLS, TCELLS, N_ORIENT)
        self.bias = float(b)
        return self


def _nms(boxes, scores, iou_th):
    """Greedy non-maximum suppression (host; candidate count is tiny)."""
    order = np.argsort(scores)[::-1]
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
        order = rest[iou <= iou_th]
    return np.asarray(keep, dtype=int)
