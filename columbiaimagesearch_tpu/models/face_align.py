"""Face alignment: landmark regression + similarity-transform chip warping.

The reference aligns faces with dlib's 68-landmark shape predictor before
embedding (reference: cufacesearch/featurizer/dlib_featurizer.py:68-105 —
``shape_predictor`` + ``compute_face_descriptor``; dlib internally cuts an
aligned 150x150 chip). The TPU-native counterpart:

- :class:`LandmarkNet` — a small conv regressor predicting facial points
  on a 64x64 crop: 5 points (eyes, nose, mouth corners) or the full
  ibug-68 set the reference's shape predictor emits; trainable on device
  (``train_landmark_net``) on exact procedural annotations
  (``make_landmark_training_set`` + ``face_synth.landmarks68``) so the
  system is self-contained without downloadable models; dlib/task-specific
  weights can be ported by matching the head;
- :func:`estimate_similarity` — closed-form Umeyama similarity transform
  from predicted points to the canonical 5-point template;
- :func:`warp_affine` — batched bilinear warp on device producing the
  aligned 150x150 chips that feed :class:`FaceResNet`.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.models.face import CHIP_SIZE

LM_INPUT = 64   # landmark net input side
N_POINTS = 5

# Canonical 5-point template (ArcFace convention, 112x112) scaled to the
# 150x150 chip: left eye, right eye, nose tip, left mouth, right mouth.
_TEMPLATE_112 = np.array([
    [38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
    [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)
CANONICAL_POINTS = _TEMPLATE_112 * (CHIP_SIZE / 112.0)


class LandmarkNet(nn.Module):
    """64x64 grayscale crop -> n (x, y) points in [0, 1] crop coordinates.

    ``n_points=5`` is the eyes/nose/mouth-corner head; ``n_points=68``
    matches the reference's dlib shape-predictor contract (ibug-68
    ordering, reference: cufacesearch/featurizer/dlib_featurizer.py:68).
    """

    n_points: int = N_POINTS

    @nn.compact
    def __call__(self, x):
        # x: [N, 64, 64, 1] float32 in [0, 1]
        for feats in (16, 32, 64, 128):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), padding=1)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128)(x))
        pts = nn.Dense(2 * self.n_points)(x)
        return nn.sigmoid(pts).reshape(-1, self.n_points, 2)


@functools.partial(jax.jit, static_argnames=("n_points",))
def predict_landmarks(params, crops, n_points: int = N_POINTS):
    """[N, 64, 64, 1] float32 (0..1) -> [N, n_points, 2] crop coords."""
    return LandmarkNet(n_points=n_points).apply({"params": params}, crops)


def init_landmark_params(seed: int = 0, n_points: int = N_POINTS):
    dummy = jnp.zeros((1, LM_INPUT, LM_INPUT, 1), dtype=jnp.float32)
    return LandmarkNet(n_points=n_points).init(
        jax.random.PRNGKey(seed), dummy)["params"]


def train_landmark_net(params, crops, points, steps=500, lr=1e-3,
                       batch=64, seed=0):
    """MSE landmark regression on device (optax adam).

    :param crops: [N, 64, 64, 1] float32 in [0, 1]
    :param points: [N, n_points, 2] targets in [0, 1] crop coordinates
        (the head size is taken from this shape)
    """
    import optax

    crops = jnp.asarray(crops, dtype=jnp.float32)
    points = jnp.asarray(points, dtype=jnp.float32)
    net = LandmarkNet(n_points=int(points.shape[1]))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (batch,), 0, crops.shape[0])
        xb, yb = crops[idx], points[idx]

        def loss_fn(p):
            pred = net.apply({"params": p}, xb)
            return jnp.mean((pred - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    loss = None
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    return params, float(loss)


def key5_from_68(pts):
    """5-point (eye centers, nose tip, mouth corners) summary of an
    ibug-68 shape — the standard 68->5 reduction (eye rings averaged,
    points 30/48/54)."""
    pts = np.asarray(pts, dtype=np.float64)
    return np.stack([pts[36:42].mean(0), pts[42:48].mean(0), pts[30],
                     pts[48], pts[54]])


@functools.lru_cache(maxsize=1)
def canonical_points_68():
    """[68, 2] mean procedural shape in 150x150 chip coordinates.

    The mean of :func:`face_synth.landmarks68` over 200 identities
    (unit canvas) is similarity-mapped via its 5 key points onto
    :data:`CANONICAL_POINTS`, so 5-point and 68-point alignment place
    eyes/nose/mouth at the same chip positions (compatible embeddings).
    dlib's chip extraction does the same thing with its own mean shape
    (reference: cufacesearch/featurizer/dlib_featurizer.py:68-105).
    """
    from columbiaimagesearch_tpu.models.face_synth import landmarks68

    mean = np.mean([landmarks68(i, size=1) for i in range(200)], axis=0)
    A = estimate_similarity(key5_from_68(mean), CANONICAL_POINTS)
    return (mean @ A[:, :2].T + A[:, 2]).astype(np.float32)


def make_landmark_training_set(identities, n_per_identity: int = 4,
                               seed: int = 0, n_points: int = 68):
    """Rendered 64x64 crops + exact landmark targets from the procedural
    faces (detector-style jittered boxes). Returns (crops [N,64,64,1]
    float32 0..1, targets [N, n_points, 2] in [0,1] crop coords)."""
    from PIL import Image

    from columbiaimagesearch_tpu.models import face_synth

    rng = np.random.RandomState(seed)
    crops, targets = [], []
    for identity in identities:
        img, bbox = face_synth.render_face(identity)
        pts = face_synth.landmarks68(identity)
        if n_points == N_POINTS:
            pts = key5_from_68(pts)
        elif n_points != 68:
            raise ValueError(f"n_points must be 5 or 68, got {n_points}")
        l, t, r, b = bbox
        w, h = r - l, b - t
        for _ in range(n_per_identity):
            jl = max(0, int(l + rng.uniform(-0.08, 0.08) * w))
            jt = max(0, int(t + rng.uniform(-0.08, 0.08) * h))
            jr = min(img.shape[1], int(r + rng.uniform(-0.08, 0.08) * w))
            jb = min(img.shape[0], int(b + rng.uniform(-0.08, 0.08) * h))
            crop = img[jt:jb, jl:jr]
            crop64 = np.asarray(
                Image.fromarray(crop.astype(np.uint8)).resize(
                    (LM_INPUT, LM_INPUT), Image.BILINEAR), np.float32)
            tgt = (pts - [jl, jt]) / [max(jr - jl, 1), max(jb - jt, 1)]
            # Jaw points sit ON the face bbox; inward jitter pushes them
            # just outside the crop, which a sigmoid head cannot reach.
            tgt = np.clip(tgt, 0.001, 0.999)
            crops.append(crop64[..., None] / 255.0)
            targets.append(tgt.astype(np.float32))
    return np.stack(crops), np.stack(targets)


def estimate_similarity(src_pts, dst_pts):
    """Umeyama closed-form similarity (s, R, t): dst ~= s R src + t.

    :returns: [2, 3] matrix A mapping src -> dst homogeneous coords
    """
    src = np.asarray(src_pts, dtype=np.float64)
    dst = np.asarray(dst_pts, dtype=np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc ** 2).sum() / len(src)
    s = (S * np.diag(D)).sum() / max(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    A = np.zeros((2, 3), dtype=np.float32)
    A[:, :2] = s * R
    A[:, 2] = t
    return A


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_affine(imgs, A_inv, out_h: int, out_w: int):
    """Batched inverse-map bilinear warp.

    :param imgs: [N, H, W, C] float32
    :param A_inv: [N, 2, 3] mapping OUTPUT coords -> INPUT coords
    :returns: [N, out_h, out_w, C] float32
    """
    N, H, W, C = imgs.shape
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # [oh, ow]
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1)             # [oh, ow, 3]
    src = jnp.einsum("nij,hwj->nhwi", A_inv, grid)        # [N, oh, ow, 2]
    sx = jnp.clip(src[..., 0], 0.0, W - 1.001)
    sy = jnp.clip(src[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yi, xi):
        flat = imgs.reshape(N, H * W, C)
        idx = yi * W + xi                                  # [N, oh, ow]
        return jnp.take_along_axis(
            flat, idx.reshape(N, -1, 1), axis=1).reshape(N, out_h, out_w, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


class FaceAligner:
    """bbox -> aligned 150x150 chip via landmarks + similarity warp.

    ``n_points=5`` (default) uses the compact eyes/nose/mouth head;
    ``n_points=68`` matches the reference's dlib 68-landmark alignment
    fidelity — the similarity fit then uses all 68 correspondences, so
    bbox noise and per-landmark error average out over 13.6x more
    points."""

    def __init__(self, params=None, seed: int = 0,
                 n_points: int = N_POINTS):
        if n_points not in (N_POINTS, 68):
            # Mirrors make_landmark_training_set's check: any other value
            # would pair with the 68-point template and only fail later
            # inside estimate_similarity with an opaque shape error.
            raise ValueError(
                f"n_points must be {N_POINTS} or 68, got {n_points}")
        self.n_points = n_points
        self.template = (CANONICAL_POINTS if n_points == N_POINTS
                         else canonical_points_68())
        self.params = (params if params is not None
                       else init_landmark_params(seed, n_points=n_points))

    def _crop64(self, img, bbox):
        from PIL import Image

        img = np.asarray(img)
        if img.ndim == 3:
            gray = img.astype(np.float32).mean(axis=2)
        else:
            gray = img.astype(np.float32)
        h, w = gray.shape
        l = max(0, int(bbox["left"]))
        t = max(0, int(bbox["top"]))
        r = min(w, int(bbox["right"]))
        b = min(h, int(bbox["bottom"]))
        if r <= l or b <= t:
            return np.zeros((LM_INPUT, LM_INPUT), np.float32), (0, 0, 1, 1)
        crop = gray[t:b, l:r]
        crop64 = np.asarray(Image.fromarray(crop.astype(np.uint8)).resize(
            (LM_INPUT, LM_INPUT), Image.BILINEAR), dtype=np.float32)
        return crop64, (l, t, r - l, b - t)

    def align(self, img, bboxes):
        """One image, many bboxes -> [n, 150, 150, 3] aligned chips."""
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        crops, geoms = [], []
        for bbox in bboxes:
            c, g = self._crop64(img, bbox)
            crops.append(c)
            geoms.append(g)
        crops = np.stack(crops)[..., None] / 255.0
        pts = np.asarray(predict_landmarks(self.params, jnp.asarray(crops),
                                           n_points=self.n_points))
        A_invs = []
        for p, (l, t, cw, ch) in zip(pts, geoms):
            src = p * np.array([cw, ch]) + np.array([l, t])  # image coords
            A = estimate_similarity(src, self.template)
            # invert [2,3] affine
            M = np.eye(3, dtype=np.float64)
            M[:2] = A
            A_invs.append(np.linalg.inv(M)[:2].astype(np.float32))
        chips = warp_affine(
            jnp.asarray(np.repeat(img[None].astype(np.float32),
                                  len(bboxes), axis=0)),
            jnp.asarray(np.stack(A_invs)), CHIP_SIZE, CHIP_SIZE)
        return np.asarray(chips)
