"""Batched k-means on TPU: k-means++ seeding + full-batch Lloyd iterations.

TPU-first replacement for the reference's sklearn ``MiniBatchKMeans`` calls
(reference: lopq/lopq/model.py:290-336 ``train_coarse``/``train_subquantizers``).
Instead of a streaming mini-batch heuristic on CPU, we run exact Lloyd
iterations where the assignment step is one large matmul on the MXU per data
chunk and the update step is a ``segment_sum`` scatter — both fully jitted
with static shapes. n_init independent restarts keep the reference's
best-of-n-init selection semantics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.utils.chunking import pad_rows, round_up

_DEFAULT_CHUNK = 8192


def _pick_chunk(n_rows: int) -> int:
    """A chunk size that bounds the [chunk, V] distance buffer in HBM."""
    return min(round_up(n_rows, 256), _DEFAULT_CHUNK)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(X, C, chunk: int):
    """Nearest-centroid assignment, chunked over rows.

    Returns (assignments int32 [N], squared distance to assigned centroid [N]).
    N must be a multiple of ``chunk``.
    """
    N, D = X.shape
    c2 = jnp.sum(C * C, axis=1)  # [V]

    def one_chunk(xc):
        # Distances via the matmul identity; x^2 is added back for the true
        # squared distance (argmin does not need it, the value does).
        # precision='highest' keeps f32 accuracy on the MXU so argmin ties
        # match the host oracle (code-parity requirement).
        prod = jnp.dot(xc, C.T, preferred_element_type=jnp.float32,
                       precision="highest")  # [chunk, V]
        d2 = c2[None, :] - 2.0 * prod
        a = jnp.argmin(d2, axis=1).astype(jnp.int32)
        md = jnp.take_along_axis(d2, a[:, None].astype(jnp.int32), axis=1)[:, 0]
        md = md + jnp.sum(xc * xc, axis=1)
        return a, jnp.maximum(md, 0.0)

    Xc = X.reshape(N // chunk, chunk, D)
    a, md = jax.lax.map(one_chunk, Xc)
    return a.reshape(N), md.reshape(N)


def assign_clusters(X, C):
    """Host-friendly wrapper: nearest centroid ids + squared distances."""
    X = jnp.asarray(X, dtype=jnp.float32)
    C = jnp.asarray(C, dtype=jnp.float32)
    chunk = _pick_chunk(X.shape[0])
    Xp, n = pad_rows(X, chunk)
    a, md = _assign_chunked(Xp, C, chunk)
    return a[:n], md[:n]


@functools.partial(jax.jit, static_argnames=("k", "n_local_trials"))
def kmeans_plusplus_init(key, X, w, k: int, n_local_trials: int = 0):
    """Greedy k-means++ seeding on device (sklearn semantics).

    Each step samples ``n_local_trials`` candidates from the D^2
    distribution, scores every candidate's resulting potential with one
    [T, N] MXU matmul, and keeps the best — the same greedy variant
    sklearn's ``_kmeans_plusplus`` uses under the reference's
    MiniBatchKMeans (n_local_trials = 2 + log(k)). HBM traffic per step is
    unchanged from the single-candidate variant (X is read once either
    way), so the better seeds are ~free.

    :param key: PRNG key
    :param X: [N, D] float32 data (rows with w==0 are padding)
    :param w: [N] float32 validity weights (1 valid / 0 pad)
    :param k: number of centers (static)
    :param n_local_trials: candidates per step (static; 0 -> 2 + log(k))
    :returns: [k, D] initial centroids
    """
    N, D = X.shape
    T = n_local_trials if n_local_trials > 0 else 2 + int(np.log(max(k, 2)))
    x2 = jnp.sum(X * X, axis=1)

    key0, key = jax.random.split(key)
    # First center: uniform over valid rows.
    logits0 = jnp.where(w > 0, 0.0, -jnp.inf)
    first = jax.random.categorical(key0, logits0)
    c = X[first]
    C0 = jnp.zeros((k, D), dtype=X.dtype).at[0].set(c)
    d2 = x2 - 2.0 * (X @ c) + jnp.sum(c * c)
    d2 = jnp.maximum(d2, 0.0) * w

    def body(i, carry):
        C, d2, key = carry
        key, sub = jax.random.split(key)
        # Sample T candidates proportional to D^2 (kmeans++ distribution).
        logits = jnp.where(d2 > 0, jnp.log(d2), -jnp.inf)
        # Degenerate case (all remaining distances zero): fall back to uniform
        # over valid rows so we still emit k centers.
        logits = jnp.where(jnp.any(d2 > 0), logits, logits0)
        idx = jax.random.categorical(sub, logits, shape=(T,))
        cand = X[idx]                                     # [T, D]
        cand2 = jnp.sum(cand * cand, axis=1)
        dist = jnp.maximum(
            x2[None, :] - 2.0 * jnp.dot(cand, X.T,
                                        preferred_element_type=jnp.float32)
            + cand2[:, None], 0.0) * w[None, :]           # [T, N]
        nd2 = jnp.minimum(d2[None, :], dist)
        best = jnp.argmin(jnp.sum(nd2, axis=1))
        C = C.at[i].set(cand[best])
        return C, nd2[best], key

    C, _, _ = jax.lax.fori_loop(1, k, body, (C0, d2, key))
    return C


@functools.partial(jax.jit, static_argnames=("iters", "chunk", "k"))
def _lloyd(X, w, C_init, iters: int, chunk: int, k: int):
    """Full-batch Lloyd iterations; returns (C, assignments, inertia)."""

    def step(C, _):
        a, md = _assign_chunked(X, C, chunk)
        wc = w  # [N]
        sums = jax.ops.segment_sum(X * wc[:, None], a, num_segments=k)
        counts = jax.ops.segment_sum(wc, a, num_segments=k)
        newC = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], C
        )
        return newC, None

    C, _ = jax.lax.scan(step, C_init, None, length=iters)
    a, md = _assign_chunked(X, C, chunk)
    inertia = jnp.sum(md * w)
    return C, a, inertia


def lloyd_kmeans(X, C_init, iters: int = 10):
    """Run Lloyd iterations from given initial centroids.

    :returns: (centroids [k, D], assignments [N] int32, inertia float)
    """
    X = jnp.asarray(X, dtype=jnp.float32)
    C_init = jnp.asarray(C_init, dtype=jnp.float32)
    k = C_init.shape[0]
    chunk = _pick_chunk(X.shape[0])
    Xp, n = pad_rows(X, chunk)
    w = jnp.zeros(Xp.shape[0], dtype=jnp.float32).at[:n].set(1.0)
    C, a, inertia = _lloyd(Xp, w, C_init, iters, chunk, k)
    return C, a[:n], float(inertia)


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_and_sums(Xc, w, C, k: int):
    """One chunk's contribution to a Lloyd update: (sums [k,D], counts [k],
    inertia)."""
    c2 = jnp.sum(C * C, axis=1)
    prod = jnp.dot(Xc, C.T, preferred_element_type=jnp.float32,
                   precision="highest")
    d2 = c2[None, :] - 2.0 * prod
    a = jnp.argmin(d2, axis=1).astype(jnp.int32)
    md = jnp.maximum(jnp.take_along_axis(d2, a[:, None], axis=1)[:, 0]
                     + jnp.sum(Xc * Xc, axis=1), 0.0)
    sums = jax.ops.segment_sum(Xc * w[:, None], a, num_segments=k)
    counts = jax.ops.segment_sum(w, a, num_segments=k)
    return sums, counts, jnp.sum(md * w)


def fit_kmeans_streaming(X, k: int, iters: int = 10, n_init: int = 1,
                         seed: int | None = None, device_chunk: int = 262144,
                         init_subsample: int = 500_000):
    """Exact Lloyd k-means over host-resident data too large for HBM.

    Identical math to :func:`fit_kmeans` (full-batch updates accumulated
    chunk-by-chunk on device), so unlike the reference's MiniBatchKMeans this
    streaming path is still *exact* Lloyd — only the device working set is
    bounded (one [device_chunk, D] slab + [k, D] accumulators). kmeans++
    seeding runs on a subsample.

    :param X: [N, D] numpy array (stays on host)
    :returns: [k, D] float32 centroids (jax array)
    """
    X = np.asarray(X, dtype=np.float32)
    N, D = X.shape
    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)

    sub = X[: min(init_subsample, N)]
    subp, nsub = pad_rows(jnp.asarray(sub), 256)
    wsub = jnp.zeros(subp.shape[0], dtype=jnp.float32).at[:nsub].set(1.0)

    best_C, best_inertia = None, np.inf
    for _ in range(max(1, n_init)):
        key, k1 = jax.random.split(key)
        C = kmeans_plusplus_init(k1, subp, wsub, k)
        inertia = np.inf
        for _ in range(iters):
            sums = jnp.zeros((k, D), dtype=jnp.float32)
            counts = jnp.zeros((k,), dtype=jnp.float32)
            total_md = 0.0
            for start in range(0, N, device_chunk):
                chunk = X[start:start + device_chunk]
                cp, nc = pad_rows(jnp.asarray(chunk), 256)
                w = jnp.zeros(cp.shape[0], dtype=jnp.float32).at[:nc].set(1.0)
                s, c, md = _assign_and_sums(cp, w, C, k)
                sums = sums + s
                counts = counts + c
                total_md += float(md)
            C = jnp.where(counts[:, None] > 0,
                          sums / jnp.maximum(counts, 1.0)[:, None], C)
            inertia = total_md
        if inertia < best_inertia:
            best_C, best_inertia = C, inertia
    return best_C


# Above roughly this many elements the all-on-device Lloyd would not fit
# HBM alongside its distance buffers; stream from the host instead.
STREAMING_THRESHOLD_ELEMENTS = 1 << 29  # ~2 GB float32


def fit_kmeans_auto(X, k: int, iters: int = 10, n_init: int = 1,
                    seed: int | None = None):
    """Dispatch between on-device and streaming exact Lloyd by data size.

    Oversized inputs stream from a host slab regardless of where they live:
    the on-device Lloyd needs distance/one-hot buffers alongside X, so a
    device-resident X above the threshold would OOM HBM — the one-time D2H
    pull is the cheaper failure mode.
    """
    if getattr(X, "size", 0) > STREAMING_THRESHOLD_ELEMENTS:
        return fit_kmeans_streaming(np.asarray(X, dtype=np.float32), k,
                                    iters, n_init, seed)
    return fit_kmeans(X, k, iters, n_init, seed)


def fit_kmeans(X, k: int, iters: int = 10, n_init: int = 1, seed: int | None = None):
    """Train a k-means codebook: kmeans++ seeding + Lloyd, best of n_init runs.

    Mirrors the role of the reference's
    ``MiniBatchKMeans(n_clusters=V, init='k-means++', max_iter=iters,
    n_init=n_init)`` (reference: lopq/lopq/model.py:312-314) with exact
    full-batch Lloyd updates on the MXU.

    :returns: [k, D] float32 centroids (jax array)
    """
    X = jnp.asarray(X, dtype=jnp.float32)
    chunk = _pick_chunk(X.shape[0])
    Xp, n = pad_rows(X, chunk)
    w = jnp.zeros(Xp.shape[0], dtype=jnp.float32).at[:n].set(1.0)

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)

    best_C, best_inertia = None, np.inf
    for _ in range(max(1, n_init)):
        key, sub = jax.random.split(key)
        C0 = kmeans_plusplus_init(sub, Xp, w, k)
        C, _, inertia = _lloyd(Xp, w, C0, iters, chunk, k)
        inertia = float(inertia)
        if inertia < best_inertia:
            best_C, best_inertia = C, inertia
    return best_C
