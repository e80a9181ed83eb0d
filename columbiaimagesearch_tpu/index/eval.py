"""Model-quality evaluation: recall@k, cell balance, reconstruction checks.

Same measurements as the reference's eval library
(reference: lopq/lopq/eval.py), vectorized: brute-force neighbors are one
device matmul instead of a scipy cdist + Python argmin loop.
"""

import time

import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.ops.kmeans import _pick_chunk
from columbiaimagesearch_tpu.utils.chunking import pad_rows


def compute_all_neighbors(data1, data2=None, just_nn=True):
    """Ranked (or nearest) neighbor indices of data1 rows within data2
    (reference: lopq/lopq/eval.py:7-38), computed on device."""
    d1 = jnp.asarray(data1, dtype=jnp.float32)
    d2 = d1 if data2 is None else jnp.asarray(data2, dtype=jnp.float32)

    chunk = _pick_chunk(d1.shape[0])
    d1p, n = pad_rows(d1, chunk)
    n2 = jnp.sum(d2 * d2, axis=1)

    import jax

    def one_chunk(xc):
        d2m = n2[None, :] - 2.0 * jnp.dot(xc, d2.T, preferred_element_type=jnp.float32,
                                          precision="highest")
        if just_nn:
            return jnp.argmin(d2m, axis=1)
        return jnp.argsort(d2m, axis=1)

    out = jax.lax.map(one_chunk, d1p.reshape(-1, chunk, d1.shape[1]))
    out = np.asarray(out.reshape(-1, *out.shape[2:]))[:n]
    return out


def get_proportion_nns_with_same_coarse_codes(data, model, nns=None):
    """Fraction of points sharing coarse codes with their true NN
    (reference: eval.py:41-63), batched."""
    data = np.asarray(data, dtype=np.float32)
    if nns is None:
        nns = compute_all_neighbors(data)
    coarse = model._predict_coarse_batch(data)
    same = np.all(coarse == coarse[np.asarray(nns)], axis=1)
    return float(np.mean(same))


def get_subquantizer_distortion(data, model):
    """Mean per-subquantizer squared distortion over locally projected
    residuals (reference: eval.py:145-161), batched."""
    from columbiaimagesearch_tpu.ops.kmeans import assign_clusters
    from columbiaimagesearch_tpu.ops.rotations import (
        compute_residuals,
        project_residuals_to_local,
    )

    data = np.asarray(data, dtype=np.float32)
    halves = np.split(data, 2, axis=1)
    projected = []
    for s in range(2):
        r, a = compute_residuals(halves[s], model.Cs[s])
        projected.append(np.asarray(project_residuals_to_local(
            r, a, model.Rs[s], model.mus[s])))
    pall = np.concatenate(projected, axis=1)
    suball = list(model.subquantizers[0]) + list(model.subquantizers[1])
    M = len(suball)
    dists = []
    for sub_data, subC in zip(np.split(pall, M, axis=1), suball):
        _, md = assign_clusters(sub_data, subC)
        dists.append(float(np.sum(np.asarray(md))))
    return np.asarray(dists) / data.shape[0]


def get_cell_histogram(data, model):
    """Histogram of points per multi-index cell (reference: eval.py:66-74)."""
    coarse = model._predict_coarse_batch(np.asarray(data, dtype=np.float32))
    cells = coarse[:, 0].astype(np.int64) * model.V + coarse[:, 1].astype(np.int64)
    return np.histogram(cells, bins=range(model.V ** 2))[0]


def get_proportion_of_reconstructions_with_same_codes(data, model):
    """Fraction of points whose reconstruction re-encodes to the same code
    (reference: eval.py:77-89), batched."""
    data = np.asarray(data, dtype=np.float32)
    coarse, fine = model.predict_batch(data)
    recon = model.reconstruct_batch(coarse, fine)
    coarse2, fine2 = model.predict_batch(recon)
    same = np.all(coarse == coarse2, axis=1) & np.all(fine == fine2, axis=1)
    return float(np.mean(same))


def get_recall(searcher, queries, nns, thresholds=(1, 10, 100, 1000),
               normalize=True, verbose=False):
    """Recall@thresholds + mean query time (reference: eval.py:92-142).

    ``thresholds[-1]`` sets the retrieval quota, identical to the reference.
    """
    thresholds = list(thresholds)
    recall = np.zeros(len(thresholds))
    query_time = 0.0
    queries = np.asarray(queries, dtype=np.float32)
    for i, q in enumerate(queries):
        nn = nns[i]
        start = time.perf_counter()
        results, cells_visited = searcher.search(q, thresholds[-1])
        query_time += time.perf_counter() - start
        if verbose and i % 50 == 0:
            print(f"{cells_visited} cells visited for query {i}")
        for j, res in enumerate(results):
            if res.id == nn:
                for k, t in enumerate(thresholds):
                    if j < t:
                        recall[k] += 1
    if normalize:
        n = queries.shape[0]
        return recall / n, query_time / n
    return recall, query_time
