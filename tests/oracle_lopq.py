"""Independent numpy oracle of LOPQ encode/search semantics.

A from-scratch transcription of the LOPQ math (coarse assign -> residual ->
local rotation -> per-subvector assign; ADC = sum of per-subquantizer LUT
entries) used to validate the batched TPU implementation with *injected*
parameters, so every codepath is cross-checked against straightforward
per-point numpy.
"""

import numpy as np


def encode_point(x, Cs, Rs, mus, subs):
    """Return (coarse tuple, fine tuple) for one vector."""
    halves = np.split(np.asarray(x, dtype=np.float32), 2)
    coarse = []
    projected = []
    for s, xh in enumerate(halves):
        d = ((xh[None, :] - Cs[s]) ** 2).sum(axis=1)
        c = int(np.argmin(d))
        coarse.append(c)
        r = xh - Cs[s][c]
        projected.append(Rs[s][c] @ (r - mus[s][c]))
    fine = []
    for s in range(2):
        F = len(subs[s])
        for f, fx in enumerate(np.split(projected[s], F)):
            d = ((fx[None, :] - subs[s][f]) ** 2).sum(axis=1)
            fine.append(int(np.argmin(d)))
    return tuple(coarse), tuple(fine)


def adc_distance(x, coarse, fine, Cs, Rs, mus, subs):
    """Exact ADC distance of query x to a code."""
    halves = np.split(np.asarray(x, dtype=np.float32), 2)
    total = 0.0
    F = len(subs[0])
    for s in range(2):
        c = int(coarse[s])
        r = halves[s] - Cs[s][c]
        pr = Rs[s][c] @ (r - mus[s][c])
        for f, fx in enumerate(np.split(pr, F)):
            code = int(fine[s * F + f])
            total += ((fx - subs[s][f][code]) ** 2).sum()
    return total


def reconstruct_point(coarse, fine, Cs, Rs, mus, subs):
    F = len(subs[0])
    out = []
    for s in range(2):
        c = int(coarse[s])
        sx = np.concatenate([subs[s][f][int(fine[s * F + f])] for f in range(F)])
        r = Rs[s][c].T @ sx + mus[s][c]
        out.append(r + Cs[s][c])
    return np.concatenate(out)


def random_params(rng, V, M, S, D):
    """Well-conditioned random LOPQ parameters (rotations are orthogonal)."""
    Dh = D // 2
    F = M // 2
    Cs = [rng.randn(V, Dh).astype(np.float32) for _ in range(2)]
    Rs = []
    for _ in range(2):
        mats = []
        for _ in range(V):
            q, _ = np.linalg.qr(rng.randn(Dh, Dh))
            mats.append(q.astype(np.float32))
        Rs.append(np.stack(mats))
    mus = [0.1 * rng.randn(V, Dh).astype(np.float32) for _ in range(2)]
    subs = [
        [rng.randn(S, Dh // F).astype(np.float32) for _ in range(F)]
        for _ in range(2)
    ]
    return tuple(Cs), tuple(Rs), tuple(mus), tuple(subs)
