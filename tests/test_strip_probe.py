"""Square-plus-strip probe rungs (index/tpu_query.py lopq_query SB > 0).

The multisequence walk's region {(a,b): td0[a]+td1[b] <= theta} has long
thin arms along the rank axes; a square-only grid cut provably misses
them (measured: 100% certificate failure at B=256 on the 10M benchmark
index even with the quota met). Strip rungs cover the arms with two
SB-deep full-length edge strips while keeping the sort-free threshold
path's row structure (ragged prefix widths). These tests pin:

- region semantics vs an explicit numpy region-walk oracle (threshold,
  total, visited-cell count),
- end-to-end parity with the UNRESTRICTED host walk whenever the strip
  certificate passes,
- the certificate's inner-corner bound,
- ladder escalation through strip rungs inside the searcher, and the
  quota-aware rung floor skipping hopeless narrow rungs.

Reference semantics: lopq/lopq/search.py:110-135 (get_result_quota).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from columbiaimagesearch_tpu.index.csr import build_csr_device
from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import (
    LOPQSearcher,
    LOPQSearcherTPU,
)
from columbiaimagesearch_tpu.index.tpu_query import (
    lopq_query,
    probe_ladder,
    rung_floor,
    rung_parts,
)

from tests.oracle_lopq import random_params


def region_oracle(q, Cs, coarse, quota, V, B, SB):
    """Numpy mirror of the strip-region quota walk (sort-order tie
    semantics, SL = min(8B, V) bounded strips): returns
    (theta, total, n_cells, out_region_min)."""
    h0, h1 = np.split(np.asarray(q, np.float64), 2)
    d0 = ((h0[None] - np.asarray(Cs[0], np.float64)) ** 2).sum(1)
    d1 = ((h1[None] - np.asarray(Cs[1], np.float64)) ** 2).sum(1)
    o0, o1 = np.argsort(d0, kind="stable"), np.argsort(d1, kind="stable")
    # float32 tds to match the kernel's arithmetic exactly
    td0 = np.sort(d0.astype(np.float32))
    td1 = np.sort(d1.astype(np.float32))
    SL = min(8 * B, V)
    cells = coarse[:, 0].astype(np.int64) * V + coarse[:, 1]
    counts = np.bincount(cells, minlength=V * V).reshape(V, V)
    rcounts = counts[o0][:, o1]
    a = np.arange(V)[:, None]
    b = np.arange(V)[None, :]
    mask = (((a < B) & (b < B)) | ((a < SB) & (b < SL))
            | ((b < SB) & (a < SL)))
    grid = (td0[:, None] + td1[None, :]).astype(np.float32)
    vals = grid[mask]
    cnts = rcounts[mask]
    order = np.argsort(vals, kind="stable")
    csum = np.cumsum(cnts[order])
    sel = (csum - cnts[order]) < quota
    total = int(cnts[order][sel].sum())
    n_cells = int(sel.sum())
    theta = float(vals[order][sel][-1]) if n_cells else 0.0
    out_min = min(float(td0[B] + td1[SB]), float(td0[SB] + td1[B])) \
        if B < V else np.inf
    if SL < V:
        out_min = min(out_min, float(td0[0] + td1[SL]),
                      float(td0[SL] + td1[0]))
    return theta, total, n_cells, out_min


@pytest.fixture(scope="module")
def strip_setup():
    rng = np.random.RandomState(11)
    V, M, S, D = 128, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 5000
    coarse = rng.randint(0, V, (n, 2))
    fine = rng.randint(0, S, (n, M))
    queries = rng.randn(4, D).astype(np.float32)
    return model, coarse, fine, queries


def _device_index(model, coarse, fine, V):
    Cs = jnp.stack([jnp.asarray(C) for C in model.Cs])
    Rs = jnp.stack([jnp.asarray(R) for R in model.Rs])
    mus = jnp.stack([jnp.asarray(m) for m in model.mus])
    subs = jnp.stack([jnp.stack([jnp.asarray(s) for s in h])
                      for h in model.subquantizers])
    codes, cell_start, order = build_csr_device(
        jnp.asarray(coarse), jnp.asarray(fine), V)
    return Cs, Rs, mus, subs, codes, cell_start, order


def test_strip_region_matches_oracle(strip_setup):
    """total / n_cells / grid_ok of a strip rung == the explicit numpy
    region walk, across quota regimes and strip depths."""
    model, coarse, fine, queries = strip_setup
    V = 128
    Cs, Rs, mus, subs, codes, cell_start, _ = _device_index(
        model, coarse, fine, V)
    for B, SB in ((32, 8), (64, 16), (48, 12)):
        for quota in (50, 400, 3000):
            for q in queries:
                rows, dists, total, ncells, ok = lopq_query(
                    jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start,
                    jnp.asarray(quota, jnp.int32), None,
                    V=V, B=B, Q=4096, K=32, SB=SB)
                theta, t_o, nc_o, out_min = region_oracle(
                    q, model.Cs, coarse, quota, V, B, SB)
                assert int(total) == t_o, (B, SB, quota)
                assert int(ncells) == nc_o, (B, SB, quota)
                assert bool(ok) == (theta <= out_min + 1e-12) or \
                    abs(theta - out_min) < 1e-5


def test_strip_rung_parity_with_host_when_certified(strip_setup):
    """grid_ok == 1 on a strip rung certifies reference-walk parity: the
    ranked results must match the UNRESTRICTED host searcher."""
    model, coarse, fine, queries = strip_setup
    V = 128
    ids = [f"r{i}" for i in range(len(coarse))]
    dev = _device_index(model, coarse, fine, V)
    Cs, Rs, mus, subs, codes, cell_start, order = dev
    host = LOPQSearcher(model)
    host.add_codes((coarse, fine), ids)
    checked = 0
    for q in queries:
        for quota in (400, 3000):
            rows, dists, total, ncells, ok = lopq_query(
                jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start,
                jnp.asarray(quota, jnp.int32), None,
                V=V, B=64, Q=4096, K=16, SB=16)
            if not bool(ok):
                continue
            checked += 1
            r_host, _ = host.search(q, quota=quota, limit=16,
                                    with_dists=True)
            d_dev = np.asarray(dists)
            d_dev = d_dev[np.isfinite(d_dev)]
            np.testing.assert_allclose(
                d_dev[:len(r_host)], [r.dist for r in r_host][:len(d_dev)],
                rtol=1e-3, atol=1e-4)
    assert checked >= 2  # the certificate must actually fire


def test_strips_fix_square_cert_failure():
    """Deterministic arm case: axis-0 coarse distances are STEEP (arm
    can't extend down the rows) and axis-1 distances SHALLOW (the true
    walk region is a few rows crossed with far column ranks — exactly
    the arm shape a square cut misses). The square rung finds zero
    candidates; the strip rung covers the region, passes its
    certificate, and matches the unrestricted host walk."""
    rng = np.random.RandomState(23)
    V, M, S, D = 128, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    Cs0, Cs1 = np.array(params[0][0]), np.array(params[0][1])
    Cs0[:] = 0.0
    Cs0[:, 0] = 10.0 * np.arange(V)        # steep: d0[i] = (10 i)^2
    Cs1[:] = 0.0
    Cs1[:, 0] = 0.01 * np.arange(V)        # shallow: d1[i] = (.01 i)^2
    params = ((Cs0, Cs1),) + tuple(params[1:])
    model = LOPQModel(parameters=params)
    q = np.zeros(D, np.float32)            # ranks == cluster ids
    # all rows pair rank-0 < 4 with column ranks 40..127 (the arm)
    n = 2000
    coarse = np.stack([
        rng.randint(0, 4, n),
        rng.randint(40, V, n),
    ], axis=1).astype(np.int64)
    fine = rng.randint(0, S, (n, M))
    dev = _device_index(model, coarse, fine, V)
    Cs, Rs, mus, subs, codes, cell_start, order = dev
    quota = jnp.asarray(500, jnp.int32)
    _, _, tot_sq, _, ok_sq = lopq_query(
        jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start, quota, None,
        V=V, B=32, Q=4096, K=16, SB=0)
    rows, dists, tot_st, _, ok_st = lopq_query(
        jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start, quota, None,
        V=V, B=32, Q=4096, K=16, SB=8)
    assert int(tot_sq) == 0                # square: arm entirely missed
    assert int(tot_st) >= 500
    assert bool(ok_st)
    host = LOPQSearcher(model)
    host.add_codes((coarse, fine), [f"a{i}" for i in range(n)])
    r_host, _ = host.search(q, quota=500, limit=16, with_dists=True)
    d_dev = np.asarray(dists)
    d_dev = d_dev[np.isfinite(d_dev)]
    np.testing.assert_allclose(
        d_dev[:len(r_host)], [r.dist for r in r_host][:len(d_dev)],
        rtol=1e-3, atol=1e-4)


def test_searcher_ladder_includes_strip_rungs():
    """The default ladder's strip rungs run end-to-end inside the
    searcher and results match the host walk at a quota the narrow rung
    cannot satisfy. (V=256: the ladder clamps to (64, (128, 8), 256) —
    strips drop out only at B >= V.)"""
    rng = np.random.RandomState(31)
    V, M, S, D = 256, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 6000
    coarse = rng.randint(0, V, (n, 2))
    fine = rng.randint(0, S, (n, M))
    queries = rng.randn(2, D).astype(np.float32)
    ids = [f"s{i}" for i in range(n)]
    st = LOPQSearcherTPU(model)
    st.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    ladder = probe_ladder(V)
    assert any(rung_parts(r)[1] > 0 for r in ladder), ladder
    for q in queries:
        r_dev, _ = st.search(q, quota=4000, limit=10, with_dists=True)
        r_host, _ = sh.search(q, quota=4000, limit=10, with_dists=True)
        np.testing.assert_allclose(
            [r.dist for r in r_dev], [r.dist for r in r_host],
            rtol=1e-3, atol=1e-4)


def test_rung_floor_policy():
    ladder = probe_ladder(4096)
    # Cold start (no yield observation): ALWAYS rung 0 — the uniform-
    # occupancy prior underestimates probed-region yield ~80x on
    # clustered corpora and imprinted the widest rung via the settle
    # hint (r04 serving regression); escalation guards correctness.
    assert rung_floor(ladder, 10_000, 10_485_760, 4096) == 0
    assert rung_floor(ladder, 10_000, 1 << 20, 4096) == 0
    # tiny quota: stay on the narrow rung
    assert rung_floor(ladder, 10, 10_485_760, 4096) == 0
    # observed dense yield keeps the floor narrow
    f = rung_floor(ladder, 10_000, 1 << 20, 4096, yield_est=5.0)
    assert rung_parts(ladder[f])[0] == 64
    # observed SPARSE yield raises the floor (the OOD serving case:
    # 0.03 cand/cell -> the walk needs ~300k+ cells -> widest rung)
    f = rung_floor(ladder, 10_000, 1 << 20, 4096, yield_est=0.03)
    assert rung_parts(ladder[f])[0] == 1024
    # empty index: floor 0
    assert rung_floor(ladder, 10_000, 0, 4096) == 0


def test_yield_ema_updates(strip_setup):
    model, coarse, fine, queries = strip_setup
    st = LOPQSearcherTPU(model)
    st.add_codes((coarse, fine))
    assert st._yield_ema is None
    st.search_batch(queries, quota=400, limit=8)
    assert st._yield_ema is not None and st._yield_ema > 0
