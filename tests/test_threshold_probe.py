"""Sort-free wide-rung probe selection (index/tpu_query.py stage 2-3).

Wide rungs of the escalation ladder (B*B > 16384) skip the grid sort and
select the multisequence quota prefix by exact bit-bisection threshold.
The selected cell SET must match the reference's probe-until-quota walk
(reference: lopq/lopq/search.py:110-135) exactly; these tests pin:

- full-grid parity with the host searcher's exhaustive walk across quota
  regimes (at B=V there is no grid restriction, so any mismatch is a
  selection bug, not an approximation),
- escalation from the sorted narrow rung into a threshold rung,
- the grid_ok certificate in threshold mode,
- the interior-cells-never-clipped guarantee when the crossing cell
  overflows the Q slot padding,
- threshold selection composed with wide-V searchsorted bucket lookup.
"""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import (
    LOPQSearcher,
    LOPQSearcherTPU,
)

from tests.oracle_lopq import random_params


def _split_ranks(q, Cs):
    h0, h1 = np.split(q, 2)
    d0 = ((h0[None] - Cs[0]) ** 2).sum(1)
    d1 = ((h1[None] - Cs[1]) ** 2).sum(1)
    return np.argsort(d0), np.argsort(d1), np.sort(d0), np.sort(d1)


@pytest.fixture(scope="module")
def setup256():
    rng = np.random.RandomState(3)
    V, M, S, D = 256, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 3000
    coarse = rng.randint(0, V, (n, 2))
    fine = rng.randint(0, S, (n, M))
    ids = [f"t_{i}" for i in range(n)]
    queries = rng.randn(3, D).astype(np.float32)
    return model, params, coarse, fine, ids, queries


def test_full_grid_threshold_matches_host(setup256):
    """B=V=256 pins a single threshold rung (G=65536) with no grid
    restriction: for every quota the visited-cell prefix must equal the
    host walk's, so ranked results must agree exactly."""
    model, params, coarse, fine, ids, queries = setup256
    s = LOPQSearcherTPU(model, probe_width=256)
    s.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    for q in queries:
        for quota in (10, 300, 2500):
            r_dev, _ = s.search(q, quota=quota, limit=10, with_dists=True)
            r_host, _ = sh.search(q, quota=quota, limit=10, with_dists=True)
            assert len(r_dev) == len(r_host)
            np.testing.assert_allclose(
                [r.dist for r in r_dev], [r.dist for r in r_host],
                rtol=1e-3, atol=1e-4)
            for a, b in zip(r_dev, r_host):
                if a.id != b.id:  # float-tie swaps only
                    assert abs(a.dist - b.dist) < 1e-4


def test_escalates_into_threshold_rung():
    """Rows whose cells sit beyond both splits' top-100 ranks: the sorted
    B=64 rung finds nothing, so the ladder escalates into the threshold
    rungs (B=256 -> G=65536); final results must match the host walk."""
    rng = np.random.RandomState(5)
    V, M, S, D = 512, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    q = rng.randn(D).astype(np.float32)
    r0, r1, _, _ = _split_ranks(q, params[0])
    far0, far1 = r0[100:], r1[100:]
    n = 600
    coarse = np.stack([rng.choice(far0, n), rng.choice(far1, n)], axis=1)
    fine = rng.randint(0, S, (n, M))
    ids = [f"h_{i}" for i in range(n)]
    s = LOPQSearcherTPU(model)  # adaptive ladder (64, 256, 512)
    s.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    r_dev, _ = s.search(q, quota=80, limit=10, with_dists=True)
    r_host, _ = sh.search(q, quota=80, limit=10, with_dists=True)
    assert len(r_dev) == 10
    np.testing.assert_allclose(
        [r.dist for r in r_dev], [r.dist for r in r_host],
        rtol=1e-3, atol=1e-4)


def test_threshold_grid_certificate():
    """grid_ok in threshold mode: the crossing distance (bisection
    threshold) is compared against the cheapest out-of-grid cell, exactly
    as the sorted path does."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.csr import build_csr_device
    from columbiaimagesearch_tpu.index.tpu_query import lopq_query

    rng = np.random.RandomState(9)
    V, M, S, D = 512, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    Cs = jnp.asarray(np.stack(params[0]))
    Rs = jnp.asarray(np.stack(params[1]))
    mus = jnp.asarray(np.stack(params[2]))
    subs = jnp.asarray(np.stack([np.stack(h) for h in params[3]]))
    q = rng.randn(D).astype(np.float32)
    r0, r1, d0s, d1s = _split_ranks(q, params[0])
    # Premise check for (a): the far in-grid corner really is costlier
    # than the cheapest cell the B=256 restriction cuts off.
    assert d0s[255] + d1s[255] > min(d0s[256] + d1s[0], d0s[0] + d1s[256])

    def run(c0, c1):
        n = 100
        coarse = np.tile([[c0, c1]], (n, 1)).astype(np.int32)
        fine = rng.randint(0, S, (n, M)).astype(np.uint8)
        codes, cell_start, order = build_csr_device(
            jnp.asarray(coarse), jnp.asarray(fine), V)
        return lopq_query(
            jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start,
            jnp.asarray(50, jnp.int32), V=V, B=256, Q=1024, K=16,
            lut_impl="stream")

    # (a) all rows in the far corner of the grid: quota met in-grid, but
    # the walk would have visited a cut-off cell first -> must escalate.
    rows, dists, total, ncells, ok = run(r0[255], r1[255])
    assert int(total) == 100  # crossing cell retrieved whole
    assert int(ok) == 0
    # (b) all rows in the nearest cell: certificate holds.
    rows, dists, total, ncells, ok = run(r0[0], r1[0])
    assert int(total) == 100
    assert int(ok) == 1


def test_crossing_cell_clip_preserves_interior():
    """total > Q: only crossing-cell (boundary) members may be clipped by
    the slot padding — every interior candidate must occupy a slot, as in
    the sorted path."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.csr import build_csr_device
    from columbiaimagesearch_tpu.index.tpu_query import lopq_query_orig

    rng = np.random.RandomState(13)
    V, M, S, D = 256, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    Cs = jnp.asarray(np.stack(params[0]))
    Rs = jnp.asarray(np.stack(params[1]))
    mus = jnp.asarray(np.stack(params[2]))
    subs = jnp.asarray(np.stack([np.stack(h) for h in params[3]]))
    q = rng.randn(D).astype(np.float32)
    r0, r1, _, _ = _split_ranks(q, params[0])
    n_near, n_big = 200, 2000
    coarse = np.concatenate([
        np.tile([[r0[0], r1[0]]], (n_near, 1)),
        np.tile([[r0[5], r1[5]]], (n_big, 1)),
    ]).astype(np.int32)
    fine = rng.randint(0, S, (n_near + n_big, M)).astype(np.uint8)
    codes, cell_start, order = build_csr_device(
        jnp.asarray(coarse), jnp.asarray(fine), V)
    # quota 250 > 200 near rows -> the big cell is the crossing cell;
    # total 2200 overflows Q=1024. K=Q emits every valid slot.
    rows, dists, total, ncells, ok = lopq_query_orig(
        jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start, order,
        jnp.asarray(250, jnp.int32), V=V, B=256, Q=1024, K=1024,
        lut_impl="stream")
    assert int(total) == n_near + n_big
    rows = np.asarray(rows)
    dists = np.asarray(dists)
    valid = rows[np.isfinite(dists)]
    assert len(valid) == 1024  # min(total, Q)
    # All interior (near-cell) rows survived the clip.
    assert set(range(n_near)) <= set(valid.tolist())


def test_wide_v_threshold_escalation():
    """Wide-V searchsorted bucket lookup composed with threshold
    selection: rows at split ranks 100-199 of a V=16384 index are
    invisible to the sorted B=64 rung, reachable at the threshold rungs;
    results must match the host walk."""
    rng = np.random.RandomState(17)
    V, M, S, D = 16384, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    q = rng.randn(D).astype(np.float32)
    r0, r1, _, _ = _split_ranks(q, params[0])
    pool0, pool1 = r0[100:200], r1[100:200]
    n = 1500
    coarse = np.stack([rng.choice(pool0, n), rng.choice(pool1, n)], axis=1)
    fine = rng.randint(0, S, (n, M))
    ids = [f"w_{i}" for i in range(n)]
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    r_dev, _ = s.search(q, quota=100, limit=10, with_dists=True)
    assert s._dev.get("cell_start") is None  # wide-V mode active
    r_host, _ = sh.search(q, quota=100, limit=10, with_dists=True)
    assert len(r_dev) == 10
    np.testing.assert_allclose(
        [r.dist for r in r_dev], [r.dist for r in r_host],
        rtol=1e-3, atol=1e-4)


def test_non_power_of_two_wide_rung_matches_host():
    """A wide rung clamped to a non-power-of-two V (B=300, G=90000) must
    still select the exact host-walk prefix — regression for binary-search
    range math that assumed power-of-two sizes (a 1 << (bits-1) range
    covered only 512 of 600 virtual rows and 256 of 300 row cells,
    silently mis-mapping candidates in high split ranks)."""
    rng = np.random.RandomState(11)
    V, M, S, D = 300, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 5000
    coarse = rng.randint(0, V, (n, 2))
    fine = rng.randint(0, S, (n, M))
    ids = [f"t_{i}" for i in range(n)]
    st = LOPQSearcherTPU(model, probe_width=300)
    st.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    for qi in range(3):
        q = rng.randn(D).astype(np.float32)
        rt, _ = st.search(q, quota=2000, limit=10, with_dists=True)
        rh, _ = sh.search(q, quota=2000, limit=10, with_dists=True)
        assert [r.id for r in rt] == [r.id for r in rh]
        np.testing.assert_allclose([float(r.dist) for r in rt],
                                   [float(r.dist) for r in rh],
                                   rtol=1e-5)


def test_wide_rung_randomized_property_sweep():
    """Randomized full-grid (B=V) configs — skewed cell mass, odd
    non-power-of-two V, quotas from 1 to 10x the index — must match the
    host walk exactly; grid-restricted runs must rank a subset of it."""
    from columbiaimagesearch_tpu.index.model import LOPQModel as _M

    for seed in (3, 5, 7, 9):
        rng = np.random.RandomState(seed)
        V = int(rng.choice([130, 200, 300]))
        M, S, D = 4, 16, 32
        model = _M(parameters=random_params(rng, V=V, M=M, S=S, D=D))
        n = int(rng.choice([200, 3000]))
        if seed % 2:  # fat cells: many rows concentrated in few cells
            coarse = np.stack([rng.randint(0, max(2, V // 20), n),
                               rng.randint(0, V, n)], 1)
        else:
            coarse = rng.randint(0, V, (n, 2))
        fine = rng.randint(0, S, (n, M))
        ids = [f"t_{i}" for i in range(n)]
        st = LOPQSearcherTPU(model, probe_width=V)  # full grid, wide path
        st.add_codes((coarse, fine), ids)
        sh = LOPQSearcher(model)
        sh.add_codes((coarse, fine), ids)
        for quota in (1, 7, n, 10 * n):
            q = rng.randn(D).astype(np.float32)
            rt, _ = st.search(q, quota=quota, limit=10, with_dists=True)
            rh, _ = sh.search(q, quota=quota, limit=10, with_dists=True)
            assert [r.id for r in rt] == [r.id for r in rh], (
                seed, V, n, quota)
            np.testing.assert_allclose([float(r.dist) for r in rt],
                                       [float(r.dist) for r in rh],
                                       rtol=1e-4)
