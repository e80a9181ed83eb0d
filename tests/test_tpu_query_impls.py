"""LUT-implementation parity for the fused probed query.

``lopq_query`` has two LUT-build paths (module docstring of
``index/tpu_query.py``): the streaming all-V matvec ("stream", default,
vmap-safe) and the per-cluster-DMA Pallas kernel ("pallas", single-query
hot path; interpret mode off-TPU). Both must rank identically — the pallas
path uses the ||a||^2 - 2ab + ||b||^2 expansion, so distances may differ
by float32 rounding only.
"""

import numpy as np
import pytest

from tests.oracle_lopq import adc_distance, random_params


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.csr import build_csr_device

    rng = np.random.RandomState(11)
    V, M, S, D = 16, 8, 32, 64
    Dh, F = D // 2, M // 2
    params = random_params(rng, V=V, M=M, S=S, D=D)
    Cs = jnp.asarray(np.stack(params[0]))
    Rs = jnp.asarray(np.stack(params[1]))
    mus = jnp.asarray(np.stack(params[2]))
    subs = jnp.asarray(np.stack([np.stack(h) for h in params[3]]))
    N = 4000
    coarse = jnp.asarray(rng.randint(0, V, (N, 2)).astype(np.int32))
    fine = jnp.asarray(rng.randint(0, S, (N, M)).astype(np.uint8))
    codes, cell_start, order = build_csr_device(coarse, fine, V)
    queries = rng.randn(6, D).astype(np.float32)
    return (params, V, M, Cs, Rs, mus, subs, coarse, fine, codes,
            cell_start, order, queries)


def test_pallas_lut_matches_stream(setup):
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.tpu_query import lopq_query

    (params, V, M, Cs, Rs, mus, subs, coarse, fine, codes, cell_start,
     order, queries) = setup
    for q in queries:
        a = lopq_query(jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start,
                       jnp.asarray(400, jnp.int32), V=V, B=8, Q=1024, K=32,
                       lut_impl="stream")
        b = lopq_query(jnp.asarray(q), Cs, Rs, mus, subs, codes, cell_start,
                       jnp.asarray(400, jnp.int32), V=V, B=8, Q=1024, K=32,
                       lut_impl="pallas")
        da, db = np.asarray(a[1]), np.asarray(b[1])
        np.testing.assert_allclose(da, db, rtol=1e-4, atol=1e-5)
        ra, rb = np.asarray(a[0]), np.asarray(b[0])
        # ids must agree except swaps between float-rounding-level ties
        for i in np.nonzero(ra != rb)[0]:
            assert abs(da[i] - db[i]) < 1e-4
        assert int(a[2]) == int(b[2]) and int(a[3]) == int(b[3])


def test_pack_unpack_query_out_roundtrip():
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.tpu_query import (
        pack_query_out,
        unpack_query_out,
    )

    rng = np.random.RandomState(0)
    K = 48
    rows = rng.randint(-1, 1 << 30, K).astype(np.int32)
    dists = np.concatenate(
        [rng.rand(K - 2).astype(np.float32) * 1e6, [np.inf, 0.0]]
    ).astype(np.float32)
    packed = np.asarray(pack_query_out(
        jnp.asarray(rows), jnp.asarray(dists), jnp.asarray(321),
        jnp.asarray(7), jnp.asarray(True)))
    r2, d2, t2, n2, ok2 = unpack_query_out(packed, K)
    np.testing.assert_array_equal(r2, rows)
    np.testing.assert_array_equal(d2, dists)  # bit-exact incl. inf
    assert int(t2) == 321
    assert int(n2) == 7
    assert int(ok2) == 1
    # batched form (as search_batch produces)
    packed2 = np.stack([packed, packed])
    r3, d3, t3, n3, ok3 = unpack_query_out(packed2, K)
    assert r3.shape == (2, K) and d3.shape == (2, K)
    np.testing.assert_array_equal(d3[1], dists)
    np.testing.assert_array_equal(t3, [321, 321])
    np.testing.assert_array_equal(n3, [7, 7])
    np.testing.assert_array_equal(ok3, [1, 1])


def test_query_distances_match_numpy_oracle(setup):
    """Both impls against the independent numpy ADC oracle (not against
    each other): top hits' distances must equal the oracle's ADC distance
    for the same (coarse, fine) codes."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.tpu_query import lopq_query_orig

    (params, V, M, Cs, Rs, mus, subs, coarse, fine, codes, cell_start,
     order, queries) = setup
    coarse_h = np.asarray(coarse)
    fine_h = np.asarray(fine)
    for impl in ("stream", "pallas"):
        rows, dists, total, ncells, _ok = lopq_query_orig(
            jnp.asarray(queries[0]), Cs, Rs, mus, subs, codes, cell_start,
            order, jnp.asarray(400, jnp.int32), V=V, B=8, Q=1024, K=16,
            lut_impl=impl)
        rows = np.asarray(rows)
        dists = np.asarray(dists)
        checked = 0
        for r, d in zip(rows, dists):
            if r < 0 or not np.isfinite(d):
                continue
            want = adc_distance(queries[0], tuple(coarse_h[r]),
                                tuple(fine_h[r]), *params)
            np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-4)
            checked += 1
        assert checked >= 8, impl
