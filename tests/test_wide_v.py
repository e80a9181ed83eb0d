"""Wide-V mode: V >= WIDE_V_THRESHOLD replaces the dense [V^2+1] offsets
table (1 GB at V=16384) with searchsorted lookups over the sorted cell-id
array. The reference supports arbitrary V (lopq/lopq/model.py:447); this
keeps such configs servable on device. Ranking must be identical to the
host searcher."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import (
    LOPQSearcher,
    LOPQSearcherTPU,
)

from tests.oracle_lopq import random_params


@pytest.fixture(scope="module")
def wide_setup():
    """V=16384 index whose rows all live in cells formed from the 32
    NEAREST coarse clusters per split for the probe query — so the full
    candidate set fits inside even the narrowest probe grid and the
    device ranking must match the host multisequence walk exactly (on an
    ultra-sparse random index the ladder cap is the documented
    approximation instead)."""
    rng = np.random.RandomState(21)
    V, M, S, D = 16384, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    q = rng.randn(D).astype(np.float32)
    Cs = params[0]
    h0, h1 = np.split(q, 2)
    pool0 = np.argsort(((h0[None] - Cs[0]) ** 2).sum(1))[:32]
    pool1 = np.argsort(((h1[None] - Cs[1]) ** 2).sum(1))[:32]
    n = 4000
    coarse = np.stack([rng.choice(pool0, n), rng.choice(pool1, n)], axis=1)
    fine = rng.randint(0, S, (n, M))
    ids = [f"w_{i}" for i in range(n)]
    return model, params, q, coarse, fine, ids


def test_wide_v_uses_searchsorted_mode(wide_setup):
    model, params, q, coarse, fine, ids = wide_setup
    s = LOPQSearcherTPU(model)
    assert model.V >= s.WIDE_V_THRESHOLD
    s.add_codes((coarse, fine), ids)
    assert s.get_nb_indexed() == len(ids)
    assert s._dev.get("cell_start") is None  # no dense table resident


def test_wide_v_matches_host_searcher(wide_setup):
    model, params, q, coarse, fine, ids = wide_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    r_dev, _ = s.search(q, quota=50, limit=10, with_dists=True)
    r_host, _ = sh.search(q, quota=50, limit=10, with_dists=True)
    np.testing.assert_allclose([r.dist for r in r_dev],
                               [r.dist for r in r_host],
                               rtol=1e-3, atol=1e-4)
    for a, b, da in zip(r_dev, r_host, [r.dist for r in r_dev]):
        if a.id != b.id:  # float-tie swaps only
            assert abs(a.dist - b.dist) < 1e-4


def test_wide_v_batch_and_incremental(wide_setup):
    model, params, q, coarse, fine, ids = wide_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse[:3000], fine[:3000]), ids[:3000])
    _ = s.get_nb_indexed()
    s.add_codes((coarse[3000:], fine[3000:]), ids[3000:])  # incremental
    assert s.get_nb_indexed() == len(ids)
    sh = LOPQSearcher(model)
    sh.add_codes((coarse, fine), ids)
    waves = s.search_batch(q[None], quota=50, limit=5, with_dists=True)
    results, visited = waves[0]
    r_host, _ = sh.search(q, quota=50, limit=5, with_dists=True)
    np.testing.assert_allclose([r.dist for r in results],
                               [r.dist for r in r_host],
                               rtol=1e-3, atol=1e-4)
    assert visited >= 1


def test_wide_v_rerank(wide_setup):
    """Feature store + fused rerank work in wide-V mode too."""
    model, params, q, coarse, fine, ids = wide_setup
    rng = np.random.RandomState(23)
    X = rng.randn(len(ids), 32).astype(np.float32)
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids, feats=X)
    results, _ = s.search(q, quota=50, limit=5, with_dists=True,
                          rerank_nb=5)
    # distances must be exact in feature space, sorted ascending
    for r in results:
        row = int(str(r.id).split("_")[1])
        np.testing.assert_allclose(
            r.dist, np.linalg.norm(X[row] - q), rtol=1e-4, atol=1e-5)
    d = [r.dist for r in results]
    assert d == sorted(d)
