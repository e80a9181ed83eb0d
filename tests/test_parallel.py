"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher
from columbiaimagesearch_tpu.parallel.mesh import SHARD_AXIS, make_mesh, shard_rows
from columbiaimagesearch_tpu.parallel.sharded import (
    ShardedLOPQIndex,
    dp_encode,
    dp_lloyd_step,
)

from tests.oracle_lopq import random_params


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_lloyd_step_matches_single_device():
    rng = np.random.RandomState(0)
    X = rng.randn(1000, 16).astype(np.float32)
    C = rng.randn(8, 16).astype(np.float32)

    mesh = make_mesh()
    Xs, n = shard_rows(mesh, X)
    w = np.zeros(Xs.shape[0], dtype=np.float32)
    w[:n] = 1.0
    ws, _ = shard_rows(mesh, w)
    C_new, inertia = dp_lloyd_step(Xs, ws, jax.device_put(C), 8)

    # Oracle: plain numpy Lloyd update.
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    C_ref = C.copy()
    for v in range(8):
        if (a == v).sum() > 0:
            C_ref[v] = X[a == v].mean(0)
    np.testing.assert_allclose(np.asarray(C_new), C_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(inertia), d.min(1).sum(), rtol=1e-4)


@pytest.fixture(scope="module")
def model_and_data():
    rng = np.random.RandomState(5)
    params = random_params(rng, V=8, M=4, S=16, D=32)
    model = LOPQModel(parameters=params)
    X = rng.randn(1500, 32).astype(np.float32)
    return model, X


def test_dp_encode_matches_host_encode(model_and_data):
    model, X = model_and_data
    mesh = make_mesh()
    Cs = np.stack(model.Cs)
    Rs = np.stack(model.Rs)
    mus = np.stack(model.mus)
    subs = np.stack([np.stack(h) for h in model.subquantizers])
    coarse, fine = dp_encode(mesh, Cs, Rs, mus, subs, X, chunk=64)
    coarse_ref, fine_ref = model.predict_batch(X)
    np.testing.assert_array_equal(coarse, coarse_ref.astype(np.int32))
    np.testing.assert_array_equal(fine, fine_ref.astype(np.int32))


def test_sharded_index_matches_host_searcher(model_and_data):
    model, X = model_and_data
    ids = [f"img_{i}" for i in range(len(X))]
    coarse, fine = model.predict_batch(X)

    idx = ShardedLOPQIndex(model, mesh=make_mesh(axis=SHARD_AXIS))
    idx.build(coarse, fine, ids)
    assert idx.nb_indexed == len(X)

    host = LOPQSearcher(model)
    host.add_codes((coarse, fine), ids)

    rng = np.random.RandomState(9)
    for q in rng.randn(5, 32).astype(np.float32):
        got, _ = idx.search(q, quota=400, limit=10)
        want, _ = host.search(q, quota=3200, limit=10, with_dists=True)
        want_ids = {r.id: r.dist for r in want}
        assert len(got) == 10
        # Every sharded result's distance must match the host's computation,
        # and the top result must agree.
        assert got[0][0] == want[0].id
        for rid, dist in got[:5]:
            if rid in want_ids:
                np.testing.assert_allclose(dist, want_ids[rid], rtol=1e-3)
