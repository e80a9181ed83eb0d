"""eigenvalue_allocation parity vs a straightforward sequential oracle."""

import numpy as np

from columbiaimagesearch_tpu.ops.eigen_alloc import (
    eigenvalue_allocation,
    eigenvalue_allocation_batch,
)


def oracle_allocation(num_buckets, eigenvalues):
    """Direct sequential transcription of the published OPQ greedy algorithm
    (scaling trick + descending argsort + first-eligible argmin), used as an
    independent check of the vectorized implementation."""
    eigenvalues = np.asarray(eigenvalues, dtype=np.float64)
    D = len(eigenvalues)
    per = D // num_buckets
    prod = np.zeros(num_buckets)
    size = np.zeros(num_buckets, dtype=int)
    perm = np.zeros((num_buckets, per), dtype=int)
    mnz = np.min(np.abs(eigenvalues[np.nonzero(eigenvalues)]))
    scaled = eigenvalues / mnz
    with np.errstate(divide="ignore"):
        log_eigs = np.log2(np.abs(scaled))
    for ind in np.argsort(scaled)[::-1]:
        eligible = (size < per).nonzero()
        i = prod[eligible].argmin(0)
        bucket = eligible[0][i]
        prod[bucket] += log_eigs[ind]
        perm[bucket, size[bucket]] = ind
        size[bucket] += 1
    return perm.reshape(D)


def test_matches_oracle_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        D = rng.choice([8, 16, 32, 128])
        buckets = rng.choice([2, 4, 8])
        eigs = np.abs(rng.randn(D)) * 10 ** rng.randint(-3, 3)
        got = eigenvalue_allocation(buckets, eigs)
        want = oracle_allocation(buckets, eigs)
        np.testing.assert_array_equal(got, want)


def test_matches_oracle_small_eigenvalues():
    # The scaling trick case: eigenvalues < 1.
    rng = np.random.RandomState(1)
    eigs = np.abs(rng.rand(16)) * 1e-4
    np.testing.assert_array_equal(
        eigenvalue_allocation(4, eigs), oracle_allocation(4, eigs))


def test_is_valid_permutation():
    rng = np.random.RandomState(2)
    eigs = np.abs(rng.randn(64))
    perm = eigenvalue_allocation(8, eigs)
    assert sorted(perm.tolist()) == list(range(64))


def test_balances_variance():
    rng = np.random.RandomState(3)
    eigs = np.abs(rng.randn(32)) + 0.1
    perm = eigenvalue_allocation(4, eigs)
    buckets = eigs[perm].reshape(4, 8)
    log_products = np.log2(buckets).sum(axis=1)
    naive = np.log2(eigs.reshape(4, 8)).sum(axis=1)
    assert log_products.std() <= naive.std() + 1e-9


def test_batch_matches_single():
    rng = np.random.RandomState(4)
    eigs = np.abs(rng.randn(16, 32))
    batch = eigenvalue_allocation_batch(4, eigs)
    for v in range(16):
        np.testing.assert_array_equal(batch[v], eigenvalue_allocation(4, eigs[v]))
