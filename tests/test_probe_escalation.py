"""Adaptive probe escalation: the device searcher must honor the
reference's quota contract (probe until ``quota`` candidates or the grid
is exhausted, lopq/lopq/search.py:110-135) even when the candidates live
outside the default B=64 probe grid."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU

from tests.oracle_lopq import adc_distance, random_params


@pytest.fixture(scope="module")
def hard_setup():
    """An index whose every row lives in cells formed from the 64
    FARTHEST coarse clusters per split for the probe query: the default
    B=64 grid finds zero candidates, so only escalation (or the host
    searcher's exhaustive multisequence walk) can satisfy the quota."""
    rng = np.random.RandomState(7)
    V, M, S, D = 128, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    q = rng.randn(D).astype(np.float32)

    Cs = params[0]
    h0, h1 = np.split(q, 2)
    far0 = np.argsort(((h0[None] - Cs[0]) ** 2).sum(1))[64:]
    far1 = np.argsort(((h1[None] - Cs[1]) ** 2).sum(1))[64:]
    n = 500
    coarse = np.stack([rng.choice(far0, n), rng.choice(far1, n)], axis=1)
    fine = rng.randint(0, S, (n, M))
    ids = [f"hard_{i}" for i in range(n)]
    return model, params, q, coarse, fine, ids


def test_pinned_narrow_probe_misses(hard_setup):
    """Sanity: without escalation (probe_width=64 pinned) the narrow grid
    finds nothing — the regression the ladder exists to fix."""
    model, params, q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model, probe_width=64)
    s.add_codes((coarse, fine), ids)
    results, _ = s.search(q, quota=50, limit=10, with_dists=True)
    assert len(results) == 0


def test_search_escalates_to_quota(hard_setup):
    model, params, q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    results, visited = s.search(q, quota=50, limit=10, with_dists=True)
    assert len(results) == 10
    # Distances must match the independent ADC oracle.
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)
    r_host, _ = s_host.search(q, quota=50, limit=10, with_dists=True)
    np.testing.assert_allclose(
        [r.dist for r in results], [r.dist for r in r_host],
        rtol=1e-3, atol=1e-4)
    for r in results[:5]:
        want = adc_distance(q, r.code.coarse, r.code.fine, *params)
        np.testing.assert_allclose(r.dist, want, rtol=1e-3, atol=1e-4)


def test_search_batch_escalates_only_shortfall(hard_setup):
    """A wave mixing an easy query (candidates inside the narrow grid)
    with the hard one: both must meet the quota, and results must match
    the host oracle per query."""
    model, params, q, coarse, fine, ids = hard_setup
    rng = np.random.RandomState(11)
    Cs = params[0]
    # Easy query: sits right on the cell of the first indexed row.
    c0, c1 = coarse[0]
    q_easy = np.concatenate([Cs[0][c0], Cs[1][c1]]).astype(np.float32)

    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)

    waves = s.search_batch(np.stack([q_easy, q]), quota=50, limit=10,
                           with_dists=True)
    assert len(waves) == 2
    for query, (results, _) in zip([q_easy, q], waves):
        r_host, _ = s_host.search(query, quota=50, limit=10, with_dists=True)
        assert len(results) == len(r_host)
        np.testing.assert_allclose(
            [r.dist for r in results], [r.dist for r in r_host],
            rtol=1e-3, atol=1e-4)


def test_sharded_batch_escalates(hard_setup):
    """The mesh fan-out honors the quota contract, batched. Each shard
    probes until ITS candidate count covers the quota, so it walks at
    least as far down the multisequence order as the reference's global
    walk — the merged results must therefore (a) meet the quota, (b) be
    per-id oracle-exact, and (c) dominate the host searcher's results
    (elementwise nearer-or-equal)."""
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    model, params, q, coarse, fine, ids = hard_setup
    code_of = {ids[i]: (coarse[i], fine[i]) for i in range(len(ids))}
    idx = ShardedLOPQIndex(model)
    idx.build(coarse, fine, ids)
    waves = idx.search_batch(np.stack([q, q * 0.5]), quota=50, limit=10)
    assert len(waves) == 2
    pairs, visited = waves[0]
    assert len(pairs) == 10
    for rid, d in pairs[:5]:
        co, fi = code_of[rid]
        want = adc_distance(q, tuple(co), tuple(fi), *params)
        np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-4)
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)
    r_host, _ = s_host.search(q, quota=50, limit=10, with_dists=True)
    dev_d = np.asarray([d for _, d in pairs])
    host_d = np.asarray([r.dist for r in r_host])
    assert np.all(dev_d <= host_d + 1e-3)


def test_quota_capped_by_index_size(hard_setup):
    """quota > nb_indexed must not escalate forever / fail: the effective
    quota is min(quota, nb_indexed) (the whole index is the best any
    probe can do — reference get_result_quota simply runs out of cells)."""
    model, params, q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse[:20], fine[:20]), ids[:20])
    results, _ = s.search(q, quota=10000, limit=5, with_dists=True)
    assert len(results) == 5


def test_fused_device_feats_escalate(hard_setup):
    """search_device_feats (the fused serving path) escalates too."""
    import jax.numpy as jnp

    model, params, q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    # Raw (pre-normalize) feature: scale the query arbitrarily.
    raw = jnp.asarray(np.stack([q * 3.7]))
    waves = s.search_device_feats(raw, quota=50, limit=10)
    results, _ = waves[0]
    assert len(results) == 10
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)
    r_host, _ = s_host.search(q / np.linalg.norm(q), quota=50, limit=10,
                              with_dists=True)
    np.testing.assert_allclose(
        [r.dist for r in results], [r.dist for r in r_host],
        rtol=1e-3, atol=1e-4)


def test_tier_hint_hysteresis(hard_setup):
    """When every wave blows through the narrow rung, later waves start
    directly at the wider rung (no repeated doomed narrow pass); results
    stay oracle-correct, and the periodic re-probe lets the hint drop
    back once the workload eases."""
    model, params, q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    s.REPROBE_EVERY = 4
    s.add_codes((coarse, fine), ids)
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)
    r_host, _ = s_host.search(q, quota=50, limit=10, with_dists=True)

    assert s._tier_hint == 0
    for _ in range(3):
        results, _ = s.search_batch(q[None], quota=50, limit=10,
                                    with_dists=True)[0]
        np.testing.assert_allclose(
            [r.dist for r in results], [r.dist for r in r_host],
            rtol=1e-3, atol=1e-4)
    assert s._tier_hint >= 1  # hard waves promoted the start rung

    # Easy workload: quota satisfied at the wide rung keeps the hint
    # there, and the periodic re-probe (every 4th wave) discovers the
    # narrow rung suffices again.
    c0, c1 = coarse[0]
    Cs = params[0]
    q_easy = np.concatenate([Cs[0][c0], Cs[1][c1]]).astype(np.float32)
    for _ in range(10):
        res, _ = s.search_batch(q_easy[None], quota=1, limit=5,
                                with_dists=True)[0]
        assert res
    assert s._tier_hint == 0


def test_probe_stats_observability(hard_setup):
    """The device searcher counts serving waves and escalated queries for
    /status (searcher_lopq.status surfaces them as probe_*)."""
    model, _params, hard_q, coarse, fine, ids = hard_setup
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    # Pin the quota-aware rung floor to the narrow rung (a huge observed
    # yield estimate says "one cell covers any quota") so the wave MUST
    # start at B=64 and the escalation is observable in the stats.
    s._yield_ema = 1e9
    w0 = s.probe_stats["waves"]
    s.search_batch(np.stack([hard_q, hard_q]), quota=len(ids), limit=5)
    assert s.probe_stats["waves"] == w0 + 1
    # hard_setup places every row outside the B=64 grid, so both queries
    # of the wave MUST count as escalated.
    assert s.probe_stats["escalated_queries"] == 2


def test_hint_decay_sticks_against_stale_wide_wave(hard_setup, monkeypatch):
    """A wave satisfied AT its start rung is no evidence that rung is
    needed — it must not raise the tier hint. Regression for the r05
    realfeat serving pin: under concurrent clients, waves launched
    before a re-probe decay finished at the old wide rung and re-pinned
    the hint via max(), so the decay never stuck and 100+ waves paid the
    110 ms top rung (510 ms p50 vs ~190 expected)."""
    import threading

    import columbiaimagesearch_tpu.index.tpu_query as tq
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    model, _params, _q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)
    s._pack_locked()
    ladder = s._probe_ladder()
    top = len(ladder) - 1
    assert top >= 1

    wide_entered = threading.Event()
    release_wide = threading.Event()

    def fake_escalate(run_tier, ladder_tail, n, quota, nb, K_pad):
        rows = np.zeros((n, 1), np.int32)
        dists = np.zeros((n, 1), np.float32)
        nc = np.zeros(n, np.int32)
        if len(ladder_tail) == len(ladder) - top:  # the stale wide wave
            wide_entered.set()
            assert release_wide.wait(10)
        # Satisfied at the start rung: settle=0, settled=True.
        return rows, dists, nc, 0.0, 0, 5.0, True

    monkeypatch.setattr(tq, "escalate_probe", fake_escalate)
    monkeypatch.setattr(tq, "rung_floor", lambda *a, **k: 0)

    s._tier_hint = top          # imprinted wide (e.g. a cold OOD wave)
    s.REPROBE_EVERY = 10**9     # the wide wave must not be the re-probe

    t = threading.Thread(target=lambda: s._escalate(
        lambda idx, rung: None, 1, 50, s.nb_indexed, 1))
    t.start()
    assert wide_entered.wait(10)    # captured start=top, now in flight

    # A re-probe wave from the floor settles at rung 0 -> decay.
    s._wave_i = -1                  # next wave hits the re-probe branch
    s.REPROBE_EVERY = 1
    s._escalate(lambda idx, rung: None, 1, 50, s.nb_indexed, 1)
    assert s._tier_hint == 0

    release_wide.set()
    t.join(10)
    # The stale wide wave (satisfied at ITS start) must not re-pin.
    assert s._tier_hint == 0


def test_brute_plan_costs_actual_start_rung(hard_setup, monkeypatch):
    """_use_brute must cost the rung the wave will ACTUALLY start at
    (max(floor, tier_hint)), not the optimistic floor — a pinned-wide
    hint made the r05 realfeat-10M serving pay 124 top-rung (~110 ms)
    waves where brute was ~15 ms/query. And a brute takeover must not
    freeze the hint forever: every REPROBE_EVERY-th hint-driven brute
    wave runs the ladder from the floor instead."""
    import columbiaimagesearch_tpu.index.tpu_query as tq
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    model, _params, _q, coarse, fine, ids = hard_setup
    s = LOPQSearcherTPU(model)
    rng = np.random.RandomState(3)
    feats = rng.randn(len(ids), 32).astype(np.float32)
    s.add_codes((coarse, fine), ids, feats=feats)
    s._pack_locked()
    d = s._dev
    ladder = s._probe_ladder()
    top = len(ladder) - 1

    seen_tails = []

    def fake_prefer(tail, nq, nb, V):
        seen_tails.append(len(tail))
        return len(tail) <= len(ladder) - top  # brute wins only at top

    monkeypatch.setattr(tq, "prefer_brute", fake_prefer)
    monkeypatch.setattr(tq, "rung_floor", lambda *a, **k: 0)

    s._tier_hint = 0
    assert not s._use_brute(d, 4, 10_000, s.nb_indexed, 100)
    assert seen_tails[-1] == len(ladder)  # costed from the floor

    s._tier_hint = top
    assert s._use_brute(d, 4, 10_000, s.nb_indexed, 100)
    assert seen_tails[-1] == len(ladder) - top  # costed from the hint

    # The REPROBE_EVERY-th hint-driven brute wave yields to the ladder
    # and forces the next escalation to start from the floor.
    s.REPROBE_EVERY = 4
    s._brute_i = 0
    picks = [s._use_brute(d, 4, 10_000, s.nb_indexed, 100)
             for _ in range(8)]
    assert picks == [True, True, True, False, True, True, True, False]
    assert s._force_reprobe

    calls = {}

    def fake_escalate(run_tier, ladder_tail, n, quota, nb, K_pad):
        calls["tail"] = len(ladder_tail)
        rows = np.zeros((n, 1), np.int32)
        return (rows, np.zeros((n, 1), np.float32),
                np.zeros(n, np.int32), 0.0, 0, 5.0, True)

    monkeypatch.setattr(tq, "escalate_probe", fake_escalate)
    s._escalate(lambda idx, rung: None, 1, 50, s.nb_indexed, 1)
    assert calls["tail"] == len(ladder)  # started from the floor
    assert not s._force_reprobe          # consumed
