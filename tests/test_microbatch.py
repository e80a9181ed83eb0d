"""Cross-request micro-batching (api/microbatch.py + the coalesced serving
path in generic_searcher/searcher_lopq).

The reference scales serving with gunicorn worker replication
(reference: api/gunicorn_api.py:21-75); here one resident index melds
concurrent requests into one device wave. These tests check (a) the
MicroBatcher primitive itself and (b) that coalesced serving returns
bit-identical responses to sequential serving.
"""

import io
import json
import threading
import time
import urllib.request
from urllib.parse import urlencode

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.api.app import make_server
from columbiaimagesearch_tpu.api.microbatch import MicroBatcher
from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
from columbiaimagesearch_tpu.store import KVIndexer, MemoryStorer

# ---------------------------------------------------------------- unit


def test_batcher_coalesces_concurrent_submits():
    seen = []
    gate = threading.Event()

    def batch_fn(items):
        seen.append(list(items))
        return [x * 10 for x in items]

    b = MicroBatcher(batch_fn, max_batch=8, window_ms=80.0)
    try:
        results = {}

        def worker(x):
            gate.wait()
            results[x] = b.submit(x)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        gate.set()
        for t in threads:
            t.join(timeout=30)
        assert results == {i: i * 10 for i in range(6)}
        # all 6 landed in far fewer than 6 batches; at least one coalesced
        assert max(b.batch_sizes) > 1
        assert sum(b.batch_sizes) == 6
    finally:
        b.close()


def test_batcher_max_batch_respected():
    b = MicroBatcher(lambda items: items, max_batch=2, window_ms=200.0)
    try:
        out = []
        threads = [threading.Thread(target=lambda i=i: out.append(b.submit(i)))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert sorted(out) == [0, 1, 2, 3, 4]
        assert all(s <= 2 for s in b.batch_sizes)
    finally:
        b.close()


def test_batcher_per_item_and_batch_errors():
    def batch_fn(items):
        if "boom_all" in items:
            raise RuntimeError("whole batch")
        return [ValueError(x) if x == "bad" else x for x in items]

    b = MicroBatcher(batch_fn, max_batch=4, window_ms=5.0)
    try:
        assert b.submit("ok") == "ok"
        with pytest.raises(ValueError):
            b.submit("bad")
        with pytest.raises(RuntimeError):
            b.submit("boom_all")
        # the batcher survives failures
        assert b.submit("still ok") == "still ok"
    finally:
        b.close()


def test_batcher_close_rejects_new_submits():
    b = MicroBatcher(lambda items: items, max_batch=2, window_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(1)


# ------------------------------------------------------- serving parity


def _make_img(group, seed):
    r = np.random.RandomState(1000 * group + seed)
    base = np.zeros((80, 80, 3), np.uint8)
    base[..., group % 3] = 60 + 20 * group
    base[15 + group:60, 10:70, (group + 1) % 3] = 200
    noise = r.randint(0, 30, base.shape, dtype=np.uint8)
    return np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def serving_pair(tmp_path_factory):
    """Two searchers over the same trained model + codes: one sequential,
    one coalescing. Tiny config; images indexed via compute_codes."""
    root = tmp_path_factory.mktemp("imgs")
    paths = []
    for g in range(4):
        for s in range(4):
            p = root / f"img_{g}_{s}.png"
            Image.fromarray(_make_img(g, s)).save(p)
            paths.append(str(p))

    # SentibankFeaturizer init is deterministic, so a standalone instance
    # produces the same features as the searchers' own.
    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer

    bufs = []
    for p in paths:
        with open(p, "rb") as f:
            bufs.append(f.read())
    feats, status = SentibankFeaturizer().featurize_buffers(bufs)
    assert not any(status)
    X = np.asarray(feats, np.float32)
    rng = np.random.RandomState(0)
    train = (np.concatenate([X] * 8)
             + 0.01 * rng.randn(len(X) * 8, X.shape[1])).astype(np.float32)
    model = LOPQModel(V=4, M=4, subquantizer_clusters=16)
    model.fit(train, n_init=1, random_state=0)
    codes = model.predict_batch(X)
    sha1s = [f"{i:040d}" for i in range(len(X))]

    def build(**kw):
        kv = KVIndexer(path=":memory:")
        s = SearcherLOPQ(
            model_type="lopq", V=4, M=4, subquantizer_clusters=16,
            model=model, detector_type="full", featurizer_type="sentibank",
            indexer=kv, storer=MemoryStorer(), file_input=True, **kw)
        s.searcher.add_codes(codes, ids=sha1s)
        return s

    seq = build()
    coal = build(coalesce_window_ms=60.0, coalesce_max_batch=8)
    return seq, coal, paths


def test_coalesced_serving_matches_sequential(serving_pair):
    seq, coal, paths = serving_pair
    opts = {"max_returned": 3}
    expected = [seq.search_image_path_list([p], dict(opts)) for p in paths]

    server = make_server(coal, endpoint="cuimgsearch", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def query(path):
            qs = urlencode({"data": path,
                            "options": json.dumps(opts)})
            url = f"http://127.0.0.1:{port}/cuimgsearch/byPATH?{qs}"
            with urllib.request.urlopen(url, timeout=120) as r:
                return json.loads(r.read())

        results = {}
        errs = []

        def worker(i):
            try:
                results[i] = query(paths[i])
            except Exception as inst:  # pragma: no cover
                errs.append((i, inst))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(paths))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        for i in range(len(paths)):
            got = results[i]["AllSimilarImages"][0]["SimilarImages"]
            want = expected[i]["AllSimilarImages"][0]["SimilarImages"]
            assert got["ImageSha1s"] == want["ImageSha1s"], i
            assert got["Distances"] == pytest.approx(want["Distances"])
        # concurrency actually coalesced: at least one multi-request wave
        assert max(coal.request_batcher.batch_sizes) > 1
    finally:
        server.shutdown()


def test_coalesced_mixed_options_grouped_not_mixed_up(serving_pair):
    """Requests with different options in one batch must each get their
    own parameters applied (grouped by params inside
    search_from_feats_multi)."""
    _, coal, paths = serving_pair
    reqs = [(paths[1], {"max_returned": 2}),
            (paths[2], {"max_returned": 5}),
            (paths[3], {"max_returned": 2})]
    results = {}
    gate = threading.Event()

    def worker(i, p, o):
        gate.wait()
        results[i] = coal.search_image_path_list([p], dict(o))

    threads = [threading.Thread(target=worker, args=(i, p, o))
               for i, (p, o) in enumerate(reqs)]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3
    for i, (_, o) in enumerate(reqs):
        block = results[i]["AllSimilarImages"][0]["SimilarImages"]
        assert len(block["ImageSha1s"]) <= o["max_returned"]
    assert len(results[1]["AllSimilarImages"][0]["SimilarImages"]
               ["ImageSha1s"]) == 5


def test_serve_batch_isolates_bad_request(serving_pair):
    """A request whose image fails to decode errors alone; the melded
    good request still succeeds."""
    _, coal, paths = serving_pair
    results, errors = {}, {}
    gate = threading.Event()

    def good():
        gate.wait()
        results["good"] = coal.search_image_path_list(
            [paths[0]], {"max_returned": 2})

    def bad():
        gate.wait()
        try:
            # nonexistent path -> load_fn raises in the caller thread
            coal.search_image_path_list(["/nonexistent/img.png"],
                                        {"max_returned": 2})
        except Exception as inst:  # noqa: BLE001
            errors["bad"] = inst

    threads = [threading.Thread(target=good), threading.Thread(target=bad)]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join(timeout=300)
    assert "bad" in errors
    block = results["good"]["AllSimilarImages"][0]["SimilarImages"]
    assert len(block["ImageSha1s"]) > 0


def test_wave_uses_handler_decoded_pixels(serving_pair):
    """Request decode runs in the handler thread (_prepare_request
    attaches "pixels"), so the device wave takes the pixel route
    (featurize_pixel_wave) instead of re-decoding inside the coalescer
    worker — and the response is identical to the sequential searcher's."""
    seq, coal, paths = serving_pair
    opts = {"max_returned": 3}
    calls = []
    orig = coal.featurizer.featurize_pixel_wave

    def counting(stack):
        calls.append(len(stack))
        return orig(stack)

    coal.featurizer.featurize_pixel_wave = counting
    try:
        out = coal.search_image_path_list([paths[0]], dict(opts))
    finally:
        coal.featurizer.featurize_pixel_wave = orig
    assert calls, "coalesced wave did not take the pixel route"
    assert out == seq.search_image_path_list([paths[0]], dict(opts))
