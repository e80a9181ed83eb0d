"""End-to-end: dir ingest -> checker -> processor -> searcher -> REST API."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.api.app import make_server
from columbiaimagesearch_tpu.extraction import GenericExtractor
from columbiaimagesearch_tpu.pipeline import (
    ExtractionChecker,
    ExtractionProcessor,
    LocalDirIngester,
    MemoryBus,
    MemoryBusIngester,
    MemoryBusPusher,
)
from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
from columbiaimagesearch_tpu.store import KVIndexer, MemoryStorer


def make_img(group, seed):
    r = np.random.RandomState(1000 * group + seed)
    base = np.zeros((80, 80, 3), np.uint8)
    base[..., group % 3] = 60 + 20 * group
    base[15 + group:60, 10:70, (group + 1) % 3] = 200
    noise = r.randint(0, 30, base.shape, dtype=np.uint8)
    return np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    paths = []
    for g in range(8):
        for s in range(8):
            p = root / f"img_{g}_{s}.png"
            Image.fromarray(make_img(g, s)).save(p)
            paths.append(str(p))

    kv = KVIndexer(path=":memory:")
    extractor = GenericExtractor("full", "sentibank")
    extr_str = "sentibank_feat_full_image"

    bus = MemoryBus()
    checker = ExtractionChecker(
        kv, extr_str, LocalDirIngester(str(root)),
        pusher=MemoryBusPusher(bus, "updates"), batch_update_size=30)
    update_ids = checker.run_once()

    processor = ExtractionProcessor(kv, extractor, nb_threads=4)
    processed = processor.run_once()

    searcher = SearcherLOPQ(
        model_type="lopq", V=4, M=4, subquantizer_clusters=16,
        nb_train=100, nb_min_train=30, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=MemoryStorer(), reranking=True, rerank_nb=64,
        file_input=True)
    return kv, checker, processor, searcher, update_ids, processed, paths, bus


def test_checker_builds_updates(pipeline_env):
    kv, checker, _, _, update_ids, _, paths, bus = pipeline_env
    assert len(update_ids) == 3  # 64 images / 30 per update
    # updates were published on the bus
    consumed = list(MemoryBusIngester(bus, "updates").get_msg_json())
    assert len(consumed) == 3
    # re-running the checker creates no new updates (dedup by seen + processed)
    assert checker.run_once() == []


def test_processor_extracts_all(pipeline_env):
    kv, _, processor, _, update_ids, processed, paths, _ = pipeline_env
    assert set(processed) == set(update_ids)
    # every update marked processed + completed
    for uid in update_ids:
        rows = kv.get_rows_by_batch([uid], kv.table_updateinfos_name)
        cols = rows[0][1]
        assert kv.get_col_upproc() in cols
        assert kv.get_col_upcomp() in cols
    # second pass claims nothing
    assert processor.run_once() == []
    # no missing extractions
    assert processor.check_missing() == []


def test_searcher_over_pipeline_output(pipeline_env):
    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    assert searcher.get_nb_indexed() == 64
    out = searcher.search_image_path_list([paths[27]], {"max_returned": 3})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert block["Distances"][0] < 1e-3  # the indexed image itself


def test_rest_api_end_to_end(pipeline_env):
    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    server = make_server(searcher, endpoint="cuimgsearch", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(mode, **params):
            from urllib.parse import urlencode

            qs = ("?" + urlencode(params)) if params else ""
            url = f"http://127.0.0.1:{port}/cuimgsearch/{mode}{qs}"
            try:
                with urllib.request.urlopen(url) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        # status
        code, d = get("status")
        assert code == 200 and d["status"] == "OK"
        assert int(d["nb_indexed"]) == 64

        # byPATH search
        code, d = get("byPATH", data=paths[10],
                      options='{"max_returned":3}')
        assert code == 200
        assert d["NumberImages"] == 1
        assert "Timing" in d
        block = d["AllSimilarImages"][0]["SimilarImages"]
        assert len(block["ImageSha1s"]) >= 1

        # byB64 via POST
        buf = io.BytesIO()
        Image.fromarray(make_img(2, 3)).save(buf, format="PNG")
        import base64

        body = json.dumps({
            "data": base64.b64encode(buf.getvalue()).decode(),
            "options": {"max_returned": 2},
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/cuimgsearch/byB64", data=body,
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as r:
            d = json.loads(r.read())
        assert d["AllSimilarImages"][0]["SimilarImages"]["Distances"][0] \
            < 1e-3

        # unknown mode -> error
        code, d = get("nope", data="x")
        assert code == 400 and "error" in d

        # bad option filtered with error note
        code, d = get("byPATH", data=paths[0],
                      options='{"bogus":1}')
        assert code == 200 and "Errors" in d

        # check_new_updates (fresh refresh -> no-op, still OK)
        code, d = get("check_new_updates")
        assert code == 200 and d["status"] == "OK"
    finally:
        server.shutdown()


def test_image_downloader_extract_urls():
    from columbiaimagesearch_tpu.pipeline.downloader import ImageDownloader
    from columbiaimagesearch_tpu.pipeline.ingest import (
        MemoryBus,
        MemoryBusIngester,
        MemoryBusPusher,
    )

    bus = MemoryBus()
    dl = ImageDownloader(MemoryBusIngester(bus, "docs"),
                         MemoryBusPusher(bus, "images"), nb_threads=2)
    doc = {"objects": [{"obj_stored_url": "http://a/x.jpg"},
                       {"obj_original_url": "http://b/y.jpg"}],
           "url": "http://a/x.jpg"}
    urls = dl.extract_urls(doc)
    assert urls == ["http://a/x.jpg", "http://b/y.jpg"]  # deduped, ordered

    # Downloads fail fast against unreachable URLs -> no messages, no crash.
    bus.publish("docs", doc)
    emitted = dl.run_once()
    assert emitted == 0
    assert dl.stats.failed == 2


def test_processor_claim_prevents_double_processing(pipeline_env):
    """A second processor must not re-claim fresh 'started' updates, but a
    stale claim (older than time_elapsed_failed) is re-claimable
    (reference: extraction_processor.py:247-293 + TIME_ELAPSED_FAILED)."""
    import time as _time

    from columbiaimagesearch_tpu.pipeline.processor import ExtractionProcessor

    kv, _, processor, _, _, _, _, _ = pipeline_env
    uid = "index_update_sentibank_feat_full_image_2099-01-01_000"
    kv.push_dict_rows(
        {uid: {kv.get_col_listsha1s(): "", kv.get_col_upcreate(): "x",
               kv.get_col_upstart(): str(_time.time())}},
        kv.table_updateinfos_name)
    rows = kv.get_rows_by_batch([uid], kv.table_updateinfos_name)
    assert not processor.is_update_claimable(rows[0][1])
    # stale claim -> reclaimable
    kv.push_dict_rows(
        {uid: {kv.get_col_upstart(): str(_time.time() - 10_000)}},
        kv.table_updateinfos_name)
    rows = kv.get_rows_by_batch([uid], kv.table_updateinfos_name)
    assert processor.is_update_claimable(rows[0][1])
    # processed -> never claimable
    kv.push_dict_rows({uid: {kv.get_col_upproc(): "1"}},
                      kv.table_updateinfos_name)
    rows = kv.get_rows_by_batch([uid], kv.table_updateinfos_name)
    assert not processor.is_update_claimable(rows[0][1])
    kv.delete_row(kv.table_updateinfos_name, uid)


def test_update_ids_unique_across_restarts(tmp_path):
    """Two checker generations on the same day must never overwrite each
    other's update rows (reference: extraction_checker.py:200-203 pid+time
    suffix; plus the indexer seeds its daily counter from the table)."""
    from columbiaimagesearch_tpu.pipeline.ingest import LocalDirIngester

    root = tmp_path / "imgs"
    root.mkdir()
    for g in range(2):
        for s in range(4):
            Image.fromarray(make_img(g, s)).save(
                root / f"r{g}_{s}.png")

    db = str(tmp_path / "kv.sqlite")
    extr_str = "sentibank_feat_full_image"

    kv1 = KVIndexer(path=db)
    checker1 = ExtractionChecker(kv1, extr_str, LocalDirIngester(str(root)),
                                 batch_update_size=2)
    ids1 = checker1.run_once()
    assert len(ids1) == 4

    # "Restart": fresh indexer (counter state lost) + fresh checker, with
    # brand-new images so the processed-dedup doesn't hide the collision.
    for g in range(2):
        for s in range(4):
            Image.fromarray(make_img(g + 4, s + 50)).save(
                root / f"r2_{g}_{s}.png")
    kv2 = KVIndexer(path=db)
    checker2 = ExtractionChecker(kv2, extr_str, LocalDirIngester(str(root)),
                                 batch_update_size=2)
    ids2 = checker2.run_once()
    assert len(ids2) == 4

    assert not (set(ids1) & set(ids2))
    # every update row still present with its own sha1 list
    rows = {r: c for batch in kv2.get_updates_from_date(
        "1970-01-01", extr_type=extr_str) for r, c in batch}
    assert set(ids1) | set(ids2) <= set(rows)
    # the table-seeded counter also keeps the *sequence* part monotonic
    seqs1 = {u.rsplit("-", 2)[0] for u in ids1}  # strip -pp-time suffix
    seqs2 = {u.rsplit("-", 2)[0] for u in ids2}
    assert not (seqs1 & seqs2)


def test_concurrent_serving(pipeline_env):
    """N parallel clients against one device-resident searcher: all queries
    must succeed and return the same results as serial execution (the role
    of the reference's gunicorn multi-worker serving,
    api/gunicorn_api.py:21-75, played by the threaded server + device
    batching)."""
    from urllib.parse import urlencode

    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    server = make_server(searcher, endpoint="cuimgsearch", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def query(path):
            qs = urlencode({"data": path, "options": '{"max_returned":3}'})
            url = f"http://127.0.0.1:{port}/cuimgsearch/byPATH?{qs}"
            with urllib.request.urlopen(url, timeout=120) as r:
                return r.status, json.loads(r.read())

        targets = [paths[i] for i in (3, 11, 27, 42, 55, 60, 7, 33)]
        serial = {p: query(p) for p in targets}

        results = {}
        errs = []

        def worker(p):
            try:
                results[p] = query(p)
            except Exception as inst:  # pragma: no cover - failure reporting
                errs.append((p, inst))

        threads = [threading.Thread(target=worker, args=(p,))
                   for p in targets * 2]  # 16 concurrent requests
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        for p in targets:
            code, d = results[p]
            scode, sd = serial[p]
            assert code == scode == 200
            a = d["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"]
            b = sd["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"]
            assert a == b, p
    finally:
        server.shutdown()


def test_view_similar_html(pipeline_env):
    """view_similar_byPATH renders HTML; blurred by default, unblurred with
    no_blur (reference template view_similar_images.html blur CSS)."""
    from columbiaimagesearch_tpu.api.app import SearchAPI

    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    api = SearchAPI(searcher)
    code, html = api.process("view_similar_byPATH", paths[5],
                             '{"max_returned": 2}')
    assert code == 200 and html.startswith("<html>")
    assert "blur(8px)" in html  # blur by default, like the reference
    code, html2 = api.process("view_similar_byPATH", paths[5],
                              '{"max_returned": 2, "no_blur": true}')
    assert code == 200 and "blur(8px)" not in html2
    assert "<img class='sim'" in html2


def test_wsgi_app(pipeline_env):
    """The WSGI adapter serves the same modes under any WSGI server
    (reference gunicorn role, api/gunicorn_api.py:21-75)."""
    from wsgiref.util import setup_testing_defaults

    from columbiaimagesearch_tpu.api.app import wsgi_app

    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    app = wsgi_app(searcher)
    state = {}

    def start_response(status, headers):
        state["status"] = status
        state["headers"] = dict(headers)

    def call(path, qs="", method="GET", body=b"", ctype=""):
        environ = {}
        setup_testing_defaults(environ)
        environ.update({"PATH_INFO": path, "QUERY_STRING": qs,
                        "REQUEST_METHOD": method,
                        "CONTENT_LENGTH": str(len(body)),
                        "CONTENT_TYPE": ctype})
        if body:
            environ["wsgi.input"] = io.BytesIO(body)
        out = b"".join(app(environ, start_response))
        return state["status"], out

    status, out = call("/cuimgsearch/status")
    assert status == "200 OK" and json.loads(out)["status"] == "OK"

    from urllib.parse import urlencode

    status, out = call("/cuimgsearch/byPATH",
                       qs=urlencode({"data": paths[3],
                                     "options": '{"max_returned":2}'}))
    d = json.loads(out)
    assert status == "200 OK" and d["NumberImages"] == 1
    assert d["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"]

    # POST form body
    body = urlencode({"data": paths[4],
                      "options": '{"max_returned":1}'}).encode()
    status, out = call("/cuimgsearch/byPATH", method="POST", body=body,
                       ctype="application/x-www-form-urlencoded")
    assert status == "200 OK" and json.loads(out)["NumberImages"] == 1

    status, out = call("/nope/status")
    assert status.startswith("404")


def test_view_image_sha1_embeds_buffer(pipeline_env):
    """Stored image buffers render as base64 data URIs
    (reference api/api.py:410-538 B64 embedding)."""
    import base64

    from columbiaimagesearch_tpu.api.app import SearchAPI
    from columbiaimagesearch_tpu.imgio.imgio import (
        get_buffer_from_filepath,
        get_SHA1_from_buffer,
    )

    kv, _, _, searcher, _, _, paths, _ = pipeline_env
    api = SearchAPI(searcher)
    buf = get_buffer_from_filepath(paths[0])
    sha1 = get_SHA1_from_buffer(buf)

    # URL-only row -> plain src
    code, html = api.process("view_image_sha1", sha1)
    assert code == 200 and sha1 in html and "data:image" not in html

    # add a stored buffer -> data URI
    buf.seek(0)
    kv.push_dict_rows(
        {sha1: {kv.get_col_imgbuff():
                base64.b64encode(buf.read()).decode()}},
        kv.table_sha1infos_name)
    code, html = api.process("view_image_sha1", sha1)
    assert code == 200 and "data:image/jpeg;base64," in html
