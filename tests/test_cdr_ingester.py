"""CDRIngester contract tests with an injected in-memory ES fake.

Covers the logic the reference exercises against a live cluster
(reference: cufacesearch/ingester/kafka_cdr_ingester.py:65-120):
scroll pagination to batch_size, retry-with-pause on transient client
errors, and pushing each hit's _source onto the bus.
"""

from columbiaimagesearch_tpu.pipeline.cdr_ingester import CDRIngester
from columbiaimagesearch_tpu.pipeline.ingest import MemoryBus, MemoryBusPusher


class FakeES:
    """search() returns the first page; scroll() pages the rest. The
    optional fail-plan raises once per flagged call to exercise retry."""

    def __init__(self, docs, page=3, fail_first_search=False,
                 fail_scroll_ids=()):
        self.docs = docs
        self.page = page
        self.fail_first_search = fail_first_search
        self.fail_scroll_ids = set(fail_scroll_ids)
        self.search_calls = 0
        self.scroll_calls = 0

    def _page(self, start):
        hits = [{"_id": str(i), "_source": d}
                for i, d in enumerate(self.docs[start:start + self.page],
                                      start)]
        nxt = start + self.page
        return {"hits": {"hits": hits},
                "_scroll_id": f"s{nxt}" if nxt < len(self.docs) else None}

    def search(self, **kw):
        self.search_calls += 1
        if self.fail_first_search and self.search_calls == 1:
            raise ConnectionError("ES search timeout")
        return self._page(0)

    def scroll(self, scroll_id=None, scroll=None):
        self.scroll_calls += 1
        if scroll_id in self.fail_scroll_ids:
            self.fail_scroll_ids.discard(scroll_id)
            raise ConnectionError("ES scroll timeout")
        return self._page(int(scroll_id[1:]))


def _docs(n):
    return [{"team": "HG", "obj_stored_url": f"img/{i}.jpg"}
            for i in range(n)]


def test_scroll_paginates_to_batch_size():
    es = FakeES(_docs(20), page=3)
    ing = CDRIngester(pusher=None, batch_size=10, client=es)
    hits = ing.get_batch()
    assert len(hits) == 10
    assert [h["_source"]["obj_stored_url"] for h in hits] == [
        f"img/{i}.jpg" for i in range(10)]
    assert es.scroll_calls >= 3  # paged past the first search page


def test_short_source_returns_everything():
    es = FakeES(_docs(4), page=3)
    ing = CDRIngester(pusher=None, batch_size=10, client=es)
    assert len(ing.get_batch()) == 4


def test_retry_on_transient_errors():
    sleeps = []
    es = FakeES(_docs(8), page=3, fail_first_search=True,
                fail_scroll_ids={"s3"})
    ing = CDRIngester(pusher=None, batch_size=8, client=es,
                      sleep_fn=sleeps.append)
    hits = ing.get_batch()
    assert len(hits) == 8
    assert len(sleeps) == 2  # one search retry + one scroll retry
    assert es.search_calls == 2


def test_push_batch_lands_sources_on_the_bus():
    bus = MemoryBus()
    es = FakeES(_docs(5), page=2)
    ing = CDRIngester(pusher=MemoryBusPusher(bus, "cdr"), batch_size=5,
                      client=es)
    assert ing.push_batch() == 5
    msgs = bus.topics["cdr"]
    assert msgs[0]["obj_stored_url"] == "img/0.jpg"
    assert len(msgs) == 5


def test_from_conf_reads_prefixed_params():
    conf = {"ES_es_index": "memex-domains", "ES_es_doc_type": "domain",
            "ES_es_instance": "es.example.org", "ES_es_user": "u",
            "ES_es_pass": "p", "ES_obj_stored_prefix": "https://s3/bucket/",
            "ES_batch_size": 7}
    ing = CDRIngester.from_conf(conf, pusher=None, client=FakeES(_docs(1)))
    assert ing.els_index == "memex-domains"
    assert ing.batch_size == 7
    assert ing.get_prefix() == "https://s3/bucket/"
