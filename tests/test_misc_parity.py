"""Smaller parity behaviors: output modes, row guards, journal resume."""

import json

import numpy as np

from columbiaimagesearch_tpu.pipeline.ingest import (
    MemoryBus,
    MemoryBusIngester,
    MemoryBusPusher,
)
from columbiaimagesearch_tpu.searcher.output_mapping import DictOutput
from columbiaimagesearch_tpu.store.kvindexer import MAX_ROW_SIZE, KVIndexer
from columbiaimagesearch_tpu.utils.xvecs import load_xvecs, save_xvecs


def test_dict_output_snake_case_mode():
    do = DictOutput(mode="old")
    assert do.map["query_sha1"] == "query_sha1"
    assert do.map["all_similar_images"] == "all_similar_images"
    out = do.format_output([("SHA", None)], [[[("SHA2",)]]], [], [[[0.5]]])
    assert out["number_images"] == 1
    assert out["all_similar_images"][0]["similar_images"]["distances"] == [0.5]


def test_dict_output_face_mode():
    do = DictOutput()
    dets = [("SHA", [{"left": 1, "top": 2, "right": 3, "bottom": 4,
                      "score": 0.9}], "http://u", "JPEG", 10, 10)]
    sim_images = [[[("S2", {"info:s3_url": b"http://x "})]]]
    sim_dets = [[["S2_5_6_7_8"]]]
    sim_score = [[[0.25]]]
    out = do.format_output(dets, sim_images, sim_dets, sim_score,
                           input_type="face")
    entry = out["AllSimilarFaces"][0]
    block = entry["SimilarFaces"]
    assert block["Faces"][0] == {"left": 5, "top": 6, "right": 7, "bottom": 8}
    assert block["CachedImageURLs"] == ["http://x"]
    assert block["Distances"] == [0.25]
    assert out["NumberFaces"] == 1


def test_kvindexer_row_size_guard_drops_buffer():
    kv = KVIndexer(path=":memory:")
    big = "x" * (MAX_ROW_SIZE + 1)
    kv.push_dict_rows(
        {"R1": {kv.get_col_imgbuff(): big, "info:s3_url": "http://a"}},
        kv.table_sha1infos_name)
    rows = kv.get_rows_by_batch(["R1"], kv.table_sha1infos_name)
    cols = rows[0][1]
    assert kv.get_col_imgbuff() not in cols  # oversized buffer dropped
    assert cols["info:s3_url"] == b"http://a"


def test_kvindexer_scan_pagination():
    kv = KVIndexer(path=":memory:")
    kv.push_dict_rows({f"row{i:03d}": {"info:a": str(i)} for i in range(25)},
                      "t")
    page1 = kv.scan_from_row("t", maxrows=10)
    assert len(page1) == 10 and page1[0][0] == "row000"
    page2 = kv.scan_from_row("t", row_start=page1[-1][0] + "~", maxrows=10)
    assert len(page2) == 10 and page2[0][0] == "row010"


def test_memory_bus_journal_resume(tmp_path):
    journal = str(tmp_path / "offsets.json")
    bus = MemoryBus(journal_path=journal)
    p = MemoryBusPusher(bus, "t")
    for i in range(5):
        p.send({"i": i})
    got = [m["i"] for m in MemoryBusIngester(bus, "t", "g").get_msg_json()]
    assert got == [0, 1, 2, 3, 4]
    # A new bus over the same journal resumes past consumed offsets
    # (the Kinesis sequence-number journal semantics).
    bus2 = MemoryBus(journal_path=journal)
    for i in range(5, 8):
        bus2.publish("t", {"i": i})
    got2 = [m["i"] for m in MemoryBusIngester(bus2, "t", "g").get_msg_json()]
    assert got2 == [5, 6, 7]
    assert MemoryBus(journal_path=journal).offsets["t:g"] == 8


def test_xvecs_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.randn(10, 16).astype(np.float32)
    path = str(tmp_path / "a.fvecs")
    save_xvecs(X, path, "f")
    Y = load_xvecs(path, "f")
    np.testing.assert_allclose(X, Y, rtol=1e-6)
    save_xvecs(np.arange(12).reshape(3, 4), str(tmp_path / "b.ivecs"), "i")
    Z = load_xvecs(str(tmp_path / "b.ivecs"), "i")
    np.testing.assert_array_equal(Z, np.arange(12).reshape(3, 4))


def test_kafka_kinesis_backends_gated():
    import pytest as _pytest

    from columbiaimagesearch_tpu.pipeline.kafka_backend import KafkaIngester
    from columbiaimagesearch_tpu.pipeline.kinesis_backend import KinesisPusher

    with _pytest.raises(ImportError, match="kafka-python"):
        KafkaIngester("t", "localhost:9092")
    with _pytest.raises(ImportError, match="boto3"):
        KinesisPusher("s")


def test_memory_bus_journal_scales_and_compacts(tmp_path):
    """Append-only journal: 20k messages must ingest in seconds (the old
    rewrite-whole-file implementation was O(N^2)), survive a crash-restart,
    and compaction must preserve state."""
    import time as _time

    from columbiaimagesearch_tpu.pipeline.ingest import MemoryBus

    journal = str(tmp_path / "bus.jsonl")
    bus = MemoryBus(journal_path=journal)
    n = 20000
    t0 = _time.time()
    for i in range(n):
        bus.publish("imgs", {"sha1": f"h{i}"})
    assert _time.time() - t0 < 20.0  # old impl: minutes

    got = 0
    for _ in bus.consume("imgs", "g1"):
        got += 1
        if got == 12345:
            break
    # "crash": new bus instance from the journal resumes at the offset
    bus2 = MemoryBus(journal_path=journal)
    rest = sum(1 for _ in bus2.consume("imgs", "g1"))
    assert rest == n - 12345

    bus2.compact()
    bus3 = MemoryBus(journal_path=journal)
    assert sum(1 for _ in bus3.consume("imgs", "g1")) == 0  # all consumed
    assert sum(1 for _ in bus3.consume("imgs", "g2")) == n  # fresh group


def test_kvindexer_scan_scales(tmp_path):
    """Update scans must page in O(page), not O(table): sweep 60k update
    rows in pages of 500 within seconds (reference scans millions of HBase
    update rows the same way, hbase_indexer_minimal.py:370-421)."""
    import time as _time

    kv = KVIndexer(path=str(tmp_path / "scale.db"))
    conn = kv._conn()
    rows = []
    for i in range(60000):
        key = f"index_update_x_feat_full_image_2026-01-01_{i:07d}"
        rows.append(("updates", key, "info:list_sha1s", b"a,b"))
        rows.append(("updates", key, "info:created", b"1"))
    with kv._lock:
        conn.executemany(
            "INSERT OR REPLACE INTO kv (tbl,row,col,val) VALUES (?,?,?,?)",
            rows)
        conn.commit()

    t0 = _time.time()
    n = 0
    for batch in kv.get_updates_from_date(
            "1970-01-01", extr_type="x_feat_full_image", maxrows=500):
        n += len(batch)
    dt = _time.time() - t0
    assert n == 60000
    assert dt < 10.0, f"full sweep took {dt:.1f}s"  # O(N^2) shape: minutes


def test_local_dir_ingester_source_archive(tmp_path):
    """A local dataset zip is extracted once and its images ingested
    (reference LocalImagePusher source_zip role)."""
    import zipfile

    from PIL import Image

    from columbiaimagesearch_tpu.pipeline.ingest import LocalDirIngester

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        Image.fromarray(
            np.full((16, 16, 3), 40 * i, np.uint8)).save(src / f"i{i}.png")
    zpath = tmp_path / "dataset.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in src.iterdir():
            z.write(p, p.name)

    root = tmp_path / "imgs"
    ing = LocalDirIngester(str(root), source_archive=str(zpath))
    msgs = list(ing.get_msg_json())
    assert len(msgs) == 3 and all("sha1" in m for m in msgs)
    # second construction: marker prevents re-extraction, dedup via seen
    ing2 = LocalDirIngester(str(root), source_archive=str(zpath),
                            seen=ing.seen)
    assert list(ing2.get_msg_json()) == []


def test_bus_printer_script(tmp_path, capsys):
    import sys as _sys

    from columbiaimagesearch_tpu.pipeline.ingest import MemoryBus

    journal = str(tmp_path / "b.jsonl")
    bus = MemoryBus(journal_path=journal)
    for i in range(5):
        bus.publish("images", {"sha1": f"h{i}", "img_path": f"/p/{i}"})

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bus_printer", "scripts/bus_printer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = _sys.argv
    try:
        _sys.argv = ["bus_printer.py", "--journal", journal, "--topic",
                     "images", "--max-print", "3", "--fields", "sha1"]
        mod.main()
    finally:
        _sys.argv = argv
    out = capsys.readouterr().out
    assert out.count("BusPrinter: msg") == 3 and "'h0'" in out
