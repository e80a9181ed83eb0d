"""Config system, factories, and the runnable ops scripts."""

import json
import sys

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.common.conf_reader import ConfReader
from columbiaimagesearch_tpu.common.factory import (
    build_checker,
    build_extractor,
    build_indexer,
    build_processor,
    build_searcher,
    generate_conf_extractor,
    generate_conf_searcher,
)


def test_conf_reader_prefix_and_required():
    conf = {"X_alpha": 1, "X_verbose": 2, "Y_alpha": 3}
    r = ConfReader(conf, prefix="X_")
    assert r.get_param("alpha") == 1
    assert r.verbose == 2
    assert r.get_param("beta", default="d") == "d"
    with pytest.raises(ValueError):
        r.get_required_param("beta")


def test_conf_reader_from_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"A_k": "v"}))
    r = ConfReader(str(p), prefix="A_")
    assert r.get_param("k") == "v"


def test_env_conf_generators():
    env = {"extr_type": "sentibank", "LOPQ_V": "64", "db_path": "/tmp/x.db",
           "input_dir": "/tmp/imgs"}
    conf = generate_conf_searcher(env)
    assert conf["SEARCHLOPQ_featurizer_type"] == "sentibank"
    assert conf["KVI_db_path"] == "/tmp/x.db"
    conf2 = generate_conf_extractor(env)
    assert conf2["CHECK_input_dir"] == "/tmp/imgs"


def _make_dataset(tmp_path, n_groups=6, n_per=6):
    root = tmp_path / "images"
    root.mkdir()
    for g in range(n_groups):
        for s in range(n_per):
            r = np.random.RandomState(100 * g + s)
            img = np.zeros((64, 64, 3), np.uint8)
            img[..., g % 3] = 50 + 30 * g
            img[10:50, 10:50, (g + 1) % 3] = 210
            img += r.randint(0, 20, img.shape).astype(np.uint8)
            Image.fromarray(img).save(root / f"im_{g}_{s}.png")
    return root


def test_factories_and_processing_script(tmp_path, monkeypatch):
    root = _make_dataset(tmp_path)
    db = str(tmp_path / "test.db")
    conf = {
        "EXTR_featurizer_type": "sentibank",
        "EXTR_detector_type": "full",
        "CHECK_featurizer_type": "sentibank",
        "CHECK_detector_type": "full",
        "CHECK_input_dir": str(root),
        "CHECK_batch_update_size": 20,
        "PROC_nb_threads": 2,
        "KVI_db_path": db,
    }
    conf_path = tmp_path / "extr.json"
    conf_path.write_text(json.dumps(conf))

    # components build from conf
    kv = build_indexer(conf)
    assert kv.path == db
    ex = build_extractor(conf)
    assert ex.extr_str == "ext:sentibank_feat_full_image"

    # the ops script runs one full pass
    from scripts import run_processing

    monkeypatch.setattr(sys, "argv",
                        ["run_processing.py", "-c", str(conf_path), "--once"])
    run_processing.main()

    kv2 = build_indexer(conf)
    updates = [u for b in kv2.get_updates_from_date("1970-01-01") for u in b]
    assert len(updates) == 2  # 36 images / 20 per update
    sha1s, feats = kv2.get_features_from_sha1s(
        [r for r, _ in kv2.scan_from_row(kv2.table_sha1infos_name,
                                         maxrows=100)],
        "sentibank_feat_full_image")
    assert len(sha1s) == 36


def test_searcher_factory_over_processed_store(tmp_path):
    root = _make_dataset(tmp_path)
    db = str(tmp_path / "s.db")
    conf = {
        "CHECK_featurizer_type": "sentibank",
        "CHECK_detector_type": "full",
        "CHECK_input_dir": str(root),
        "KVI_db_path": db,
        "EXTR_featurizer_type": "sentibank",
        "SEARCHLOPQ_model_type": "lopq",
        "SEARCHLOPQ_lopq_V": 4,
        "SEARCHLOPQ_lopq_M": 4,
        "SEARCHLOPQ_lopq_subq": 16,
        "SEARCHLOPQ_nb_train": 100,
        "SEARCHLOPQ_nb_min_train": 20,
        "SEARCHLOPQ_train_at_init": True,
        "SEARCHLOPQ_reranking": True,
        "SEARCHLOPQ_featurizer_type": "sentibank",
        "SEARCHLOPQ_file_input": True,
        "ST_storer_type": "local",
        "ST_base_path": str(tmp_path / "storer"),
    }
    kv = build_indexer(conf)
    checker = build_checker(conf, indexer=kv)
    processor = build_processor(conf, indexer=kv)
    checker.run_once()
    processor.run_once()

    searcher = build_searcher(conf, indexer=kv)
    assert searcher.get_nb_indexed() == 36
    path0 = str(root / "im_2_3.png")
    out = searcher.search_image_path_list([path0], {"max_returned": 3})
    assert out["AllSimilarImages"][0]["SimilarImages"]["Distances"][0] < 1e-3


def test_ingester_conf_generator_and_builders(tmp_path):
    from columbiaimagesearch_tpu.common.factory import (
        build_ingester,
        build_pusher,
        generate_conf_ingester,
    )
    from columbiaimagesearch_tpu.pipeline.ingest import (
        LocalDirIngester,
        MemoryBusPusher,
    )

    # local input + memory pushing (the all-in-one default)
    env = {"input_type": "local", "input_path": str(tmp_path),
           "images_topic": "imgs"}
    conf = generate_conf_ingester(env)
    assert conf["IMG_ING_input_type"] == "local"
    assert conf["IMG_ING_input_path"] == str(tmp_path)
    ing = build_ingester(conf)
    assert isinstance(ing, LocalDirIngester)
    pusher = build_pusher(conf)
    assert isinstance(pusher, MemoryBusPusher) and pusher.topic == "imgs"

    # kafka mapping (reference create_conf_ingester.py kafka branch)
    env = {"input_type": "kafka", "input_topic": "crawl",
           "input_consumer_group": "g1",
           "kafka_servers": '["k0:9093"]',
           "image_pushing_type": "kafka", "images_topic": "imgs"}
    conf = generate_conf_ingester(env)
    assert conf["IMG_ING_topic_name"] == "crawl"
    assert conf["IMG_ING_consumer_group"] == "g1"
    assert conf["IMG_PUSH_topic_name"] == "imgs"

    # kinesis mapping (reference kinesis branch)
    env = {"input_type": "kinesis", "input_stream": "s-in",
           "region_name": "us-east-1", "endpoint_url": "http://k:4567",
           "image_pushing_type": "kinesis", "images_stream": "s-out",
           "create_stream": "1", "nb_shards": "4"}
    conf = generate_conf_ingester(env)
    assert conf["IMG_ING_stream_name"] == "s-in"
    assert conf["IMG_PUSH_stream_name"] == "s-out"
    assert conf["IMG_PUSH_create_stream"] is True
    assert conf["IMG_PUSH_nb_shards"] == 4

    # unknown type
    with pytest.raises(ValueError):
        build_ingester({"IMG_ING_input_type": "nope"})


def test_factory_wires_source_zip_and_decodes_servers(tmp_path):
    """Review regressions: source_zip reaches LocalDirIngester, and
    JSON-encoded kafka server lists decode before hitting the client."""
    import zipfile

    from PIL import Image as _Image

    from columbiaimagesearch_tpu.common.factory import (
        _decode_servers,
        build_ingester,
        generate_conf_ingester,
    )

    src = tmp_path / "s"
    src.mkdir()
    _Image.fromarray(np.full((8, 8, 3), 7, np.uint8)).save(src / "a.png")
    zpath = tmp_path / "d.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(src / "a.png", "a.png")

    env = {"input_type": "local", "input_path": str(tmp_path / "imgs"),
           "source_zip": str(zpath)}
    conf = generate_conf_ingester(env)
    ing = build_ingester(conf)
    assert len(list(ing.get_msg_json())) == 1  # archive was extracted

    assert _decode_servers('["k0:9093", "k1:9093"]') == ["k0:9093",
                                                         "k1:9093"]
    assert _decode_servers(["k0:9093"]) == ["k0:9093"]
    assert _decode_servers("k0:9093") == "k0:9093"
