"""Face search service end-to-end: detect -> embed -> store -> query.

The face-pipeline analog of the reference's LFW all-in-one stack
(reference: setup/all-in-one with extr dlibface confs; tests/test_face_search.py
hits the deployed byURL face endpoint)."""

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.extraction import GenericExtractor
from columbiaimagesearch_tpu.extraction.detector import FaceDetector
from columbiaimagesearch_tpu.models.face_detector import (
    WINDOW,
    ConvHOGFaceDetector,
)
from columbiaimagesearch_tpu.pipeline import ExtractionChecker, ExtractionProcessor
from columbiaimagesearch_tpu.pipeline.ingest import LocalDirIngester
from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
from columbiaimagesearch_tpu.store import KVIndexer, MemoryStorer

from tests.test_extraction import face_like, neg_patch


def make_scene(rng, face, fy, fx, h=180, w=240):
    scene = (40 + 10 * rng.rand(h, w)).astype(np.uint8)
    scene[fy:fy + WINDOW, fx:fx + WINDOW] = face.astype(np.uint8)
    return np.stack([scene] * 3, axis=-1)


@pytest.fixture(scope="module")
def face_env(tmp_path_factory):
    rng = np.random.RandomState(0)
    det_model = ConvHOGFaceDetector(threshold=0.0)
    det_model.train([face_like(rng) for _ in range(40)],
                    [neg_patch(rng) for _ in range(60)], steps=200)
    detector = FaceDetector(det_model)

    # 20 scenes, each with a distinct synthetic face.
    root = tmp_path_factory.mktemp("faces")
    faces = [face_like(rng) for _ in range(20)]
    paths = []
    for i, face in enumerate(faces):
        p = root / f"scene_{i:02d}.png"
        Image.fromarray(make_scene(rng, face, 30 + (i % 4) * 10,
                                   60 + (i % 5) * 12)).save(p)
        paths.append(str(p))

    kv = KVIndexer(path=":memory:")
    extractor = GenericExtractor("face", "face", input_type="face",
                                 detector=detector)
    checker = ExtractionChecker(kv, "face_feat_face_face",
                                LocalDirIngester(str(root)),
                                batch_update_size=10)
    checker.run_once()
    ExtractionProcessor(kv, extractor, nb_threads=2).run_once()

    searcher = SearcherLOPQ(
        model_type="lopq", V=4, M=4, subquantizer_clusters=8,
        nb_train=100, nb_min_train=10, train_at_init=True,
        detector_type="face", featurizer_type="face", input_type="face",
        detector=detector, featurizer=extractor.featurizer,
        indexer=kv, storer=MemoryStorer(), reranking=True, rerank_nb=50)
    return searcher, kv, paths, rng


def test_face_rows_have_bbox_columns(face_env):
    searcher, kv, paths, rng = face_env
    rows = kv.scan_from_row(kv.table_sha1infos_name, maxrows=50,
                            columns=["ext:"])
    feat_cols = [c for _, cols in rows for c in cols
                 if c.startswith("ext:face_feat_face_face_")
                 and not c.endswith("_processed")
                 and not c.endswith("_updateid")]
    assert feat_cols, "no per-face feature columns written"
    # bbox suffix: left_top_right_bottom_score
    assert all(len(c.split("face_face_")[1].split("_")) == 5 for c in feat_cols)


def test_face_searcher_indexes_faces(face_env):
    searcher, kv, paths, rng = face_env
    # sample ids are sha1_left_top_right_bottom (detection suffix)
    assert searcher.get_nb_indexed() >= 15
    assert searcher.input_type == "face"


def test_face_query_end_to_end(face_env):
    searcher, kv, paths, rng = face_env
    out = searcher.search_image_path_list([paths[7]], {"max_returned": 3})
    # Face-mode output schema
    assert "AllSimilarFaces" in out
    assert out["NumberFaces"] >= 1
    entry = out["AllSimilarFaces"][0]
    assert "QueryFace" in entry  # the detected query bbox
    block = entry["SimilarFaces"]
    assert block["NumberFaces"] >= 1
    # Best match is the same scene's own face (it is indexed).
    from columbiaimagesearch_tpu.imgio.imgio import (
        get_buffer_from_filepath,
        get_SHA1_from_buffer,
    )

    expect_sha1 = get_SHA1_from_buffer(get_buffer_from_filepath(paths[7]))
    assert block["ImageSha1s"][0] == expect_sha1
    assert block["Distances"][0] < 0.05
    # Similar-face bboxes decode as dicts
    assert set(block["Faces"][0]) == {"left", "top", "right", "bottom"}
    # detect_only option short-circuits featurization/search
    out2 = searcher.search_image_path_list([paths[7]], {"detect_only": True})
    assert out2["AllSimilarFaces"][0]["SimilarFaces"]["NumberFaces"] == 0


def test_face_view_similar_bbox_overlay(face_env):
    """view_similar in face mode draws canvas bbox overlays
    (reference: www/templates/view_similar_faces_wbbox.html)."""
    from columbiaimagesearch_tpu.api.app import SearchAPI

    searcher, kv, paths, rng = face_env
    api = SearchAPI(searcher, input_type="face")
    code, html = api.process("view_similar_byPATH", paths[7],
                             '{"max_returned": 2}')
    assert code == 200 and html.startswith("<html>")
    assert "drawFace(" in html and "<canvas" in html
    assert "blur(8px)" in html  # blurred by default like the reference
    # bbox numbers make it into the draw calls
    assert "strokeStyle='#ff0000'" in html
    code, html2 = api.process("view_similar_byPATH", paths[7],
                              '{"no_blur": true}')
    assert "blur(8px)" not in html2


def test_face_coalesced_serving_matches_sequential(face_env):
    """Face-path request coalescing: concurrent byPATH queries through a
    coalescing searcher must return the same faces/distances as the
    sequential searcher — every (image, face) pair across the bundle
    rides one device wave (search_from_feats_multi detector branch)."""
    import threading

    searcher, kv, paths, rng = face_env
    coal = SearcherLOPQ(
        model_type="lopq", V=4, M=4, subquantizer_clusters=8,
        model=searcher.model, detector_type="face", featurizer_type="face",
        input_type="face", detector=searcher.detector,
        featurizer=searcher.featurizer, indexer=kv, storer=searcher.storer,
        reranking=True, rerank_nb=50,
        coalesce_window_ms=60.0, coalesce_max_batch=8)
    assert coal.get_nb_indexed() == searcher.get_nb_indexed()

    targets = [paths[3], paths[7], paths[11], paths[15]]
    expected = {p: searcher.search_image_path_list([p], {"max_returned": 3})
                for p in targets}

    results, errs = {}, []
    gate = threading.Event()

    def worker(p):
        gate.wait()
        try:
            results[p] = coal.search_image_path_list(
                [p], {"max_returned": 3})
        except Exception as inst:  # pragma: no cover
            errs.append((p, inst))

    threads = [threading.Thread(target=worker, args=(p,)) for p in targets]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    for p in targets:
        got = results[p]["AllSimilarFaces"][0]["SimilarFaces"]
        want = expected[p]["AllSimilarFaces"][0]["SimilarFaces"]
        assert got["ImageSha1s"] == want["ImageSha1s"], p
        # wave padding changes float summation order: ids exact,
        # distances to 1e-6
        assert got["Distances"] == pytest.approx(want["Distances"],
                                                 abs=1e-6)
    assert max(coal.request_batcher.batch_sizes) > 1
