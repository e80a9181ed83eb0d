"""Storer contract test, parametrized over local / memory / s3-stub.

The S3 stub implements the minimal boto3 Bucket surface the storer uses
(upload_fileobj / download_fileobj / delete_objects / objects.filter), so
S3Storer's logic (prefix join/strip, pickling + raw modes, silent load) is
covered without a network or boto3 (reference: storer/s3.py:21-205).
"""

import io

import numpy as np
import pytest

from columbiaimagesearch_tpu.store.storer import (
    LocalStorer,
    MemoryStorer,
    S3Storer,
    get_storer,
)


class _FakeObjectSummary:
    def __init__(self, key):
        self.key = key


class _FakeCollection:
    def __init__(self, store):
        self._store = store

    def filter(self, Prefix=""):
        for k in sorted(self._store):
            if k.startswith(Prefix):
                yield _FakeObjectSummary(k)


class FakeBucket:
    """In-memory stand-in for a boto3 Bucket resource."""

    def __init__(self):
        self._store = {}
        self.objects = _FakeCollection(self._store)

    def upload_fileobj(self, fileobj, key):
        self._store[key] = fileobj.read()

    def download_fileobj(self, key, fileobj):
        if key not in self._store:
            raise KeyError(key)  # boto3 raises ClientError; any Exception ok
        fileobj.write(self._store[key])

    def delete_objects(self, Delete):
        for entry in Delete["Objects"]:
            self._store.pop(entry["Key"], None)


def make_storers(tmp_path):
    return [
        LocalStorer(str(tmp_path / "local")),
        MemoryStorer(),
        S3Storer(bucket_name="b", bucket=FakeBucket()),
        S3Storer(bucket_name="b", bucket=FakeBucket(), aws_prefix="media"),
    ]


def test_storer_contract(tmp_path):
    for st in make_storers(tmp_path):
        # save/load round trip of an arbitrary object
        obj = {"a": np.arange(5), "b": "text"}
        st.save("model_str", obj)
        got = st.load("model_str")
        assert got["b"] == "text" and (got["a"] == np.arange(5)).all()

        # missing key: silent -> None, non-silent -> raises
        assert st.load("nope") is None
        with pytest.raises(Exception):
            st.load("nope", silent=False)

        # prefix listing + bulk load
        st.save("codes/upd_1", [1])
        st.save("codes/upd_2", [2])
        st.save("other", [3])
        keys = list(st.list_prefix("codes/"))
        assert keys == ["codes/upd_1", "codes/upd_2"]
        vals = [v for _, v in st.get_all_from_prefix("codes/")]
        assert vals == [[1], [2]]

        # delete
        st.delete("codes/upd_1")
        assert st.load("codes/upd_1") is None
        assert list(st.list_prefix("codes/")) == ["codes/upd_2"]


def test_s3_raw_mode():
    st = S3Storer(bucket_name="b", bucket=FakeBucket(), pickling=False)
    st.save("img_sha1", b"\xff\xd8jpegbytes")
    buf = st.load("img_sha1")
    assert isinstance(buf, io.BytesIO) and buf.read() == b"\xff\xd8jpegbytes"
    # file-like input too (reference raw mode assumes a buffer)
    st.save("img2", io.BytesIO(b"abc"))
    assert st.load("img2").read() == b"abc"


def test_s3_prefix_isolation():
    bucket = FakeBucket()
    media = S3Storer(bucket_name="b", bucket=bucket, aws_prefix="media")
    flat = S3Storer(bucket_name="b", bucket=bucket)
    media.save("k1", 1)
    assert bucket._store and list(bucket._store) == ["media/k1"]
    assert media.load("k1") == 1
    assert flat.load("k1") is None  # different namespace
    assert list(media.list_prefix("")) == ["k1"]


def test_factory_s3():
    st = get_storer("s3", bucket_name="b", bucket=FakeBucket())
    st.save("x", 42)
    assert st.load("x") == 42
    with pytest.raises(ValueError):
        get_storer("nope")
