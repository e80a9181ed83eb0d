"""Pickled-blob storers: local disk and in-memory.

Same surface as the reference's storer package
(reference: cufacesearch/storer/generic_storer.py:5-78, storer/local.py:9-128,
storer/s3.py:21-205): ``save``/``load``/``delete``/``list_prefix``/
``get_all_from_prefix``. The S3 backend is gated (boto3 is not part of this
environment); MemoryStorer backs tests and ephemeral deployments.
"""

import os
import pickle


class GenericStorer:
    def save(self, key, obj):
        raise NotImplementedError()

    def load(self, key, silent=True):
        raise NotImplementedError()

    def delete(self, key):
        raise NotImplementedError()

    def list_prefix(self, prefix=""):
        raise NotImplementedError()

    def get_all_from_prefix(self, prefix=""):
        for key in self.list_prefix(prefix):
            yield key, self.load(key)


class LocalStorer(GenericStorer):
    """Pickle files under a base directory (reference: storer/local.py)."""

    def __init__(self, base_path="./storer_data"):
        self.base_path = base_path
        os.makedirs(self.base_path, exist_ok=True)

    def _path(self, key):
        safe = key.replace("/", "__")
        return os.path.join(self.base_path, safe + ".pkl")

    def save(self, key, obj):
        with open(self._path(key), "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load(self, key, silent=True):
        try:
            with open(self._path(key), "rb") as f:
                return pickle.load(f)
        except FileNotFoundError:
            if silent:
                return None
            raise

    def delete(self, key):
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def list_prefix(self, prefix=""):
        safe = prefix.replace("/", "__")
        for name in sorted(os.listdir(self.base_path)):
            if name.startswith(safe) and name.endswith(".pkl"):
                yield name[:-4].replace("__", "/")


class MemoryStorer(GenericStorer):
    """Dict-backed storer for tests and ephemeral runs."""

    def __init__(self):
        self._data = {}

    def save(self, key, obj):
        self._data[key] = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)

    def load(self, key, silent=True):
        if key not in self._data:
            if silent:
                return None
            raise KeyError(key)
        return pickle.loads(self._data[key])

    def delete(self, key):
        self._data.pop(key, None)

    def list_prefix(self, prefix=""):
        return iter(sorted(k for k in self._data if k.startswith(prefix)))


def get_storer(storer_type, base_path=None):
    """Factory (reference: storer/generic_storer.py:5-33)."""
    if storer_type == "local":
        return LocalStorer(base_path or "./storer_data")
    elif storer_type == "memory":
        return MemoryStorer()
    elif storer_type == "s3":
        raise NotImplementedError(
            "S3 storer requires boto3, which is not available in this "
            "environment; use 'local'.")
    raise ValueError(f"[get_storer: error] unknown storer type {storer_type}")
