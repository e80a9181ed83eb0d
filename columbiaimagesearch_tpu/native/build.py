"""Build-on-first-use loader for the native libraries."""

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LOCK = threading.Lock()
_CACHE = {}

_LINK = {
    "imgpipe": ["-ljpeg", "-lpng", "-lpthread"],
    "codestore": [],
}


def load_library(name: str):
    """Compile (if needed) and dlopen native/<name>.cpp -> lib<name>.so.

    Returns the ctypes CDLL, or None if the toolchain/libs are missing.
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
        so = os.path.join(_NATIVE_DIR, f"lib{name}.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                cmd = ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                       "-shared", "-o", so, src] + _LINK.get(name, [])
                subprocess.run(cmd, check=True, capture_output=True,
                               cwd=_NATIVE_DIR)
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _CACHE[name] = lib
        return lib
