"""ctypes bindings for the native C++ runtime components.

Builds native/*.cpp with g++ on first use (cached next to the sources);
every binding has a pure-Python fallback so the framework degrades
gracefully on systems without a toolchain.
"""

from columbiaimagesearch_tpu.native.build import load_library
from columbiaimagesearch_tpu.native.imgpipe import (
    decode_resize_batch,
    imgpipe_available,
)
from columbiaimagesearch_tpu.native.codestore import CodeStore
