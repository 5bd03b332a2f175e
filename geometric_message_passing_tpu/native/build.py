"""Compile-on-first-use loader for the native batcher library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "batcher.cpp"),
         os.path.join(_HERE, "triplets.cpp"),
         os.path.join(_HERE, "radius.cpp")]
_SRC = _SRCS[0]  # backwards-compat name
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    cache = os.environ.get(
        "GMP_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(_HERE)), ".gmp_cache"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libgmpbatch.so")


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _lib_path()
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < max(os.path.getmtime(s)
                                                  for s in _SRCS)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", so],
                    check=True, capture_output=True,
                )
            _LIB = ctypes.CDLL(so)
        except Exception:
            _LIB = None
        return _LIB


def have_native() -> bool:
    return get_lib() is not None
