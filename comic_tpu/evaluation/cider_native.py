"""ctypes bindings for the native C++ CIDEr-D scorer (native/ciderd.cpp).

Compiled on first use with g++ into ``native/build/libciderd.so``; falls
back silently to the pure-Python ``evaluation.cider.CiderD`` when no
toolchain is available. The native scorer matches the Python one to double
precision (tested in tests/test_native_cider.py) and removes the SCST
reward loop's host-side Python overhead.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from .ids import id_sort_key


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ciderd.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libciderd.so")

_lock = threading.Lock()


_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.ciderd_create.restype = ctypes.c_void_p
            lib.ciderd_destroy.argtypes = [ctypes.c_void_p]
            lib.ciderd_set_df.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.c_double]
            lib.ciderd_score.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long), ctypes.c_long,
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
            return _lib
        except Exception:
            _build_failed = True
            return None


def native_available() -> bool:
    return _load_library() is not None


class NativeCiderD:
    """Drop-in for evaluation.cider.CiderD backed by native/ciderd.cpp."""

    def __init__(self, df: Optional[dict] = None):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native ciderd unavailable")
        self._lib = lib
        self._handle = lib.ciderd_create()
        if isinstance(df, dict) and "document_frequency" in df:
            self._load_df(df)

    def _load_df(self, cache: dict) -> None:
        dfd = cache["document_frequency"]
        # ngram words joined with \x1f (the native hashing frame)
        blob = "\n".join("\x1f".join(g) for g in dfd.keys()).encode("utf-8")
        vals = np.fromiter(dfd.values(), dtype=np.float64,
                           count=len(dfd))
        # on-disk ref_len is the raw corpus size; log applied here
        # (ciderD_scorer.py:82 semantics)
        self._lib.ciderd_set_df(
            self._handle, blob,
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(dfd), math.log(float(cache["ref_len"])))

    def __del__(self):
        try:
            self._lib.ciderd_destroy(self._handle)
        except Exception:
            pass

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[float, np.ndarray]:
        keys = sorted(gts, key=id_sort_key)
        hypos = [res[k][0] for k in keys]
        # assign group ids by identical reference lists (the SCST joint
        # gts dict repeats each image's refs across its hypotheses)
        group_of: Dict[int, int] = {}
        seen: Dict[Tuple[str, ...], int] = {}
        for i, k in enumerate(keys):
            sig = tuple(gts[k])
            if sig not in seen:
                seen[sig] = i
            group_of[i] = seen[sig]

        hypos_blob = "\n".join(hypos).encode("utf-8")
        refs_blob = "\x1e".join(
            "\n".join(gts[k]) for k in keys).encode("utf-8")
        gids = np.asarray([group_of[i] for i in range(len(keys))],
                          dtype=np.int64)
        out = np.zeros(len(keys), np.float64)
        self._lib.ciderd_score(
            self._handle, hypos_blob, refs_blob,
            gids.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(keys),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return float(out.mean()) if len(out) else 0.0, out

    def method(self) -> str:
        return "CIDEr-D"


def make_ciderd(df: Optional[dict] = None):
    """Native CiderD when buildable, else the pure-Python implementation."""
    if native_available():
        try:
            return NativeCiderD(df)
        except Exception:
            pass
    from .cider import CiderD

    return CiderD(df)
