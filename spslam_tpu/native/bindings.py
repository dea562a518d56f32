"""ctypes bindings for the native C++ runtime components.

Loads libspslam_native.so (auto-builds it with the in-tree Makefile on
first use if a compiler is available); every consumer has a pure-Python
fallback, so the package works without the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libspslam_native.so")
_lib = None
_tried = False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.bow_new.restype = ctypes.c_void_p
    lib.bow_new.argtypes = [ctypes.c_int32]
    lib.bow_free.argtypes = [ctypes.c_void_p]
    lib.bow_add.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.bow_erase.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.bow_pair_score.restype = ctypes.c_float
    lib.bow_pair_score.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.bow_query.restype = ctypes.c_int32
    lib.bow_query.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.covis_count.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBowIndex:
    """C++ inverted index with the KeyFrameDatabase query semantics."""

    def __init__(self, n_words: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.bow_new(n_words)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.bow_free(self._h)
            self._h = None

    @staticmethod
    def _to_arrays(bow: dict[int, float]):
        words = np.fromiter(bow.keys(), np.int32, len(bow))
        wts = np.fromiter(bow.values(), np.float32, len(bow))
        return words, wts

    def add(self, kf: int, bow: dict[int, float]):
        words, wts = self._to_arrays(bow)
        self._lib.bow_add(self._h, kf, _i32p(words), _f32p(wts), len(words))

    def erase(self, kf: int):
        self._lib.bow_erase(self._h, kf)

    def pair_score(self, a: int, b: int) -> float:
        return float(self._lib.bow_pair_score(self._h, a, b))

    def query(self, bow: dict[int, float], exclude, min_score: float,
              max_results: int = 8):
        if not bow:
            return []
        words, wts = self._to_arrays(bow)
        excl = np.fromiter(exclude, np.int32, len(exclude))
        out_ids = np.zeros(max_results, np.int32)
        out_scores = np.zeros(max_results, np.float32)
        n = self._lib.bow_query(
            self._h, _i32p(words), _f32p(wts), len(words),
            _i32p(excl), len(excl), min_score,
            _i32p(out_ids), _f32p(out_scores), max_results,
        )
        return [(int(out_ids[i]), float(out_scores[i])) for i in range(n)]


def covis_count(kf_obs: np.ndarray, pt_obs_kf: np.ndarray, kf: int,
                n_keyframes: int) -> np.ndarray | None:
    """Native covisibility counting; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    kf_obs = np.ascontiguousarray(kf_obs, np.int32)
    pt_obs_kf = np.ascontiguousarray(pt_obs_kf, np.int32)
    out = np.zeros(n_keyframes, np.int32)
    lib.covis_count(
        _i32p(kf_obs), len(kf_obs), _i32p(pt_obs_kf), pt_obs_kf.shape[1],
        kf, _i32p(out), n_keyframes,
    )
    return out
