"""Keyframe database: inverted index for loop / relocalization candidates.

TPU-native equivalent of the reference's KeyFrameDatabase
(src/KeyFrameDatabase.cc — SURVEY.md §2 #13): word -> keyframe inverted
index with DBoW2-style gating (min common words = 0.8 * best, score >= min
covisible score).

Backed by the native C++ index (spslam_tpu/native/src/bow_index.cc) when
the library is available — the pointer-chasing inverted-list walk is the
kind of host code the reference keeps in C++ too — with a pure-Python
fallback of identical semantics (tested equivalent).
"""

from __future__ import annotations

from collections import defaultdict

from .vocab import bow_similarity


class KeyFrameDatabase:
    def __init__(self, n_words: int = 4096, use_native: bool = True):
        self.inverted: dict[int, list[int]] = defaultdict(list)
        self.bow: dict[int, dict[int, float]] = {}
        self._native = None
        if use_native:
            try:
                from ..native.bindings import NativeBowIndex

                self._native = NativeBowIndex(n_words)
            except Exception:
                self._native = None

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def add(self, kf: int, bow_vec: dict[int, float]):
        self.bow[kf] = bow_vec
        if self._native is not None:
            self._native.add(kf, bow_vec)
        else:
            for w in bow_vec:
                self.inverted[w].append(kf)

    def erase(self, kf: int):
        vec = self.bow.pop(kf, None)
        if self._native is not None:
            self._native.erase(kf)
        elif vec:
            for w in vec:
                lst = self.inverted.get(w)
                if lst and kf in lst:
                    lst.remove(kf)

    def similarity(self, a: int, b: int) -> float:
        if self._native is not None:
            return self._native.pair_score(a, b)
        return bow_similarity(self.bow.get(a, {}), self.bow.get(b, {}))

    def query(
        self,
        bow_vec: dict[int, float],
        exclude: set[int],
        min_score: float,
        max_results: int = 8,
    ) -> list[tuple[int, float]]:
        """Candidates sharing words with the query, DBoW2-gated.

        exclude: keyframes that must not be returned (the query KF and its
        covisible neighborhood).
        """
        if not bow_vec:
            return []
        if self._native is not None:
            return self._native.query(bow_vec, exclude, min_score, max_results)
        common = defaultdict(int)
        for w in bow_vec:
            for kf in self.inverted.get(w, ()):
                if kf not in exclude:
                    common[kf] += 1
        if not common:
            return []
        max_common = max(common.values())
        th = max(int(0.8 * max_common), 1)
        scored = []
        for kf, c in common.items():
            if c < th:
                continue
            s = bow_similarity(bow_vec, self.bow.get(kf, {}))
            if s >= min_score:
                scored.append((kf, s))
        scored.sort(key=lambda x: -x[1])
        return scored[:max_results]
