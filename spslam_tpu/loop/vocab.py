"""Binary visual vocabulary for place recognition.

TPU-native replacement for the vendored DBoW2 TemplatedVocabulary
(Thirdparty/DBoW2 — SURVEY.md §2 #20).  DBoW2 needs a k=10, L=6 tree
because quantizing against 1M words on a CPU requires log-time descent;
on TPU a FLAT vocabulary quantizes by ONE Hamming matmul on the MXU
(N x V x 256), which is exact nearest-word (trees mis-quantize ~10-30% of
descriptors), so a much smaller vocabulary gives comparable recall.

The vocabulary is trained by binary k-means (Hamming distance assignment on
the MXU + per-cluster bit-majority centroids) either offline or lazily from
the descriptors the run has already collected (the reference instead loads
a ~1GB pretrained text vocabulary — SURVEY.md §3.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.brief import unpack_bits
from ..ops.match import hamming_matrix


@partial(jax.jit, static_argnames=("n_words", "n_iters"))
def train_vocab_bits(bits: jnp.ndarray, key: jnp.ndarray, n_words: int = 1024,
                     n_iters: int = 8) -> jnp.ndarray:
    """Binary k-means. bits: [N, 256] {0,1}. Returns centroids [V, 256]."""
    N = bits.shape[0]
    idx = jax.random.choice(key, N, (n_words,), replace=False)
    cent = bits[idx]

    def step(_, cent):
        d = hamming_matrix(bits, cent)            # [N, V] one MXU matmul
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32)  # [N, V]
        counts = onehot.sum(0)                    # [V]
        sums = onehot.T @ bits                    # [V, 256]
        maj = (sums * 2.0 > counts[:, None]).astype(jnp.float32)
        # keep old centroid for empty clusters
        return jnp.where(counts[:, None] > 0, maj, cent)

    return jax.lax.fori_loop(0, n_iters, step, cent)


@jax.jit
def quantize(bits: jnp.ndarray, vocab_bits: jnp.ndarray, valid: jnp.ndarray):
    """Exact nearest-word assignment: [N,256] x [V,256] -> word ids [N].

    Invalid descriptors get word -1.
    """
    d = hamming_matrix(bits, vocab_bits)
    w = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return jnp.where(valid, w, -1)


class Vocabulary:
    """Host-side wrapper: lazy training + TF-IDF weights."""

    def __init__(self, n_words: int = 1024, train_after: int = 20000, seed: int = 0):
        self.n_words = n_words
        self.train_after = train_after
        self.seed = seed
        self.vocab_bits: jnp.ndarray | None = None
        self._pool: list[np.ndarray] = []
        self._pool_count = 0
        self.idf = np.ones(n_words, np.float64)  # fixed at training time

    @property
    def trained(self) -> bool:
        return self.vocab_bits is not None

    def add_training_descriptors(self, desc_packed: np.ndarray):
        """desc_packed: [n, 8] uint32 valid descriptors."""
        if self.trained or len(desc_packed) == 0:
            return
        self._pool.append(desc_packed)
        self._pool_count += len(desc_packed)
        if self._pool_count >= self.train_after:
            self.train()

    def train(self):
        alld = np.concatenate(self._pool)
        if len(alld) < self.n_words * 4:
            return
        bits = unpack_bits(jnp.asarray(alld))
        self.vocab_bits = train_vocab_bits(
            bits, jax.random.PRNGKey(self.seed), self.n_words
        )
        # idf fixed from the training distribution (DBoW2 computes word
        # weights at vocabulary-creation time too); smoothed so no word
        # gets zero weight
        words = np.asarray(quantize(bits, self.vocab_bits, jnp.ones(len(alld), bool)))
        counts = np.bincount(words[words >= 0], minlength=self.n_words)
        self.idf = np.log((1.0 + len(alld)) / (1.0 + counts)) + 1.0
        self._pool = []

    def bow_vector(self, desc_packed: np.ndarray) -> dict[int, float]:
        """TF-IDF-weighted, L1-normalized bag of words for one keyframe.
        Pure: does not mutate vocabulary state.

        The descriptor count is padded to a power-of-two bucket (>=1024)
        before quantization: every keyframe has a different valid-descriptor
        count, and an unpadded call would compile a fresh XLA program per
        count — ~30 s each through the TPU tunnel, which starved the async
        mapper and broke the loop lane's on-chip benchmark."""
        if not self.trained or len(desc_packed) == 0:
            return {}
        n = len(desc_packed)
        cap = 1024
        while cap < n:
            cap *= 2
        padded = np.zeros((cap, 8), np.uint32)
        padded[:n] = desc_packed
        pvalid = np.zeros(cap, bool)
        pvalid[:n] = True
        bits = unpack_bits(jnp.asarray(padded))
        words = np.asarray(quantize(bits, self.vocab_bits, jnp.asarray(pvalid)))
        counts = np.bincount(words[words >= 0], minlength=self.n_words).astype(np.float64)
        tf = counts / max(counts.sum(), 1.0)
        v = tf * self.idf
        s = v.sum()
        if s <= 0:
            return {}
        v /= s
        return {int(w): float(v[w]) for w in np.nonzero(v)[0]}

    def save(self, path: str):
        np.savez(path, vocab=np.asarray(self.vocab_bits), idf=self.idf)

    def load(self, path: str):
        d = np.load(path)
        self.vocab_bits = jnp.asarray(d["vocab"])
        self.idf = d["idf"]


def bow_similarity(a: dict[int, float], b: dict[int, float]) -> float:
    """L1 score as in DBoW2: s = 1 - 0.5*|va - vb|_1, computed sparsely."""
    if not a or not b:
        return 0.0
    s = 0.0
    for w, va in a.items():
        vb = b.get(w)
        if vb is not None:
            s += abs(va) + abs(vb) - abs(va - vb)
    return 0.5 * s
