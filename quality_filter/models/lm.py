"""Character 5-gram language model (KenLM-style role) with add-k smoothing.

Scores fluency: clean prose in the training languages → low perplexity,
gibberish → high.  Counts are feature-hashed into fixed-size arrays so the
artifact (``lm.npz``) is small and lookup is one vectorized gather per
batch.  Deterministic; shared verbatim by oracle and Spark workers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quality_filter.models.hashing import char_codes, ngram_hashes

ORDER = 5
DIM = 1 << 20
ADD_K = 0.1
VOCAB = 256.0          # nominal next-char vocabulary for smoothing
DEFAULT_PPL = 10_000.0  # texts shorter than ORDER chars


@dataclass(frozen=True)
class CharLM:
    hi: np.ndarray   # counts of 5-grams, float64 (DIM,)
    lo: np.ndarray   # counts of 4-gram contexts, float64 (DIM,)

    def save(self, path: str) -> None:
        np.savez_compressed(path, hi=self.hi, lo=self.lo)

    @classmethod
    def load(cls, path: str) -> "CharLM":
        z = np.load(path, allow_pickle=False)
        return cls(hi=z["hi"], lo=z["lo"])

    def perplexity(self, text: str | None) -> float:
        if not text:
            return DEFAULT_PPL
        codes = char_codes(text.lower())
        if len(codes) < ORDER:
            return DEFAULT_PPL
        h5 = ngram_hashes(codes, ORDER, DIM)
        h4 = ngram_hashes(codes, ORDER - 1, DIM)[: len(h5)]  # contexts of each 5-gram
        logp = np.log(self.hi[h5] + ADD_K) - np.log(self.lo[h4] + ADD_K * VOCAB)
        return float(np.exp(-logp.mean()))

    def perplexity_batch(self, texts: list[str | None]) -> np.ndarray:
        return np.array([self.perplexity(t) for t in texts], dtype=np.float64)


def train(sentences: list[str]) -> CharLM:
    hi = np.zeros(DIM, dtype=np.float64)
    lo = np.zeros(DIM, dtype=np.float64)
    for s in sentences:
        codes = char_codes(s.lower())
        h5 = ngram_hashes(codes, ORDER, DIM)
        h4 = ngram_hashes(codes, ORDER - 1, DIM)
        if len(h5):
            np.add.at(hi, h5, 1.0)
        if len(h4):
            np.add.at(lo, h4, 1.0)
    return CharLM(hi=hi, lo=lo)
