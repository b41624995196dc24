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

    def __post_init__(self) -> None:
        # precomputed log tables: scoring is then pure gathers + subtract,
        # no per-position np.log at inference (bit-identical — the same
        # np.log of the same element, just evaluated once per worker)
        object.__setattr__(self, "_log_hi", np.log(self.hi + ADD_K))
        object.__setattr__(self, "_log_lo", np.log(self.lo + ADD_K * VOCAB))

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
        logp = self._log_hi[h5] - self._log_lo[h4]
        return float(np.exp(-logp.mean()))

    def perplexity_batch(self, texts: list[str | None]) -> np.ndarray:
        codes = [char_codes(t.lower()) if t else None for t in texts]
        return self.perplexity_batch_codes(codes)

    def perplexity_batch_codes(self, codes_list: list["np.ndarray | None"]) -> np.ndarray:
        """Batch perplexity with ONE vectorized hash pass, from
        pre-lowercased codepoint arrays (shared with the langid gather —
        one char_codes pass per text for both models).

        All texts' codepoints are concatenated; 5-gram/4-gram hashes and
        log-probs are computed over the big array once, and per-text
        means come from reduceat over each text's valid (non-boundary-
        crossing) position range.  Equivalent to per-text perplexity()
        up to float summation order (pairwise vs sequential — differs
        in the last ulp, inside every tolerance used here)."""
        n = len(codes_list)
        out = np.full(n, DEFAULT_PPL, dtype=np.float64)
        arrs, owners = [], []
        for i, codes in enumerate(codes_list):
            if codes is not None and len(codes) >= ORDER:
                arrs.append(codes)
                owners.append(i)
        if not arrs:
            return out
        big = np.concatenate(arrs)
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])

        # one uint64 cast shared by both hash orders (ngram_hashes takes
        # any integer dtype; pre-casting avoids the second copy — bitwise
        # identical, the cast is value-preserving)
        big64 = big.astype(np.uint64)
        h5 = ngram_hashes(big64, ORDER, DIM)
        h4 = ngram_hashes(big64, ORDER - 1, DIM)[: len(h5)]
        logp = self._log_hi[h5] - self._log_lo[h4]

        # valid 5-gram positions for text j: [starts[j], starts[j]+lens[j]-ORDER]
        ends = starts + lens - (ORDER - 1)
        bounds = np.empty(2 * len(arrs), dtype=np.int64)
        bounds[0::2] = starts
        bounds[1::2] = ends
        # reduceat needs indices < len(logp); the final end == len(logp)
        # is implicit (reduceat sums to the end of the array)
        sums = np.add.reduceat(logp, bounds[:-1] if bounds[-1] >= len(logp) else bounds)
        seg_sums = sums[0::2]
        counts = (ends - starts).astype(np.float64)
        out[np.array(owners)] = np.exp(-seg_sums / counts)
        return out


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
