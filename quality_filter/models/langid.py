"""Hashed character-n-gram Naive-Bayes language identifier.

A from-scratch, fastText-style linear classifier over hashed char n-grams
(numpy matmul, Arrow-batch friendly).  Plays the role the ResNet trunk
plays in the reference (/root/reference/opennsfw2/_model.py:17-202): the
broadcast model artifact behind the vectorized scoring stage.  Training is
closed-form (count → smoothed log-prob), fully deterministic, no network.

Artifact format (``langid.npz``): W (L×D float64 log-probs), priors (L),
labels (unicode), ns (n-gram sizes), dim.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quality_filter.models.hashing import char_codes, ngram_hashes

NGRAM_SIZES = (1, 2, 3)
DIM = 4096
ALPHA = 0.5  # Laplace smoothing


@dataclass(frozen=True)
class LangIdModel:
    labels: tuple[str, ...]
    W: np.ndarray          # (L, D) smoothed log-probs
    log_priors: np.ndarray  # (L,)
    ns: tuple[int, ...] = NGRAM_SIZES
    dim: int = DIM

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            W=self.W,
            log_priors=self.log_priors,
            labels=np.array(self.labels),
            ns=np.array(self.ns),
            dim=np.array([self.dim]),
        )

    @classmethod
    def load(cls, path: str) -> "LangIdModel":
        z = np.load(path, allow_pickle=False)
        return cls(
            labels=tuple(str(x) for x in z["labels"]),
            W=z["W"],
            log_priors=z["log_priors"],
            ns=tuple(int(x) for x in z["ns"]),
            dim=int(z["dim"][0]),
        )

    # -- batched inference (one vectorized pass per Arrow batch; the analog
    #    of one model call per B-row batch, /root/reference/opennsfw2/_inference.py:64-84)
    def predict_batch(self, texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
        codes = [char_codes(t.lower()) if t else None for t in texts]
        return self.predict_batch_codes(codes)

    def predict_batch_codes(
        self, codes: list["np.ndarray | None"]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (labels: object ndarray, confidences: float64 ndarray)
        from pre-lowercased codepoint arrays (None/empty → "und"/0.0).

        score(text) = 64 * mean over ngram occurrences of W[:, hash] +
        log_priors.  Fully vectorized across the batch: all texts'
        codepoints are concatenated, hashed once per n-gram size, and
        per-text sums come from a per-language 1-D gather (W[l] is a 32 KiB
        table — L1-resident) + np.add.reduceat over each text's valid
        (non-boundary-crossing) hash range.  No per-text numpy-call loop,
        no dense (batch, D) matrix, no np.add.at scatter (both earlier
        forms stopped scaling past ~8 workers on one box — call overhead
        and memory traffic respectively).  Float summation order differs
        from the per-text form in the last ulp only (inside the 5e-4
        score tolerance used by every golden).
        """
        n = len(codes)
        if n == 0:
            return np.empty(0, dtype=object), np.empty(0, dtype=np.float64)
        scores = np.tile(self.log_priors, (n, 1))
        arrs, owners = [], []
        for i, c in enumerate(codes):
            if c is not None and len(c):
                arrs.append(c)
                owners.append(i)
        if arrs:
            L = len(self.labels)
            big = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            starts = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            seg_sums = np.zeros((len(arrs), L), dtype=np.float64)
            seg_counts = np.zeros(len(arrs), dtype=np.float64)
            for g in self.ns:
                h = ngram_hashes(big, g, self.dim)
                if not len(h):
                    continue
                cnt = np.maximum(lens - g + 1, 0)
                valid = cnt > 0
                # per-text valid hash range [s, e); clamp indices into
                # [0, len(h)) for reduceat (empty/out-of-range segments
                # produce garbage at their slot — masked by `valid`).
                s = np.minimum(starts, len(h) - 1)
                e = np.minimum(starts + cnt, len(h) - 1)
                last = len(arrs) - 1
                bounds = np.empty(2 * len(arrs), dtype=np.int64)
                bounds[0::2] = s
                bounds[1::2] = e
                # the final segment's end == len(h) is implicit: drop it so
                # reduceat sums to the end of the array
                use = bounds[:-1] if starts[last] + cnt[last] >= len(h) else bounds
                for li in range(L):
                    red = np.add.reduceat(self.W[li][h], use)
                    seg_sums[:, li] += np.where(valid, red[0::2], 0.0)
                seg_counts += cnt
            ok = seg_counts > 0
            contrib = np.zeros_like(seg_sums)
            contrib[ok] = seg_sums[ok] * (64.0 / seg_counts[ok])[:, None]
            scores[np.array(owners)] += contrib
        # softmax → confidence
        scores -= scores.max(axis=1, keepdims=True)
        np.exp(scores, out=scores)
        scores /= scores.sum(axis=1, keepdims=True)
        idx = scores.argmax(axis=1)
        conf = scores[np.arange(n), idx]
        labels = np.array(self.labels, dtype=object)[idx]
        # empty/None texts → unknown with zero confidence
        empty = np.array([c is None or not len(c) for c in codes])
        labels[empty] = "und"
        conf[empty] = 0.0
        return labels, conf


def train(corpus: dict[str, list[str]]) -> LangIdModel:
    """Closed-form multinomial NB from per-language sentence lists."""
    labels = tuple(sorted(corpus))
    counts = np.zeros((len(labels), DIM), dtype=np.float64)
    docs = np.zeros(len(labels), dtype=np.float64)
    for li, lab in enumerate(labels):
        for sent in corpus[lab]:
            codes = char_codes(sent.lower())
            for g in NGRAM_SIZES:
                h = ngram_hashes(codes, g, DIM)
                if len(h):
                    np.add.at(counts[li], h, 1.0)
            docs[li] += 1.0
    totals = counts.sum(axis=1, keepdims=True)
    W = np.log(counts + ALPHA) - np.log(totals + ALPHA * DIM)
    log_priors = np.log(docs / docs.sum())
    return LangIdModel(labels=labels, W=W, log_priors=log_priors)
