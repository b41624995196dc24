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

    def __post_init__(self) -> None:
        # row-gather layout: WT[h] is one cache line per hash — the hot
        # path never materializes a dense (batch, D) matrix
        object.__setattr__(self, "_WT", np.ascontiguousarray(self.W.T))

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

    # -- batched inference (one matmul per Arrow batch; the analog of
    #    one model call per B-row batch, /root/reference/opennsfw2/_inference.py:64-84)
    def predict_batch(self, texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
        """Returns (labels: object ndarray, confidences: float64 ndarray).

        score(text) = 64 * mean over ngram occurrences of W[:, hash] +
        log_priors — mathematically identical to the L1-normalized
        bag-of-hashed-ngrams times W, but computed as a row gather over
        W.T (no dense (batch, D) matrix, no np.add.at scatter; the dense
        form did not scale past ~8 workers on one box — memory traffic).
        """
        n = len(texts)
        WT = self._WT  # (D, L)
        scores = np.tile(self.log_priors, (n, 1))
        for i, t in enumerate(texts):
            if not t:
                continue
            codes = char_codes(t.lower())
            hs = [h for g in self.ns if len(h := ngram_hashes(codes, g, self.dim))]
            if not hs:
                continue
            h_all = np.concatenate(hs) if len(hs) > 1 else hs[0]
            scores[i] += WT[h_all].sum(axis=0) * (64.0 / len(h_all))
        # softmax → confidence
        scores -= scores.max(axis=1, keepdims=True)
        np.exp(scores, out=scores)
        scores /= scores.sum(axis=1, keepdims=True)
        idx = scores.argmax(axis=1)
        conf = scores[np.arange(n), idx]
        labels = np.array(self.labels, dtype=object)[idx]
        # empty/None texts → unknown with zero confidence
        empty = np.array([not t for t in texts])
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
