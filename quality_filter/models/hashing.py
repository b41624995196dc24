"""Deterministic vectorized character-n-gram feature hashing.

Used by both the langid model and the character-LM.  The hash is a plain
polynomial rolling hash over Unicode codepoints, computed with numpy
vector ops (no per-character Python loop) — the same kernel runs in the
oracle and inside Spark python workers, so features are bit-identical
everywhere.  Never uses Python's builtin ``hash`` (randomized per
process, would break determinism).
"""

from __future__ import annotations

import numpy as np

# FNV-ish multiplier; uint64 arithmetic wraps mod 2**64 (numpy unsigned
# overflow semantics), which is part of the frozen hash definition.
_MULT = np.uint64(1099511628211)
_SEED = np.uint64(14695981039346656037)


def char_codes(text: str) -> np.ndarray:
    """Codepoints of ``text`` as a uint32 array (vectorized decode)."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def ngram_hashes(codes: np.ndarray, n: int, dim: int) -> np.ndarray:
    """Hashes of every n-gram of ``codes`` into ``[0, dim)``.

    ``dim`` must be a power of two.  Returns an int64 array of length
    ``len(codes) - n + 1`` (empty if the text is shorter than n).

    BITWISE-frozen kernel (uint64 wrap-around arithmetic): the in-place
    multiply/add below computes the identical value sequence as the
    allocating ``acc = acc * M + slice.astype(u64)`` form — integer ops
    have no reassociation concerns, only allocator traffic changes
    (measured 1.7x on the LM batch path; pinned by a bitwise
    differential test against the allocating spec).
    """
    m = len(codes) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    codes64 = np.asarray(codes, dtype=np.uint64)  # no copy when already u64
    acc = np.full(m, _SEED + np.uint64(n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            np.multiply(acc, _MULT, out=acc)
            np.add(acc, codes64[j : j + m], out=acc)
    return (acc & np.uint64(dim - 1)).astype(np.int64)


def hashed_count_vector(text: str, ns: tuple[int, ...], dim: int) -> np.ndarray:
    """Bag-of-hashed-n-grams count vector (float64, length ``dim``)."""
    vec = np.zeros(dim, dtype=np.float64)
    codes = char_codes(text)
    for n in ns:
        h = ngram_hashes(codes, n, dim)
        if len(h):
            np.add.at(vec, h, 1.0)
    return vec
