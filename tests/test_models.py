"""Model artifact tests: determinism + separation power."""

import random

import numpy as np
import pytest

from quality_filter import corpus
from quality_filter.config import DEFAULT_ARTIFACT_DIR
from quality_filter.models import hashing
from quality_filter.models.langid import LangIdModel
from quality_filter.models.lm import CharLM, DEFAULT_PPL


@pytest.fixture(scope="module")
def lid() -> LangIdModel:
    return LangIdModel.load(f"{DEFAULT_ARTIFACT_DIR}/langid.npz")


@pytest.fixture(scope="module")
def lm() -> CharLM:
    return CharLM.load(f"{DEFAULT_ARTIFACT_DIR}/lm.npz")


def test_hashing_deterministic():
    codes = hashing.char_codes("hello wörld 中文")
    h1 = hashing.ngram_hashes(codes, 3, 4096)
    h2 = hashing.ngram_hashes(codes, 3, 4096)
    assert (h1 == h2).all()
    assert h1.min() >= 0 and h1.max() < 4096


def test_hashing_short_text():
    assert len(hashing.ngram_hashes(hashing.char_codes("ab"), 3, 64)) == 0
    assert len(hashing.char_codes("")) == 0


def test_langid_heldout_accuracy(lid):
    # held-out sentences from a DIFFERENT seed than training (seed=7)
    rnd = random.Random(991)
    texts, truth = [], []
    for lang in corpus.LANGS:
        for _ in range(40):
            texts.append(" ".join(rnd.choices(corpus.WORDS[lang], k=12)))
            truth.append(lang)
    labels, confs = lid.predict_batch(texts)
    acc = float(np.mean(labels == np.array(truth, dtype=object)))
    assert acc >= 0.98, f"langid held-out accuracy {acc}"
    assert float(np.median(confs)) > 0.9


def test_langid_empty_text(lid):
    labels, confs = lid.predict_batch([None, ""])
    assert list(labels) == ["und", "und"]
    assert confs.tolist() == [0.0, 0.0]


def test_lm_separates_gibberish(lm):
    rnd = random.Random(17)
    clean = " ".join(rnd.choices(corpus.WORDS["en"], k=60))
    gib = " ".join("".join(rnd.choices("qxzjkvwf", k=7)) for _ in range(60))
    assert lm.perplexity(clean) < 60 < 200 < lm.perplexity(gib)


def test_lm_short_text_default(lm):
    assert lm.perplexity("ab") == DEFAULT_PPL
    assert lm.perplexity(None) == DEFAULT_PPL


def test_artifact_rebuild_is_identical(tmp_path):
    """Rebuilding artifacts yields bit-identical models (frozen-weights
    analog, /root/reference/opennsfw2/_download.py:9-10)."""
    from quality_filter.artifacts_src.builder import build_all

    out = build_all(str(tmp_path))
    a = LangIdModel.load(out["langid"])
    b = LangIdModel.load(f"{DEFAULT_ARTIFACT_DIR}/langid.npz")
    assert (a.W == b.W).all() and a.labels == b.labels
    la = CharLM.load(out["lm"])
    lb = CharLM.load(f"{DEFAULT_ARTIFACT_DIR}/lm.npz")
    assert (la.hi == lb.hi).all() and (la.lo == lb.lo).all()


def test_langid_batch_matches_single(lid):
    """Batch composition must not change any row's result (the oracle
    calls predict_batch([t]) per doc; Spark batches arbitrarily)."""
    import numpy as np

    cases = [
        None, "", "a", "ab", "  ", "a b",
        "hello world this is clearly english text with the and of",
        "中文文本测试一下", "z" * 2, "q" * 3,
    ]
    labels, confs = lid.predict_batch(cases)
    for i, t in enumerate(cases):
        l1, c1 = lid.predict_batch([t])
        assert l1[0] == labels[i], (i, t)
        assert abs(float(c1[0]) - float(confs[i])) < 1e-12, (i, t)
    # empty batch
    l0, c0 = lid.predict_batch([])
    assert len(l0) == 0 and len(c0) == 0


def test_lm_batch_matches_single(lm):
    import numpy as np

    cases = [None, "", "abcd", "abcde", "hello there world", "日本語のテキスト"]
    batch = lm.perplexity_batch(cases)
    single = np.array([lm.perplexity(t) for t in cases])
    assert np.allclose(batch, single, rtol=1e-12)


def test_ngram_hashes_bitwise_match_allocating_spec():
    """The in-place multiply/add kernel must reproduce the allocating
    ``acc = acc * M + slice.astype(u64)`` spec EXACTLY (uint64 wrap
    arithmetic — same values in the same order, only allocator traffic
    differs).  Template: bitwise differential per the vectorization
    invariant; covers wrap-heavy codepoints, both orders, and the
    pre-cast uint64 input path used by the LM batch."""
    import numpy as np

    from quality_filter.models.hashing import _MULT, _SEED, char_codes, ngram_hashes

    def spec(codes, n, dim):
        m = len(codes) - n + 1
        if m <= 0:
            return np.empty(0, dtype=np.int64)
        acc = np.full(m, _SEED + np.uint64(n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc = acc * _MULT + codes[j : j + m].astype(np.uint64)
        return (acc & np.uint64(dim - 1)).astype(np.int64)

    rng = np.random.default_rng(20260817)
    cases = [
        char_codes("the quick brown fox jumps over the lazy dog"),
        char_codes("héllo wörld \U0001f600 ￿ mixed unicode"),
        rng.integers(0, 0x110000, size=4096).astype(np.uint32),  # wrap-heavy
        np.array([0xFFFFFFFF] * 64, dtype=np.uint32),            # max uint32
        char_codes("abcd"),                                       # shorter than 5
        np.empty(0, dtype=np.uint32),
    ]
    for codes in cases:
        for n in (4, 5):
            for dim in (1 << 20, 1 << 16):
                a = ngram_hashes(codes, n, dim)
                b = spec(codes, n, dim)
                assert a.dtype == b.dtype and np.array_equal(a, b)
                # pre-cast uint64 input (the LM batch path) — same bits
                c = ngram_hashes(codes.astype(np.uint64), n, dim)
                assert np.array_equal(c, b)
