"""Single-threaded oracle pipeline — the source of truth for labels.

Role analog: the original Yahoo/TF1 implementation whose outputs opennsfw2's
goldens were frozen from (/root/reference/README.md:12-20,
/root/reference/plot/plot.py:10-41).  This pure pandas/stdlib pipeline
*defines* golden outputs; the Spark engine must reproduce them — keep/drop
F1 ≥ 0.99 corpus-wide, byte-identical extracted/scrubbed text, 3-dp score
agreement on goldens (pattern: assertAlmostEqual(places=3),
/root/reference/tests/unit/test_core.py:36).

Same extractor module, same model artifacts, same feature spec as the
Spark path — divergence is a bug by definition.
"""

from __future__ import annotations

import pandas as pd

from quality_filter import features as FT
from quality_filter.config import DEFAULT_ARTIFACT_DIR, RuleConfig, load_config
from quality_filter.models.langid import LangIdModel
from quality_filter.models.lm import CharLM
from quality_filter.text.extraction import extract_text_from_bytes

OUTPUT_COLUMNS = [
    "url", "status", "extracted_text", "lang_pred", "lang_conf", "ppl",
    "quality_score", "tox_score", "scrubbed_text", "keep", "reasons",
    "contribs",
]


def run_oracle(
    pages: pd.DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str | None = None,
    models: tuple[LangIdModel, CharLM] | None = None,
) -> pd.DataFrame:
    """Score every page row; returns OUTPUT_COLUMNS, one row per input row.

    status ∈ {keep, drop, quarantine}; reasons = list of failed-rule names
    (the grad-cam "why" analog, /root/reference/opennsfw2/_inspection.py:72-100).
    ``models`` lets a warm caller (quality_filter/serve.py's singleton)
    skip the per-call artifact load — the global-model reuse lesson,
    /root/reference/opennsfw2/_inference.py:18-27."""
    artifact_dir = artifact_dir or DEFAULT_ARTIFACT_DIR
    cfg = cfg or load_config(artifact_dir)
    if models is not None:
        lid, lm = models
    else:
        lid = LangIdModel.load(f"{artifact_dir}/langid.npz")
        lm = CharLM.load(f"{artifact_dir}/lm.npz")

    out_rows = []
    for row in pages.itertuples(index=False):
        url = row.url
        text = row.text if isinstance(row.text, str) else None
        if text is None:
            html = row.html if isinstance(row.html, (bytes, bytearray)) else None
            text = extract_text_from_bytes(html)
        if text is None or text == "":
            out_rows.append(
                (url, "quarantine", None, None, None, None, None, None, None,
                 False, ["undecodable"], None)
            )
            continue

        feats = FT.text_features(text, cfg.stopwords)
        labels, confs = lid.predict_batch([text])
        lang_pred, lang_conf = str(labels[0]), float(confs[0])
        ppl = lm.perplexity(text) if cfg.profile == "FULL" else 0.0
        feats["ppl_norm"] = FT.ppl_norm(ppl) if cfg.profile == "FULL" else 0.0
        q = FT.quality_score(feats, dict(cfg.quality_weights), cfg.quality_bias)
        contribs = FT.quality_contribs(feats, dict(cfg.quality_weights), cfg.quality_bias)
        tox = FT.tox_score(text, cfg.tox_lexicon, feats["n_words"], cfg.tox_a, cfg.tox_b)
        scrubbed = FT.scrub_pii(text, cfg.pii_rules)

        reasons: list[str] = []
        if feats["n_chars"] < cfg.min_chars:
            reasons.append("too_short")
        if feats["n_chars"] > cfg.max_chars:
            reasons.append("too_long")
        if feats["n_words"] < cfg.min_words:
            reasons.append("too_few_words")
        if feats["stopword_ratio"] < cfg.min_stopword_ratio:
            reasons.append("low_stopword")
        if feats["symbol_ratio"] > cfg.max_symbol_ratio:
            reasons.append("high_symbol")
        if feats["distinct_ratio"] < cfg.min_distinct_ratio:
            reasons.append("low_distinct")
        if not (cfg.min_mean_word_len <= feats["mean_word_len"] <= cfg.max_mean_word_len):
            reasons.append("word_len")
        if cfg.profile == "FULL" and ppl > cfg.max_ppl:
            reasons.append("high_ppl")
        if lang_conf < cfg.lid_conf_threshold:
            reasons.append("low_lang_conf")
        if lang_pred not in cfg.allowed_langs:
            reasons.append("lang_not_allowed")
        if q < cfg.quality_threshold:
            reasons.append("low_quality")
        if tox >= cfg.tox_threshold:
            reasons.append("toxic")

        keep = not reasons
        out_rows.append(
            (url, "keep" if keep else "drop", text, lang_pred, lang_conf, ppl,
             q, tox, scrubbed, keep, reasons, contribs)
        )

    return pd.DataFrame(out_rows, columns=OUTPUT_COLUMNS)
