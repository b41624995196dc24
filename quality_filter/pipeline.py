"""The quality-filter pipeline: declarative DataFrame plan.

Public API (the reference's three-verb surface analog,
/root/reference/app/routers/prediction.py:30-189):

  * ``score_documents(df, cfg)``   — full per-doc scores + keep/drop/quarantine
  * ``filter_corpus(df, cfg)``     — tiered fast path → (kept, dropped,
                                      quarantined) + metrics
  * ``quality_filter.streaming.score_stream`` — same UDFs on a stream

Plan shape (lazy; Catalyst optimizes; Python is crossed exactly twice —
extraction and model scoring — everything else is codegen'd JVM):

  scan → coalesce(text, extract_udf(html)) → native features →
  score_udf(lang, conf, ppl) → quality/tox sigmoids → PII scrub →
  reasons/keep gate
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quality_filter.config import DEFAULT_ARTIFACT_DIR, RuleConfig, load_config
from quality_filter.functions import rules as R
from quality_filter.operators.extract import extracted_text_col
from quality_filter.operators.score import make_score_udf

SCORED_COLUMNS = [
    "url", "warc_ts", "status", "extracted_text", "lang_pred", "lang_conf",
    "ppl", "quality_score", "tox_score", "scrubbed_text", "keep", "reasons",
]


def _reasons_col(pairs: list[tuple[str, Column]]) -> Column:
    """ARRAY<STRING> of failed-rule names, in frozen order (the grad-cam
    "why" analog, /root/reference/opennsfw2/_inspection.py:72-100)."""
    return F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in pairs])
    )


def score_documents(
    df: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> DataFrame:
    """Full scoring plan: every input row → one output row with scores,
    scrubbed text, reasons and status ∈ {keep, drop, quarantine}.

    Matches the oracle (quality_filter/oracle.py) exactly: same extractor
    module, same artifacts, same frozen formulas.
    """
    cfg = cfg or load_config(artifact_dir)
    score_udf = make_score_udf(artifact_dir, cfg.profile)

    ext = df.withColumn("extracted_text", extracted_text_col(F.col("text"), F.col("html")))

    t = F.col("extracted_text")
    quarantined = t.isNull() | (t == "")

    feats = R.feature_columns(t, cfg)
    scored = ext.withColumns(
        {
            "_quarantined": quarantined,
            "_score": F.when(~quarantined, score_udf(t)),
            **{f"_f_{k}": v for k, v in feats.items()},
        }
    )

    f = {k: F.col(f"_f_{k}") for k in feats}
    f["ppl_norm"] = F.when(
        F.lit(cfg.profile == "FULL"), R.ppl_norm_col(F.col("_score.ppl"))
    ).otherwise(F.lit(0.0))

    scored = scored.withColumns(
        {
            "lang_pred": F.col("_score.lang_pred"),
            "lang_conf": F.col("_score.lang_conf"),
            "ppl": F.col("_score.ppl"),
            "quality_score": R.quality_score_col(f, cfg),
            "tox_score": R.tox_score_col(t, f["n_words"], cfg),
            "scrubbed_text": R.scrub_pii_col(t, cfg),
        }
    )

    reason_pairs = R.hard_rule_reasons(f, cfg) + [
        ("high_ppl", F.lit(cfg.profile == "FULL") & (F.col("ppl") > cfg.max_ppl)),
        ("low_lang_conf", F.col("lang_conf") < cfg.lid_conf_threshold),
        ("lang_not_allowed", ~F.col("lang_pred").isin(*cfg.allowed_langs)),
        ("low_quality", F.col("quality_score") < cfg.quality_threshold),
        ("toxic", F.col("tox_score") >= cfg.tox_threshold),
    ]

    out = scored.withColumn(
        "reasons",
        F.when(F.col("_quarantined"), F.array(F.lit("undecodable"))).otherwise(
            _reasons_col(reason_pairs)
        ),
    )
    out = out.withColumns(
        {
            "keep": ~F.col("_quarantined") & (F.size("reasons") == 0),
            "status": F.when(F.col("_quarantined"), F.lit("quarantine"))
            .when(F.size("reasons") == 0, F.lit("keep"))
            .otherwise(F.lit("drop")),
        }
    )
    # quarantined rows expose no scores/text (undecodable)
    null_if_q = {
        c: F.when(~F.col("_quarantined"), F.col(c))
        for c in ("extracted_text", "lang_pred", "lang_conf", "ppl",
                  "quality_score", "tox_score", "scrubbed_text")
    }
    return out.withColumns(null_if_q).select(*SCORED_COLUMNS)


def filter_corpus(
    df: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tiered production path → (kept, dropped, quarantined).

    Tier 1 (native, codegen): extraction + heuristic rules; rows failing a
    hard rule are dropped WITHOUT paying the model stage — the
    score-every-kth-frame decimation lesson
    (/root/reference/opennsfw2/_inference.py:205): never run the expensive
    operator on rows a cheap gate already decided.  Catalyst cannot push a
    filter through a pandas UDF, so this stage ordering is done here, by
    construction.  Tier-1-dropped rows carry only their native reasons
    (documented divergence from score_documents' full reason list; the
    keep/drop LABEL is identical).

    Tier 2 (Arrow/Python): langid + perplexity on survivors only, then the
    model-dependent gates.
    """
    cfg = cfg or load_config(artifact_dir)
    score_udf = make_score_udf(artifact_dir, cfg.profile)

    ext = df.withColumn("extracted_text", extracted_text_col(F.col("text"), F.col("html")))
    t = F.col("extracted_text")

    quarantined = ext.filter(t.isNull() | (t == "")).withColumn(
        "reasons", F.array(F.lit("undecodable"))
    )
    live = ext.filter(t.isNotNull() & (t != ""))

    feats = R.feature_columns(t, cfg)
    live = live.withColumns({f"_f_{k}": v for k, v in feats.items()})
    f = {k: F.col(f"_f_{k}") for k in feats}

    hard = R.hard_rule_reasons(f, cfg)
    live = live.withColumn("_hard_reasons", _reasons_col(hard))
    tier1_dropped = live.filter(F.size("_hard_reasons") > 0).withColumn(
        "reasons", F.col("_hard_reasons")
    )

    survivors = live.filter(F.size("_hard_reasons") == 0)
    survivors = survivors.withColumn("_score", score_udf(t))
    f["ppl_norm"] = F.when(
        F.lit(cfg.profile == "FULL"), R.ppl_norm_col(F.col("_score.ppl"))
    ).otherwise(F.lit(0.0))
    survivors = survivors.withColumns(
        {
            "lang_pred": F.col("_score.lang_pred"),
            "lang_conf": F.col("_score.lang_conf"),
            "ppl": F.col("_score.ppl"),
            "quality_score": R.quality_score_col(f, cfg),
            "tox_score": R.tox_score_col(t, f["n_words"], cfg),
        }
    )
    model_pairs = [
        ("high_ppl", F.lit(cfg.profile == "FULL") & (F.col("ppl") > cfg.max_ppl)),
        ("low_lang_conf", F.col("lang_conf") < cfg.lid_conf_threshold),
        ("lang_not_allowed", ~F.col("lang_pred").isin(*cfg.allowed_langs)),
        ("low_quality", F.col("quality_score") < cfg.quality_threshold),
        ("toxic", F.col("tox_score") >= cfg.tox_threshold),
    ]
    survivors = survivors.withColumn("reasons", _reasons_col(model_pairs))

    kept = (
        survivors.filter(F.size("reasons") == 0)
        .withColumn("scrubbed_text", R.scrub_pii_col(t, cfg))
    )
    tier2_dropped = survivors.filter(F.size("reasons") > 0)

    keep_cols = ["url", "warc_ts", "scrubbed_text", "lang_pred", "lang_conf",
                 "ppl", "quality_score", "tox_score"]
    drop_cols = ["url", "warc_ts", "reasons"]
    dropped = tier1_dropped.select(*drop_cols).unionByName(
        tier2_dropped.select(*drop_cols)
    )
    return (
        kept.select(*keep_cols),
        dropped,
        quarantined.select("url", "warc_ts", "reasons"),
    )
