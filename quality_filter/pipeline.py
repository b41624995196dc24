"""The quality-filter pipeline: declarative DataFrame plan.

Public API (the reference's three-verb surface analog,
/root/reference/app/routers/prediction.py:30-189):

  * ``score_documents(df, cfg)`` — full per-doc scores for every row
    (the golden path; matches the oracle exactly).
  * ``tiered_scored(df, cfg)``   — production plan: cheap native rules
    first; the model stage and the PII scrub run only for rows that are
    still alive (the decimation-before-expensive-op lesson,
    /root/reference/opennsfw2/_inference.py:205).  Same keep/drop/
    quarantine labels as score_documents; model columns are NULL for
    rows already dropped by the native tier.
  * ``filter_corpus(df, cfg)``   — (kept, dropped, quarantined) views of
    the tiered plan.
  * ``write_filtered(df, outdir, cfg)`` — single-pass partitioned write.

Plan shape (lazy; Catalyst optimizes; Python is crossed exactly twice —
extraction and model scoring — everything else is codegen'd JVM).
Catalyst cannot push a filter through a pandas UDF, and a Python UDF
inside CASE WHEN is still evaluated for every row (ExtractPythonUDFs
hoists it), so tiering is done by masking the UDF's INPUT to NULL —
the Arrow batch still flows but the model kernels skip nulls.
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
    "contribs",
]


def _reasons_col(pairs: list[tuple[str, Column]]) -> Column:
    """ARRAY<STRING> of failed-rule names, in frozen order (the grad-cam
    "why" analog, /root/reference/opennsfw2/_inspection.py:72-100)."""
    return F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in pairs])
    )


def _scored_plan(
    df: DataFrame, cfg: RuleConfig, artifact_dir: str, tiered: bool
) -> DataFrame:
    score_udf = make_score_udf(artifact_dir, cfg.profile)

    ext = df.withColumn(
        "extracted_text", extracted_text_col(F.col("text"), F.col("html"))
    )
    t = F.col("extracted_text")
    quarantined = t.isNull() | (t == "")

    # stage the lowered token array once; every token-consuming feature
    # references the materialized column instead of recomputing the split
    ext = ext.withColumn("_toks", R.tokens_lower_col(t))
    feats = R.feature_columns(t, cfg, toks_lower=F.col("_toks"))
    staged = ext.withColumns(
        {"_quarantined": quarantined, **{f"_f_{k}": v for k, v in feats.items()}}
    )
    f = {k: F.col(f"_f_{k}") for k in feats}

    hard = R.hard_rule_reasons(f, cfg)
    staged = staged.withColumn(
        "_hard_reasons",
        F.when(F.col("_quarantined"), F.array().cast("array<string>")).otherwise(
            _reasons_col(hard)
        ),
    )

    alive = ~F.col("_quarantined") & (F.size("_hard_reasons") == 0)
    # tiered: model stage sees NULL for rows the native tier already
    # decided — Arrow still carries the row, the kernels skip it.
    model_input = F.when(alive, t) if tiered else F.when(~F.col("_quarantined"), t)
    staged = staged.withColumn("_score", score_udf(model_input))

    f["ppl_norm"] = F.when(
        F.lit(cfg.profile == "FULL"), R.ppl_norm_col(F.col("_score.ppl"))
    ).otherwise(F.lit(0.0))

    scrub_input = F.when(alive, t) if tiered else F.when(~F.col("_quarantined"), t)
    staged = staged.withColumns(
        {
            "lang_pred": F.col("_score.lang_pred"),
            "lang_conf": F.col("_score.lang_conf"),
            "ppl": F.col("_score.ppl"),
            "quality_score": R.quality_score_col(f, cfg),
            # numeric attribution next to the boolean reasons (the
            # grad-cam analog, /root/reference/opennsfw2/_inspection.py:103-122)
            "contribs": R.quality_contribs_col(f, cfg),
            "tox_score": R.tox_score_col(t, f["n_words"], cfg),
            "scrubbed_text": R.scrub_pii_col(scrub_input, cfg),
        }
    )

    model_pairs = [
        ("high_ppl", F.lit(cfg.profile == "FULL") & (F.col("ppl") > cfg.max_ppl)),
        ("low_lang_conf", F.col("lang_conf") < cfg.lid_conf_threshold),
        ("lang_not_allowed", ~F.col("lang_pred").isin(*cfg.allowed_langs)),
        ("low_quality", F.col("quality_score") < cfg.quality_threshold),
        ("toxic", F.col("tox_score") >= cfg.tox_threshold),
    ]
    if tiered:
        reasons = (
            F.when(F.col("_quarantined"), F.array(F.lit("undecodable")))
            .when(F.size("_hard_reasons") > 0, F.col("_hard_reasons"))
            .otherwise(_reasons_col(model_pairs))
        )
    else:
        reasons = F.when(
            F.col("_quarantined"), F.array(F.lit("undecodable"))
        ).otherwise(
            F.concat(F.col("_hard_reasons"), _reasons_col(model_pairs))
        )

    out = staged.withColumn("reasons", reasons)
    out = out.withColumns(
        {
            "keep": ~F.col("_quarantined") & (F.size("reasons") == 0),
            "status": F.when(F.col("_quarantined"), F.lit("quarantine"))
            .when(F.size("reasons") == 0, F.lit("keep"))
            .otherwise(F.lit("drop")),
        }
    )
    # quarantined rows expose no scores/text (undecodable); in tiered mode
    # native-tier drops expose no model scores either (never computed).
    mask = ~F.col("_quarantined") if not tiered else alive
    null_masked = {
        c: F.when(mask_col, F.col(c))
        for c, mask_col in {
            "lang_pred": mask, "lang_conf": mask, "ppl": mask,
            "quality_score": ~F.col("_quarantined"),
            "contribs": ~F.col("_quarantined"),
            "tox_score": ~F.col("_quarantined"),
            "scrubbed_text": mask,
            "extracted_text": ~F.col("_quarantined"),
        }.items()
    }
    return out.withColumns(null_masked).select(*SCORED_COLUMNS)


def score_documents(
    df: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> DataFrame:
    """Full scoring plan: every row gets every score — matches the oracle
    (quality_filter/oracle.py) exactly: same extractor module, same model
    artifacts, same frozen formulas."""
    cfg = cfg or load_config(artifact_dir)
    return _scored_plan(df, cfg, artifact_dir, tiered=False)


def tiered_scored(
    df: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> DataFrame:
    """Production plan: identical labels, model work only for survivors."""
    cfg = cfg or load_config(artifact_dir)
    return _scored_plan(df, cfg, artifact_dir, tiered=True)


def filter_corpus(
    df: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(kept, dropped, quarantined) — three views over the tiered plan.
    For a single-pass materialization use write_filtered()."""
    scored = tiered_scored(df, cfg, artifact_dir)
    kept = scored.filter(F.col("status") == "keep").select(
        "url", "warc_ts", "scrubbed_text", "lang_pred", "lang_conf",
        "ppl", "quality_score", "tox_score",
    )
    dropped = scored.filter(F.col("status") == "drop").select(
        "url", "warc_ts", "reasons"
    )
    quarantined = scored.filter(F.col("status") == "quarantine").select(
        "url", "warc_ts", "reasons"
    )
    return kept, dropped, quarantined


def write_filtered(
    df: DataFrame,
    outdir: str,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> None:
    """Single-pass sink: one scan, one model pass, output partitioned by
    status (hive layout `status=keep/...`) so downstream readers get
    partition pruning for free."""
    scored = tiered_scored(df, cfg, artifact_dir)
    scored.write.mode("overwrite").partitionBy("status").parquet(outdir)
