"""Structured Streaming variant — same UDFs, same plan, unbounded input.

The reference's video path is a hand-rolled streaming micro-batch loop
(/root/reference/opennsfw2/_inference.py:155-243); Structured Streaming
gives the same shape declaratively: readStream → the identical scoring
transformations (the dual-surface lesson of preprocess_image_tensor,
/root/reference/opennsfw2/_image.py:71-100) → watermarked tumbling-window
aggregates.  The batch scored-plan builder is reused verbatim because it
contains no batch-only operators (no global sorts/windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quality_filter.config import DEFAULT_ARTIFACT_DIR, RuleConfig
from quality_filter.corpus import pages_spark_schema
from quality_filter.pipeline import tiered_scored


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream over a pages parquet directory."""
    return (
        spark.readStream.schema(pages_spark_schema())
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def score_stream(
    sdf: DataFrame,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> DataFrame:
    """The batch plan applied to a streaming DataFrame — per-row scoring
    is stateless, so it is trigger-compatible unchanged."""
    return tiered_scored(sdf, cfg, artifact_dir)


def windowed_keep_rate(
    scored_stream: DataFrame,
    watermark: str = "1 hour",
    window: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window keep/drop rates — the streaming analog
    of the buffer-and-aggregate video loop; the watermark is the state
    eviction bound the reference's buffer reset provides implicitly."""
    return (
        scored_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("status") == "keep", 1).otherwise(0)).alias("n_keep"),
            F.avg("quality_score").alias("avg_quality"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs", "n_keep", "avg_quality",
        )
    )


def stream_sessionized_counts(
    sdf: DataFrame,
    key: str,
    ts: str,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming session windows: per-key event counts over gap-merged
    sessions (`F.session_window` — the state store merges/extends
    sessions as events arrive; the watermark closes and emits them).
    Batch twin: operators/windows.sessionize — identical session
    boundaries by definition (new session iff the gap is exceeded), so
    (key, session_start, n_events) agree exactly."""
    return (
        sdf.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), key, "n_events")
    )


def stream_dedup_exact(
    sdf: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first-seen wins within the watermark
    horizon.  `dropDuplicatesWithinWatermark` keys the state store by
    the md5 fingerprint (same normalization as dedup.fingerprint_col,
    so batch and stream agree on what counts as a duplicate) and evicts
    fingerprint state once the watermark passes — bounded state, unlike
    an unbounded dropDuplicates which would grow with the corpus.

    "First-seen" is trigger-granular: rows in EARLIER micro-batches
    always beat later ones, but among same-fingerprint rows inside one
    micro-batch the kept row is task/partition-order dependent (Spark
    keeps an arbitrary row, not the min id).  For exact dups every
    representative carries identical text, so downstream VALUES are
    unaffected; only the surviving id/timestamp columns can vary
    run-to-run when duplicates land in the same trigger."""
    from quality_filter.operators.dedup import fingerprint_col

    return (
        sdf.withColumn("_fp", fingerprint_col(F.col(text_col)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def stream_top_terms(
    sdf: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming (window_start, term, n) term counts — the incremental
    twin of textagg.top_terms (same lower/trim/space tokenization, so a
    window's counts equal the batch aggregate over the same rows).  The
    global top-k head stays a batch/sink-side concern: a streaming
    global rank would need complete-mode state over the whole
    vocabulary, while windowed counts are append-mode with watermark
    eviction — bounded state, and the partial count still collapses the
    explode before the shuffle."""
    toks = F.explode(F.split(F.lower(F.trim(F.col(text_col))), "[ ]+")).alias("term")
    return (
        sdf.select(F.col(ts_col), toks)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )


def _dedup():
    from quality_filter.operators import dedup as D

    return D


def _per_row_band_stream(
    sdf: DataFrame, text_col: str, id_col: str, ts_col: str,
    num_hashes: int, band_size: int,
) -> DataFrame:
    """(id, ts, band_idx, band_key) rows from a page stream: per-row
    MinHash signature (no aggregation — runs before any stateful stage)
    → band-key explode; shingle-less docs get a self-keyed band that can
    never collide (matches the batch rule that a NULL band key never
    clusters).  Shared by the within-stream and stream-vs-index
    near-dup operators."""
    D = _dedup()
    staged = sdf.withColumn("_sh", D.shingles(F.col(text_col))).withColumn(
        "_mh", D.minhash_from_shingles(F.col("_sh"), num_hashes)
    )
    return (
        staged.select(
            F.col(id_col),
            F.col(ts_col),
            F.explode(
                D.band_entries_from_signature(F.col("_mh"), num_hashes, band_size)
            ).alias("_b"),
        )
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.col("_b.band_idx").alias("band_idx"),
            F.coalesce(
                F.col("_b.band_key"),
                F.concat(F.lit("self|"), F.col(id_col).cast("string")),
            ).alias("band_key"),
        )
    )


def stream_incremental_near_dup(
    sdf: DataFrame,
    index_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    ts_col: str = "warc_ts",
    delay: str = "1 hour",
    window: str = "1 hour",
    num_hashes: int | None = None,
    band_size: int | None = None,
) -> DataFrame:
    """Streaming daily-increment near-dup: the new-page stream probes the
    accepted corpus's PERSISTED band index (dedup.write_band_index /
    read_band_index) via a stream-static LEFT ANTI join, then claims the
    surviving band keys within the stream — the streaming twin of
    dedup.incremental_near_dup_flags.

    A doc survives iff (a) none of its bands exists in the static index
    (any hit removes that band row, so the all-bands-claimed count test
    fails) and (b) it claimed all its bands first within the stream
    (arrival order replacing doc-id order in the greedy batch
    semantics).  The static side is read per micro-batch straight from
    the partitioned parquet index — never re-signed, never shuffled as
    state; streaming state is only the one-watermark-horizon band-claim
    set.  Output: (window_start, id) of accepted new docs, append-mode."""
    num_hashes = num_hashes or _dedup().DEFAULT_NUM_HASHES
    band_size = band_size or _dedup().DEFAULT_BAND_SIZE
    n_bands = num_hashes // band_size

    bands = _per_row_band_stream(sdf, text_col, id_col, ts_col, num_hashes, band_size)
    fresh = bands.join(
        index_bands.select("band_idx", "band_key"),
        ["band_idx", "band_key"],
        "left_anti",
    )
    claimed = fresh.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["band_idx", "band_key"]
    )
    return (
        claimed.groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("_n_claimed"))
        .filter(F.col("_n_claimed") == n_bands)
        .select(F.col("w.start").alias("window_start"), F.col(id_col))
    )


def stream_near_dup_survivors(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    ts_col: str = "warc_ts",
    delay: str = "1 hour",
    window: str = "1 hour",
    num_hashes: int | None = None,
    band_size: int | None = None,
) -> DataFrame:
    """Streaming near-dup suppression: first-seen-wins on LSH band keys.

    Per-row MinHash signature (dedup.minhash_from_shingles — no
    aggregation, so it runs before the stateful stage) → explode band
    keys → ``dropDuplicatesWithinWatermark`` keyed on (band_idx,
    band_key) claims each band bucket for its first-arriving doc, with
    state evicted at the watermark — bounded by the band-key cardinality
    of one horizon, never corpus size.  A doc survives iff it claimed
    ALL its bands (windowed count == n_bands): any band already claimed
    by an earlier doc marks it a near-dup, the streaming analog of a
    band collision edge.  Shingle-less docs get a self-keyed band
    (never collides → always survive), matching the batch rule that a
    NULL band key never clusters.

    Semantics note: greedy first-seen differs from the batch
    min-id-survivor ONLY on bridge docs (a doc colliding with two
    otherwise-separate earlier docs: batch merges all three into one
    cluster transitively; the stream has already emitted both earlier
    docs and drops just the bridge).  On transitively-closed clusters —
    exact dups, boilerplate families — survivor COUNT and one-per-
    cluster membership agree exactly (pinned by test).

    "First-arriving" is likewise trigger-granular (see
    stream_dedup_exact): across micro-batches arrival order decides;
    within one micro-batch the band claimant among same-batch
    colliders is task/partition-order dependent, NOT doc-id order — so
    WHICH cluster member survives is only run-deterministic when
    colliders are separated by triggers.  One-survivor-per-cluster
    and survivor counts hold regardless (that is what the tests pin);
    pipelines needing an id-deterministic survivor should run the
    batch near_dup_survivors over each closed horizon instead.

    Output: (window_start, id) of surviving docs, append-mode."""
    num_hashes = num_hashes or _dedup().DEFAULT_NUM_HASHES
    band_size = band_size or _dedup().DEFAULT_BAND_SIZE
    n_bands = num_hashes // band_size

    bands = _per_row_band_stream(sdf, text_col, id_col, ts_col, num_hashes, band_size)
    claimed = bands.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["band_idx", "band_key"]
    )
    return (
        claimed.groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("_n_claimed"))
        .filter(F.col("_n_claimed") == n_bands)
        .select(F.col("w.start").alias("window_start"), F.col(id_col))
    )


def run_stream_to_parquet(
    scored_stream: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Sink helper: exactly-once parquet append with a streaming checkpoint
    (offset log + commit log — Spark's own resume mechanism, complementing
    the batch manifest in io/checkpoint.py)."""
    writer = (
        scored_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_url_dedup(
    sdf: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming URL-level dedup: first-seen wins per CANONICAL URL
    within the watermark horizon — the crawl-frontier dedup that keeps a
    live ingest from re-processing scheme/www/tracking-param variants of
    a page it already accepted.  Same canonicalization as the batch tier
    (io.pages.canonical_url_col, JVM-native narrow map), so batch and
    stream agree on page identity; dropDuplicatesWithinWatermark keys
    the state store by the canonical string and evicts it past the
    watermark — bounded state.  First-seen is trigger-granular, exactly
    like stream_dedup_exact."""
    from quality_filter.io.pages import canonical_url_col

    return (
        sdf.withColumn("_curl", canonical_url_col(F.col(url_col)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_curl"])
        .drop("_curl")
    )


def stream_winnowing_dedup(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    ts_col: str = "warc_ts",
    delay: str = "1 hour",
    window: str = "1 hour",
    k: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Streaming LOCAL near-dup suppression on winnowing fingerprints:
    first-seen-wins fp claims via ``dropDuplicatesWithinWatermark``,
    survive iff every fingerprint was claimed (the
    stream_near_dup_survivors algebra with fp keys instead of band
    keys, and a per-doc claim quota instead of the fixed n_bands —
    winnowing emits a variable fingerprint count per doc).

    The fingerprint array is the SAME shared expression as the batch
    operator (dedup.winnowing_fp_array_col — pure narrow map, legal
    before the stateful stage), so batch and stream agree on what a
    fingerprint is.  Docs below the w-window minimum (no fingerprints)
    get a self-keyed sentinel claim that can never collide — they
    always survive, matching the batch strict-window form where such
    docs never pair.  State is bounded by the fp cardinality of one
    watermark horizon.  Same greedy first-seen caveats as the band
    variant (trigger-granular arrival order; bridge docs).

    Output: (window_start, id) of surviving docs, append-mode."""
    D = _dedup()
    k = k or D.WINNOW_K
    w = w or D.WINNOW_W
    base = sdf.withColumn(
        "_fps", D.winnowing_fp_array_col(F.col(text_col), k, w)
    ).withColumn("_nreq", F.greatest(F.size("_fps"), F.lit(1)))
    exploded = base.select(
        F.col(id_col),
        F.col(ts_col),
        F.col("_nreq"),
        F.explode(
            F.when(
                F.size("_fps") == 0,
                F.array(F.concat(F.lit("self:"), F.col(id_col).cast("string"))),
            ).otherwise(F.transform(F.col("_fps"), lambda x: x.cast("string")))
        ).alias("fp_key"),
    )
    claimed = exploded.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["fp_key"]
    )
    return (
        claimed.groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("_n_claimed"),
            F.max("_nreq").alias("_nreq"),
        )
        .filter(F.col("_n_claimed") == F.col("_nreq"))
        .select(F.col("w.start").alias("window_start"), F.col(id_col))
    )


def stream_host_edges(
    sdf: DataFrame,
    html_col: str = "html_str",
    host_col: str = "host",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    drop_self: bool = True,
) -> DataFrame:
    """Crawl-time link-graph accumulation: per event-time window, the
    weighted ``(src, dst, w)`` host edges extracted from the pages
    streaming in — the live twin of ``operators/links.host_edges``
    (same href/resolution expressions, so batch and stream agree on
    every edge by construction).  Extraction and host resolution are
    the same JVM-native narrow maps as batch; state is the windowed
    (src, dst) count — O(windows × unique host pairs), a dimension
    regardless of crawl volume (a host linked by every page of a
    window collapses into one state row).  Windowed edge counts merge
    downstream by addition, exactly like batch shard edge lists."""
    from quality_filter.operators.links import link_host_col, outlink_urls_col

    inst = sdf.select(
        F.col(ts_col),
        F.lower(F.col(host_col)).alias("src"),
        F.explode(outlink_urls_col(F.col(html_col))).alias("link"),
    )
    resolved = inst.select(
        F.col(ts_col), "src", link_host_col(F.col("link"), F.col("src")).alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("dst") != ""))
    if drop_self:
        resolved = resolved.filter(F.col("dst") != F.col("src"))
    return (
        resolved.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w_cnt"))
        .select(F.col("w.start").alias("window_start"), "src", "dst",
                F.col("w_cnt").alias("w"))
    )


def stream_term_cms(
    sdf: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed count-min sketch over a document stream: per event-time
    window, the SAME depth×width cell counts as the batch
    textagg.term_cms_sketch (same md5 bucket universe) — the
    state-bounded twin of stream_top_terms: its state grows with the
    vocabulary inside each window, this stays O(windows × depth × width)
    no matter what the crawl contains (adversarial vocab blowup cannot
    OOM the state store).  Windows merge cell-wise downstream, exactly
    like batch shard sketches."""
    from quality_filter.operators.textagg import cms_bucket_array, terms_exploded

    return (
        sdf.select(F.col(ts_col), terms_exploded(F.col(text_col)).alias("term"))
        .select(F.col(ts_col), F.posexplode(cms_bucket_array(F.col("term"))).alias("sketch_row", "bucket"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "sketch_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "sketch_row", "bucket", "cnt")
    )


def stream_distilled_gate(
    sdf: DataFrame,
    weights: dict,
    cfg: RuleConfig | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Train-batch / serve-streaming: the in-engine trained distilled
    gate (operators/distill.py) applied to an unbounded document
    stream.  Scoring is a STATELESS zero-shuffle narrow map over
    literal weights (exact-integer margin >= 2^31), so it is
    trigger-compatible unchanged — no state store, no watermark, no
    Python crossing; the exact deploy shape that replaces the full
    rule stack per micro-batch once batch-measured agreement is
    acceptable (distilled_gate_agreement)."""
    from quality_filter.config import load_config
    from quality_filter.functions.rules import feature_columns
    from quality_filter.operators.distill import (
        DISTILL_TARGET,
        feature_ints,
        margin_col,
        model_keep_col,
    )

    cfg = cfg or load_config()
    xi = feature_ints(feature_columns(F.col(text_col), cfg))
    return sdf.select(
        "*",
        margin_col(xi, weights).alias("margin_int"),
        model_keep_col(xi, weights).alias("model_keep"),
    )


def stream_bpe_token_counts(
    sdf: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-batch / serve-streaming for the tokenizer: a merge table
    learned offline (textagg._bpe_merge_list over the training corpus)
    applied to an unbounded document stream.  The application is the
    batch path's own column expression (textagg._bpe_apply_cols):
    sentinel spacing + K literal replaces + sentinel-count arithmetic —
    a STATELESS zero-shuffle narrow map, trigger-compatible unchanged
    (no state store, no watermark, no Python crossing).  This is how a
    100 TB pipeline prices incoming docs in REAL tokenizer units at
    ingest time without re-reading the corpus the tokenizer was
    trained on."""
    from quality_filter.operators.textagg import _bpe_apply_cols

    n_bpe, _ = _bpe_apply_cols(text_col, merges)
    return sdf.select(
        F.col(id_col), n_bpe.cast("long").alias("n_bpe_tokens")
    )
