"""Watermarked tumbling-window keep-rate over a scored stream."""

import pytest

from quality_filter.corpus import generate_pages, pages_spark_schema
from quality_filter.pipeline import tiered_scored
from quality_filter.streaming.stream import (
    read_pages_stream, score_stream, windowed_keep_rate,
)

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    """F.session_window (streaming, state-store merged) must produce the
    same (user, session_start, n_events) set as the batch lag-based
    sessionize — identical gap semantics by definition."""
    from pyspark.sql import functions as F

    from quality_filter.operators.windows import sessionize
    from quality_filter.streaming.stream import stream_sessionized_counts

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(F.col("user_id") <= 20)
        # the parquet reads as TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    # sentinel in a LATER file: session windows emit in append mode only
    # once the watermark passes their end; the far-future row flushes
    # every real session (excluded from the comparison below)
    import time

    time.sleep(0.3)
    spark.createDataFrame(
        [(10**6, ev.agg(F.max("ts")).head()[0] + __import__("datetime").timedelta(days=30),
          9999, "view", 1.0, "{}")],
        schema=ev.schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    agg = stream_sessionized_counts(stream, "user_id", "ts", gap="1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
        if r["user_id"] != 9999
    }

    batch = sessionize(ev, "user_id", "ts", "event_id", gap_seconds=3600)
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_stream_top_terms_matches_batch_window_counts(spark, tmp_path):
    """Every (window, term, n) the stream emits must equal the batch
    explode+groupBy over the same rows (same tokenization as
    textagg.top_terms)."""
    from pyspark.sql import functions as F

    from quality_filter.streaming.stream import stream_top_terms

    pages = generate_pages(150, seed=31, days=2).drop(columns=["cls"])
    sdf_b = spark.createDataFrame(pages, schema=pages_spark_schema()).filter(
        F.col("text").isNotNull()
    )
    src = str(tmp_path / "tt_src")
    sdf_b.write.parquet(src)

    stream = read_pages_stream(spark, src, max_files=3).filter(F.col("text").isNotNull())
    agg = stream_top_terms(stream, "text", "warc_ts", window="6 hours", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("topterms")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["term"], r["n"])
        for r in spark.sql("select * from topterms").collect()
    }
    want = {
        (r["window_start"], r["term"], r["n"])
        for r in sdf_b.select(
            F.window("warc_ts", "6 hours").alias("w"),
            F.explode(F.split(F.lower(F.trim("text")), "[ ]+")).alias("term"),
        )
        .groupBy(F.col("w.start").alias("window_start"), "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 100


def test_stream_near_dup_survivors_matches_batch_clusters(spark, tmp_path):
    """Streaming band-key near-dup vs batch LSH survivors on a corpus of
    transitively-closed duplicate clusters: survivor COUNT matches and
    exactly one survivor emerges per batch cluster; shingle-less docs
    always survive (self-keyed bands)."""
    import pandas as pd_
    from pyspark.sql import functions as F

    from quality_filter.operators import dedup
    from quality_filter.streaming.stream import stream_near_dup_survivors

    pages = generate_pages(80, seed=13, days=1).drop(columns=["cls"])
    pages = pages[pages["text"].notna()].reset_index(drop=True)
    # exact-duplicate clusters (identical signature -> all bands collide)
    dup = pages.iloc[:20].copy()
    dup["url"] = dup["url"] + "?copy=1"
    dup2 = pages.iloc[:8].copy()
    dup2["url"] = dup2["url"] + "?copy=2"
    # shingle-less docs (< 3 tokens): must always survive
    tiny = pages.iloc[:4].copy()
    tiny["url"] = "tiny://" + tiny["url"]
    tiny["text"] = "ok go"
    corpus = pd_.concat([pages, dup, dup2, tiny], ignore_index=True)
    sdf_b = spark.createDataFrame(corpus, schema=pages_spark_schema())
    src = str(tmp_path / "nd_src")
    sdf_b.coalesce(1).write.parquet(src)
    # sentinel in a LATER file: append-mode windows emit once the
    # watermark passes their end (excluded from the comparison)
    import datetime
    import time

    time.sleep(0.3)
    far = corpus["warc_ts"].max() + datetime.timedelta(days=30)
    sentinel = corpus.iloc[:1].copy()
    sentinel["url"] = "sentinel://flush"
    sentinel["warc_ts"] = far
    spark.createDataFrame(sentinel, schema=pages_spark_schema()).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_pages_stream(spark, src, max_files=1)
    surv = stream_near_dup_survivors(
        stream, "text", "url", "warc_ts", delay="0 seconds", window="24 hours"
    )
    q = (
        surv.writeStream.format("memory").queryName("ndsurv")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r["url"] for r in spark.sql("select url from ndsurv").collect()
        if not r["url"].startswith("sentinel://")
    }

    # batch twin over the same corpus
    sig = dedup.minhash_signature(sdf_b, "text", "url")
    bands = dedup.lsh_bands(sig, "url")
    comp = dedup.near_dup_components(bands, "url").toPandas()
    batch_surv = {
        r["url"]
        for r in dedup.near_dup_survivors(sdf_b, "url", spark.createDataFrame(comp))
        .collect()
    }
    assert len(got) == len(batch_surv)
    # exactly one stream survivor per batch cluster; unclustered = same set
    clusters = comp.groupby("comp")["url"].apply(set)
    for members in clusters:
        assert len(got & members) == 1
    clustered = set(comp["url"])
    assert got - clustered == batch_surv - clustered
    assert all(u in got for u in corpus["url"] if u.startswith("tiny://") )


def test_stream_decontamination_static_join(spark, tmp_path):
    """Decontamination is stream-compatible as-is: the benchmark n-gram
    set is a STATIC broadcast dimension, so a streaming probe side is a
    plain stream-static join — flagged ids must equal the batch query's
    contaminated set over the same rows."""
    from pyspark.sql import functions as F

    from quality_filter.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "dc_src")
    docs.write.parquet(src)

    ng = F.array_distinct(dedup.shingles(F.col("text"), 8))
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(F.explode(ng).alias("ng")).distinct()

    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 3).parquet(src)
    probe = stream.select("doc_id", F.explode(ng).alias("ng"))
    flagged = probe.join(F.broadcast(bench), "ng").select("doc_id").dropDuplicates()
    q = (
        flagged.writeStream.format("memory").queryName("contam")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"] for r in spark.sql("select doc_id from contam").collect()}

    batch = (
        docs.select("doc_id", F.explode(ng).alias("ng"))
        .join(F.broadcast(bench), "ng").select("doc_id").distinct()
    )
    want = {r["doc_id"] for r in batch.collect()}
    assert got == want and len(want) > 0


def test_windowed_keep_rate_matches_batch(spark, tmp_path):
    pages = generate_pages(240, seed=55, days=2).drop(columns=["cls"])
    sdf_b = spark.createDataFrame(pages, schema=pages_spark_schema())
    src = str(tmp_path / "src")
    sdf_b.write.parquet(src)

    stream = read_pages_stream(spark, src, max_files=3)
    agg = windowed_keep_rate(score_stream(stream), watermark="0 seconds", window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("keeprate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from keeprate").toPandas().sort_values("window_start")

    from pyspark.sql import functions as F

    want = (
        tiered_scored(sdf_b)
        .groupBy(F.window("warc_ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("status") == "keep", 1).otherwise(0)).alias("n_keep"),
        )
        .select(F.col("w.start").alias("window_start"), "n_docs", "n_keep")
        .toPandas().sort_values("window_start")
    )
    assert len(got) == len(want)
    assert (got["n_docs"].values == want["n_docs"].values).all()
    assert (got["n_keep"].values == want["n_keep"].values).all()
    assert ((got["n_keep"] <= got["n_docs"]).all())


def test_stream_incremental_near_dup_probes_static_index(spark, tmp_path):
    """Stream-vs-index twin of dedup.incremental_near_dup_flags: new docs
    colliding with the PERSISTED corpus band index never survive; unique
    new docs always do; a within-batch duplicate cluster yields exactly
    one survivor (arrival order replaces doc-id order, so membership is
    free but the count is pinned).  The index side is the parquet
    artifact written by write_band_index — read back, never re-signed."""
    import datetime
    import time

    import pandas as pd_
    from pyspark.sql import functions as F

    from quality_filter.operators import dedup
    from quality_filter.streaming.stream import stream_incremental_near_dup

    pages = generate_pages(120, seed=29, days=1).drop(columns=["cls"])
    pages = pages[pages["text"].notna()].reset_index(drop=True)
    accepted = pages.iloc[:60].copy()          # the corpus behind the index
    fresh_unique = pages.iloc[60:90].copy()    # new, no collisions
    fresh_unique["url"] = "new://" + fresh_unique["url"]
    index_hits = accepted.iloc[:15].copy()     # new docs duplicating the corpus
    index_hits["url"] = index_hits["url"] + "?resubmit=1"
    batch_dups = fresh_unique.iloc[:6].copy()  # within-batch duplicate cluster x6
    batch_dups["url"] = batch_dups["url"] + "?copy=1"
    new_batch = pd_.concat([fresh_unique, index_hits, batch_dups], ignore_index=True)

    # persisted index artifact
    acc_sdf = spark.createDataFrame(accepted, schema=pages_spark_schema())
    idx_bands = dedup.lsh_bands(
        dedup.minhash_signature(acc_sdf, "text", "url"), "url"
    )
    idx_path = str(tmp_path / "band_index")
    dedup.write_band_index(idx_bands, idx_path, id_col="url")
    index_static = dedup.read_band_index(spark, idx_path)

    src = str(tmp_path / "incr_src")
    spark.createDataFrame(new_batch, schema=pages_spark_schema()).coalesce(1).write.parquet(src)
    time.sleep(0.3)
    far = new_batch["warc_ts"].max() + datetime.timedelta(days=30)
    sentinel = new_batch.iloc[:1].copy()
    sentinel["url"] = "sentinel://flush"
    sentinel["warc_ts"] = far
    spark.createDataFrame(sentinel, schema=pages_spark_schema()).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_pages_stream(spark, src, max_files=1)
    surv = stream_incremental_near_dup(
        stream, index_static, "text", "url", "warc_ts",
        delay="0 seconds", window="24 hours",
    )
    q = (
        surv.writeStream.format("memory").queryName("incrnd")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r["url"] for r in spark.sql("select url from incrnd").collect()
        if not r["url"].startswith("sentinel://")
    }

    resubmits = set(index_hits["url"])
    uniques = set(fresh_unique["url"])
    cluster = set(batch_dups["url"]) | set(fresh_unique.iloc[:6]["url"])
    assert got & resubmits == set()                      # index hits dropped
    assert uniques - cluster <= got                      # unique new docs kept
    for u_orig, u_copy in zip(fresh_unique.iloc[:6]["url"], batch_dups["url"]):
        assert len(got & {u_orig, u_copy}) == 1          # one survivor per pair

    # batch twin agrees on the determinate part: flags mark exactly the
    # resubmits as index hits, and one of each within-batch pair
    new_sdf = spark.createDataFrame(new_batch, schema=pages_spark_schema())
    new_bands = dedup.lsh_bands(
        dedup.minhash_signature(new_sdf, "text", "url"), "url"
    )
    flags = dedup.incremental_near_dup_flags(new_bands, index_static, "url").collect()
    hit_idx = {r["url"] for r in flags if r["hit_index"]}
    assert hit_idx == resubmits


def test_stream_term_cms_matches_batch_cells(spark, tmp_path):
    """Every (window, row, bucket, cnt) cell the stream emits equals the
    batch sketch over the same window's rows — and the per-window state
    footprint is bounded by depth*width cells regardless of vocabulary."""
    from pyspark.sql import functions as F

    from quality_filter.operators.textagg import CMS_DEPTH, CMS_WIDTH
    from quality_filter.streaming.stream import read_pages_stream, stream_term_cms

    pages = generate_pages(150, seed=33, days=2).drop(columns=["cls"])
    sdf_b = spark.createDataFrame(pages, schema=pages_spark_schema()).filter(
        F.col("text").isNotNull()
    )
    src = str(tmp_path / "cms_src")
    sdf_b.write.parquet(src)

    stream = read_pages_stream(spark, src, max_files=3).filter(F.col("text").isNotNull())
    agg = stream_term_cms(stream, "text", "warc_ts", window="6 hours", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("cmscells")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["sketch_row"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cmscells").collect()
    }
    assert got and len(got) <= 8 * CMS_DEPTH * CMS_WIDTH  # bounded cells/window

    from quality_filter.operators.textagg import term_cms_sketch

    windows = sorted({w for w, _, _ in got})
    for w in windows:
        batch_rows = sdf_b.filter(
            (F.col("warc_ts") >= w)
            & (F.col("warc_ts") < F.lit(w) + F.expr("INTERVAL 6 HOURS"))
        )
        cells = {
            (w, r["sketch_row"], r["bucket"]): r["cnt"]
            for r in term_cms_sketch(batch_rows, "text").collect()
        }
        assert cells == {k: v for k, v in got.items() if k[0] == w}


def test_stream_winnowing_dedup_matches_batch_components(spark, tmp_path):
    """Streaming winnowing fp-claim dedup vs batch winnowing pairs →
    components: exactly one stream survivor per batch fp-cluster,
    unclustered docs all survive, fingerprint-less docs (below the
    window minimum) always survive via the self-keyed sentinel."""
    import datetime
    import time

    import pandas as pd_
    from pyspark.sql import functions as F

    from quality_filter.operators import dedup
    from quality_filter.streaming.stream import stream_winnowing_dedup

    pages = generate_pages(80, seed=29, days=1).drop(columns=["cls"])
    pages = pages[pages["text"].notna()].reset_index(drop=True)
    dup = pages.iloc[:15].copy()
    dup["url"] = dup["url"] + "?copy=1"
    tiny = pages.iloc[:4].copy()
    tiny["url"] = "tiny://" + tiny["url"]
    tiny["text"] = "ok go"  # < k tokens -> zero fingerprints
    corpus = pd_.concat([pages, dup, tiny], ignore_index=True)
    sdf_b = spark.createDataFrame(corpus, schema=pages_spark_schema())
    src = str(tmp_path / "win_src")
    sdf_b.coalesce(1).write.parquet(src)
    time.sleep(0.3)
    far = corpus["warc_ts"].max() + datetime.timedelta(days=30)
    sentinel = corpus.iloc[:1].copy()
    sentinel["url"] = "sentinel://flush"
    sentinel["warc_ts"] = far
    spark.createDataFrame(sentinel, schema=pages_spark_schema()).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_pages_stream(spark, src, max_files=1)
    surv = stream_winnowing_dedup(
        stream, "text", "url", "warc_ts", delay="0 seconds", window="24 hours"
    )
    q = (
        surv.writeStream.format("memory").queryName("winsurv")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r["url"] for r in spark.sql("select url from winsurv").collect()
        if not r["url"].startswith("sentinel://")
    }

    pairs = dedup.winnowing_pairs(sdf_b, "text", "url", max_df=10**6)
    comp = dedup.connected_components_altstar(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).toPandas()
    clusters = comp.groupby("comp")["x"].apply(set)
    for members in clusters:
        assert len(got & members) == 1, members
    clustered = set(comp["x"])
    all_urls = set(corpus["url"])
    assert (all_urls - clustered) <= got  # every unclustered doc survives
    assert all(u in got for u in corpus["url"] if u.startswith("tiny://"))


def test_stream_distilled_gate_matches_batch_scoring(spark, tmp_path):
    """The trained distilled gate applied to an unbounded stream must
    emit exactly the batch narrow map's (doc_id, margin_int, model_keep)
    rows — scoring is stateless (literal weights, exact-integer margin),
    so stream==batch row-for-row with no watermark or state store."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from quality_filter.functions.rules import feature_columns
    from quality_filter.operators import distill
    from quality_filter.streaming.stream import stream_distilled_gate

    SF = "/root/testdata/sf0.001"
    docs, base = E._distill_base(spark, SF)
    w = distill.train_distilled_gate(base)

    src = str(tmp_path / "distgate_src")
    docs.write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    scored = stream_distilled_gate(stream, w).select(
        "doc_id", "margin_int", "model_keep"
    )
    q = (
        scored.writeStream.format("memory").queryName("distgate")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["margin_int"], r["model_keep"])
        for r in spark.sql("select * from distgate").collect()
    }

    xi = distill.feature_ints(feature_columns(F.col("text"), E.CFG))
    want = {
        (r["doc_id"], r["margin_int"], r["model_keep"])
        for r in docs.select(
            "doc_id",
            distill.margin_col(xi, w).alias("margin_int"),
            distill.model_keep_col(xi, w).alias("model_keep"),
        ).collect()
    }
    assert got == want and len(got) > 100
    # non-degenerate: the student keeps some docs and drops some
    assert {k for (_, _, k) in got} == {True, False}


def test_global_order_positions_equal_single_window(spark):
    """The two-level nibble decomposition reproduces the exact global
    row_number over (tier, key, tie) — including tiers that are empty
    in some nibbles and md5 keys landing in every nibble."""
    from pyspark.sql import Window

    from pyspark.sql import functions as F
    from quality_filter.operators import windows as WD

    df = spark.range(0, 700).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), 4) + 1).alias("tier"),
        F.md5(F.col("id").cast("string")).alias("k"),
    )
    got = {
        r["doc_id"]: r["pos"]
        for r in WD.global_order_positions(df, "tier", "k", "doc_id").collect()
    }
    w = Window.orderBy(F.col("tier").asc(), F.col("k").asc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["pos"]
        for r in df.select("doc_id", F.row_number().over(w).alias("pos")).collect()
    }
    assert got == want
    # scale shape: the corpus side never range-partitions into a global
    # sort; the only single-partition stage is the O(tiers x 16) offsets
    plan = (
        WD.global_order_positions(df, "tier", "k", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan


def test_stream_bpe_token_counts_matches_batch(spark, tmp_path):
    """A merge table trained offline prices a streamed corpus in the
    batch path's exact tokenizer units — stateless literal-replace map,
    so stream==batch row-for-row under availableNow with no state."""
    from pyspark.sql import functions as F  # noqa: F401

    from quality_filter.operators import textagg
    from quality_filter.streaming.stream import stream_bpe_token_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = textagg._bpe_merge_list(docs, "text", 4)
    assert merges, "training corpus must yield merges"

    src = str(tmp_path / "bpe_src")
    docs.select("doc_id", "text").write.parquet(src)
    stream = (
        spark.readStream.schema(docs.select("doc_id", "text").schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_bpe_token_counts(stream, merges)
        .writeStream.format("memory").queryName("bpestream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["n_bpe_tokens"])
        for r in spark.sql("select * from bpestream").collect()
    }
    want = {
        (r["doc_id"], r["n_bpe_tokens"])
        for r in textagg.bpe_token_counts(docs, "text", "doc_id", n_merges=4).collect()
    }
    assert got == want and len(got) == docs.count()
