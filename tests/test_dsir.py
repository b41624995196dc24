"""DSIR importance resampling: twin bit-identity, invariance, selection."""

import pytest
from pyspark.sql import functions as F

from quality_filter.operators import dsir

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def local_twin():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    srcs = t.column("source").to_pylist()
    lrs, weights, n_ngrams = dsir.dsir_local(texts, [s == "src0" for s in srcs])
    return ids, srcs, lrs, dict(zip(ids, weights)), dict(zip(ids, n_ngrams))


@pytest.fixture(scope="module")
def ratio_df(spark, docs):
    tgt = dsir.bucket_counts(docs.filter(F.col("source") == "src0"), "text")
    raw = dsir.bucket_counts(docs, "text")
    return dsir.bucket_log_ratios(spark, tgt, raw)


def test_ratio_dimension_full_domain_and_twin_exact(ratio_df, local_twin):
    _, _, lrs, _, _ = local_twin
    rows = ratio_df.collect()
    assert len(rows) == dsir.DSIR_BUCKETS
    assert sorted(r["bucket"] for r in rows) == list(range(dsir.DSIR_BUCKETS))
    # INTEGER equality, not approx: the dimension is integerized once and
    # the pure-Python twin must reproduce every lr_micro bit-for-bit
    got = {r["bucket"]: r["lr_micro"] for r in rows}
    assert got == {b: lrs[b] for b in range(dsir.DSIR_BUCKETS)}


def test_logweights_twin_exact_and_partition_invariant(spark, docs, ratio_df, local_twin):
    _, _, _, w_twin, n_twin = local_twin
    lr_arr = dsir.collect_lr_array(ratio_df)
    w = dsir.dsir_logweights(docs, "doc_id", "text", lr_arr).collect()
    assert {r["doc_id"]: r["logw_micro"] for r in w} == w_twin
    assert {r["doc_id"]: r["n_ngrams"] for r in w} == n_twin
    # partition invariance: integer sums are order-free by construction
    w2 = dsir.dsir_logweights(
        docs.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
        "doc_id", "text", lr_arr,
    ).collect()
    assert {r["doc_id"]: r["logw_micro"] for r in w2} == w_twin


def test_scoring_plan_is_shuffle_free(docs, ratio_df):
    lr_arr = dsir.collect_lr_array(ratio_df)
    plan = dsir.dsir_logweights(docs, "doc_id", "text", lr_arr)._jdf.queryExecution().executedPlan().toString()
    # the ratio dim rides as a literal: pure narrow map — no Exchange,
    # no join, no Python crossing
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_selection_enriches_target_source(spark, docs, ratio_df, local_twin):
    ids, srcs, _, _, _ = local_twin
    src_by_id = dict(zip(ids, srcs))
    lr_arr = dsir.collect_lr_array(ratio_df)
    w = dsir.dsir_logweights(docs, "doc_id", "text", lr_arr)
    kept = {r["doc_id"] for r in dsir.dsir_select(w, -60_000_000).collect()}
    n_target = sum(1 for s in srcs if s == "src0")
    kept_target = sum(1 for d in kept if src_by_id[d] == "src0")
    # the selection recovers most of the target corpus...
    assert kept_target / n_target >= 0.8
    # ...while keeping only a sliver of the raw remainder
    kept_raw = len(kept) - kept_target
    assert kept_raw / (len(srcs) - n_target) <= 0.05


def test_bucket_counts_pair_matches_two_pass_exactly(spark, docs):
    """The single-pass (bucket, n_target, n_raw) relation and the
    derived ratio dimension must equal the two-pass form EXACTLY —
    integer counts, integer lr_micro (the reformulation rule: bitwise
    differential test, not approx)."""
    pair = dsir.bucket_counts_pair(docs, "text", F.col("source") == "src0")
    got = {
        r["bucket"]: (r["n_target"], r["n_raw"]) for r in pair.collect()
    }
    tgt = {
        r["bucket"]: r["n"]
        for r in dsir.bucket_counts(
            docs.filter(F.col("source") == "src0"), "text"
        ).collect()
    }
    raw = {r["bucket"]: r["n"] for r in dsir.bucket_counts(docs, "text").collect()}
    assert set(got) == set(raw)
    for b, (nt, nr) in got.items():
        assert nr == raw[b] and nt == tgt.get(b, 0)

    r_pair = {
        tuple(r)
        for r in dsir.bucket_log_ratios_pair(spark, pair).collect()
    }
    r_two = {
        tuple(r)
        for r in dsir.bucket_log_ratios(
            spark,
            dsir.bucket_counts(docs.filter(F.col("source") == "src0"), "text"),
            dsir.bucket_counts(docs, "text"),
        ).collect()
    }
    assert r_pair == r_two


def test_logweights_let_bound_matches_unbound_spec_bitwise(spark, docs, ratio_df):
    """dsir_logweights' let_bound fold must reproduce the direct
    two-reference formulation EXACTLY (exact BIGINT sums either way —
    any difference is a bug, not noise)."""
    lrs = dsir.collect_lr_array(ratio_df)
    got = {
        r["doc_id"]: (r["logw_micro"], r["n_ngrams"])
        for r in dsir.dsir_logweights(docs, "doc_id", "text", lrs).collect()
    }
    arr = F.array(*[F.lit(int(v)).cast("long") for v in lrs])
    ng = dsir.hashed_ngrams(F.col("text"))
    w = F.aggregate(
        ng, F.lit(0).cast("long"),
        lambda acc, g: acc + F.element_at(arr, dsir.ngram_bucket(g) + 1),
    )
    want = {
        r["doc_id"]: (r["logw_micro"], r["n_ngrams"])
        for r in docs.select(
            "doc_id", w.alias("logw_micro"), F.size(ng).cast("long").alias("n_ngrams")
        ).collect()
    }
    assert got == want
