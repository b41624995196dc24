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
