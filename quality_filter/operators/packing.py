"""Sequence packing: assign documents to fixed-token-budget bins.

The pretraining-data op that turns a deduped corpus into training
sequences: concatenate documents until the context budget is full,
then start the next sequence.  Greedy sequential packing is inherently
order-dependent, so the operator fixes a DETERMINISTIC total order —
shard by content-addressed hash (engine-portable md5, the same
universe as sampling.hash_bucket), pack within a shard in id order —
which makes the assignment reproducible across partitioning, retries,
and engines (the DuckDB oracle replays the same recurrence as a
recursive CTE).

Scale shape: one shuffle on the shard key; each shard packs
independently inside a single `applyInPandas` task (the sequential
scan is O(docs-in-shard) python-light work over Arrow columns).  Shard
count is the parallelism knob; bins never span shards by design —
cross-shard "perfect" packing is a bin-packing optimization this
deliberately does not attempt (greedy-within-shard wastes at most one
document's tokens per boundary and stays deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quality_filter.operators.sampling import hash_bucket

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin_idx", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


# Each shard is one applyInPandas task holding the whole shard in memory:
# the shard count must be derived from corpus size, not a constant.  At
# ~8 bytes x 3 columns per doc and ~500 tokens/doc, 64M tokens/shard is
# ~130k rows ≈ a few MB of pandas per task — comfortably inside an
# executor, and >= cores x waves shards at any corpus that matters.
DEFAULT_TARGET_TOKENS_PER_SHARD = 64 * 1024 * 1024


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col,
    capacity: int,
    n_shards: int | None = None,
    target_tokens_per_shard: int = DEFAULT_TARGET_TOKENS_PER_SHARD,
) -> DataFrame:
    """(doc_id, shard, bin_idx, n_tokens): greedy sequential packing.

    Rule (frozen; the oracle's recursive CTE replays it): within a
    shard, docs in ascending id order; the first doc opens bin 0; each
    subsequent doc joins the current bin iff fill + n <= capacity,
    else opens the next bin.  A doc larger than the capacity occupies
    its bin alone (it still gets placed — truncation policy is the
    caller's concern, row conservation is this operator's).

    ``n_shards`` omitted → derived as ceil(total_tokens /
    target_tokens_per_shard) via one cheap aggregate pre-pass, so the
    per-task shard memory is bounded by the target regardless of corpus
    size (a fixed shard count means shards GROW with the corpus — the
    100-TB failure mode).  Hash sharding keeps shards statistically
    even; the id-hash fate makes the assignment — hence the whole
    packing — invariant under input partitioning and retries.  Callers
    pinning a contract (the registered oracle query) pass n_shards
    explicitly."""
    import pandas as pd

    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col)).alias("_hb"),
        tokens_col.cast("long").alias("n_tokens"),
    )
    if n_shards is None:
        total = prepared.agg(F.sum("n_tokens")).head()[0] or 0
        n_shards = max(1, -(-int(total) // target_tokens_per_shard))
    prepared = prepared.select(
        "doc_id",
        (F.col("_hb") % n_shards).cast("int").alias("shard"),
        "n_tokens",
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_idx, fill = 0, None
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n <= capacity:
                fill += n
            else:
                bin_idx += 1
                fill = n
            bins.append(bin_idx)
        pdf["bin_idx"] = pd.array(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin_idx", "n_tokens"]]

    return prepared.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def bin_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Packing efficiency rollup: per (shard, bin) fill and utilization."""
    return packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("fill"),
        F.round(F.sum("n_tokens") / F.lit(float(capacity)), 6).alias("utilization"),
    )


def shard_stats(packed: DataFrame) -> DataFrame:
    """Per-shard totals — the observability twin of the shard-sizing
    derivation: shard_tokens should sit near target_tokens_per_shard
    (each shard is one in-memory pandas task)."""
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        (F.max("bin_idx") + 1).cast("long").alias("n_bins"),
    )
