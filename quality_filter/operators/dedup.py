"""Deduplication operators for training-data pipelines.

Exact dedup (hash-groupBy), MinHash signatures + LSH banding for near-dup,
SimHash, and n-gram Jaccard.  The MinHash uses md5 hex strings as the hash
universe so the DuckDB oracle computes the IDENTICAL signature (both
engines emit identical md5 hex for identical input strings; lexicographic
MIN over hex strings is engine-independent).  At 100 TB scale the
LSH band join is a shuffle on band keys — bounded by band cardinality,
not corpus size squared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2


def fingerprint_col(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of lower(trim(text))."""
    return F.md5(F.lower(F.trim(text)))


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One representative row (min id) per distinct normalized text."""
    return (
        df.withColumn("fp", fingerprint_col(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), "[ ]+")


def shingles(text: Column, n: int = 3) -> Column:
    """Positional word n-gram shingles (space-joined); [] if < n tokens.

    Built as a zip_with over n pre-sliced token arrays — O(tokens) per doc.
    The transform(sequence, i -> concat_ws(slice(toks, i, n))) form is
    O(tokens^2) (each element re-slices) and 5x slower measured at sf0.1;
    output is bit-identical (verified positionally).
    """
    toks = _tokens(text)
    m = F.size(toks) - (n - 1)
    parts = [F.slice(toks, j + 1, m) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES, shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature over its word-n-gram shingle set.

    minhash_i(doc) = MIN over shingles of md5(i || '|' || shingle) — a
    string minimum over hex digests, identical in any engine with md5
    (the DuckDB oracle computes the same signature bit-for-bit).
    Output: id, mh0..mh{k-1} columns (NULL when the doc has no shingles).
    """
    # explode + partial-aggregated min: the shingle array is materialized
    # ONCE (the k-fold transform() form re-evaluated it per hash — 5x
    # slower measured at sf0.1).  Map-side partial aggregation collapses
    # each doc to one row before the shuffle, so shuffle volume is one
    # row per doc regardless of shingle count.
    exploded = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("_sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("_sh")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    # docs with no shingles (< shingle_n tokens) keep a NULL signature row
    return df.select(F.col(id_col)).join(sig, id_col, "left")


def lsh_bands(
    sig: DataFrame, id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES, band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """(id, band_idx, band_key): band_key concatenates band_size minhashes.
    Docs sharing a band_key are near-dup candidates (standard LSH).

    One explode over an array of (band_idx, band_key) structs — NOT an
    n_bands-way union: the union form re-evaluates the whole signature
    subtree (scan → explode shingles → aggregate) once per band per join
    side (8 copies in the near_dup_pairs physical plan); the explode form
    computes it once, and the self-join's two identical sides collapse
    into a reused exchange."""
    n_bands = num_hashes // band_size
    entries = []
    for b in range(n_bands):
        # F.concat (NOT concat_ws): a NULL component nulls the whole key,
        # so shingle-less docs never band-collide — matches SQL `||`
        pieces: list = []
        for j in range(band_size):
            if j:
                pieces.append(F.lit("|"))
            pieces.append(F.col(f"mh{b * band_size + j}"))
        entries.append(
            F.struct(
                F.lit(b).alias("band_idx"), F.concat(*pieces).alias("band_key")
            )
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("_band")
    ).select(F.col(id_col), F.col("_band.band_idx"), F.col("_band.band_key"))


def near_dup_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Candidate pairs from band collisions (id_a < id_b), deduplicated.
    The join is per-band-key — a co-located shuffle join, never a cross
    join; band keys with huge populations are the skew hot-spots a salt
    or AQE skew split handles at scale."""
    a = bands.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over tokens, fully native: per-token xxhash64, then
    per-bit majority vote via bitwise ops + sums.  (No DuckDB oracle —
    xxhash64 is Spark-specific; registered as a rows-only check.)"""
    toks = F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok")
    exploded = df.select(F.col(id_col), toks)
    h = F.xxhash64("tok")
    bit_cols = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = exploded.groupBy(id_col).agg(*bit_cols)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63)))
            .otherwise(F.lit(0).cast("long"))
        )
    return votes.select(F.col(id_col), sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, group_col: str,
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs within a group
    (blocking column keeps the join from going quadratic corpus-wide)."""
    ngrams = F.array_distinct(shingles(F.col(text_col), n))
    g = df.select(F.col(id_col), F.col(group_col), ngrams.alias("ng"))
    a = g.select(F.col(id_col).alias("id_a"), F.col(group_col), F.col("ng").alias("ng_a"))
    b = g.select(F.col(id_col).alias("id_b"), F.col(group_col), F.col("ng").alias("ng_b"))
    inter = F.size(F.array_intersect("ng_a", "ng_b")).cast("double")
    union = F.size(F.array_union("ng_a", "ng_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a.join(b, group_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
