"""Corpus-level text aggregation: vocabulary statistics and TF-IDF.

The explode-then-aggregate family a training-data pipeline runs for
vocabulary pruning, boilerplate detection, and keyword extraction.
All native (split/explode/groupBy); the heavy explode is collapsed by
map-side partial aggregation before any shuffle, so shuffle volume is
O(distinct terms), not O(token occurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens_lower(text):
    return F.split(F.lower(F.trim(text)), "[ ]+")


def top_terms(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Corpus-wide top-k terms by occurrence count (ties by term).

    Plan: explode → partial count (map-side combine collapses each
    task's occurrences) → one shuffle of O(distinct terms) rows →
    TakeOrderedAndProject for the top-k (no global sort)."""
    toks = df.select(F.explode(_tokens_lower(F.col(text_col))).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(k)
    )


def doc_frequency(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(term, df): number of documents containing each term.  The
    per-doc distinct happens BEFORE the explode (array_distinct on the
    token array — no doc-level shuffle), so the aggregate counts each
    (doc, term) once."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens_lower(F.col(text_col)))).alias("term"),
    )
    return toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-k terms by tf * idf, idf = ln(N / df).

    Two shuffles total: the doc-frequency aggregate (O(distinct terms))
    and the per-doc top-k window (hash-partitioned on the doc id).  The
    doc-frequency side is a dimension table at corpus scale (bounded by
    vocabulary size) → broadcast into the term join.  Deterministic
    tie-break (score desc, term asc) so results are engine-comparable."""
    from pyspark.sql import Window as W

    n_docs = df.count()  # driver scalar: one count job, reused as a literal
    tf = (
        df.select(
            F.col(id_col), F.explode(_tokens_lower(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = doc_frequency(df, text_col, id_col).filter(F.col("df") >= min_df)
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame, text_col: str, id_col: str, query_terms: list[str],
    k: int = 10, k1: float = BM25_K1, b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a fixed term query under Okapi BM25 — the
    retrieval verb of a corpus engine (inspect/debug tooling: "show me
    the strongest docs for these terms").

    score(d) = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1) ·
               tf · (k1+1) / (tf + k1 · (1 - b + b · dl/avgdl))

    Determinism discipline: the per-term partial scores are pivoted
    into FIXED columns (sorted term order) and added in that order —
    never a float SUM over shuffle-ordered rows — so the final double
    is the same expression tree in Spark and the DuckDB oracle.  N and
    avgdl are exact-integer corpus stats (one count/sum job) divided
    once.

    Plan shape: the explode is filtered to the |Q| query terms BEFORE
    any aggregation (predicate on the exploded term — Catalyst pushes
    it into the generator), so shuffle volume is O(matching
    occurrences), not O(tokens); the df side is a ≤|Q|-row broadcast
    dim; top-k is TakeOrderedAndProject, no global sort."""
    terms = sorted(query_terms)
    base = df.select(
        F.col(id_col), _tokens_lower(F.col(text_col)).alias("_t")
    ).select(F.col(id_col), F.col("_t"), F.size("_t").cast("long").alias("_dl"))
    n_docs, total_tokens = base.agg(
        F.count(F.lit(1)), F.sum("_dl")
    ).first()  # driver scalars: one job, reused as plan literals
    if not n_docs:
        n_docs, total_tokens = 1, 1  # degenerate empty corpus; output is empty anyway
    avgdl = total_tokens / n_docs  # exact ints, one IEEE division — engine-identical
    occ = base.select(
        F.col(id_col), F.col("_dl").cast("double").alias("dl"),
        F.explode("_t").alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = occ.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = (
        occ.select(F.col(id_col), F.col("term")).distinct()
        .groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    nd = F.lit(float(n_docs))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "_s",
        F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (
            (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / F.lit(avgdl)))
        ),
    )
    pivoted = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("matched"),
        *[
            F.max(F.when(F.col("term") == t, F.col("_s"))).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ],
    )
    total = None
    for i in range(len(terms)):
        piece = F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        total = piece if total is None else total + piece
    return (
        pivoted.withColumn("_score", total)
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_score", 6).alias("bm25"), "matched")
    )


def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Top-k adjacent character pairs weighted by occurrence — the
    counting step of one BPE merge round (tokenizer training over the
    corpus the engine curates).  Exact integer counts → hash-exact
    cross-engine.

    Plan: token explode → per-token pair array (one HOF over
    sequence(1, len-1) — bounded by token length) → second explode →
    map-side partial count → O(distinct pairs) shuffle →
    TakeOrderedAndProject.  The pair vocabulary is bounded by
    charset², so the shuffle is a dimension regardless of corpus
    size."""
    toks = df.select(
        F.explode(_tokens_lower(F.col(text_col))).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(k)
    )


CMS_DEPTH = 4
CMS_WIDTH = 64



def terms_exploded(text):
    """The sketch/top-terms tokenizer: lower/trim/single-space split,
    exploded — ONE definition shared by batch and streaming sketches."""
    return F.explode(F.split(F.lower(F.trim(text)), "[ ]+"))


def cms_bucket_array(term, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """array<int> of the term's bucket per sketch row — md5('r|term') %
    width (engine-portable hash universe); shared by term_cms_sketch and
    streaming.stream_term_cms so the cell-for-cell merge parity cannot
    silently diverge."""
    from quality_filter.operators.sampling import hash_bucket

    return F.array(*[
        (hash_bucket(F.concat(F.lit(f"{r}|"), term)) % width).cast("int")
        for r in range(depth)
    ])


def term_cms_sketch(
    df: DataFrame, text_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of corpus term frequencies: a fixed depth×width
    counter matrix — O(1) state regardless of vocabulary size, mergeable
    across shards/streams by cell-wise addition, point-queried as
    min over rows of cell(r, bucket_r(term)) which NEVER underestimates.
    The heavy-hitter/state-bounded twin of top_terms: top_terms shuffles
    O(distinct terms); the sketch shuffles O(depth×width) regardless.

    bucket_r(term) = md5-bucket of 'r|term' % width — the engine-portable
    md5 hash universe (same as minhash), so a DuckDB oracle computes the
    IDENTICAL sketch.  One explode + one posexplode + a partial-agg
    count: every (row, bucket) cell collapses map-side."""
    return (
        df.select(terms_exploded(F.col(text_col)).alias("term"))
        .select(F.posexplode(cms_bucket_array(F.col("term"), depth, width)).alias("sketch_row", "bucket"))
        .groupBy("sketch_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(sketch_rows, term: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> int:
    """Driver-side point query against a collected sketch: min over
    rows of the term's cell (0 when a cell is absent/empty)."""
    import hashlib

    cells = {(r["sketch_row"], r["bucket"]): r["cnt"] for r in sketch_rows}
    est = None
    for r in range(depth):
        h = int(hashlib.md5(f"{r}|{term}".encode()).hexdigest()[:8], 16) % width
        v = cells.get((r, h), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)
