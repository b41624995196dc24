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


def let_bound(expr: Column, fn) -> Column:
    """LET-binding for HOF pipelines: bind ``expr`` as a lambda VARIABLE
    (single-element-array transform) so every reference inside ``fn``
    reuses one evaluation per row.  Catalyst inlines referenced
    expressions into HOF lambdas with no common-subexpression reuse —
    an expression referenced inside a per-element lambda is otherwise
    re-evaluated once PER ELEMENT (the O(len²) winnowing kernel,
    BENCH/ROUND4.md)."""
    return F.transform(F.array(expr), fn)[0]


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


WINNOW_K = 3
WINNOW_W = 4


def winnowing_fingerprints(
    df: DataFrame, text_col: str, id_col: str,
    k: int = WINNOW_K, w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every word-k-gram (shared md5 universe), then
    keep the MINIMUM hash of each w-window of consecutive k-grams —
    position-robust selection with a guaranteed density bound of
    ~2/(w+1), the local-similarity complement to minhash (global
    Jaccard) and simhash (global cosine): any shared substring of
    ≥ w+k-1 words MUST contribute at least one identical fingerprint.

    Returns (id, fp) with per-doc-distinct fingerprints.  Zero-shuffle
    narrow map (let-bound sparse-table window minima, O(len·log w) per
    doc — BENCH/ROUND4.md kernel note); docs with fewer than w k-grams
    emit nothing (strict-window form).
    """
    return df.select(
        F.col(id_col),
        F.explode(winnowing_fp_array_col(F.col(text_col), k, w)).alias("fp"),
    )


def winnowing_fp_array_col(text: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Per-row distinct winnowing fingerprint array — ONE definition
    shared by the batch explode and the streaming claim stage (the
    minhash_from_shingles dual-surface discipline).  Pure narrow
    expression: safe before any stateful streaming operator."""
    sh = shingles(text, k)
    h = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
    )

    # Sparse-table window minima (zip_with doubling) with LET-BINDING,
    # not a per-window array_min(slice(h, i, w)) lambda: Catalyst
    # inlines referenced expressions into HOF lambdas (no common-
    # subexpression reuse), so the per-window form re-evaluates the
    # ENTIRE md5 hash array once per window — O(len²) md5 calls per doc
    # (measured 38s/5000 sf0.1 docs), and even a plain doubling chain
    # re-evaluates each level once per reference (geometric, measured
    # 17s).  `_let` binds a level's array as a lambda VARIABLE (a
    # single-element-array transform), so each level is computed exactly
    # once per row: total O(len·log w) work, bitwise identical (min is
    # associative over the same bigints — pinned by the differential
    # test).  Each pass doubles the covered span: m_2s[i] =
    # least(m_s[i], m_s[i+s]); a final residue zip covers span w from
    # the largest power p ≤ w: win[i] = least(m_p[i], m_p[i + w - p]).
    _let = let_bound

    def _zipmin(m, d):
        ln = F.size(m) - d
        return F.zip_with(
            F.slice(m, 1, ln), F.slice(m, 1 + d, ln), lambda x, y: F.least(x, y)
        )

    spans = []
    span = 1
    while span * 2 <= w:
        spans.append(span)  # doubling step from this span
        span *= 2
    residue = w - span  # 0 when w is a power of two

    def _chain(m, steps):
        if not steps:
            return F.array_distinct(_zipmin(m, residue) if residue else m)
        s, rest = steps[0], steps[1:]
        return _let(_zipmin(m, s), lambda nxt: _chain(nxt, rest))

    # strict-window guard FIRST: docs with fewer than w k-grams emit
    # nothing, and the when() short-circuit keeps every level's slice
    # length positive on the evaluated branch
    return _let(
        h,
        lambda hh: F.when(F.size(hh) >= w, _chain(hh, spans)).otherwise(
            F.expr("array()").cast("array<bigint>")
        ),
    )


def winnowing_pairs(
    df: DataFrame, text_col: str, id_col: str,
    k: int = WINNOW_K, w: int = WINNOW_W, max_df: int = 50,
) -> DataFrame:
    """Local near-dup candidates: docs sharing winnowing fingerprints,
    with shared-fp counts.  The fp equi-join is the LSH band-join shape
    (bucketed, never all-pairs); boilerplate fingerprints shared by
    more than ``max_df`` docs are excluded — the same hot-key cap as
    star_edges/containment (a fingerprint in 10^6 docs is boilerplate,
    not evidence, and would otherwise cost O(df²) pairs)."""
    fps = winnowing_fingerprints(df, text_col, id_col, k, w)
    capped = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp"),
        "fp",
    )
    a = capped.select("fp", F.col(id_col).alias("doc_a"))
    b = capped.select("fp", F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
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


def minhash_from_shingles(sh: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """Per-ROW MinHash signature as array<string> [mh0..mh{k-1}] over a
    staged shingle-array column — the stream-compatible twin of
    ``minhash_signature`` (which explodes + aggregates and therefore
    cannot run inside a streaming query before the stateful stage).
    Element i is bit-identical to column mh{i} (array_min over md5 ==
    aggregated MIN over exploded md5; NULL for shingle-less docs) —
    pinned by differential test.  Caller stages the shingle array in a
    withColumn so the O(tokens) shingle build runs once, not k times."""
    def _mh(i: int) -> Column:
        # NB: closure via factory, NOT a default arg — `lambda x, i=i`
        # has two parameters, which F.transform reads as the
        # (element, index) binary form and silently binds i to the
        # ARRAY INDEX (caught by the differential test)
        return F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(F.lit(f"{i}|"), x)))
        )

    return F.array(*[_mh(i) for i in range(num_hashes)])


def band_entries_from_signature(
    mh: Column, num_hashes: int = DEFAULT_NUM_HASHES, band_size: int = DEFAULT_BAND_SIZE
) -> Column:
    """array<struct<band_idx,band_key>> from a per-row signature array —
    the per-row twin of ``lsh_bands``'s entry construction (same concat
    rule: a NULL minhash nulls the whole band key)."""
    entries = []
    for b in range(num_hashes // band_size):
        pieces: list = []
        for j in range(band_size):
            if j:
                pieces.append(F.lit("|"))
            pieces.append(F.element_at(mh, b * band_size + j + 1))
        entries.append(
            F.struct(F.lit(b).alias("band_idx"), F.concat(*pieces).alias("band_key"))
        )
    return F.array(*entries)


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


HEX_CHARS = "0123456789abcdef"


def simhash_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Engine-portable 64-bit SimHash: per-token hash = first 64 bits of
    md5(token), per-bit majority vote, output as a 16-char hex string.

    The md5 universe makes the DuckDB oracle compute the IDENTICAL
    simhash (same trick as minhash_signature): both engines parse the
    first 16 hex digits into two 32-bit words (Spark conv(.., 16, 10) /
    DuckDB ('0x' || ..)::BIGINT), vote per bit, and re-emit hex — no
    engine-specific hash anywhere.  Bit layout: bit i of word w is
    (w >> (i % 32)) & 1, words cover bits 0-31 / 32-63; output nibble n
    packs bits 4n..4n+3 with 4n as the high bit (layout is arbitrary but
    frozen — both sides must agree, nothing else reads individual bits).

    Same plan shape as the xxhash64 variant: explode distinct tokens →
    64 partial-aggregated SUM buffers → one row per doc into the
    shuffle.  ~2x the token-hash cost of xxhash64 (md5 + two string
    parses); use simhash64 when cross-engine parity is not required."""
    toks = F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok")
    hx = F.md5("tok")
    exploded = df.select(F.col(id_col), toks).select(
        F.col(id_col),
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("w0"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("w1"),
    )

    def bit(i: int):
        w = F.col("w0") if i < 32 else F.col("w1")
        return F.shiftright(w, i % 32).bitwiseAND(F.lit(1))

    votes = exploded.groupBy(id_col).agg(
        *[F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}") for i in range(64)]
    )
    hex_arr = F.array(*[F.lit(c) for c in HEX_CHARS])
    nibbles = []
    for n in range(16):
        v = None
        for k in range(4):
            term = F.when(F.col(f"b{4 * n + k}") > 0, F.lit(1 << (3 - k))).otherwise(0)
            v = term if v is None else v + term
        nibbles.append(F.element_at(hex_arr, v + 1))
    return votes.select(F.col(id_col), F.concat(*nibbles).alias("simhash"))


def simhash_near_dup(
    sim: DataFrame, id_col: str, max_hamming: int = 3,
    band_chars: int = 4,
) -> DataFrame:
    """Near-dup pairs from simhash fingerprints: band the 16-hex-char
    hash into 16/band_chars bands; by pigeonhole, any pair within
    max_hamming < n_bands bits must agree exactly on at least one band
    → the candidate join is an equi-join on (band_idx, band_key), never
    all-pairs.  Candidates are verified with an exact popcount of the
    XOR (bit_count — native in Spark and DuckDB; the hex → two 32-bit
    words parse is the same portable trick as simhash_md5 itself).

    Output: (id_a, id_b, hamming) with hamming <= max_hamming.  With
    the default 4 bands of 16 bits, recall is EXACT for
    max_hamming <= 3 (pigeonhole), unlike the probabilistic MinHash
    banding."""
    if 16 % band_chars != 0:
        raise ValueError(f"band_chars={band_chars} must divide the 16 hex chars")
    if max_hamming >= 16 // band_chars:
        raise ValueError(
            f"max_hamming={max_hamming} with {16 // band_chars} bands breaks the "
            f"pigeonhole exactness guarantee (requires max_hamming < n_bands); "
            f"use smaller band_chars or multiple hash tables"
        )
    n_bands = 16 // band_chars
    entries = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.substring("simhash", b * band_chars + 1, band_chars).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    w0 = F.conv(F.substring("simhash", 1, 8), 16, 10).cast("long")
    w1 = F.conv(F.substring("simhash", 9, 8), 16, 10).cast("long")
    withwords = sim.select(
        F.col(id_col), F.col("simhash"), w0.alias("w0"), w1.alias("w1")
    )
    bands = withwords.select(
        F.col(id_col), "w0", "w1", F.explode(F.array(*entries)).alias("_b")
    ).select(id_col, "w0", "w1", F.col("_b.band_idx"), F.col("_b.band_key"))
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("w0").alias("a0"),
        F.col("w1").alias("a1"), "band_idx", "band_key",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("w0").alias("b0"),
        F.col("w1").alias("b1"), "band_idx", "band_key",
    )
    ham = (
        F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
        + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over tokens, fully native: per-token xxhash64, then
    per-bit majority vote via bitwise ops + sums.  The production-speed
    variant; simhash_md5 is the cross-engine-verifiable twin (identical
    vote/packing structure, engine-portable hash universe)."""
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


def star_edges(bands: DataFrame, id_col: str) -> DataFrame:
    """Linear-size connectivity edges from band collisions: every doc
    links to the MIN doc id in its band bucket — O(|bucket|) edges where
    the pair enumeration is O(|bucket|^2), with IDENTICAL connected
    components (a bucket's pair-clique and its star both connect the
    bucket through its min member).

    This is the hot-band-key mitigation for clustering: 10k identical
    boilerplate docs collide into one band bucket → 10k star edges
    instead of ~50M pairs, so the skewed bucket costs one partial-agg
    min + one broadcast-able join row per doc, not a quadratic reducer.
    near_dup_pairs stays available when the pair LIST is the product."""
    roots = bands.filter(F.col("band_key").isNotNull()).groupBy(
        "band_idx", "band_key"
    ).agg(F.min(id_col).alias("dst"))
    return (
        bands.filter(F.col("band_key").isNotNull())
        .join(roots, ["band_idx", "band_key"])
        .filter(F.col(id_col) != F.col("dst"))
        .select(F.col(id_col).alias("src"), "dst")
        .distinct()
    )


def _truncate_lineage(df: DataFrame, eager: bool, reliable: bool | None) -> DataFrame:
    """Per-round lineage truncation for the iterative component loops.

    ``localCheckpoint`` stores the truncated RDD on executor block
    managers only — losing an executor on a real cluster forces a
    recompute of lineage that no longer exists (the round-3 verdict's
    one cluster-mode caveat).  When a ``spark.checkpoint.dir`` is
    configured (``SparkContext.setCheckpointDir``), this seam switches
    to RELIABLE checkpointing — the truncated state is written to the
    fault-tolerant checkpoint dir, so executor loss replays from
    storage instead of from a truncated plan.  ``reliable=None`` (the
    default everywhere) auto-selects: reliable iff a dir is set;
    ``True`` asserts the dir; ``False`` forces executor-local."""
    if reliable is None:
        reliable = df.sparkSession.sparkContext.getCheckpointDir() is not None
    if reliable:
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "reliable_checkpoint=True requires SparkContext.setCheckpointDir"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 25,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Connected components by min-label propagation to fixpoint:
    comp(x) = min id reachable from x (including x).  Returns
    (node, comp) for every node incident to an edge.

    Each iteration: neighbor-min propagation (one join + one
    partial-aggregated min) followed by POINTER JUMPING — comp(x) :=
    comp(comp(x)) — which halves label-chain depth every round, so
    convergence is O(log diameter), not O(diameter) (a 4097-node path
    converges in 12 rounds, pinned by test).  Lineage is truncated per
    iteration (localCheckpoint) so the plan doesn't grow with the
    loop; each round is a bounded number of shuffles on the node id."""
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .union(edges.select(F.col(dst).alias("x"), F.col(src).alias("y")))
        .distinct()
    )
    # materialize the edge list ONCE: it is re-read every iteration, and
    # leaving it lazy re-runs the whole upstream plan (minhash signature,
    # banding, ...) per round — measured 3x on the survivors query
    und = _truncate_lineage(und, eager=True, reliable=reliable_checkpoint)
    labels = und.select("x").distinct().select("x", F.col("x").alias("comp"))
    for _ in range(max_iters):
        nbr = (
            und.join(
                labels.select(F.col("x").alias("y"), F.col("comp").alias("ycomp")), "y"
            )
            .groupBy("x")
            .agg(F.min("ycomp").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "x", "left").select(
            "x",
            F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias("comp"),
            F.col("comp").alias("_old"),
        )
        # pointer jumping: follow the label one hop (comp := comp(comp))
        # — min-labels only move one edge per propagation round, but
        # label CHAINS can be followed transitively for free
        lut = stepped.select(F.col("x").alias("comp"), F.col("comp").alias("_jump"))
        proposed = (
            stepped.join(lut, "comp", "left")
            .select(
                "x",
                F.least(F.col("comp"), F.coalesce("_jump", F.col("comp"))).alias("comp"),
                "_old",
            )
        )
        proposed = _truncate_lineage(proposed, eager=True, reliable=reliable_checkpoint)
        changed = proposed.filter(F.col("comp") < F.col("_old")).count()
        labels = proposed.drop("_old")
        if changed == 0:
            break
    return labels


def connected_components_altstar(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 25,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same (node, comp=min reachable id) contract as
    ``connected_components``, different iteration algebra:

      large-star(u): every neighbor v > u re-links to
                     m = min(Γ(u) ∪ {u});
      small-star(u): u and every smaller neighbor re-link to the
                     neighborhood min.

    Both operate on the EDGE list (no separate label table), and each
    round both contracts label chains (like pointer jumping) AND shrinks
    the edge set toward the final star form, so on adversarial long
    chains it needs fewer rounds and moves less data per round than
    label-propagation + pointer jumping (A/B'd on a 100k path+star mix;
    see tests).  Convergence = edge set is a fixpoint of both steps,
    detected by (count, order-free checksum) stability — one cheap
    aggregate per round instead of a set-difference join.

    Each round is 3 partial-aggregated shuffles on node ids; lineage is
    truncated per round via LAZY localCheckpoint — the fixpoint
    checksum is the action that materializes it, so each round costs
    ONE job, not a checkpoint job plus a checksum job (1.11x on the
    bench survivors query; identity pinned).  The large-star output
    skips its own distinct — multiplicity is bounded by the edge count
    and small-star's distinct collapses it one shuffle later."""
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = _truncate_lineage(e, eager=False, reliable=reliable_checkpoint)
    nodes = (
        e.select(F.col("u").alias("x")).union(e.select(F.col("v").alias("x"))).distinct()
    )

    def _checksum(df):
        # bit_xor: order-free and overflow-free under ANSI (a 64-bit hash
        # SUM overflows); (count, xor-of-hashes) equality across rounds
        # is the fixpoint signal
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("chk"),
        ).head()
        return (r["n"], r["chk"])

    prev = _checksum(e)
    for _ in range(max_iters):
        # large-star: bidirectional neighborhoods, larger neighbors → min
        nbrs = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        e = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: canonical (u > v) edges; u and small neighbors → min
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        joined = e.join(mins, "u")
        e = (
            joined.select(F.col("u"), F.col("m").alias("v"))
            .union(
                joined.filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            .distinct()
        )
        e = _truncate_lineage(e, eager=False, reliable=reliable_checkpoint)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # star form: u → component min; roots get comp = self
    lookup = e.groupBy("u").agg(F.min("v").alias("comp")).select(
        F.col("u").alias("x"), "comp"
    )
    return nodes.join(lookup, "x", "left").select(
        "x", F.coalesce("comp", F.col("x")).alias("comp")
    )


def near_dup_components(bands: DataFrame, id_col: str) -> DataFrame:
    """(id, comp) for every doc in a near-dup cluster: star edges from
    band collisions → min-label components (alternating-star algorithm;
    ``connected_components`` is the label-propagation twin — identical
    output, pinned by differential test).  comp = the cluster's min
    doc id (its representative/survivor)."""
    comp = connected_components_altstar(star_edges(bands, id_col), "src", "dst")
    return comp.select(F.col("x").alias(id_col), "comp")


def near_dup_survivors(docs: DataFrame, id_col: str, components: DataFrame) -> DataFrame:
    """The deduped corpus id set: drop every clustered doc except its
    representative (comp == id), keep all unclustered docs — one
    left-anti join against the (small relative to the corpus) non-rep
    member list."""
    losers = components.filter(F.col(id_col) != F.col("comp")).select(id_col)
    return docs.select(id_col).join(losers, id_col, "left_anti")


def near_dup_best_survivors(
    docs: DataFrame, id_col: str, components: DataFrame, rank: Column
) -> DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster
    keep the member with the HIGHEST ``rank`` (ties broken by smallest
    id) instead of the smallest id — production pipelines keep the
    longest / highest-quality copy of a duplicated page, not an
    arbitrary one (``near_dup_survivors`` is the min-id form).

    Scale shape: ``rank`` is evaluated as a narrow map on the clustered
    member subset only (inner join of the component list against the
    corpus); the per-cluster argmax is ONE max-struct aggregation —
    map-side combinable, so a 10^6-member cluster ships one candidate
    per map task — and unclustered docs never shuffle (left-anti join
    on the clustered-id dim).  Returns one ``id_col`` row per survivor.
    ``rank`` must be exactly orderable cross-engine (integers); the
    struct max totals the order by (rank desc, id asc) via a negated id.
    """
    members = components.join(docs, id_col).select(
        F.col(id_col), F.col("comp"), rank.alias("_rank")
    )
    winners = (
        members.groupBy("comp")
        .agg(
            F.max(
                F.struct(F.col("_rank"), (-F.col(id_col)).alias("_neg"))
            ).alias("w")
        )
        .select((-F.col("w._neg")).alias(id_col))
    )
    unclustered = docs.select(id_col).join(
        components.select(id_col), id_col, "left_anti"
    )
    return unclustered.unionByName(winners)


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


def exact_jaccard_pairs_global(
    df: DataFrame, text_col: str, id_col: str,
    shingle_n: int = 3, threshold: float = 0.5, max_df: int = 50,
) -> DataFrame:
    """Exact shingle-set Jaccard for every pair above ``threshold`` —
    corpus-wide, WITHOUT a blocking column: a pair with Jaccard > 0
    must share at least one shingle, so the shingle equi-join
    enumerates candidates exactly (the inverted-index identity), and
    the intersection size falls out of the join's group count.

    The audit universe is the df-capped shingle set (shingles in more
    than ``max_df`` docs are boilerplate, not evidence — the
    winnowing/containment hot-key cap; without it one viral shingle
    costs O(df²) pairs).  Sizes AND intersections both come from the
    capped universe, so the emitted Jaccard is exact over that
    universe (and equals the uncapped Jaccard wherever no cap bites).

    Plan: one explode → df dimension (map-side-combined) → capped
    equi-join on the shingle key (bucketed, never all-pairs, per-key
    fan-out ≤ max_df²) → pair partial agg → two size joins on the id
    key.  Shuffle volume is O(shared-shingle occurrences), bounded by
    corpus_shingles · max_df."""
    sets_ = df.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh")
    ).filter(F.size("_sh") > 0)
    ex = sets_.select(F.col(id_col), F.explode("_sh").alias("sh"))
    capped = ex.join(
        ex.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("sh"),
        "sh",
    )
    sizes = capped.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("_nsz"))
    a = capped.select("sh", F.col(id_col).alias("id_a"))
    b = capped.select("sh", F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_inter")
    ).cast("double")
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("_nsz").alias("_na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_nsz").alias("_nb")), "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Within-doc keep-first-occurrence dedup (C4 line-dedup algebra)
# ---------------------------------------------------------------------------


def keep_first_units_col(text: Column, sep_pattern: str = " ") -> Column:
    """Within-document duplicate-unit removal, first occurrence wins —
    the C4 practice of dropping repeated lines inside a page, expressed
    over any split unit (``sep_pattern`` is a Java REGEX — ``"\\n"``
    for lines on real pages, ``" "`` for tokens on delimiter-free
    corpora; escape metacharacters for literal separators, e.g.
    ``"\\\\."`` for sentences).  Returns the surviving units in
    original order.

    Pure narrow map, NO shuffle and NO UDF: split → filter on the
    first-occurrence index (``array_position`` returns the 1-based
    FIRST index of x, so a unit survives iff that equals its own
    position) → stays inside whole-stage codegen.  Per-row cost is
    O(units²) in the worst case, bounded by units-per-document (lines
    per page), never by corpus size — the operator parallelizes with
    input splits at any scale."""
    units = F.split(text, sep_pattern)
    # NOTE: two-arg F.filter lambda binds the 2nd param to the 0-based
    # ARRAY INDEX (the invariant CLAUDE.md pins for F.transform).
    return F.filter(units, lambda x, i: F.array_position(units, x) == i + 1)


# ---------------------------------------------------------------------------
# Segment-level dedup (C4/CCNet-style paragraph dedup over k-word segments)
# ---------------------------------------------------------------------------

SEGMENT_WORDS = 10


def segments_col(text: Column, k: int = SEGMENT_WORDS) -> Column:
    """Deterministic k-word segments of a document (the paragraph analog
    for newline-free corpora).  Segment i covers tokens [i*k, i*k+k); the
    last segment may be short.  C4 dedups on lines / three-sentence spans
    (reference pattern: corpus-level repeated-span removal); k-word
    windows give the same operator a delimiter-free segmentation that
    both engines compute identically."""
    # let-bind the token array: referenced inside the per-segment lambda
    # it would otherwise be re-split once per segment (O(len²/k) per doc
    # — the winnowing kernel trap, see let_bound)
    return let_bound(
        _tokens(text),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(toks) / F.lit(float(k))).cast("int") - F.lit(1)
            ),
            lambda i: F.array_join(F.slice(toks, i * F.lit(k) + F.lit(1), k), " "),
        ),
    )


def segment_occurrences(
    df: DataFrame, text_col: str, id_col: str, k: int = SEGMENT_WORDS
) -> DataFrame:
    """(id, seg_idx, seg) — one row per segment occurrence."""
    return df.select(
        F.col(id_col),
        F.posexplode(segments_col(F.col(text_col), k)).alias("seg_idx", "seg"),
    )


def segment_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = SEGMENT_WORDS
) -> DataFrame:
    """Corpus-wide segment dedup: every segment survives only at its FIRST
    occurrence (min (id, seg_idx) over all docs); docs are reassembled
    from their surviving segments in order.

    Scale shape (100 TB): two map-side-combined hash shuffles and NO
    join/window —
      1. groupBy(seg).agg(min(struct(id, seg_idx))): the kept occurrence
         IS the aggregate result, so duplicate segments collapse in the
         map-side partial agg (a boilerplate segment repeated 10^9 times
         ships one row per map task, not 10^9 rows — the skew hot-spot
         self-mitigates);
      2. groupBy(id) to reassemble surviving segments.
    The row_number()-window formulation shuffles every occurrence and
    sorts; the min-struct form shuffles O(distinct segments) after
    combine.  Output: (doc_id, text_dedup, n_segs, n_kept); text_dedup
    is '' when every segment of the doc was seen earlier."""
    occ = segment_occurrences(df, text_col, id_col, k)
    kept = (
        occ.groupBy("seg")
        .agg(F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("_f"))
        .select(
            F.col(f"_f.{id_col}").alias(id_col),
            F.col("_f.seg_idx").alias("seg_idx"),
            "seg",
        )
    )
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.ceil(F.size(_tokens(F.col(text_col))) / F.lit(float(k)))
        .cast("long")
        .alias("n_segs"),
    )
    return base.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


def boilerplate_segment_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = SEGMENT_WORDS,
    min_df: int = 100,
) -> DataFrame:
    """RefinedWeb-style boilerplate removal: delete EVERY occurrence of
    any segment whose corpus occurrence count is >= ``min_df`` — nav
    bars / cookie banners / footers repeat across a large fraction of a
    crawl, and unlike ``segment_dedup`` (keep FIRST occurrence) the
    boilerplate verb keeps none of them.

    Scale shape (100 TB): ``segment_dedup``'s accepted two-shuffle
    shape.  (1) The segment-count agg collapses map-side — a
    10^9-occurrence cookie banner ships one row per map task — and the
    surviving hot set is <= total_occurrences / min_df rows by
    pigeonhole: at any corpus-fraction threshold a bounded dimension,
    BROADCAST into (2) a hash anti equi-join on the occurrence stream
    (never a nested-loop node), then (3) one groupBy(id) reassembles
    surviving segments in order.  Output: (id, text_clean, n_removed);
    text_clean is whitespace-normalized by the shared segment split
    (the segment-family contract) and '' when every segment was hot."""
    occ = segment_occurrences(df, text_col, id_col, k)
    hot = (
        occ.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= F.lit(int(min_df)))
        .select("seg")
    )
    kept = occ.join(F.broadcast(hot), "seg", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
    )
    n_segs = F.size(segments_col(F.col(text_col), k)).cast("long")
    return (
        df.select(F.col(id_col), n_segs.alias("_n_segs"))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (F.col("_n_segs") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def doc_novelty(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-doc novelty: the fraction of a doc's DISTINCT word n-gram
    shingles whose corpus-wide first occurrence (min id) is this doc —
    the curriculum/curation signal that separates original content from
    recombined boilerplate (a mirror page scores ~0, the page it copies
    scores high).  Shingle-less docs (< n tokens) report NULL novelty
    (no evidence), not 0 or 1.

    Scale shape: distinct-per-doc shingles collapse map-side; the
    first-occurrence aggregate is O(distinct shingles) (hot boilerplate
    shingles collapse in the partial agg — the segment_dedup skew
    lesson); the join back is 1:1 enrichment; per-doc reduction is one
    more map-side-combined aggregate.  Output: (id, n_shingles,
    n_novel, novelty) with novelty one exact-int division."""
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    first = sh.groupBy("sh").agg(F.min(id_col).alias("_first"))
    per = (
        sh.join(first, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    z = F.lit(0).cast("long")
    return df.select(F.col(id_col)).join(per, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shingles", z).alias("n_shingles"),
        F.coalesce("n_novel", z).alias("n_novel"),
        F.when(
            F.coalesce("n_shingles", z) > 0,
            F.round(F.col("n_novel") / F.col("n_shingles"), 6),
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# Exact-substring span dedup (ExactSubstr, Lee et al. 2022): excise
# duplicated ≥L-token spans, keeping only their first occurrence
# ---------------------------------------------------------------------------

SPAN_WORDS = 8


def span_occurrences(
    df: DataFrame, text_col: str, id_col: str, span_len: int = SPAN_WORDS
) -> DataFrame:
    """Every OVERLAPPING ``span_len``-token window of every doc as
    ``(id, i, wkey)`` — wkey = md5 of the space-joined window (the
    shared portable hash universe).  One narrow map producing ~n rows
    per n-token doc; docs shorter than the span emit nothing."""
    base = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))
    # let-bind the token array: Catalyst inlines the split() into the
    # per-window lambda otherwise — O(len) re-tokenization per window,
    # quadratic in doc length (the winnowing kernel lesson, let_bound)
    wins = let_bound(
        F.col("_t"),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.col("_n") - F.lit(span_len - 1)),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.array_join(F.slice(t, i, span_len), " ")).alias("wkey"),
            ),
        ),
    )
    return (
        base.filter(F.col("_n") >= span_len)
        .select(F.col(id_col), F.explode(wins).alias("_w"))
        .select(F.col(id_col), F.col("_w.i").alias("i"), F.col("_w.wkey").alias("wkey"))
    )


def excise_duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, span_len: int = SPAN_WORDS
) -> DataFrame:
    """ExactSubstr dedup (arXiv:2107.06499 §4.1): any ``span_len``-token
    window whose content occurs ANYWHERE earlier in the corpus (global
    order = (id, position); self-repetition within a doc counts) is a
    duplicate; the union of duplicate windows is excised and the doc
    reassembled from the surviving tokens.  The span complement to
    segment_dedup: segments are fixed non-overlapping blocks (cheap,
    alignment-sensitive), spans are every overlapping window (catches
    copied passages at ANY offset — the quote/mirror/boilerplate case
    alignment breaks).

    Scale shape: the window relation is O(total tokens) rows (like
    shingles); the keeper aggregate ``min(struct(id, i))`` collapses a
    boilerplate span repeated 10^9 times in the map-side partial agg
    (the segment_dedup skew lesson); the join back is a 1:1 enrichment
    on wkey (no pair blow-up — AQE splits any residual hot-key on the
    shuffle join); per-doc reassembly is array math bounded by doc
    length.  Output: (id, n_tokens, n_removed, dedup_fp) with dedup_fp
    = md5 of the surviving token sequence, so a driver hash check pins
    the exact excision."""
    wins = span_occurrences(df, text_col, id_col, span_len)
    keeper = wins.groupBy("wkey").agg(
        F.min(F.struct(F.col(id_col), F.col("i"))).alias("_f")
    )
    dups = (
        wins.join(keeper, "wkey")
        .filter(
            (F.col(id_col) != F.col(f"_f.{id_col}")) | (F.col("i") != F.col("_f.i"))
        )
        .select(F.col(id_col), F.col("i"))
    )
    cov = dups.groupBy(id_col).agg(F.collect_set("i").alias("_starts"))
    base = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))
    joined = base.join(cov, id_col, "left").withColumn(
        "_cov",
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce(F.col("_starts"), F.expr("array()")),
                    lambda s: F.sequence(s, s + F.lit(span_len - 1)),
                )
            )
        ),
    )
    kept = F.filter(
        F.when(F.size("_t") > 0, F.sequence(F.lit(1), F.size("_t"))).otherwise(
            F.expr("array()")
        ),
        lambda j: ~F.array_contains(F.col("_cov"), j),
    )
    kept_toks = F.transform(kept, lambda j: F.element_at(F.col("_t"), j))
    return joined.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size(kept_toks)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept_toks, " ")).alias("dedup_fp"),
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: persisted band index + new-batch probe
# ---------------------------------------------------------------------------


def write_band_index(bands: DataFrame, path: str, id_col: str = "doc_id") -> None:
    """Persist LSH band keys as the corpus near-dup index, hive-partitioned
    by band_idx so a probe that touches one band prunes the others at the
    scan (PartitionFilters).  At 10^12 docs this is the artifact a daily
    increment joins against instead of re-signing the whole corpus."""
    (
        bands.select(F.col(id_col), "band_idx", "band_key")
        .write.mode("overwrite")
        .partitionBy("band_idx")
        .parquet(path)
    )


def read_band_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def incremental_near_dup_flags(
    new_bands: DataFrame, index_bands: DataFrame, id_col: str
) -> DataFrame:
    """Greedy batch-incremental near-dup: a new doc is flagged when its
    bands collide with the accepted corpus (hit_index) and/or with a
    smaller-id doc inside its own batch (hit_batch).  Conservative vs
    sequential insertion — if b is dropped for an index hit and c only
    collides with b, sequential insertion would keep c, the greedy batch
    drops it — i.e. the parallel form removes a superset, never a false
    keep of a known duplicate.

    Scale shape: both probes are equi-joins on (band_idx, band_key) —
    shuffle bounded by the NEW BATCH's band rows; the index side is the
    partitioned parquet artifact, read once, never re-signed.  The
    left_semi keeps index rows out of the output entirely."""
    key = ["band_idx", "band_key"]
    hit_index = (
        new_bands.join(index_bands.select(*key), key, "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("hit_index", F.lit(True))
    )
    hit_batch = (
        near_dup_pairs(new_bands, id_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("hit_batch", F.lit(True))
    )
    return hit_index.join(hit_batch, id_col, "full").select(
        F.col(id_col),
        F.coalesce("hit_index", F.lit(False)).alias("hit_index"),
        F.coalesce("hit_batch", F.lit(False)).alias("hit_batch"),
    )


def segment_containment_pairs(
    df: DataFrame, text_col: str, id_col: str,
    k: int = SEGMENT_WORDS, max_df: int = 50,
) -> DataFrame:
    """Subset/quote containment detection: doc a is CONTAINED in doc b
    when every DISTINCTIVE segment of a — distinct k-word segments whose
    corpus document-frequency is <= max_df — also occurs in b (the
    dedup tier that catches quoted articles, mirrored excerpts, and
    listicle subsets that minhash under-scores because |a| << |b|).
    Orientation: strictly-smaller distinctive-segment sets point at
    their containers; equal sets (mutual containment) emit only the
    (larger id -> smaller id) direction.  Output:
    (contained_id, container_id, n_shared).

    Scale shape: boilerplate segments hotter than max_df are excluded
    from candidate generation AND from the required-coverage count (the
    same hot-key cap as LSH band mitigation), so the seg equi-join's
    fan-out is <= max_df per side per segment — pair work is
    O(distinct segments x max_df^2) worst case, never corpus-quadratic;
    every aggregate is map-side combined."""
    occ = segment_occurrences(df, text_col, id_col, k).select(id_col, "seg").distinct()
    dfreq = occ.groupBy("seg").agg(F.count(F.lit(1)).alias("_df"))
    rare = occ.join(dfreq.filter(F.col("_df") <= max_df).select("seg"), "seg")
    sizes = rare.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nd"))
    a = rare.select(F.col(id_col).alias("contained_id"), "seg")
    b = rare.select(F.col(id_col).alias("container_id"), "seg")
    shared = (
        a.join(b, "seg")
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sz_a = sizes.select(F.col(id_col).alias("contained_id"), F.col("_nd").alias("_na"))
    sz_b = sizes.select(F.col(id_col).alias("container_id"), F.col("_nd").alias("_nb"))
    return (
        shared.join(sz_a, "contained_id")
        .join(sz_b, "container_id")
        .filter(
            (F.col("n_shared") == F.col("_na"))
            & (
                (F.col("_na") < F.col("_nb"))
                | ((F.col("_na") == F.col("_nb")) & (F.col("contained_id") > F.col("container_id")))
            )
        )
        .select("contained_id", "container_id", "n_shared")
    )


def lsh_collision_prob(s: float, bands: int, band_size: int) -> float:
    """P(some band collides) for a pair at Jaccard similarity s under
    (bands x band_size) MinHash LSH: 1 - (1 - s^r)^b — the standard
    S-curve (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4)."""
    return 1.0 - (1.0 - s ** band_size) ** bands


def plan_lsh_params(
    threshold: float, num_hashes: int = DEFAULT_NUM_HASHES,
    fp_weight: float = 0.5, fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Choose (bands, band_size) with bands*band_size = num_hashes that
    best matches a target Jaccard threshold: minimize
    fp_weight * integral_0^t P(collide|s) ds
    + fn_weight * integral_t^1 (1 - P(collide|s)) ds
    (the datasketch-style weighted false-positive/false-negative area
    under the S-curve; numeric integration, no dependencies).

    At index-build time this is a DRIVER-side planner — picking r too
    small floods the band join with low-similarity candidate pairs
    (shuffle volume), picking r too large drops true near-dups; the
    curve area is the principled trade."""
    best: tuple[float, tuple[int, int]] | None = None
    for band_size in range(1, num_hashes + 1):
        if num_hashes % band_size:
            continue
        bands = num_hashes // band_size
        n = 200
        fp = sum(
            lsh_collision_prob(threshold * (i + 0.5) / n, bands, band_size)
            for i in range(n)
        ) * (threshold / n)
        fn = sum(
            1.0 - lsh_collision_prob(
                threshold + (1.0 - threshold) * (i + 0.5) / n, bands, band_size
            )
            for i in range(n)
        ) * ((1.0 - threshold) / n)
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0]:
            best = (err, (bands, band_size))
    assert best is not None
    return best[1]


def tfidf_cosine_pairs(
    df: DataFrame, text_col: str, id_col: str,
    min_df: int = 1, max_df: int = 50, min_cos: float = 0.5,
) -> DataFrame:
    """Weighted bag-of-words cosine near-dup pairs — the tf-idf-weighted
    complement to n-gram Jaccard (set overlap) and simhash (unweighted
    cosine sketch): catches rewrites that keep the distinctive
    vocabulary but reorder/paraphrase structure, where shingle overlap
    collapses.  Output: (id_a, id_b, cos_sim) with id_a < id_b and
    cos_sim >= min_cos.

    Determinism seam: weights are EXACT integers — idf in micro-units
    via INTEGER division (N*1e6 div df; both engines floor identically,
    no transcendental in the weight), w = tf * idf_micro as BIGINT,
    dot products and norms summed in DECIMAL(38,0) (the
    gate_distill_stats pattern: order/retry/partition-invariant, never
    a float sum over shuffle-ordered rows).  The final cosine is ONE
    double expression over exact integer inputs (cast, sqrt, divide —
    all IEEE correctly-rounded), so Spark and DuckDB emit bit-identical
    doubles and the min_cos boundary can never flip cross-engine.

    Scale shape: terms hotter than max_df are dropped (stopword cap ==
    the LSH hot-band mitigation), so the term equi-join fans out
    <= max_df per side — pair work O(distinct terms x max_df^2), never
    corpus-quadratic; tf/df/norm aggregates all map-side combined; the
    df relation is vocabulary-bounded and broadcast.  N*1e6 stays
    inside BIGINT to ~9e12 docs — at larger corpora drop the idf scale
    to 1e3 (keyword arg if ever needed).

    min_df defaults to 1 ON PURPOSE: df=1 terms never reach any dot
    product (only one doc holds them — the equi-join emits nothing) but
    they MUST count toward the holder's norm, else two docs sharing
    only common vocabulary score a spurious 1.0 (their distinctive
    singletons would vanish from both vectors).  The idf is LINEAR
    (N/df) rather than ln(N/df) — the price of exact integer
    cross-engine arithmetic; it over-weights rare terms relative to
    standard tf-idf, which for near-dup detection errs strict."""
    nd = df.count()  # driver scalar: one count job, reused as a literal
    occ = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), "[ ]+")).alias("term")
    )
    tf = occ.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        occ.groupBy("term")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter((F.col("_df") >= min_df) & (F.col("_df") <= max_df))
        .withColumn("idf_micro", F.expr(f"{nd * 1_000_000}L div _df"))
        .select("term", "idf_micro")
    )
    wts = tf.join(F.broadcast(dfreq), "term").select(
        F.col(id_col), "term",
        (F.col("tf") * F.col("idf_micro")).alias("w"),
    )
    wd = F.col("w").cast("decimal(38,0)")
    norms = wts.groupBy(id_col).agg(F.sum(wd * F.col("w")).alias("n2"))
    a = wts.select(F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa"))
    b = wts.select(F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb"))
    num = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa").cast("decimal(38,0)") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("n2").alias("_na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("n2").alias("_nb"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        num.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= F.lit(min_cos))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
    )
