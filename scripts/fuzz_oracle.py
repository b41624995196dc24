"""Differential ORACLE fuzz: regenerate the documents/events/embeddings
tables with adversarial content (unicode edges, ties, duplicates,
degenerate rows), then run every table-compatible registry query
against its DuckDB oracle on the fresh corpus.

The fixed sf0.01 correctness check pins one dataset forever; this
harness re-aims the same Spark-vs-DuckDB comparison at the corners —
the extraction-fuzz lesson from round 1 (differential fuzzing found
real seams) applied to the whole query registry.

Known, documented exclusions (engine-semantics differences, not bugs):
  * pii_scrub_docs — RE2's \\d/\\b are ASCII; Java's (?U)\\d/\\b are
    Unicode.  On the fixed testdata the synthetic PII is ASCII so both
    agree; fuzz text with Unicode digits would diverge BY DESIGN (the
    Python oracle, which is normative, sides with Java).  The seam is
    pinned separately by tests/test_spark_pipeline.py's guard-edge
    tests against the PYTHON oracle.

Usage: python scripts/fuzz_oracle.py [seed ...]   (default seeds 1 2 3)
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import tempfile

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOC_QUERIES = [
    "text_stats", "stopword_ratio_docs", "symbol_density_docs",
    "quality_gate_docs", "quality_contribs_docs", "lang_guess_docs",
    "doc_fingerprints", "dedup_exact_docs", "minhash_signatures",
    "lsh_band_keys", "near_dup_pairs", "near_dup_clusters",
    "near_dup_survivors", "ngram_jaccard_dups", "minhash_jaccard_estimate",
    # b-bit compression audit: same md5 minhash universe + engine-identical
    # hex-char algebra (strpos/locate over a literal alphabet)
    "bbit_minhash_estimate",
    # round 5: keep-best representative — fuzz-proven component algebra
    # + exact-integer length rank (argmax/tie-break bit-identical)
    "near_dup_quality_survivors",
    "simhash_docs", "simhash_near_dup", "docs_hash_sample",
    "docs_stratified_sample", "corpus_top_terms", "tfidf_top_docs",
    "dup_ngram_ratio_docs", "packed_docs", "corpus_curation",
    "doc_quality_deciles", "benchmark_decontamination", "source_mixing_rates",
    # round 4: scale twins + segment/incremental dedup (media_near_dup —
    # and round 5's crawl_media_near_dup — are excluded only because they
    # generate their own media table, not fuzzed)
    "benchmark_decontamination_bloom", "doc_quality_decile_bounds",
    "doc_length_quantiles_approx", "segment_dedup_docs",
    # curriculum positions: fuzz-proven decile bounds + md5 rank
    # universe; the oracle's global row_number vs the two-level nibble
    # decomposition is exactly what fuzz should stress
    "curriculum_order",
    # round 5: boilerplate verb — fuzz-proven segment algebra + exact df
    "boilerplate_scrub_docs",
    "incremental_near_dup", "incremental_curation",
    # round-4 follow-up: bit-exact tempered sampling (fuzzed strata sizes
    # exercise the sqrt-threshold chain on arbitrary count ratios)
    "temperature_mixture_rates", "temperature_mixture_sample",
    # domain-level curation: keep_frac is exact-integer division, so the
    # reputation threshold compare is bit-identical on any fuzzed strata
    "source_reputation_flags", "quality_score_histogram", "doc_chunks",
    "mixture_epoch_upsample",
    # round-4 continued: within-doc dedup (md5-pinned reassembly on
    # adversarial unicode/whitespace), first-fail attribution, canonical
    # URL dedup (url synthesized from doc_id+source in both engines),
    # and the label-propagation component twin
    "unit_dedup_docs", "gate_funnel", "url_dedup_docs",
    "near_dup_clusters_labelprop",
    # exact integer-scaled sums (order-free by construction) + budget agg
    "gate_distill_stats", "corpus_token_budget",
    # containment + repetition bundle (segment/shingle algebra already
    # fuzz-proven; these recombine it)
    "containment_pairs", "repetition_profile_docs",
    # seven-stage composed flow (url dedup -> gate -> dedup -> near-dup
    # -> containment -> sample -> pack)
    "corpus_curation_v2",
    # sqrt-chain E-S keys + md5-bucket CMS cells (both engine-exact)
    "weighted_sample_docs", "term_cms_sketch",
    # HLL cardinality audit: md5 string algebra + exact-int harmonic sum
    # + the ln precedent; both branches engine-identical by construction
    "hll_vocab_estimate",
    # in-engine trained distilled gate: the whole trajectory is
    # exact-integer (floored IEEE ratio doubles, HUGEINT/DECIMAL sums,
    # trunc division) so any corpus — degenerate one-class included
    # (all weights stay 0) — must match bit-for-bit
    "gate_distill_weights", "distilled_gate_agreement",
    # reliability bins: same unrolled chain + exact pmod floor-div
    "distilled_gate_reliability",
    # per-rule ablation: quality_gate's fuzz-proven predicates, one
    # flag per rule + an exact-int fail count
    "rule_ablation_report",
    # ASCII lexicon \b: RE2 and Java agree on any corpus
    "toxicity_gate_docs",
    # exact integer/rational inputs -> engine-identical arithmetic chain
    "minhash_containment_estimate",
    # graph/retrieval/tokenizer tier: pagerank is pure doc_id-derived
    # integer algebra (corpus-agnostic); bm25 may legitimately return
    # empty when a fuzzed corpus lacks the query terms (both engines
    # empty => pass); bpe/orc exercise substr + format fidelity on
    # adversarial unicode; confusion reuses the fuzz-proven lang_guess
    "host_pagerank", "bm25_top_docs", "bm25_indexed", "bpe_pair_counts",
    "orc_roundtrip_stats", "langid_confusion",
    # KN LM counts: pure positional token algebra (zip_with slices ==
    # DuckDB double-unnest zip), exact integers
    "kn_bigram_counts", "kn_continuation_stats",
    # per-doc KN surprisal: exact-int num/den through one log2 (pmi
    # class) + (w1,w2)-sorted fold — string-sort parity fuzz-proven via
    # tfidf_top_docs, fold order pinned by construction on both engines
    "kn_doc_surprisal",
    # CCNet terciles: fuzz-proven kn_doc_surprisal bits (round-6,
    # bit-identical) -> power-of-two bin floor (IEEE-exact) -> exact-int
    # histogram CDF; lang is grouped as an opaque string on both engines
    "ccnet_ppl_buckets",
    # Moore-Lewis: two fuzz-proven KN model chains over one shared
    # bigram fact; selection is exact-int compare + raw-double diff of
    # engine-identical folds
    "moore_lewis_selection",
    # OOV rate: deterministic top-V vocab (count desc, term asc) +
    # exact counts; lower() parity fuzz-proven via tfidf_top_docs
    "oov_rate_docs",
    # mojibake repair: ordered LITERAL replace chain (no regex on
    # data), identical synthesis + chain in both engines
    "mojibake_repair_docs",
    # winnowing (md5 universe window-min) + content snapshot diff
    "winnowing_fingerprints", "winnowing_pairs", "corpus_snapshot_diff",
    # PSI drift: fuzz-proven feature CTE + exact-count shares + the ln
    # precedent (tfidf/bm25)
    "score_drift_psi",
    # outlink tier: the synthesized html blanks [<>"] from doc text in
    # both engines, so the href set is exactly the generated one on ANY
    # corpus; host parse/anchor split are ASCII-regex engine-identical
    "outlink_host_edges", "outlink_pagerank", "anchor_text_terms",
    "robots_noindex_flags", "crawl_frontier_topk", "host_degree_stats",
    "frontier_politeness_rounds",
    # robots gate: md5-universe rules + startswith over synthesized
    # paths — fuzz-safe by the same construction as the outlink tier
    "frontier_robots",
    # ExactSubstr span excision: md5 window universe + positional array
    # algebra, NULL-vs-empty join seam pinned by coalesce in the oracle
    "exact_substring_dedup",
    # segment-granular savings: fuzz-proven segment algebra + exact ints
    "dedup_savings_report",
    # winnowing components: recursive-closure twin, >=2-fp evidence edges
    "winnowing_survivors",
    # quality-mass x centrality: fuzz-proven features CTE + exact micro
    # sums + the outlink graph (itself fuzz-safe by construction)
    "host_reputation",
    # TrustRank: same inputs, exact-integer recurrence; the TW=0
    # degenerate case is spec'd to zero teleport on both engines
    "host_trustrank",
    # HITS: md5-universe edges (pagerank precedent) + exact-integer
    # half-steps with window-total floor-div renormalization
    "host_hits",
    # redirect doubling: md5-universe functional edges, all-integer
    # state, unrolled self-join twin
    "redirect_resolution",
    # Hamilton apportionment over pagerank weights: exact ints,
    # window totals on the O(hosts) dim
    "crawl_budget_allocation",
    # composed scheduler: frontier (fuzz-safe outlink tier) + extracted
    # pagerank + apportionment, NULL/empty hosts excluded by spec
    "crawl_fetch_plan",
    # source-pair leakage matrix over the fuzz-proven LSH pair relation
    "cross_source_dup_matrix",
    # UT1 blocklist gate: host synthesized from doc_id by pure integer
    # arithmetic + concat (corpus-independent), exact-string suffix
    # equi-join vs a literal dim — no text column ever touched
    "url_blocklist_gate",
    # exact-count ln expression (bm25 precedent) + exact-int novelty ratio
    "collocation_pmi", "doc_novelty_docs",
    # ASCII-space tokens + log2-of-rational-counts (same class as the
    # pmi/bm25 ln expressions), 6-dp rounded on both engines
    "word_entropy_docs",
    # exact-integer micro-unit weights (integer div, DECIMAL sums) →
    # bit-identical cosine; lower() parity fuzz-proven via tfidf_top_docs
    "tfidf_cosine_pairs",
    # \xNN-escape-only regex classes (no \d/\w/\b — the (?U) seam never
    # arises); astral chars count 1 in both length() implementations
    "encoding_noise_docs",
    # CUBE over fuzz-proven lang_guess + exact-int totals
    "corpus_datasheet",
    # host-granular df-capped segment join (fuzz-proven segment algebra)
    "mirror_host_pairs",
    # BPE iteration: spaced form uses ([\s\S]) — the one dot-class
    # spelling Java and RE2 read identically on any token bytes; the
    # merge is a literal replace (no regex on data)
    "bpe_merge_round",
    # multi-round BPE training: same ([\s\S]) spaced form + literal
    # replaces; data \x01 bytes stripped char-level by spec on BOTH
    # engines (the apply path's seam), so adversarial sentinels cannot
    # split the engines
    "bpe_train_merges",
    # BPE apply: data sentinels stripped char-level on both engines;
    # counts are length() arithmetic (astral chars count 1 in both)
    "bpe_token_counts_docs",
    # per-lang compression: same apply chain, exact-int sums, one division
    "bpe_compression_by_lang",
    # tokenizer-priced packing: fuzz-proven BPE apply counts feeding the
    # fuzz-proven packing recurrence (md5 shard fate + integer fills)
    "packed_docs_bpe",
    # Zipf fit: top_terms head (fuzz-proven ordering) + floor(ln*1e9)
    # micro ints (pmi/bm25 ln parity) + exact HUGEINT/DECIMAL sums
    "zipf_fit_audit",
    # Heaps fit: exact first-occurrence/prefix counts from the corpus's
    # own id space + the same LS core
    "heaps_fit_audit",
    # learned vocabulary: fuzz-proven training chain + the coalesced
    # apply segmentation over the word fact, exact weighted counts
    "bpe_vocab",
    # compression curve: K+1 prefix counts of the same chain, exact sums
    "bpe_merge_curve",
    # DSIR: md5-bucket universe + ln of exact Laplace-smoothed count
    # ratios (pmi/bm25 class), per-doc weights exact BIGINT sums; an
    # absent target source (fuzz corpora have host*, not src0) is the
    # spec'd degenerate — all-zero target counts, identical in both
    # engines
    "dsir_bucket_ratios", "dsir_logweights_docs", "dsir_sample_docs",
    # round 5: staged v2 (output-identical by construction) and the
    # DSIR-selected v3 chain (both compose fuzz-proven stages)
    "corpus_curation_v2_staged", "corpus_curation_v3",
    # DoReMi EG step: kn_doc_surprisal's exact-int dims quantized at the
    # vocab dim (IEEE-exact 2^40 scale), DECIMAL sums, polynomial exp —
    # no float crosses a shuffle, no transcendental-libm seam
    "doremi_mixture_weights",
    # inverted-index exact Jaccard + the banding S-curve audit: shingle
    # tokenizer parity fuzz-proven via ngram_jaccard_dups, md5 bands via
    # near_dup_pairs; all downstream arithmetic exact ints + one division
    "ngram_jaccard_global", "minhash_band_scurve",
    # DoReMi weights -> Hamilton integer quotas (round-6 contract values
    # integerized by one IEEE multiply + floor; apportionment exact ints)
    "doremi_token_budget",
    # NOT fuzzed: pii_hit_counts_docs shares pii_scrub_docs' documented
    # RE2-vs-Java unicode \d/\b seam (see module docstring);
    # warc_roundtrip_stats' (and wet_roundtrip_stats') strict writer
    # rejects CR/LF in header-borne columns (lang/source) BY DESIGN —
    # fuzzed header values would turn the spec-correct abort into a
    # false fuzz failure
]
EVENT_QUERIES = [
    "decimated_events", "tumbling_agg_mean", "tumbling_agg_median",
    "tumbling_agg_max", "tumbling_agg_min", "hourly_event_stats",
    "hopping_event_stats", "forward_fill_purchase", "sessionized_counts",
    "topk_events_per_user", "running_value_sum", "salted_user_stats",
    "event_type_pivot", "event_counts_unpivot", "purchase_last_view_asof",
    "hourly_unique_users",
]
EMB_QUERIES = [
    "embedding_near_dup_pairs", "embedding_near_dup_lsh",
    "embedding_clusters", "knn_bruteforce", "knn_lsh", "knn_lsh_multiprobe",
    "knn_ivf", "knn_join", "knn_join_broadcast", "embedding_centroids_by_label",
    "semantic_dedup",
    # int8 quantization: one IEEE expression tree over the same doubles
    # in both engines → identical integers on ANY fuzzed vectors
    "knn_quantized_int8",
    # recall audit: composes knn_join (fuzz-proven) with the same
    # bucket restriction embedding_near_dup_lsh fuzz-proves
    "ann_recall_report",
    # semantic decontamination: the embedding_near_dup_lsh bucket join
    # with a train/bench split — same plane literals, exact-int counts
    "semantic_decontamination",
    # round 5: composed exact+semantic verdict — both legs fuzz-proven
    "decontamination_report",
    # equal-quota sample over refined k-means clusters: engine-free
    # centroid twin + md5 rank universe, both exact on any corpus
    "cluster_balanced_sample",
]

WORD_POOLS = (
    # plain english-ish (stopword-bearing so the gates vary)
    "the and of to in is was for on with quick brown fox lazy dog data".split(),
    # accents / non-latin scripts / mixed digits
    "café naïve Zürich schön østre Москва データ 北京 словарь año1 42x x42".split(),
    # regex metachars, punctuation-dense, symbols
    "a+b (c) [d] {e} $f %g ^h .* \\\\ |pipe| #tag @at 1.2.3 -- ==".split(),
)
WS = [" ", "  ", "\t", "\n", " ", " 　 "]  # inter-token whitespace


def gen_text(rnd: random.Random) -> str:
    kind = rnd.random()
    if kind < 0.04:
        return rnd.choice(["", " ", "\t\n", " ", "x"])
    if kind < 0.08:  # pathological repetition (dup/near-dup fodder)
        tok = rnd.choice(WORD_POOLS[0])
        return (tok + " ") * rnd.randint(1, 60)
    pool = rnd.choice(WORD_POOLS) if kind < 0.8 else [
        w for p in WORD_POOLS for w in p
    ]
    n = rnd.randint(1, 80)
    return rnd.choice(WS).join(rnd.choice(pool) for _ in range(n))


def gen_corpus(outdir: str, seed: int, n_docs: int = 300, n_events: int = 2000,
               n_vecs: int = 250) -> None:
    rnd = random.Random(seed)
    texts = [gen_text(rnd) for _ in range(n_docs)]
    # inject exact + near duplicates (the dedup family must see real work)
    for _ in range(n_docs // 10):
        i, j = rnd.randrange(n_docs), rnd.randrange(n_docs)
        texts[i] = texts[j]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": [rnd.choice(["en", "de", "fr", "es", "und"]) for _ in range(n_docs)],
            "source": [f"host{rnd.randrange(5)}" for _ in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    docs.to_parquet(f"{outdir}/documents.parquet", index=False)

    base = pd.Timestamp("2024-03-01 00:00:00")
    ts = [
        base + pd.Timedelta(seconds=rnd.randrange(0, 7 * 24 * 3600))
        for _ in range(n_events)
    ]
    for _ in range(n_events // 20):  # exact-tie timestamps (tiebreak paths)
        i, j = rnd.randrange(n_events), rnd.randrange(n_events)
        ts[i] = ts[j]
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([rnd.randrange(1, 30) for _ in range(n_events)], dtype=np.int64),
            "event_type": [
                rnd.choice(["click", "error", "purchase", "signup", "view"])
                for _ in range(n_events)
            ],
            "value": np.round(np.array([rnd.uniform(-50, 150) for _ in range(n_events)]), 2),
            "props": ["{}"] * n_events,
        }
    )
    # Spark cannot read TIMESTAMP(NANOS) parquet — match the testdata's us
    events["ts"] = events["ts"].astype("datetime64[us]")
    events.to_parquet(f"{outdir}/events.parquet", index=False)

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    # planted near-duplicate pairs (small perturbations)
    for _ in range(n_vecs // 12):
        i, j = rng.integers(0, n_vecs, 2)
        X[i] = X[j] + rng.standard_normal(64).astype(np.float32) * 0.05
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": list(X),
            "label": np.zeros(n_vecs, dtype=np.int32),
        }
    )
    emb.to_parquet(f"{outdir}/embeddings.parquet", index=False)


def run_seed(seed: int) -> int:
    n_docs = int(os.environ.get("QF_FUZZ_DOCS", "300"))
    n_events = int(os.environ.get("QF_FUZZ_EVENTS", "2000"))
    n_vecs = int(os.environ.get("QF_FUZZ_VECS", "250"))
    with tempfile.TemporaryDirectory(prefix=f"qf_fuzz_{seed}_") as d:
        gen_corpus(d, seed, n_docs=n_docs, n_events=n_events, n_vecs=n_vecs)
        env = dict(os.environ, QF_SF_DIR=d, PYTHONPATH=REPO)
        queries = DOC_QUERIES + EVENT_QUERIES + EMB_QUERIES
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), *queries],
            env=env, capture_output=True, text=True, timeout=2700,
        )
        tail = "\n".join(out.stdout.strip().splitlines()[-3:])
        print(f"--- seed {seed}: {tail}")
        if out.returncode != 0:
            fails = [l for l in out.stdout.splitlines() if l.startswith("FAIL")]
            print("\n".join(fails[:10]))
        return out.returncode


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or [1, 2, 3]
    rc = 0
    for s in seeds:
        rc |= run_seed(s)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
