"""Outlink extraction: HTML → href list → resolved host edge list.

The web-graph companion to ``text/extraction.py``: where extraction pulls
the *content* out of a crawled page, this module pulls the *link
structure* out — the input every crawl-frontier scheduler, host-reputation
ranker (``operators/graph.pagerank``) and anchor-text index needs.  The
reference library has no link operator; this is the engine's own tier
(Common Crawl publishes exactly this product as its host-level web-graph
releases built from WARC page sets).

Everything here is a JVM-native narrow map — ``regexp_extract_all`` +
array HOFs + ``try_parse_url`` — no UDF, no Python crossing, no shuffle
until the final edge aggregation.  At 10^12 pages the extraction runs at
scan speed; the only exchange is the map-side-combined ``groupBy(src,
dst)`` whose output is O(unique host pairs), a dimension relative to the
corpus (a host linked from 10^6 pages of one site collapses in the
partial agg, so link-frequency skew self-mitigates exactly like
``io/pages.url_dedup``).

Regex discipline: patterns avoid backreferences and lookaround so the
same pattern string is valid in Java regex (Spark) and RE2 (the DuckDB
oracle); anchors' inner text is matched as ``[^<]*`` so greediness
differences can never matter.

Robustness contract (the ``canonical_url_col`` lesson): malformed hrefs
NEVER abort a batch — ``try_parse_url`` yields NULL for unparseable
absolute links and those rows drop out of the edge list; scheme-relative
(``//host/...``), page-relative (``/path``) and opaque schemes
(``mailto:``, ``javascript:``) are classified explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# href values inside <a> elements, double-quoted form (group 1 = the URL;
# the (?:[^>]*\s)? boundary keeps data-href/xlink:href from matching —
# href must start the tag's attribute list or follow whitespace).
HREF_PATTERN = '(?i)<a\\s(?:[^>]*\\s)?href="([^"]*)"'
# Whole <a ...>text</a> elements with tag-free inner text (group 0 = the
# element; inner text is re-extracted per element, so a page where some
# anchors nest markup simply contributes nothing for those anchors).
ANCHOR_ELEM_PATTERN = '(?i)<a\\s(?:[^>]*\\s)?href="[^"]*"[^>]*>[^<]*</a>'
ANCHOR_HREF_PATTERN = '(?:^|\\s)href="([^"]*)"'
# inner text must be bracket-free: [^<>]* cannot cross the open tag's
# closing '>', so the match is forced to start at the LAST '>' — an href
# containing '>' can never leak into the anchor text (an anchor whose
# TEXT contains a literal '>' yields '' and contributes no terms).
ANCHOR_TEXT_PATTERN = ">([^<>]*)</a>$"
# <meta name="robots" content="... noindex ..."> — the crawl-politeness
# exclusion signal a corpus builder must honor before keeping a page.
ROBOTS_NOINDEX_PATTERN = '(?i)<meta\\s[^>]*name="robots"[^>]*content="[^"]*noindex'


def outlink_urls_col(html: Column) -> Column:
    """Array of raw href values from an HTML string column."""
    return F.regexp_extract_all(html, F.lit(HREF_PATTERN), F.lit(1))


def link_host_col(link: Column, base_host: Column) -> Column:
    """Resolve one href to a lowercase target host.

    * absolute ``http(s)://...`` → parsed host (``try_parse_url``: a
      malformed absolute link resolves to NULL, never an error);
    * scheme-relative ``//host/...`` → parsed with ``https:`` prepended;
    * page-relative ``/path`` or ``path`` (no scheme) → the page's own
      host (``base_host``);
    * opaque schemes (``mailto:``, ``javascript:``, ``tel:`` …) → NULL.
    """
    absolute = F.lower(F.try_parse_url(link, F.lit("HOST")))
    scheme_rel = F.lower(
        F.try_parse_url(F.concat(F.lit("https:"), link), F.lit("HOST"))
    )
    return (
        F.when(link.rlike("^(?i)https?://"), absolute)
        .when(link.startswith("//"), scheme_rel)
        # any other explicit scheme (mailto:, javascript:, data:, tel:)
        .when(link.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), F.lit(None).cast("string"))
        .otherwise(F.lower(base_host))
    )


def host_edges(
    df: DataFrame,
    html_col: str = "html_str",
    host_col: str = "host",
    drop_self: bool = True,
) -> DataFrame:
    """Weighted host-level link graph ``(src, dst, w)`` from pages.

    ``html_col`` is an HTML *string* column (decode upstream — the
    pipeline's strict-UTF-8 stage already owns byte semantics);
    ``host_col`` is the page's own host.  One narrow extraction map +
    one map-side-combined exchange of O(unique host pairs).
    ``drop_self`` excludes intra-host edges (relative links resolve to
    the page's own host), the usual convention for host-graph
    centrality — a site cannot vote for itself.
    """
    links = df.select(
        F.lower(F.col(host_col)).alias("src"),
        F.explode(outlink_urls_col(F.col(html_col))).alias("link"),
    )
    resolved = links.select(
        "src", link_host_col(F.col("link"), F.col("src")).alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("dst") != ""))
    if drop_self:
        resolved = resolved.filter(F.col("dst") != F.col("src"))
    return resolved.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )


def anchor_terms(
    df: DataFrame,
    html_col: str = "html_str",
    host_col: str = "host",
    k: int = 50,
) -> DataFrame:
    """Top-k ``(dst, term, n)`` anchor-text terms per target host — the
    aggregate behind anchor-text retrieval indexes (a page is described
    better by the text of links pointing AT it than by itself).

    Per-element parse (explode whole ``<a>`` elements, then re-extract
    href + inner text from each) so a page where the two per-page
    extract-all arrays would misalign cannot pair an href with the
    wrong anchor.  Terms are lowercased whitespace tokens of length ≥ 2.
    Narrow maps until the O(hosts × anchor vocabulary) count exchange;
    deterministic top-k via (n DESC, dst ASC, term ASC).
    """
    elems = df.select(
        F.lower(F.col(host_col)).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_ELEM_PATTERN), F.lit(0))
        ).alias("elem"),
    )
    pairs = elems.select(
        "src",
        F.regexp_extract(F.col("elem"), ANCHOR_HREF_PATTERN, 1).alias("link"),
        F.lower(F.regexp_extract(F.col("elem"), ANCHOR_TEXT_PATTERN, 1)).alias("anchor"),
    )
    resolved = pairs.select(
        link_host_col(F.col("link"), F.col("src")).alias("dst"),
        F.explode(F.split(F.col("anchor"), " +")).alias("term"),
    ).filter(F.col("dst").isNotNull() & (F.col("dst") != "") & (F.length("term") >= 2))
    return (
        resolved.groupBy("dst", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("dst").asc(), F.col("term").asc())
        .limit(k)
    )


def robots_noindex_col(html: Column) -> Column:
    """True iff the page carries a ``<meta name="robots" ... noindex``
    directive — pages a compliant corpus builder must drop regardless of
    content quality.  Pure rlike narrow map."""
    return html.rlike(ROBOTS_NOINDEX_PATTERN)


def robots_decision(
    urls: DataFrame, rules: DataFrame,
    url_col: str = "url", host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """RFC 9309 path-prefix matching: decide fetch/blocked per URL from
    a per-host rules relation ``(host, rule, prefix)`` with rule in
    {'allow', 'disallow'}.  The most specific (LONGEST) matching prefix
    wins; on an exact length tie the 'allow' rule wins (RFC 9309 §2.2.2
    least-restrictive tie-break); a URL matching no rule is allowed.

    Scale shape: the rules relation is an O(hosts × rules-per-host)
    dimension — broadcast into the join, so the frontier is never
    shuffled; the winner per URL is a max-struct aggregate
    (longest, allow-wins, prefix) that combines map-side.  The prefix
    match is a plain startswith, JVM-native (robots '*' wildcards and
    '$' anchors are deliberately out of scope — CC's own fetcher
    treats them as literal in the common fast path; extend the rules
    relation with a regex column if ever needed)."""
    u = urls.select(
        F.col(url_col).alias("url"), F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
    )
    matched = (
        u.join(F.broadcast(rules), "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("url")
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("_l"),
                    (F.col("rule") == "allow").cast("int").alias("_a"),
                    F.col("prefix").alias("prefix"),
                    F.col("rule").alias("rule"),
                )
            ).alias("_w")
        )
        .select(
            "url", F.col("_w.rule").alias("matched_rule"),
            F.col("_w.prefix").alias("matched_prefix"),
        )
    )
    return (
        u.join(matched, "url", "left")
        .select(
            "url", "host", "path",
            F.coalesce(
                F.when(F.col("matched_rule") == "allow", F.lit("allowed"))
                .when(F.col("matched_rule") == "disallow", F.lit("blocked")),
                F.lit("allowed"),
            ).alias("verdict"),
            "matched_rule", "matched_prefix",
        )
    )


# UT1-style category blocklist (RefinedWeb §3.1 "URL filtering": the
# Université Toulouse 1 blacklists keyed by domain suffix + category).
# Deterministic test instance — production swaps in the real ~4M-entry
# list; the PLAN is identical (broadcast dim, label-suffix equi-join).
HOST_BLOCKLIST: tuple[tuple[str, str], ...] = (
    ("site0.com", "tracker"),
    ("ads.w0.site0.com", "ads"),  # longer than site0.com: longest-wins
    ("site3.net", "adult"),
    ("site5.org", "malware"),
    ("w7.site7.com", "phishing"),
)


def blocklist_gate(
    df: DataFrame,
    host_col: str,
    rules: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-blocklist gate with UT1 semantics: a page is blocked iff
    ANY dot-boundary label-suffix of its host appears in the blocklist
    (``ads.w0.site0.com`` matches entries ``ads.w0.site0.com``,
    ``w0.site0.com``, ``site0.com`` and ``com``); the LONGEST matching
    entry names the category (most-specific rule wins, the robots
    longest-prefix precedent).  ``rules`` is ``(rule, category)``.

    Scale shape: suffix expansion is a narrow HOF (≤ label-count ≈ 4
    rows per page, never a shuffle); the blocklist is a broadcast dim
    (UT1's full list is ~4M rows ≈ 10² MB — broadcastable; past that,
    bucket both sides on ``rule``); the longest-match winner is a
    map-side-combined max-struct keyed by the UNIQUE page id, so the
    only exchange is O(matched pages); verdicts rejoin 1:1 on the id.
    Equal-length distinct rules cannot both match one host (same-length
    suffixes of a host are equal), so the winner is deterministic."""
    parts = F.split(F.col(host_col), r"\.")
    sufs = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
    )
    ex = df.select(id_col, F.explode(sufs).alias("suf"))
    matched = (
        ex.join(F.broadcast(rules), ex["suf"] == rules["rule"])
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.length("rule").alias("_l"),
                    F.col("rule").alias("rule"),
                    F.col("category").alias("category"),
                )
            ).alias("_w")
        )
    )
    return (
        df.select(id_col, F.col(host_col).alias("host"))
        .join(matched, id_col, "left")
        .select(
            id_col,
            "host",
            F.col("_w").isNotNull().alias("blocked"),
            F.col("_w.rule").alias("matched_rule"),
            F.col("_w.category").alias("category"),
        )
    )
