"""Outlink extraction tier: href parse, host resolution, anchor terms,
robots gate, edge aggregation, plan shape, and the registered
composition with PageRank."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from quality_filter.operators import graph, links

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF = "/root/testdata/sf0.01"


def _resolve(spark, rows):
    df = spark.createDataFrame(rows, "link string, src string")
    return [
        r["dst"]
        for r in df.select(
            links.link_host_col(F.col("link"), F.col("src")).alias("dst")
        ).collect()
    ]


def test_link_host_resolution_classes(spark):
    """Every href class resolves per the documented convention, and a
    malformed absolute link yields NULL — never a job abort (the
    try_parse_url contract)."""
    rows = [
        ("https://WWW-Host.Example.COM/p/1", "me.com"),   # absolute, case folds
        ("http://a.example.org", "me.com"),               # absolute http
        ("//cdn.example.net/x.js", "me.com"),             # scheme-relative
        ("/about", "me.com"),                             # page-relative
        ("contact.html", "me.com"),                       # bare relative
        ("mailto:info@example.com", "me.com"),            # opaque scheme
        ("javascript:void(0)", "me.com"),                 # opaque scheme
        ("https://exa mple.com/x", "me.com"),             # malformed absolute
        ("", "me.com"),                                   # empty href
    ]
    got = _resolve(spark, rows)
    assert got == [
        "www-host.example.com",
        "a.example.org",
        "cdn.example.net",
        "me.com",
        "me.com",
        None,
        None,
        None,
        "me.com",
    ]


HTML_A = (
    '<html><body><nav><a href="/">home</a></nav>'
    '<a href="https://b.com/x">to b</a>'
    '<a href="https://b.com/y">b again</a>'
    '<a href="//c.com/z">to c</a>'
    '<a href="mailto:x@y.z">mail</a></body></html>'
)
HTML_B = '<p>no links here</p><a href="https://a.com/1">back to a</a>'


def test_host_edges_hand_case(spark):
    df = spark.createDataFrame(
        [("a.com", HTML_A), ("b.com", HTML_B)], "host string, html_str string"
    )
    got = {(r["src"], r["dst"]): r["w"] for r in links.host_edges(df).collect()}
    # relative "/" resolves to a.com itself -> self-loop dropped; mailto dropped
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1, ("b.com", "a.com"): 1}


def test_host_edges_keep_self_loops_flag(spark):
    df = spark.createDataFrame([("a.com", HTML_A)], "host string, html_str string")
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in links.host_edges(df, drop_self=False).collect()
    }
    assert got[("a.com", "a.com")] == 1


def test_anchor_terms_element_parse_cannot_misalign(spark):
    """An anchor with nested markup is skipped wholesale (element regex
    requires tag-free inner text) — it can never shift another anchor's
    text onto the wrong href."""
    html = (
        '<a href="https://b.com/x"><b>bold</b> skipped</a>'
        '<a href="https://c.com/y">real anchor words</a>'
        '<a href="/local">home page</a>'
    )
    df = spark.createDataFrame([("a.com", html)], "host string, html_str string")
    got = Counter(
        {(r["dst"], r["term"]): r["n"] for r in links.anchor_terms(df).collect()}
    )
    assert got == Counter(
        {
            ("c.com", "real"): 1,
            ("c.com", "anchor"): 1,
            ("c.com", "words"): 1,
            ("a.com", "home"): 1,
            ("a.com", "page"): 1,
        }
    )


def test_robots_noindex_col(spark):
    rows = [
        ('<meta name="robots" content="noindex,nofollow">', True),
        ('<META NAME="robots" CONTENT="NOINDEX">', True),
        ('<meta name="robots" content="index,follow">', False),
        ("<p>no meta at all</p>", False),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html_str string")
    got = [
        r["f"]
        for r in df.select(
            links.robots_noindex_col(F.col("html_str")).alias("f")
        ).collect()
    ]
    assert got == [want for _, want in rows]


def test_outlink_edges_plan_single_exchange_no_python(spark):
    """Extraction + resolution are narrow JVM maps; the ONLY exchange is
    the map-side-combined edge count, and no Python crossing exists."""
    import __spark_entry__ as E

    df = E.queries()["outlink_host_edges"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan, plan  # map-side combine before the shuffle


def test_outlink_edges_partition_invariant(spark):
    import __spark_entry__ as E

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from __spark_entry__ import _ol_pages

    a = sorted(map(tuple, links.host_edges(_ol_pages(docs)).collect()))
    b = sorted(map(tuple, links.host_edges(_ol_pages(docs.repartition(13))).collect()))
    assert a == b and len(a) > 0


def test_crawl_frontier_excludes_crawled_and_ranks(spark):
    """Frontier URLs are never in the crawl log, are rank-ordered, and
    the rank join rides a broadcast (61-host dim)."""
    import __spark_entry__ as E

    df = E.queries()["crawl_frontier_topk"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert len(rows) == E.CRAWL_FRONTIER_K
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from __spark_entry__ import _ol_pages

    crawled = {
        f"https://{r['host']}/p/{r['doc_id']}" for r in _ol_pages(docs).collect()
    }
    assert all(r["url"] not in crawled for r in rows)
    ranks = [r["rank_micro"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_outlink_pagerank_node_universe_and_mass(spark):
    """Composed crawl->graph->rank query covers the full host universe
    and every host keeps at least the teleport mass."""
    import __spark_entry__ as E

    rows = E.queries()["outlink_pagerank"](spark, SF).collect()
    assert len(rows) == E.OL_HOSTS
    base = (
        (graph.DAMP_DEN - graph.DAMP_NUM) * graph.PAGERANK_R0 // graph.DAMP_DEN
    )
    assert all(r["rank_micro"] >= base for r in rows)


def test_stream_host_edges_matches_batch_per_window(spark, tmp_path):
    """Live windowed edge extraction == batch host_edges over each
    window's pages (shared expressions make them agree edge-for-edge),
    and summing windows reproduces the whole-corpus edge weights."""
    import pandas as pd
    from quality_filter.streaming.stream import stream_host_edges

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    from __spark_entry__ import _ol_pages

    # give pages event times spanning 2 windows (deterministic by doc_id)
    pages = _ol_pages(docs).withColumn(
        "warc_ts",
        F.to_timestamp(
            F.when(F.col("doc_id") % 2 == 0, F.lit("2025-06-01 01:10:00"))
            .otherwise(F.lit("2025-06-01 07:20:00"))
        ),
    )
    src = str(tmp_path / "she_src")
    pages.write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = stream_host_edges(stream, window="6 hours", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("sedges")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["src"], r["dst"]): r["w"]
        for r in spark.sql("select * from sedges").collect()
    }
    assert got
    windows = sorted({w for w, _, _ in got})
    assert len(windows) == 2
    batch_pages = spark.read.parquet(src)
    for w in windows:
        in_w = batch_pages.filter(
            (F.col("warc_ts") >= w) & (F.col("warc_ts") < F.lit(w) + F.expr("INTERVAL 6 HOURS"))
        )
        cells = {
            (w, r["src"], r["dst"]): r["w"]
            for r in links.host_edges(in_w).collect()
        }
        assert cells == {k: v for k, v in got.items() if k[0] == w}
    # window sums == whole-corpus batch edges
    total = {}
    for (_, s, d), v in got.items():
        total[(s, d)] = total.get((s, d), 0) + v
    whole = {(r["src"], r["dst"]): r["w"] for r in links.host_edges(batch_pages).collect()}
    assert total == whole


def test_href_boundary_rejects_data_href(spark):
    """data-href/xlink:href must not be extracted as links (href must
    start the attribute list or follow whitespace)."""
    html = (
        '<a data-href="https://tracker.example/x">t</a>'
        '<a xlink:href="https://svg.example/y">s</a>'
        '<a href="https://real.example/z">ok</a>'
    )
    df = spark.createDataFrame([("a.com", html)], "host string, html_str string")
    got = {(r["src"], r["dst"]) for r in links.host_edges(df).collect()}
    assert got == {("a.com", "real.example")}


def test_anchor_text_not_polluted_by_gt_in_href(spark):
    """An href containing '>' must never leak its tail into anchor
    text: the bracket-free capture can't cross the open tag's '>' and
    try_parse_url rejects the malformed URL anyway — the whole anchor
    drops, leaving neighbors untouched (no misattribution either
    way)."""
    html = (
        '<a href="https://x.com/a>b">polluted tail</a>'
        '<a href="https://y.com/ok">real words</a>'
    )
    df = spark.createDataFrame([("a.com", html)], "host string, html_str string")
    got = {(r["dst"], r["term"]) for r in links.anchor_terms(df).collect()}
    assert got == {("y.com", "real"), ("y.com", "words")}
    # and the capture itself is clean even before host resolution
    anchor = df.select(
        F.regexp_extract(
            F.lit('<a href="https://x.com/a>b">polluted tail</a>'),
            links.ANCHOR_TEXT_PATTERN, 1,
        ).alias("a")
    ).first()["a"]
    assert anchor == "polluted tail"


def test_robots_decision_longest_match_and_tiebreak(spark):
    """RFC 9309 semantics pinned: longest matching prefix wins in both
    directions (a longer Allow re-opens a Disallowed subtree, a longer
    Disallow closes an Allowed one); an exact length tie goes to allow
    (least-restrictive); no matching rule means allowed."""
    urls = spark.createDataFrame(
        [
            ("u1", "h1", "/p/12"),   # disallow /p/1 wins (no allow match)
            ("u2", "h1", "/p/145"),  # allow /p/14 overrides disallow /p/1
            ("u3", "h1", "/q/7"),    # no rule matches -> allowed
            ("u4", "h2", "/a/x"),    # equal-length tie /a/ vs /a/ -> allow
            ("u5", "h3", "/b/deep"), # longer DISALLOW beats shorter allow
        ],
        ["url", "host", "path"],
    )
    rules = spark.createDataFrame(
        [
            ("h1", "disallow", "/p/1"),
            ("h1", "allow", "/p/14"),
            ("h2", "disallow", "/a/"),
            ("h2", "allow", "/a/"),
            ("h3", "allow", "/b/"),
            ("h3", "disallow", "/b/deep"),
        ],
        ["host", "rule", "prefix"],
    )
    got = {
        r["url"]: (r["verdict"], r["matched_prefix"])
        for r in links.robots_decision(urls, rules).collect()
    }
    assert got["u1"] == ("blocked", "/p/1")
    assert got["u2"] == ("allowed", "/p/14")
    assert got["u3"] == ("allowed", None)
    assert got["u4"] == ("allowed", "/a/")
    assert got["u5"] == ("blocked", "/b/deep")


def test_crawl_fetch_plan_respects_quota_and_politeness(spark):
    """The composed scheduler: per host, fetched rounds are exactly
    1..min(quota, frontier size) — never exceeding the apportioned
    quota, never skipping a politeness round; total fetches ≤ budget,
    == budget when no host exhausts its frontier."""
    import __spark_entry__ as E

    rows = E.q_crawl_fetch_plan(spark, SF).collect()
    assert 0 < len(rows) <= E.FETCH_PLAN_BUDGET
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        quota = rs[0]["quota"]
        rounds = sorted(x["fetch_round"] for x in rs)
        assert rounds == list(range(1, len(rs) + 1)), host
        assert len(rs) <= quota


def test_blocklist_gate_longest_suffix_wins(spark):
    """UT1 gate semantics on hand-built hosts: (a) a host matching two
    entries takes the LONGEST (ads.w0.site0.com → 'ads', not
    site0.com's 'tracker'); (b) a registrable-domain entry blocks every
    subdomain; (c) matching is at dot boundaries only (notsite3.net
    must NOT match site3.net); (d) unlisted hosts pass."""
    bl = spark.createDataFrame(
        list(links.HOST_BLOCKLIST), "rule string, category string"
    )
    cases = [
        (1, "ads.w0.site0.com", True, "ads.w0.site0.com", "ads"),
        (2, "w3.site0.com", True, "site0.com", "tracker"),
        (3, "cdn.w1.site3.net", True, "site3.net", "adult"),
        (4, "notsite3.net", False, None, None),
        (5, "w7.site7.com", True, "w7.site7.com", "phishing"),
        (6, "deep.sub.w7.site7.com", True, "w7.site7.com", "phishing"),
        (7, "w2.site2.org", False, None, None),
        (8, "com", False, None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, *_ in cases], "doc_id long, host string"
    )
    got = {
        r["doc_id"]: (r["blocked"], r["matched_rule"], r["category"])
        for r in links.blocklist_gate(df, "host", bl).collect()
    }
    assert len(got) == len(cases)
    for i, _h, blocked, rule, cat in cases:
        assert got[i] == (blocked, rule, cat), (i, got[i])


def test_url_blocklist_gate_registry_matches_suffix_classes(spark):
    """The registered query exercises every match class at sf0.01:
    full-subdomain, registrable-domain, and longest-wins overlaps all
    occur; every blocked row's rule IS a dot-boundary suffix of its
    host; unblocked rows match no listed suffix."""
    import __spark_entry__ as E

    rows = E.q_url_blocklist_gate(spark, SF).collect()
    assert len(rows) == 500
    listed = dict(links.HOST_BLOCKLIST)
    cats = set()
    for r in rows:
        sufs = {
            ".".join(r["host"].split(".")[i:])
            for i in range(len(r["host"].split(".")))
        }
        hits = sufs & set(listed)
        if r["blocked"]:
            assert r["matched_rule"] == max(hits, key=len)
            assert r["category"] == listed[r["matched_rule"]]
            cats.add(r["category"])
        else:
            assert not hits
    assert {"tracker", "ads", "adult", "malware"} <= cats
