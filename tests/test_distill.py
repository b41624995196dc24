"""In-engine trained distilled gate (operators/distill.py): engine-free
training twin, plan shape, non-degeneracy, and overflow guard."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF = "/root/testdata/sf0.01"


def _python_train(texts):
    """Pure-Python twin of staged_base + train_distilled_gate: same
    exact-integer features (floor of the IEEE ratio doubles — Python
    computes the identical int/int division), same balanced weights,
    same Gauss-Seidel trajectory.  No Spark, no DuckDB."""
    from quality_filter import features as FT
    from quality_filter.config import load_config
    from quality_filter.operators.distill import (
        DISTILL_ROUNDS,
        DISTILL_TARGET,
        FEAT_SCALE,
        MWL_SCALE,
        _FEATURES,
        _trunc_div,
    )

    cfg = load_config()
    X, ys = [], []
    for t in texts:
        f = FT.text_features(t, cfg.stopwords)
        f["ppl_norm"] = 0.0
        q = FT.quality_score(f, dict(cfg.quality_weights), cfg.quality_bias)
        fail = (
            f["n_chars"] < cfg.min_chars
            or f["n_chars"] > cfg.max_chars
            or f["n_words"] < cfg.min_words
            or f["stopword_ratio"] < cfg.min_stopword_ratio
            or f["symbol_ratio"] > cfg.max_symbol_ratio
            or f["distinct_ratio"] < cfg.min_distinct_ratio
            or not (cfg.min_mean_word_len <= f["mean_word_len"] <= cfg.max_mean_word_len)
        )
        ys.append(0 if (fail or q < cfg.quality_threshold) else 1)
        X.append(
            [
                FEAT_SCALE,
                math.floor(f["stopword_ratio"] * FEAT_SCALE),
                math.floor(f["symbol_ratio"] * FEAT_SCALE),
                math.floor(f["distinct_ratio"] * FEAT_SCALE),
                math.floor(f["length_norm"] * FEAT_SCALE),
                math.floor(f["mean_word_len"] * MWL_SCALE),
            ]
        )
    n, npos = len(ys), sum(ys)
    c = [n - npos if y else npos for y in ys]
    J = len(_FEATURES)
    h = [sum(ci * r[f] * r[f] for ci, r in zip(c, X)) for f in range(J)]
    w = [0] * J
    for _ in range(DISTILL_ROUNDS):
        for f in range(J):
            g = sum(
                ci * (sum(w[k] * r[k] for k in range(J)) - y * DISTILL_TARGET) * r[f]
                for ci, r, y in zip(c, X, ys)
            )
            w[f] -= _trunc_div(g, max(h[f], 1))
    return dict(zip(_FEATURES, w)), X, ys


def test_train_distilled_gate_matches_python_twin_exactly(spark):
    """The full training trajectory is engine-free: pure-Python ints
    from the parquet reproduce every learned weight EXACTLY (not
    approximately) — the license for the value-hash oracle twin."""
    import __spark_entry__ as E
    from quality_filter.operators import distill

    _, base = E._distill_base(spark, SF)
    w_spark = distill.train_distilled_gate(base)
    texts = pd.read_parquet(f"{SF}/documents.parquet")["text"].tolist()
    w_py, _, ys = _python_train(texts)
    assert w_spark == w_py
    # the corpus must exercise both classes or the test proves nothing
    assert 0 < sum(ys) < len(ys)
    # and training must have moved off the origin
    assert any(v != 0 for v in w_spark.values())


def test_distilled_scoring_is_zero_shuffle_narrow_map(spark):
    """Scoring with the trained literal weights — the 100-TB deploy
    shape — must plan as one narrow map: no Exchange, no Join, no
    Python crossing."""
    import __spark_entry__ as E
    from quality_filter.config import load_config
    from quality_filter.functions import rules as R
    from quality_filter.operators import distill

    _, base = E._distill_base(spark, SF)
    w = distill.train_distilled_gate(base)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = R.feature_columns(F.col("text"), load_config())
    xi = distill.feature_ints(feats)
    scored = docs.select("doc_id", distill.model_keep_col(xi, w).alias("keep"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "ArrowEval", "BatchEval", "Window"):
        assert bad not in plan, f"{bad} in deploy-scoring plan:\n{plan}"


def test_distilled_gate_agreement_is_nondegenerate(spark):
    """The student must actually learn the teacher: overall accuracy
    >= 0.9 AND both classes predicted AND recall of the gate's keeps
    >= 0.9 (the r5 fix — the damped-Jacobi formulation this replaces
    kept 100% of docs at 8.8% accuracy)."""
    import __spark_entry__ as E

    rows = E.queries()["distilled_gate_agreement"](spark, SF).collect()
    tot = sum(r["n_docs"] for r in rows)
    agr = sum(r["n_agree"] for r in rows)
    kg = sum(r["n_keep_gate"] for r in rows)
    km = sum(r["n_keep_model"] for r in rows)
    assert agr / tot >= 0.9
    assert 0 < km < tot, "student predicts a single class — degenerate"
    tp = (km + kg - (tot - agr)) / 2  # errors = fp + fn; km=tp+fp; kg=tp+fn
    assert kg > 0 and tp / kg >= 0.9


def test_train_aborts_past_exact_integer_bound(spark):
    """Curvature past the DECIMAL(38,0)/HUGEINT exactness bound must
    abort with the remediation message, never silently wrap (the
    kn_doc_surprisal guard pattern)."""
    from quality_filter.operators import distill

    big = 4 * 10**18  # x^2 ~ 1.6e37 >= the 1e37 guard with c=1
    base = spark.createDataFrame(
        [(1, big, big, big, big, big, big, 1), (2, big, big, big, big, big, big, 0)],
        "_id long, _x_bias long, _x_stop long, _x_sym long, _x_dist long, "
        "_x_lennorm long, _x_mwl long, _y long",
    )
    with pytest.raises(ValueError, match="exceeds the exact"):
        distill.train_distilled_gate(base)


def test_distilled_gate_reliability_bins_partition_and_calibrate(spark):
    """The reliability diagram must (a) partition the corpus exactly
    (sum of bin counts == corpus size), (b) mark model_keep as exactly
    bin_id >= 4 (TARGET/2 is 4 bin widths — the decision boundary lies
    ON a bin edge), and (c) show calibration: the teacher's keep rate
    above the boundary strictly exceeds the rate below it."""
    import __spark_entry__ as E

    rows = E.queries()["distilled_gate_reliability"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["model_keep"] == (r["bin_id"] >= 4)
        assert abs(r["bin_lo"] - r["bin_id"] * 0.125) < 1e-12
        assert 0 <= r["n_keep_gate"] <= r["n_docs"]
    above = [r for r in rows if r["bin_id"] >= 4]
    below = [r for r in rows if r["bin_id"] < 4]
    assert above and below, "degenerate: all mass on one side of the boundary"
    rate_above = sum(r["n_keep_gate"] for r in above) / sum(r["n_docs"] for r in above)
    rate_below = sum(r["n_keep_gate"] for r in below) / sum(r["n_docs"] for r in below)
    assert rate_above > rate_below + 0.5, (rate_above, rate_below)


def test_rule_ablation_report_is_consistent_with_the_gate(spark):
    """Ablation invariants: (a) exactly one row per rule (7 hard + the
    soft quality threshold), (b) n_fail_only <= n_fail <= n_docs, (c)
    the sum of n_fail_only over rules can't exceed the gate's total
    drops (a doc failing only rule r is one dropped doc — the flags
    are the gate's own predicates), and (d) at least one rule carries
    nonzero marginal cost on this corpus."""
    import __spark_entry__ as E

    rows = E.queries()["rule_ablation_report"](spark, SF).collect()
    assert sorted(r["rule"] for r in rows) == sorted(
        ["too_short", "too_long", "too_few_words", "low_stopword",
         "high_symbol", "low_distinct", "word_len", "low_quality"]
    )
    n_docs = rows[0]["n_docs"]
    for r in rows:
        assert r["n_docs"] == n_docs
        assert 0 <= r["n_fail_only"] <= r["n_fail"] <= n_docs

    gate = E.queries()["quality_gate_docs"](spark, SF).collect()
    n_keep = sum(1 for g in gate if g["keep_heuristic"])
    n_drop = len(gate) - n_keep
    assert sum(r["n_fail_only"] for r in rows) <= n_drop
    # at least one rule must have a nonzero marginal cost on this corpus
    assert any(r["n_fail_only"] > 0 for r in rows)


def test_rule_ablation_let_bound_matches_unbound_spec_bitwise(spark):
    """The let_bound flag struct must reproduce the direct (unbound)
    per-flag formulation EXACTLY — same integers, same rounded rates
    (the CLAUDE.md rule: a reformulated expression needs a bitwise
    differential test, not approx equality).  The unbound tree here IS
    the spec: each condition references the feature expressions
    directly, exactly what the oracle SQL spells."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from quality_filter.functions import rules as R

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = R.feature_columns(F.col("text"), E.CFG)
    feats["ppl_norm"] = F.lit(0.0)
    q = R.quality_score_col(feats, E.CFG)
    conds = list(R.hard_rule_reasons(feats, E.CFG)) + [
        ("low_quality", q < E.CFG.quality_threshold)
    ]
    nf = None
    for _, c in conds:
        nf = c.cast("int") if nf is None else nf + c.cast("int")
    arr = F.array(
        *[F.struct(F.lit(n).alias("rule"), c.cast("int").alias("fail"))
          for n, c in conds]
    )
    spec = (
        docs.select(F.explode(arr).alias("rf"), nf.alias("nf"))
        .select(F.col("rf.rule").alias("rule"), F.col("rf.fail").alias("fail"), "nf")
        .groupBy("rule")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("fail").cast("long").alias("n_fail"),
            F.sum(F.when((F.col("fail") == 1) & (F.col("nf") == 1), 1).otherwise(0))
            .cast("long").alias("n_fail_only"),
        )
        .select(
            "rule", "n_docs", "n_fail", "n_fail_only",
            F.round(F.col("n_fail").cast("double") / F.col("n_docs"), 6).alias("fail_rate"),
            F.round(F.col("n_fail_only").cast("double") / F.col("n_docs"), 6).alias("marginal_keep_rate"),
        )
    )
    want = sorted(tuple(r) for r in spec.collect())
    got = sorted(
        tuple(r) for r in E.queries()["rule_ablation_report"](spark, SF).collect()
    )
    assert got == want
