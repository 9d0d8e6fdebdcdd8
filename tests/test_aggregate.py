"""Unit tests: aggregation operators (SURVEY.md §2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import aggregate as agg


def test_aggregate_global_and_keyed(rows):
    df = rows([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    out = agg.aggregate(df, ["k"], {"s": F.sum("v"), "n": F.count(F.lit(1))})
    got = {r["k"]: (r["s"], r["n"]) for r in out.collect()}
    assert got == {"a": (3, 2), "b": (3, 1)}
    g = agg.aggregate(df, [], {"s": F.sum("v")}).collect()[0]
    assert g["s"] == 6


def test_group_array_is_deterministically_sorted(rows):
    # 2 partitions -> collect_list order would be racy without sort_array
    df = rows([("a", 3), ("a", 1), ("a", 2)], "k string, v int") \
        .repartition(2)
    out = df.groupBy("k").agg(agg.group_array("v").alias("arr"))
    assert out.collect()[0]["arr"] == [1, 2, 3]
    out_desc = df.groupBy("k").agg(
        agg.group_array("v", asc=False).alias("arr"))
    assert out_desc.collect()[0]["arr"] == [3, 2, 1]


def test_group_array_ordered_by_other_column(rows):
    df = rows([("a", "x", 3), ("a", "y", 1), ("a", "z", 2)],
              "k string, v string, o int")
    out = df.groupBy("k").agg(
        agg.group_array_ordered_by(F.col("v"), F.col("o")).alias("arr"))
    assert out.collect()[0]["arr"] == ["y", "z", "x"]


def test_string_agg_ordered(rows):
    df = rows([("a", 30), ("a", 10), ("a", 20)], "k string, v int")
    out = df.groupBy("k").agg(
        agg.string_agg(F.col("v").cast("string"), ",",
                       order=F.col("v")).alias("s"))
    assert out.collect()[0]["s"] == "10,20,30"


def test_distinct_keyed(rows):
    df = rows([(1, "a"), (1, "b"), (2, "a")], "k int, v string")
    assert agg.distinct(df, ["k"]).count() == 2
    assert agg.distinct(df).count() == 3


def test_rollup_and_cube(rows):
    df = rows([("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
              "k1 string, k2 string, v int")
    r = agg.rollup(df, ["k1", "k2"], {"s": F.sum("v")})
    # detail(3) + per-k1(2) + grand total(1)
    assert r.count() == 6
    total = r.where(F.col("k1").isNull() & F.col("k2").isNull()).collect()
    assert total[0]["s"] == 7
    c = agg.cube(df, ["k1", "k2"], {"s": F.sum("v")})
    assert c.count() == 8  # rollup rows + per-k2(2)


def test_grouping_sets_markers(rows):
    # a data NULL in k1 must stay distinguishable from the
    # aggregated-away NULL via the GROUPING() marker columns
    df = rows([("a", "x", 1), (None, "y", 2), ("b", "x", 4)],
              "k1 string, k2 string, v int")
    out = agg.grouping_sets(df, [["k1"], ["k2"], []],
                            {"s": F.sum("v")}).collect()
    by = {(r["k1"], r["k2"], r["g_k1"], r["g_k2"]): r["s"] for r in out}
    assert len(by) == len(out) == 3 + 2 + 1  # per-k1(3) + per-k2(2) + total
    assert by[(None, None, 0, 1)] == 2       # data NULL k1 group
    assert by[(None, None, 1, 1)] == 7       # grand total
    assert by[("a", None, 0, 1)] == 1
    assert by[(None, "x", 1, 0)] == 5


def test_partial_states_merge_equals_direct(rows):
    """The MV contract: merge(partial states) == direct aggregation,
    including states computed over separate batches."""
    b1 = rows([("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double")
    b2 = rows([("a", 3.0), ("b", 20.0)], "k string, v double")
    s1 = agg.partial_states(b1, ["k"], {"m": F.col("v")})
    s2 = agg.partial_states(b2, ["k"], {"m": F.col("v")})
    merged = agg.merge_states(s1.unionByName(s2), ["k"], ["m"],
                              {"m": "avg"})
    got = {r["k"]: r["m"] for r in merged.collect()}
    assert got == {"a": 2.0, "b": 15.0}
    as_sum = agg.merge_states(s1.unionByName(s2), ["k"], ["m"],
                              {"m": "sum"})
    assert {r["k"]: r["m"] for r in as_sum.collect()} == {"a": 6.0, "b": 30.0}


def test_pre_aggregate_then_join_never_fans_out(rows):
    base = rows([(1,), (2,), (3,)], "k int")
    detail = rows([(1, 5.0), (1, 7.0), (2, 1.0)], "fk int, v double")
    out = agg.pre_aggregate_then_join(
        base, "k", [(detail, "fk", {"s": F.sum("v"),
                                    "n": F.count(F.lit(1))})])
    assert out.count() == base.count()  # structurally impossible to fan out
    got = {r["k"]: (r["s"], r["n"]) for r in out.collect()}
    assert got == {1: (12.0, 2), 2: (1.0, 1), 3: (None, None)}


def test_percentiles_exact_and_approx(rows):
    df = rows([("a", float(v)) for v in range(1, 11)]
              + [("b", 100.0)], "k string, v double")
    out = {r["k"]: (r["p50"], r["p90"]) for r in
           agg.percentiles(df, ["k"], "v", [0.5, 0.9]).collect()}
    # continuous interpolation: median of 1..10 = 5.5, p90 = 9.1
    assert out["a"] == (5.5, pytest.approx(9.1))
    assert out["b"] == (100.0, 100.0)
    ap = {r["k"]: r["p50"] for r in
          agg.percentiles(df, ["k"], "v", [0.5], approx=True).collect()}
    assert ap["a"] in (5.0, 6.0)  # nearest-rank sketch, not interpolated
    assert ap["b"] == 100.0


def test_approx_top_k_exact_when_m_covers_cardinality(rows):
    data = [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 3 + [("w",)] * 1
    df = rows(data, "v string")
    out = [(r["value"], r["est_count"]) for r in
           agg.approx_top_k(df, "v", k=3, m=100).collect()]
    # ties broken by value: y before z at count 3
    assert out == [("x", 5), ("y", 3), ("z", 3)]


def test_approx_top_k_bounds_candidates(rows):
    df = rows([(str(i % 7),) for i in range(70)], "v string") \
        .repartition(2)
    out = agg.approx_top_k(df, "v", k=2, m=3)
    got = out.collect()
    assert len(got) == 2
    # with m=3 < 7 distinct per partition the counts are estimates,
    # but the top value still surfaces
    assert got[0]["est_count"] >= got[1]["est_count"]


def test_approx_top_tokens_matches_explode_plan(rows):
    """The fused tokenize-in-Arrow variant must agree with
    explode(split)+approx_top_k — same tokenization (single-space
    split, empties dropped, lowercased), same sketch — both in the
    exact regime and through the eviction path (small m)."""
    docs = [("Alpha beta  GAMMA alpha",), ("beta alpha\tx y",),
            (None,), ("",), ("alpha beta gamma delta epsilon zeta",)]
    df = rows(docs, "text string").repartition(2)
    toks = df.select(F.explode(F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != ""))
        .alias("tok"))
    for m in (100, 3):
        want = [(r["value"], r["est_count"]) for r in
                agg.approx_top_k(toks, "tok", k=4, m=m).collect()]
        got = [(r["value"], r["est_count"]) for r in
               agg.approx_top_tokens(df, "text", k=4, m=m).collect()]
        assert got == want, (m, got, want)
    # exact regime sanity: alpha=3/beta=3 tie broken by value, and the
    # tab stays inside the "alpha\tx" token (single-space split only)
    assert [(r["value"], r["est_count"]) for r in
            agg.approx_top_tokens(df, "text", k=2, m=100).collect()
            ] == [("alpha", 3), ("beta", 3)]


def test_top_k_by_key_ranks_reduced_counts(rows):
    data = ([("a", "x")] * 3 + [("a", "y")] * 2 + [("a", "z")]
            + [("b", "q")] * 2)
    df = rows(data, "k string, v string")
    out = {(r["k"], r["rank"]): (r["v"], r["n"]) for r in
           agg.top_k_by_key(df, ["k"], "v", k=2).collect()}
    assert out[("a", 1)] == ("x", 3)
    assert out[("a", 2)] == ("y", 2)
    assert out[("b", 1)] == ("q", 2)
    assert ("a", 3) not in out  # z cut by k=2


def test_share_of_total(rows):
    df = rows([("a", 10.0), ("a", 20.0), ("b", 70.0)],
              "k string, v double")
    out = {r["k"]: (r["value"], r["share"]) for r in
           agg.share_of_total(df, ["k"], F.sum("v")).collect()}
    assert out["a"] == (30.0, 0.3)
    assert out["b"] == (70.0, 0.7)


def test_uniq_states_merge_equals_direct(rows):
    """uniqState/uniqMerge contract: merging per-batch HLL states gives
    EXACTLY the estimate of sketching all data at once (lossless
    union), and tracks the true distinct count closely."""
    b1 = rows([("a", i) for i in range(50)] + [("b", 1)], "k string, v int")
    b2 = rows([("a", i) for i in range(25, 75)] + [("b", 2)],
              "k string, v int")
    s1 = agg.uniq_state(b1, ["k"], ["v"])
    s2 = agg.uniq_state(b2, ["k"], ["v"])
    merged = {r["k"]: r["v_uniq"] for r in
              agg.uniq_merge(s1.unionByName(s2), ["k"], ["v"]).collect()}
    direct = {r["k"]: r["v_uniq"] for r in
              agg.uniq_merge(agg.uniq_state(b1.unionByName(b2), ["k"],
                                            ["v"]), ["k"], ["v"]).collect()}
    assert merged == direct                  # lossless union
    assert abs(merged["a"] - 75) <= 4        # ~2% error at lg_k=12
    assert merged["b"] == 2


def test_space_saving_state_is_hard_bounded():
    """Cardinality >> m: the sketch never stores more than m counters,
    every stored count is an upper bound on the true count, and the
    heavy hitter survives with overestimate <= mass/m."""
    import pandas as pd

    from bi_etl_and_integration_spark.operators.aggregate import (
        _space_saving_update)

    rng = __import__("random").Random(7)
    m = 50
    true = {}
    state, floor = None, 0
    for _ in range(40):  # 40 "batches" of a long-tailed stream
        vals = (["hot"] * 30
                + [f"v{rng.randrange(5000)}" for _ in range(200)])
        for v in vals:
            true[v] = true.get(v, 0) + 1
        vc = pd.Series(vals).value_counts()
        state, floor = _space_saving_update(state, floor, vc, m)
        assert len(state) <= m
    mass = sum(true.values())
    assert "hot" in state.index  # freq 1200 >> mass/m = 184
    for v, est in state.items():
        assert est >= true.get(v, 0)  # overestimate invariant
        assert est - true.get(v, 0) <= mass / m + 1


def test_approx_top_k_high_cardinality_partition(rows):
    """End-to-end: 4000 distinct values per partition with m=64 —
    the old Counter held all 4000; space-saving holds 64 and still
    surfaces the heavy value first."""
    data = [("hot",)] * 500 + [(f"v{i}",) for i in range(4000)]
    df = rows(data, "v string").coalesce(1)
    got = agg.approx_top_k(df, "v", k=1, m=64).collect()
    assert got[0]["value"] == "hot"
    assert got[0]["est_count"] >= 500  # space-saving overestimates


def test_share_of_total_rejects_non_reaggregatable(rows):
    df = rows([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="re-aggregatable"):
        agg.share_of_total(df, ["k"], F.avg("v"))


def test_cohort_retention_weekly(rows):
    import datetime as dt
    from bi_etl_and_integration_spark.operators.aggregate import (
        cohort_retention)
    # weeks of 2024-01: W1 starts Mon Jan 1, W2 Jan 8, W3 Jan 15
    data = [
        (1, dt.datetime(2024, 1, 2)),    # u1 cohort W1
        (1, dt.datetime(2024, 1, 9)),    # active W2 (offset 1)
        (2, dt.datetime(2024, 1, 3)),    # u2 cohort W1
        (2, dt.datetime(2024, 1, 17)),   # active W3 (offset 2)
        (3, dt.datetime(2024, 1, 10)),   # u3 cohort W2, only W2
    ]
    df = rows(data, "user_id long, ts timestamp")
    out = {(str(r["cohort"]), r["period_offset"]): r["n_users"]
           for r in cohort_retention(df).collect()}
    assert out == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-01", 2): 1, ("2024-01-08", 0): 1}


def test_period_over_period_deltas(rows):
    import datetime as dt
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        period_over_period)
    df = rows([("a", dt.datetime(2024, 1, 2), 10.0),
               ("a", dt.datetime(2024, 1, 3), 10.0),
               ("a", dt.datetime(2024, 1, 10), 30.0),
               ("a", dt.datetime(2024, 1, 16), 0.0),
               ("a", dt.datetime(2024, 1, 23), 5.0)],
              "g string, ts timestamp, v double")
    out = {(r["g"], str(r["period"])): r for r in period_over_period(
        df, "ts", F.sum("v"), grain="week", by=["g"]).collect()}
    w1 = out[("a", "2024-01-01")]
    assert w1["value"] == 20.0 and w1["prev_value"] is None \
        and w1["pct_change"] is None
    w2 = out[("a", "2024-01-08")]
    assert w2["delta"] == 10.0 and abs(w2["pct_change"] - 0.5) < 1e-12
    w4 = out[("a", "2024-01-22")]
    assert w4["pct_change"] is None          # prev == 0: no division


def test_retention_anchor_gated(rows):
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        retention)
    import pytest
    df = rows([(1, "view"), (1, "click"),
               (2, "click"),                    # no anchor -> all False
               (3, "view")],
              "user_id long, event_type string")
    out = {r["user_id"]: (r["r_view"], r["r_click"]) for r in retention(
        df, [("view", F.col("event_type") == "view"),
             ("click", F.col("event_type") == "click")]).collect()}
    assert out == {1: (True, True), 2: (False, False),
                   3: (True, False)}
    with pytest.raises(ValueError, match="no conditions"):
        retention(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        retention(df, [("a", F.lit(True)), ("a", F.lit(False))])


def test_sum_map_keywise(rows):
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        sum_map)
    df = rows([("g1", "a", 1), ("g1", "a", 2), ("g1", "b", 5),
               ("g2", "b", 7)],
              "g string, k string, v long")
    out = {r["g"]: (r["map_keys"], r["map_vals"], r["summed_map"])
           for r in sum_map(df, ["g"], "k", F.sum("v")).collect()}
    assert out["g1"][0] == ["a", "b"] and out["g1"][1] == [3, 5]
    assert out["g1"][2] == {"a": 3, "b": 5}
    assert out["g2"][0] == ["b"] and out["g2"][1] == [7]


def test_with_totals_detail_plus_grand_total(rows):
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        with_totals)
    import pytest
    df = rows([("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
              "k1 string, k2 string, v long")
    out = with_totals(df, ["k1", "k2"],
                      {"s": F.sum("v")}).collect()
    detail = {(r["k1"], r["k2"]): r["s"] for r in out if not r["is_total"]}
    totals = [r for r in out if r["is_total"]]
    assert detail == {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 4}
    # exactly ONE total row, keys NULL, no intermediate subtotals
    assert len(totals) == 1 and len(out) == 4
    assert totals[0]["k1"] is None and totals[0]["s"] == 7
    with pytest.raises(ValueError, match="grouping keys"):
        with_totals(df, [], {"s": F.sum("v")})


def test_percentiles_weighted_repeated_value_semantics(rows):
    from bi_etl_and_integration_spark.operators.aggregate import (
        percentiles)
    import pytest
    df = rows([("g", 10.0, 1), ("g", 20.0, 3), ("g", 30.0, 2)],
              "k string, v double, w long")
    out = percentiles(df, ["k"], "v", [0.5, 0.9],
                      weight_col="w").collect()[0]
    # expansion 10,20,20,20,30,30: p50 -> 20, p90 -> 30
    assert out["p50"] == 20.0 and out["p90"] == 30.0
    with pytest.raises(ValueError, match="approx=False"):
        percentiles(df, ["k"], "v", [0.5], approx=True, weight_col="w")


def test_percentiles_weighted_guards_bad_weights(rows):
    """Fractional / non-positive weights must fail LOUDLY, not silently
    truncate the frequency; BIGINT weights beyond 2^31 must work."""
    from pyspark.sql.utils import CapturedException
    from bi_etl_and_integration_spark.operators.aggregate import (
        percentiles)
    import pytest
    frac = rows([("g", 10.0, 1.5)], "k string, v double, w double")
    with pytest.raises(CapturedException,
                       match="positive integer"):
        percentiles(frac, ["k"], "v", [0.5], weight_col="w").collect()
    neg = rows([("g", 10.0, -2)], "k string, v double, w long")
    with pytest.raises(CapturedException,
                       match="positive integer"):
        percentiles(neg, ["k"], "v", [0.5], weight_col="w").collect()
    big = rows([("g", 10.0, 2**33), ("g", 20.0, 2**33 + 2)],
               "k string, v double, w long")
    out = percentiles(big, ["k"], "v", [0.5],
                      weight_col="w").collect()[0]
    assert out["p50"] == pytest.approx(20.0)  # heavier value wins


def test_topn_others_rolls_tail(rows):
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        topn_others)
    df = rows([("a", 10), ("a", 10), ("b", 15), ("c", 5), ("d", 3),
               ("e", 2)],
              "k string, v long")
    out = {r["k"]: r["value"] for r in topn_others(
        df, "k", F.sum("v"), n=2).collect()}
    # totals: a=20, b=15, c=5, d=3, e=2 -> top2 = a,b; other = 10
    assert out == {"a": 20, "b": 15, "other": 10}


def test_topn_others_label_collision_rejected(rows):
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.aggregate import (
        topn_others)
    import pytest
    df = rows([("other", 100), ("a", 1)], "k string, v long")
    # lazy in-plan guard: raises at evaluation, never a second eager
    # scan at call time
    with pytest.raises(Exception, match="others_label"):
        topn_others(df, "k", F.sum("v"), n=1).collect()
    out = {r["k"]: r["value"] for r in topn_others(
        df, "k", F.sum("v"), n=1, others_label="__tail").collect()}
    assert out == {"other": 100, "__tail": 1}


def test_with_totals_merge_path_matches_rollup(rows, spark):
    """The algebraic merge fast path must produce the same rows as the
    rollup path — and plan WITHOUT an Expand node (the rollup path
    duplicates every input row once per kept level; merge re-aggregates
    the |groups|-row result instead)."""
    from bi_etl_and_integration_spark import plans
    df = rows([("a", 1), ("a", 2), ("b", 3), (None, 4)],
              "k string, v long")
    aggs = {"s": F.sum("v"), "n": F.count(F.lit(1)).cast("bigint")}
    roll = agg.with_totals(df, ["k"], aggs)
    merged = agg.with_totals(df, ["k"], aggs,
                             merge={"s": F.sum("s"),
                                    "n": F.sum("n").cast("bigint")})
    key = lambda r: (r["is_total"], r["k"] or "")  # noqa: E731
    assert sorted([tuple(r) for r in roll.collect()], key=lambda t: (t[-1], t[0] or "")) \
        == sorted([tuple(r) for r in merged.collect()], key=lambda t: (t[-1], t[0] or ""))
    assert "Expand" not in plans.formatted_plan(merged)
    assert "Expand" in plans.formatted_plan(roll)
    # merge must cover every output column, and only known ones
    with pytest.raises(ValueError, match="cover every"):
        agg.with_totals(df, ["k"], aggs, merge={"s": F.sum("s")})
    with pytest.raises(ValueError, match="unknown"):
        agg.with_totals(df, ["k"], aggs,
                        merge={"s": F.sum("s"), "n": F.sum("n"),
                               "zz": F.sum("n")})


def test_with_totals_merge_empty_input_documented_nulls(rows, spark):
    """Pins the documented empty-input nuance: rollup (a grouped
    aggregate) emits NO rows, while the merge path's totals leg is a
    GLOBAL aggregate and emits one totals row with NULL merged values
    — callers who care coalesce in the merge exprs."""
    df = rows([("a", 1)], "k string, v long").where(F.lit(False))
    aggs = {"s": F.sum("v"), "n": F.count(F.lit(1)).cast("bigint")}
    merged = agg.with_totals(df, ["k"], aggs,
                             merge={"s": F.sum("s"),
                                    "n": F.sum("n").cast("bigint")}).collect()
    assert len(merged) == 1 and merged[0]["is_total"]
    assert merged[0]["s"] is None and merged[0]["n"] is None
    assert agg.with_totals(df, ["k"], aggs).collect() == []
