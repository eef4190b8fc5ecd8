"""Semantic checks for the product-analytics composites (plans/analytics_q.py)
beyond registry hash-parity: conservation laws and pandas/numpy cross-checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_cohort_retention_anchors_at_100(spark):
    out = REGISTRY["events_cohort_retention"].fn(spark, SF).toPandas()
    anchor = out[out["week_offset"] == 0]
    # every cohort has an offset-0 row at exactly 100%
    assert set(anchor["cohort_week"]) == set(out["cohort_week"])
    assert (anchor["retention_pct"] == 100.0).all()
    # offset-0 cohort sizes partition the distinct-user universe
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert int(anchor["n_users"].sum()) == n_users
    # retention never exceeds the cohort anchor
    assert (out["retention_pct"] <= 100.0).all()


def test_twap_matches_pandas_on_one_user_day(spark):
    out = REGISTRY["events_twap"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").select("user_id", "ts", "value", "event_id").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    # pick the busiest user-day and recompute the step-function average
    busiest = ev.groupby(["user_id", "day"]).size().idxmax()
    g = ev[(ev["user_id"] == busiest[0]) & (ev["day"] == busiest[1])].sort_values(
        ["ts", "event_id"]
    )
    dt = (g["ts"].shift(-1) - g["ts"]).dt.total_seconds().iloc[:-1]
    expect = float((g["value"].iloc[:-1] * dt.values).sum() / dt.sum())
    got = out[(out["user_id"] == busiest[0]) & (out["day"] == busiest[1])]
    assert len(got) == 1
    assert abs(float(got["twap"].iloc[0]) - expect) < 1e-4
    assert int(got["n_events"].iloc[0]) == len(g) - 1


def test_attribution_conserves_matched_purchase_value(spark):
    out = REGISTRY["attribution_linear_touch"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).toPandas()
    p = ev[ev["event_type"] == "purchase"]
    c = ev[ev["event_type"] == "click"]
    matched_value = 0.0
    n_matched = 0
    for _, row in p.iterrows():
        lo = row["ts"] - pd.Timedelta(minutes=30)
        hit = c[(c["user_id"] == row["user_id"]) & (c["ts"] <= row["ts"]) & (c["ts"] > lo)]
        if len(hit):
            matched_value += row["value"]
            n_matched += 1
    # linear credit conserves each matched purchase's full value
    assert abs(float(out["attributed_value"].sum()) - matched_value) < 0.05
    assert int(out["n_purchases"].sum()) == n_matched


def test_welch_ttest_matches_numpy(spark):
    row = REGISTRY["agg_ab_welch_ttest"].fn(spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").select("event_type", "value").toPandas()
    a = ev[ev["event_type"] == "click"]["value"].to_numpy()
    b = ev[ev["event_type"] == "purchase"]["value"].to_numpy()
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se)
    df = se**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
    assert abs(float(row["t_stat"]) - t) < 1e-4
    assert abs(float(row["welch_df"]) - df) < 1e-2


def test_rolling_median_matches_pandas(spark):
    out = (
        REGISTRY["window_rolling_median"].fn(spark, SF).toPandas().sort_values(
            ["user_id", "event_id"]
        )
    )
    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_id", "value").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect = (
        ev.groupby("user_id")["value"]
        .rolling(5, min_periods=1)
        .median()
        .reset_index(level=0)
        .sort_index()
    )
    ev["med"] = expect["value"]
    m = out.merge(ev[["user_id", "event_id", "med"]], on=["user_id", "event_id"])
    assert len(m) == len(out)
    assert np.allclose(m["rolling_median_5"], m["med"], atol=1e-6)


def test_equidepth_tiles_balance_and_order(spark):
    out = REGISTRY["agg_equidepth_histogram"].fn(spark, SF).toPandas()
    for et, g in out.groupby("event_type"):
        g = g.sort_values("tile")
        assert list(g["tile"]) == [1, 2, 3, 4]
        # equi-depth: tile sizes differ by at most 1
        assert g["n"].max() - g["n"].min() <= 1
        # value ranges are ordered (ties may touch, never invert)
        assert (g["lo"] <= g["hi"]).all()
        assert (g["hi"].values[:-1] <= g["lo"].values[1:]).all()


def test_pmi_matches_counter_recompute(spark):
    out = REGISTRY["docs_pmi_collocations"].fn(spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").select("text").toPandas()
    from collections import Counter
    import math

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs["text"]:
        toks = t.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    scored = sorted(
        (
            (round(math.log(total * c / (uni[a] * uni[b])), 6), a, b, c)
            for (a, b), c in bi.items()
            if c >= 5
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:20]
    assert len(out) == len(scored)
    for row, (pmi, a, b, c) in zip(out.itertuples(index=False), scored):
        assert (row.w1, row.w2, row.pair_count) == (a, b, c)
        assert abs(row.pmi - pmi) < 1e-6


def test_hierarchical_rollup_grains_conserve(spark):
    out = REGISTRY["events_hierarchical_rollup"].fn(spark, SF).toPandas()
    raw_n = load_table(spark, SF, "events").count()
    for grain in ("hour", "day", "month"):
        g = out[out["grain"] == grain]
        assert int(g["n"].sum()) == raw_n
    # value totals agree across grains to the cent
    tv = out.groupby("grain")["total_value"].sum()
    assert abs(tv["hour"] - tv["day"]) < 1e-6
    assert abs(tv["day"] - tv["month"]) < 1e-6
    # coarser grains have no more rows than finer ones
    counts = out.groupby("grain").size()
    assert counts["month"] <= counts["day"] <= counts["hour"]


def test_banded_range_join_equals_naive(spark):
    """banded_range_join must produce exactly the pairs the naive
    condition-join produces (each pair meets in exactly one band)."""
    from transilien_api_etl_spark.operators.joins import banded_range_join

    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    banded = {
        (r.pid, r.cid)
        for r in banded_range_join(p, c, "pts", "cts", -300, 0).select("pid", "cid").collect()
    }
    naive = {
        (r.pid, r.cid)
        for r in p.join(
            c,
            (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 300 SECONDS"))
            & (F.col("cts") <= F.col("pts")),
        ).select("pid", "cid").collect()
    }
    assert banded == naive and len(banded) > 0


def test_banded_range_join_plans_equi_join(spark):
    """The whole point: the banded form is a hash/sort-merge equi join,
    never a nested loop."""
    import contextlib
    import io

    from transilien_api_etl_spark.operators.joins import banded_range_join

    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(F.col("ts").alias("cts"))
    df = banded_range_join(p, c, "pts", "cts", -300, 0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_zscore_matches_pandas_recompute(spark):
    out = REGISTRY["events_anomaly_zscore"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_id", "value").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["yc"] = (ev["value"] * 100).round().astype("int64")
    g = ev.groupby("user_id")["yc"]
    roll = g.rolling(21, min_periods=1)
    # trailing-20 EXCLUDING current row = shift the rolling stats by 1
    ev["n"] = g.transform(lambda s: s.rolling(20, min_periods=1).count().shift(1))
    ev["mu"] = g.transform(lambda s: s.rolling(20, min_periods=1).mean().shift(1))
    ev["sd"] = g.transform(lambda s: s.rolling(20, min_periods=1).std(ddof=1).shift(1))
    m = ev[(ev["n"] >= 5) & (ev["sd"] > 0)]
    m = m.assign(z=(m["yc"] - m["mu"]) / m["sd"]).merge(
        out[["event_id", "zscore"]], on="event_id"
    )
    assert len(m) == len(out)
    import numpy as np

    assert np.allclose(m["z"], m["zscore"], atol=1e-4)
    # anomalies are rare on this distribution
    assert 0 <= out["is_anomaly"].mean() < 0.05


def test_token_entropy_bounds_and_counter_recompute(spark):
    out = REGISTRY["docs_token_entropy"].fn(spark, SF).toPandas()
    import math
    from collections import Counter

    docs = load_table(spark, SF, "documents").select("doc_id", "text").toPandas()
    # entropy bounded by ln(distinct); uniform doc hits the bound
    assert (out["entropy"] >= -1e-9).all()
    assert (out["entropy"] <= (out["n_distinct"].map(math.log)) + 1e-5).all()
    row = out.iloc[0]
    toks = docs[docs["doc_id"] == row["doc_id"]]["text"].iloc[0].split(" ")
    c = Counter(toks)
    n = sum(c.values())
    h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
    assert abs(row["entropy"] - h) < 1e-6


def test_pareto_abc_invariants(spark):
    out = REGISTRY["orders_pareto_abc"].fn(spark, SF).toPandas().set_index("abc_class")
    # shares partition the revenue
    assert abs(out["share"].sum() - 1.0) < 1e-4
    # cut-point semantics: A stops at <=80% (+ one customer of overshoot)
    assert out.loc["A", "share"] <= 0.80 + 0.01
    # ranking mechanics: mean revenue per customer strictly decreases
    # down the classes regardless of how Pareto-shaped the data is
    mean = out["revenue"] / out["n_customers"]
    assert mean.loc["A"] > mean.loc["B"] > mean.loc["C"]


def test_streaks_match_pandas_recompute(spark):
    out = REGISTRY["events_activity_streaks"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").select("user_id", "ts").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"]))
        streaks = []
        start = days[0]
        ln = 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                ln += 1
            else:
                streaks.append((ln, start))
                start, ln = b, 1
        streaks.append((ln, start))
        best = sorted(streaks, key=lambda s: (-s[0], s[1]))[0]
        row = out[out["user_id"] == uid].iloc[0]
        assert row["longest_streak"] == best[0]
        assert row["streak_start"] == best[1]
        assert row["n_streaks"] == len(streaks)


def test_mom_growth_identity(spark):
    out = REGISTRY["orders_mom_growth"].fn(spark, SF).toPandas()
    # delta/prev identity: growth_pct == delta / (revenue - delta) * 100
    prev = out["revenue"] - out["delta"]
    import numpy as np

    assert np.allclose(out["growth_pct"], out["delta"] / prev * 100, atol=1e-3)


def test_rfm_scores_partition_users_evenly(spark):
    out = REGISTRY["events_rfm_segments"].fn(spark, SF).toPandas()
    n_users = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert int(out["n_users"].sum()) == n_users
    # segment codes are three tercile digits
    assert out["segment"].str.fullmatch("[123]{3}").all()
    # each R tercile holds a third of users (±1 per ntile contract)
    r1 = out[out["segment"].str.startswith("1")]["n_users"].sum()
    r3 = out[out["segment"].str.startswith("3")]["n_users"].sum()
    assert abs(int(r1) - int(r3)) <= 1


def test_gini_matches_numpy_recompute(spark):
    row = REGISTRY["orders_gini_revenue"].fn(spark, SF).first()
    o = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice").toPandas()
    import numpy as np

    cents = (
        (o.groupby("o_custkey")["o_totalprice"].sum() * 100).round().astype("int64")
    )
    x = np.sort(cents.to_numpy())
    n = len(x)
    gini = 2 * np.sum((np.arange(1, n + 1)) * x) / (n * x.sum()) - (n + 1) / n
    assert int(row["n"]) == n
    assert abs(float(row["gini"]) - gini) < 1e-6
    assert 0 <= row["gini"] < 1


def test_autocorr_matches_numpy_recompute(spark):
    out = REGISTRY["events_autocorr_lag1"].fn(spark, SF).toPandas()
    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_id", "value").toPandas()
    import numpy as np

    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["xc"] = (ev["value"] * 100).round().astype("int64")
    for uid, g in list(ev.groupby("user_id"))[:20]:
        x = g["xc"].to_numpy().astype(float)
        if len(x) < 10:
            assert uid not in set(out["user_id"])
            continue
        mu = x.mean()
        r1 = np.sum((x[:-1] - mu) * (x[1:] - mu)) / np.sum((x - mu) ** 2)
        row = out[out["user_id"] == uid]
        assert len(row) == 1
        assert abs(float(row["r1"].iloc[0]) - r1) < 1e-4
    # lag-1 autocorrelation is bounded
    assert (out["r1"].abs() <= 1.0 + 1e-6).all()


def test_changepoint_finds_planted_shift(spark):
    """On a crafted series with a hard mean shift, the split must land on
    the true boundary with the max score."""
    import datetime as dt

    from transilien_api_etl_spark.plans.registry import REGISTRY as R

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 999, "click", 10.0 if i < 30 else 50.0, "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory(prefix="cp-") as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = R["events_changepoint_binary"].fn(spark, d).toPandas()
    assert len(out) == 1
    assert int(out["split_k"].iloc[0]) == 30
    assert float(out["score"].iloc[0]) > 10


def test_basket_lift_matches_counter_recompute(spark):
    out = REGISTRY["orders_basket_lift"].fn(spark, SF).toPandas()
    b = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    from collections import Counter
    from itertools import combinations

    item = Counter(b["l_partkey"])
    n_orders = b["l_orderkey"].nunique()
    pairs: Counter = Counter()
    for _, g in b.groupby("l_orderkey"):
        for a, c in combinations(sorted(g["l_partkey"]), 2):
            pairs[(a, c)] += 1
    scored = sorted(
        (
            (round(cab * n_orders / (item[a] * item[c]), 6), a, c, cab)
            for (a, c), cab in pairs.items()
            if cab >= 2
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:15]
    assert len(out) == len(scored)
    for row, (lift, a, c, cab) in zip(out.itertuples(index=False), scored):
        assert (row.pa, row.pb, row.pair_count) == (a, c, cab)
        assert abs(row.lift - lift) < 1e-6


def test_kaplan_meier_invariants(spark):
    out = REGISTRY["events_kaplan_meier"].fn(spark, SF).toPandas()
    assert len(out) > 0
    # survival is a non-increasing step function in (0, 1]
    assert (out["survival"] > 0).all() and (out["survival"] <= 1.0).all()
    assert (out["survival"].diff().dropna() <= 1e-9).all()
    # at-risk counts shrink as duration grows; events never exceed risk set
    assert (out["n_risk"].diff().dropna() < 0).all()
    assert (out["n_churned"] if "n_churned" in out else out["n_completed"]).le(
        out["n_risk"]
    ).all()
    # product form: S(t_i) == S(t_{i-1}) * (1 - d_i / n_i)
    import numpy as np

    d = out["n_completed"].to_numpy(dtype=float)
    n = out["n_risk"].to_numpy(dtype=float)
    expect = np.cumprod(1 - d / n)
    assert np.allclose(out["survival"], expect, atol=1e-5)
