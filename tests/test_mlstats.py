"""Property tests for mlstats operators: reference-implementation
parity (pandas/scipy-free closed forms) beyond the DuckDB hash gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_auc_matches_pandas_rank_reference(spark):
    from catenae_kafka_spark.operators.mlstats import q_auc_rank

    got = q_auc_rank(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    s = np.floor(ev["value"] * 100 + 0.5)
    y = (ev["event_type"] == "purchase").astype(int)
    # Mann-Whitney with average ranks for ties
    ranks = pd.Series(s).rank(method="average")
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert abs(got["auc"] - auc) < 1e-12
    assert 0.0 <= got["auc"] <= 1.0


def test_gini_bounds_and_pandas_reference(spark):
    from catenae_kafka_spark.operators.mlstats import q_gini

    got = q_gini(spark, SF).toPandas().set_index("o_orderpriority")["gini"]
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).toPandas()
    orders["c"] = np.floor(orders["o_totalprice"] * 100 + 0.5)
    for prio, grp in orders.groupby("o_orderpriority"):
        x = np.sort(grp["c"].to_numpy())
        n = len(x)
        ref = (2 * np.sum((np.arange(1, n + 1)) * x)) / (n * x.sum()) - (
            n + 1
        ) / n
        assert abs(got[prio] - ref) < 1e-12
        assert 0.0 <= got[prio] < 1.0


def test_transition_matrix_rows_sum_to_one(spark):
    from catenae_kafka_spark.operators.mlstats import q_transition_matrix

    tm = q_transition_matrix(spark, SF).toPandas()
    mass = tm.groupby("cur")["prob"].sum()
    assert np.allclose(mass.to_numpy(), 1.0, atol=1e-12)
    # counts conserve: total transitions = total events - users
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert tm["n"].sum() == n_events - n_users


def test_ab_ttest_welch_reference(spark):
    from catenae_kafka_spark.operators.mlstats import q_ab_ttest

    got = q_ab_ttest(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    c = np.floor(ev["value"] * 100 + 0.5) / 100.0
    a = c[ev["event_type"] == "click"].to_numpy()
    b = c[ev["event_type"] == "view"].to_numpy()
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se)
    dof = se**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["t_stat"] - round(t, 6)) < 1e-6
    assert abs(got["dof"] - round(dof, 4)) < 1e-3


def test_stream_anomaly_matches_pandas_fold(spark):
    """The streaming prequential fold must equal a sequential pandas
    replay of the same integer-state recurrence."""
    import math

    from catenae_kafka_spark.streaming.queries import q_stream_anomaly

    got = (
        q_stream_anomaly(spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    for uid, grp in ev.groupby("user_id"):
        n = s = ss = anom = 0
        for v in grp["value"]:
            c = int(math.floor(float(v) * 100 + 0.5))
            if n >= 10:
                mean = float(s) / n
                var = (float(ss) - float(s) * s / n) / (n - 1)
                d = c - mean
                if var > 0 and d * d > 9.0 * var:
                    anom += 1
            n += 1
            s += c
            ss += c * c
        assert got.loc[uid, "n_events"] == n
        assert got.loc[uid, "n_anomalies"] == anom, uid


def test_ks_statistic_bounds_and_scipy_free_reference(spark):
    import numpy as np

    from catenae_kafka_spark.operators.mlstats import q_ks_statistic

    got = q_ks_statistic(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    a = np.sort(np.floor(ev.loc[ev.event_type == "click", "value"] * 100 + 0.5))
    b = np.sort(np.floor(ev.loc[ev.event_type == "view", "value"] * 100 + 0.5))
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    ks = np.abs(fa - fb).max()
    assert abs(got["ks_stat"] - ks) < 1e-12
    assert 0.0 <= got["ks_stat"] <= 1.0


def test_survival_km_is_monotone_nonincreasing(spark):
    from catenae_kafka_spark.operators.mlstats import q_survival_km

    km = q_survival_km(spark, SF).toPandas().sort_values("t_days")
    s = km["survival"].to_numpy()
    assert (s[1:] <= s[:-1] + 1e-12).all()
    assert (s > 0).all() and (s <= 1.0).all()
    # risk-set bookkeeping: deaths+censored along the curve = all users
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert (km["n_deaths"] + km["n_censored"]).sum() == n_users


def test_bootstrap_ci_brackets_the_sample_mean(spark):
    import numpy as np

    from catenae_kafka_spark.operators.mlstats import q_bootstrap_ci

    got = q_bootstrap_ci(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    mean = (
        np.floor(ev.loc[ev.event_type == "purchase", "value"] * 100 + 0.5)
        / 100.0
    ).mean()
    assert got["ci_lo"] <= got["ci_hi"]
    assert got["ci_lo"] <= mean <= got["ci_hi"]
    assert got["n_replicates"] == 20


def test_winsorize_only_moves_tails(spark):
    from catenae_kafka_spark.operators.analytics import q_winsorize

    w = q_winsorize(spark, SF).toPandas()
    clipped = w[w["was_clipped"]]
    kept = w[~w["was_clipped"]]
    assert (kept["winsorized"] == kept["value"].round(4)).all()
    assert len(clipped) > 0
    # ~10% of rows clipped at p5/p95 fences
    assert 0.02 < len(clipped) / len(w) < 0.2
