"""Independent formula audit for the late round-3 statistical queries.

The oracle-parity harness proves Spark == DuckDB, but both sides share one
author — a formula error repeated in the oracle passes parity while computing
the wrong statistic (exactly how the q_lttb_downsample sign error survived:
ADVICE.md round 3). These tests close that gap: each recomputes the query's
documented statistic from raw fixture rows with an INDEPENDENT scalar
implementation (plain Python / Fraction, no SQL) and compares it against the
registered DuckDB oracle output. Chain of evidence: sweep proves
Spark == oracle; this file proves oracle == textbook formula.

Pure-DuckDB tests — no SparkSession, so they run in milliseconds.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pytest

from catenae_kafka_spark.catalog import TABLES, table_path
from catenae_kafka_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    c = duckdb.connect()
    for name in TABLES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, name)}')"
        )
    return c


def oracle_df(con, name):
    return con.execute(all_specs()[name].oracle).df()


def daily_rev(con):
    return con.execute(
        """SELECT CAST(o_orderdate AS DATE) AS day,
                  CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def test_runs_test_matches_wald_wolfowitz(con):
    rows = daily_rev(con)
    revs = [int(r[1]) for r in rows]
    n = len(revs)
    # lower median: rank (n+1)//2 of the series sorted by (rev, day)
    m = sorted(revs)[(n + 1) // 2 - 1]
    s = [1 if r > m else 0 for r in revs]  # day order
    n1, n0 = sum(s), n - sum(s)
    r = 1 + sum(1 for i in range(1, n) if s[i] != s[i - 1])
    mu_micro = (2 * n1 * n0 * 10**6) // n + 10**6
    var_micro = (2 * n1 * n0 * (2 * n1 * n0 - n) * 10**6) // (n * n * (n - 1))
    sigma_micro = math.floor(math.sqrt(float(var_micro * 10**6)))
    z_micro = math.floor(float((r * 10**6 - mu_micro) * 10**6) / sigma_micro)
    got = oracle_df(con, "q_runs_test").iloc[0]
    assert int(got["n_days"]) == n
    assert int(got["n_above"]) == n1
    assert int(got["n_below"]) == n0
    assert int(got["runs"]) == r
    assert int(got["mu_micro"]) == mu_micro
    assert int(got["var_micro"]) == var_micro
    assert int(got["sigma_micro"]) == sigma_micro
    assert int(got["z_micro"]) == z_micro
    # sanity vs the float textbook statistic
    mu = 2 * n1 * n0 / n + 1
    var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
    assert abs(z_micro / 1e6 - (r - mu) / math.sqrt(var)) < 1e-3


def test_levene_matches_brown_forsythe(con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, q in rows:
        groups.setdefault(g, []).append(int(q))
    # documented: lower median (first value whose cumulative count
    # reaches (n_g+1)//2), exact integer deviations
    zs: dict[str, list[int]] = {}
    for g, vals in groups.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1]
        zs[g] = [abs(v - med) for v in vals]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    # exact Brown-Forsythe one-way ANOVA on z, as Fractions
    tot = Fraction(sum(sum(v) for v in zs.values()), n)
    ss_b = sum(
        Fraction(len(v)) * (Fraction(sum(v), len(v)) - tot) ** 2
        for v in zs.values()
    )
    ss_w = sum(
        sum((Fraction(x) - Fraction(sum(v), len(v))) ** 2 for x in v)
        for v in zs.values()
    )
    f_stat = (ss_b / (k - 1)) / (ss_w / (n - k))
    got = oracle_df(con, "q_levene_test").iloc[0]
    assert int(got["n_groups"]) == k
    assert int(got["n_total"]) == n
    # ss_between / ss_within use the floored (s*s) div n identity —
    # within 1 of the exact rational values per group term
    assert abs(int(got["ss_between"]) - float(ss_b)) <= k + 1
    assert abs(int(got["ss_within"]) - float(ss_w)) <= k + 1
    assert abs(int(got["f_micro"]) / 1e6 - float(f_stat)) < 1e-3


def test_brier_decomposition_matches_murphy(con):
    rows = con.execute(
        """SELECT CAST(l_quantity AS BIGINT),
                  l_shipdate < TIMESTAMP '1999-01-01',
                  l_returnflag = 'R'
           FROM lineitem"""
    ).fetchall()
    train: dict[int, list[int]] = {}
    ev: dict[int, list[int]] = {}
    for qty, is_train, pos in rows:
        side = train if is_train else ev
        cell = side.setdefault(int(qty), [0, 0])
        cell[0] += 1
        cell[1] += int(pos)
    binned = []  # (n_k, pos_k, p_milli, o_milli) per eval bin with a model
    for qty, (n_k, pos_k) in ev.items():
        if qty not in train:
            continue
        n_t, pos_t = train[qty]
        binned.append(
            (n_k, pos_k, (pos_t * 1000) // n_t, (pos_k * 1000) // n_k)
        )
    n = sum(b[0] for b in binned)
    obar = (sum(b[1] for b in binned) * 1000) // n
    bs = sum(
        n_k * p * p - 2 * p * pos_k * 1000 + pos_k * 10**6
        for n_k, pos_k, p, _ in binned
    )
    rel = sum(n_k * (p - o) ** 2 for n_k, _, p, o in binned)
    res = sum(n_k * (o - obar) ** 2 for n_k, _, _, o in binned)
    unc = n * obar * (1000 - obar)
    got = oracle_df(con, "q_brier_decomposition").iloc[0]
    assert int(got["n_eval"]) == n
    assert int(got["n_bins"]) == len(binned)
    assert int(got["obar_milli"]) == obar
    assert int(got["bs_milli2"]) == bs
    assert int(got["rel_milli2"]) == rel
    assert int(got["res_milli2"]) == res
    assert int(got["unc_milli2"]) == unc
    # Murphy identity BS = REL - RES + UNC holds approximately (floors
    # perturb each term; scaled by n x milli^2)
    assert abs(bs - (rel - res + unc)) < 2 * n * 1000


def test_littles_law_area_and_rates(con):
    rows = con.execute(
        """SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT)
           FROM events ORDER BY user_id, ts, event_id"""
    ).fetchall()
    # sessionize: gap > 7200s starts a new session (per user)
    sessions = []
    cur_u, start, last = None, None, None
    for u, t in rows:
        if u != cur_u or t - last > 7200:
            if cur_u is not None:
                sessions.append((start, last))
            cur_u, start = u, t
        last = t
    sessions.append((start, last))
    n_sessions = len(sessions)
    total_dur = sum(e - s for s, e in sessions)
    horizon = max(e for _, e in sessions) - min(s for s, _ in sessions)
    # independent concurrency integral via event-sorted sweep
    bounds: dict[int, int] = {}
    for s, e in sessions:
        bounds[s] = bounds.get(s, 0) + 1
        bounds[e] = bounds.get(e, 0) - 1
    area = 0
    level = 0
    ts_sorted = sorted(bounds)
    for t, nxt in zip(ts_sorted, ts_sorted[1:]):
        level += bounds[t]
        area += level * (nxt - t)
    got = oracle_df(con, "q_littles_law").iloc[0]
    assert int(got["n_sessions"]) == n_sessions
    assert int(got["total_duration_s"]) == total_dur
    assert int(got["swept_area_s"]) == area == total_dur
    assert bool(got["conservation_ok"])
    assert int(got["lambda_micro"]) == (n_sessions * 10**6) // horizon
    assert int(got["l_micro"]) == (area * 10**6) // horizon
    assert int(got["w_micro"]) == (area * 10**6) // n_sessions


def test_resource_allocation_matches_ra_index(con):
    pairs = con.execute(
        """WITH baskets AS (
             SELECT DISTINCT l_orderkey, p_brand
             FROM lineitem JOIN part ON l_partkey = p_partkey
           )
           SELECT a.p_brand, b.p_brand
           FROM baskets a JOIN baskets b
             ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
           GROUP BY 1, 2 HAVING COUNT(*) >= 80"""
    ).fetchall()
    adj: dict[str, set[str]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            common = adj[a] & adj[b]
            if common:
                expect[(a, b)] = (
                    len(common),
                    sum(10**6 // len(adj[z]) for z in common),
                )
    got = {
        (r["a"], r["b"]): (int(r["common"]), int(r["ra_micro"]))
        for _, r in oracle_df(con, "q_resource_allocation").iterrows()
    }
    assert got == expect


def test_wasserstein_1d_matches_cdf_area(con):
    rows = con.execute(
        """SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           FROM events WHERE event_type IN ('purchase', 'click')"""
    ).fetchall()
    a = sorted(c for t, c in rows if t == "purchase")
    b = sorted(c for t, c in rows if t == "click")
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    # documented: integer micro CDFs on the merged support, |gap| x step
    import bisect

    w1 = 0
    for x, nxt in zip(support, support[1:]):
        fa = (bisect.bisect_right(a, x) * 10**6) // na
        fb = (bisect.bisect_right(b, x) * 10**6) // nb
        w1 += abs(fa - fb) * (nxt - x)
    got = oracle_df(con, "q_wasserstein_1d").iloc[0]
    assert int(got["w1_micro_cents"]) == w1
    assert int(got["n_support"]) == len(support) - 1
    # float sanity: exact W1 between the two samples
    fa = fb = 0.0
    ref = 0.0
    for x, nxt in zip(support, support[1:]):
        fa = bisect.bisect_right(a, x) / na
        fb = bisect.bisect_right(b, x) / nb
        ref += abs(fa - fb) * (nxt - x)
    assert abs(w1 / 1e6 - ref) < 1e-2


def test_eb_shrinkage_matches_moments_estimator(con):
    rows = con.execute(
        """SELECT n_name, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
           FROM customer JOIN nation ON c_nationkey = n_nationkey"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, cents in rows:
        groups.setdefault(g, []).append(int(cents))
    k = len(groups)
    n_tot = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n_tot
    means = {g: sum(v) / len(v) for g, v in groups.items()}
    tau2 = round(
        sum((m - grand) ** 2 for m in means.values()) / (k - 1), 6
    )
    se2 = (
        round(
            sum(
                (len(v) * sum(x * x for x in v) - sum(v) ** 2)
                / (len(v) ** 2 * (len(v) - 1))
                for v in groups.values()
            ),
            6,
        )
        / k
    )
    shrink = tau2 / (tau2 + se2)
    got = oracle_df(con, "q_eb_shrinkage")
    assert len(got) == k
    for _, r in got.iterrows():
        g = r["n_name"]
        assert int(r["n"]) == len(groups[g])
        assert int(r["raw_mean_cents"]) == math.floor(means[g])
        expect = math.floor(shrink * means[g] + (1 - shrink) * grand)
        assert int(r["shrunk_mean_cents"]) == expect
        # shrinkage moves every group TOWARD the grand mean
        assert (
            min(means[g], grand) - 1
            <= int(r["shrunk_mean_cents"])
            <= max(means[g], grand) + 1
        )


def test_regression_discontinuity_matches_ols(con):
    rows = con.execute(
        """SELECT CAST(l_quantity AS BIGINT),
                  CAST(l_returnflag = 'R' AS INT)
           FROM lineitem WHERE l_quantity <> 25"""
    ).fetchall()
    sides = {"below": [], "above": []}
    for x, y in rows:
        sides["below" if x < 25 else "above"].append((int(x), int(y)))
    got = {r["side"]: r for _, r in oracle_df(con, "q_regression_discontinuity").iterrows()}
    for side, pts in sides.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r = got[side]
        assert int(r["n"]) == n
        assert abs(float(r["slope"]) - slope) < 1e-8
        assert abs(float(r["intercept"]) - intercept) < 1e-8
        assert abs(float(r["pred_at_cutoff"]) - (slope * 25 + intercept)) < 1e-5


def test_lttb_matches_scalar_reference(con):
    """Fixed-anchor LTTB: per bucket keep the point maximizing the
    triangle area against the neighbor buckets' mean points (exact
    rational arithmetic), first/last buckets keep first/last point."""
    rows = daily_rev(con)
    n, B = len(rows), 60
    buckets: dict[int, list[tuple[int, int, object]]] = {}
    for i, (d, rev) in enumerate(rows):
        buckets.setdefault(min(i * B // n, B - 1), []).append((i, int(rev), d))
    expect = {}
    for b in sorted(buckets):
        if b == 0:
            pick = buckets[b][0]
        elif b == B - 1:
            pick = buckets[b][-1]
        else:
            prev, nxt = buckets[b - 1], buckets[b + 1]
            ax = Fraction(sum(p[0] for p in prev), len(prev))
            ay = Fraction(sum(p[1] for p in prev), len(prev))
            cx = Fraction(sum(p[0] for p in nxt), len(nxt))
            cy = Fraction(sum(p[1] for p in nxt), len(nxt))
            best = None
            for i, rev, d in buckets[b]:
                a2 = abs((ax - i) * (cy - rev) - (cx - i) * (ay - rev))
                if best is None or a2 > best[0]:
                    best = (a2, (i, rev, d))
            pick = best[1]
        expect[b] = (str(pick[2]), pick[1])
    got = {
        int(r["bucket"]): (r["day"], int(r["rev"]))
        for _, r in oracle_df(con, "q_lttb_downsample").iterrows()
    }
    assert got == expect
