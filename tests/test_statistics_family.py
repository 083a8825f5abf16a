"""Round-10 statistics family: independent Python references for the
rank/drift/concentration rows (KS, Mann-Whitney, Spearman, weighted
median, Gini, PSI, Benford, chi-square, Zipf) and the generalized
Holt-Winters segmented fold.

The oracle sweep already pins Spark == DuckDB; these tests pin both
against a THIRD, hand-rolled implementation of the declared semantics,
so an error shared by the two SQL engines' plans (a wrong formula, a
wrong tie rule) cannot hide.
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

import duckdb


@pytest.fixture(scope="module")
def tables(sf_dir):
    con = duckdb.connect()
    t = {}
    t["orders"] = con.sql(
        f"SELECT * FROM '{sf_dir}/orders.parquet'").fetchall()
    t["orders_cols"] = [d[0] for d in con.sql(
        f"DESCRIBE SELECT * FROM '{sf_dir}/orders.parquet'").fetchall()]
    t["customer"] = {r[0]: r for r in con.sql(
        f"SELECT * FROM '{sf_dir}/customer.parquet'").fetchall()}
    t["nation"] = {r[0]: r[1] for r in con.sql(
        "SELECT n_nationkey, n_name FROM "
        f"'{sf_dir}/nation.parquet'").fetchall()}
    t["lineitem"] = con.sql(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM "
        f"'{sf_dir}/lineitem.parquet'").fetchall()
    return t


def _samples(tables):
    """(segment -> list of (price, is_urgent)) for the two-sample rows."""
    out = defaultdict(list)
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    for row in tables["orders"]:
        pri = row[ic["o_orderpriority"]]
        if pri not in ("1-URGENT", "5-LOW"):
            continue
        cust = tables["customer"][row[ic["o_custkey"]]]
        seg = cust[4]  # c_mktsegment
        out[seg].append((row[ic["o_totalprice"]], pri == "1-URGENT"))
    return out


def test_ks_two_sample_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_ks_two_sample,
    )
    got = {r["segment"]: r
           for r in stats_ks_two_sample(spark, sf_dir).collect()}
    for seg, pts in _samples(tables).items():
        n1 = sum(1 for _, u in pts if u)
        n2 = len(pts) - n1
        # distinct-value cells, cumulative in value order
        cells = sorted(Counter(pts).items())
        cum1 = cum2 = 0
        best, best_at = -1, None
        for (price, urgent), c in _merge_cells(cells):
            cum1 += c[0]
            cum2 += c[1]
            d = abs(cum1 * n2 - cum2 * n1)
            if d > best:
                best, best_at = d, price
        r = got[seg]
        assert r["n_urgent"] == n1 and r["n_low"] == n2
        assert r["ks_d"] == best / (float(n1) * float(n2))
        assert r["ks_at_price"] == best_at


def _merge_cells(cells):
    """Collapse per-(price, urgent) counts into per-price (c1, c2)."""
    by_price = defaultdict(lambda: [0, 0])
    for (price, urgent), c in cells:
        by_price[price][0 if urgent else 1] += c
    for price in sorted(by_price):
        yield (price, None), by_price[price]


def test_mann_whitney_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_mann_whitney,
    )
    got = {r["segment"]: r
           for r in stats_mann_whitney(spark, sf_dir).collect()}
    for seg, pts in _samples(tables).items():
        n1 = sum(1 for _, u in pts if u)
        n = len(pts)
        n2 = n - n1
        by_price = defaultdict(lambda: [0, 0])
        for price, urgent in pts:
            by_price[price][0 if urgent else 1] += 1
        excl = 0
        r2 = 0          # 2 * rank-sum of sample 1 (doubled-int units)
        tiesum = 0
        for price in sorted(by_price):
            c1, c2 = by_price[price]
            t = c1 + c2
            r2 += c1 * (2 * excl + t + 1)
            tiesum += t * t * t - t
            excl += t
        u2 = r2 - n1 * (n1 + 1)           # 2 * U1
        var = (n1 * n2 / 12.0) * ((n + 1.0)
                                  - tiesum / (float(n) * (n - 1.0)))
        z = (float(u2) - float(n1) * float(n2)) / (2.0 * math.sqrt(var))
        r = got[seg]
        assert r["n_urgent"] == n1 and r["n_low"] == n2
        assert r["u1"] == u2 / 2.0
        assert r["z_score"] == pytest.approx(z, abs=1e-9)


def _avg_ranks(xs):
    """Average (midrank) ranks with exact tie handling, 1-based."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j + 2) / 2.0   # ranks i+1 .. j+1 averaged
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_spearman_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_spearman_corr,
    )
    got = {r["l_returnflag"]: r
           for r in stats_spearman_corr(spark, sf_dir).collect()}
    by_flag = defaultdict(lambda: ([], []))
    for flag, qty, price in tables["lineitem"]:
        by_flag[flag][0].append(qty)
        by_flag[flag][1].append(price)
    for flag, (qs, ps) in by_flag.items():
        rx = _avg_ranks(qs)
        ry = _avg_ranks(ps)
        n = len(rx)
        mx = sum(rx) / n
        my = sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(sum((a - mx) ** 2 for a in rx)
                        * sum((b - my) ** 2 for b in ry))
        rho = num / den
        assert got[flag]["n_items"] == n
        assert got[flag]["spearman_rho"] == pytest.approx(rho, abs=1e-9)


def test_weighted_median_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_weighted_median,
    )
    got = {r["l_returnflag"]: r
           for r in stats_weighted_median(spark, sf_dir).collect()}
    by_flag = defaultdict(list)
    for flag, qty, price in tables["lineitem"]:
        by_flag[flag].append((price, qty))
    for flag, pts in by_flag.items():
        pts.sort()
        total = sum(w for _, w in pts)
        cum = 0.0
        med = None
        for price, w in pts:
            cum += w
            if 2 * cum >= total:
                med = price
                break
        r = got[flag]
        assert r["n_items"] == len(pts)
        assert r["total_weight"] == pytest.approx(total, rel=1e-12)
        assert r["weighted_median"] == med


def test_gini_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        orders_gini_concentration,
    )
    got = {r["n_name"]: r
           for r in orders_gini_concentration(spark, sf_dir).collect()}
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    rev = defaultdict(float)
    for row in tables["orders"]:
        cust = tables["customer"][row[ic["o_custkey"]]]
        nname = tables["nation"][cust[2]]
        rev[(nname, row[ic["o_custkey"]])] += row[ic["o_totalprice"]]
    by_nation = defaultdict(list)
    for (nname, ck), r in rev.items():
        by_nation[nname].append((r, ck))
    for nname, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        s = sum(r for r, _ in xs)
        s1 = sum((i + 1) * r for i, (r, _) in enumerate(xs))
        gini = (2.0 * s1 - (n + 1.0) * s) / (n * s)
        r = got[nname]
        assert r["n_customers"] == n
        assert r["gini"] == pytest.approx(gini, abs=1e-9)
        # Gini is a share in [0, 1) for non-negative revenues
        assert 0.0 <= r["gini"] < 1.0


def test_psi_reference(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        PSI_BINS, stats_psi_binned_drift,
    )
    con = duckdb.connect()
    rows = con.sql(
        "SELECT event_id, event_type, value FROM "
        f"'{sf_dir}/events.parquet'").fetchall()
    mn = min(r[0] for r in rows)
    mx = max(r[0] for r in rows)
    mid = (mn + mx) // 2
    by_type = defaultdict(list)
    for eid, et, v in rows:
        by_type[et].append((eid <= mid, v))
    got = {r["event_type"]: r
           for r in stats_psi_binned_drift(spark, sf_dir).collect()}
    for et, pts in by_type.items():
        vmin = min(v for _, v in pts)
        vmax = max(v for _, v in pts)
        ce = [0] * PSI_BINS
        cl = [0] * PSI_BINS
        for early, v in pts:
            if vmax == vmin:
                b = 0
            else:
                b = min(PSI_BINS - 1,
                        int(math.floor((v - vmin)
                                       / ((vmax - vmin) / PSI_BINS))))
            (ce if early else cl)[b] += 1
        ne, nl = sum(ce), sum(cl)
        psi = 0.0
        for b in range(PSI_BINS):
            p = (ce[b] + 1.0) / (ne + float(PSI_BINS))
            q = (cl[b] + 1.0) / (nl + float(PSI_BINS))
            psi += (p - q) * math.log(p / q)
        r = got[et]
        assert r["n_early"] == ne and r["n_late"] == nl
        assert r["psi"] == pytest.approx(psi, abs=1e-6)
        assert r["psi"] >= 0.0   # PSI is a symmetrized KL — non-negative


def test_benford_shares_and_density(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        BENFORD_SHARES, quality_benford_digits,
    )
    rows = quality_benford_digits(spark, sf_dir).collect()
    assert sum(BENFORD_SHARES) == pytest.approx(1.0, abs=1e-12)
    by_pri = defaultdict(list)
    for r in rows:
        by_pri[r["o_orderpriority"]].append(r)
    for pri, rs in by_pri.items():
        assert sorted(r["digit"] for r in rs) == list(range(1, 10))
        assert sum(r["observed_share"] for r in rs) == pytest.approx(1.0)
        assert all(r["chi2_contrib"] >= 0.0 for r in rs)
        assert len({r["n_orders"] for r in rs}) == 1


def test_chi_square_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_chi_square_independence,
    )
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    obs = Counter()
    for row in tables["orders"]:
        cust = tables["customer"][row[ic["o_custkey"]]]
        obs[(cust[4], row[ic["o_orderpriority"]])] += 1
    n = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (seg, pri), c in obs.items():
        rt[seg] += c
        ct[pri] += c
    chi2 = 0.0
    for (seg, pri) in sorted(obs):
        e = rt[seg] * float(ct[pri]) / n
        chi2 += (obs[(seg, pri)] - e) ** 2 / e
    r = stats_chi_square_independence(spark, sf_dir).collect()[0]
    assert r["n_orders"] == n
    assert r["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-6)


def test_zipf_slope_reference(spark, sf_dir):
    import re

    from spark_streaming_dis_plugin_spark.operators.text import (
        ZIPF_TOP_N, text_zipf_slope,
    )
    con = duckdb.connect()
    texts = [r[0] for r in con.sql(
        f"SELECT \"text\" FROM '{sf_dir}/documents.parquet'").fetchall()]
    cnt = Counter()
    for t in texts:
        for tok in re.split(r"[^a-zA-Z0-9_]+", t.lower()):
            if tok:
                cnt[tok] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_N]
    n = len(top)
    sx = sy = sxx = sxy = 0.0
    for i, (_, c) in enumerate(top, start=1):
        lx, ly = math.log(float(i)), math.log(float(c))
        sx += lx
        sy += ly
        sxx += lx * lx
        sxy += lx * ly
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r = text_zipf_slope(spark, sf_dir).collect()[0]
    assert r["n_terms"] == n
    assert r["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    # a natural-ish corpus should have a clearly negative slope
    assert r["zipf_slope"] < -0.1


def test_two_pass_cumsum_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_streaming_dis_plugin_spark.operators.statistics import (
        _two_pass_cumsum,
    )
    df = spark.range(500).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("o"),
        ((F.col("id") * 7919) % 100).alias("m"))
    got = _two_pass_cumsum(spark, df, ["g"], ["o"], {"m": "m"})
    w = (Window.partitionBy("g").orderBy("o")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ref = df.select("g", "o", F.sum("m").over(w).alias("cum"),
                    F.sum("m").over(Window.partitionBy("g")).alias("tot"))
    a = {(r["g"], r["o"]): (r["cum_m"], r["tot_m"])
         for r in got.collect()}
    b = {(r["g"], r["o"]): (r["cum"], r["tot"]) for r in ref.collect()}
    assert a == b


def test_welch_ttest_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_welch_ttest,
    )
    got = {r["segment"]: r
           for r in stats_welch_ttest(spark, sf_dir).collect()}
    for seg, pts in _samples(tables).items():
        a = [p for p, u in pts if u]
        b = [p for p, u in pts if not u]
        n1, n2 = len(a), len(b)
        m1, m2 = sum(a) / n1, sum(b) / n2
        v1 = (sum(x * x for x in a) - sum(a) ** 2 / n1) / (n1 - 1)
        v2 = (sum(x * x for x in b) - sum(b) ** 2 / n2) / (n2 - 1)
        t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
        r = got[seg]
        assert r["n_urgent"] == n1 and r["n_low"] == n2
        assert r["mean_diff"] == pytest.approx(m1 - m2, abs=1e-6)
        assert r["t_stat"] == pytest.approx(t, abs=1e-6)


def test_theil_sen_reference(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        events_theil_sen_trend,
    )
    con = duckdb.connect()
    rows = con.sql(
        "SELECT user_id, ts, event_id, value FROM "
        f"'{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for uid, _, _, v in rows:
        by_user[uid].append(v)
    got = {r["user_id"]: r
           for r in events_theil_sen_trend(spark, sf_dir).collect()}
    for uid, vals in by_user.items():
        n = len(vals)
        if n < 2:
            assert uid not in got
            continue
        h = n // 2
        slopes = sorted(
            ((vals[i + h] - vals[i]) / float(h), i)
            for i in range(n - h))
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        r = got[uid]
        assert r["n_events"] == n
        assert r["n_slopes"] == n - h
        assert r["theil_sen_slope"] == med


def test_lorenz_curve_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        LORENZ_DECILES, orders_lorenz_curve,
    )
    got = defaultdict(dict)
    for r in orders_lorenz_curve(spark, sf_dir).collect():
        got[r["n_name"]][r["decile"]] = r
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    rev = defaultdict(float)
    for row in tables["orders"]:
        cust = tables["customer"][row[ic["o_custkey"]]]
        nname = tables["nation"][cust[2]]
        rev[(nname, row[ic["o_custkey"]])] += row[ic["o_totalprice"]]
    by_nation = defaultdict(list)
    for (nname, ck), r in rev.items():
        by_nation[nname].append((r, ck))
    for nname, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        total = sum(r for r, _ in xs)
        cum = 0.0
        cums = []
        for r, _ in xs:
            cum += r
            cums.append(cum)
        assert set(got[nname]) == set(range(1, LORENZ_DECILES + 1))
        prev = 0.0
        for d in range(1, LORENZ_DECILES + 1):
            k = (n * d + LORENZ_DECILES - 1) // LORENZ_DECILES
            share = cums[k - 1] / total
            r = got[nname][d]
            assert r["n_customers"] == n
            assert r["cum_share"] == pytest.approx(share, abs=1e-9)
            # Lorenz ordinates are monotone and end at 1
            assert r["cum_share"] >= prev
            prev = r["cum_share"]
        assert got[nname][LORENZ_DECILES]["cum_share"] == \
            pytest.approx(1.0, abs=1e-12)


def test_bollinger_reference(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        BOLL_WIDTH, BOLL_WINDOW, events_bollinger_bands,
    )
    con = duckdb.connect()
    rows = con.sql(
        "SELECT user_id, event_id, value FROM "
        f"'{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for uid, eid, v in rows:
        by_user[uid].append((eid, v))
    got = {(r["user_id"], r["event_id"]): r
           for r in events_bollinger_bands(spark, sf_dir).collect()}
    n_checked = 0
    for uid, evs in by_user.items():
        vals = [v for _, v in evs]
        for i in range(BOLL_WINDOW - 1, len(evs)):
            win = vals[i - BOLL_WINDOW + 1:i + 1]
            m = sum(win) / BOLL_WINDOW
            var = ((sum(x * x for x in win)
                    - sum(win) ** 2 / BOLL_WINDOW) / (BOLL_WINDOW - 1))
            sig = math.sqrt(max(var, 0.0))
            r = got[(uid, evs[i][0])]
            assert r["roll_mean"] == pytest.approx(m, abs=1e-6)
            assert r["band_upper"] == pytest.approx(m + BOLL_WIDTH * sig,
                                                    abs=1e-6)
            assert r["band_lower"] == pytest.approx(m - BOLL_WIDTH * sig,
                                                    abs=1e-6)
            n_checked += 1
    # every emitted row was checked, and only full windows emit
    assert n_checked == len(got)
    assert any(r["breach"] for r in got.values())


def test_kruskal_wallis_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_kruskal_wallis,
    )
    got = {r["segment"]: r
           for r in stats_kruskal_wallis(spark, sf_dir).collect()}
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    by_seg = defaultdict(list)
    for row in tables["orders"]:
        cust = tables["customer"][row[ic["o_custkey"]]]
        by_seg[cust[4]].append((row[ic["o_totalprice"]],
                                row[ic["o_orderpriority"]]))
    for seg, pts in by_seg.items():
        vals = [p for p, _ in pts]
        ranks = _avg_ranks(vals)
        n = len(pts)
        by_grp = defaultdict(lambda: [0, 0.0])   # n_g, rank sum
        tie = Counter(vals)
        for (_, grp), rk in zip(pts, ranks):
            by_grp[grp][0] += 1
            by_grp[grp][1] += rk
        s = sum(rs * rs / ng for grp, (ng, rs) in sorted(by_grp.items()))
        h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
        tiesum = sum(t ** 3 - t for t in tie.values())
        hc = h / (1.0 - tiesum / (float(n) ** 3 - n))
        r = got[seg]
        assert r["n_orders"] == n
        assert r["dof"] == len(by_grp) - 1
        assert r["h_stat"] == pytest.approx(h, abs=1e-6)
        assert r["h_tie_corrected"] == pytest.approx(hc, abs=1e-6)
        assert r["h_stat"] >= 0.0


def test_bollinger_4dp_cross_engine_exact(spark, tmp_path):
    """Regression pin for the r10 ADVICE finding: with 4-dp input
    values the Spark-side square must multiply at decimal(18,4)
    (18,4 x 18,4 -> exact decimal(37,8)); a (19,4) square would hit
    Spark's precision-loss rule (result decimal(38,7), the 8th
    fractional digit rounded away) and silently break hash parity
    with the DuckDB oracle's exact int128 DECIMAL(38,8). The shipped
    testdata fixtures carry <=2-dp values, so without this synthetic
    4-dp fixture the sweep could not catch that regression class."""
    import decimal
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        BOLL_WINDOW, events_bollinger_bands,
    )
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    # 4-dp values whose squares need all 8 fractional digits
    # (1.2345^2 = 1.52399025 -> 8th digit matters).
    vals = [decimal.Decimal(v) / 10_000
            for v in (12345, 98765, 31417, 27183, 16181,
                      55557, 44449, 66661, 77773, 88887,
                      10007, 20011, 30013, 40031, 50033,
                      60037, 70039, 80051, 90053, 11117,
                      12347, 13331, 14341, 15373, 16411,
                      17417, 18443, 19447, 21481, 22483)]
    import datetime
    rows = [(i + 1, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(minutes=i), 1, "view", float(v), "{}")
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = sorted(
        ((r["event_id"], r["roll_mean"], r["band_upper"],
          r["band_lower"], r["breach"])
         for r in events_bollinger_bands(spark, sf).collect()))

    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"'{sf}/events.parquet/*.parquet'")
    oracle = all_queries()["events_bollinger_bands"].oracle
    want = sorted((r[1], r[3], r[4], r[5], r[6])
                  for r in con.sql(oracle).fetchall())

    assert len(got) == len(vals) - BOLL_WINDOW + 1
    for g, w in zip(got, want):
        assert g[0] == w[0]
        # bit-for-bit double equality: both engines must round the
        # identical exact 8-dp decimal core
        assert g[1] == w[1] and g[2] == w[2] and g[3] == w[3]
        assert g[4] == w[4]


def test_psi_streamed_gate_matches_python_reference(spark, sf_dir):
    """Third implementation of dis_psi_drift_tws_streamed's declared
    semantics (the sweep already pins Spark == DuckDB): early-half
    reference profile with early-only edges, late half binned per
    (type, day), Laplace-smoothed PSI — hand-rolled from the parquet."""
    import math
    from spark_streaming_dis_plugin_spark.operators.connector import (
        dis_psi_drift_tws_streamed,
    )
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        PSI_BINS,
    )

    con = duckdb.connect()
    rows = con.sql(
        "SELECT event_id, event_type, "
        "CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), "
        "strftime(ts, '%Y-%m-%d') FROM "
        f"'{sf_dir}/events.parquet'").fetchall()
    ids = [r[0] for r in rows]
    mid = (min(ids) + max(ids)) // 2
    early = [(t, v) for i, t, v, _d in rows if i <= mid]
    late = [(t, v, d) for i, t, v, d in rows if i > mid]

    edges = {}
    for t, v in early:
        lo, hi = edges.get(t, (v, v))
        edges[t] = (min(lo, v), max(hi, v))

    def binof(t, v):
        vmin, vmax = edges[t]
        if vmax == vmin:
            return 0
        return max(0, min(PSI_BINS - 1,
                          int(math.floor((v - vmin)
                                         / ((vmax - vmin) / PSI_BINS)))))

    ref = {t: [0] * PSI_BINS for t in edges}
    for t, v in early:
        ref[t][binof(t, v)] += 1
    cur: dict = {}
    for t, v, d in late:
        if t not in edges:
            continue
        cur.setdefault((t, d), [0] * PSI_BINS)[binof(t, v)] += 1

    got = {(r["event_type"], r["win"]): r
           for r in dis_psi_drift_tws_streamed(spark, sf_dir).collect()}
    assert set(got) == set(cur)
    for (t, d), counts in cur.items():
        ne, nc = sum(ref[t]), sum(counts)
        psi = 0.0
        for b in range(PSI_BINS):
            p = (ref[t][b] + 1.0) / (ne + float(PSI_BINS))
            q = (counts[b] + 1.0) / (nc + float(PSI_BINS))
            psi += (p - q) * math.log(p / q)
        r = got[(t, d)]
        assert r["n_ref"] == ne and r["n_cur"] == nc
        assert r["psi"] == pytest.approx(psi, abs=1e-6)
        assert r["psi"] >= 0.0   # PSI contribs are nonnegative


def test_kendall_tau_reference(spark, sf_dir, tables):
    """O(cells^2) engine plan vs a direct O(n^2)-free Python reference
    built from the same contingency cells (independently recomputed)."""
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_kendall_tau,
    )
    got = {r["l_returnflag"]: r
           for r in stats_kendall_tau(spark, sf_dir).collect()}
    con = duckdb.connect()
    rows = con.sql(
        "SELECT l_returnflag, l_quantity, l_linenumber FROM "
        f"'{sf_dir}/lineitem.parquet'").fetchall()
    cells = Counter(rows)
    by_g = defaultdict(dict)
    for (g, x, y), c in cells.items():
        by_g[g][(x, y)] = c
    for g, cc in by_g.items():
        items = sorted(cc.items())
        conc = disc = 0
        for i, ((x1, y1), c1) in enumerate(items):
            for (x2, y2), c2 in items[i + 1:]:
                if x1 < x2 and y1 < y2:
                    conc += c1 * c2
                elif x1 < x2 and y1 > y2:
                    disc += c1 * c2
        n = sum(cc.values())
        n0 = n * (n - 1) // 2
        cx = Counter()
        cy = Counter()
        for (x, y), c in cc.items():
            cx[x] += c
            cy[y] += c
        n1 = sum(v * (v - 1) // 2 for v in cx.values())
        n2 = sum(v * (v - 1) // 2 for v in cy.values())
        tau = (conc - disc) / math.sqrt(float(n0 - n1) * float(n0 - n2))
        r = got[g]
        assert r["n_items"] == n
        assert r["concordant"] == conc and r["discordant"] == disc
        assert r["tau_b"] == pytest.approx(tau, abs=1e-9)
        assert -1.0 <= r["tau_b"] <= 1.0


def test_mutual_information_reference(spark, sf_dir, tables):
    from spark_streaming_dis_plugin_spark.operators.statistics import (
        stats_mutual_information,
    )
    got = {r["n_name"]: r
           for r in stats_mutual_information(spark, sf_dir).collect()}
    cols = tables["orders_cols"]
    ic = {c: i for i, c in enumerate(cols)}
    cells = Counter()
    for row in tables["orders"]:
        cust = tables["customer"][row[ic["o_custkey"]]]
        nname = tables["nation"][cust[2]]
        cells[(nname, cust[4], row[ic["o_orderpriority"]])] += 1
    by_n = defaultdict(Counter)
    for (nn, s, p), c in cells.items():
        by_n[nn][(s, p)] = c
    for nn, cc in by_n.items():
        n = sum(cc.values())
        cx = Counter()
        cy = Counter()
        for (s, p), c in cc.items():
            cx[s] += c
            cy[p] += c
        mi = sum((c / n) * math.log(c * n / (cx[s] * cy[p]))
                 for (s, p), c in sorted(cc.items()))
        hx = -sum((v / n) * math.log(v / n) for v in cx.values())
        hy = -sum((v / n) * math.log(v / n) for v in cy.values())
        r = got[nn]
        assert r["n_orders"] == n
        assert r["mi_nats"] == pytest.approx(mi, abs=1e-6)
        assert r["h_segment"] == pytest.approx(hx, abs=1e-6)
        assert r["h_priority"] == pytest.approx(hy, abs=1e-6)
        assert r["nmi"] == pytest.approx(mi / math.sqrt(hx * hy), abs=1e-6)
        # information inequalities: 0 <= MI <= min(Hx, Hy)
        assert -1e-9 <= r["mi_nats"] <= min(hx, hy) + 1e-9


def test_sample_gate_matches_python_bottomk(spark, sf_dir):
    """The streamed deterministic sample == the bottom-k a pure-Python
    pass computes with the same portable hash over the late half."""
    from spark_streaming_dis_plugin_spark.functions.portable import (
        portable_hash_py,
    )
    from spark_streaming_dis_plugin_spark.operators.connector import (
        dis_sample_tws_streamed,
    )
    from spark_streaming_dis_plugin_spark.streaming.stateful import (
        SAMPLE_TWS_K,
    )

    con = duckdb.connect()
    rows = con.sql(
        "SELECT event_id, event_type, "
        "CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR) FROM "
        f"'{sf_dir}/events.parquet' ORDER BY event_id").fetchall()
    ids = [r[0] for r in rows]
    mid = (min(ids) + max(ids)) // 2
    late = [(t, v) for i, t, v in rows if i > mid]
    boards = defaultdict(list)
    for off, (t, v) in enumerate(late):
        boards[t].append((portable_hash_py(f"{off}:{v}"), off, v))
    want = {}
    for t, entries in boards.items():
        entries.sort()
        for rnk, (_h, off, v) in enumerate(entries[:SAMPLE_TWS_K], 1):
            want[(t, rnk)] = (len(entries), off, v)
    got = {(r["key"], r["rnk"]): (r["n_seen"], r["off"], r["value"])
           for r in dis_sample_tws_streamed(spark, sf_dir).collect()}
    assert got == want and len(got) == 5 * SAMPLE_TWS_K
