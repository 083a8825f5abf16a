"""Segmented associative folds for the linear-recurrence family (r9
verdict #1): events_ewma (affine scale/offset), events_double_exponential
(2x2 matrix + vector), events_changepoint_cusum (tropical (max,+)
composition). These tests pin

1. SEMANTICS: the Spark result equals a Python reference of the CHUNKED
   computation BIT-EXACTLY on a hot key far larger than FOLD_CHUNK — a
   naive full-sequence sequential fold differs by reassociation ulps, so
   bit-equality proves the segmentation actually executed;
2. ACCURACY: the chunked result matches the naive sequential recursion
   within 1e-9 relative (the reassociation error is ulps, not drift);
3. EDGES: n=1 (EWMA seed-only / identity merge) and n=2 (Holt seed-only)
   keys survive the left-join identity path;
4. BOUNDS: per-key collected arrays are chunk-bounded — the chunk count
   observed for the hot key is ceil(n/FOLD_CHUNK), not 1.
"""
from __future__ import annotations

import datetime
import math
import os

import pandas as pd
import pytest

from spark_streaming_dis_plugin_spark.operators.connector import (
    CUSUM_H_FRAC,
    EWMA_ALPHA,
    FOLD_CHUNK,
    HOLT_ALPHA,
    HOLT_BETA,
    HOLT_GA,
    HOLT_HORIZON,
    HOLT_K11,
    HOLT_K21,
    HOLT_K22,
    events_changepoint_cusum,
    events_double_exponential,
    events_ewma,
)

N_HOT = 205          # hot key: 13 chunks of 16 — deep merge chain
SEED_VALUES = {1: N_HOT, 2: 1, 3: 2, 4: 50}


def _mk_events(tmp_path) -> str:
    """Synthetic events.parquet (TIMESTAMP_NTZ layout) with a hot key and
    the n=1 / n=2 edge keys; values are 'random' doubles from a fixed
    integer recurrence so runs are deterministic without Date/random."""
    rows = []
    eid = 0
    x = 48271
    for uid, n in SEED_VALUES.items():
        for i in range(n):
            x = (x * 48271) % 2147483647
            rows.append({
                "event_id": eid,
                "ts": datetime.datetime(2024, 1, 1) +
                datetime.timedelta(seconds=eid),
                "user_id": uid,
                "event_type": "t",
                "value": (x % 100000) / 100.0 - 250.0,
                "props": "{}",
            })
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    path = os.path.join(str(tmp_path), "events.parquet")
    pdf.to_parquet(path, index=False)
    return str(tmp_path)


def _sequences(tmp_path):
    import pyarrow.parquet as pq

    pdf = pq.read_table(os.path.join(str(tmp_path), "events.parquet")) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"])
    return {uid: list(g["value"]) for uid, g in pdf.groupby("user_id")}


# ------------------------------------------------------------ references

def _ewma_chunked(vals, C=FOLD_CHUNK):
    seed, rest = vals[0], vals[1:]
    m = (1.0, 0.0)
    for i in range(0, len(rest), C):
        a, b = 1.0, 0.0
        for x in rest[i:i + C]:
            a, b = (1 - EWMA_ALPHA) * a, EWMA_ALPHA * x + (1 - EWMA_ALPHA) * b
        m = (a * m[0], a * m[1] + b)
    return m[0] * seed + m[1]


def _ewma_seq(vals):
    y = vals[0]
    for x in vals[1:]:
        y = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * y
    return y


def _holt_chunked(vals, C=FOLD_CHUNK):
    l0, b0 = float(vals[0]), float(vals[1] - vals[0])
    rest = vals[2:]
    ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

    def step(s, x):
        m11, m12, m21, m22, v1, v2 = s
        return (HOLT_K11 * m11 + HOLT_K11 * m21,
                HOLT_K11 * m12 + HOLT_K11 * m22,
                HOLT_K21 * m11 + HOLT_K22 * m21,
                HOLT_K21 * m12 + HOLT_K22 * m22,
                (HOLT_K11 * v1 + HOLT_K11 * v2) + HOLT_ALPHA * x,
                (HOLT_K21 * v1 + HOLT_K22 * v2) + HOLT_GA * x)

    def merge(a, s):
        return (s[0] * a[0] + s[1] * a[2],
                s[0] * a[1] + s[1] * a[3],
                s[2] * a[0] + s[3] * a[2],
                s[2] * a[1] + s[3] * a[3],
                (s[0] * a[4] + s[1] * a[5]) + s[4],
                (s[2] * a[4] + s[3] * a[5]) + s[5])

    m = ident
    for i in range(0, len(rest), C):
        st = ident
        for x in rest[i:i + C]:
            st = step(st, x)
        m = merge(m, st)
    lvl = (m[0] * l0 + m[1] * b0) + m[4]
    trd = (m[2] * l0 + m[3] * b0) + m[5]
    return lvl, trd


def _holt_seq(vals):
    l, b = float(vals[0]), float(vals[1] - vals[0])
    for x in vals[2:]:
        nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
        l = nl
    return l, b


def _cusum_mu(vals):
    from decimal import Decimal
    return float(sum(Decimal(f"{v:.4f}") for v in vals)) / len(vals)


def _cusum_chunked(vals, C=FOLD_CHUNK):
    mu = _cusum_mu(vals)

    def elem(x):
        d = x - mu
        return (0.0, d, 0.0, d, 0.0, 0.0, d)

    def merge(a, s):
        return (max(s[0], a[0] + s[1]),
                a[1] + s[1],
                max(a[2], max(s[2], a[0] + s[3])),
                max(a[3], a[1] + s[3]),
                min(s[4], a[4] + s[1]),
                min(a[5], min(s[5], a[4] + s[6])),
                min(a[6], a[1] + s[6]))

    states = []
    for i in range(0, len(vals), C):
        es = [elem(x) for x in vals[i:i + C]]
        st = es[0]
        for e in es[1:]:
            st = merge(st, e)
        states.append(st)
    m = states[0]
    for s in states[1:]:
        m = merge(m, s)
    return max(0.0, m[2], m[3]), -min(0.0, m[5], m[6])


def _cusum_seq(vals):
    mu = _cusum_mu(vals)
    sp = sn = mp = mn = 0.0
    for x in vals:
        sp = max(0.0, sp + (x - mu))
        sn = min(0.0, sn + (x - mu))
        mp = max(mp, sp)
        mn = min(mn, sn)
    return mp, -mn


def _round9(v):
    from spark_streaming_dis_plugin_spark.functions.portable import (
        round_half_up,
    )
    return round_half_up(v, 9) + 0.0


# ------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def fold_fixture(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunked_fold")
    sf = _mk_events(tmp)
    seqs = _sequences(tmp)
    return sf, seqs


def test_ewma_chunked_bit_exact_and_accurate(spark, fold_fixture):
    sf, seqs = fold_fixture
    got = {r["user_id"]: r for r in events_ewma(spark, sf).collect()}
    assert set(got) == set(SEED_VALUES)
    for uid, vals in seqs.items():
        assert got[uid]["n_events"] == len(vals)
        # bit-exact vs the CHUNKED reference: proves segmentation executed
        assert got[uid]["ewma"] == _ewma_chunked(vals), uid
        # within ulps of the naive sequential recursion
        assert got[uid]["ewma"] == pytest.approx(_ewma_seq(vals), rel=1e-9)
    # the hot key genuinely exercised a deep merge chain
    assert math.ceil((len(seqs[1]) - 1) / FOLD_CHUNK) >= 13


def test_ewma_single_event_key_is_seed(spark, fold_fixture):
    sf, seqs = fold_fixture
    got = {r["user_id"]: r for r in events_ewma(spark, sf).collect()}
    assert got[2]["ewma"] == seqs[2][0]          # identity-merge path


def test_holt_chunked_bit_exact_and_accurate(spark, fold_fixture):
    sf, seqs = fold_fixture
    got = {r["user_id"]: r
           for r in events_double_exponential(spark, sf).collect()}
    assert set(got) == {u for u, n in SEED_VALUES.items() if n >= 2}
    for uid in got:
        vals = seqs[uid]
        lvl, trd = _holt_chunked(vals)
        assert got[uid]["level"] == _round9(lvl), uid
        assert got[uid]["trend"] == _round9(trd), uid
        assert got[uid][f"forecast_h{HOLT_HORIZON}"] == \
            _round9(lvl + HOLT_HORIZON * trd), uid
        sl, st_ = _holt_seq(vals)
        assert got[uid]["level"] == pytest.approx(sl, rel=1e-9, abs=1e-6)
        assert got[uid]["trend"] == pytest.approx(st_, rel=1e-9, abs=1e-6)


def test_holt_two_event_key_is_seed_state(spark, fold_fixture):
    sf, seqs = fold_fixture
    got = {r["user_id"]: r
           for r in events_double_exponential(spark, sf).collect()}
    l0, b0 = float(seqs[3][0]), float(seqs[3][1] - seqs[3][0])
    assert got[3]["level"] == _round9(l0)        # identity-merge path
    assert got[3]["trend"] == _round9(b0)


def test_cusum_chunked_bit_exact_and_accurate(spark, fold_fixture):
    sf, seqs = fold_fixture
    got = {r["user_id"]: r
           for r in events_changepoint_cusum(spark, sf).collect()}
    assert set(got) == set(SEED_VALUES)
    for uid, vals in seqs.items():
        cp, cn = _cusum_chunked(vals)
        assert got[uid]["cusum_pos"] == _round9(cp), uid
        assert got[uid]["cusum_neg"] == _round9(cn), uid
        sp, sn = _cusum_seq(vals)
        assert got[uid]["cusum_pos"] == pytest.approx(sp, rel=1e-9, abs=1e-6)
        assert got[uid]["cusum_neg"] == pytest.approx(sn, rel=1e-9, abs=1e-6)


def test_tropical_merge_is_associative():
    """Property pin for the CUSUM segment algebra: merge(merge(a,b),c) ==
    merge(a,merge(b,c)) mathematically (check at 1e-9 — IEEE + reassociates
    across the two groupings), and the composed map equals brute force."""
    import itertools

    def elem(d):
        return (0.0, d, 0.0, d, 0.0, 0.0, d)

    def merge(a, s):
        return (max(s[0], a[0] + s[1]), a[1] + s[1],
                max(a[2], max(s[2], a[0] + s[3])),
                max(a[3], a[1] + s[3]),
                min(s[4], a[4] + s[1]),
                min(a[5], min(s[5], a[4] + s[6])),
                min(a[6], a[1] + s[6]))

    x = 7
    for trial in range(200):
        ds = []
        for _ in range(9):
            x = (x * 48271) % 2147483647
            ds.append((x % 1000) / 10.0 - 50.0)
        a, b, c = elem(ds[0]), elem(ds[1]), elem(ds[2])
        for d in ds[3:6]:
            a = merge(a, elem(d))
        for d in ds[6:]:
            c = merge(c, elem(d))
        left = merge(merge(a, b), c)
        right = merge(a, merge(b, c))
        for u, v in zip(left, right):
            assert u == pytest.approx(v, rel=1e-12, abs=1e-9)


def test_chunk_counts_are_bounded(spark, fold_fixture):
    """The per-key collected arrays are chunk-bounded: re-derive the
    chunk layout the operators use and assert the hot key folds
    ceil/len-many chunks of <= FOLD_CHUNK elements — not one giant array."""
    from pyspark.sql import functions as F

    from spark_streaming_dis_plugin_spark.operators.connector import (
        _two_pass_rank,
    )
    from spark_streaming_dis_plugin_spark.tables import load

    sf, seqs = fold_fixture
    events = load(spark, sf, "events")
    ranked = _two_pass_rank(
        spark, events.select("user_id", "ts", "event_id", "value"),
        ["user_id"], ["ts", "event_id"])
    sizes = (ranked.withColumn("chunk",
                               F.expr(f"(rn - 1) div {FOLD_CHUNK}"))
             .groupBy("user_id", "chunk").count()
             .groupBy("user_id")
             .agg(F.max("count").alias("mx"),
                  F.count(F.lit(1)).alias("n_chunks"))
             .collect())
    by_uid = {r["user_id"]: r for r in sizes}
    assert by_uid[1]["mx"] <= FOLD_CHUNK
    assert by_uid[1]["n_chunks"] == math.ceil(N_HOT / FOLD_CHUNK)


def test_holt_damped_chunked_bit_exact(spark, fold_fixture):
    """The damped variant rides the shared matrix machinery: bit-exact
    vs a chunked Python replica with the HOLTD_* constants, and within
    ulps of the naive damped recursion."""
    from spark_streaming_dis_plugin_spark.operators.connector import (
        HOLTD_HSUM,
        HOLTD_K11,
        HOLTD_K12,
        HOLTD_K21,
        HOLTD_K22,
        HOLTD_PHI,
        events_holt_damped,
    )

    def chunked(vals, C=FOLD_CHUNK):
        l0, b0 = float(vals[0]), float(vals[1] - vals[0])
        rest = vals[2:]
        ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

        def step(s, x):
            m11, m12, m21, m22, v1, v2 = s
            return (HOLTD_K11 * m11 + HOLTD_K12 * m21,
                    HOLTD_K11 * m12 + HOLTD_K12 * m22,
                    HOLTD_K21 * m11 + HOLTD_K22 * m21,
                    HOLTD_K21 * m12 + HOLTD_K22 * m22,
                    (HOLTD_K11 * v1 + HOLTD_K12 * v2) + HOLT_ALPHA * x,
                    (HOLTD_K21 * v1 + HOLTD_K22 * v2) + HOLT_GA * x)

        def merge(a, s):
            return (s[0] * a[0] + s[1] * a[2],
                    s[0] * a[1] + s[1] * a[3],
                    s[2] * a[0] + s[3] * a[2],
                    s[2] * a[1] + s[3] * a[3],
                    (s[0] * a[4] + s[1] * a[5]) + s[4],
                    (s[2] * a[4] + s[3] * a[5]) + s[5])

        m = ident
        for i in range(0, len(rest), C):
            st = ident
            for x in rest[i:i + C]:
                st = step(st, x)
            m = merge(m, st)
        lvl = (m[0] * l0 + m[1] * b0) + m[4]
        trd = (m[2] * l0 + m[3] * b0) + m[5]
        return lvl, trd

    def seq(vals):
        l, b = float(vals[0]), float(vals[1] - vals[0])
        for x in vals[2:]:
            nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + HOLTD_PHI * b)
            b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * HOLTD_PHI * b
            l = nl
        return l, b

    sf, seqs = fold_fixture
    got = {r["user_id"]: r for r in events_holt_damped(spark, sf).collect()}
    for uid in got:
        vals = seqs[uid]
        lvl, trd = chunked(vals)
        assert got[uid]["level"] == _round9(lvl), uid
        assert got[uid]["trend"] == _round9(trd), uid
        assert got[uid][f"forecast_h{HOLT_HORIZON}"] == \
            _round9(lvl + HOLTD_HSUM * trd), uid
        sl, sb = seq(vals)
        assert got[uid]["level"] == pytest.approx(sl, rel=1e-9, abs=1e-6)
        assert got[uid]["trend"] == pytest.approx(sb, rel=1e-9, abs=1e-6)


def test_holt_winters_chunked_bit_exact(spark, fold_fixture):
    """The SEASONAL variant proves the machinery generalizes beyond 2x2:
    a 6-dim state (level, trend, 4 seasonals) folded as flattened
    42-double (M, v) segment states. Bit-exact vs a chunked Python
    replica of the identical flattened computation, and within ulps of
    the naive sequential Holt-Winters recursion; keys with n < 2m are
    excluded."""
    from spark_streaming_dis_plugin_spark.operators.connector import (
        HW_ALPHA,
        HW_BETA,
        HW_CA,
        HW_CB,
        HW_CG,
        HW_GAMMA,
        HW_IDENT,
        HW_K00,
        HW_K05,
        HW_K10,
        HW_K11,
        HW_K20,
        HW_K25,
        HW_PERIOD,
        events_holt_winters,
    )

    def step(st, x):
        out = [0.0] * 42
        for p in range(1, 43):
            if p <= 6:
                out[p - 1] = (HW_K00 * st[p - 1] + HW_K00 * st[p + 5]
                              + HW_K05 * st[p + 29])
            elif p <= 12:
                out[p - 1] = (HW_K10 * st[p - 7] + HW_K11 * st[p - 1]
                              + HW_K10 * st[p + 23])
            elif p <= 18:
                out[p - 1] = (HW_K20 * st[p - 13] + HW_K20 * st[p - 7]
                              + HW_K25 * st[p + 17])
            elif p <= 36:
                out[p - 1] = st[p - 7]
            elif p == 37:
                out[p - 1] = (HW_K00 * st[36] + HW_K00 * st[37]
                              + HW_K05 * st[41] + HW_CA * x)
            elif p == 38:
                out[p - 1] = (HW_K10 * st[36] + HW_K11 * st[37]
                              + HW_K10 * st[41] + HW_CB * x)
            elif p == 39:
                out[p - 1] = (HW_K20 * st[36] + HW_K20 * st[37]
                              + HW_K25 * st[41] + HW_CG * x)
            else:
                out[p - 1] = st[p - 2]
        return out

    def merge(acc, s):
        out = [0.0] * 42
        for p in range(1, 43):
            if p <= 36:
                i0 = (p - 1) // 6
                c = (p - 1) % 6 + 1
                a2 = 0.0
                for j in range(1, 7):
                    a2 = a2 + s[i0 * 6 + j - 1] * acc[(j - 1) * 6 + c - 1]
                out[p - 1] = a2
            else:
                a2 = 0.0
                for j in range(1, 7):
                    a2 = a2 + s[(p - 37) * 6 + j - 1] * acc[36 + j - 1]
                out[p - 1] = a2 + s[p - 1]
        return out

    def chunked(vals, C=FOLD_CHUNK):
        s14 = vals[0] + vals[1] + vals[2] + vals[3]
        s58 = vals[4] + vals[5] + vals[6] + vals[7]
        l0 = s14 / 4.0
        s0 = [l0, (s58 / 4.0 - s14 / 4.0) / 4.0,
              vals[3] - l0, vals[2] - l0, vals[1] - l0, vals[0] - l0]
        rest = vals[HW_PERIOD:]
        m = list(HW_IDENT)
        for i in range(0, len(rest), C):
            st = list(HW_IDENT)
            for x in rest[i:i + C]:
                st = step(st, x)
            m = merge(m, st)

        def apply_row(row0, voff):
            a2 = 0.0
            for j in range(1, 7):
                a2 = a2 + m[row0 + j - 1] * s0[j - 1]
            return a2 + m[voff - 1]

        return apply_row(0, 37), apply_row(6, 38), apply_row(30, 42)

    def seq(vals):
        m = HW_PERIOD
        l = (vals[0] + vals[1] + vals[2] + vals[3]) / 4.0
        b = ((vals[4] + vals[5] + vals[6] + vals[7]) / 4.0
             - (vals[0] + vals[1] + vals[2] + vals[3]) / 4.0) / 4.0
        s = [vals[i] - l for i in range(m)]   # s_1..s_m
        for t, x in enumerate(vals[m:], start=m + 1):
            s_old = s[(t - m - 1) % m]
            nl = HW_ALPHA * (x - s_old) + (1 - HW_ALPHA) * (l + b)
            b = HW_BETA * (nl - l) + (1 - HW_BETA) * b
            s[(t - 1) % m] = HW_GAMMA * (x - nl) + (1 - HW_GAMMA) * s_old
            l = nl
        # next season index for h=1 is s_{t+1-m}
        t = len(vals)
        return l, b, s[t % m]

    got = {r["user_id"]: r
           for r in events_holt_winters(spark, sf_dir=fold_fixture[0])
           .collect()}
    seqs = fold_fixture[1]
    assert set(got) == {u for u, n in SEED_VALUES.items()
                        if n >= 2 * HW_PERIOD}
    for uid, vals in seqs.items():
        if len(vals) < 2 * HW_PERIOD:
            continue
        lvl, trd, snx = chunked(vals)
        r = got[uid]
        assert r["n_events"] == len(vals)
        assert r["level"] == _round9(lvl), uid
        assert r["trend"] == _round9(trd), uid
        assert r["season_next"] == _round9(snx), uid
        assert r["forecast_h1"] == _round9(lvl + trd + snx), uid
        sl, sb, ss = seq(vals)
        assert lvl == pytest.approx(sl, rel=1e-7, abs=1e-7)
        assert trd == pytest.approx(sb, rel=1e-7, abs=1e-7)
        assert snx == pytest.approx(ss, rel=1e-7, abs=1e-7)
