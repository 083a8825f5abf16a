"""Local differential harness: run a registered query in Spark AND its
DuckDB oracle, compare row count, column names, and values — the same
contract the driver's CORRECTNESS gate applies, so failures surface here
first.
"""

from __future__ import annotations

import math
import os

import duckdb

from spark_streaming_dis_plugin_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive comparison.

    Type-strict on int-vs-float (a 999 BIGINT != 999.0 DOUBLE): the
    driver's value-hash stringifies, so `999` and `999.0` mismatch there —
    this harness must catch it locally."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, int):
        return ("int", v)
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        # Type-strict: the driver's stringify-hash distinguishes
        # Decimal('999') from int 999 (how the r2 split/pack failures
        # escaped the local gate) — never coerce Decimal to float here.
        return ("dec", str(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("dt", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str, float_exact: bool = True):
    """Assert Spark result == DuckDB result (sorted columns + rows)."""
    duck = con.sql(sql)
    duck_cols = [c.lower() for c in duck.columns]
    spark_cols = [c.lower() for c in spark_df.columns]
    assert sorted(duck_cols) == sorted(spark_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")

    s_rows = [tuple(_norm(r[c]) for c in sorted(spark_df.columns,
                                                key=str.lower))
              for r in spark_df.collect()]
    duck_rows_raw = duck.fetchall()
    order = [duck_cols.index(c) for c in sorted(duck_cols)]
    d_rows = [tuple(_norm(r[i]) for i in order) for r in duck_rows_raw]

    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")

    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)  # noqa: E731
    s_sorted = sorted(s_rows, key=key)
    d_sorted = sorted(d_rows, key=key)
    mismatches = []
    for i, (s, d) in enumerate(zip(s_sorted, d_sorted)):
        if s != d and not _rows_close(s, d, float_exact):
            mismatches.append((i, s, d))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"value mismatches (spark vs duck): {mismatches}"


def _rows_close(s, d, float_exact: bool) -> bool:
    if len(s) != len(d):
        return False
    for a, b in zip(s, d):
        if a == b:
            continue
        if (not float_exact
                and isinstance(a, tuple) and isinstance(b, tuple)
                and len(a) == 2 and a[0] == "float" and b[0] == "float"
                and math.isclose(float(a[1]), float(b[1]),
                                 rel_tol=1e-9, abs_tol=1e-9)):
            continue
        return False
    return True
