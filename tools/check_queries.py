"""Check a SUBSET of registered queries against their DuckDB oracles with
the driver-strict comparator — fast iteration loop while building.

    python tools/check_queries.py name1 name2 ...
    python tools/check_queries.py --sf /root/testdata/sf0.001 --tz UTC name1
"""
import argparse
import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default="/root/testdata/sf0.01")
ap.add_argument("--tz", default=None)
ap.add_argument("names", nargs="+")
args = ap.parse_args()

from pyspark.sql import SparkSession  # noqa: E402

builder = (SparkSession.builder.master("local[8]")
           .appName("check-queries").config("spark.ui.enabled", "false")
           .config("spark.sql.shuffle.partitions", "8"))
if args.tz:
    builder = builder.config("spark.sql.session.timeZone", args.tz)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import duckdb  # noqa: E402

from spark_streaming_dis_plugin_spark.plans.registry import all_queries  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")


def norm(v):
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


specs = all_queries()
bad = 0
for name in args.names:
    spec = specs[name]
    sdf = spec.fn(spark, args.sf)
    if spec.oracle is None:
        print(f"  (rows-only) {name}: {sdf.count()} rows", flush=True)
        continue
    scols = sorted(c.lower() for c in sdf.columns)
    srows = sorted([tuple(str(norm(r[c]))
                          for c in sorted(sdf.columns, key=str.lower))
                    for r in sdf.collect()])
    d = con.sql(spec.oracle)
    dcols = [c.lower() for c in d.columns]
    idx = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted([tuple(str(norm(r[i])) for i in idx) for r in d.fetchall()])
    status = "OK" if (scols == sorted(dcols) and srows == drows) else "MISMATCH"
    if status != "OK":
        bad += 1
        print(f"  cols match: {scols == sorted(dcols)} "
              f"({scols} vs {sorted(dcols)})")
        print(f"  rows: {len(srows)} spark vs {len(drows)} duck")
        shown = 0
        for a, b in zip(srows, drows):
            if a != b and shown < 3:
                shown += 1
                print("    spark:", a, "\n    duck :", b)
    print(f"  {name}: {status} ({len(srows)} rows)", flush=True)
spark.stop()
sys.exit(1 if bad else 0)
