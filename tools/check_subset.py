"""Driver-strict oracle check for a SUBSET of declared queries.

Usage: python tools/check_subset.py name1 name2 ... [--sf DIR] [--tz TZ]
Same comparator as tools/drive_contract.py, but only the named queries —
the fast loop while building a new operator.
"""
import os, sys, math, datetime, decimal

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
tz = None
names = []
i = 0
while i < len(args):
    if args[i] == "--sf":
        sf = args[i + 1]; i += 2
    elif args[i] == "--tz":
        tz = args[i + 1]; i += 2
    else:
        names.append(args[i]); i += 1

from pyspark.sql import SparkSession
builder = (SparkSession.builder.master("local[8]")
           .appName("subset-check").config("spark.ui.enabled", "false")
           .config("spark.sql.shuffle.partitions", "8"))
if tz:
    builder = builder.config("spark.sql.session.timeZone", tz)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
import duckdb
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def norm(v):
    if isinstance(v, decimal.Decimal): return f"dec:{v}"
    if isinstance(v, float): return "nan" if math.isnan(v) else v
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    return v


qs, oracles = E.queries(), E.oracle_sql()
bad = 0
for name in names:
    if name not in qs:
        print(f"  UNKNOWN {name}"); bad += 1; continue
    sdf = qs[name](spark, sf)
    scols = sorted(c.lower() for c in sdf.columns)
    srows = sorted([tuple(str(norm(r[c]))
                          for c in sorted(sdf.columns, key=str.lower))
                    for r in sdf.collect()])
    if name not in oracles:
        print(f"  (rows-only) {name}: {len(srows)} rows"); continue
    d = con.sql(oracles[name])
    dcols = [c.lower() for c in d.columns]
    idx = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted([tuple(str(norm(r[i])) for i in idx) for r in d.fetchall()])
    ok = scols == sorted(dcols) and srows == drows
    if not ok:
        bad += 1
        print(f"  MISMATCH {name}: cols spark={scols} duck={sorted(dcols)} "
              f"rows {len(srows)}/{len(drows)}")
        shown = 0
        for a, b in zip(srows, drows):
            if a != b and shown < 3:
                print("    spark:", a, "\n    duck :", b); shown += 1
        if len(srows) != len(drows):
            only_s = [r for r in srows if r not in set(drows)][:3]
            only_d = [r for r in drows if r not in set(srows)][:3]
            print("    only-spark:", only_s, "\n    only-duck :", only_d)
    else:
        print(f"  {name}: OK ({len(srows)} rows)", flush=True)
spark.stop()
sys.exit(1 if bad else 0)
