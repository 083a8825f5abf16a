"""Drive __spark_entry__ exactly as the verify driver does: fresh session,
entry() smoke, then every queries()[name] vs oracle_sql()[name] via DuckDB
at sf0.01 (row count + column names + order-insensitive values)."""
import os, sys, math, datetime, decimal
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import SparkSession
builder = (SparkSession.builder.master("local[8]")
           .appName("driver-sim").config("spark.ui.enabled","false")
           .config("spark.sql.shuffle.partitions","8"))
# Optional: simulate a driver session in another timezone (TZ robustness):
#   python tools/drive_contract.py America/New_York
# Optional second arg: scale-factor dir (default sf0.01, the driver's SF):
#   python tools/drive_contract.py UTC /root/testdata/sf0.1
if len(sys.argv) > 1:
    builder = builder.config("spark.sql.session.timeZone", sys.argv[1])
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
df = E.entry(spark)
n = df.count()
print(f"ENTRY: rows={n} schema={df.columns}", flush=True)
assert n > 0

import duckdb
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    # Decimal stays type-distinct (driver's hash separates Decimal from
    # int/float — verified by the r2 split/pack hash failures).
    if isinstance(v, decimal.Decimal): return f"dec:{v}"
    if isinstance(v, float): return "nan" if math.isnan(v) else v
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    return v

qs, oracles = E.queries(), E.oracle_sql()
ok = bad = 0
for name in sorted(qs):
    if name not in oracles:
        print(f"  (rows-only) {name}: {qs[name](spark, SF).count()} rows", flush=True)
        continue
    sdf = qs[name](spark, SF)
    scols = sorted(c.lower() for c in sdf.columns)
    srows = sorted([tuple(str(norm(r[c])) for c in sorted(sdf.columns, key=str.lower))
                    for r in sdf.collect()])
    d = con.sql(oracles[name])
    dcols = [c.lower() for c in d.columns]
    idx = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted([tuple(str(norm(r[i])) for i in idx) for r in d.fetchall()])
    status = "OK" if (scols == sorted(dcols) and srows == drows) else "MISMATCH"
    if status == "OK": ok += 1
    else:
        bad += 1
        print(f"  {status} {name}: cols {scols==sorted(dcols)} rows {len(srows)}/{len(drows)}")
        for a, b in list(zip(srows, drows))[:3]:
            if a != b: print("    spark:", a, "\n    duck :", b)
    print(f"  {name}: {status} ({len(srows)} rows)", flush=True)
print(f"RESULT: {ok} ok, {bad} mismatched, {len(qs)-len(oracles)} rows-only")
spark.stop()
sys.exit(1 if bad else 0)
