"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as the MEDIAN of $SPARK_GRAFT_BENCH_ITERS (default 3)
warm iterations after one uncounted warmup pass — single-shot timings at
this scale carry +-0.3s of JVM/IO noise that makes real regressions
unreadable (BENCH_NOTES.md r2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from spark_streaming_dis_plugin_spark.plans.registry import all_queries
    from spark_streaming_dis_plugin_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in all_queries().items() if s.bench}

    # JVM + parquet-footer warmup (not counted): tiny action per table
    from spark_streaming_dis_plugin_spark.tables import TABLES, load
    for t in TABLES:
        load(spark, sf_dir, t).limit(1).count()

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        samples: list[float] = []
        for i in range(iters + 1):          # first pass = uncounted warmup
            # persist()-using queries cache per invocation; clear between
            # runs so iterations stay independent and memory bounded
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # count() forces the full plan without driver-side row transfer
            df.count()
            if i > 0:
                samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
