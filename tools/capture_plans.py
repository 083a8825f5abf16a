"""Capture .explain('formatted') output for bench queries into plans/<round>/.

The round directory defaults to r14 and can be overridden with
$SPARK_GRAFT_PLANS_ROUND (the r13 dumps stay in plans/r13/).

Usage:
  python tools/capture_plans.py before [name ...]   # -> plans/r14/<q>_before.txt
  python tools/capture_plans.py after  [name ...]   # -> plans/r14/<q>_after.txt

With no names, captures every bench-set query. Streaming/protocol rows
(whose fn drains a real stream before returning a memory table) are
captured too — their file records the final-state relation's plan plus a
header noting the protocol wrapper.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = sys.argv[1]
    assert which in ("before", "after"), which
    names = sys.argv[2:]

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from spark_streaming_dis_plugin_spark.plans.registry import all_queries
    from spark_streaming_dis_plugin_spark.session import get_spark

    specs = all_queries()
    if not names:
        names = sorted(n for n, s in specs.items() if s.bench)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        spec = specs[name]
        try:
            df = spec.fn(spark, sf_dir)
            # classic DataFrame: _sc.explainString on the queryExecution
            qe = df._jdf.queryExecution()
            txt = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as exc:  # protocol rows may need real drains
            txt = f"<capture failed: {type(exc).__name__}: {exc}>"
        is_stream = "streamed" in name or "restart" in name
        header = (f"-- {name} ({which}) sf_dir={sf_dir}\n" +
                  ("-- NOTE: streaming/protocol row: the captured plan is "
                   "the returned final-state relation (memory sink table); "
                   "the streaming work happens in the drain protocol.\n"
                   if is_stream else ""))
        with open(os.path.join(out_dir, f"{name}_{which}.txt"), "w") as f:
            f.write(header + txt + "\n")
        print(f"captured {name}_{which}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
