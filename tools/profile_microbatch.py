"""Decompose the fixed per-micro-batch cost of a rate-limited dis drain
(r10 verdict #2): run the bench's six-batch wordcount leg and print each
data batch's engine-reported durationMs breakdown (latestOffset /
getBatch / queryPlanning / addBatch / walCommit / commitOffsets /
triggerExecution), plus the wall total, so the ~4 s/batch plateau can be
attributed to engine phases vs repo code.

Usage: python tools/profile_microbatch.py [sf_dir] [n_batches]
Run on a QUIET machine — contention inflates every phase.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from spark_streaming_dis_plugin_spark.operators.connector import (
        _materialized_log,
    )
    from spark_streaming_dis_plugin_spark.scratch import scratch_dir
    from spark_streaming_dis_plugin_spark.session import get_spark
    from spark_streaming_dis_plugin_spark.streaming.drain import (
        drain_available,
    )
    from spark_streaming_dis_plugin_spark.streaming.queries import (
        running_wordcount,
    )

    import shutil
    import uuid

    spark = get_spark("profile", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    log = _materialized_log(spark, sf_dir)
    total = sum(log.latest_offsets().values())
    per = max(-(-total // n_batches), 1)
    name = f"prof_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir("prof_ckpt_")
    sdf = (spark.readStream.format("dis")
           .option("path", log.root).option("stream", log.stream)
           .option("maxOffsetsPerTrigger", str(per))
           .load())
    t0 = time.perf_counter()
    q = (running_wordcount(sdf).writeStream.format("memory")
         .queryName(name).outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds").start())
    batches = drain_available(q, timeout_seconds=600, expected_rows=total)
    wall = time.perf_counter() - t0
    all_progress = [{"batchId": p["batchId"], "rows": p["numInputRows"],
                     "timestamp": p["timestamp"],
                     "trig": p["durationMs"].get("triggerExecution")}
                    for p in q.recentProgress]
    rows = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        rows.append({
            "batchId": p["batchId"],
            "rows": p["numInputRows"],
            "timestamp": p["timestamp"],
            "durationMs": p["durationMs"],
            "stateOperators": [
                {k: op.get(k) for k in
                 ("commitTimeMs", "numRowsTotal", "numRowsUpdated")}
                for op in p.get("stateOperators", [])],
        })
    shutil.rmtree(ckpt, ignore_errors=True)
    agg: dict[str, int] = {}
    for r in rows:
        for k, v in r["durationMs"].items():
            agg[k] = agg.get(k, 0) + int(v)
    print(json.dumps({"sf_dir": sf_dir, "data_batches": batches,
                      "records": total, "wall_sec": round(wall, 3),
                      "sum_durationMs": agg, "per_batch": rows,
                      "all_progress": all_progress},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
