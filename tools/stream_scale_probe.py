"""STREAMING scale probe (r12 verdict #1): no streaming gate had ever
run above sf0.1. Run the three shapes the verdict names at sf0.1 AND the
derived sf1 (10x rows per batch, 10x state keys — tools/make_sf1.py now
scales events too) and decompose where per-batch time goes:

  - wordcount_6batch : the driver bench's streaming leg topology (dis
    source -> running wordcount -> memory sink, complete mode) under
    maxOffsetsPerTrigger = total/6, built here exactly as bench.py
    builds it. Questions: does warm addBatch stay ~flat as batches
    carry 10x rows (the r12 ablation attributed ~225 ms to a
    row-count-independent Python-source floor), and does the stateful
    agg's commit scale with STATE SIZE (vocabulary, fixed) or BATCH
    SIZE (10x)?
  - dis_psi_drift_tws_streamed : the registered transformWithState gate
    run UNCHANGED — per-event-type ValueState bin counts. 10x rows;
    state rows stay O(types x bins). State-store commit is the term at
    risk.
  - dis_ann_retrain_streamed : the registered ingest + O(C) drift-probe
    + forced-retrain protocol run UNCHANGED. Ingest/retrain scale with
    corpus (10x); the per-batch maintenance probe must stay flat.

Instrumentation: ONE StreamingQueryListener attached for the whole run
records every progress event (durationMs phases + stateOperators
commitTimeMs / numRowsTotal); legs are sliced by event index. (A
previous add/remove-per-leg design broke py4j's callback channel after
the first removal — events silently stopped.)

Usage: python tools/stream_scale_probe.py [--legs name1,name2,...]
Prints one JSON line per (leg, sf) plus a markdown table for
BENCH_NOTES.
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1")

DEFAULT_LEGS = ["wordcount_6batch", "dis_psi_drift_tws_streamed",
                "dis_ann_retrain_streamed"]


def make_recorder():
    from pyspark.sql.streaming.listener import StreamingQueryListener

    class Recorder(StreamingQueryListener):
        def __init__(self):
            self.progress: list[dict] = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                self.progress.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return Recorder()


def med(vals):
    vals = sorted(v for v in vals if v is not None)
    return vals[len(vals) // 2] if vals else None


def summarize(progress: list[dict]) -> dict:
    data = [p for p in progress if p.get("numInputRows", 0) > 0]
    warm = data[1:] if len(data) > 1 else data

    def phase(key):
        return med([p.get("durationMs", {}).get(key) for p in warm])

    state_commit = med([
        sum(s.get("commitTimeMs", 0) for s in p.get("stateOperators", []))
        for p in warm if p.get("stateOperators")])
    state_rows = max(
        (max((s.get("numRowsTotal", 0)
              for s in p.get("stateOperators", [])), default=0)
         for p in data), default=0)
    return {
        "data_batches": len(data),
        "rows_total": sum(p["numInputRows"] for p in data),
        "rows_per_batch": med([p["numInputRows"] for p in data]),
        "warm_addBatch_ms": phase("addBatch"),
        "warm_trigger_ms": phase("triggerExecution"),
        "warm_state_commit_ms": state_commit,
        "state_rows_max": state_rows,
    }


def run_wordcount_6batch(spark, sf_dir):
    """The bench streaming leg's exact topology, rate-limited to ~6
    batches, drained under a processing-time trigger."""
    from spark_streaming_dis_plugin_spark.operators.connector import (
        _materialized_log,
    )
    from spark_streaming_dis_plugin_spark.scratch import scratch_dir
    from spark_streaming_dis_plugin_spark.streaming.drain import (
        drain_available,
    )
    from spark_streaming_dis_plugin_spark.streaming.queries import (
        running_wordcount,
    )

    log = _materialized_log(spark, sf_dir)
    total = sum(log.latest_offsets().values())
    per = max(-(-total // 6), 1)
    sdf = (spark.readStream.format("dis")
           .option("path", log.root).option("stream", log.stream)
           .option("maxOffsetsPerTrigger", str(per)).load())
    q = (running_wordcount(sdf)
         .writeStream.format("memory")
         .queryName(f"ssp_{uuid.uuid4().hex[:8]}")
         .outputMode("complete")
         .option("checkpointLocation", scratch_dir("ssp_ckpt_"))
         .trigger(processingTime="0 seconds").start())
    drain_available(q, timeout_seconds=600, expected_rows=total)
    return total


def main() -> None:
    argv = list(sys.argv[1:])
    legs = DEFAULT_LEGS
    if "--legs" in argv:
        i = argv.index("--legs")
        legs = argv[i + 1].split(",")
        del argv[i:i + 2]
    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run: python tools/make_sf1.py")

    from spark_streaming_dis_plugin_spark.plans.registry import all_queries
    from spark_streaming_dis_plugin_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("stream-scale-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    rec = make_recorder()
    spark.streams.addListener(rec)

    results = []
    for leg in legs:
        for sf_label, sf in (("sf0.1", SF01), ("sf1", SF1)):
            start_idx = len(rec.progress)
            t0 = time.perf_counter()
            err = None
            out_rows = None
            try:
                if leg == "wordcount_6batch":
                    out_rows = run_wordcount_6batch(spark, sf)
                else:
                    out_rows = specs[leg].fn(spark, sf).count()
            except Exception as exc:
                err = f"{type(exc).__name__}: {exc}"[:300]
            wall = time.perf_counter() - t0
            time.sleep(1.0)     # let trailing progress events land
            spark.catalog.clearCache()
            rep = {"leg": leg, "sf": sf_label,
                   "wall_sec": round(wall, 2), "out_rows": out_rows,
                   "err": err, **summarize(rec.progress[start_idx:])}
            if rep["rows_total"]:
                rep["records_per_sec"] = round(rep["rows_total"] / wall)
            print(json.dumps(rep), flush=True)
            results.append(rep)

    print("\n| leg | sf | batches | rows/batch | warm addBatch ms | "
          "state commit ms | state rows | wall s | rec/s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['leg']} | {r['sf']} | {r['data_batches']} | "
              f"{r['rows_per_batch']} | {r['warm_addBatch_ms']} | "
              f"{r['warm_state_commit_ms']} | {r['state_rows_max']} | "
              f"{r['wall_sec']} | {r.get('records_per_sec', '-')} |")


if __name__ == "__main__":
    main()
