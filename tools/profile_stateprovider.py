"""Decompose the stateful-agg 450-760 ms/batch (r12 verdict #6).

The r12 addBatch ablation isolated the stateful aggregate's per-batch
cost (variants A/B vs C) but not its composition: how much is the HDFS
state store's per-commit snapshot/delta I/O vs the aggregation itself?
This harness re-runs the six-batch rate-limited wordcount drain under
state-store variants, same topology otherwise:

  H  default    : HDFSBackedStateStoreProvider (the session default)
  Hs snapshotty : HDFS provider, minDeltasForSnapshot=2 (forces full
                  snapshot uploads mid-drain; isolates snapshot cost —
                  the default 10 means a 6-batch run never snapshots)
  R  rocksdb    : RocksDBStateStoreProvider
  Rc changelog  : RocksDB + changelogCheckpointing (commit uploads the
                  changelog instead of full SST files)

Per-variant metrics come from the engine's own progress events
(stateOperators commitTimeMs + durationMs.addBatch). Each variant runs
in a fresh checkpoint; provider configs are session confs read at query
start. Print one JSON line per variant + a markdown table for
BENCH_NOTES; run on a QUIET machine.

Usage: python tools/profile_stateprovider.py [sf_dir] [--agg value]
                                             [--variants H,Rc]

--agg value switches the aggregation from the 101-key wordcount to a
per-distinct-VALUE count — state cardinality ~= record count (100k rows
at sf0.1, 1M at the derived sf1), the LARGE-STATE regime where RocksDB
is supposed to earn its keep (update mode + noop foreachBatch sink, so
the sink never collects the big state). --variants limits the provider
list (labels' first token).
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
HDFS = ("org.apache.spark.sql.execution.streaming"
        ".state.HDFSBackedStateStoreProvider")
ROCKS = ("org.apache.spark.sql.execution.streaming"
         ".state.RocksDBStateStoreProvider")
CHANGELOG_KEY = ("spark.sql.streaming.stateStore.rocksdb"
                 ".changelogCheckpointing.enabled")
MIN_DELTAS_KEY = "spark.sql.streaming.stateStore.minDeltasForSnapshot"

VARIANTS = [
    ("H hdfs-default", {PROVIDER_KEY: HDFS}),
    ("Hs hdfs-snapshot2", {PROVIDER_KEY: HDFS, MIN_DELTAS_KEY: "2"}),
    ("R rocksdb", {PROVIDER_KEY: ROCKS, CHANGELOG_KEY: "false"}),
    ("Rc rocksdb-changelog", {PROVIDER_KEY: ROCKS, CHANGELOG_KEY: "true"}),
]


def med(vals):
    vals = sorted(v for v in vals if v is not None)
    return vals[len(vals) // 2] if vals else None


def main() -> None:
    argv = list(sys.argv[1:])
    agg = "word"
    if "--agg" in argv:
        i = argv.index("--agg")
        agg = argv[i + 1]
        del argv[i:i + 2]
    variants = VARIANTS
    if "--variants" in argv:
        i = argv.index("--variants")
        keys = set(argv[i + 1].split(","))
        del argv[i:i + 2]
        variants = [(lb, c) for lb, c in VARIANTS
                    if lb.split()[0] in keys]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

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
    from tools.stream_scale_probe import make_recorder, summarize

    spark = get_spark("profile-stateprovider",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    log = _materialized_log(spark, sf_dir)
    total = sum(log.latest_offsets().values())
    per = max(-(-total // 6), 1)
    from pyspark.sql import functions as F

    def make_agg(sdf):
        if agg == "value":
            # per-record-identity running count: state rows ~= corpus
            # (the envelope's value column alone has only ~100 distinct
            # strings; (timestamp, key) is unique per record) — the
            # large-state regime. Update mode + noop foreachBatch sink
            # so the sink never collects the big state.
            return (sdf.groupBy("timestamp", "key")
                    .agg(F.count(F.lit(1)).alias("n")))
        return running_wordcount(sdf)

    rec = make_recorder()
    spark.streams.addListener(rec)
    baseline = {k: spark.conf.get(k, None)
                for _n, c in VARIANTS for k in c}

    # Unrecorded warmup drain: the first query in a fresh JVM pays
    # whole-stage codegen + classloading; without this the first
    # VARIANT absorbs it and the comparison is order-biased.
    warm_q = (make_agg(
        spark.readStream.format("dis")
        .option("path", log.root).option("stream", log.stream)
        .option("maxOffsetsPerTrigger", str(per)).load())
        .writeStream.foreachBatch(lambda bdf, bid: bdf.count())
        .outputMode("update")
        .option("checkpointLocation", scratch_dir("spwarm_ckpt_"))
        .trigger(processingTime="0 seconds").start())
    drain_available(warm_q, timeout_seconds=600, expected_rows=total)

    results = []
    for label, confs in variants:
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            start_idx = len(rec.progress)
            sdf = (spark.readStream.format("dis")
                   .option("path", log.root).option("stream", log.stream)
                   .option("maxOffsetsPerTrigger", str(per)).load())
            t0 = time.perf_counter()
            if agg == "value":
                q = (make_agg(sdf)
                     .writeStream
                     .foreachBatch(lambda bdf, bid: bdf.count())
                     .outputMode("update")
                     .option("checkpointLocation", scratch_dir("sp_ckpt_"))
                     .trigger(processingTime="0 seconds").start())
            else:
                q = (make_agg(sdf)
                     .writeStream.format("memory")
                     .queryName(f"sp_{uuid.uuid4().hex[:8]}")
                     .outputMode("complete")
                     .option("checkpointLocation", scratch_dir("sp_ckpt_"))
                     .trigger(processingTime="0 seconds").start())
            drain_available(q, timeout_seconds=600, expected_rows=total)
            wall = time.perf_counter() - t0
            time.sleep(1.0)
            rep = {"variant": label, "agg": agg, "sf_dir": sf_dir,
                   "wall_sec": round(wall, 2),
                   **summarize(rec.progress[start_idx:])}
            rep["records_per_sec"] = round(total / wall)
            print(json.dumps(rep), flush=True)
            results.append(rep)
        finally:
            for k in confs:
                if baseline[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, baseline[k])

    print("\n| variant | batches | rows/batch | warm addBatch ms | "
          "state commit ms | wall s | rec/s |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['data_batches']} | "
              f"{r['rows_per_batch']} | {r['warm_addBatch_ms']} | "
              f"{r['warm_state_commit_ms']} | {r['wall_sec']} | "
              f"{r['records_per_sec']} |")


if __name__ == "__main__":
    main()
