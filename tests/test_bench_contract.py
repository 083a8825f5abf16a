"""Bench stdout contract (VERDICT r6 #1, and its pinned regression test).

Round 6's driver recorded "parsed": null because bench.py emitted ONE
JSON line carrying per-query telemetry that outgrew the driver's ~2 KB
stdout-tail capture. The contract is now structural: the LAST stdout
line is a compact headline that must survive a 2 KB tail truncation and
json.loads; telemetry rides an earlier line + BENCH_TELEMETRY.json.
These tests exercise the exact failure mode the driver has: keep only
the last 2048 bytes, take the final line, parse it.

No SparkSession needed — the formatting layer is pure."""

from __future__ import annotations

import json

import pytest

import bench
from spark_streaming_dis_plugin_spark.plans.registry import all_queries

TAIL_BYTES = 2048  # the driver's approximate stdout-capture window


def _realistic_headline() -> dict:
    """Headline with the CURRENT benched registry set — so this test
    fails (loudly, here) if growing the bench set ever pushes the line
    past the driver-capture budget, instead of silently nulling the
    round's bench file again."""
    benched = sorted(n for n, s in all_queries().items() if s.bench)
    assert benched, "registry lost its benched set?"
    return {
        "metric": "headline_queries_total_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": {n: 99.99 for n in benched},  # worst-case 2-dp widths
        "sf": 0.1,
        "streaming_throughput": {
            "records": 600572,
            "records_per_sec_single_batch": 35537.9,
            "drain_sec_single_batch": 16.899,
            "data_batches_single_batch": 1,
            "records_per_sec_six_batches": 3521.4,
            "drain_sec_six_batches": 170.548,
            "data_batches_six_batches": 6,
        },
        "comparable_to_prev_sec": {
            "prev": "r10", "sec": 9999.99, "prev_sec": 9999.99,
            "n": len(benched),
            "protocol_excluded": ["dis_ann_retrain_streamed"],
        },
    }


def _realistic_telemetry() -> dict:
    benched = sorted(n for n, s in all_queries().items() if s.bench)
    return {
        "cpus": 32, "os_cpu_count": 32,
        "loadavg_start": [31.9, 30.1, 22.2],
        "loadavg_end": [30.0, 29.8, 23.0],
        "startup_sec": 21.5, "wall_total_sec": 400.0,
        "sys_cpu_busy_sec": 2301.2, "cpu_stall_sec": 3.9,
        "cpu_steal_sec": 227.0,
        "per_query": {n: {"wall_all_iters": 99.999,
                          "sys_cpu_busy": 999.99,
                          "cpu_stall": 9.999} for n in benched},
    }


def test_headline_survives_driver_tail_truncation():
    tel_line, head_line = bench.format_output(
        _realistic_headline(), _realistic_telemetry())
    stdout = tel_line + "\n" + head_line + "\n"
    tail = stdout.encode()[-TAIL_BYTES:].decode(errors="replace")
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    parsed = json.loads(last)  # exactly what the driver does
    assert parsed["metric"] == "headline_queries_total_sec"
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf",
                           "streaming_throughput",
                           "comparable_to_prev_sec"}
    assert len(parsed["queries"]) == sum(
        1 for s in all_queries().values() if s.bench)


def test_headline_line_under_budget_with_current_bench_set():
    _, head_line = bench.format_output(
        _realistic_headline(), _realistic_telemetry())
    n = len(head_line.encode())
    assert n <= bench.HEADLINE_MAX_BYTES, (
        f"headline {n}B > {bench.HEADLINE_MAX_BYTES}B — the benched set "
        "grew past the driver-capture budget; trim it or shorten names")


def test_oversize_headline_raises_not_truncates():
    huge = _realistic_headline()
    huge["queries"] = {f"query_with_a_rather_long_name_{i:04d}": 99.999
                      for i in range(200)}
    with pytest.raises(ValueError, match="driver-capture budget"):
        bench.format_output(huge, {})


def test_telemetry_excluded_from_headline_line():
    tel_line, head_line = bench.format_output(
        _realistic_headline(), _realistic_telemetry())
    assert "per_query" not in head_line
    assert "telemetry" not in json.loads(head_line)
    assert "per_query" in tel_line  # telemetry still emitted, earlier


def test_cpu_busy_excludes_guest_fields():
    """r6 ADVICE #4: busy must be user+nice+system+irq+softirq+steal —
    guest/guest_nice are already inside user/nice on KVM and would
    double-count. Parse /proc/stat both ways and pin the relation."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    busy = bench._cpu_busy_sec()
    assert busy is not None
    expected = (vals[0] + vals[1] + vals[2] + sum(vals[5:8])) / bench._CLK
    # re-read skew: the second parse may tick forward slightly
    assert abs(busy - expected) < 5.0
    if len(vals) > 9 and vals[8] > 0:
        naive = (sum(vals) - vals[3] - vals[4]) / bench._CLK
        assert busy < naive  # guest time not double-counted


def test_comparable_to_prev_reads_latest_round_file(tmp_path):
    """_comparable_to_prev sums the intersection with the HIGHEST
    BENCH_r*.json, excludes protocol-tagged rows from both sums, and
    degrades to None (never raises) on missing/corrupt files."""
    import os

    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"queries": {"a": 1.0, "b": 2.0, "proto": 30.0}}}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"parsed": {"queries": {"a": 1.5, "c": 4.0, "proto": 28.0}}}))
    got = bench._comparable_to_prev(
        {"a": 1.2, "b": 9.9, "proto": 31.0, "d": 7.0},
        {"proto"}, str(tmp_path))
    assert got == {"prev": "r10", "sec": 1.2, "prev_sec": 1.5, "n": 1,
                   "protocol_excluded": ["proto"]}

    assert bench._comparable_to_prev({"a": 1.0}, set(),
                                     str(tmp_path / "empty")) is None
    (tmp_path / "BENCH_r11.json").write_text("{not json")
    assert bench._comparable_to_prev({"a": 1.0}, set(),
                                     str(tmp_path)) is None
    # the real repo root has BENCH_r*.json and a benched registry whose
    # names overlap previous rounds — the field must materialize there
    here = os.path.dirname(os.path.abspath(bench.__file__))
    benched = {n: 1.0 for n, s in all_queries().items() if s.bench}
    live = bench._comparable_to_prev(benched, set(), here)
    assert live is not None and live["n"] > 30
