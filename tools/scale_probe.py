"""Scale probe (r11 verdict #4): run the heaviest registry rows at
sf0.1 AND a derived sf1 (10x rows — tools/make_sf1.py) under the SAME
session config, and report the wall-time ratio per row.

Interpretation: a bucketed/blocked plan should scale ~linearly in input
size (ratio ~<= 15 for 10x data on a fixed-core box: 10x work plus
constant-factor growth in shuffle/setup). Connected components adds an
expected superlinear term — its star-contraction rounds grow O(log n)
and each round is a full keyed join. A ratio well past ~1.5x-linear
flags a plan whose cost curve is NOT the one its docstring claims, at
the only scale this container can test.

Usage:
  python tools/make_sf1.py            # once
  python tools/scale_probe.py [--iters N] [rows...]

Defaults to the 6 rows named by the r11 verdict. Prints one JSON line
(for BENCH_NOTES) plus a markdown table.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_ROWS = [
    "dedup_cc_two_phase",
    "dedup_end_to_end",
    "dedup_jaccard_prefix_filter",
    "dedup_ngram_jaccard_capped",
    "sim_ivf_build",
    "text_bm25_search",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1")


def main() -> None:
    argv = list(sys.argv[1:])
    iters = 3
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        del argv[i:i + 2]
    rows = argv or DEFAULT_ROWS
    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run: python tools/make_sf1.py")

    from spark_streaming_dis_plugin_spark.plans.registry import all_queries
    from spark_streaming_dis_plugin_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("scale-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    missing = [r for r in rows if r not in specs]
    if missing:
        sys.exit(f"unknown rows: {missing}")

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        samples = []
        n = -1
        for i in range(iters + 1):  # first pass = uncounted warmup
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            n = df.count()
            if i > 0:
                samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[len(samples) // 2], n

    out: dict[str, dict] = {}
    md = ["| row | sf0.1 s | sf1 s | ratio (10x data) | rows 0.1->1 |",
          "|---|---|---|---|---|"]
    for name in rows:
        t01, n01 = run(name, SF01)
        t1, n1 = run(name, SF1)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        out[name] = {"sf0.1_sec": round(t01, 2), "sf1_sec": round(t1, 2),
                     "ratio": ratio, "sf0.1_rows": n01, "sf1_rows": n1}
        md.append(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio} | "
                  f"{n01} -> {n1} |")
        print(md[-1], flush=True)
    print("\n".join(md[:2] + md[2:]))
    print(json.dumps({"metric": "scale_probe_sf0.1_to_sf1",
                      "iters": iters, "cpus": cpus, "rows": out}))


if __name__ == "__main__":
    main()
