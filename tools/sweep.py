"""Full-coverage sweep artifact (r5 verdict ask #3): run the driver
contract over the SF/TZ matrix and merge the per-query results into
SWEEP_r{N}.json at the repo root, so "all declared queries green" is an
auditable in-repo artifact rather than a commit-message claim.

Usage: python tools/sweep.py <round-number> [--fast]

Matrix: sf0.01 x {UTC, America/New_York} (the driver's scale, the two
timezones that have caught real bugs) plus sf0.1 x UTC (the bench scale,
catches type/perf cliffs the small SFs hide). --fast drops the sf0.1 leg.
Each leg is a SUBPROCESS so every run gets the driver's fresh-session
shape (JVM launched after env staging, non-reused catalogs).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python tools/sweep.py <round-number> [--fast]")
    rnd = int(sys.argv[1])
    fast = "--fast" in sys.argv
    legs = [("UTC", "/root/testdata/sf0.01"),
            ("America/New_York", "/root/testdata/sf0.01")]
    if not fast:
        legs.append(("UTC", "/root/testdata/sf0.1"))

    matrix: dict[str, dict] = {}
    failed = False
    for tz, sf in legs:
        key = f"{os.path.basename(sf)}-{tz}"
        out = os.path.join(REPO, f".sweep_{key.replace('/', '_')}.json")
        print(f"=== sweep leg {key} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/drive_contract.py"),
             tz, sf, "--json", out],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
        print(tail, flush=True)
        if proc.returncode != 0:
            failed = True
        try:
            with open(out) as f:
                matrix[key] = json.load(f)
            os.remove(out)
        except FileNotFoundError:
            failed = True
            matrix[key] = {"err": "no artifact (contract crashed)",
                           "tail": tail}

    summary = {k: {"ok": v.get("ok"), "mismatched": v.get("mismatched"),
                   "rows_only": v.get("rows_only")}
               for k, v in matrix.items()}
    artifact = os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    with open(artifact, "w") as f:
        json.dump({"round": rnd, "summary": summary, "matrix": matrix},
                  f, indent=1, sort_keys=True)
    print(f"wrote {artifact}: {json.dumps(summary)}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
