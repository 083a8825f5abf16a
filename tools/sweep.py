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

Completeness invariant (r6 verdict ask #2): every leg's swept query set
must EQUAL the registry's declared set at HEAD — the r6 artifact was
generated before the last 4 declared rows landed and silently covered
218/222. The sweep now exits 1 naming any missing/extra rows, and the
artifact embeds declared_count / swept complete flags so the claim is
self-auditing.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rotation leg (r12 verdict #2): the grading driver has sampled the SAME
# 50 rows for four straight rounds, so builder-side evidence must rotate
# where the driver won't. Each round, ROTATION_N rows chosen by
# hash(round, name) get a SECOND independent check in a fresh process
# under a DIFFERENT engine config (local[32] + 32 shuffle partitions vs
# the matrix legs' local[8] + 8) — config-sensitivity coverage the
# matrix legs never vary (partition-count-dependent bugs: accidental
# order dependence, single-partition assumptions, skew-split behavior).
ROTATION_N = 25
ROTATION_MASTER = "local[32]"
ROTATION_SHUFFLE = "32"


def rotation_names(rnd: int, declared: set[str],
                   n: int = ROTATION_N) -> list[str]:
    """Deterministic per-round rotation set: rank every declared name by
    sha256(f"{rnd}:{name}") and take the first n. Pure function of
    (round, declared set) — auditable, and provably rotates because the
    hash reshuffles the ranking every round (pytest-pinned)."""
    import hashlib

    return sorted(
        sorted(declared),
        key=lambda nm: hashlib.sha256(f"{rnd}:{nm}".encode()).hexdigest()
    )[:n]


def declared_set() -> set[str]:
    """The registry's declared query names at current HEAD (no Spark
    session needed — registration is import-time)."""
    sys.path.insert(0, REPO)
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries
    import __spark_entry__ as E
    names = set(E.queries())
    reg = set(all_queries())
    # queries() is the driver surface; registry rows not exported there
    # (bench/parity twins) are out of sweep scope by design.
    assert names <= reg, sorted(names - reg)
    return names

def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python tools/sweep.py <round-number> [--fast]")
    rnd = int(sys.argv[1])
    fast = "--fast" in sys.argv
    legs = [("UTC", "/root/testdata/sf0.01"),
            ("America/New_York", "/root/testdata/sf0.01")]
    if not fast:
        legs.append(("UTC", "/root/testdata/sf0.1"))
        # Standing fourth leg (r12 verdict #7): sf0.1 x NY ran ad-hoc in
        # r12 and has caught NY-only bugs the other legs missed
        # (dis_segment_stats); it is matrix now, not a commit-message
        # extra.
        legs.append(("America/New_York", "/root/testdata/sf0.1"))

    declared = declared_set()
    matrix: dict[str, dict] = {}
    failed = False
    for tz, sf in legs:
        key = f"{os.path.basename(sf)}-{tz}"
        out = os.path.join(REPO, f".sweep_{key.replace('/', '_')}.json")
        print(f"=== sweep leg {key} ===", flush=True)
        # A sweep leg runs the WHOLE declared registry (236 rows) in one
        # session — far past the grading driver's 50-row shape — and at
        # sf0.1 the default 8g heap accumulates enough broadcast/state
        # residue to OOM around row ~120 (round 8: twice, at the first
        # sizeable SMJ past that point). Size the leg JVM for the
        # machine instead; caller's SPARK_GRAFT_DRIVER_MEM still wins.
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/drive_contract.py"),
             tz, sf, "--json", out],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
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

    # Rotation leg (r12 verdict #2): fresh process, different engine
    # config, deterministic per-round row subset.
    rot_names = rotation_names(rnd, declared)
    # the timezone alternates by round parity, so over two rounds the
    # rotation covers both TZ legs under the alternate engine config
    rot_tz = "America/New_York" if rnd % 2 else "UTC"
    rot_key = f"rotation-sf0.01-{rot_tz}-{ROTATION_MASTER}"
    out = os.path.join(REPO, ".sweep_rotation.json")
    print(f"=== sweep rotation leg {rot_key} ({len(rot_names)} rows) ===",
          flush=True)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    env["SPARK_GRAFT_MASTER"] = ROTATION_MASTER
    env["SPARK_GRAFT_SHUFFLE"] = ROTATION_SHUFFLE
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/drive_contract.py"),
         rot_tz, "/root/testdata/sf0.01", "--json", out,
         "--only", ",".join(rot_names)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env)
    print("\n".join(proc.stdout.strip().splitlines()[-3:]), flush=True)
    if proc.returncode != 0:
        failed = True
    try:
        with open(out) as f:
            rotation = json.load(f)
        os.remove(out)
    except FileNotFoundError:
        failed = True
        rotation = {"err": "no artifact (rotation leg crashed)"}
    rotation["config"] = {"master": ROTATION_MASTER,
                          "shuffle_partitions": int(ROTATION_SHUFFLE),
                          "timezone": rot_tz,
                          "chooser": "first %d of declared ranked by "
                                     "sha256('%d:'+name)"
                                     % (ROTATION_N, rnd),
                          "names": rot_names}
    rot_swept = set(rotation.get("queries", {}))
    rotation["complete"] = rot_swept == set(rot_names)
    if not rotation["complete"]:
        failed = True
        print(f"INCOMPLETE rotation leg: swept {len(rot_swept)} of "
              f"{len(rot_names)}", flush=True)

    # Completeness invariant: each leg must have swept EXACTLY the
    # declared set at this HEAD. Fail loudly, naming the rows.
    completeness: dict[str, dict] = {}
    for key, v in matrix.items():
        swept = set(v.get("queries", {}))
        missing = sorted(declared - swept)
        extra = sorted(swept - declared)
        completeness[key] = {
            "swept": len(swept), "missing": missing, "extra": extra,
            "complete": not missing and not extra}
        if missing or extra:
            failed = True
            print(f"INCOMPLETE leg {key}: missing={missing} extra={extra}",
                  flush=True)

    summary = {k: {"ok": v.get("ok"), "mismatched": v.get("mismatched"),
                   "rows_only": v.get("rows_only"),
                   "flaky": v.get("flaky", []),
                   **completeness.get(k, {})}
               for k, v in matrix.items()}
    # The "all green" claim is COMPUTED from the artifact, never asserted
    # by prose (r11 verdict #2: commit said 317/317x3 while the artifact
    # recorded 316/317 on one leg). any_mismatch covers errored rows too
    # (drive_contract counts a persistent error as mismatched after its
    # one recorded retry).
    any_mismatch = (any((v.get("mismatched") or 0) > 0
                        for v in matrix.values())
                    or (rotation.get("mismatched") or 0) > 0)
    all_green = (not any_mismatch and not failed
                 and all(c["complete"] for c in completeness.values())
                 and rotation.get("complete", False))
    artifact = os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    with open(artifact, "w") as f:
        json.dump({"round": rnd,
                   "declared_count": len(declared),
                   "all_legs_complete": all(
                       c["complete"] for c in completeness.values()),
                   "all_green": all_green,
                   "retry_policy": "errored rows retried once in-leg; both "
                       "attempts recorded per-row (err_attempt1/flaky); "
                       "mismatches never retried",
                   "summary": summary, "matrix": matrix,
                   "rotation": {rot_key: rotation}},
                  f, indent=1, sort_keys=True)
    print(f"wrote {artifact}: declared={len(declared)} "
          f"{json.dumps(summary)}")
    print(summarize(artifact))
    if any_mismatch:
        print("SWEEP NOT GREEN: at least one leg has mismatched rows — "
              "do NOT claim all-green; cite the summarize() line verbatim.",
              flush=True)
    sys.exit(1 if (failed or any_mismatch) else 0)


def summarize(artifact_path: str) -> str:
    """The ONLY sanctioned source of the COVERAGE/commit sweep claim:
    a one-line summary derived strictly from the artifact. Refuses to
    say "green" when any leg records a mismatch or an incomplete set."""
    with open(artifact_path) as f:
        a = json.load(f)
    legs = []
    for key in sorted(a["summary"]):
        s = a["summary"][key]
        ok, mis = s.get("ok") or 0, s.get("mismatched") or 0
        bit = f"{key}: {ok}/{ok + mis}"
        if s.get("flaky"):
            bit += f" ({len(s['flaky'])} flaky, passed on retry: "\
                   f"{','.join(s['flaky'])})"
        if mis:
            bit += " RED"
        if not s.get("complete", True):
            bit += " INCOMPLETE"
        legs.append(bit)
    for key in sorted(a.get("rotation", {})):
        r = a["rotation"][key]
        ok, mis = r.get("ok") or 0, r.get("mismatched") or 0
        bit = f"{key}: {ok}/{ok + mis}"
        if r.get("flaky"):
            bit += f" ({len(r['flaky'])} flaky)"
        if mis:
            bit += " RED"
        if not r.get("complete", True):
            bit += " INCOMPLETE"
        legs.append(bit)
    verdict = "ALL GREEN" if a.get("all_green") else "NOT GREEN"
    return (f"SWEEP r{a['round']}: {verdict} — declared="
            f"{a['declared_count']}; " + "; ".join(legs))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2]))
        sys.exit(0)
    main()
