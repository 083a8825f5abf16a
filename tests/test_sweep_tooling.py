"""Sweep-artifact integrity (r11 verdict #2): the 'all green' claim is
COMPUTED from the artifact, never asserted by prose — r11 shipped a
commit message saying 317/317x3 while its own SWEEP_r11.json recorded
316/317 on one leg. These pin tools/sweep.summarize() as the only
sanctioned source of the COVERAGE sweep line: it must refuse to say
green whenever any leg records a mismatch or an incomplete set, and
must surface the per-row retry evidence (flaky rows) so a
pass-after-retry is never silently upgraded to clean."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _summarize(tmp_path, artifact: dict) -> str:
    spec = importlib.util.spec_from_file_location(
        "sweep_mod", os.path.join(REPO, "tools", "sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sweep_mod"] = spec.loader.exec_module(spec.loader
                                                       and mod) or mod
    path = str(tmp_path / "SWEEP_test.json")
    with open(path, "w") as f:
        json.dump(artifact, f)
    return mod.summarize(path)


def _artifact(legs: dict, declared=320, all_green=None) -> dict:
    summary = {}
    for key, (ok, mis, flaky, complete) in legs.items():
        summary[key] = {"ok": ok, "mismatched": mis, "rows_only": 0,
                        "flaky": flaky, "swept": ok + mis,
                        "missing": [], "extra": [], "complete": complete}
    if all_green is None:
        all_green = (all(v[1] == 0 for v in legs.values())
                     and all(v[3] for v in legs.values()))
    return {"round": 12, "declared_count": declared,
            "all_legs_complete": all(v[3] for v in legs.values()),
            "all_green": all_green, "summary": summary, "matrix": {}}


def test_summarize_green_when_all_legs_clean(tmp_path):
    line = _summarize(tmp_path, _artifact({
        "sf0.01-UTC": (320, 0, [], True),
        "sf0.01-America/New_York": (320, 0, [], True),
        "sf0.1-UTC": (320, 0, [], True)}))
    assert line.startswith("SWEEP r12: ALL GREEN")
    assert "RED" not in line


def test_summarize_refuses_green_on_any_mismatch(tmp_path):
    line = _summarize(tmp_path, _artifact({
        "sf0.01-UTC": (319, 1, [], True),
        "sf0.1-UTC": (320, 0, [], True)}))
    assert "NOT GREEN" in line
    assert "sf0.01-UTC: 319/320 RED" in line


def test_summarize_refuses_green_on_incomplete_leg(tmp_path):
    line = _summarize(tmp_path, _artifact({
        "sf0.01-UTC": (318, 0, [], False)}))
    assert "NOT GREEN" in line
    assert "INCOMPLETE" in line


def test_summarize_names_flaky_rows(tmp_path):
    """A row that passed only on retry stays visible in the claim."""
    line = _summarize(tmp_path, _artifact({
        "sf0.01-UTC": (320, 0, ["dis_partition_add_streamed"], True)}))
    assert "ALL GREEN" in line          # retry-pass is still a pass...
    assert "flaky" in line              # ...but the evidence is cited
    assert "dis_partition_add_streamed" in line


def test_summarize_r11_artifact_is_not_green():
    """The artifact that motivated this tooling must read NOT GREEN."""
    spec = importlib.util.spec_from_file_location(
        "sweep_mod2", os.path.join(REPO, "tools", "sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    line = mod.summarize(os.path.join(REPO, "SWEEP_r11.json"))
    assert "NOT GREEN" in line
    assert "sf0.01-UTC: 316/317 RED" in line


def _sweep_mod():
    spec = importlib.util.spec_from_file_location(
        "sweep_mod3", os.path.join(REPO, "tools", "sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotation_chooser_is_deterministic_and_rotates():
    """r12 verdict #2: the per-round rotation set is a pure function of
    (round, declared) — same inputs, same set — and PROVABLY rotates:
    consecutive rounds pick substantially different subsets, and over a
    handful of rounds the union covers far more than one round's N."""
    mod = _sweep_mod()
    declared = {f"q{i:03d}" for i in range(321)}
    r13a = mod.rotation_names(13, declared)
    r13b = mod.rotation_names(13, declared)
    assert r13a == r13b                       # deterministic
    assert len(r13a) == mod.ROTATION_N
    assert set(r13a) <= declared
    r14 = mod.rotation_names(14, declared)
    overlap = len(set(r13a) & set(r14))
    # hash-ranked: expected overlap ~ N^2/|declared| ≈ 2; anything near
    # N would mean the set is NOT rotating
    assert overlap < mod.ROTATION_N // 2, (overlap, r13a, r14)
    union = set()
    for rnd in range(13, 21):
        union |= set(mod.rotation_names(rnd, declared))
    assert len(union) > 3 * mod.ROTATION_N    # coverage accumulates


def test_rotation_chooser_tracks_declared_changes():
    """Adding a declared row reshuffles fairly: the chooser never
    crashes on set growth and stays within the declared set."""
    mod = _sweep_mod()
    declared = {f"q{i:03d}" for i in range(50)}
    base = mod.rotation_names(13, declared)
    grown = mod.rotation_names(13, declared | {"brand_new_row"})
    assert set(base) <= declared
    assert set(grown) <= declared | {"brand_new_row"}
    assert len(grown) == mod.ROTATION_N


def test_summarize_includes_rotation_leg_and_refuses_green_on_red(tmp_path):
    """A red rotation row must flip the whole claim to NOT GREEN even
    when all matrix legs are clean."""
    mod = _sweep_mod()
    art = {
        "round": 13, "declared_count": 321, "all_green": False,
        "summary": {"sf0.01-UTC": {"ok": 321, "mismatched": 0,
                                   "flaky": [], "complete": True}},
        "rotation": {"rotation-sf0.01-UTC-local[32]": {
            "ok": 24, "mismatched": 1, "flaky": [], "complete": True}},
    }
    path = str(tmp_path / "SWEEP_rot.json")
    with open(path, "w") as f:
        json.dump(art, f)
    line = mod.summarize(path)
    assert "NOT GREEN" in line
    assert "rotation-sf0.01-UTC-local[32]: 24/25 RED" in line
