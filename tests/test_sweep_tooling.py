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
