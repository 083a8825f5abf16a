"""Round-8 ADVICE regression tests.

Covers the four r7 ADVICE items:
1. (medium) streaming ANN ingest must be idempotent under foreachBatch's
   at-least-once replay — a re-executed batch may not duplicate vectors;
2. (low) the TWS first-seen dedup marker is committed only alongside an
   actual emission (a key delivered with only empty chunks stays unseen);
3. (low) the pbvendor staging fingerprint reacts to ANY vendored source
   file changing, not just the two patched files;
4. (low) a machine without the vendor source still reuses a previously
   staged zip instead of rejecting it.
"""
from __future__ import annotations

import os

import pandas as pd
import pytest


# ------------------------------------------------ 1. ANN ingest replay

def test_ivf_ingest_batch_replay_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_streaming_dis_plugin_spark.operators.similarity import (
        _ivf_ingest_batch,
    )

    root = str(tmp_path / "ivf")
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "centroid_id int, ce array<double>")
    # base split lands exactly like the batch build's inverted file
    base = spark.createDataFrame(
        [(100, [0.1, 0.2], 0)], "vec_id bigint, e array<double>, cluster int")
    base.write.parquet(f"{root}/inverted/src=base")

    batch = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [9.0, 9.5])], "vec_id bigint, e array<double>")
    _ivf_ingest_batch(batch, cent, root, batch_id=7)
    first = sorted(
        r["vec_id"] for r in spark.read.parquet(f"{root}/inverted").collect())
    assert first == [1, 2, 100]

    # at-least-once replay of the SAME batch: no duplicates may appear
    _ivf_ingest_batch(batch, cent, root, batch_id=7)
    inv = spark.read.parquet(f"{root}/inverted")
    replay = sorted(r["vec_id"] for r in inv.collect())
    assert replay == [1, 2, 100]
    # assignment went to the nearest centroid and base rows were untouched
    got = {r["vec_id"]: r["cluster"] for r in inv.collect()}
    assert got == {100: 0, 1: 0, 2: 1}


def test_ivf_ingest_distinct_batches_accumulate(spark, tmp_path):
    from spark_streaming_dis_plugin_spark.operators.similarity import (
        _ivf_ingest_batch,
    )

    root = str(tmp_path / "ivf2")
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0])], "centroid_id int, ce array<double>")
    spark.createDataFrame(
        [], "vec_id bigint, e array<double>, cluster int"
    ).write.parquet(f"{root}/inverted/src=base")
    for bid, vid in ((0, 1), (1, 2)):
        _ivf_ingest_batch(
            spark.createDataFrame([(vid, [1.0, 1.0])],
                                  "vec_id bigint, e array<double>"),
            cent, root, batch_id=bid)
    assert sorted(
        r["vec_id"] for r in
        spark.read.parquet(f"{root}/inverted").collect()) == [1, 2]


# ------------------------------------- 2. first-seen marker on emit only

def test_first_seen_value_skips_empty_chunks():
    from spark_streaming_dis_plugin_spark.streaming.stateful import (
        _first_seen_value,
    )

    assert _first_seen_value(iter([])) is None
    assert _first_seen_value(iter([pd.DataFrame({"value": []})])) is None
    assert _first_seen_value(iter([
        pd.DataFrame({"value": []}),
        pd.DataFrame({"value": ["x", "y"]}),
    ])) == "x"


def test_first_seen_marker_not_set_without_emission():
    """The processor's handleInputRows must leave the seen marker unset
    when only empty chunks arrive, so a later real occurrence emits."""
    from spark_streaming_dis_plugin_spark.streaming import stateful

    class FakeState:
        def __init__(self):
            self.set = False

        def exists(self):
            return self.set

        def update(self, _):
            self.set = True

    class FakeHandle:
        def __init__(self, st):
            self._st = st

        def getValueState(self, name, schema):
            return self._st

    # reach the nested processor through the public builder by stubbing
    # transformWithStateInPandas to hand us the processor instance
    captured = {}

    class FakeGrouped:
        def transformWithStateInPandas(self, statefulProcessor, **kw):
            captured["p"] = statefulProcessor
            return None

    class FakeDF:
        def select(self, *a, **k):
            return self

        def groupBy(self, *a, **k):
            return FakeGrouped()

    stateful.dedup_first_seen_tws(FakeDF())
    proc = captured["p"]
    st = FakeState()
    proc.init(FakeHandle(st))

    out = list(proc.handleInputRows(("k",), iter([pd.DataFrame({"value": []})]),
                                    None))
    assert out == [] and st.set is False  # nothing emitted -> stays unseen

    out = list(proc.handleInputRows(("k",),
                                    iter([pd.DataFrame({"value": ["v1"]})]),
                                    None))
    assert len(out) == 1 and st.set is True  # emitted exactly alongside set

    out = list(proc.handleInputRows(("k",),
                                    iter([pd.DataFrame({"value": ["v1"]})]),
                                    None))
    assert out == []  # suppressed thereafter


# --------------------------------------------- 3+4. pbvendor fingerprint

def _make_vendor_tree(base):
    src = base / "protobuf"
    src.mkdir(parents=True)
    (src / "runtime_version.py").write_text("MAJOR=6\n")
    (src / "__init__.py").write_text("")
    (src / "descriptor_pool.py").write_text("x = 1\n")
    return src


def test_vendor_fingerprint_sees_whole_tree(tmp_path, monkeypatch):
    from spark_streaming_dis_plugin_spark.streaming import pbvendor

    src = _make_vendor_tree(tmp_path)
    monkeypatch.setattr(pbvendor, "_VENDOR_SOURCES", (str(src),))
    fp0 = pbvendor._vendor_fingerprint()
    assert fp0 is not None

    # a change to a file the old two-file hash never read must be seen
    (src / "descriptor_pool.py").write_text("x = 2; y = 3\n")
    fp1 = pbvendor._vendor_fingerprint()
    assert fp1 != fp0

    # and a brand-new file too
    (src / "new_module.py").write_text("z = 1\n")
    assert pbvendor._vendor_fingerprint() not in (fp0, fp1)


def test_staged_zip_accepted_without_vendor_source(tmp_path, monkeypatch):
    from spark_streaming_dis_plugin_spark.streaming import pbvendor

    site = tmp_path / "site"
    site.mkdir()
    (site / pbvendor._SITE_ZIP).write_bytes(b"PK\x05\x06" + b"\0" * 18)
    (site / pbvendor._SITE_PTH).write_text(pbvendor._SITE_ZIP + "\n")
    (site / pbvendor._SITE_MANIFEST).write_text("abcd1234\n")
    monkeypatch.setattr(pbvendor, "_site_dirs", lambda: [str(site)])

    # no vendor source on this machine -> fingerprint None -> the staged
    # copy must still be reusable (no rebuild is possible anyway)
    assert pbvendor._find_staged_site_zip(None) == str(
        site / pbvendor._SITE_ZIP)
    # with a source present, a stale manifest still forces a rebuild
    assert pbvendor._find_staged_site_zip("ffff0000") is None


def test_stale_manifest_rejected_without_pth(tmp_path, monkeypatch):
    from spark_streaming_dis_plugin_spark.streaming import pbvendor

    site = tmp_path / "site"
    site.mkdir()
    (site / pbvendor._SITE_ZIP).write_bytes(b"PK\x05\x06" + b"\0" * 18)
    monkeypatch.setattr(pbvendor, "_site_dirs", lambda: [str(site)])
    assert pbvendor._find_staged_site_zip(None) is None  # no .pth staged
