"""Pins for the r13 unfiltered-shingle scan discipline.

_shingle_sets' size(sh) > 0 guard, when present, is pushed below the
tokenize/shingle projections and re-evaluates the full pipeline per
scan row (the r13 plan audit measured the pushed condition inlining
the tokenize 6x). The jaccard-family consumers therefore take
filtered=False and rely on explode_outer + equi-join null semantics to
drop empty documents instead. These tests pin that the two
formulations are output-identical on a corpus that actually contains
the edge cases (empty text, whitespace-only text, null text), and that
the pushed full-pipeline filter condition is gone from the plans.
"""
from __future__ import annotations

from pyspark.sql import functions as F


def _edge_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),          # exact dup
        (3, "alpha beta gamma delta epsilon eta"),           # near dup
        (4, ""),                                             # empty
        (5, "   "),                                          # whitespace
        (6, None),                                           # null text
        (7, "one"),                                          # 1 token -> no bigram
        (8, "totally different words here now folks"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_jaccard_pairs_identical_with_edge_docs(spark):
    """_jaccard_pairs (filtered=False + explode_outer) must equal the
    filtered + plain-explode formulation on empty/null/1-token docs."""
    from spark_streaming_dis_plugin_spark.operators.dedup import (
        JACCARD_THRESHOLD, _jaccard_pairs, _shingle_sets)

    docs = _edge_docs(spark)
    got = sorted(_jaccard_pairs(docs).collect())

    # reference: the pre-r13 filtered/plain-explode shape
    sets = _shingle_sets(docs, filtered=True)
    posting = (sets.select("doc_id", F.size("sh").alias("n"),
                           F.explode("sh").alias("s")))
    pa, pb = posting.alias("a"), posting.alias("b")
    inter = (pa.join(pb, (F.col("a.s") == F.col("b.s"))
                     & (F.col("a.doc_id") < F.col("b.doc_id"))
                     & (5 * F.least("a.n", "b.n")
                        >= 4 * F.greatest("a.n", "b.n")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("both_n"),
                  F.min("a.n").alias("na"), F.min("b.n").alias("nb")))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb")
                                            - F.col("both_n"))
    want = sorted(inter.select("doc_a", "doc_b", jac.alias("jaccard"))
                  .where(F.col("jaccard") >= JACCARD_THRESHOLD).collect())
    assert got == want
    assert (1, 2) in [(r.doc_a, r.doc_b) for r in got]


def test_with_signature_still_excludes_empty_docs(spark):
    """_with_signature's contract (a signature row only for docs with a
    non-empty shingle set) survives moving the guard above the persist:
    empty/null/1-token docs must not appear."""
    from spark_streaming_dis_plugin_spark.operators.dedup import (
        _with_signature)

    sig = _with_signature(_edge_docs(spark))
    ids = sorted(r.doc_id for r in sig.select("doc_id").collect())
    assert ids == [1, 2, 3, 8]


def test_no_pushed_shingle_pipeline_filter_in_posting_plan(spark):
    """The posting-side scan filter must not re-derive the shingle
    pipeline: no split() inside a Filter condition below the projections
    (the pushed guard's fingerprint)."""
    from spark_streaming_dis_plugin_spark.operators.dedup import (
        _jaccard_pairs)

    plan = (_jaccard_pairs(_edge_docs(spark))
            ._jdf.queryExecution().optimizedPlan().toString())
    for line in plan.splitlines():
        if line.strip().startswith("Filter") and "split(" in line:
            raise AssertionError(
                "pushed filter re-derives the tokenize pipeline:\n" + line)
