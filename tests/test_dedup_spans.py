"""dedup_duplicated_spans kernel tests on a constructed corpus with
known duplicated substrings — pins gram marking, island merge (overlap,
adjacency, gap split) and the reported fractions, independent of the
synthetic testdata's content."""
from __future__ import annotations


def _run(spark, docs_rows, tmp_path):
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs_rows, "doc_id bigint, text string, lang string, "
                   "source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    df = all_queries()["dedup_duplicated_spans"].fn(spark, sf)
    return {r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["tot_tokens"],
                          r["dup_frac"]) for r in df.collect()}


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_run_marks_one_merged_span(spark, tmp_path):
    shared = _words("s", 10)            # 10-token run shared by docs 1+2
    rows = [
        (1, shared + " " + _words("a", 12), "en", "w", 0),
        (2, _words("b", 12) + " " + shared, "en", "w", 0),
        (3, _words("c", 30), "en", "w", 0),  # all-unique doc: absent
    ]
    out = _run(spark, rows, tmp_path)
    # doc 1: grams at positions 0..2 are shared (10-token run, k=8) ->
    # one island covering tokens 0..9 = 10 tokens of 22
    assert out[1] == (1, 10, 22, round(10 / 22, 4))
    # doc 2: same run at positions 12..14 -> tokens 12..21
    assert out[2] == (1, 10, 22, round(10 / 22, 4))
    assert 3 not in out


def test_two_distant_runs_stay_separate_spans(spark, tmp_path):
    r1, r2 = _words("x", 8), _words("y", 8)
    gap = _words("g", 20)
    rows = [
        (1, r1 + " " + gap + " " + r2, "en", "w", 0),
        (2, r1 + " " + _words("h", 20) + " " + r2, "en", "w", 0),
    ]
    out = _run(spark, rows, tmp_path)
    # each doc: two 8-token spans (positions 0 and 28), 36 tokens total
    assert out[1] == (2, 16, 36, round(16 / 36, 4))
    assert out[2] == (2, 16, 36, round(16 / 36, 4))


def test_identical_docs_fully_covered(spark, tmp_path):
    body = _words("t", 16)
    rows = [(1, body, "en", "w", 0), (2, body, "en", "w", 0)]
    out = _run(spark, rows, tmp_path)
    assert out[1] == (1, 16, 16, 1.0)
    assert out[2] == (1, 16, 16, 1.0)


def test_short_docs_below_gram_width_ignored(spark, tmp_path):
    rows = [(1, "only seven words here not eight ok", "en", "w", 0),
            (2, "only seven words here not eight ok", "en", "w", 0)]
    assert _run(spark, rows, tmp_path) == {}


def _run_excision(spark, docs_rows, tmp_path):
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs_rows, "doc_id bigint, text string, lang string, "
                   "source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    df = all_queries()["pipeline_span_excision"].fn(spark, sf)
    return {r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_removed"])
            for r in df.collect()}


def test_excision_cuts_shared_run_keeps_rest(spark, tmp_path):
    shared = _words("s", 10)
    rows = [
        (1, shared + " " + _words("a", 12), "en", "w", 0),
        (2, _words("b", 12) + " " + shared, "en", "w", 0),
        (3, _words("c", 30), "en", "w", 0),
    ]
    out = _run_excision(spark, rows, tmp_path)
    assert out[1] == (_words("a", 12), 12, 10)
    assert out[2] == (_words("b", 12), 12, 10)
    assert out[3] == (_words("c", 30), 30, 0)  # untouched doc passes whole


def test_excision_identical_docs_fully_removed(spark, tmp_path):
    body = _words("t", 16)
    rows = [(1, body, "en", "w", 0), (2, body, "en", "w", 0)]
    out = _run_excision(spark, rows, tmp_path)
    assert out[1] == ("", 0, 16)
    assert out[2] == ("", 0, 16)


def test_fast_hashed_gram_twin_matches_portable(spark, sf_dir):
    """dedup_duplicated_spans_fast (xxhash64 gram posting keys) must
    report exactly what the portable string-key pipeline reports on the
    real fixture corpus — the parity gate that lets the fast row be
    bench-only (same discipline as dedup_ngram_jaccard_fast)."""
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    qs = all_queries()
    slow = qs["dedup_duplicated_spans"].fn(spark, sf_dir).collect()
    fast = qs["dedup_duplicated_spans_fast"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, slow)) == sorted(map(tuple, fast))
