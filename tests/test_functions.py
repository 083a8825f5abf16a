"""Property tests for the portable expression helpers."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from spark_streaming_dis_plugin_spark.functions.portable import (
    TOKEN_SPLIT_RE, portable_hash, tokens, word_shingles,
)

# ASCII-ish text including punctuation and runs of separators
TEXT = st.text(
    alphabet=st.sampled_from(list("abc XY1_-.,!")), min_size=0, max_size=60)


def _py_tokens(s: str) -> list[str]:
    import re
    return [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t != ""]


def _py_shingles(s: str, n: int) -> list[str]:
    toks = _py_tokens(s)
    out, seen = [], set()
    for i in range(max(len(toks) - n + 1, 0)):
        sh = " ".join(toks[i:i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(1, 4))
def test_word_shingles_match_python_reference(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (df.select("text", tokens("text").alias("tk"))
           .select("text", word_shingles("tk", n).alias("sh"))
           .collect())
    for row in got:
        assert list(row["sh"]) == _py_shingles(row["text"], n), (
            row["text"], n)


def test_portable_hash_matches_duckdb(spark):
    import duckdb
    values = ["", "a", "hello world", "ünïcode", "x" * 500]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {r["v"]: r["h"] for r in
           df.select("v", portable_hash(F.col("v")).alias("h")).collect()}
    con = duckdb.connect()
    for v in values:
        expected = con.sql(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)",
            params=[v]).fetchone()[0]
        assert got[v] == expected, v
