"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.001 — the local twin of the driver's CORRECTNESS
gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from spark_streaming_dis_plugin_spark.plans.registry import all_queries

from .oracle import compare, duck_connection

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, s in QUERIES.items() if s.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    compare(df, con, spec.oracle)


def test_every_query_returns_rows(spark, sf_dir):
    """Queries without an oracle still must run and be non-degenerate."""
    for name, spec in QUERIES.items():
        if spec.oracle:
            continue
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"word", "n"}


def test_contract_shape():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    # Every DECLARED query carries an oracle: the driver can never record
    # an err/no_oracle row again (undeclared bench/pytest-only variants
    # like dedup_minhash_lsh_fast stay out of queries() entirely).
    assert set(os_) == set(qs)
    assert len(qs) >= 10
    assert "dedup_minhash_lsh_fast" not in qs
    assert QUERIES["dedup_minhash_lsh_fast"].bench  # still measured


def test_lsh_fast_matches_portable_pairs(spark, sf_dir):
    """The xxhash64 LSH variant must verify the same near-dup pairs as the
    oracle-portable md5 pipeline: the hash family only selects CANDIDATES,
    and exact-Jaccard verification filters both candidate sets to the
    same >= threshold pairs (modulo pairs the bands never surface; on this
    fixture both surface all of them)."""
    fast = QUERIES["dedup_minhash_lsh_fast"].fn(spark, sf_dir)
    slow = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir)
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
    assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))
