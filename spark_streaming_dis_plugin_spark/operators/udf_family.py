"""UDF-family surface: the escape hatches, declared and measured.

The engine's rule is "built-in Column expressions first" (every hot-path
operator in this repo is JVM-side), but a complete Spark surface includes
the UDF tiers users reach for when built-ins genuinely cannot express the
logic. Each tier is declared here as an oracle-checked query so its
semantics — and its cost — are visible:

- GROUPED_AGG pandas UDF: a vectorized UDAF (Arrow-batched per group),
  usable in groupBy and windows. ~10-100x faster than row-at-a-time UDAFs.
- scalar Arrow-optimized Python UDF registered for SQL: the reference's
  users write SQL against the stream (SURVEY §2b); a registered UDF makes
  that SQL extensible. Row-at-a-time semantics, Arrow transfer.

Both oracles compute the same values with pure SQL — the UDFs here are
deliberately simple so the *mechanism* (registration, grouping, Arrow
transfer, null handling) is what's verified, not novel math.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.portable import tokens_sql
from ..plans.registry import register
from ..tables import load


def _grouped_agg_udfs():
    """GROUPED_AGG pandas UDFs, built lazily (pandas_udf type resolution
    needs an active session). Spark disallows mixing a group-agg pandas
    UDF with JVM aggregates in one agg(), so the count is a pandas UDAF
    too — both series arrive in the same Arrow batch per group."""
    @pandas_udf("double")
    def spread(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @pandas_udf("long")
    def cnt(v: pd.Series) -> int:
        return int(len(v))

    return spread, cnt


@register(
    "grouped_agg_pandas_udaf",
    oracle="""
    SELECT c_nationkey,
           round(MAX(c_acctbal) - MIN(c_acctbal), 2) + 0.0 AS bal_spread,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("udf", "pandas", "grouped-agg"))
def grouped_agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF as a first-class aggregate: one Arrow batch
    per (group, column), partial aggregation is NOT available (the UDAF
    sees whole groups), so the plan shuffles rows — the documented cost
    vs a built-in max-min, which aggregates map-side. Spread is exact in
    double (max/min are exact row values; one subtraction), so round(2)
    matches the oracle bit-for-bit."""
    customer = load(spark, sf_dir, "customer")
    spread, cnt = _grouped_agg_udfs()
    return (customer.groupBy("c_nationkey")
            .agg((F.round(spread("c_acctbal"), 2) + 0.0)
                 .alias("bal_spread"),
                 cnt("c_custkey").alias("n")))


@register(
    "sql_registered_udf",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 10000 THEN 'medium'
                ELSE 'small' END AS bucket
    FROM orders
    """,
    tags=("udf", "sql", "scalar"))
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python UDF registered into the SQL namespace and invoked from
    spark.sql() — the extension path for SQL-first users. Arrow-optimized
    (useArrow=True) so transfer is batched; still per-row Python — kept
    off every hot path in this repo, declared here because the surface
    must exist and stay verified."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")

    def bucket(price: float) -> str:
        return ("large" if price >= 100000
                else "medium" if price >= 10000 else "small")

    spark.udf.register("price_bucket",
                       F.udf(bucket, "string", useArrow=True))
    return spark.sql(
        "SELECT o_orderkey, price_bucket(o_totalprice) AS bucket "
        "FROM orders_v")


@register(
    "sql_udtf_chunks",
    oracle="""
    SELECT d.doc_id, c.chunk_idx, c.n_words, c.chunk_text
    FROM documents d, LATERAL (
      SELECT i AS chunk_idx,
             len(tk[(i*16+1):(i*16+16)]) AS n_words,
             array_to_string(tk[(i*16+1):(i*16+16)], ' ') AS chunk_text
      FROM (SELECT list_filter(string_split_regex(lower(d.text),
                     '[^a-zA-Z0-9_]+'), t -> t != '') AS tk),
           LATERAL (SELECT unnest(range(CAST(ceil(len(tk)/16.0) AS BIGINT)))
                    AS i)
    ) c
    """,
    tags=("udf", "udtf", "sql", "lateral"))
def sql_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python USER-DEFINED TABLE FUNCTION (Spark 3.5+ udtf API) — the
    one-row-to-many-rows escape hatch, registered into SQL and invoked
    with LATERAL so each document expands into its 16-word chunks. The
    tier above scalar UDFs for structured generation (chunkers,
    parsers, samplers); like sql_registered_udf the math is deliberately
    simple so the MECHANISM (class-based UDTF, yield-per-row, SQL
    lateral correlation, schema declaration) is what's verified.

    Scale note: a UDTF runs row-at-a-time in Python — this registration
    is the coverage row for the API surface; the engine's production
    chunker is the pure-Column chunk_documents/text_boilerplate_strip
    segmentation (JVM codegen). Spark plans the LATERAL as a
    Generate-style expansion, partition-parallel, no shuffle."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, n_words bigint, chunk_text string")
    class ChunkWords:
        def eval(self, text: str):
            toks = [t for t in re.split(r"[^a-zA-Z0-9_]+", text.lower())
                    if t]
            for i in range(-(-len(toks) // 16) if toks else 0):
                chunk = toks[i * 16:(i + 1) * 16]
                yield i, len(chunk), " ".join(chunk)

    spark.udtf.register("chunk_words", ChunkWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.n_words, c.chunk_text
        FROM documents_v d, LATERAL chunk_words(d.text) c
    """)


@register(
    "sql_variant_payload",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
             AS k_bucket
    FROM events
    """,
    tags=("udf", "variant", "json", "spark4"))
def sql_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through the VARIANT type (Spark 4):
    parse_json into an open-schema variant column, then typed extraction
    with variant_get — the modern replacement for get_json_object string
    plucking (variant keeps a parsed binary form, so repeated extraction
    doesn't re-parse, and type casts are part of the path expression).
    The oracle computes the same values via DuckDB's JSON functions —
    VARIANT is an encoding choice, not a semantics change, which is
    exactly what the cross-engine equality pins.

    Scale: parse once per row, extract many times — at 100 TB the win
    over get_json_object grows with the number of extracted fields;
    fully row-local, pushdown-friendly."""
    events = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_bucket"))


@register(
    "json_corrupt_handling",
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k,
           event_id % 7 = 0 AS is_corrupt
    FROM events
    """,
    tags=("udf", "json", "error-handling", "permissive"))
def json_corrupt_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MALFORMED-PAYLOAD semantics — what a real ingest pipeline meets
    hourly: a deterministic slice of payloads is corrupted (prefix
    garbage, so neither engine can partially parse it) and parsed with
    from_json in PERMISSIVE mode + columnNameOfCorruptRecord: bad rows
    survive with NULL fields and the raw payload captured in the corrupt
    column (the quarantine-for-replay pattern) instead of failing the
    job, and the corrupt flag must line up exactly with the corruption
    rule. FAILFAST/DROPMALFORMED are the same option surface; PERMISSIVE
    is the only one whose output is a total function of the input, hence
    the declared row.

    Scale: row-local parse, no shuffle; the corrupt column keeps
    quarantined payloads in-band so the replay join needs no side
    channel."""
    events = load(spark, sf_dir, "events")
    corrupted = F.when(F.col("event_id") % 7 == 0,
                       F.concat(F.lit("!"), F.col("props"))) \
        .otherwise(F.col("props"))
    parsed = F.from_json(corrupted, "k BIGINT, _corrupt STRING",
                         {"mode": "PERMISSIVE",
                          "columnNameOfCorruptRecord": "_corrupt"})
    return events.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed["_corrupt"].isNotNull().alias("is_corrupt"))


ARROW_STATS_SCHEMA = ("doc_id bigint, n_bytes bigint, n_tokens bigint, "
                      "mean_token_len double")


def _arrow_token_stats(batches):
    """pyarrow.compute kernel: per-doc byte length, token count, and mean
    token length — entirely columnar, no pandas materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        toks = pc.split_pattern_regex(batch.column("text"), "[^a-zA-Z0-9_]+")
        flat_filtered = pc.list_flatten(
            toks)  # per-list aggregation below uses offsets
        # tokens include empties from leading/trailing separators; count
        # and length-sum must ignore them, exactly like tokens_sql.
        nonempty = pc.not_equal(flat_filtered, "")
        lens = pc.binary_length(flat_filtered)
        # re-aggregate flat arrays back per row via list parent indices
        idx = pc.list_parent_indices(toks)
        tbl = pa.table({
            "i": idx,
            "keep": nonempty,
            "len": lens,
        })
        grouped = tbl.group_by("i").aggregate([
            ("keep", "sum"), ("len", "sum"),
        ])
        import numpy as np
        n = len(batch)
        n_tok = np.zeros(n, dtype="int64")
        len_sum = np.zeros(n, dtype="int64")
        gi = grouped.column("i").to_numpy()
        n_tok[gi] = grouped.column("keep_sum").to_numpy()
        # len_sum counts empty tokens too, but empties add 0 bytes
        len_sum[gi] = grouped.column("len_sum").to_numpy()
        out = pa.record_batch({
            "doc_id": batch.column("doc_id"),
            "n_bytes": pc.binary_length(batch.column("text"))
                         .cast(pa.int64()),
            "n_tokens": pa.array(n_tok),
            "mean_token_len": pa.array(
                np.where(n_tok > 0, len_sum / np.maximum(n_tok, 1),
                         0.0)),
        })
        yield out


@register(
    "arrow_map_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens,
           CASE WHEN len({tokens_sql('text')}) > 0
                THEN CAST(list_sum(list_transform({tokens_sql('text')},
                                                  t -> length(t)))
                          AS DOUBLE)
                     / len({tokens_sql('text')})
                ELSE 0.0 END AS mean_token_len
    FROM documents
    """,
    tags=("udf", "arrow", "mapInArrow", "columnar"))
def arrow_map_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARROW-NATIVE map tier (mapInArrow): the kernel receives raw
    pyarrow RecordBatches and answers with pyarrow.compute kernels —
    no pandas materialization anywhere, the zero-copy tier below
    mapInPandas for columnar-friendly logic (tokenize via
    split_pattern_regex, list_parent_indices re-aggregation, vectorized
    length math). The oracle recomputes the same stats with the shared
    tokenizer definition; mean_token_len is one IEEE division of two
    exact ints, identical cross-engine.

    Scale: map-only, zero shuffles; Arrow stays the wire AND compute
    format end-to-end, so per-batch overhead is the lowest of any
    Python tier — the right home for byte-level feature extraction when
    a built-in Column expression genuinely cannot express it (here it
    could — text_token_stats is the JVM twin — which is exactly why
    this row exists: to pin that the tiers agree)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    para = spark.sparkContext.defaultParallelism
    return docs.repartition(para).mapInArrow(_arrow_token_stats,
                                             schema=ARROW_STATS_SCHEMA)
