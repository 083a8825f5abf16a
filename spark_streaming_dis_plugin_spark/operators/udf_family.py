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
