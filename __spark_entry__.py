"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in spark_streaming_dis_plugin_spark.plans.registry; this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_dis_plugin_spark.plans.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference demo's
    word-count pipeline over the DIS record envelope
    (stream.map(_.value).flatMap(_.split(" ")).reduceByKey(_+_) —
    /root/reference/.../DISSparkStreamingSubscribeExample.scala:46),
    expressed as explode/split + hash aggregation."""
    fn = all_queries()["dis_wordcount"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Undeclared
    specs (declared=False) are bench/pytest-gated variants with no
    cross-engine oracle — kept out of the driver's correctness rows."""
    return {name: spec.fn for name, spec in all_queries().items()
            if spec.declared}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_queries().items()
            if spec.oracle is not None}
