"""Central registry of declared queries and their DuckDB oracles.

Every operator this engine claims (SURVEY.md §2) registers here as a
:class:`QuerySpec`: a PySpark query callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs
on the same parquet. The driver executes both and hash-compares results —
column names are aliased identically on both sides by construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None   # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False         # include in bench.py headline set
    declared: bool = True       # expose via __spark_entry__.queries();
                                # False = bench/pytest-gated only (e.g. a
                                # production-hash twin with no cross-engine
                                # oracle — keeps the driver's correctness
                                # file free of structurally-unverifiable
                                # rows while the variant stays measured)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None,
             tags: tuple[str, ...] = (), bench: bool = False,
             declared: bool = True):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags,
                                    bench=bench, declared=declared)
        return fn
    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


_LOADED = False


def _load_all() -> None:
    """Import every operator module exactly once (they register on import)."""
    global _LOADED
    if _LOADED:
        return
    from ..operators import (  # noqa: F401
        asof, connector, dedup, multimodal, pipeline, relational, similarity,
        statistics, text, udf_family,
    )
    _LOADED = True
