"""Query registry wiring operators to the driver contract.

Every [EXT] operator (SURVEY.md §2.2) registers here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle
SQL string computing the same result with the same column names. The driver
compares the two (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every operator module so registrations run."""
    from xml_to_parquet_spark.operators import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        relational,
        relational_ext,
        scale_patterns,
        similarity,
        sources_io,
        text,
        tpch,
        udfs,
    )
    from xml_to_parquet_spark.streaming import joins, stateful, windows  # noqa: F401

    return REGISTRY
