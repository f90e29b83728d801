"""Query registry backing __spark_entry__.queries() / oracle_sql().

Every SURVEY.md §2 operator row registers here: a (spark, sf_dir) ->
DataFrame callable plus, where DuckDB can express the same computation, the
oracle SQL (driver runs both at sf0.01 and value-hash-compares). Rows-only
ops register sql=None.

Column-name contract: every computed column is aliased IDENTICALLY in the
Spark plan and the SQL (driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
