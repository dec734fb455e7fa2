"""Driver contract for the spark-graft builder (PySpark target).

entry():    flagship hubness-reduced kNN (CSLS) over the sf0.001
            embeddings table.
queries():  one entry per implemented operator from SURVEY.md §2 plus the
            [ext] training-data operators (see kiez_spark/driver_queries.py).
oracle_sql(): matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kiez_spark.driver_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CSLS hubness-reduced
    top-5 neighbors over the embeddings table."""
    fn, _ = QUERIES["hubness_csls"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
