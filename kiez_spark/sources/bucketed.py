"""Bucketed table sink/source — co-located joins without a shuffle.

The 100 TB pattern for repeatedly-joined tables (embeddings x metadata,
candidates x quality): write both sides bucketed AND sorted by the join
key into the session catalog; every later equi-join on that key reads
bucket i against bucket i directly — Catalyst plans a SortMergeJoin with
NO Exchange on either side (tests/test_bucketed.py asserts this on the
live plan). The write pays one shuffle once; every downstream join of
every job afterwards pays zero. This is the parquet-catalog stand-in for
an Iceberg bucket-partitioned table: swap `format("parquet")` for
`format("iceberg")` and the layout contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table on ``key``.
    ``path`` makes it external (data outside the warehouse dir)."""
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    spark.read.parquet(path) would lose the bucket spec and re-shuffle
    on the next join — the catalog read is what keeps joins co-located)."""
    return spark.table(table)
