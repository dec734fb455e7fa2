"""Skew handling: salted repartition of hot blocking keys.

north_rule requirement: hot blocking keys (e.g. the ~50%-of-rows language
in the synthetic table) must not serialize a stage. Two mechanisms:

1. AQE skew-join splitting — free, enabled in session.py, splits oversized
   post-shuffle partitions of sort-merge joins at runtime.
2. Explicit salting (this module) — for blocked kernels (cogrouped
   applyInPandas), where AQE cannot split a logical group: a hot key's
   rows are split into ``ceil(count/target)`` salt shards; the *index*
   side is replicated into every shard of its key so each (key, salt)
   block still sees all potential matches. Cost: index-side replication
   factor = number of shards of its key — bounded by target_rows sizing.

Salt counts are computed from data (a count per key — one cheap agg) and
broadcast, so the decision is always proportional to actual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_salt_counts(df: DataFrame, key: str, target_rows: int) -> DataFrame:
    """(key, n_salts) with n_salts = ceil(count/target_rows), min 1."""
    return df.groupBy(key).agg(
        F.greatest(
            F.ceil(F.count(F.lit(1)) / F.lit(float(target_rows))), F.lit(1)
        )
        .cast("int")
        .alias("n_salts")
    )


def salt_queries(
    df: DataFrame, key: str, salts: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Assign each query row one deterministic salt shard:
    salt = pmod(xxhash64(id), n_salts); block = (key, salt)."""
    return (
        df.join(F.broadcast(salts), key)
        .withColumn(
            "salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("n_salts")).cast("int"),
        )
        .withColumn("block", F.concat_ws("#", F.col(key), F.col("salt")))
        .drop("n_salts", "salt")
    )


def replicate_index(
    df: DataFrame, key: str, salts: DataFrame
) -> DataFrame:
    """Replicate each index row into every salt shard of its key."""
    return (
        df.join(F.broadcast(salts), key)
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1)))
        .withColumn("block", F.concat_ws("#", F.col(key), F.col("salt")))
        .drop("n_salts", "salt")
    )


def salted_blocks(
    queries: DataFrame,
    index: DataFrame,
    key: str,
    target_rows: int = 50_000,
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """Convenience: salt both sides of a blocked join on ``key`` so no
    (key, salt) block exceeds ~target_rows query rows. Returns (q, x)
    with a ``block`` column ready for knn.knn_join_blocked."""
    salts = key_salt_counts(queries, key, target_rows)
    return salt_queries(queries, key, salts, id_col), replicate_index(
        index, key, salts
    )
