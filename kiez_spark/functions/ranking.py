"""Distributed global ordering primitives.

``dense_row_number`` replaces the single-partition
``Window.orderBy(col)`` anti-pattern (every row shuffled to ONE task) with
the classic three-step scalable renumber:

1. order-preserving bucketing by LITERAL range boundaries taken from
   ``approxQuantile`` (literals, so recomputation of the plan cannot
   re-sample different buckets);
2. a tiny per-bucket count aggregate -> broadcast cumulative offsets
   (the only ordered window runs over #buckets rows);
3. a bucket-local ``row_number`` window (parallel across buckets) plus
   the bucket offset.

At 10^12 rows this costs one pass for the quantiles, one tiny agg and one
partitioned window — no stage ever sees more than ~n/buckets rows in a
single task.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "rn",
    buckets: int | None = None,
    zero_based: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = global row number of ``df`` ordered by
    ``(order_col, tiebreak_col)``. Without ``tiebreak_col`` the order is
    deterministic only if ``order_col`` values are unique — callers must
    pass a unique column. With it, equal ``order_col`` values are ordered
    by ``tiebreak_col`` — safe across bucket boundaries because bucketing
    uses strict ``>`` against literal bounds, so every row of one
    ``order_col`` value lands in the same bucket.

    NULL ``order_col`` values sort FIRST (bucket -1, matching
    ``Window.orderBy``'s asc-nulls-first default); their relative order is
    arbitrary, as it was under the global window.
    """
    spark = df.sparkSession
    # cap the bucket count: each boundary adds one indicator term to the
    # bucket expression, and a 1000-executor cluster's defaultParallelism
    # would otherwise inflate the Catalyst tree into the 10^5-node range.
    # 256 buckets bound the largest bucket-local sort at n/256 rows —
    # plenty of parallelism for a window stage at any n.
    nb = buckets or min(spark.sparkContext.defaultParallelism * 4, 256)
    probs = [i / nb for i in range(1, nb)]
    bounds = df.stat.approxQuantile(order_col, probs, 0.001)
    uniq = sorted(set(bounds))
    c = F.col(order_col).cast("double")
    # flat sum-of-indicators bucket id: order-preserving, literal-driven.
    # NULL order values get bucket -1 (before every data bucket) — the
    # indicator sum is NULL on NULL input and an inner join on a NULL key
    # would silently drop the row otherwise.
    bucket = F.when(c.isNull(), F.lit(-1)).otherwise(
        reduce(
            lambda acc, b: acc + (c > F.lit(float(b))).cast("int"),
            uniq,
            F.lit(0),
        )
    )
    dfb = df.withColumn("_bkt", bucket)
    counts = dfb.groupBy("_bkt").count()
    offw = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("count").over(offw), F.lit(0)).alias("_off")
    )
    order_keys = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    lw = Window.partitionBy("_bkt").orderBy(*order_keys)
    base = F.row_number().over(lw) - (1 if zero_based else 0) + F.col("_off")
    return (
        dfb.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, base.cast("bigint"))
        .drop("_bkt", "_off")
    )
