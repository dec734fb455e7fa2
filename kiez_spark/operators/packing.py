"""Token-stream packing for pretraining ([ext] training-data set).

GPT-style sequence packing: per-stream (e.g. per-language) document token
streams are concatenated in a deterministic order and cut at a fixed
``capacity`` boundary; documents may straddle chunk boundaries, exactly
like the concat-then-chunk packing used to build LLM pretraining batches.
Output is one row per (document, chunk) overlap with the token span the
chunk takes from that document.

The load-bearing primitive is :func:`prefix_sum` — a DISTRIBUTED
two-phase exclusive prefix sum. The naive Spark expression of a running
total, ``sum(x) OVER (PARTITION BY stream ORDER BY id)``, sorts each
stream inside a single task: with one dominant language holding 90% of a
100 TB corpus that is a 90 TB single-task sort — the canonical
"works at sf0.1, dies at scale" plan. Instead:

1. range-repartition by (stream, order) so each task owns a contiguous
   slice of each stream, then sort within partitions;
2. one ``mapInPandas`` pass emits the partition-LOCAL exclusive cumsum
   plus the owning partition id (python workers stream Arrow batches, so
   the local state is O(1) per stream, never O(rows));
3. per-(partition, stream) totals — at most ``num_partitions × streams``
   rows, KBs — are aggregated, collected, turned into exclusive offsets
   on the driver;
4. a broadcast hash join on (partition id, stream) adds the offset
   JVM-side: ``global = local + offset[pid, stream]`` — no second
   Python pass.

The repartitioned frame is persisted between the two passes because
``repartitionByRange`` samples boundaries per job — without pinning,
pass 2 could land rows in different partitions than the offsets were
computed for. (On a real cluster at 100 TB this persist is a disk-level
checkpoint; the result itself is partitioning-independent, so the oracle
comparison doesn't depend on any of this machinery.)

No reference counterpart (the reference stops at neighbor lists); this is
north_rule "training-data pipeline" surface, DuckDB-oracled via the same
window SQL the naive plan would use (correct at sf0.01, wrong at 100 TB).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kiez_spark.functions import text as T


def prefix_sum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "prefix",
    num_partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exclusive prefix sum of ``val_col`` within each ``part_col``
    stream, ordered by ``order_col`` — without ever sorting a whole
    stream in one task (see module docstring for the two-phase design).

    Returns ``df``'s columns plus ``out_col`` (bigint). The result is a
    pure function of the data (independent of partitioning); ``order_col``
    must be unique within a stream for the order to be well-defined, and
    ``part_col`` must be non-null (pandas groupby semantics drop null
    keys — callers filter or coalesce first, as pack_chunks does).

    ``checkpoint=False`` returns the un-materialized plan (for plan
    inspection / further composition before a caller-chosen
    materialization); the intermediate stays persisted in that mode —
    the caller owns unpersisting it via ``result.unpersist_inputs()``
    semantics, i.e. ``spark.catalog.clearCache()`` or letting the
    session end. Default True materializes via localCheckpoint so the
    pinned layout can be released immediately.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    in_cols = list(df.columns)
    ranged = df.repartitionByRange(
        num_partitions, F.col(part_col), F.col(order_col)
    ).sortWithinPartitions(part_col, order_col)

    # StructType.add mutates in place and DataFrames CACHE their schema
    # object — copy before extending or the caller's df.columns grows
    out_schema = (
        StructType(list(df.schema.fields))
        .add(out_col, "long")
        .add("__pid", "integer")
    )

    def local_cumsum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # partition-local exclusive running totals, vectorized per Arrow
        # batch (groupby-cumsum); only the per-STREAM carry — O(streams
        # seen), not O(rows) — crosses batch boundaries
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        carry: dict = {}
        for pdf in it:
            pdf = pdf.copy()
            g = pdf.groupby(part_col, sort=False)[val_col]
            pdf[out_col] = (
                (g.cumsum() - pdf[val_col])
                + pdf[part_col].map(carry).fillna(0)
            ).astype("int64")
            for k, s in g.sum().items():
                carry[k] = carry.get(k, 0) + int(s)
            pdf["__pid"] = pid
            yield pdf

    # pin the partition layout: the per-pid totals and the offset join
    # must see the SAME pid assignment (repartitionByRange re-samples
    # boundaries per job)
    local = ranged.mapInPandas(local_cumsum, out_schema).persist()
    try:
        totals = (
            local.groupBy("__pid", part_col)
            .agg(F.sum(val_col).alias("__tot"))
            .collect()  # bounded: num_partitions x distinct streams
        )
        by_stream: dict = {}
        for r in totals:
            by_stream.setdefault(r[part_col], []).append((r["__pid"], r["__tot"]))
        off_rows = []
        for stream, lst in by_stream.items():
            acc = 0
            for pid, tot in sorted(lst):
                off_rows.append((pid, stream, acc))
                acc += tot
        part_type = df.schema[part_col].dataType.simpleString()
        off_df = spark.createDataFrame(
            off_rows, f"__pid int, {part_col} {part_type}, __off long"
        )
        result = (
            local.join(F.broadcast(off_df), ["__pid", part_col])
            .withColumn(out_col, F.col(out_col) + F.col("__off"))
            .drop("__pid", "__off")
            .select(*in_cols, out_col)
        )
        if checkpoint:
            # materialize before unpersisting the pinned layout the plan
            # depends on — localCheckpoint keeps the two-phase contract
            # while letting callers treat the return value as an ordinary
            # frame (a 100 TB run would use a reliable storage checkpoint)
            result = result.localCheckpoint(eager=True)
    finally:
        if checkpoint:
            local.unpersist()
    return result


def pack_chunks(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> DataFrame:
    """(stream, chunk_id, doc_id, begin_tok, end_tok): GPT-style packing
    of per-stream token streams into fixed ``capacity`` chunks.

    Documents are concatenated per stream in ``id_col`` order; chunk
    boundaries fall every ``capacity`` tokens, and a document straddling
    a boundary is split across the adjacent chunks ([begin_tok, end_tok)
    is the half-open token span of the doc inside that chunk). Token
    counts use the corpus-wide whitespace tokenizer (functions/text.py
    tokens — same definition as token_counts, so chunk sums reconcile
    with the corpus stats).

    One prefix-sum (two narrow passes + a KB-sized driver exchange), one
    explode over each doc's chunk range — no per-stream global sort, no
    quadratic anything; survives a single stream owning the whole corpus.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    toks = df.select(
        F.col(stream_col).alias("stream"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(T.tokens(F.col(text_col))).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    # null streams are excluded (no well-defined pack order; see
    # prefix_sum's non-null part_col contract)
    toks = toks.filter(F.col("stream").isNotNull())
    started = prefix_sum(toks, "stream", "doc_id", "n_tok", "start")
    cap = F.lit(capacity)
    first = (F.col("start") / cap).cast("long")
    last = ((F.col("start") + F.col("n_tok") - 1) / cap).cast("long")
    return (
        started.withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            "stream",
            "chunk_id",
            "doc_id",
            F.greatest(F.lit(0), F.col("chunk_id") * cap - F.col("start"))
            .cast("int")
            .alias("begin_tok"),
            F.least(
                F.col("n_tok"), (F.col("chunk_id") + 1) * cap - F.col("start")
            )
            .cast("int")
            .alias("end_tok"),
        )
    )
