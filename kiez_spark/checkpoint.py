"""Per-stage checkpointing with lineage + metrics — resume-from-checkpoint.

north_rule: "each stage checkpoints per-partition lineage and metrics to
enable resume-from-checkpoint". Implementation:

- every stage writes its output DataFrame to ``<dir>/<stage>`` (parquet;
  an Iceberg catalog slots in transparently via ``format``) and appends a
  metrics row to ``<dir>/_metrics`` recording stage name, row count, an
  order-insensitive content signature (xor of row hashes) and, when the
  stage carries the ``content_sha`` invariant column, the xor of its
  sha256 values — so sha equality through stages is *checkable from the
  metrics table alone* (BASELINE.json input_hint).
- ``stage()`` short-circuits: if the stage directory already holds a
  _SUCCESS marker, it is read back instead of recomputed — a killed run
  resumes from the last complete stage; outputs are byte-stable because
  every operator in this engine is deterministic (tie-breaks included).
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage string, rows bigint, sig bigint, sha_sig bigint, "
    "n_partitions int, wall_sec double, ts double"
)
PARTITION_METRICS_SCHEMA = (
    "stage string, partition_id int, rows bigint, sig bigint"
)


def _signature(df: DataFrame) -> tuple[int, int]:
    """(xor of row hashes over all columns — order-insensitive content
    signature; xor over DISTINCT content_sha values if the invariant
    column is present — multiplicity-insensitive so any stage seeing the
    same *set* of file contents reports the same sha_sig)."""
    cols = [F.col(c) for c in df.columns]
    row = df.agg(
        F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("sig")
    ).first()
    sha_sig = 0
    if "content_sha" in df.columns:
        srow = (
            df.select("content_sha")
            .distinct()
            .agg(
                F.coalesce(
                    F.bit_xor(F.xxhash64(F.col("content_sha"))), F.lit(0)
                ).alias("s")
            )
            .first()
        )
        sha_sig = int(srow["s"])
    return int(row["sig"]), sha_sig


class StageCheckpointer:
    def __init__(self, spark: SparkSession, base_dir: str, fmt: str = "parquet"):
        self.spark = spark
        self.base_dir = base_dir
        self.fmt = fmt
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run-or-resume one stage. ``build`` is only invoked on a miss."""
        path = self._path(name)
        if self.is_complete(name):
            return self.spark.read.format(self.fmt).load(path)
        t0 = time.time()
        df = build()
        df.write.format(self.fmt).mode("overwrite").save(path)
        out = self.spark.read.format(self.fmt).load(path)
        rows = out.count()
        sig, sha_sig = _signature(out)
        metrics = self.spark.createDataFrame(
            [
                (
                    name,
                    rows,
                    sig,
                    sha_sig,
                    out.rdd.getNumPartitions(),
                    time.time() - t0,
                    time.time(),
                )
            ],
            METRICS_SCHEMA,
        )
        metrics.write.format(self.fmt).mode("append").save(
            os.path.join(self.base_dir, "_metrics")
        )
        # per-partition lineage (north_rule): row count + content signature
        # for every partition of the stage output, so a resumed run can
        # verify partition-level integrity, not just stage totals
        cols = [F.col(c) for c in out.columns]
        part_metrics = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("sig"),
            )
            .select(F.lit(name).alias("stage"), "partition_id", "rows", "sig")
        )
        part_metrics.write.format(self.fmt).mode("append").save(
            os.path.join(self.base_dir, "_partition_metrics")
        )
        return out

    def metrics(self) -> DataFrame:
        return self.spark.read.format(self.fmt).load(
            os.path.join(self.base_dir, "_metrics")
        )

    def partition_metrics(self) -> DataFrame:
        return self.spark.read.format(self.fmt).load(
            os.path.join(self.base_dir, "_partition_metrics")
        )

    def lineage_consistent(self) -> bool:
        """Stage totals must equal the sum/xor of their partition metrics."""
        agg = (
            self.partition_metrics()
            .groupBy("stage")
            .agg(
                F.sum("rows").alias("p_rows"),
                F.bit_xor("sig").alias("p_sig"),
            )
        )
        joined = self.metrics().join(agg, "stage")
        bad = joined.filter(
            (F.col("rows") != F.col("p_rows")) | (F.col("sig") != F.col("p_sig"))
        )
        return bad.count() == 0

    def sha_invariant_ok(self, groups: list[list[str]] | None = None) -> bool:
        """True iff every stage that carries content_sha has the same xor
        signature — the per-row sha256 set was preserved end-to-end.

        ``groups``: for pipelines over MORE THAN ONE corpus (dual-space
        alignment: source and target legitimately have different content
        sets), pass the stage names grouped by corpus; the invariant is
        then enforced within each group instead of globally."""
        m = self.metrics().filter(F.col("sha_sig") != 0)
        if groups is None:
            return m.select("sha_sig").distinct().count() <= 1
        for names in groups:
            n = (
                m.filter(F.col("stage").isin(list(names)))
                .select("sha_sig")
                .distinct()
                .count()
            )
            if n > 1:
                return False
        return True
