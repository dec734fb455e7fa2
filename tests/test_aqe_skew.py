"""AQE skew-join splitting (north_rule: 'skew handled explicitly via
salted repartitioning ... and AQE skew-join splitting'): prove the
session's adaptive config actually SPLITS a hot-key partition, not just
that the flag is set. Thresholds are lowered to test scale — the
mechanism (runtime partition-size stats -> sub-split of the oversized
shuffle partition) is identical at 100 TB."""

from pyspark.sql import functions as F


def test_aqe_splits_hot_key_join(spark):
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # test-scale thresholds (the default 256 MiB bar is cluster-scale):
        # any over-median partition past 1 KiB is skewed, split target 8 KiB;
        # forbid broadcast so the join must shuffle
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1k",
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # hot blocking key 0 carries 180k rows; keys 1..100 a few each
        left = spark.range(200_000).select(
            F.when(F.col("id") < 180_000, F.lit(0))
            .otherwise(F.col("id") % 100 + 1)
            .alias("k"),
            # sha payload: incompressible, so map-output sizes reflect rows
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        out = left.join(right, "k").select(F.count(F.lit(1)).alias("n"))
        assert out.collect()[0]["n"] == 200_000

        # the FINAL adaptive plan (only available post-execution) must
        # mark the sort-merge join as skew-handled
        final_plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
