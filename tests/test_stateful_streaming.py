"""Stateful streaming near-dup flagging: state persists ACROSS
micro-batches (maxFilesPerTrigger=1 forces one batch per input file)."""

import time

from pyspark.sql import functions as F

from kiez_spark.streaming import stateful as ST

# 40 tokens: a one-token edit keeps jaccard ~0.9 and (verified for this
# fixed seed) collides on at least one minhash band
BASE = " ".join(f"word{i}" for i in range(40))
NEAR = BASE.replace("word20", "CHANGED")
OTHER = "unrelated " + " ".join(f"zz{i}" for i in range(39))
OTHER2 = "another " + " ".join(f"qq{i}" for i in range(39))


def test_online_neardup_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    # batch 1: two distinct docs
    spark.createDataFrame(
        [(1, BASE), (2, "completely different text about other things entirely")],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("append").parquet(str(d))
    time.sleep(1.1)  # distinct file mtimes -> stable batch order
    # batch 2: doc 3 = near-copy of doc 1 (one token changed)
    spark.createDataFrame(
        [(3, NEAR), (4, OTHER2)],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("append").parquet(str(d))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    flags = ST.online_neardup_flags(stream)
    q = (
        flags.writeStream.format("memory")
        .queryName("flags_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select distinct doc_id, first_id from flags_out"
    ).collect()
    got = {(r.doc_id, r.first_id) for r in rows}
    # doc 3 collides with doc 1's band state from the earlier micro-batch
    assert (3, 1) in got
    # the unrelated docs never collide
    assert all(pair[0] != 4 and pair[0] != 2 for pair in got)


def test_banded_keys_match_batch_banding(spark):
    """The streaming band keys equal the batch minhash banding keys —
    same collision sets by construction."""
    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)],
        "doc_id bigint, text string",
    )
    keys = ST.banded_keys(df)
    j = (
        keys.alias("a")
        .join(keys.alias("b"), "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    got = {(r.u, r.v) for r in j.collect()}
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got
