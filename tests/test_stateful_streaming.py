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


def _append_batch(spark, d, i, rows):
    """One parquet file == one micro-batch (maxFilesPerTrigger=1)."""
    from kiez_spark.streaming.files import write_batch_file

    write_batch_file(
        spark.createDataFrame(rows, "doc_id bigint, text string"), d, i
    )


def _processed_rows(q):
    return sum(int(p["numInputRows"]) for p in q.recentProgress)


def _wait_input_rows(q, want, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if _processed_rows(q) >= want:
            return
        time.sleep(0.3)
    raise AssertionError(
        f"stream processed {_processed_rows(q)} rows, wanted {want}"
    )


def test_state_ttl_expires_and_readmits(spark, tmp_path):
    """ProcessingTimeTimeout TTL, live trigger (AvailableNow never
    terminates while processing-time timeouts are registered — see the
    operator docstring): an idle band key past its TTL is removed by the
    hasTimedOut callback (witnessed by the emit_expiry tombstone), the
    next colliding doc is RE-ADMITTED as a fresh first instead of being
    flagged against the expired one, and the re-seeded state flags the
    doc after that."""
    d, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    import os

    os.makedirs(d, exist_ok=True)
    # generous TTL: micro-batch latency on this host is ~1-2s, so the
    # no-expiry windows (batch2 -> batch3) must sit far below the TTL
    ttl = 12000
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        ST.online_neardup_flags(stream, ttl_ms=ttl, emit_expiry=True)
        .writeStream.format("memory")
        .queryName("ttl_live")
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        def flags():
            rows = spark.sql(
                "select distinct doc_id, first_id from ttl_live"
            ).collect()
            return {(r.doc_id, r.first_id) for r in rows}

        _append_batch(spark, d, 0, [(1, BASE)])
        _wait_input_rows(q, 1)
        time.sleep(15)  # TTL lapses; empty trigger fires the timeout
        _append_batch(spark, d, 1, [(3, NEAR)])
        _wait_input_rows(q, 2)
        got = flags()
        # the hasTimedOut removal actually ran: expiry tombstone for 1
        assert (-1, 1) in got, f"no expiry tombstone in {got}"
        assert (3, 1) not in got, "expired state must not flag"
        # immediately after: doc 5 collides with the RE-SEEDED first (3)
        _append_batch(spark, d, 2, [(5, NEAR)])
        _wait_input_rows(q, 3)
        t0 = time.time()
        while (5, 3) not in flags() and time.time() - t0 < 30:
            time.sleep(0.3)
        got = flags()
        assert (5, 3) in got and (5, 1) not in got, got
    finally:
        q.stop()


def test_no_ttl_control_flags_after_same_delay(spark, tmp_path):
    """Control: the identical schedule WITHOUT a TTL flags across the
    delay — proving the ttl path (not the trigger cadence) changes
    behavior."""
    d, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    import os

    os.makedirs(d, exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        ST.online_neardup_flags(stream)
        .writeStream.format("memory")
        .queryName("nottl_live")
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        _append_batch(spark, d, 0, [(1, BASE)])
        _wait_input_rows(q, 1)
        time.sleep(2.5)
        _append_batch(spark, d, 1, [(3, NEAR)])
        _wait_input_rows(q, 2)
        t0 = time.time()

        def flags():
            rows = spark.sql(
                "select distinct doc_id, first_id from nottl_live"
            ).collect()
            return {(r.doc_id, r.first_id) for r in rows}

        while (3, 1) not in flags() and time.time() - t0 < 30:
            time.sleep(0.3)
        assert (3, 1) in flags()
    finally:
        q.stop()
