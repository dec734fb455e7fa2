"""Incremental curation: a base corpus run plus a daily batch through
`run_curation.py --increment` must together recover exactly the planted
entity set of the UNION — every cross-boundary near-dup cluster keeps
its already-shipped corpus survivor (batch members drop via the stored
index join), every batch-only cluster elects exactly one survivor, and
the state advances as an append-only ver=N delta."""

import json
import os

from pyspark.sql import functions as F


def _run(spark, argv):
    import contextlib
    import importlib
    import io

    mod = importlib.import_module("jobs.run_curation")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main(argv)
    assert rc == 0
    # in-session chained runs: minhash_lsh_join persists its per-side
    # index and Spark reuses persisted frames for canonically-equal
    # plans, so clear between runs (the CLAUDE.md cache-reuse trap)
    spark.catalog.clearCache()
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_base_plus_increment_recovers_union_entities(spark, tmp_path):
    from kiez_spark import synth

    n = 600
    files = synth.repos_files(spark, n=n)
    docs = files.select(
        F.col("row_id").alias("doc_id"), F.col("content").alias("text")
    )
    # planted clusters are CONSECUTIVE row_ids, so a mod-3 split places
    # members of (almost) every cluster on BOTH sides of the boundary —
    # the cross-boundary dedup is what this test is about
    base_p = str(tmp_path / "base.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    docs.filter(F.col("doc_id") % 3 < 2).write.parquet(base_p)
    docs.filter(F.col("doc_id") % 3 == 2).write.parquet(batch_p)

    state = str(tmp_path / "state")
    rep0 = _run(spark, [
        "--input", base_p, "--output", str(tmp_path / "out0"),
        "--state-dir", state,
    ])
    assert rep0["state_version"] == 1

    rep1 = _run(spark, [
        "--increment", "--input", batch_p,
        "--output", str(tmp_path / "out1"), "--state-dir", state,
    ])
    assert rep1["mode"] == "increment" and rep1["state_version"] == 2
    # cross-boundary clusters exist and were caught via the stored index
    assert rep1["dropped_neardup_vs_corpus"] > 0

    gold_entities = (
        files.filter(F.col("is_clustered"))
        .select("cluster_id").distinct().count()
        + files.filter(~F.col("is_clustered")).count()
    )
    # the EFFECTIVE corpus = base survivors + batch survivors - merge
    # tombstones (a batch doc can reveal that two shipped base survivors
    # are one entity: the base subset lacked the connecting hub doc; the
    # merge event retracts all but the canonical one)
    total = (
        rep0["curated_docs"] + rep1["curated_docs"]
        - rep1["merged_survivors"]
    )
    assert total == gold_entities, (rep0, rep1, gold_entities)

    # ... and matches a from-scratch full run on the union exactly
    full_p = str(tmp_path / "full.parquet")
    docs.write.parquet(full_p)
    rep_full = _run(spark, [
        "--input", full_p, "--output", str(tmp_path / "outf"),
    ])
    assert total == rep_full["curated_docs"]

    # tombstoned survivors are docs the base run actually shipped
    tomb = spark.read.parquet(os.path.join(state, "tombstones"))
    out0_ids = {r.doc_id for r in
                spark.read.parquet(str(tmp_path / "out0"))
                .select("doc_id").collect()}
    tomb_ids = {r.doc_id for r in tomb.select("doc_id").collect()}
    assert tomb_ids <= out0_ids
    assert len(tomb_ids) == rep1["merged_survivors"]

    # no surviving batch doc shares content with (or near-duplicates)
    # any base survivor: exact-sha disjointness is checkable directly
    out0 = spark.read.parquet(str(tmp_path / "out0"))
    out1 = spark.read.parquet(str(tmp_path / "out1"))
    assert out0.join(out1, "content_sha").count() == 0

    # append-only state: version dirs are deltas of every distinct-
    # content doc seen (the near-dup stage inputs), union is the corpus
    idx = spark.read.parquet(os.path.join(state, "index"))
    assert idx.filter("ver = 1").count() == rep0["after_exact_dedup"]
    assert idx.filter("ver = 2").count() == rep1["after_exact_dedup"]

    # a second increment of the SAME batch is a no-op: everything now
    # collides with the corpus (idempotent daily re-delivery)
    rep2 = _run(spark, [
        "--increment", "--input", batch_p,
        "--output", str(tmp_path / "out2"), "--state-dir", state,
    ])
    assert rep2["curated_docs"] == 0
    assert rep2["merged_survivors"] == 0
    assert rep2["state_version"] == 3


def test_compact_state_preserves_increment_semantics(spark, tmp_path):
    """base(A) -> inc(B) -> --compact-state -> inc(C) must equal the
    non-compacted chain exactly: the snapshot folds every live delta,
    the read base advances (VERSION = 'N B'), nothing double-counts."""
    from kiez_spark import synth

    n = 450
    files = synth.repos_files(spark, n=n)
    docs = files.select(
        F.col("row_id").alias("doc_id"), F.col("content").alias("text")
    )
    parts = {}
    for i in range(3):
        p = str(tmp_path / f"p{i}.parquet")
        docs.filter(F.col("doc_id") % 3 == i).write.parquet(p)
        parts[i] = p

    state = str(tmp_path / "state")
    rep0 = _run(spark, [
        "--input", parts[0], "--output", str(tmp_path / "o0"),
        "--state-dir", state,
    ])
    rep1 = _run(spark, [
        "--increment", "--input", parts[1],
        "--output", str(tmp_path / "o1"), "--state-dir", state,
    ])
    repc = _run(spark, ["--compact-state", "--state-dir", state])
    assert repc == {
        "mode": "compact", "state_version": 3, "base": 3,
        "folded_versions": 2,
        "docs": rep0["after_exact_dedup"] + rep1["after_exact_dedup"],
    }
    with open(os.path.join(state, "VERSION")) as fh:
        assert fh.read() == "3 3"

    rep2 = _run(spark, [
        "--increment", "--input", parts[2],
        "--output", str(tmp_path / "o2"), "--state-dir", state,
    ])
    assert rep2["base_version"] == 3 and rep2["state_version"] == 4

    gold_entities = (
        files.filter(F.col("is_clustered"))
        .select("cluster_id").distinct().count()
        + files.filter(~F.col("is_clustered")).count()
    )
    total = (
        rep0["curated_docs"] + rep1["curated_docs"] + rep2["curated_docs"]
        - rep1["merged_survivors"] - rep2["merged_survivors"]
    )
    assert total == gold_entities, (rep0, rep1, repc, rep2, gold_entities)

    # re-delivering an OLD (pre-compaction) batch is still a no-op: the
    # snapshot carries the full sha history
    rep3 = _run(spark, [
        "--increment", "--input", parts[1],
        "--output", str(tmp_path / "o3"), "--state-dir", state,
    ])
    assert rep3["curated_docs"] == 0 and rep3["merged_survivors"] == 0


def test_stream_mode_curates_per_microbatch(spark, tmp_path):
    """--stream-input consumes a parquet file stream one file per
    micro-batch through the same increment core; per-epoch survivors
    land under epoch dirs and the state version advances per epoch."""
    import contextlib
    import importlib
    import io
    import json as _json

    from kiez_spark import synth

    mod = importlib.import_module("jobs.run_curation")
    n = 300
    files = synth.repos_files(spark, n=n)
    docs = files.select(
        F.col("row_id").alias("doc_id"), F.col("content").alias("text")
    )
    base_p = str(tmp_path / "base.parquet")
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(base_p)
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    # two single-file arrivals = two micro-batches
    docs.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.parquet(
        str(tmp_path / "b1")
    )
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.parquet(
        str(tmp_path / "b2")
    )
    import shutil

    for i, src in enumerate(("b1", "b2")):
        part = next((tmp_path / src).glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"batch{i}.parquet")

    state = str(tmp_path / "state")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert mod.main([
            "--input", base_p, "--output", str(tmp_path / "out0"),
            "--state-dir", state,
        ]) == 0
        spark.catalog.clearCache()
        assert mod.main([
            "--stream-input", str(stream_dir),
            "--output", str(tmp_path / "outs"), "--state-dir", state,
        ]) == 0
        spark.catalog.clearCache()
    lines = [_json.loads(ln) for ln in buf.getvalue().strip().splitlines()]
    rep0, epochs, tail = lines[0], lines[1:-1], lines[-1]
    assert tail == {"mode": "stream", "epochs": 2}
    assert [e["state_version"] for e in epochs] == [2, 3]

    gold_entities = (
        files.filter(F.col("is_clustered"))
        .select("cluster_id").distinct().count()
        + files.filter(~F.col("is_clustered")).count()
    )
    total = (
        rep0["curated_docs"]
        + sum(e["curated_docs"] for e in epochs)
        - sum(e["merged_survivors"] for e in epochs)
    )
    assert total == gold_entities, (lines, gold_entities)
    # per-epoch outputs exist where survivors were emitted
    for e in epochs:
        if e["curated_docs"]:
            got = spark.read.parquet(
                str(tmp_path / "outs" / f"epoch={e['epoch']}")
            ).count()
            assert got == e["curated_docs"]
