"""End-to-end curation job: quality filter -> exact dedup -> near-dup
clustering -> survivor election -> split, with checkpoint/resume."""

import json

from pyspark.sql import functions as F


def _run(spark, tmp_path, n, run_id):
    import importlib

    mod = importlib.import_module("jobs.run_curation")
    out = str(tmp_path / f"out_{run_id}")
    ck = str(tmp_path / "ckpt")  # shared -> second run resumes
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main(
            ["--synthetic", str(n), "--output", out, "--checkpoint-dir", ck]
        )
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1]), out


def test_curation_job_counts_and_resume(spark, tmp_path):
    from kiez_spark import synth

    n = 600
    report, out1 = _run(spark, tmp_path, n, "a")
    assert report["input_docs"] == n
    assert report["lineage_consistent"]
    assert sum(report["split_counts"].values()) == report["curated_docs"]

    # survivor count must equal the PLANTED entity count: one survivor
    # per near-dup cluster plus every singleton (the dedup ladder must
    # recover the gold clustering on this fixture)
    files = synth.repos_files(spark, n=n)
    gold_entities = (
        files.filter(F.col("is_clustered"))
        .select("cluster_id")
        .distinct()
        .count()
        + files.filter(~F.col("is_clustered")).count()
    )
    assert report["curated_docs"] == gold_entities, (
        report["curated_docs"],
        gold_entities,
    )

    # resume from the shared checkpoint: stages are read back, output
    # rows identical
    report2, out2 = _run(spark, tmp_path, n, "b")
    assert report2["curated_docs"] == report["curated_docs"]
    a = spark.read.parquet(out1).select("doc_id", "split")
    b = spark.read.parquet(out2).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
