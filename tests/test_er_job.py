"""End-to-end probabilistic record-linkage job (jobs/run_er.py):
meta-blocking -> agreement vectors -> fixed-u Fellegi-Sunter EM ->
threshold -> connected components, with checkpoint/resume and the
north-rule gates (pairwise F1 >= 0.99, per-row sha256 invariant)."""

import json

from pyspark.sql import functions as F


def _run(spark, tmp_path, n, run_id):
    import contextlib
    import importlib
    import io

    mod = importlib.import_module("jobs.run_er")
    out = str(tmp_path / f"out_{run_id}")
    ck = str(tmp_path / "ckpt")  # shared -> second run resumes
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main(
            [
                "--synthetic", str(n),
                "--output", out,
                "--checkpoint-dir", ck,
                "--evaluate-gold",
            ]
        )
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1]), out


def test_er_job_f1_sha_and_resume(spark, tmp_path):
    from kiez_spark import synth

    n = 800
    report, out1 = _run(spark, tmp_path, n, "a")
    assert report["input_docs"] == n
    assert report["sha_violations"] == 0
    assert report["pairwise"]["f1"] >= 0.99  # the north-rule bar
    # every cluster elects exactly one survivor, and the cluster count
    # must equal the planted entity count (dup clusters + singletons)
    files = synth.repos_files(spark, n=n)
    gold_entities = (
        files.filter(F.col("is_clustered")).select("cluster_id").distinct().count()
        + files.filter(~F.col("is_clustered")).count()
    )
    assert report["clusters"] == gold_entities
    assert report["survivors"] == gold_entities
    # the fixed-u protocol must keep every comparator field discriminative
    # on this corpus (m > u), and the EM prior must reflect that the
    # blocked candidates are match-dominated
    assert report["dropped_fields"] == []
    assert report["em_params"]["p"] > 0.9
    for f, m in report["em_params"]["m"].items():
        assert m > report["em_params"]["u"][f]

    # resume from the shared checkpoint: identical decisions
    report2, out2 = _run(spark, tmp_path, n, "b")
    assert report2["pairwise"] == report["pairwise"]
    a = spark.read.parquet(out1).select("id", "component", "is_survivor")
    b = spark.read.parquet(out2).select("id", "component", "is_survivor")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
