#!/usr/bin/env python3
"""spark-submit entrypoint for the record-linkage pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage (cluster):
  zip -r kiez_spark.zip kiez_spark
  spark-submit --py-files kiez_spark.zip jobs/run_linkage.py \\
      --input  s3://bucket/repos_files/              \\
      --output s3://bucket/clusters/                 \\
      --checkpoint-dir s3://bucket/ckpt/run-001/     \\
      --k 5 --n-candidates 10 --hubness csls --max-dist 12.0

Usage (local smoke, synthetic input):
  spark-submit jobs/run_linkage.py --synthetic 10000 \\
      --output /tmp/clusters --checkpoint-dir /tmp/ckpt

The input is the input_hint table (repo, path, commit, lang, content) as
parquet/Iceberg; output is (id, component, content_sha) cluster
assignments. Resume: re-running with the same --checkpoint-dir picks up
after the last complete stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit puts jobs/ (not the repo root) on sys.path; when the
# package isn't shipped via --py-files, fall back to the repo checkout
try:  # pragma: no cover
    import kiez_spark  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet/Iceberg path of repos_files")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic rows instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-candidates", type=int, default=10)
    ap.add_argument("--hubness", default="csls")
    ap.add_argument("--metric", default="euclidean")
    ap.add_argument("--tier", default="pandas",
                    choices=["expr", "pandas", "blocked", "lsh"])
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--max-dist", type=float, default=None)
    ap.add_argument("--evaluate-gold", action="store_true",
                    help="with --synthetic: report pairwise F1 vs planted gold")
    ap.add_argument("--write-decisions", default=None, metavar="PATH",
                    help="also write the survivor decision table (id, "
                    "component, keep_id, is_survivor) — keeper = highest "
                    "quality_features score over content, ties -> min id")
    ap.add_argument("--target-input", default=None, metavar="PATH",
                    help="second repos_files table: switch to dual-space "
                    "ALIGNMENT (source->target mutual-best matches, never "
                    "source-to-source); output = (src_id, tgt_id, dist). "
                    "With --synthetic, PATH 'mutated' aligns against a "
                    "one-token-edit copy with planted gold links.")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kiez_spark import synth
    from kiez_spark.linkage import link_files
    from kiez_spark.operators import evaluate as E

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("kiez-spark-linkage").getOrCreate()
    if args.synthetic:
        files = synth.repos_files(spark, n=args.synthetic)
    elif args.input:
        files = spark.read.parquet(args.input)
        if "row_id" not in files.columns:
            from pyspark.sql import functions as F

            files = files.withColumn("row_id", F.monotonically_increasing_id())
    else:
        ap.error("one of --input / --synthetic is required")

    if args.target_input:
        from kiez_spark.linkage import align_files

        if args.synthetic and args.target_input == "mutated":
            tgt_files = synth.mutated_copy(files)
        else:
            tgt_files = spark.read.parquet(args.target_input)
            if "row_id" not in tgt_files.columns:
                from pyspark.sql import functions as F

                tgt_files = tgt_files.withColumn(
                    "row_id", F.monotonically_increasing_id()
                )
        ares = align_files(
            spark, files, tgt_files, dim=args.dim, k=args.k,
            n_candidates=args.n_candidates, hubness=args.hubness,
            metric=args.metric, tier=args.tier, max_dist=args.max_dist,
            checkpoint_dir=args.checkpoint_dir,
        )
        ares.matches.write.mode("overwrite").parquet(args.output)
        report = {"matches": ares.matches.count()}
        if args.checkpoint_dir and ares.checkpointer:
            # source and target are distinct corpora: enforce the sha
            # invariant within each space, not across them. forward
            # carries the src shas, backward the tgt shas (align_files
            # threads content_sha through both kNN stages), so each
            # group compares >= 2 sha-carrying stages — a real check,
            # not a vacuous single-stage group.
            report["sha_invariant_ok"] = ares.checkpointer.sha_invariant_ok(
                groups=[
                    ["src_embeddings", "forward"],
                    ["tgt_embeddings", "backward"],
                ]
            )
        if args.evaluate_gold and args.synthetic:
            f1 = E.pairwise_f1(
                ares.matches.select("src_id", "tgt_id"),
                synth.gold_alignment(files),
                pred_cols=("src_id", "tgt_id"),
            ).first()
            report["pairwise_f1"] = f1.f1
        print(json.dumps(report))
        if owns_session:
            spark.stop()
        return 0

    res = link_files(
        spark, files, dim=args.dim, k=args.k, n_candidates=args.n_candidates,
        hubness=args.hubness, metric=args.metric, tier=args.tier,
        max_dist=args.max_dist, checkpoint_dir=args.checkpoint_dir,
    )
    res.clusters.write.mode("overwrite").parquet(args.output)

    report = {
        "rows": res.clusters.count(),
        "components": res.clusters.select("component").distinct().count(),
    }
    if args.write_decisions:
        from kiez_spark.operators.clustering import decisions_from_assignment
        from kiez_spark.operators.text_analysis import quality_features

        qual = quality_features(files, id_col="row_id", text_col="content")
        decisions = decisions_from_assignment(
            res.clusters.select("id", "component"),
            quality=qual.select("doc_id", "quality"),
        )
        decisions.write.mode("overwrite").parquet(args.write_decisions)
        report["survivors"] = decisions.filter("is_survivor").count()
    if res.checkpointer:
        report["sha_invariant_ok"] = res.checkpointer.sha_invariant_ok()
    if args.evaluate_gold and args.synthetic:
        f1 = E.pairwise_f1(
            E.clusters_to_pairs(res.clusters), synth.gold_pairs(files),
            pred_cols=("u", "v"),
        ).first()
        report["pairwise_f1"] = f1.f1
    print(json.dumps(report))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
