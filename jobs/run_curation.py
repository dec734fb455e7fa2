#!/usr/bin/env python3
"""spark-submit entrypoint for the corpus-curation pipeline — the
training-data twin of jobs/run_linkage.py.

documents(doc_id, text)
  -> stage "scrubbed":   URL/e-mail masking (+ per-doc hit counts)
  -> stage "quality":    Gopher-style keep/drop decision with reasons
  -> stage "exact":      sha256 exact dedup (min-id survivor per group)
  -> stage "neardup":    MinHash-LSH banded pairs -> connected
                         components -> quality-ranked survivor election
  -> stage "curated":    surviving docs + deterministic train/val/test
                         hash split

Every stage checkpoints through StageCheckpointer (resume + per-stage
rows/signature metrics + per-partition lineage); re-running with the
same --checkpoint-dir picks up after the last complete stage. The JSON
report prints per-stage row counts and the drop-reason histogram — the
monitoring surface of a production curation run.

Usage (local smoke):
  spark-submit jobs/run_curation.py --synthetic 2000 \\
      --output /tmp/curated --checkpoint-dir /tmp/cur_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # pragma: no cover
    import kiez_spark  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of documents(doc_id, text)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--min-uniq-frac", type=float, default=0.30)
    ap.add_argument("--jaccard-threshold", type=float, default=0.7)
    ap.add_argument("--n-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--splits", default="train:0.9,val:0.05,test:0.05")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kiez_spark.checkpoint import StageCheckpointer
    from kiez_spark.operators import clustering as C
    from kiez_spark.operators import curation as CUR
    from kiez_spark.operators import dedup as D
    from kiez_spark.operators.text_analysis import quality_features

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("kiez-spark-curation").getOrCreate()

    if args.synthetic:
        from kiez_spark import synth

        # repos_files' content column doubles as a documents corpus with
        # planted near-duplicate clusters (known dedup ground truth)
        files = synth.repos_files(spark, n=args.synthetic)
        docs = files.select(
            F.col("row_id").alias("doc_id"), F.col("content").alias("text")
        )
    elif args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        ap.error("one of --input / --synthetic is required")

    ckpt = (
        StageCheckpointer(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )

    def run_stage(name, build):
        if ckpt:
            return ckpt.stage(name, build)
        # un-checkpointed runs: each stage feeds several report actions
        # (counts, histograms, the final write) — cut the lineage once,
        # lazily, so the scrub/dedup plans run one time instead of per
        # action (the same guard link_files applies to its embeddings)
        return build().localCheckpoint(eager=False)

    report: dict = {"input_docs": docs.count()}

    scrubbed = run_stage(
        "scrubbed",
        lambda: CUR.scrub_text(docs).join(
            docs.select("doc_id", F.sha2("text", 256).alias("content_sha")),
            "doc_id",
        ),
    )

    def build_quality():
        clean = scrubbed.select("doc_id", F.col("clean_text").alias("text"))
        return CUR.quality_filter(
            clean, min_tokens=args.min_tokens,
            min_uniq_frac=args.min_uniq_frac,
        )

    quality = run_stage("quality", build_quality)
    report["drop_reasons"] = {
        r.reason: r.cnt
        for r in quality.groupBy("reason").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    kept = scrubbed.join(
        quality.filter("keep").select("doc_id"), "doc_id"
    )
    report["after_quality"] = kept.count()

    def build_exact():
        # min-id survivor per identical-content group; uniques pass thru
        w_first = (
            kept.groupBy("content_sha")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return kept.join(w_first, "doc_id")

    exact = run_stage("exact", build_exact)
    report["after_exact_dedup"] = exact.count()

    def build_neardup():
        txt = exact.select("doc_id", F.col("clean_text").alias("text"))
        # 32 hashes x 8 bands: ~0.997 banding recall per near-pair at
        # jaccard ~0.85 (one-token edits), so clusters stay connected
        pairs = D.minhash_lsh_pairs(
            txt, n_hashes=args.n_hashes, bands=args.bands,
            threshold=args.jaccard_threshold,
        ).select("src_id", "tgt_id")
        assign = C.connected_components(
            pairs, nodes=exact.select("doc_id"), pair_cols=("src_id", "tgt_id")
        )
        qual = quality_features(txt, id_col="doc_id", text_col="text")
        decisions = C.decisions_from_assignment(
            assign.select(F.col("id"), F.col("component")),
            quality=qual.select("doc_id", "quality"),
        )
        return decisions

    decisions = run_stage("neardup", build_neardup)
    report["neardup_groups_gt1"] = (
        decisions.groupBy("component").count().filter("count > 1").count()
    )

    def build_curated():
        survivors = decisions.filter("is_survivor").select(
            F.col("id").alias("doc_id")
        )
        weights = {}
        for part in args.splits.split(","):
            name, w = part.split(":")
            weights[name] = float(w)
        return CUR.hash_split(
            exact.join(survivors, "doc_id").select(
                "doc_id", F.col("clean_text").alias("text"), "content_sha"
            ),
            weights,
        )

    curated = run_stage("curated", build_curated)
    # hive-partition by split: downstream training readers scan only
    # their split's directory (partition pruning at the file listing)
    curated.write.mode("overwrite").partitionBy("split").parquet(args.output)
    report["curated_docs"] = curated.count()
    report["split_counts"] = {
        r.split: r.cnt
        for r in curated.groupBy("split").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    if ckpt:
        report["lineage_consistent"] = ckpt.lineage_consistent()
    print(json.dumps(report))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
