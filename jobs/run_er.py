#!/usr/bin/env python3
"""spark-submit entrypoint for the probabilistic record-linkage pipeline —
the string-feature twin of jobs/run_linkage.py (which links in embedding
space). Implements the north-rule shape end-to-end on the ER string tier:

files(row_id, content)
  -> stage "blocked":  meta-blocking candidate pairs (3-gram shingle CBS
                       weights through a df-capped inverted index — never
                       an all-pairs product)
  -> stage "compared": per-pair agreement vector (prefix/suffix equality,
                       bounded levenshtein, size band) — all JVM-side
                       column expressions over candidates only
  -> EM:               Fellegi-Sunter m/u/p fitted by EM on the <=2^k
                       agreement-pattern sufficient statistics (one
                       aggregation; iteration cost independent of corpus
                       size), then every pair scored with the fitted
                       log2 weights and thresholded at posterior 0.5
                       (weight > log2((1-p)/p))
  -> stage "clusters": matched pairs -> large/small-star connected
                       components -> survivor election
  -> optional --evaluate-gold: pairwise precision/recall/F1 vs the
                       planted clusters + a per-row content-sha256
                       invariant check across the pipeline.

Every stage checkpoints through StageCheckpointer (resume + per-stage
rows/signature metrics); re-running with the same --checkpoint-dir picks
up after the last complete stage.

Usage (local smoke):
  spark-submit jobs/run_er.py --synthetic 800 \\
      --output /tmp/er --checkpoint-dir /tmp/er_ckpt --evaluate-gold
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

try:  # pragma: no cover
    import kiez_spark  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of docs(doc_id, text)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic files instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--df-cap", type=int, default=64)
    ap.add_argument("--min-cbs", type=int, default=5)
    ap.add_argument("--top-n", type=int, default=10)
    ap.add_argument("--lev-bound", type=int, default=24)
    ap.add_argument("--em-iters", type=int, default=30)
    ap.add_argument("--u-offsets", type=int, default=3,
                    help="random-pair offsets per row for u estimation")
    ap.add_argument("--evaluate-gold", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kiez_spark.checkpoint import StageCheckpointer
    from kiez_spark.functions import text as T
    from kiez_spark.operators import clustering as C
    from kiez_spark.operators import er as ER
    from kiez_spark.operators import evaluate as EV

    spark = SparkSession.builder.appName("kiez-spark-er").getOrCreate()

    gold = None
    if args.synthetic:
        from kiez_spark import synth

        files = synth.repos_files(spark, n=args.synthetic)
        docs = files.select(
            F.col("row_id").alias("doc_id"), F.col("content").alias("text")
        )
        if args.evaluate_gold:
            gold = synth.gold_pairs(files)
    elif args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        ap.error("one of --input / --synthetic is required")

    # the per-row invariant the north rule demands carried through every
    # stage: sha256(content) at ingest, re-checked after clustering
    docs = docs.withColumn("content_sha", F.sha2("text", 256))

    ckpt = (
        StageCheckpointer(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )

    def run_stage(name, build):
        if ckpt:
            return ckpt.stage(name, build)
        return build().localCheckpoint(eager=False)

    report: dict = {"input_docs": docs.count()}

    def build_blocked():
        keys = F.transform(
            T.shingles(T.tokens(F.col("text")), 3), T.token_hash
        )
        return ER.metablocking_pairs(
            docs, keys, df_cap=args.df_cap,
            min_cbs=args.min_cbs, top_n=args.top_n,
        )

    blocked = run_stage("blocked", build_blocked)
    report["candidate_pairs"] = blocked.count()

    def compare(pairs, extra_cols=()):
        """Agreement vector over any (a_id, b_id) pair set — shared by the
        blocked candidates and the random u-estimation pairs so m and u
        are measured under the identical comparator."""
        a = docs.select(
            F.col("doc_id").alias("a_id"),
            F.col("text").alias("a_text"),
            F.col("content_sha").alias("a_sha"),
        )
        b = docs.select(
            F.col("doc_id").alias("b_id"),
            F.col("text").alias("b_text"),
            F.col("content_sha").alias("b_sha"),
        )
        lev = F.levenshtein("a_text", "b_text", args.lev_bound)
        return (
            pairs.join(a, "a_id")
            .join(b, "b_id")
            .withColumn(
                "prefix_eq",
                F.substring("a_text", 1, 32) == F.substring("b_text", 1, 32),
            )
            .withColumn(
                "suffix_eq",
                F.expr("right(a_text, 32) = right(b_text, 32)"),
            )
            .withColumn(
                "size_close",
                F.abs(F.length("a_text") - F.length("b_text")) <= 8,
            )
            .withColumn("lev_small", (lev >= 0) & (lev <= args.lev_bound))
            .select(
                "a_id", "b_id", *extra_cols, "a_sha", "b_sha",
                "prefix_eq", "suffix_eq", "size_close", "lev_small",
            )
        )

    compared = run_stage("compared", lambda: compare(blocked, ("cbs",)))

    fields = ["prefix_eq", "suffix_eq", "size_close", "lev_small"]
    # u from deterministic random pairings, NOT from the candidates: the
    # meta-blocking is high-precision, so the candidate set may hold no
    # non-match class at all and free two-class EM would be degenerate
    # (the Splink fixed-u protocol; see er.fs_em docstring).
    u_probs = ER.fs_u_probabilities(
        compare(ER.random_pairs(docs, n_offsets=args.u_offsets)), fields
    )
    params, _ = ER.fs_em(
        compared, fields, n_iter=args.em_iters, fixed_u=u_probs
    )
    report["em_params"] = {
        "p": round(params["p"], 6),
        "m": {k: round(v, 6) for k, v in params["m"].items()},
        "u": {k: round(v, 6) for k, v in params["u"].items()},
    }
    # a field whose fitted m does not exceed its random-pair u carries no
    # match evidence on this corpus — drop it rather than let _fs_weights
    # refuse the whole model
    kept = [f for f in fields if params["m"][f] > params["u"][f]]
    report["dropped_fields"] = [f for f in fields if f not in kept]
    if not kept:
        raise SystemExit("run_er: every comparison field degenerate (m <= u)")
    # posterior-0.5 decision boundary: weight > log2((1-p)/p)
    p = params["p"]
    threshold_micro = int(math.floor(1e6 * math.log2((1.0 - p) / p)))
    fs_fields = {f: (params["m"][f], params["u"][f]) for f in kept}

    def build_matched():
        return (
            ER.fs_scores(compared, fs_fields)
            .filter(F.col("weight_micro") > threshold_micro)
            .select("a_id", "b_id", "weight_micro", "a_sha", "b_sha")
        )

    matched = run_stage("matched", build_matched)
    report["matched_pairs"] = matched.count()
    report["fs_threshold_micro"] = threshold_micro

    def build_clusters():
        return C.survivor_decisions(
            matched.select("a_id", "b_id"),
            nodes=docs.select(F.col("doc_id").alias("id")),
            pair_cols=("a_id", "b_id"),
        )

    decisions = run_stage("clusters", build_clusters)
    report["clusters"] = decisions.select("component").distinct().count()
    report["survivors"] = decisions.filter("is_survivor").count()

    # per-row sha invariant: every id's sha after the pipeline equals the
    # ingest sha (joined back through the decisions table)
    violations = (
        decisions.join(docs.select(F.col("doc_id").alias("id"), "content_sha"), "id")
        .join(
            docs.select(
                F.col("doc_id").alias("id"),
                F.sha2("text", 256).alias("sha_recheck"),
            ),
            "id",
        )
        .filter(F.col("content_sha") != F.col("sha_recheck"))
        .count()
    )
    report["sha_violations"] = violations

    if gold is not None:
        pred = EV.clusters_to_pairs(decisions.select("id", "component"))
        f1_row = EV.pairwise_f1(
            pred, gold, pred_cols=("u", "v"), gold_cols=("src_id", "tgt_id")
        ).collect()[0]
        report["pairwise"] = {
            "tp": f1_row.tp, "fp": f1_row.fp, "fn": f1_row.fn,
            "precision": round(f1_row.precision, 6),
            "recall": round(f1_row.recall, 6),
            "f1": round(f1_row.f1, 6),
        }

    decisions.write.mode("overwrite").parquet(args.output)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
