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
  -> EM:               Fellegi-Sunter (p, m) fitted by EM on the <=2^k
                       agreement-pattern sufficient statistics with u
                       PINNED from deterministic random pairings (the
                       blocked candidates are match-dominated, so the
                       free two-class mixture would be degenerate), then
                       every pair scored with the fitted log2 weights
                       and thresholded at posterior 0.5
                       (weight > log2((1-p)/p))
  -> stage "clusters": matched pairs -> large/small-star connected
                       components -> survivor election
  -> optional --evaluate-gold: pairwise precision/recall/F1 vs the
                       planted clusters + a per-row content-sha256
                       invariant check across the pipeline.

Every stage checkpoints through StageCheckpointer (resume + per-stage
rows/signature metrics); re-running with the same --checkpoint-dir picks
up after the last complete stage.

INCREMENT MODE (the 10^12-file production loop — never re-cluster from
scratch): a base run with --state-dir persists the blocking index (raw
postings + per-key df), the corpus docs, the cluster assignments and
the fitted FS parameters as APPEND-ONLY ver=N parquet deltas. A later
run with --increment --state-dir links ONLY the new batch: batch x
corpus + batch x batch candidates through the persisted index (corpus
x corpus never re-pairs), scoring with the SAVED m/u/threshold (no
re-fit — score consistency across increments), and a
touched-component-only cluster merge. The state write is O(batch):
the batch's docs/postings/df rows plus ONLY the changed assignment
rows (latest-version-wins at read); the df-capped posting table is
reconstructed from (raw union, summed df), which equals chaining
update_blocking_index exactly. Clusters are monotone (merge, never
split). With --top-n 0 on the base run, chained increments are
provably equal to a full re-run on the combined corpus
(tests/test_er_job.py). --compact-state folds the live deltas into one
snapshot version and advances the read base.

Usage (local smoke):
  spark-submit jobs/run_er.py --synthetic 800 \\
      --output /tmp/er --checkpoint-dir /tmp/er_ckpt --evaluate-gold
  # base + increment:
  spark-submit jobs/run_er.py --input base.parquet --output /tmp/er0 \\
      --state-dir /tmp/er_state --top-n 0
  spark-submit jobs/run_er.py --increment --input batch.parquet \\
      --output /tmp/er1 --state-dir /tmp/er_state
  # stream (one file per micro-batch, foreachBatch, availableNow):
  spark-submit jobs/run_er.py --stream-input /data/incoming \\
      --output /tmp/er_stream --state-dir /tmp/er_state
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

FIELDS = ["prefix_eq", "suffix_eq", "size_close", "lev_small"]


def _keys_expr():
    from pyspark.sql import functions as F

    from kiez_spark.functions import text as T

    return F.transform(T.shingles(T.tokens(F.col("text")), 3), T.token_hash)


def _agreements(docs, pairs, lev_bound, extra_cols=()):
    """Agreement vector over any (a_id, b_id) pair set; ``docs`` supplies
    the texts+shas for BOTH sides — shared by the blocked candidates, the
    random u-estimation pairs and the increment batch so m and u are
    always measured under the identical comparator."""
    from pyspark.sql import functions as F

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
    lev = F.levenshtein("a_text", "b_text", lev_bound)
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
        .withColumn("lev_small", (lev >= 0) & (lev <= lev_bound))
        .select("a_id", "b_id", *extra_cols, "a_sha", "b_sha", *FIELDS)
    )


def _survivors(assign):
    """Min-id survivor election over (id, component) — the same rule
    survivor_decisions applies in the base run."""
    from pyspark.sql import functions as F

    keep = assign.groupBy("component").agg(F.min("id").alias("keep_id"))
    return assign.join(keep, "component").select(
        "id", "component", "keep_id",
        (F.col("id") == F.col("keep_id")).alias("is_survivor"),
    )


# State layout — APPEND-ONLY ver=N parquet partitions, so a daily
# increment writes O(batch) state rows, never O(corpus) (the same delta
# design as jobs/run_curation.py):
#   S/params.json          frozen FS params etc. (written once, base run)
#   S/docs/ver=N/          that version's docs (doc_id, text, content_sha)
#   S/posting_raw/ver=N/   that version's UNCAPPED (k, id) postings
#   S/stats/ver=N/         that version's per-key df contribution (k, df)
#   S/assign/ver=N/        (id, component) CHANGED rows only; LATEST ver
#                          wins per id (merges re-point touched rows)
#   S/VERSION              "N" or "N B" (version, read base) — one atomic
#                          rename, so a killed write is invisible and
#                          version/base can never disagree
# Readers reconstruct the capped posting table by filtering the raw
# union on the SUMMED df (cap membership depends only on total
# frequency — exactly update_blocking_index's semantics), and the
# assignment table latest-wins per id. --compact-state folds the live
# deltas into one snapshot version and advances the base.


def _state_version(state_dir):
    vf = os.path.join(state_dir, "VERSION")
    if not os.path.exists(vf):
        return 0, 1
    with open(vf) as fh:
        parts = fh.read().split()
    return int(parts[0]), int(parts[1]) if len(parts) > 1 else 1


def _write_version(state_dir, ver, base):
    tmp = os.path.join(state_dir, "VERSION.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{ver} {base}" if base > 1 else str(ver))
    os.replace(tmp, os.path.join(state_dir, "VERSION"))


def _write_state_delta(state_dir, ver, docs, posting_raw, stats, assign,
                       params, base=1):
    for name, df in (
        ("docs", docs),
        ("posting_raw", posting_raw),
        ("stats", stats),
        ("assign", assign),
    ):
        df.write.mode("overwrite").parquet(
            os.path.join(state_dir, name, f"ver={ver}")
        )
    pf = os.path.join(state_dir, "params.json")
    # Rewrite params.json on every BASE write (ver == base): a base re-run
    # into an existing --state-dir must refresh the frozen params, not keep
    # stale ones beside a rebuilt base state. Increments (ver > base) never
    # touch them.
    if ver == base or not os.path.exists(pf):
        with open(pf, "w") as fh:
            json.dump(params, fh)
    _write_version(state_dir, ver, base)


def _read_state(spark, state_dir, ver, base=1):
    """(params, docs, posting, stats, assign) reconstructed from the
    live deltas: posting = raw union filtered to total df <= cap (equal
    to chaining update_blocking_index, which re-filters the union on the
    updated df); stats = per-key df sums; assign = latest version wins
    per id."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    with open(os.path.join(state_dir, "params.json")) as fh:
        params = json.load(fh)

    def deltas(name):
        return spark.read.parquet(os.path.join(state_dir, name)).filter(
            (F.col("ver") <= ver) & (F.col("ver") >= base)
        )

    docs = deltas("docs").drop("ver")
    raw = deltas("posting_raw").drop("ver")
    stats = deltas("stats").groupBy("k").agg(F.sum("df").alias("df"))
    posting = raw.join(
        stats.filter(F.col("df") <= int(params["df_cap"])).select("k"), "k"
    ).select("k", "id")
    w = Window.partitionBy("id").orderBy(F.col("ver").desc())
    assign = (
        deltas("assign")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn", "ver")
    )
    return params, docs, posting, stats, assign


def _load_docs(args, spark, need_gold):
    from pyspark.sql import functions as F

    gold = gold_assign = None
    if args.synthetic:
        from kiez_spark import synth

        files = synth.repos_files(spark, n=args.synthetic)
        docs = files.select(
            F.col("row_id").alias("doc_id"), F.col("content").alias("text")
        )
        if need_gold:
            gold = synth.gold_pairs(files)
            gold_assign = synth.gold_clusters(files)
    elif args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        raise SystemExit("one of --input / --synthetic is required")
    # the per-row invariant the north rule demands carried through every
    # stage: sha256(content) at ingest, re-checked after clustering
    return docs.withColumn("content_sha", F.sha2("text", 256)), gold, gold_assign


def _run_compact(args, spark):
    """Fold every live state delta into one ver=N+1 snapshot and advance
    the read base (same crash-safety argument as run_curation.py: the
    snapshot lands first, then one atomic VERSION rename flips
    version+base together). posting_raw is stored still-uncapped in the
    snapshot so later deltas keep reconstructing the cap correctly."""
    ver, vbase = _state_version(args.state_dir)
    if ver < 1:
        raise SystemExit("--compact-state requires an existing state")
    params, docs, posting, stats, assign = _read_state(
        spark, args.state_dir, ver, vbase
    )
    # re-read the RAW postings (the capped reconstruction must not be
    # snapshotted — a key under cap today may cross it later)
    from pyspark.sql import functions as F

    raw = (
        spark.read.parquet(os.path.join(args.state_dir, "posting_raw"))
        .filter((F.col("ver") <= ver) & (F.col("ver") >= vbase))
        .drop("ver")
    )
    ver2 = ver + 1
    for name, df in (
        ("docs", docs),
        ("posting_raw", raw),
        ("stats", stats),
        ("assign", assign),
    ):
        df.write.mode("overwrite").parquet(
            os.path.join(args.state_dir, name, f"ver={ver2}")
        )
    _write_version(args.state_dir, ver2, ver2)
    report = {
        "mode": "compact",
        "state_version": ver2,
        "base": ver2,
        "folded_versions": ver - vbase + 1,
        "docs": docs.count(),
    }
    print(json.dumps(report))
    return 0


def _run_increment(args, spark):
    batch, _, _ = _load_docs(args, spark, need_gold=False)
    report = _er_increment(spark, batch, args.state_dir, args.output)
    print(json.dumps(report))
    return 0


def _er_increment(spark, batch, state_dir, output_dir):
    """Link ONE new batch of (doc_id, text, content_sha) against the
    persisted state; the reusable core behind both ``--increment`` (one
    batch per process) and ``--stream-input`` (one call per micro-batch
    inside foreachBatch). Docs whose id already exists in the corpus
    state are dropped up front (ids are immutable in this model), which
    makes at-least-once re-delivery a no-op: a replayed micro-batch
    re-links zero docs, writes empty state deltas and cannot inflate
    the per-key df stats (the cap contract stays exact)."""
    from pyspark.sql import functions as F

    from kiez_spark.operators import clustering as C
    from kiez_spark.operators import er as ER

    ver, vbase = _state_version(state_dir)
    if ver < 1:
        raise SystemExit("--increment requires a base run's --state-dir state")
    params, corpus_docs, posting, stats, assign = _read_state(
        spark, state_dir, ver, vbase
    )

    report = {"mode": "increment", "base_version": ver,
              "batch_docs": batch.count()}
    batch = batch.join(
        corpus_docs.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    report["batch_docs_new"] = batch.count()

    inc = ER.incremental_blocking_pairs(
        batch, _keys_expr(), posting, stats,
        df_cap=params["df_cap"], min_cbs=params["min_cbs"],
    )
    docs_all = corpus_docs.unionByName(batch).localCheckpoint(eager=False)
    compared = _agreements(docs_all, inc, params["lev_bound"])
    report["candidate_pairs"] = compared.count()

    fs_fields = {f: (params["m"][f], params["u"][f]) for f in params["fields"]}
    matched = (
        ER.fs_scores(compared, fs_fields)
        .filter(F.col("weight_micro") > params["threshold_micro"])
        .select("a_id", "b_id")
    )
    report["matched_pairs"] = matched.count()

    merged, changed = C.merge_components_with_delta(
        assign.select("id", "component"), matched,
        batch_nodes=batch.select("doc_id"),
    )
    merged = merged.localCheckpoint()
    decisions = _survivors(merged)
    report["clusters"] = merged.select("component").distinct().count()
    report["survivors"] = decisions.filter("is_survivor").count()

    # per-row sha invariant across corpus + batch after the merge
    report["sha_violations"] = (
        merged.join(
            docs_all.select(F.col("doc_id").alias("id"), "content_sha"), "id"
        )
        .join(
            docs_all.select(
                F.col("doc_id").alias("id"),
                F.sha2("text", 256).alias("sha_recheck"),
            ),
            "id",
        )
        .filter(F.col("content_sha") != F.col("sha_recheck"))
        .count()
    )

    # delta state write: O(batch) rows, never the corpus — the capped
    # posting table is reconstructed at read from (raw union, summed df)
    batch_raw = ER.blocking_postings_raw(batch, _keys_expr())
    batch_stats = batch_raw.groupBy("k").agg(F.count("*").alias("df"))
    _write_state_delta(
        state_dir, ver + 1, batch, batch_raw, batch_stats,
        changed, params, base=vbase,
    )
    report["new_version"] = ver + 1
    decisions.write.mode("overwrite").parquet(output_dir)
    return report


def _run_stream(args, spark):
    """Continuous incremental linkage: a parquet-directory file stream of
    (doc_id, text) batches, each micro-batch linked against the state
    through the SAME `_er_increment` core (foreachBatch, availableNow).
    Per-epoch decisions land under <output>/epoch=<id>/.

    Delivery semantics: Structured Streaming's checkpoint gives
    at-least-once foreachBatch execution, and at-least-once is SAFE by
    construction here: _er_increment anti-joins re-delivered doc ids
    against the corpus state, so a replayed epoch links zero docs and
    leaves clusters and df stats untouched (tests/test_er_job.py)."""
    from pyspark.sql import functions as F

    if not args.state_dir:
        raise SystemExit("--stream-input requires --state-dir")
    reports = []

    def handle(batch_df, epoch_id):
        # EAGER barrier: the micro-batch frame is a LogicalRDD and the
        # core's lazy localCheckpoints cannot rewrite a plan nesting one
        # (same failure mode documented in jobs/run_curation.py) —
        # materialize clean first, then attach the ingest sha invariant
        docs = (
            batch_df.select("doc_id", "text")
            .withColumn("content_sha", F.sha2("text", 256))
            .localCheckpoint()
        )
        rep = _er_increment(
            spark, docs, args.state_dir,
            os.path.join(args.output, f"epoch={epoch_id}"),
        )
        rep["epoch"] = epoch_id
        reports.append(rep)
        print(json.dumps(rep))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(args.stream_input)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            args.checkpoint_dir or os.path.join(args.output, "_stream_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(json.dumps({"mode": "stream", "epochs": len(reports)}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of docs(doc_id, text)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic files instead of --input")
    ap.add_argument("--output",
                    help="decision parquet dir (required except with "
                         "--compact-state)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--state-dir", default=None,
                    help="persist index/params/assignments for increments")
    ap.add_argument("--increment", action="store_true",
                    help="link a new batch against the --state-dir state")
    ap.add_argument("--stream-input", default=None,
                    help="parquet dir consumed as a file stream; each "
                         "micro-batch runs the --increment core "
                         "(foreachBatch, availableNow)")
    ap.add_argument("--compact-state", action="store_true",
                    help="fold all live state deltas into one snapshot "
                         "version and advance the read base")
    ap.add_argument("--df-cap", type=int, default=64)
    ap.add_argument("--min-cbs", type=int, default=5)
    ap.add_argument("--top-n", type=int, default=10,
                    help="per-record strongest-partner prune; 0 = keep all"
                         " (required for increment == full-rerun equality)")
    ap.add_argument("--lev-bound", type=int, default=24)
    ap.add_argument("--em-iters", type=int, default=30)
    ap.add_argument("--evaluate-gold", action="store_true")
    ap.add_argument("--u-offsets", type=int, default=3,
                    help="random-pair offsets per row for u estimation")
    args = ap.parse_args(argv)
    if not args.compact_state and not args.output:
        ap.error("--output is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kiez_spark.checkpoint import StageCheckpointer
    from kiez_spark.operators import clustering as C
    from kiez_spark.operators import er as ER
    from kiez_spark.operators import evaluate as EV

    spark = SparkSession.builder.appName("kiez-spark-er").getOrCreate()

    if args.stream_input:
        return _run_stream(args, spark)
    if args.increment:
        if not args.state_dir:
            ap.error("--increment requires --state-dir")
        return _run_increment(args, spark)
    if args.compact_state:
        if not args.state_dir:
            ap.error("--compact-state requires --state-dir")
        return _run_compact(args, spark)

    docs, gold, gold_assign = _load_docs(
        args, spark, need_gold=args.evaluate_gold
    )

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
        return ER.metablocking_pairs(
            docs, _keys_expr(), df_cap=args.df_cap,
            min_cbs=args.min_cbs,
            top_n=args.top_n if args.top_n > 0 else None,
        )

    blocked = run_stage("blocked", build_blocked)
    report["candidate_pairs"] = blocked.count()

    compared = run_stage(
        "compared", lambda: _agreements(docs, blocked, args.lev_bound, ("cbs",))
    )

    # u from deterministic random pairings, NOT from the candidates: the
    # meta-blocking is high-precision, so the candidate set may hold no
    # non-match class at all and free two-class EM would be degenerate
    # (the Splink fixed-u protocol; see er.fs_em docstring).
    # n_rows threaded from the already-computed input count so the
    # u-estimation pairing adds no full-corpus scalar scan of its own
    u_probs = ER.fs_u_probabilities(
        _agreements(
            docs,
            ER.random_pairs(
                docs, n_offsets=args.u_offsets, n_rows=report["input_docs"]
            ),
            args.lev_bound,
        ),
        FIELDS,
    )
    params, _ = ER.fs_em(
        compared, FIELDS, n_iter=args.em_iters, fixed_u=u_probs
    )
    report["em_params"] = {
        "p": round(params["p"], 6),
        "m": {k: round(v, 6) for k, v in params["m"].items()},
        "u": {k: round(v, 6) for k, v in params["u"].items()},
    }
    # a field whose fitted m does not exceed its random-pair u carries no
    # match evidence on this corpus — drop it rather than let _fs_weights
    # refuse the whole model
    kept = [f for f in FIELDS if params["m"][f] > params["u"][f]]
    report["dropped_fields"] = [f for f in FIELDS if f not in kept]
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
        # record-averaged complement: pairwise over-weights big clusters
        # quadratically, B-cubed weights every record once
        b3 = EV.bcubed(
            decisions.select("id", "component"), gold_assign
        ).collect()[0]
        report["bcubed"] = {
            "precision": round(b3.b3_precision, 6),
            "recall": round(b3.b3_recall, 6),
            "f1": round(b3.b3_f1, 6),
        }

    decisions.write.mode("overwrite").parquet(args.output)

    if args.state_dir:
        raw = ER.blocking_postings_raw(docs, _keys_expr())
        raw_stats = raw.groupBy("k").agg(F.count("*").alias("df"))
        state_params = {
            "fields": kept,
            "m": params["m"],
            "u": params["u"],
            "p": params["p"],
            "threshold_micro": threshold_micro,
            "df_cap": args.df_cap,
            "min_cbs": args.min_cbs,
            "lev_bound": args.lev_bound,
        }
        _write_state_delta(
            args.state_dir, 1, docs, raw, raw_stats,
            decisions.select("id", "component"), state_params,
        )
        report["state_version"] = 1

    print(json.dumps(report))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
