"""End-to-end record-linkage pipeline (the north_star flow).

repos_files(repo, path, commit, lang, content)
  -> stage "embeddings":  hash-feature vectors + content_sha invariant
  -> stage "candidates":  blocking + kNN + hubness rescore (HubnessKnn),
                          sha re-attached per query row
  -> stage "pairs":       distance threshold on RAW distance + candidate
                          rank gate; canonicalized unordered pairs
  -> stage "clusters":    large-star/small-star connected components;
                          singletons included; sha re-attached

Every stage checkpoints through StageCheckpointer (resume + lineage +
metrics + sha invariant, see checkpoint.py). Pass checkpoint_dir=None to
run purely in-memory (tests).

Matching rule: a candidate pair is a match when its *raw* distance is
<= max_dist AND it survived the hubness-reduced top-k (rank <= k). The
hubness transform decides WHICH candidates surface; the absolute gate
keeps far-apart pairs out of the transitive closure (transitivity
amplifies false positives — a single bad edge merges two clusters).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kiez_spark.checkpoint import StageCheckpointer
from kiez_spark.operators import clustering as C
from kiez_spark.pipeline import HubnessKnn, PipelineConfig
from kiez_spark.synth import derive_embeddings


@dataclass
class LinkageResult:
    embeddings: DataFrame
    candidates: DataFrame
    pairs: DataFrame
    clusters: DataFrame
    checkpointer: StageCheckpointer | None


def link_files(
    spark: SparkSession,
    files: DataFrame,
    *,
    dim: int = 32,
    k: int = 5,
    n_candidates: int = 10,
    hubness: str = "csls",
    metric: str = "euclidean",
    tier: str = "pandas",
    max_dist: float | None = None,
    checkpoint_dir: str | None = None,
    # euclidean-LSH knobs calibrated for derive_embeddings' distance scale
    # (near pairs sit below max_dist=12): W must exceed the near-pair
    # distance or the AND-ed bits collide with ~0 probability — W=32 with
    # 6 bits x 12 tables gives >0.9 near-pair recall (tests/
    # test_synth_lsh_linkage.py::test_lsh_euclidean_recall)
    lsh_tables: int = 12,
    lsh_bits: int = 6,
    lsh_bucket_width: float = 32.0,
) -> LinkageResult:
    ckpt = StageCheckpointer(spark, checkpoint_dir) if checkpoint_dir else None

    def run_stage(name, build):
        return ckpt.stage(name, build) if ckpt else build()

    emb = run_stage("embeddings", lambda: derive_embeddings(files, dim=dim))
    if ckpt is None:
        # un-checkpointed runs: the embedding table is consumed by four
        # downstream plans (fit, query/cand vector joins, the cluster
        # sha join, the CC node universe) — cut the lineage once, lazily,
        # so the kernel runs one time instead of per consumer. With a
        # checkpointer the parquet stage already provides this.
        emb = emb.localCheckpoint(eager=False)

    def build_candidates() -> DataFrame:
        eng = HubnessKnn(
            PipelineConfig(
                n_candidates=n_candidates,
                k=k,
                metric=metric,
                hubness=hubness,
                tier=tier,
                lsh_tables=lsh_tables,
                lsh_bits=lsh_bits,
                lsh_bucket_width=lsh_bucket_width,
            )
        )
        eng.fit(emb.select("id", "vec"))
        nn = eng.kneighbors(k)
        # hubness-reduced rank + the RAW distance for absolute gating,
        # + the sha invariant of the query row
        from kiez_spark.functions.vectors import distance_expr

        qv = emb.select(F.col("id").alias("query_id"), F.col("vec").alias("_qv"),
                        F.col("content_sha"))
        xv = emb.select(F.col("id").alias("cand_id"), F.col("vec").alias("_xv"))
        return (
            nn.join(qv, "query_id")
            .join(xv, "cand_id")
            .select(
                "query_id",
                "cand_id",
                "dist",
                "rank",
                distance_expr(F.col("_qv"), F.col("_xv"), metric).alias("raw_dist"),
                "content_sha",
            )
        )

    cands = run_stage("candidates", build_candidates)

    def build_pairs() -> DataFrame:
        p = cands.filter(F.col("rank") <= k)
        if max_dist is not None:
            p = p.filter(F.col("raw_dist") <= max_dist)
        return (
            p.select(
                F.least("query_id", "cand_id").alias("src_id"),
                F.greatest("query_id", "cand_id").alias("tgt_id"),
            )
            .filter(F.col("src_id") != F.col("tgt_id"))
            .distinct()
        )

    pairs = run_stage("pairs", build_pairs)

    def build_clusters() -> DataFrame:
        assign = C.connected_components(
            pairs, nodes=emb.select("id"), pair_cols=("src_id", "tgt_id")
        )
        return assign.join(
            emb.select("id", "content_sha"), "id"
        ).select("id", "component", "content_sha")

    clusters = run_stage("clusters", build_clusters)
    return LinkageResult(emb, cands, pairs, clusters, ckpt)


@dataclass
class AlignmentResult:
    src_embeddings: DataFrame
    tgt_embeddings: DataFrame
    forward: DataFrame
    matches: DataFrame
    checkpointer: StageCheckpointer | None


def align_files(
    spark: SparkSession,
    src_files: DataFrame,
    tgt_files: DataFrame,
    *,
    dim: int = 32,
    k: int = 5,
    n_candidates: int = 10,
    hubness: str = "csls",
    metric: str = "euclidean",
    tier: str = "pandas",
    max_dist: float | None = None,
    mutual: bool = True,
    checkpoint_dir: str | None = None,
    # table/bit counts calibrated like link_files; the bucket width
    # defaults to None so HubnessKnn auto-calibrates it from the ACTUAL
    # corpus distance scale (estimate_bucket_width) — a hardcoded width
    # tuned to one corpus silently yields ~zero cross-space candidates
    # on a corpus with a different scale. Pass a float only when the
    # corpus scale is known (e.g. the synth fixture's 32.0).
    lsh_tables: int = 12,
    lsh_bits: int = 6,
    lsh_bucket_width: float | None = None,
) -> AlignmentResult:
    """Dual-space entity ALIGNMENT — the reference's headline use case
    (/root/reference/kiez/kiez.py:19: hubness-reduced kNN "to compare
    entity embeddings of two knowledge graphs"): every source entity is
    matched to target entities, never source-to-source.

    forward: hubness-reduced source->target top-k (the hits@k table).
    matches: 1:1 link proposals — forward rank-1, optionally required to
    be MUTUAL best (also rank-1 in the independently hubness-reduced
    target->source direction; the standard reciprocal-best filter that
    trades recall for precision), optionally gated on raw distance.
    Stages checkpoint like link_files (resume + lineage + metrics).
    """
    ckpt = StageCheckpointer(spark, checkpoint_dir) if checkpoint_dir else None

    def run_stage(name, build):
        return ckpt.stage(name, build) if ckpt else build()

    src_emb = run_stage("src_embeddings", lambda: derive_embeddings(src_files, dim=dim))
    tgt_emb = run_stage("tgt_embeddings", lambda: derive_embeddings(tgt_files, dim=dim))

    def knn(a: DataFrame, b: DataFrame) -> DataFrame:
        eng = HubnessKnn(
            PipelineConfig(
                n_candidates=n_candidates, k=k, metric=metric,
                hubness=hubness, tier=tier,
                lsh_tables=lsh_tables, lsh_bits=lsh_bits,
                lsh_bucket_width=lsh_bucket_width,
            )
        )
        eng.fit(a.select("id", "vec"), b.select("id", "vec"))
        # re-attach the query side's content_sha so the per-corpus sha
        # invariant is checkable on this stage too (every query id emits
        # a top-k group, so the DISTINCT sha set equals the embedding
        # stage's — the same threading link_files does for its
        # candidates stage)
        return eng.kneighbors(k).join(
            a.select(F.col("id").alias("query_id"), "content_sha"), "query_id"
        )

    fwd = run_stage("forward", lambda: knn(src_emb, tgt_emb))

    def build_matches() -> DataFrame:
        best = fwd.filter(F.col("rank") == 1).select(
            F.col("query_id").alias("src_id"),
            F.col("cand_id").alias("tgt_id"),
            "dist",
        )
        if mutual:
            bwd = run_stage("backward", lambda: knn(tgt_emb, src_emb))
            bwd_best = bwd.filter(F.col("rank") == 1).select(
                F.col("cand_id").alias("src_id"),
                F.col("query_id").alias("tgt_id"),
            )
            best = best.join(bwd_best, ["src_id", "tgt_id"])
        if max_dist is not None:
            from kiez_spark.functions.vectors import distance_expr

            qv = src_emb.select(F.col("id").alias("src_id"), F.col("vec").alias("_qv"))
            xv = tgt_emb.select(F.col("id").alias("tgt_id"), F.col("vec").alias("_xv"))
            best = (
                best.join(qv, "src_id")
                .join(xv, "tgt_id")
                .filter(distance_expr(F.col("_qv"), F.col("_xv"), metric) <= max_dist)
                .select("src_id", "tgt_id", "dist")
            )
        return best

    matches = run_stage("matches", build_matches)
    return AlignmentResult(src_emb, tgt_emb, fwd, matches, ckpt)
