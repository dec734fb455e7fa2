"""Similarity search over an embedding column ([ext] training-data set).

- ``cosine_topk``: brute-force exact baseline (thin wrapper over the kNN
  tiers, embeddings-table schema).
- ``ivf_topk``:    the scale path — IVF-style inverted file: deterministic
  coarse centroids (hash-sampled rows), cells = argmin-centroid
  assignment, queries probe their ``nprobe`` closest cells, exact rerank
  within probed cells via the blocked kernel. Candidate work drops from
  O(n*m) to O(n*m*nprobe/n_cells) at recall set by nprobe — the same
  speed/recall dial as the reference's faiss IVF tier (faiss.py:87-93).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kiez_spark.operators import knn as K


def cosine_topk(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tier: str = "expr",
) -> DataFrame:
    """Exact self top-k by cosine distance (self-pairs excluded)."""
    if tier == "expr":
        return K.knn_join_expr(
            emb, emb, k, "cosine", id_col=id_col, vec_col=vec_col,
            exclude_self=True,
        )
    return K.knn_join_pandas(
        emb, emb, k, "cosine", id_col=id_col, vec_col=vec_col, exclude_self=True
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate self top-k via an inverted-file index.

    Centroids: the ``n_cells`` rows with smallest xxhash64(id) — a
    deterministic pseudo-random sample (no kmeans dependency; at real
    scale swap in sampled kmeans, the plumbing is identical).
    """
    base = emb.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    centroids = (
        base.withColumn("h", F.xxhash64("id"))
        .orderBy("h")
        .limit(n_cells)
        .select(F.col("id").alias("cell_id"), F.col("vec").alias("cvec"))
    )
    cent = centroids.select(
        F.col("cell_id").alias("id"), F.col("cvec").alias("vec")
    )
    # assignment: each row's single nearest centroid (k=1)
    assign = K.knn_join_expr(
        base, cent, k=1, metric=metric, exclude_self=False
    ).select(F.col("query_id").alias("id"), F.col("cand_id").alias("cell"))
    # probing: each query's nprobe nearest centroids
    probes = K.knn_join_expr(
        base, cent, k=nprobe, metric=metric, exclude_self=False
    ).select(F.col("query_id").alias("id"), F.col("cand_id").alias("cell"))

    q = base.join(probes, "id").select("id", "vec", F.col("cell").alias("block"))
    x = base.join(assign, "id").select("id", "vec", F.col("cell").alias("block"))
    cands = K.knn_join_blocked(
        q, x, k=k, metric=metric, block_col="block", exclude_self=True
    )
    # a query meets a candidate once per probed cell at most, but dedup +
    # global re-rank across probes is still required
    best = cands.groupBy("query_id", "cand_id").agg(F.min("dist").alias("dist"))
    return K.topk(best, k)
