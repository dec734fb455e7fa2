"""Similarity search over an embedding column ([ext] training-data set).

- ``cosine_topk``: brute-force exact baseline (thin wrapper over the kNN
  tiers, embeddings-table schema).
- ``ivf_topk``:    the scale path — IVF-style inverted file: coarse
  centroids TRAINED with a few seeded k-means iterations over a bounded
  deterministic sample (the reference's faiss IVF tier trains its coarse
  quantizer the same way, faiss.py:133-158), cells = argmin-centroid
  assignment, queries probe their ``nprobe`` closest cells, exact rerank
  within probed cells via the blocked kernel. Candidate work drops from
  O(n*m) to O(n*m*nprobe/n_cells) at recall set by nprobe — the same
  speed/recall dial as the reference's faiss IVF tier (faiss.py:87-93).

Scale notes: training touches only ``min(n, n_cells*sample_per_cell)``
rows (TakeOrderedAndProject by hash — no full sort); each Lloyd round is
one broadcast-NLJ assignment over the sample plus a bounded
collect_list fold per cell; per-round ``localCheckpoint`` truncates the
iterative lineage. The full-table assignment/probe pass is ONE broadcast
join (assignment = rank-1 row of the probe table, not a second pass).
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


def _mean_vec(vs_col):
    """Element-wise mean of an array-of-vectors column (zip_with fold —
    no (row, dim) explode; the dis_sim_local centroid pattern)."""
    zero = F.array_repeat(F.lit(0.0), F.size(F.element_at(vs_col, 1)))
    return F.transform(
        F.aggregate(vs_col, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)),
        lambda s: s / F.size(vs_col),
    )


def train_centroids(
    base: DataFrame,
    n_cells: int,
    metric: str = "cosine",
    n_iter: int = 3,
    sample_per_cell: int = 256,
) -> DataFrame:
    """(cell_id, cvec): coarse IVF centroids via seeded sampled k-means.

    Init: the ``n_cells`` rows with smallest xxhash64(id) — deterministic
    pseudo-random (seed folded into the hash input). Lloyd rounds run on
    a bounded deterministic sample (smallest xxhash64(id+1), capped at
    n_cells*sample_per_cell rows), mirroring faiss's train-on-sample IVF
    quantizer (faiss.py:133-158). Empty cells keep their previous
    centroid. cell_id = the id of the init row (stable across rounds).
    """
    init = (
        base.withColumn("h", F.xxhash64("id"))
        .orderBy("h")
        .limit(n_cells)
        .select(F.col("id").alias("cell_id"), F.col("vec").alias("cvec"))
    )
    if n_iter <= 0:
        return init
    sample = (
        base.withColumn("h", F.xxhash64(F.col("id") + 1))
        .orderBy("h")
        .limit(n_cells * sample_per_cell)
        .select("id", "vec")
        .localCheckpoint()
    )
    cent = init.localCheckpoint()
    for _ in range(n_iter):
        cdf = cent.select(F.col("cell_id").alias("id"), F.col("cvec").alias("vec"))
        assign = K.knn_join_expr(
            sample, cdf, k=1, metric=metric, exclude_self=False
        ).select(F.col("query_id").alias("id"), F.col("cand_id").alias("cell"))
        means = (
            sample.join(assign, "id")
            .groupBy("cell")
            .agg(F.collect_list("vec").alias("vs"))
            .select(F.col("cell").alias("cell_id"), _mean_vec(F.col("vs")).alias("nvec"))
        )
        cent = (
            cent.join(means, "cell_id", "left")
            .select("cell_id", F.coalesce("nvec", "cvec").alias("cvec"))
            .localCheckpoint()
        )
    return cent


def assign_cells(
    base: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    n_assign: int = 1,
) -> DataFrame:
    """(id, cell): nearest-centroid(s) assignment of (id, vec) rows
    against a trained (cell_id, cvec) table — ONE broadcast pass."""
    cent = centroids.select(
        F.col("cell_id").alias("id"), F.col("cvec").alias("vec")
    )
    return (
        K.knn_join_expr(base, cent, k=n_assign, metric=metric,
                        exclude_self=False)
        .select(F.col("query_id").alias("id"), F.col("cand_id").alias("cell"))
    )


def ivf_append(
    index_assign: DataFrame,
    new_emb: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 1,
) -> DataFrame:
    """Incremental IVF: extend an existing (id, cell) assignment table
    with a new embedding batch WITHOUT retraining the coarse quantizer —
    the daily-increment pattern (same shape as the dedup ladder's
    minhash_lsh_join): the corpus-side training cost is paid once per
    index version, each increment pays one broadcast assignment pass
    over its own rows only. Returns the unioned (id, cell) table; query
    it with ivf_query below."""
    new_base = new_emb.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return index_assign.unionByName(
        assign_cells(new_base, centroids, metric, n_assign)
    )


def ivf_query(
    queries: DataFrame,
    corpus: DataFrame,
    assign: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k of ``queries`` against an (id, cell)-assigned ``corpus``
    using a trained centroid table: probe nprobe cells per query, exact
    rerank inside probed cells via the blocked kernel."""

    def base_of(df):
        return df.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )

    qb, xb = base_of(queries), base_of(corpus)
    probes = assign_cells(qb, centroids, metric, n_assign=nprobe)
    q = qb.join(probes, "id").select("id", "vec", F.col("cell").alias("block"))
    x = xb.join(assign, "id").select("id", "vec", F.col("cell").alias("block"))
    cands = K.knn_join_blocked(
        q, x, k=k, metric=metric, block_col="block",
        exclude_self=exclude_self,
    )
    best = cands.groupBy("query_id", "cand_id").agg(F.min("dist").alias("dist"))
    return K.topk(best, k)


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 3,
    n_assign: int = 1,
) -> DataFrame:
    """Approximate self top-k via an inverted-file index with trained
    coarse centroids (``train_iters=0`` falls back to the hash-sampled
    init — the round-1/2 behavior).

    ``n_assign`` > 1 is MULTI-ASSIGNMENT: each index vector is stored in
    its n_assign closest cells, the standard IVF fix for boundary
    vectors whose true neighbors straddle a cell edge. Candidate work
    scales as nprobe * n_assign / n_cells of the brute-force pass (index
    replication factor = n_assign), so (nprobe=6, n_assign=2) costs the
    same as (nprobe=12, n_assign=1) but recalls better on weakly
    clustered data: boundary candidates only need EITHER side of the
    pair to land in a shared cell."""
    base = emb.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    centroids = train_centroids(base, n_cells, metric, n_iter=train_iters)
    cent = centroids.select(
        F.col("cell_id").alias("id"), F.col("cvec").alias("vec")
    )
    # ONE pass against the (tiny, broadcast) centroid table yields both
    # the probe list (rank <= nprobe) and the cell assignment
    # (rank <= n_assign)
    probes_all = K.knn_join_expr(
        base, cent, k=max(nprobe, n_assign), metric=metric, exclude_self=False
    ).select(F.col("query_id").alias("id"), F.col("cand_id").alias("cell"), "rank")
    probes = probes_all.filter(F.col("rank") <= nprobe).select("id", "cell")
    assign = probes_all.filter(F.col("rank") <= n_assign).select("id", "cell")

    q = base.join(probes, "id").select("id", "vec", F.col("cell").alias("block"))
    x = base.join(assign, "id").select("id", "vec", F.col("cell").alias("block"))
    cands = K.knn_join_blocked(
        q, x, k=k, metric=metric, block_col="block", exclude_self=True
    )
    # a query meets a candidate once per probed cell at most, but dedup +
    # global re-rank across probes is still required
    best = cands.groupBy("query_id", "cand_id").agg(F.min("dist").alias("dist"))
    return K.topk(best, k)
