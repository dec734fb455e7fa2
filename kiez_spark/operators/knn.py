"""k-NN candidate generation — the engine's similarity-join layer.

Replaces the reference's pluggable NN backends (sklearn/faiss/nmslib/ngt/
annoy, /root/reference/kiez/neighbors/) with three Spark-native tiers:

1. ``knn_join_expr``   — pure DataFrame cross/block join + distance column
   expression + rank window. Whole-stage-codegen, fully Catalyst-visible
   (predicate pushdown, AQE skew split). The "exact, SQL-expressible" tier
   used for DuckDB-oracle correctness checks.
2. ``knn_join_pandas`` — broadcast the indexed side as a dense numpy matrix,
   stream query partitions through an Arrow-batched ``mapInPandas`` matrix
   kernel (BLAS via numpy). The fast exact tier when the indexed side fits
   in executor memory (~1e6 x 64 doubles = 512 MB — beyond that, block).
3. ``knn_join_blocked`` — cogrouped ``applyInPandas`` per blocking key:
   both sides shuffle once on the key, the kernel solves the block-local
   kNN. This is the 100 TB path: no global cross join ever materializes;
   combine with LSH bucketing (operators/lsh.py) for recall, and salting
   (operators/skew.py) for hot keys.

Candidate tables use the long format (query_id, cand_id, dist) — the Spark
equivalent of the reference's aligned (n_queries, k) matrices
(/root/reference/kiez/kiez.py:209-216). Missing-neighbor padding
(ind=-1/NaN, nmslib.py:142-145) is unnecessary in long format: absent rows
mean "no neighbor".

Determinism contract: final ordering ties broken by (dist, cand_id) —
stricter than the reference's unstable argpartition
(/root/reference/kiez/hubness_reduction/base.py:81-86) so reruns and
different parallelism levels yield identical results.
"""

from __future__ import annotations

import math
import warnings
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kiez_spark.functions.vectors import distance_expr, vec_as_double

CAND_SCHEMA = "query_id bigint, cand_id bigint, dist double"


def topk(cands: DataFrame, k: int, dist_col: str = "dist") -> DataFrame:
    """Per-query top-k with deterministic tie-break; adds ``rank`` (1-based)."""
    w = Window.partitionBy("query_id").orderBy(F.col(dist_col).asc(), F.col("cand_id").asc())
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def clamp_k(k: int, n_indexed: int) -> int:
    """Mirror reference k-clamp semantics
    (/root/reference/kiez/neighbors/neighbor_algorithm_base.py:98-110)."""
    if not isinstance(k, int):
        raise TypeError(f"k must be an integer, got {type(k)}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if k > n_indexed:
        warnings.warn(
            f"k={k} > number of indexed entities {n_indexed}; clamping",
            stacklevel=2,
        )
        return n_indexed
    return k


def _prep(df: DataFrame, id_col: str, vec_col: str, block_col: str | None):
    cols = [F.col(id_col).cast("bigint").alias("id"), vec_as_double(vec_col).alias("vec")]
    if block_col:
        cols.append(F.col(block_col).alias("block"))
    return df.select(*cols)


def knn_join_expr(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    metric: str = "euclidean",
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    block_col: str | None = None,
    exclude_self: bool = False,
    broadcast_index: bool = True,
) -> DataFrame:
    """Exact kNN as a declarative join: Catalyst sees everything.

    With ``block_col`` the join is an equi-join on the blocking key (shuffle
    or broadcast hash join — Catalyst picks); without it, a broadcast nested
    loop over the (small) indexed side.
    """
    q = _prep(queries, id_col, vec_col, block_col).alias("q")
    x = _prep(index, id_col, vec_col, block_col).alias("x")
    if broadcast_index:
        x = F.broadcast(x)
    if block_col:
        joined = q.join(x, F.col("q.block") == F.col("x.block"))
    else:
        joined = q.crossJoin(x)
    if exclude_self:
        joined = joined.filter(F.col("q.id") != F.col("x.id"))
    cands = joined.select(
        F.col("q.id").alias("query_id"),
        F.col("x.id").alias("cand_id"),
        distance_expr(F.col("q.vec"), F.col("x.vec"), metric).alias("dist"),
    )
    return topk(cands, k)


def _dist_matrix(qm: np.ndarray, xm: np.ndarray, metric: str) -> np.ndarray:
    """Batched distance kernel, float64 BLAS."""
    if metric in ("euclidean", "minkowski", "l2", "sqeuclidean"):
        sq = (
            (qm * qm).sum(axis=1)[:, None]
            + (xm * xm).sum(axis=1)[None, :]
            - 2.0 * qm @ xm.T
        )
        np.maximum(sq, 0.0, out=sq)
        return sq if metric == "sqeuclidean" else np.sqrt(sq)
    if metric in ("cosine", "cos"):
        qn = np.linalg.norm(qm, axis=1)
        xn = np.linalg.norm(xm, axis=1)
        qn[qn == 0] = 1.0
        xn[xn == 0] = 1.0
        return 1.0 - (qm / qn[:, None]) @ (xm / xn[:, None]).T
    raise ValueError(f"unsupported metric: {metric}")


def _topk_block(
    q_ids: np.ndarray,
    qm: np.ndarray,
    x_ids: np.ndarray,
    xm: np.ndarray,
    k: int,
    metric: str,
    exclude_self: bool,
) -> pd.DataFrame:
    d = _dist_matrix(qm, xm, metric)
    if exclude_self:
        # mask self-pairs (single-source mode), reference excludes rank-0 self
        # (/root/reference/kiez/neighbors/approximate/nng.py:204-209)
        self_mask = q_ids[:, None] == x_ids[None, :]
        d = np.where(self_mask, np.inf, d)
    n = xm.shape[0]
    kk = min(k, n)
    # partial-select a small cushion, then deterministic (dist, id) sort
    sel = min(n, kk + 8)
    part = np.argpartition(d, sel - 1, axis=1)[:, :sel] if sel < n else np.tile(
        np.arange(n), (d.shape[0], 1)
    )
    rows = np.repeat(np.arange(d.shape[0]), part.shape[1])
    pd_d = d[rows, part.ravel()].reshape(part.shape)
    order = np.lexsort((x_ids[part], pd_d), axis=1)[:, :kk]
    top_idx = np.take_along_axis(part, order, axis=1)
    top_d = np.take_along_axis(pd_d, order, axis=1)
    finite = np.isfinite(top_d)
    out_q = np.repeat(q_ids, kk)[finite.ravel()]
    out_c = x_ids[top_idx].ravel()[finite.ravel()]
    out_d = top_d.ravel()[finite.ravel()]
    return pd.DataFrame({"query_id": out_q, "cand_id": out_c, "dist": out_d})


def knn_join_pandas(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    metric: str = "euclidean",
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    exclude_self: bool = False,
    batch_rows: int = 4096,
) -> DataFrame:
    """Exact kNN with a broadcast numpy index and mapInPandas matrix kernel.

    Scale contract: the indexed side must fit in executor memory (use
    ``knn_join_blocked`` past ~1M x 64f rows). Query side streams in Arrow
    batches; parallelism = query partitions (the reference's joblib slice
    fan-out, neighbor_algorithm_base.py:139-166, becomes partitioning).
    """
    spark = queries.sparkSession
    x = _prep(index, id_col, vec_col, None).toPandas()
    x_ids = x["id"].to_numpy(np.int64)
    xm = np.stack(x["vec"].to_numpy())
    bc = spark.sparkContext.broadcast((x_ids, xm))
    q = _prep(queries, id_col, vec_col, None)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bx_ids, bxm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                qm = np.stack(chunk["vec"].to_numpy())
                yield _topk_block(
                    chunk["id"].to_numpy(np.int64),
                    qm,
                    bx_ids,
                    bxm,
                    k,
                    metric,
                    exclude_self,
                )

    return q.mapInPandas(kernel, schema=CAND_SCHEMA)


def knn_join_blocked(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    metric: str = "euclidean",
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    block_col: str = "block",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact kNN within blocking keys via cogrouped applyInPandas.

    One shuffle per side (hash on the key), then each block is solved
    locally with the matrix kernel. This is the scale-out tier: with B
    balanced blocks the cost drops from O(n*m) to O(n*m/B), and AQE's
    skew-join split plus salted keys (operators/skew.py) keep hot blocks
    from serializing the stage.
    """
    q = _prep(queries, id_col, vec_col, block_col)
    x = _prep(index, id_col, vec_col, block_col)

    def kernel(qpdf: pd.DataFrame, xpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or xpdf.empty:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "cand_id": pd.Series(dtype="int64"),
                 "dist": pd.Series(dtype="float64")}
            )
        return _topk_block(
            qpdf["id"].to_numpy(np.int64),
            np.stack(qpdf["vec"].to_numpy()),
            xpdf["id"].to_numpy(np.int64),
            np.stack(xpdf["vec"].to_numpy()),
            k,
            metric,
            exclude_self,
        )

    return (
        q.groupBy("block")
        .cogroup(x.groupBy("block"))
        .applyInPandas(kernel, schema=CAND_SCHEMA)
    )
