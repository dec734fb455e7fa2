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
CAND_RANKED_SCHEMA = (
    "query_id bigint, cand_id bigint, dist double, rank int, "
    "row_mean double, row_max double, row_std double"
)


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
    cushion: int = 16,
) -> pd.DataFrame:
    """Two-phase exact top-k: float32 GEMM selects a k+cushion candidate
    set (float64 GEMM is ~20x slower than float32 on this class of host —
    measured 1.1 vs 23 GFLOPS), then the final distances of that small
    set are recomputed in float64 (same x^2+y^2-2xy formulation as the
    oracle) and sorted with the deterministic (dist, id) tie-break. The
    cushion makes an f32-rounding-induced selection miss require ~16
    pairs inside f32 noise of the k-th distance — vanishing for real
    data; parity tests confirm exactness."""
    n = xm.shape[0]
    kk = min(k, n)
    is_cos = metric in ("cosine", "cos")
    if is_cos:
        qn = np.linalg.norm(qm, axis=1)
        xn = np.linalg.norm(xm, axis=1)
        qn[qn == 0] = 1.0
        xn[xn == 0] = 1.0
        qmn = qm / qn[:, None]
        xmn = xm / xn[:, None]
        d32 = 1.0 - qmn.astype(np.float32) @ xmn.astype(np.float32).T
    else:
        qm32 = qm.astype(np.float32)
        xm32 = xm.astype(np.float32)
        d32 = (
            (qm32 * qm32).sum(axis=1)[:, None]
            + (xm32 * xm32).sum(axis=1)[None, :]
            - 2.0 * qm32 @ xm32.T
        )
    if exclude_self:
        # mask self-pairs (single-source mode), reference excludes rank-0
        # self (/root/reference/kiez/neighbors/approximate/nng.py:204-209)
        d32 = np.where(q_ids[:, None] == x_ids[None, :], np.float32(np.inf), d32)
    b = d32.shape[0]
    sel = min(n, kk + cushion)
    # exact kth-VALUE threshold via np.partition (values-only partition is
    # ~16x faster than argpartition on this host), then a vectorized mask
    # gathers the ragged candidate set (>= sel per row; ties included)
    if sel < n:
        kth = np.partition(d32, sel - 1, axis=1)[:, sel - 1]
        mask = d32 <= kth[:, None]
    else:
        mask = np.isfinite(d32)
    rows, cols = np.nonzero(mask)

    # exact float64 rerank of the selected pairs only (ragged, per-pair)
    if is_cos:
        dsel = 1.0 - (qmn[rows] * xmn[cols]).sum(axis=1)
    else:
        q2 = (qm * qm).sum(axis=1)
        x2 = (xm * xm).sum(axis=1)
        dsel = q2[rows] + x2[cols] - 2.0 * (qm[rows] * xm[cols]).sum(axis=1)
        np.maximum(dsel, 0.0, out=dsel)
        if metric != "sqeuclidean":
            dsel = np.sqrt(dsel)
    if exclude_self:
        keep = q_ids[rows] != x_ids[cols]
        rows, cols, dsel = rows[keep], cols[keep], dsel[keep]

    # per-row top-k over the ragged selection: global (row, dist, id) sort
    # then positional cutoff within each row
    order = np.lexsort((x_ids[cols], dsel, rows))
    srows = rows[order]
    starts = np.searchsorted(srows, np.arange(b))
    pos = np.arange(len(order)) - starts[srows]
    take = order[pos < kk]
    return pd.DataFrame(
        {
            "query_id": q_ids[rows[take]],
            "cand_id": x_ids[cols[take]],
            "dist": dsel[take],
        }
    )


class _BruteKnnKernel:
    """Per-partition brute-force kNN state: float32 index copies, squared
    norms, and REUSED scratch buffers.

    Buffer reuse is load-bearing on this host: a fresh 32 MB numpy
    allocation page-faults at ~40us/page (~300 ms per op); writing into a
    persistent buffer runs the same op in ~5-40 ms. Selection uses a
    sampled threshold + exact-kth fallback, f32 for selection and ragged
    f64 rerank for the returned distances (bit-parity with the oracle).
    """

    def __init__(self, x_ids, xm, k, metric, exclude_self, cushion=16,
                 target_bytes=64e6):
        self.x_ids = x_ids
        self.k = k
        self.metric = metric
        self.exclude_self = exclude_self
        self.cushion = cushion
        self.is_cos = metric in ("cosine", "cos")
        n = xm.shape[0]
        if self.is_cos:
            xn = np.linalg.norm(xm, axis=1)
            xn[xn == 0] = 1.0
            self.xmn = xm / xn[:, None]
            # sign folded into the index so the GEMM output is directly
            # monotone in distance (no post-scale pass over the tile)
            self.x32 = (-self.xmn).astype(np.float32)
        else:
            self.xm = xm
            # -2x folded into the index: GEMM yields -2<q,x>; adding x^2
            # gives d^2 - q^2, monotone in d^2 per row — the q^2 term
            # moves into the selection threshold instead of a full pass
            self.x32 = (-2.0 * xm).astype(np.float32)
            self.x2 = (xm * xm).sum(axis=1)
            self.x2_32 = self.x2.astype(np.float32)
        if exclude_self:
            self.xsort = np.argsort(x_ids, kind="stable")
            self.x_ids_sorted = x_ids[self.xsort]
        self.tile = min(max(1, n), 8192)
        self.batch = max(64, min(8192, int(target_bytes / (4 * self.tile))))
        self._d = np.empty((self.batch, self.tile), dtype=np.float32)
        self._mask = np.empty((self.batch, self.tile), dtype=bool)
        self._part = np.empty((self.batch, self.tile), dtype=np.float32)
        self._d_tail = None  # contiguous buffer for the final partial tile
        # ragged-rerank scratch (grown on demand): fresh multi-MB numpy
        # allocations page-fault at ~40us/page on this host, so every
        # per-chunk temporary that can exceed ~1 MB is pooled
        self._pool_cap = 0
        self._pool = {}

    def _self_positions(self, q_ids):
        pos = np.searchsorted(self.x_ids_sorted, q_ids)
        pos = np.minimum(pos, len(self.x_ids_sorted) - 1)
        hit = self.x_ids_sorted[pos] == q_ids
        return np.nonzero(hit)[0], self.xsort[pos[hit]]

    def query_chunk(self, q_ids, qm):
        """Cache-blocked selection: the index is streamed in TILE-column
        slabs so the (m x tile) distance block stays cache-resident —
        the full (m x n) matrix is never materialized, which keeps the
        low-arithmetic-intensity GEMM compute-bound instead of
        DRAM-bound (the faiss IndexFlat blocking scheme). Tile 1's exact
        sel-th value is a valid global threshold: every global top-sel
        candidate is <= it, so the pooled candidates are supersets of
        the true top-sel per row."""
        n = self.x32.shape[0]
        m = len(q_ids)
        kk = min(self.k, n)
        sel = min(n, kk + self.cushion)
        if self.is_cos:
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            qmn = qm / qn[:, None]
            q32 = qmn.astype(np.float32)
        else:
            q32 = qm.astype(np.float32)
        self_r = self_c = None
        if self.exclude_self:
            self_r, self_c = self._self_positions(q_ids)

        # the tile values are a per-row-monotone transform of the true
        # distance (-cos_sim, resp. d^2 - q^2 — constants folded into the
        # index and the threshold), so selection is unchanged while the
        # tile loop does only: GEMM, (+x^2), threshold-subtract, scalar
        # compare — two fewer full-array passes per tile
        tile = self.tile
        d = self._d[:m]
        all_rows, all_cols = [], []
        thr = None
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            w = hi - lo
            if w == tile:
                dt = d
            else:
                # np.dot(out=) needs C-contiguity; the final partial tile
                # gets its own cached buffer
                if self._d_tail is None or self._d_tail.shape[1] != w:
                    self._d_tail = np.empty((self.batch, w), dtype=np.float32)
                dt = self._d_tail[:m]
            np.dot(q32, self.x32[lo:hi].T, out=dt)
            if not self.is_cos:
                dt += self.x2_32[None, lo:hi]
            if self_r is not None:
                in_tile = (self_c >= lo) & (self_c < hi)
                dt[self_r[in_tile], self_c[in_tile] - lo] = np.inf
            if thr is None:
                kth_i = min(sel - 1, w - 1)
                # np.partition allocates a full copy — use the pooled one
                part = self._part[:m, :w]
                np.copyto(part, dt)
                part.partition(kth_i, axis=1)
                thr = part[:, kth_i].copy()
            dt -= thr[:, None]
            mask = self._mask[:m, :w]
            np.less_equal(dt, 0.0, out=mask)
            r, c = np.nonzero(mask)
            all_rows.append(r)
            all_cols.append(c + lo)
        rows = np.concatenate(all_rows)
        cols = np.concatenate(all_cols)
        # guarantee: rows/cols hold >= min(sel, finite n) candidates per
        # row (tile 1 alone contributes sel of them)

        # exact float64 rerank of the ragged candidate set, built with
        # pooled buffers + a dim-loop of np.take(out=) so no temporary
        # exceeds the pool (avoids per-chunk multi-MB allocations)
        npool = len(rows)
        if npool > self._pool_cap:
            cap = int(npool * 1.5) + 64
            self._pool = {
                nm: np.empty(cap, dtype=np.float64) for nm in ("acc", "t1", "t2")
            }
            self._pool_cap = cap
        acc = self._pool["acc"][:npool]
        t1 = self._pool["t1"][:npool]
        t2 = self._pool["t2"][:npool]
        qsrc = qmn if self.is_cos else qm
        xsrc = self.xmn if self.is_cos else self.xm
        acc.fill(0.0)
        for dcol in range(qsrc.shape[1]):
            np.take(qsrc[:, dcol], rows, out=t1)
            np.take(xsrc[:, dcol], cols, out=t2)
            t1 *= t2
            acc += t1
        if self.is_cos:
            dsel = 1.0 - acc
        else:
            q2 = (qm * qm).sum(axis=1)
            acc *= -2.0
            np.take(q2, rows, out=t1)
            acc += t1
            np.take(self.x2, cols, out=t1)
            acc += t1
            np.maximum(acc, 0.0, out=acc)
            if self.metric != "sqeuclidean":
                np.sqrt(acc, out=acc)
            dsel = acc
        if self.exclude_self:
            keep = q_ids[rows] != self.x_ids[cols]
            rows, cols, dsel = rows[keep], cols[keep], dsel[keep]
        order = np.lexsort((self.x_ids[cols], dsel, rows))
        srows = rows[order]
        starts = np.searchsorted(srows, np.arange(m))
        pos = np.arange(len(order)) - starts[srows]
        keepk = pos < kk
        take = order[keepk]
        rt = srows[keepk]  # kept rows, ascending
        dt_kept = dsel[take]
        # per-row candidate-set statistics (mean/max/std over the kept
        # top-k dists) emitted as columns: the hubness transforms' per-
        # query window aggregations become free — one whole shuffle saved
        seg = np.nonzero(np.diff(rt, prepend=-1))[0]
        seglen = np.diff(np.append(seg, len(rt)))
        ssum = np.add.reduceat(dt_kept, seg)
        smax = np.maximum.reduceat(dt_kept, seg)
        ssq = np.add.reduceat(dt_kept * dt_kept, seg)
        mean = ssum / seglen
        var = np.maximum(ssq / seglen - mean * mean, 0.0)
        return (
            q_ids[rows[take]],
            self.x_ids[cols[take]],
            dt_kept,
            (pos[keepk] + 1).astype(np.int32),
            np.repeat(mean, seglen),
            np.repeat(smax, seglen),
            np.repeat(np.sqrt(var), seglen),
        )

    def query(self, q_ids, qm):
        outs = []
        for lo in range(0, len(q_ids), self.batch):
            outs.append(
                self.query_chunk(q_ids[lo : lo + self.batch], qm[lo : lo + self.batch])
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate([o[0] for o in outs]),
                "cand_id": np.concatenate([o[1] for o in outs]),
                "dist": np.concatenate([o[2] for o in outs]),
                "rank": np.concatenate([o[3] for o in outs]),
                "row_mean": np.concatenate([o[4] for o in outs]),
                "row_max": np.concatenate([o[5] for o in outs]),
                "row_std": np.concatenate([o[6] for o in outs]),
            }
        )


# worker-side kernel-state cache: python workers are reused across tasks,
# so the float32 index copies and the 32 MB scratch buffers (expensive to
# page-fault in) are built once per worker, not once per task
_WORKER_KERNELS: dict = {}


def collect_index(
    index: DataFrame, id_col: str = "id", vec_col: str = "vec"
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side index materialization (the engine's 'fit'/index-build
    step — analogous to the reference's NNAlgorithm._fit). Callers doing
    multiple kNN passes over the same indexed side (e.g. the reverse
    hubness query in single-source mode) should collect once and pass
    ``index_np`` to knn_join_pandas."""
    x = _prep(index, id_col, vec_col, None).toPandas()
    return x["id"].to_numpy(np.int64), np.stack(x["vec"].to_numpy())


def knn_join_pandas(
    queries: DataFrame,
    index: DataFrame | None,
    k: int,
    metric: str = "euclidean",
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    exclude_self: bool = False,
    n_partitions: int | None = None,
    index_np: tuple[np.ndarray, np.ndarray] | None = None,
    index_bc=None,
    cache_token: str | None = None,
) -> DataFrame:
    """Exact kNN with a broadcast numpy index and mapInPandas matrix kernel.

    Scale contract: the indexed side must fit in executor memory (use
    ``knn_join_blocked`` past ~1M x 64f rows). Query side streams in Arrow
    batches; parallelism = query partitions (the reference's joblib slice
    fan-out, neighbor_algorithm_base.py:139-166, becomes partitioning) —
    an under-partitioned source (one parquet file) is repartitioned up to
    the cluster's parallelism so every core gets work.
    """
    import uuid

    spark = queries.sparkSession
    if index_bc is None:
        if index_np is None:
            index_np = collect_index(index, id_col, vec_col)
        index_bc = spark.sparkContext.broadcast(index_np)
    bc = index_bc
    # a caller-stable token lets repeated passes over the same index (the
    # reverse hubness query; warmups) reuse the worker-side kernel state
    token = cache_token or uuid.uuid4().hex
    q = _prep(queries, id_col, vec_col, None)
    # 4x parallelism: fine-grained tasks let the scheduler balance around
    # slow cores (this shared host has CPU steal; real clusters have
    # stragglers) at negligible per-task cost since kernel state is
    # worker-cached
    target_parts = n_partitions or spark.sparkContext.defaultParallelism * 4
    if q.rdd.getNumPartitions() < target_parts:
        q = q.repartition(target_parts)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = (token, k, metric, exclude_self)
        state = _WORKER_KERNELS.get(key)
        if state is None:
            bx_ids, bxm = bc.value
            state = _BruteKnnKernel(bx_ids, bxm, k, metric, exclude_self)
            if len(_WORKER_KERNELS) > 4:
                _WORKER_KERNELS.clear()
            _WORKER_KERNELS[key] = state
        for pdf in batches:
            if pdf.empty:
                continue
            yield state.query(
                pdf["id"].to_numpy(np.int64), np.stack(pdf["vec"].to_numpy())
            )

    return q.mapInPandas(kernel, schema=CAND_RANKED_SCHEMA)


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
