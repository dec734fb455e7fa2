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
    metric_params: dict | None = None,
) -> DataFrame:
    """Exact kNN as a declarative join: Catalyst sees everything.

    With ``block_col`` the join is an equi-join on the blocking key (shuffle
    or broadcast hash join — Catalyst picks); without it, a broadcast nested
    loop over the (small) indexed side.

    ``metric_params``: {'V': [...]} for metric='seuclidean' (per-dim
    variances, the sklearn contract). The inputs are scaled ONCE per row
    (1/sqrt(V)) and the metric folds to euclidean — cheaper than a
    per-pair weighted expression.
    """
    queries, index, metric = apply_metric_rewrites(
        queries, index, metric, metric_params, vec_col
    )
    q = _prep(queries, id_col, vec_col, block_col)
    x = _prep(index, id_col, vec_col, block_col)
    if metric in ("cosine", "cos"):
        # per-id norms ride the row projections so each pair pays one
        # interpreted array traversal (the dot), not three; operand
        # shape matches cosine_distance exactly — f64-identical (the
        # lsh._rescore convention)
        from kiez_spark.functions.vectors import dot, l2_norm

        q = q.withColumn("_n", l2_norm(F.col("vec")))
        x = x.withColumn("_n", l2_norm(F.col("vec")))
        denom = F.col("q._n") * F.col("x._n")
        dist = F.when(denom == 0.0, F.lit(1.0)).otherwise(
            F.lit(1.0) - dot(F.col("q.vec"), F.col("x.vec")) / denom
        )
    else:
        dist = distance_expr(F.col("q.vec"), F.col("x.vec"), metric)
    q = q.alias("q")
    x = x.alias("x")
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
        dist.alias("dist"),
    )
    return topk(cands, k)


def _metric_p(metric: str) -> float | None:
    """Minkowski exponent for element-wise metrics; None for the
    GEMM-expressible family (euclidean/sqeuclidean/cosine). p=inf is
    chebyshev: accumulate with max instead of +, no final root."""
    if metric in ("euclidean", "minkowski", "l2", "sqeuclidean", "cosine", "cos"):
        return None
    if metric in ("manhattan", "l1", "cityblock"):
        return 1.0
    if metric in ("chebyshev", "linf", "l_inf"):
        return np.inf
    if metric == "hamming":
        # rides the p=1 sum-accumulation path with a per-dim binarize
        # (sign of |diff|) and a final /d — see _is_hamming call sites
        return 1.0
    if metric == "canberra":
        # p=1 path with a per-dim |q-x| / (|q|+|x|) normalize; 0/0 term
        # = 0 exactly because the numerator is 0 whenever the
        # denominator is (|q-x| <= |q|+|x|), so dividing by
        # max(den, tiny) is exact — see _is_canberra call sites
        return 1.0
    if metric == "braycurtis":
        # p=1 path with a SECOND per-dim accumulator (sum |q+x|) and one
        # final num/den divide — see _is_braycurtis call sites
        return 1.0
    if metric.startswith("minkowski_"):
        p = float(metric.split("_", 1)[1])
        if p <= 0:
            raise ValueError(f"minkowski p must be > 0, got {p}")
        return p
    raise ValueError(f"unsupported metric: {metric}")


def _p_needs_power(p: float) -> bool:
    """Whether the element-wise family accumulates |diff|**p (p finite,
    != 1) as opposed to the plain-sum (p=1) / running-max (p=inf) forms."""
    return p != 1.0 and p != np.inf


def _is_hamming(metric: str) -> bool:
    """sklearn's hamming = mean(x_i != y_i): the p=1 path over
    sign(|diff|) per dim, divided by d at the end. The mismatch COUNT is
    integer-valued in f64 and d is a constant, so count/d is bit-exact
    across engines."""
    return metric == "hamming"


_CANBERRA_TINY = 1e-300  # exact-zero guard: num==0 whenever den==0


def _is_canberra(metric: str) -> bool:
    """scipy's canberra = sum_i |q_i-x_i| / (|q_i|+|x_i|) with 0/0
    terms dropped: the p=1 path with a per-dim normalize (see
    _metric_p)."""
    return metric == "canberra"


def _is_braycurtis(metric: str) -> bool:
    """scipy's braycurtis = sum_i |q_i-x_i| / sum_i |q_i+x_i|: the p=1
    path with a parallel denominator accumulator and a single divide at
    the end (see _metric_p). The degenerate all-dims q==-x denominator
    is floored at 1e-300 (f64) / 1e-30 (f32 selection) on every tier AND
    in the SQL oracle, so the huge-ratio result is engine-identical."""
    return metric == "braycurtis"


def _is_bool_metric(metric: str) -> bool:
    """sklearn's boolean dissimilarity family beyond hamming: jaccard =
    (CTF+CFT)/(CTT+CTF+CFT), dice = (CTF+CFT)/(2*CTT+CTF+CFT) over
    binarized vectors (x != 0 as True). GEMM-expressible: CTT is a dot
    product of the 0/1 indicators and the row bit-counts supply the
    rest — counts are integer-exact in f32 up to 2^24 dims, so only the
    final divide is f32-rounded in the selection pass (absorbed by the
    k+cushion margin; the f64 rerank divides exact integers and is
    bit-exact with the SQL oracle)."""
    return metric in ("jaccard", "dice")


def _binarize(m: np.ndarray) -> np.ndarray:
    """0/1 indicator rewrite for the boolean family (scipy converts via
    != 0). Like _center_rows for correlation: rewriting the INPUT once
    lets every tier share one kernel shape."""
    return (m != 0).astype(np.float64)


def _bool_dist(ctt, nq_col, nx_row, metric, tiny):
    """Distance tile from a CTT tile + row/col bit counts; num/den are
    integer-valued so the divide is the only rounding."""
    s = nq_col + nx_row
    den = s - ctt if metric == "jaccard" else s
    return (s - 2.0 * ctt) / np.maximum(den, tiny)


def seuclidean_scale(df: DataFrame, vec_col: str, V) -> DataFrame:
    """Rewrite ``vec_col`` to vec_i / sqrt(V_i) so seuclidean reduces to
    plain euclidean in every tier (sqrt(sum (a_i-b_i)^2 / V_i) ==
    euclidean over the scaled inputs). V = per-dimension variances, the
    reference sklearn backend's metric_params={'V': ...} contract."""
    s = F.array(*[F.lit(1.0 / math.sqrt(float(v))) for v in V])
    return df.withColumn(
        vec_col,
        F.zip_with(vec_as_double(vec_col), s, lambda x, w: x * w),
    )


def mahalanobis_chol(VI) -> np.ndarray:
    """Cholesky factor L of the inverse covariance VI (must be SPD —
    sklearn's metric_params={'VI': ...} contract): mahalanobis(a, b) =
    sqrt((a-b)' VI (a-b)) = euclidean(a @ L, b @ L)."""
    return np.linalg.cholesky(np.asarray(VI, dtype=np.float64))


def matvec_transform(df: DataFrame, vec_col: str, mat: np.ndarray) -> DataFrame:
    """Rewrite ``vec_col`` to vec @ mat via an Arrow-batched GEMM
    (mapInPandas) — the mahalanobis input fold. A column-expression
    matvec would be a d^2-node Catalyst tree (4096 nodes at d=64, the
    codegen blowup documented at functions/vectors.correlation); one
    vectorized kernel per batch keeps the plan a single node and the
    math in BLAS."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    m = np.asarray(mat, dtype=np.float64)
    schema = StructType(
        [
            StructField(f.name, ArrayType(DoubleType()), f.nullable)
            if f.name == vec_col
            else f
            for f in df.schema.fields
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf[vec_col] = list(x @ m)
            yield pdf

    return df.mapInPandas(kern, schema)


def apply_metric_rewrites(queries, index, metric, metric_params, vec_col):
    """Shared parameterized-metric input rewrites for the join tiers:
    returns (queries, index, metric) with the metric folded to plain
    euclidean. seuclidean scales by 1/sqrt(V); mahalanobis multiplies
    by the Cholesky factor of VI (see mahalanobis_chol)."""
    if metric == "mahalanobis":
        VI = (metric_params or {}).get("VI")
        if VI is None:
            raise ValueError(
                "metric='mahalanobis' requires metric_params={'VI':"
                " inverse covariance matrix}"
            )
        L = mahalanobis_chol(VI)
        queries = matvec_transform(queries, vec_col, L)
        if index is not None:
            index = matvec_transform(index, vec_col, L)
        return queries, index, "euclidean"
    if metric != "seuclidean":
        return queries, index, metric
    V = (metric_params or {}).get("V")
    if V is None:
        raise ValueError(
            "metric='seuclidean' requires metric_params={'V': [per-dim"
            " variances]}"
        )
    queries = seuclidean_scale(queries, vec_col, V)
    if index is not None:
        index = seuclidean_scale(index, vec_col, V)
    return queries, index, "euclidean"


def _center_rows(m: np.ndarray) -> np.ndarray:
    """Row-center (correlation = cosine over centered rows, scipy's
    definition): rewriting the INPUT once lets every tier inherit the
    cosine fast path — folded-sign GEMM, f32 selection, norm handling —
    with zero per-metric kernel code. Zero-variance rows become zero
    vectors and take the zero-norm cosine convention (distance 1.0)."""
    return m - m.mean(axis=1, keepdims=True)


def _dist_matrix(qm: np.ndarray, xm: np.ndarray, metric: str) -> np.ndarray:
    """Batched distance kernel, float64 BLAS (element-wise dim loop for
    the non-GEMM minkowski family — the reference's sklearn backend takes
    any p, sklearn_nearest_neighbors.py:51-101)."""
    if metric == "correlation":
        return _dist_matrix(_center_rows(qm), _center_rows(xm), "cosine")
    if _is_bool_metric(metric):
        bq, bx = _binarize(qm), _binarize(xm)
        ctt = bq @ bx.T
        return _bool_dist(
            ctt, bq.sum(axis=1)[:, None], bx.sum(axis=1)[None, :],
            metric, _CANBERRA_TINY,
        )
    p = _metric_p(metric)
    if p is not None:
        ham = _is_hamming(metric)
        canb = _is_canberra(metric)
        bc = _is_braycurtis(metric)
        acc = np.zeros((qm.shape[0], xm.shape[0]), dtype=np.float64)
        den_acc = np.zeros_like(acc) if bc else None
        for dcol in range(qm.shape[1]):
            diff = np.abs(qm[:, dcol][:, None] - xm[:, dcol][None, :])
            if ham:
                np.sign(diff, out=diff)
            elif canb:
                den = np.abs(qm[:, dcol])[:, None] + np.abs(xm[:, dcol])[None, :]
                diff /= np.maximum(den, _CANBERRA_TINY)
            elif bc:
                den_acc += np.abs(
                    qm[:, dcol][:, None] + xm[:, dcol][None, :]
                )
            if p == np.inf:
                np.maximum(acc, diff, out=acc)
            else:
                acc += diff if p == 1.0 else diff**p
        if ham:
            acc /= qm.shape[1]
        elif bc:
            acc /= np.maximum(den_acc, _CANBERRA_TINY)
        return acc ** (1.0 / p) if _p_needs_power(p) else acc
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
    if metric == "correlation":
        qm, xm, metric = _center_rows(qm), _center_rows(xm), "cosine"
    n = xm.shape[0]
    kk = min(k, n)
    is_cos = metric in ("cosine", "cos")
    is_bool = _is_bool_metric(metric)
    p = None if is_bool else _metric_p(metric)
    if is_bool:
        bq64, bx64 = _binarize(qm), _binarize(xm)
        bq32, bx32 = bq64.astype(np.float32), bx64.astype(np.float32)
        # integer CTT counts are exact in f32; only the divide rounds
        d32 = _bool_dist(
            bq32 @ bx32.T,
            bq32.sum(axis=1)[:, None],
            bx32.sum(axis=1)[None, :],
            metric,
            np.float32(1e-30),
        )
    elif is_cos:
        qn = np.linalg.norm(qm, axis=1)
        xn = np.linalg.norm(xm, axis=1)
        qn[qn == 0] = 1.0
        xn[xn == 0] = 1.0
        qmn = qm / qn[:, None]
        xmn = xm / xn[:, None]
        d32 = 1.0 - qmn.astype(np.float32) @ xmn.astype(np.float32).T
    elif p is not None:
        # element-wise minkowski family (manhattan, minkowski_p): selection
        # on the f32 p-th-power sum (monotone in the distance)
        qm32 = qm.astype(np.float32)
        xm32 = xm.astype(np.float32)
        d32 = np.zeros((qm.shape[0], n), dtype=np.float32)
        den32 = np.zeros_like(d32) if _is_braycurtis(metric) else None
        for dcol in range(qm.shape[1]):
            diff = np.abs(qm32[:, dcol][:, None] - xm32[:, dcol][None, :])
            if _is_hamming(metric):
                np.sign(diff, out=diff)
            elif _is_canberra(metric):
                den = (
                    np.abs(qm32[:, dcol])[:, None]
                    + np.abs(xm32[:, dcol])[None, :]
                )
                diff /= np.maximum(den, np.float32(1e-30))
            elif den32 is not None:
                den32 += np.abs(
                    qm32[:, dcol][:, None] + xm32[:, dcol][None, :]
                )
            if p == np.inf:
                np.maximum(d32, diff, out=d32)
            else:
                d32 += diff if p == 1.0 else diff**np.float32(p)
        if den32 is not None:
            d32 /= np.maximum(den32, np.float32(1e-30))
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
    if is_bool:
        ctt = (bq64[rows] * bx64[cols]).sum(axis=1)
        dsel = _bool_dist(
            ctt,
            bq64.sum(axis=1)[rows],
            bx64.sum(axis=1)[cols],
            metric,
            _CANBERRA_TINY,
        )
    elif is_cos:
        dsel = 1.0 - (qmn[rows] * xmn[cols]).sum(axis=1)
    elif p is not None:
        diff = np.abs(qm[rows] - xm[cols])
        if _is_hamming(metric):
            dsel = np.sign(diff).sum(axis=1) / qm.shape[1]
        elif _is_canberra(metric):
            den = np.abs(qm[rows]) + np.abs(xm[cols])
            dsel = (diff / np.maximum(den, _CANBERRA_TINY)).sum(axis=1)
        elif _is_braycurtis(metric):
            den = np.abs(qm[rows] + xm[cols]).sum(axis=1)
            dsel = diff.sum(axis=1) / np.maximum(den, _CANBERRA_TINY)
        elif p == np.inf:
            dsel = diff.max(axis=1) if diff.size else np.zeros(len(rows))
        else:
            dsel = diff.sum(axis=1) if p == 1.0 else (diff**p).sum(axis=1) ** (1.0 / p)
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
                 target_bytes=16e6):
        self.center = metric == "correlation"
        if self.center:
            # correlation = cosine over row-centered vectors; center the
            # index once here, queries per chunk (see query_chunk)
            xm = _center_rows(xm)
            metric = "cosine"
        self.x_ids = x_ids
        self.k = k
        self.metric = metric
        self.exclude_self = exclude_self
        self.cushion = cushion
        self.is_cos = metric in ("cosine", "cos")
        self.is_bool = _is_bool_metric(metric)
        self.is_jac = metric == "jaccard"
        self.p = None if self.is_bool else _metric_p(metric)
        self.is_ham = _is_hamming(metric)
        self.is_canb = _is_canberra(metric)
        self.is_bc = _is_braycurtis(metric)
        n = xm.shape[0]
        if self.is_bool:
            # boolean family: 0/1 indicator copies — CTT comes from one
            # GEMM (counts exact in f32), the num/den transform runs on
            # the cache-resident tile (see fill_block)
            self.xb = _binarize(xm)
            self.x32 = self.xb.astype(np.float32)
            self.nx32 = self.x32.sum(axis=1)
            self.nx64 = self.xb.sum(axis=1)
        elif self.p is not None:
            # element-wise minkowski family: no GEMM form; tiles are
            # computed as per-dim |q - x|^p accumulation (still blocked,
            # still f32-select/f64-rerank)
            self.xm = xm
            self.x32 = xm.astype(np.float32)
            if self.is_canb:
                # per-dim |x| for the canberra normalizer, paid once
                self.xabs32 = np.abs(self.x32)
        elif self.is_cos:
            xn = np.linalg.norm(xm, axis=1)
            xn[xn == 0] = 1.0
            self.xmn = xm / xn[:, None]
            # sign folded into the index so the GEMM output is directly
            # monotone in distance (no post-scale pass over the tile)
            self.x32 = (-self.xmn).astype(np.float32)
        else:
            self.xm = xm
            # [-2x | x^2] folded into the index and [q | 1] appended to the
            # query: one GEMM emits d^2 - q^2 directly (monotone in d^2 per
            # row — q^2 moves into the selection threshold). Folding x^2
            # into the GEMM kills the former `dt += x2` sweep, a full
            # read+write pass over every distance tile.
            self.x2 = (xm * xm).sum(axis=1)
            self.x32 = np.concatenate(
                [-2.0 * xm, self.x2[:, None]], axis=1
            ).astype(np.float32)
        if exclude_self:
            self.xsort = np.argsort(x_ids, kind="stable")
            self.x_ids_sorted = x_ids[self.xsort]
        # Blocking scheme (bandwidth is THE scaling limiter on a shared
        # host — and on any many-core executor):
        # - slab (batch x tile): computed ONCE per chunk to take the exact
        #   per-row sel-th threshold via np.partition; must cover
        #   sel = k + cushion columns so its kth value is a valid global
        #   bound.
        # - sub-tiles (batch x subtile): every remaining index column is
        #   processed through a small REUSED block that stays L3-resident
        #   (GEMM write, threshold compare, hit extraction all hit cache),
        #   so steady-state DRAM traffic is just the streamed index slab —
        #   ~13x less than materializing full-width tiles. Measured: 16
        #   concurrent workers at 16 MB blocks saturate this host's DRAM
        #   (~26 GB/s demand) and N->4N efficiency collapses; resident
        #   sub-tiles keep per-core throughput flat from 4 to 16 procs.
        self.tile = min(max(1, n), max(8192, min(k, n) + cushion))
        self.subtile = min(self.tile, 2048)
        self.batch = max(64, min(8192, int(target_bytes / (4 * self.tile))))
        self._d = np.empty((self.batch, self.tile), dtype=np.float32)
        self._mask = np.empty((self.batch, self.tile), dtype=bool)
        self._part = np.empty((self.batch, self.tile), dtype=np.float32)
        # canberra: per-dim denominator tile (|q_d| + |x_d|);
        # braycurtis: across-dim denominator accumulator (sum |q_d + x_d|);
        # boolean family: the s = nq + nx broadcast tile
        self._den = (
            np.empty((self.batch, self.tile), dtype=np.float32)
            if self.is_canb or self.is_bc or self.is_bool
            else None
        )
        self._dsub = np.empty((self.batch, self.subtile), dtype=np.float32)
        self._msub = np.empty((self.batch, self.subtile), dtype=bool)
        self._d_tail = None  # contiguous buffer for the final partial tile
        self._dense = None  # pooled (batch x pool-width) pre-cut scratch
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
        """Cache-blocked selection, slab + resident sub-tiles (see
        __init__): one full-width slab yields the exact per-row sel-th
        threshold (valid global bound: every global top-sel value is <=
        the slab's sel-th), then the rest of the index streams through a
        small reused sub-tile whose GEMM/compare/extraction never leave
        cache. The full (m x n) matrix is never materialized, and the
        pooled candidates are a provable superset of the true top-sel
        per row — the f32 pre-cut below recovers exactly the global
        sel-th before the f64 rerank."""
        if self.center:
            qm = _center_rows(qm)
        n = self.x32.shape[0]
        m = len(q_ids)
        kk = min(self.k, n)
        sel = min(n, kk + self.cushion)
        qabs32 = None
        if self.is_bool:
            qb = _binarize(qm)
            q32 = qb.astype(np.float32)
            nq32 = q32.sum(axis=1)
        elif self.p is not None:
            q32 = qm.astype(np.float32)
            if self.is_canb:
                qabs32 = np.abs(q32)
        elif self.is_cos:
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            qmn = qm / qn[:, None]
            q32 = qmn.astype(np.float32)
        else:
            q32 = np.empty((m, qm.shape[1] + 1), dtype=np.float32)
            q32[:, :-1] = qm
            q32[:, -1] = 1.0
        self_r = self_c = None
        if self.exclude_self:
            self_r, self_c = self._self_positions(q_ids)

        # block values are a per-row-monotone transform of the true
        # distance (-cos_sim, resp. d^2 - q^2 with the constants folded
        # into the GEMM operands), so selection semantics are unchanged
        # while each block costs exactly one GEMM + one fused compare
        pool_r, pool_c, pool_v, pool_p = [], [], [], []
        offset = np.zeros(m, dtype=np.int64)
        row_range = np.arange(m)

        def fill_block(dt, lo, w):
            """Monotone-distance values for index columns [lo, lo+w)."""
            if self.p is not None:
                def canb_norm(buf, dcol):
                    den = self._den[:m, :w]
                    np.add(
                        qabs32[:, dcol][:, None],
                        self.xabs32[lo : lo + w, dcol][None, :],
                        out=den,
                    )
                    np.maximum(den, np.float32(1e-30), out=den)
                    buf /= den

                np.subtract(
                    q32[:, 0][:, None], self.x32[lo : lo + w, 0][None, :], out=dt
                )
                np.abs(dt, out=dt)
                if self.is_ham:
                    np.sign(dt, out=dt)
                elif self.is_canb:
                    canb_norm(dt, 0)
                elif _p_needs_power(self.p):
                    np.power(dt, np.float32(self.p), out=dt)
                den = None
                if self.is_bc:
                    den = self._den[:m, :w]
                    np.add(
                        q32[:, 0][:, None],
                        self.x32[lo : lo + w, 0][None, :],
                        out=den,
                    )
                    np.abs(den, out=den)
                tmp = self._part[:m, :w]  # reuse the partition scratch
                for dcol in range(1, q32.shape[1]):
                    if den is not None:
                        # den term first — tmp is re-used for the num next
                        np.add(
                            q32[:, dcol][:, None],
                            self.x32[lo : lo + w, dcol][None, :],
                            out=tmp,
                        )
                        np.abs(tmp, out=tmp)
                        den += tmp
                    np.subtract(
                        q32[:, dcol][:, None],
                        self.x32[lo : lo + w, dcol][None, :],
                        out=tmp,
                    )
                    np.abs(tmp, out=tmp)
                    if self.is_ham:
                        np.sign(tmp, out=tmp)
                    elif self.is_canb:
                        canb_norm(tmp, dcol)
                    elif self.p == np.inf:
                        np.maximum(dt, tmp, out=dt)
                        continue
                    elif self.p != 1.0:
                        np.power(tmp, np.float32(self.p), out=tmp)
                    dt += tmp
                if den is not None:
                    np.maximum(den, np.float32(1e-30), out=den)
                    dt /= den
            elif self.is_bool:
                # dt <- CTT (integer-exact in f32), then the in-place
                # num/den transform on the cache-resident tile:
                # num = s - 2*ctt, den = s - ctt (jaccard) / s (dice)
                np.dot(q32, self.x32[lo : lo + w].T, out=dt)
                den = self._den[:m, :w]
                np.add(
                    nq32[:, None], self.nx32[lo : lo + w][None, :], out=den
                )  # den = s
                if self.is_jac:
                    den -= dt  # s - ctt
                    dt *= np.float32(-1.0)
                    dt += den  # (s - ctt) - ctt = s - 2*ctt
                else:
                    dt *= np.float32(-2.0)
                    dt += den  # s - 2*ctt
                np.maximum(den, np.float32(1e-30), out=den)
                dt /= den
            else:
                np.dot(q32, self.x32[lo : lo + w].T, out=dt)
            if self_r is not None:
                in_blk = (self_c >= lo) & (self_c < lo + w)
                dt[self_r[in_blk], self_c[in_blk] - lo] = np.inf

        def extract(dt, lo, w, thr):
            """Fused compare against the per-row threshold (no dt -= thr
            pass), FLAT nonzero (5x faster than 2D np.nonzero here), f32
            values captured for the pre-cut below. Pool write positions:
            r is row-major sorted within a block, so within-row order is
            positional; offsets accumulate across blocks."""
            mbuf = self._msub if w <= self.subtile else self._mask
            mask = mbuf[:m, :w]
            np.less_equal(dt, thr[:, None], out=mask)
            flat = np.flatnonzero(np.ravel(mask))
            r, c = np.divmod(flat, w)
            pool_r.append(r)
            pool_c.append(c + lo)
            pool_v.append(dt[r, c])
            starts_t = np.searchsorted(r, row_range)
            pool_p.append(np.arange(len(r)) - starts_t[r] + offset[r])
            np.add(offset, np.bincount(r, minlength=m), out=offset)

        # slab: one full-width block whose exact per-row sel-th value is
        # the global selection threshold (np.partition; values-only
        # partition is ~16x faster than argpartition on this host)
        w0 = min(self.tile, n)
        if w0 == self.tile:
            dt0 = self._d[:m]
        else:
            if self._d_tail is None or self._d_tail.shape[1] != w0:
                self._d_tail = np.empty((self.batch, w0), dtype=np.float32)
            dt0 = self._d_tail[:m]
        fill_block(dt0, 0, w0)
        kth_i = min(sel - 1, w0 - 1)
        part = self._part[:m, :w0]
        np.copyto(part, dt0)
        part.partition(kth_i, axis=1)
        thr = part[:, kth_i].copy()
        extract(dt0, 0, w0, thr)

        # remaining columns through the small RESIDENT sub-tile: GEMM
        # write, compare and extraction all stay in-cache, so the only
        # steady-state DRAM traffic is the streamed index slab
        sub = self.subtile
        for lo in range(w0, n, sub):
            w = min(sub, n - lo)
            if w == sub:
                dts = self._dsub[:m]
            else:
                # np.dot(out=) needs C-contiguity; the final partial block
                # gets its own cached buffer
                if self._d_tail is None or self._d_tail.shape[1] != w:
                    self._d_tail = np.empty((self.batch, w), dtype=np.float32)
                dts = self._d_tail[:m]
            fill_block(dts, lo, w)
            extract(dts, lo, w, thr)
        rows = np.concatenate(pool_r)
        cols = np.concatenate(pool_c)
        # guarantee: rows/cols hold >= min(sel, finite n) candidates per
        # row (tile 1 alone contributes sel of them)

        # f32 pre-cut: tile 1's threshold is only the sel-th of the FIRST
        # tile, so the pooled superset is ~n/tile times larger than sel
        # (measured ~25x on gaussian data). The pool provably contains the
        # global top-sel per row, hence the pool's per-row sel-th value IS
        # the global sel-th — partitioning a dense (m x pool-width) f32
        # scratch recovers it exactly and cuts the f64 rerank + lexsort to
        # ~sel per row. Ties at the threshold are kept (superset stays a
        # superset; the f64 rerank resolves order).
        width = int(offset.max()) if m else 0
        if width > sel:
            vals = np.concatenate(pool_v)
            poss = np.concatenate(pool_p)
            if self._dense is None or self._dense.shape[1] < width:
                self._dense = np.full(
                    (self.batch, int(width * 1.25) + 8), np.inf, dtype=np.float32
                )
            dense = self._dense[:m, :width]
            dense.fill(np.inf)
            dense[rows, poss] = vals
            kth = np.partition(dense, sel - 1, axis=1)[:, sel - 1]
            keep = vals <= kth[rows]
            rows = rows[keep]
            cols = cols[keep]

        # exact float64 rerank of the ragged candidate set, built with
        # pooled buffers + a dim-loop of np.take(out=) so no temporary
        # exceeds the pool (avoids per-chunk multi-MB allocations)
        npool = len(rows)
        if npool > self._pool_cap:
            cap = int(npool * 1.5) + 64
            self._pool = {
                nm: np.empty(cap, dtype=np.float64)
                for nm in ("acc", "acc2", "t1", "t2", "t3")
            }
            self._pool_cap = cap
        acc = self._pool["acc"][:npool]
        acc2 = self._pool["acc2"][:npool]
        t1 = self._pool["t1"][:npool]
        t2 = self._pool["t2"][:npool]
        t3 = self._pool["t3"][:npool]
        if self.is_bool:
            # f64 rerank: CTT via pooled dim-loop dot over the 0/1
            # indicators; num/den are exact integers, one correctly
            # rounded divide -> bit-exact with the SQL oracle
            acc.fill(0.0)
            for dcol in range(qb.shape[1]):
                np.take(qb[:, dcol], rows, out=t1)
                np.take(self.xb[:, dcol], cols, out=t2)
                t1 *= t2
                acc += t1
            # acc = ctt; t1 = s = nq + nx
            nq64 = qb.sum(axis=1)
            np.take(nq64, rows, out=t1)
            np.take(self.nx64, cols, out=t2)
            t1 += t2
            if self.is_jac:
                np.subtract(t1, acc, out=t2)  # den = s - ctt
            else:
                np.copyto(t2, t1)  # den = s
            acc *= -2.0
            acc += t1  # num = s - 2*ctt
            np.maximum(t2, _CANBERRA_TINY, out=t2)
            acc /= t2
            dsel = acc
        elif self.p is not None:
            acc.fill(0.0)
            if self.is_bc:
                acc2.fill(0.0)
            for dcol in range(qm.shape[1]):
                np.take(qm[:, dcol], rows, out=t1)
                np.take(self.xm[:, dcol], cols, out=t2)
                if self.is_canb:
                    # t3 = |q-x|, t1 = max(|q|+|x|, tiny), acc += t3/t1
                    np.subtract(t1, t2, out=t3)
                    np.abs(t3, out=t3)
                    np.abs(t1, out=t1)
                    np.abs(t2, out=t2)
                    t1 += t2
                    np.maximum(t1, _CANBERRA_TINY, out=t1)
                    t3 /= t1
                    acc += t3
                    continue
                if self.is_bc:
                    # acc += |q-x|, acc2 += |q+x|
                    np.subtract(t1, t2, out=t3)
                    np.abs(t3, out=t3)
                    acc += t3
                    t1 += t2
                    np.abs(t1, out=t1)
                    acc2 += t1
                    continue
                t1 -= t2
                np.abs(t1, out=t1)
                if self.is_ham:
                    np.sign(t1, out=t1)
                elif self.p == np.inf:
                    np.maximum(acc, t1, out=acc)
                    continue
                elif self.p != 1.0:
                    np.power(t1, self.p, out=t1)
                acc += t1
            if self.is_ham:
                acc /= qm.shape[1]
            elif self.is_bc:
                np.maximum(acc2, _CANBERRA_TINY, out=acc2)
                acc /= acc2
            elif _p_needs_power(self.p):
                np.power(acc, 1.0 / self.p, out=acc)
            dsel = acc
        elif self.is_cos:
            acc.fill(0.0)
            for dcol in range(qmn.shape[1]):
                np.take(qmn[:, dcol], rows, out=t1)
                np.take(self.xmn[:, dcol], cols, out=t2)
                t1 *= t2
                acc += t1
            dsel = 1.0 - acc
        else:
            acc.fill(0.0)
            for dcol in range(qm.shape[1]):
                np.take(qm[:, dcol], rows, out=t1)
                np.take(self.xm[:, dcol], cols, out=t2)
                t1 *= t2
                acc += t1
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
    metric_params: dict | None = None,
) -> DataFrame:
    """Exact kNN with a broadcast numpy index and mapInPandas matrix kernel.

    Scale contract: the indexed side must fit in executor memory (use
    ``knn_join_blocked`` past ~1M x 64f rows). Query side streams in Arrow
    batches; parallelism = query partitions (the reference's joblib slice
    fan-out, neighbor_algorithm_base.py:139-166, becomes partitioning) —
    an under-partitioned source (one parquet file) is repartitioned up to
    the cluster's parallelism so every core gets work.

    PRECONDITION (metric='hamming'): inputs must be quantized — every
    element integer-valued (or otherwise exactly representable in
    float32). The f32 selection pass binarizes sign(|q32 - x32|); on
    values that are equal in f32 but unequal in f64 (or vice versa) the
    f32 mismatch COUNTS differ from the f64 rerank by whole units, which
    the k+cushion margin does not provably cover. Quantize upstream
    (e.g. floor(x * 2) as the hamming driver query does). The same
    precondition applies to 'jaccard'/'dice', whose binarize (x != 0) is
    only f32/f64-consistent when elements are exactly representable.
    """
    import uuid

    if metric in ("mahalanobis", "seuclidean"):
        if index_bc is not None:
            raise ValueError(
                f"metric={metric!r} with a pre-broadcast index: transform"
                " the index yourself (xm @ mahalanobis_chol(VI) /"
                " xm * 1/sqrt(V)) and pass metric='euclidean'"
            )
        # ONE source of truth for param validation + the DF-side input
        # rewrite (shared with knn_join_expr/knn_join_blocked/pipeline);
        # only the numpy-index fold is unique to this tier. Validation
        # happens inside apply_metric_rewrites before index_np is touched.
        orig_metric = metric
        queries, index, metric = apply_metric_rewrites(
            queries, index, metric, metric_params, vec_col
        )
        if index_np is not None:
            ids_, xm_ = index_np
            if orig_metric == "mahalanobis":
                L = mahalanobis_chol(metric_params["VI"])
                index_np = (ids_, xm_.astype(np.float64) @ L)
            else:
                s_ = 1.0 / np.sqrt(
                    np.asarray(metric_params["V"], dtype=np.float64)
                )
                index_np = (ids_, xm_ * s_[None, :])

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
    # Scale-adaptive fan-out (guide §2): up to 4x parallelism so
    # fine-grained tasks let the scheduler balance around slow cores
    # (this shared host has CPU steal; real clusters have stragglers) at
    # negligible per-task cost since kernel state is worker-cached — but
    # derive the task count from the estimated input bytes (~512 KB of
    # query vectors per task) so a small query side does not fan out into
    # dozens of near-empty python tasks, each paying ~10 ms of
    # scheduling + Arrow round-trip (measured: 2k rows at 96 tasks 1.2 s
    # vs 24 tasks 0.52 s on local[24]). The byte estimate is a
    # driver-side plan statistic — no job.
    target_parts = n_partitions
    if target_parts is None:
        par = spark.sparkContext.defaultParallelism
        hi = par * 4
        try:
            est = int(
                queries._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            target_parts = max(par, min(hi, est >> 19))
        except Exception:
            target_parts = hi
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
    metric_params: dict | None = None,
) -> DataFrame:
    """Exact kNN within blocking keys via cogrouped applyInPandas.

    One shuffle per side (hash on the key), then each block is solved
    locally with the matrix kernel. This is the scale-out tier: with B
    balanced blocks the cost drops from O(n*m) to O(n*m/B), and AQE's
    skew-join split plus salted keys (operators/skew.py) keep hot blocks
    from serializing the stage.
    """
    queries, index, metric = apply_metric_rewrites(
        queries, index, metric, metric_params, vec_col
    )
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
