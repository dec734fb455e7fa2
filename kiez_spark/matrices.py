"""Matrix-boundary export (N10 in SURVEY.md §2.2).

The reference API returns aligned (n_queries, k) numpy matrices with the
missing-neighbor convention ind = -1, dist = NaN
(/root/reference/kiez/neighbors/approximate/nmslib.py:140-149). Inside
the engine, candidates live in long format (absent row == no neighbor);
this utility restores the matrix convention at the driver boundary for
API/test parity. Collects to the driver by design — matrices are a
single-node artifact.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def to_matrices(
    nn_df: DataFrame,
    n_queries: int | None = None,
    k: int | None = None,
    return_distance: bool = True,
):
    """(query_id, cand_id, dist, rank) -> (dist (n,k) float64 NaN-padded,
    ind (n,k) int64 -1-padded); ``return_distance=False`` -> ind only
    (mirrors Kiez.kneighbors' return_distance flag, kiez.py:217-223)."""
    pdf = nn_df.select("query_id", "cand_id", "dist", "rank").toPandas()
    if pdf.empty:
        shape = (n_queries or 0, k or 0)
        return (np.full(shape, np.nan), np.full(shape, -1, dtype=np.int64)) \
            if return_distance else np.full(shape, -1, dtype=np.int64)
    qid = pdf["query_id"].to_numpy(np.int64)
    rnk = pdf["rank"].to_numpy(np.int64)
    n = n_queries or int(qid.max()) + 1
    kk = k or int(rnk.max())
    dist = np.full((n, kk), np.nan)
    ind = np.full((n, kk), -1, dtype=np.int64)
    m = (rnk <= kk) & (qid < n)
    dist[qid[m], rnk[m] - 1] = pdf["dist"].to_numpy(np.float64)[m]
    ind[qid[m], rnk[m] - 1] = pdf["cand_id"].to_numpy(np.int64)[m]
    if return_distance:
        return dist, ind
    return ind
