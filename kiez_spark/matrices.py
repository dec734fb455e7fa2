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
    rows = nn_df.select("query_id", "cand_id", "dist", "rank").collect()
    if not rows:
        shape = (n_queries or 0, k or 0)
        return (np.full(shape, np.nan), np.full(shape, -1, dtype=np.int64)) \
            if return_distance else np.full(shape, -1, dtype=np.int64)
    n = n_queries or max(r.query_id for r in rows) + 1
    kk = k or max(r.rank for r in rows)
    dist = np.full((n, kk), np.nan)
    ind = np.full((n, kk), -1, dtype=np.int64)
    for r in rows:
        if r.rank <= kk and r.query_id < n:
            dist[r.query_id, r.rank - 1] = r.dist
            ind[r.query_id, r.rank - 1] = r.cand_id
    if return_distance:
        return dist, ind
    return ind
