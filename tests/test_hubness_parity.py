"""Full-pipeline parity: Spark engine vs vendored numpy oracle.

Replicates the reference's parametrized end-to-end matrix
(/root/reference/tests/test_kiez.py:13-16,41-87): every hubness method,
dual-source and single-source modes, checking neighbor-set parity and
distance values.
"""

import numpy as np
import pytest

from kiez_spark.oracle import numpy_oracle as O
from kiez_spark.pipeline import HubnessKnn, PipelineConfig

METHODS = ["none", "csls", "ls", "nicdm", "mp_normal", "mp_empiric", "dsl"]
K = 5
N_CAND = 10


def collect_matrix(df, k):
    rows = df.orderBy("query_id", "rank").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.cand_id, r.dist))
    n = max(by_q) + 1
    ind = np.full((n, k), -1, dtype=np.int64)
    dist = np.full((n, k), np.nan)
    for q, lst in by_q.items():
        for j, (c, d) in enumerate(lst):
            ind[q, j] = c
            dist[q, j] = d
    return dist, ind


@pytest.mark.parametrize("method", METHODS)
def test_dual_source_parity(spark, source_target, source_df, target_df, method):
    source, target = source_target
    eng = HubnessKnn(PipelineConfig(n_candidates=N_CAND, k=K, hubness=method))
    eng.fit(source_df, target_df)
    got_dist, got_ind = collect_matrix(eng.kneighbors(K), K)
    exp_dist, exp_ind = O.hubness_pipeline(source, target, K, N_CAND, method)
    np.testing.assert_array_equal(got_ind, exp_ind)
    np.testing.assert_allclose(got_dist, exp_dist, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("method", ["none", "csls", "mp_normal", "dsl"])
def test_single_source_parity(spark, source_target, target_df, method):
    _, target = source_target
    eng = HubnessKnn(PipelineConfig(n_candidates=N_CAND, k=K, hubness=method))
    eng.fit(target_df)  # single-source: self-pairs excluded
    got_dist, got_ind = collect_matrix(eng.kneighbors(K), K)
    exp_dist, exp_ind = O.hubness_pipeline(target, None, K, N_CAND, method)
    np.testing.assert_array_equal(got_ind, exp_ind)
    np.testing.assert_allclose(got_dist, exp_dist, rtol=1e-5, atol=1e-8)


def test_k_clamp_warns(spark, source_df, target_df):
    eng = HubnessKnn(PipelineConfig(n_candidates=5, k=5, hubness="csls"))
    eng.fit(source_df, target_df)
    with pytest.warns(UserWarning, match="n_candidates"):
        df = eng.kneighbors(10)  # k > n_candidates -> clamp to 5
    assert df.groupBy("query_id").count().agg({"count": "max"}).first()[0] == 5


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="single candidate"):
        PipelineConfig(n_candidates=1, hubness="csls")
    with pytest.raises(ValueError, match="n_candidates must be > 0"):
        PipelineConfig(n_candidates=-2)
    with pytest.raises(TypeError):
        PipelineConfig(n_candidates=5.0)
    with pytest.raises(ValueError, match="DisSimLocal"):
        PipelineConfig(hubness="dsl", metric="cosine")
    # lsh-tier reverse lists can be EMPTY per target; mp_empiric/dsl have
    # no per-pair fallback and must refuse instead of silently dropping
    # forward pairs
    with pytest.raises(ValueError, match="reverse"):
        PipelineConfig(hubness="mp_empiric", tier="lsh")
    with pytest.raises(ValueError, match="reverse"):
        PipelineConfig(hubness="dsl", tier="lsh")


@pytest.mark.parametrize("metric", ["euclidean", "sqeuclidean", "cosine"])
def test_metrics_none(spark, source_target, source_df, target_df, metric):
    source, target = source_target
    eng = HubnessKnn(PipelineConfig(n_candidates=5, k=3, hubness="none", metric=metric))
    eng.fit(source_df, target_df)
    got_dist, got_ind = collect_matrix(eng.kneighbors(3), 3)
    exp_dist, exp_ind = O.hubness_pipeline(source, target, 3, 5, "none", metric)
    np.testing.assert_array_equal(got_ind, exp_ind)
    np.testing.assert_allclose(got_dist, exp_dist, rtol=1e-9)
