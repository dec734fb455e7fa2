"""Hubness-analysis parity vs the numpy oracle, incl. the reference's
hand-computed constants (tests/analysis/test_estimation.py semantics)."""

import numpy as np
import pytest

from kiez_spark.operators import analysis as A
from kiez_spark.oracle import numpy_oracle as O


def nn_long(spark, nn_ind):
    rows = [
        (int(i), int(r) + 1, int(nn_ind[i, r]))
        for i in range(nn_ind.shape[0])
        for r in range(nn_ind.shape[1])
    ]
    return spark.createDataFrame(rows, "query_id bigint, rank int, cand_id bigint")


@pytest.fixture(scope="module")
def nn_ind():
    rng = np.random.RandomState(42)
    return rng.randint(0, 200, size=(200, 20)).astype(np.int64)


@pytest.mark.parametrize("k", [2, 5, 10, 20])
def test_hubness_measures_parity(spark, nn_ind, k):
    df = nn_long(spark, nn_ind)
    got = A.hubness_score(df, n_queries=200, target_samples=200, k=k,
                          return_value="all").first().asDict()
    exp = O.hubness_score(nn_ind, target_samples=200, k=k)
    for key in [
        "k_skewness",
        "k_skewness_truncnorm",
        "atkinson",
        "gini",
        "robinhood",
        "antihub_occurrence",
        "hub_occurrence",
        "groupie_ratio",
    ]:
        assert got[key] == pytest.approx(exp[key], rel=1e-6), key


def test_hand_computed_skewness(spark):
    """Reference constant: neighbors [[0,2],[1,0],[2,0],[3,1],[4,0]],
    target_samples=5 => k_skewness ~ 0.9128709291752769
    (tests/analysis/test_estimation.py:39-43)."""
    nn = np.array([[0, 2], [1, 0], [2, 0], [3, 1], [4, 0]])
    df = nn_long(spark, nn)
    got = A.hubness_score(df, n_queries=5, target_samples=5).first()
    assert got["k_skewness"] == pytest.approx(0.9128709291752769, rel=1e-9)


def test_negative_indices_masked(spark):
    """Sentinel tolerance (test_estimation.py:101-104)."""
    nn = np.array([[1, 2, 3], [-1, 4, 5]])
    df = nn_long(spark, nn)
    occ = A.k_occurrence(df, n_entities=2).orderBy("entity_id").collect()
    # ids 0..5 present (bincount grows past minlength), -1 dropped
    counts = {r.entity_id: r.k_occ for r in occ}
    assert -1 not in counts
    assert counts[1] == 1 and counts[4] == 1 and counts[0] == 0


def test_gini_sort_form_equals_pairwise(spark):
    """The sort-based gini must equal the reference's pairwise formula
    (their own three-way equivalence test, test_estimation.py:46-52)."""
    rng = np.random.RandomState(7)
    k_occ = rng.randint(0, 30, size=100)
    pairwise = np.abs(k_occ[:, None] - k_occ[None, :]).sum() / (
        2 * k_occ.size * k_occ.sum()
    )
    assert O.gini_index(k_occ) == pytest.approx(pairwise, rel=1e-12)


def test_atkinson_eps_limit():
    rng = np.random.RandomState(7)
    k_occ = rng.randint(0, 30, size=100)  # zeros included, like the
    # reference's K_OCC fixture (test_estimation.py:18-23,71-74)
    a999 = O.atkinson_index(k_occ, eps=0.999)
    a1 = O.atkinson_index(k_occ, eps=1)
    assert a999 == pytest.approx(a1, abs=1e-3)
