"""Golden-output parity with the reference's own test fixture values.

/root/reference/tests/nn_ind.npy (1000x50 int64 neighbor matrix) feeds
hubness_score in the reference's golden tests
(tests/analysis/test_estimation.py:29-35,55-68) against pickled expected
values; FIXTURES.md quotes the golden constants for robinhood and
antihub_occurrence at k in {2,5,10,50}. Here the SAME fixture data (a
data file — no reference code involved) flows through the Spark analysis
operators and must reproduce those constants.
"""

import os

import numpy as np
import pytest

from kiez_spark.operators import analysis as A

NN_IND = "/root/reference/tests/nn_ind.npy"

GOLDEN = {
    # k: (robinhood, antihub_occurrence) — FIXTURES.md F3 / reference pickles
    2: (0.472, 0.333),
    5: (0.422, 0.167),
    10: (0.3798, 0.083),
    50: (0.25982, 0.001),
}


@pytest.mark.skipif(not os.path.exists(NN_IND), reason="reference fixture absent")
@pytest.mark.parametrize("k", [2, 5, 10, 50])
def test_golden_hubness_scores(spark, k):
    nn = np.load(NN_IND)
    assert nn.shape == (1000, 50)
    rows = [
        (int(i), r + 1, int(nn[i, r]))
        for i in range(nn.shape[0])
        for r in range(nn.shape[1])
    ]
    df = spark.createDataFrame(rows, "query_id bigint, rank int, cand_id bigint")
    got = A.hubness_score(df, n_queries=1000, target_samples=1000, k=k).first()
    want_rh, want_anti = GOLDEN[k]
    assert got["robinhood"] == pytest.approx(want_rh, abs=5e-4)
    assert got["antihub_occurrence"] == pytest.approx(want_anti, abs=5e-4)
