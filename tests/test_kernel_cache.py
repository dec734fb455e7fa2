"""Regression: worker-side kernel-state cache must be keyed per fit.

A cache token derived from id(self) can alias across engines: CPython
reuses freed addresses, so a second HubnessKnn fit on DIFFERENT data in
the same Spark app could hit a worker-cached _BruteKnnKernel built from
the first fit's broadcast index and silently return neighbors from the
stale index. The fix keys the token by a uuid generated in fit().
"""

import numpy as np

from kiez_spark.pipeline import HubnessKnn, PipelineConfig


def _df(spark, mat, id_offset=0):
    rows = [(i + id_offset, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "id bigint, vec array<double>")


def test_refit_different_data_not_served_from_stale_kernel(spark):
    rng = np.random.RandomState(0)
    a = rng.rand(60, 4)
    b = rng.rand(60, 4) + 100.0  # disjoint region, disjoint ids

    def run(mat, off):
        eng = HubnessKnn(PipelineConfig(n_candidates=5, k=3, tier="pandas"))
        eng.fit(_df(spark, mat, off))
        out = {
            (r["query_id"], r["rank"]): r["cand_id"]
            for r in eng.kneighbors(3).collect()
        }
        eng.release()
        return out

    first = run(a, 0)
    second = run(b, 1000)
    # every neighbor of the second fit must come from the second id space
    assert all(cid >= 1000 for cid in second.values())
    assert all(cid < 1000 for cid in first.values())
    # and re-running the FIRST data again gives the original answers
    assert run(a, 0) == first


def test_many_fits_evict_worker_cache_safely(spark):
    """More engines than the worker cache holds (4): answers stay correct
    as entries are evicted and rebuilt."""
    rng = np.random.RandomState(1)
    mats = [rng.rand(30, 3) + 10.0 * i for i in range(6)]
    engines = []
    expected = []
    for i, m in enumerate(mats):
        eng = HubnessKnn(PipelineConfig(n_candidates=4, k=2, tier="pandas"))
        eng.fit(_df(spark, m, 10_000 * (i + 1)))
        engines.append(eng)
        expected.append(sorted(
            (r["query_id"], r["rank"], r["cand_id"])
            for r in eng.kneighbors(2).collect()
        ))
    # query them again in reverse order — cache thrash must not corrupt
    for eng, exp in zip(reversed(engines), reversed(expected)):
        got = sorted(
            (r["query_id"], r["rank"], r["cand_id"])
            for r in eng.kneighbors(2).collect()
        )
        assert got == exp
    for eng in engines:
        eng.release()
