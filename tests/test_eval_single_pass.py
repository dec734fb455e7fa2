"""The evaluation aggregates must be SINGLE-PASS and fully lazy: one
full-outer join + one aggregation, zero Spark jobs at plan-construction
time (the r5 verdict flagged blocking_quality's three count jobs and
hits_at_k's separate gold.count() — each re-traversed the candidate plan).
"""

import pytest
from pyspark.sql import functions as F

from kiez_spark.operators import er as ER
from kiez_spark.operators import evaluate as E


def _assert_lazy(spark, build):
    """Run ``build`` under a dedicated job group and assert it scheduled
    NO Spark jobs — i.e. the metric is a pure plan until the caller's
    single action."""
    sc = spark.sparkContext
    group = "lazy-eval-check"
    sc.setJobGroup(group, "laziness assertion")
    try:
        df = build()
    finally:
        # clear the thread-local group so later jobs don't inherit it
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert jobs == [], f"metric construction ran {len(jobs)} Spark job(s)"
    return df


def _pairs(spark, rows, cols=("src_id", "tgt_id")):
    return spark.createDataFrame(rows, f"{cols[0]} bigint, {cols[1]} bigint")


def test_pairwise_f1_lazy_and_exact(spark):
    pred = _pairs(spark, [(1, 2), (3, 2), (3, 4)])
    gold = _pairs(spark, [(1, 2), (4, 5)])
    df = _assert_lazy(spark, lambda: E.pairwise_f1(pred, gold))
    r = df.collect()[0]
    assert (r.tp, r.fp, r.fn) == (1, 2, 1)
    assert r.precision == pytest.approx(1 / 3)
    assert r.recall == pytest.approx(1 / 2)
    assert r.f1 == pytest.approx(0.4)


def test_pairwise_f1_empty_sides(spark):
    empty = _pairs(spark, [])
    gold = _pairs(spark, [(1, 2)])
    r = E.pairwise_f1(empty, gold).collect()[0]
    assert (r.tp, r.fp, r.fn) == (0, 0, 1)
    assert r.precision == 0.0 and r.recall == 0.0 and r.f1 == 0.0
    r2 = E.pairwise_f1(gold, empty).collect()[0]
    assert (r2.tp, r2.fp, r2.fn) == (0, 1, 0)
    assert r2.f1 == 0.0


def test_pairwise_f1_canonicalizes_and_dedups(spark):
    # (2,1) == (1,2); self-pairs dropped; duplicates collapse
    pred = _pairs(spark, [(2, 1), (1, 2), (7, 7)])
    gold = _pairs(spark, [(1, 2)])
    r = E.pairwise_f1(pred, gold).collect()[0]
    assert (r.tp, r.fp, r.fn) == (1, 0, 0)
    assert r.f1 == 1.0


def test_hits_at_k_lazy_and_exact(spark):
    nn = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2), (3, 31, 4)],
        "query_id bigint, cand_id bigint, rank int",
    )
    gold = _pairs(spark, [(1, 11), (2, 20), (3, 30), (4, 40)])
    df = _assert_lazy(spark, lambda: E.hits_at_k(nn, gold, ks=(1, 2)))
    rows = {r.k: r for r in df.collect()}
    assert rows[1].n_hits == 1 and rows[1].n_gold == 4
    assert rows[2].n_hits == 2 and rows[2].n_gold == 4
    assert rows[1].hits == pytest.approx(0.25)
    assert rows[2].hits == pytest.approx(0.5)


def test_hits_at_k_empty_gold(spark):
    nn = spark.createDataFrame(
        [(1, 10, 1)], "query_id bigint, cand_id bigint, rank int"
    )
    gold = _pairs(spark, [])
    rows = E.hits_at_k(nn, gold, ks=(1,)).collect()
    # empty gold: the single agg row still explodes into one row per k
    assert [(r.k, r.n_hits, r.n_gold, r.hits) for r in rows] == [(1, 0, 0, 0.0)]


def test_hits_at_k_multi_target_gold(spark):
    """Non-1:1 gold keeps the pre-r6 eager semantics: n_hits counts SRCS
    with any hit, n_gold counts gold ROWS (the r6 single-pass rewrite
    briefly collapsed the denominator to distinct srcs — 2/2 here)."""
    nn = spark.createDataFrame(
        [(1, 10, 1), (2, 30, 1)], "query_id bigint, cand_id bigint, rank int"
    )
    # src 1 has two gold targets (one hit), src 2 one (hit): 2 srcs / 3 rows
    gold = _pairs(spark, [(1, 10), (1, 11), (2, 30)])
    rows = {r.k: r for r in E.hits_at_k(nn, gold, ks=(1,)).collect()}
    assert rows[1].n_hits == 2 and rows[1].n_gold == 3
    assert rows[1].hits == pytest.approx(2 / 3)


def test_blocking_quality_dedups_inputs(spark):
    """Duplicate input pairs must not skew the full-outer-join counts: a
    cand pair appearing twice would double the joined gold row
    (n_gold=2 for 1 actual) without the enforced distinct."""
    cand = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4)], "a_id bigint, b_id bigint"
    )
    gold = spark.createDataFrame([(1, 2)], "a_id bigint, b_id bigint")
    r = ER.blocking_quality(cand, gold, 10).collect()[0]
    assert (r.n_candidates, r.n_gold, r.n_found) == (2, 1, 1)
    assert r.pair_completeness_micro == 1000000


def test_blocking_quality_lazy_and_exact(spark):
    cand = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a_id bigint, b_id bigint"
    )
    gold = spark.createDataFrame(
        [(1, 2), (5, 6)], "a_id bigint, b_id bigint"
    )
    df = _assert_lazy(spark, lambda: ER.blocking_quality(cand, gold, 10))
    r = df.collect()[0]
    assert (r.n_candidates, r.n_gold, r.n_found) == (3, 2, 1)
    assert r.pair_completeness_micro == 1000000 * 1 // 2
    assert r.reduction_ratio_micro == 1000000 * (45 - 3) // 45


def test_blocking_quality_empty_gold(spark):
    cand = spark.createDataFrame([(1, 2)], "a_id bigint, b_id bigint")
    gold = spark.createDataFrame([], "a_id bigint, b_id bigint")
    r = ER.blocking_quality(cand, gold, 4).collect()[0]
    assert (r.n_candidates, r.n_gold, r.n_found) == (1, 0, 0)
    assert r.pair_completeness_micro == 0


def test_bcubed_is_lazy(spark):
    pred = spark.createDataFrame(
        [(1, 100), (2, 100)], "id bigint, component bigint"
    )
    gold = spark.createDataFrame(
        [(1, 7), (2, 8)], "id bigint, component bigint"
    )
    df = _assert_lazy(spark, lambda: E.bcubed(pred, gold))
    r = df.collect()[0]
    assert r.b3_precision == pytest.approx(0.5)
    assert r.b3_recall == pytest.approx(1.0)
