"""B-cubed metric: hand-computed tiny cases + structural properties."""

import pytest
from pyspark.sql import functions as F

from kiez_spark.operators import evaluate as E


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, component bigint")


def test_bcubed_hand_computed(spark):
    """pred {a,b}{c} vs gold {a}{b,c}: per-record p = (1/2, 1/2, 1),
    r = (1, 1/2, 1/2) -> P = R = F1 = 2/3 (Bagga & Baldwin 1998, the
    worked example shape)."""
    pred = _mk(spark, [(1, 1), (2, 1), (3, 3)])
    gold = _mk(spark, [(1, 1), (2, 2), (3, 2)])
    row = E.bcubed(pred, gold).first()
    assert row["b3_precision"] == pytest.approx(2 / 3)
    assert row["b3_recall"] == pytest.approx(2 / 3)
    assert row["b3_f1"] == pytest.approx(2 / 3)
    assert row["n_records"] == 3


def test_bcubed_identical_clusterings_are_perfect(spark):
    a = _mk(spark, [(i, i % 4) for i in range(20)])
    row = E.bcubed(a, a).first()
    assert row["b3_precision"] == 1.0 == row["b3_recall"] == row["b3_f1"]


def test_bcubed_refinement_keeps_precision_one(spark):
    """pred strictly refines gold -> every pred cluster sits inside one
    gold cluster: precision 1, recall = mean |c|/|g| < 1."""
    pred = _mk(spark, [(i, i // 2) for i in range(8)])   # pairs
    gold = _mk(spark, [(i, i // 4) for i in range(8)])   # quads
    row = E.bcubed(pred, gold).first()
    assert row["b3_precision"] == 1.0
    assert row["b3_recall"] == pytest.approx(0.5)
    assert row["b3_f1"] == pytest.approx(2 / 3)


def test_bcubed_swap_transposes(spark):
    """Swapping pred and gold swaps precision and recall exactly."""
    pred = _mk(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)])
    gold = _mk(spark, [(1, 1), (2, 2), (3, 2), (4, 2), (5, 5)])
    a = E.bcubed(pred, gold).first()
    b = E.bcubed(gold, pred).first()
    assert a["b3_precision"] == pytest.approx(b["b3_recall"])
    assert a["b3_recall"] == pytest.approx(b["b3_precision"])
    assert a["b3_f1"] == pytest.approx(b["b3_f1"])
