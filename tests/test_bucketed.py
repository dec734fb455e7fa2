"""Bucketed tables: the equi-join of two tables bucketed+sorted on the
join key must plan ZERO Exchange operators (bucket i reads against
bucket i), and results must equal the plain join."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from kiez_spark.sources import bucketed as B


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buck")
    left = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("m"), F.col("id")).alias("meta"),
    )
    B.save_bucketed(left, "t_left", "doc_id", 8, path=str(root / "l"))
    B.save_bucketed(right, "t_right", "doc_id", 8, path=str(root / "r"))
    yield "t_left", "t_right"
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    tl, tr = bucketed_tables
    left, right = B.read_bucketed(spark, tl), B.read_bucketed(spark, tr)
    # force the non-broadcast path so the co-location (not a broadcast)
    # is what eliminates the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = left.join(right, "doc_id")
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
        # and the result is the plain join's result
        assert j.count() == 2500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_read_preserves_rows(spark, bucketed_tables):
    tl, _ = bucketed_tables
    back = B.read_bucketed(spark, tl)
    assert back.count() == 5000
    assert back.agg(F.sum("score")).first()[0] == sum(i % 97 for i in range(5000))
