"""Smoke-level driver-contract checks (full oracle parity is exercised by
tools/check_oracles.py at sf0.01; here: entry() runs, every query runs at
sf0.001, oracle keys are a subset of query keys)."""

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

FAST = [
    "knn_exact_euclidean",
    "hubness_csls",
    "token_counts",
    "minhash_lsh_pairs",
    "events_hourly",
    "linkage_f1",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "cand_id", "rank", "dist"}


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    assert len(o) >= 25


def test_fast_queries_run(spark):
    q = entrymod.queries()
    for name in FAST:
        df = q[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_linkage_f1_gate(spark):
    # r6: the gate is oracle-backed with integer outputs (f1_micro)
    row = entrymod.queries()["linkage_f1"](spark, SF_DIR).first()
    assert row.f1_micro >= 990000
