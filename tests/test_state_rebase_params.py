"""A base re-run into an existing --state-dir must REFRESH the frozen
params.json (a stale file would make later increments sign/gate in a
different LSH space than the rebuilt base state — silently), while
increment writes (ver > base) must never touch it. All three jobs share
the write-path contract."""

import importlib
import json


def _params(state_dir):
    with open(f"{state_dir}/params.json") as fh:
        return json.load(fh)


def test_linkage_rebase_overwrites_frozen_params(spark, tmp_path):
    mod = importlib.import_module("jobs.run_linkage")
    df = spark.createDataFrame([(1,)], "id bigint")
    state = str(tmp_path / "lstate")
    mod._write_link_state(state, 1, df, df, df, {"max_dist": 12.0})
    assert _params(state)["max_dist"] == 12.0
    # base RE-run with new params: params.json must follow the new state
    mod._write_link_state(state, 1, df, df, df, {"max_dist": 8.0})
    assert _params(state)["max_dist"] == 8.0
    # increment (ver > base): frozen params untouched
    mod._write_link_state(state, 2, df, df, df, {"max_dist": 99.0})
    assert _params(state)["max_dist"] == 8.0


def test_er_rebase_overwrites_frozen_params(spark, tmp_path):
    mod = importlib.import_module("jobs.run_er")
    df = spark.createDataFrame([(1,)], "id bigint")
    state = str(tmp_path / "estate")
    mod._write_state_delta(state, 1, df, df, df, df, {"df_cap": 10})
    mod._write_state_delta(state, 1, df, df, df, df, {"df_cap": 20})
    assert _params(state)["df_cap"] == 20
    mod._write_state_delta(state, 2, df, df, df, df, {"df_cap": 30})
    assert _params(state)["df_cap"] == 20


def test_curation_rebase_overwrites_frozen_params(spark, tmp_path):
    mod = importlib.import_module("jobs.run_curation")
    from kiez_spark.operators import dedup as D

    seen = spark.createDataFrame(
        [(1, "some document text here", "s")],
        "doc_id bigint, text string, content_sha string",
    )
    assign = spark.createDataFrame([(1, 1)], "doc_id bigint, survivor_id bigint")
    tomb = spark.createDataFrame([], "doc_id bigint")
    state = str(tmp_path / "cstate")

    def p(n_hashes):
        return {"n_hashes": n_hashes, "bands": 2, "shingle_n": 3, "seed": 42}

    mod._write_state_delta(state, 1, seen, assign, tomb, p(8), D=D)
    mod._write_state_delta(state, 1, seen, assign, tomb, p(4), D=D)
    assert _params(state)["n_hashes"] == 4
    mod._write_state_delta(state, 2, seen, assign, tomb, p(16), D=D)
    assert _params(state)["n_hashes"] == 4
