"""Record-linkage string-matching operators (operators/er.py).

Covers: blocking cap semantics, planted-near-dup recovery through the
levenshtein comparator, bit-exact Jaro-Winkler parity with DuckDB,
sorted-neighborhood pair-set equivalence with the naive sorted list, and
TF-IDF cosine sanity on duplicates vs unrelated docs.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from kiez_spark.operators import er as ER


@pytest.fixture(scope="module")
def corpus(spark):
    """12 docs: 4 bases, each with a near-copy (first word mutated) and
    an unrelated filler; one degenerate block of identical suffixes big
    enough to trip a small max_block."""
    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    did = 0
    for b in range(4):
        base = " ".join(rng.choice(words) for _ in range(12)) + f" tail{b}"
        rows.append((did, base))
        did += 1
        rows.append((did, "zzz " + base.split(" ", 1)[1]))
        did += 1
        rows.append((did, " ".join(rng.choice(words) for _ in range(12)) + f" tail{b}x"))
        did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_blocked_pairs_cap_skips_degenerate_block(spark):
    rows = [(i, "same suffix here") for i in range(5)] + [
        (10, "aa unique block"),
        (11, "ab unique block"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = ER.blocked_pairs(
        df, block="right(text, 12)", key="text", max_block=4
    ).collect()
    # the 5-row block exceeds max_block=4 -> skipped; only the 2-row block pairs
    assert sorted((r.a_id, r.b_id) for r in pairs) == [(10, 11)]


def test_levenshtein_pairs_recover_planted_neardups(spark, corpus):
    got = ER.levenshtein_pairs(
        corpus,
        block="right(text, 10)",
        key="substr(text, 1, 24)",
        max_dist=10,
        max_block=16,
    ).collect()
    pairs = {(r.a_id, r.b_id) for r in got}
    # each planted (base, mutated) pair shares its suffix block and is
    # within 10 edits on the 24-char prefix (first word up to 7 chars vs
    # zzz, plus the chars the shorter string's 24-char window shifts in)
    for b in range(4):
        assert (3 * b, 3 * b + 1) in pairs
    for r in got:
        assert 0 <= r.lev <= 10


def test_jaro_winkler_bit_exact_vs_duckdb(spark):
    rng = random.Random(23)
    alph = "abcdef"
    strs = [
        "".join(rng.choice(alph) for _ in range(rng.randint(1, 14)))
        for _ in range(60)
    ] + ["martha", "marhta", "dwayne", "duane", "dixon", "dicksonx", ""]
    con = duckdb.connect()
    for i in range(0, len(strs) - 1):
        a, b = strs[i], strs[i + 1]
        duck = con.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert ER._jaro_winkler_py(a, b) == duck, (a, b)


def test_jaro_winkler_pairs_flags_mutated_copies(spark, corpus):
    got = ER.jaro_winkler_pairs(
        corpus,
        block="right(text, 10)",
        key="substr(text, 1, 24)",
        threshold=0.7,
        max_block=16,
    ).collect()
    pairs = {(r.a_id, r.b_id) for r in got}
    # planted (base, mutated) JW on the 24-char prefixes spans 0.722-0.796
    for b in range(4):
        assert (3 * b, 3 * b + 1) in pairs
    for r in got:
        assert 700000 <= r.jw_micro <= 1000000


def test_snm_pairs_equal_naive_sorted_window(spark, corpus):
    w = 3
    got = ER.snm_pairs(corpus, key="substr(text, 1, 32)", window=w).collect()
    rows = corpus.select("doc_id", F.expr("substr(text, 1, 32)").alias("k")).collect()
    order = sorted(rows, key=lambda r: (r.k[:7].ljust(7), r.doc_id))
    want = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + w + 1, len(order))):
            want.add((order[i].doc_id, order[j].doc_id, j - i))
    assert {(r.a_id, r.b_id, r.gap) for r in got} == want


def test_snm_rank_ties_break_on_id(spark):
    # identical keys: ranks (and so pairs) must still be deterministic
    df = spark.createDataFrame(
        [(i, "same key text") for i in (5, 1, 9, 3)],
        "doc_id bigint, text string",
    )
    got = ER.snm_pairs(df, key="text", window=1).collect()
    assert sorted((r.a_id, r.b_id) for r in got) == [(1, 3), (3, 5), (5, 9)]


def test_tfidf_cosine_duplicates_score_one(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact duplicate -> cosine 1.0
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    got = ER.tfidf_cosine_pairs(
        df, shingle_n=3, df_cap=64, threshold=0.3, n_docs=3
    ).collect()
    by_pair = {(r.a_id, r.b_id): r for r in got}
    assert by_pair[(0, 1)].cos == pytest.approx(1.0, abs=1e-6)
    assert (0, 2) not in by_pair and (1, 2) not in by_pair
