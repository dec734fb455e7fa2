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


def _me_naive(x, y):
    """Reference symmetric Monge-Elkan in integer micro space."""
    import math

    def one_dir(at, bt):
        if not at or not bt:
            return 0
        tot = sum(
            max(int(math.floor(ER._jaro_winkler_py(t, u) * 1e6)) for u in bt)
            for t in at
        )
        return tot // len(at)

    at = [t for t in x.split(" ") if t]
    bt = [t for t in y.split(" ") if t]
    return (one_dir(at, bt) + one_dir(bt, at)) // 2


def test_monge_elkan_token_reorder_beats_whole_string_jw(spark):
    """The motivating case: reordered tokens score 1.0 under ME while
    whole-string JW sits far below — and the operator's scores equal
    the naive reference exactly (integer-micro arithmetic)."""
    rows = [
        (0, "john smith common-block"),
        (1, "smith john common-block"),
        (2, "acme corp inc common-block"),
        (3, "acme corporation common-block"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.a_id, r.b_id): r.me_micro
        for r in ER.monge_elkan_pairs(
            df,
            block="right(text, 12)",
            key="substr(text, 1, 18)",
            threshold=0.5,
            max_block=16,
        ).collect()
    }
    keys = {r[0]: r[1][:18] for r in [(i, t) for i, t in rows]}
    assert got[(0, 1)] == _me_naive(keys[0], keys[1]) == 1000000
    assert got[(2, 3)] == _me_naive(keys[2], keys[3])
    # whole-string JW on the reordered pair is strictly below ME's 1.0
    # (the shared block suffix inside the key lifts it to ~0.907)
    assert ER._jaro_winkler_py(keys[0], keys[1]) < 0.95
    # every emitted score equals the naive reference and clears threshold
    for (a, b), v in got.items():
        assert v == _me_naive(keys[a], keys[b]) >= 500000


def test_monge_elkan_empty_and_threshold(spark):
    rows = [(0, "   x-block"), (1, "abc x-block"), (2, "abd x-block")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = ER.monge_elkan_pairs(
        df, block="right(text, 7)", key="substr(text, 1, 3)",
        threshold=0.5, max_block=16,
    ).collect()
    pairs = {(r.a_id, r.b_id): r.me_micro for r in got}
    # doc 0's key is all spaces -> zero tokens -> 0 similarity, filtered
    assert all(0 not in p for p in pairs)
    assert pairs[(1, 2)] == _me_naive("abc", "abd")


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


# ----------------------------------------- wave 2: phonetic / FS / meta


def test_phonetic_key_known_values(spark):
    df = spark.createDataFrame(
        [
            (0, "small fast"),   # SMALL -> 25044 -> 2504 -> '54'  -> S540
            (1, "scan table"),   # SCAN  -> 2205  -> 205  -> '5'   -> S500
            (2, "sass"),         # SASS  -> 2022  -> 202  -> '2'   -> S200
            (3, "a"),            # A     -> 0     -> 0    -> ''    -> A000
            (4, "123 nope"),     # no leading alpha word -> 0000
            (5, "pfister"),      # PF run spans pos 1 -> collapse -> P236
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.pkey
        for r in df.select(
            "doc_id", ER.phonetic_key(F.col("text")).alias("pkey")
        ).collect()
    }
    assert got == {0: "S540", 1: "S500", 2: "S200", 3: "A000",
                   4: "0000", 5: "P236"}


def test_fs_scores_hand_computed(spark):
    import math

    fields = {"f1": (0.9, 0.1), "f2": (0.8, 0.2)}
    df = spark.createDataFrame(
        [(1, 2, True, False), (3, 4, None, True)],
        "a_id bigint, b_id bigint, f1 boolean, f2 boolean",
    )
    got = {
        (r.a_id, r.b_id): r.weight_micro
        for r in ER.fs_scores(df, fields).collect()
    }
    w1a, w1d = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    assert got[(1, 2)] == math.floor(1e6 * (0.0 + w1a + w2d))
    assert got[(3, 4)] == math.floor(1e6 * (0.0 + w1d + w2a))  # null = disagree


def test_fs_scores_rejects_bad_mu(spark):
    df = spark.createDataFrame([(1, 2, True)], "a_id bigint, b_id bigint, f boolean")
    with pytest.raises(ValueError):
        ER.fs_scores(df, {"f": (0.1, 0.9)})


def test_fs_em_separates_planted_mixture(spark):
    # 100 clear matches (agree everywhere), 900 clear non-matches
    rows = [(i, i + 10000, True, True, True) for i in range(100)]
    rows += [(i, i + 20000, False, False, False) for i in range(900)]
    pairs = spark.createDataFrame(
        rows, "a_id bigint, b_id bigint, f1 boolean, f2 boolean, f3 boolean"
    )
    params, patterns = ER.fs_em(pairs, ["f1", "f2", "f3"], n_iter=40)
    assert params["p"] == pytest.approx(0.1, abs=0.02)
    for f in ("f1", "f2", "f3"):
        assert params["m"][f] > 0.95 and params["u"][f] < 0.05
    post = {bits: p for bits, _, p in patterns}
    assert post[(1, 1, 1)] > 0.99 and post[(0, 0, 0)] < 0.01
    # DataFrame form mirrors the tuples
    pdf = ER.fs_em_posteriors(spark, pairs, ["f1", "f2", "f3"], n_iter=40)
    got = {(r.f1, r.f2, r.f3): r.posterior_micro for r in pdf.collect()}
    assert got[(1, 1, 1)] > 990000 and got[(0, 0, 0)] < 10000


def test_blocking_quality_exact_counts(spark):
    cand = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "a_id bigint, b_id bigint"
    )
    gold = spark.createDataFrame([(1, 2), (7, 8)], "a_id bigint, b_id bigint")
    row = ER.blocking_quality(cand, gold, n_records=10).collect()[0]
    assert (row.n_candidates, row.n_gold, row.n_found) == (3, 2, 1)
    assert row.pair_completeness_micro == 500000  # 1/2
    assert row.reduction_ratio_micro == 1000000 * (45 - 3) // 45


def test_metablocking_cbs_and_rank(spark):
    # doc 0 and 1 share keys {10, 11, 12}; doc 2 shares only {10} with them;
    # key 99 is on every doc (df 4 > cap) and must not count
    rows = [
        (0, [10, 11, 12, 99]),
        (1, [10, 11, 12, 99]),
        (2, [10, 20, 21, 99]),
        (3, [30, 31, 32, 99]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, ks array<bigint>")
    got = ER.metablocking_pairs(
        df, F.col("ks"), df_cap=3, min_cbs=2, top_n=5
    ).collect()
    assert [(r.a_id, r.b_id, r.cbs, r.rank) for r in got] == [(0, 1, 3, 1)]


def test_random_pairs_deterministic_shape(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    p1 = ER.random_pairs(df, n_offsets=2).collect()
    p2 = ER.random_pairs(df, n_offsets=2).collect()
    s1 = {(r.a_id, r.b_id) for r in p1}
    assert s1 == {(r.a_id, r.b_id) for r in p2}  # no RNG state
    assert len(p1) == len(s1)  # deduplicated
    assert all(r.a_id < r.b_id for r in p1)  # canonical order, no self
    # offsets 1..2 over 50 ranks give 100 directed pairs; after
    # canonicalization at most 100, and near-random coverage well above n
    assert 50 <= len(s1) <= 100
    # a different seed permutes the ranking -> a different pair set
    s3 = {(r.a_id, r.b_id) for r in ER.random_pairs(df, n_offsets=2, seed=99).collect()}
    assert s3 != s1


def test_random_pairs_downsamples_past_cap(spark):
    df = spark.range(400).select(F.col("id").alias("doc_id"))
    got = ER.random_pairs(df, n_offsets=1, max_rows=100).collect()
    ids = {r.a_id for r in got} | {r.b_id for r in got}
    # hash-sampled to ~<= max_rows distinct rows before pairing
    assert len(ids) <= 150


def test_fs_u_probabilities_laplace(spark):
    rows = [(1, 2, True, False), (3, 4, False, None), (5, 6, True, False)]
    pairs = spark.createDataFrame(
        rows, "a_id bigint, b_id bigint, f1 boolean, f2 boolean"
    )
    u = ER.fs_u_probabilities(pairs, ["f1", "f2"])
    assert u["f1"] == pytest.approx((2 + 0.5) / 4)  # null = disagree
    assert u["f2"] == pytest.approx(0.5 / 4)
    assert 0.0 < u["f2"] < u["f1"] < 1.0


def test_fs_em_fixed_u_survives_pure_match_candidates(spark):
    # every candidate is a true match (perfect blocking): free EM is
    # degenerate here, fixed-u must still fit sensible (p, m)
    rows = [(i, i + 1000, True, i % 4 != 0) for i in range(200)]
    pairs = spark.createDataFrame(
        rows, "a_id bigint, b_id bigint, f1 boolean, f2 boolean"
    )
    fixed = {"f1": 0.01, "f2": 0.02}
    params, _ = ER.fs_em(pairs, ["f1", "f2"], n_iter=30, fixed_u=fixed)
    assert params["u"] == fixed  # pinned, never updated
    assert params["p"] > 0.99
    assert params["m"]["f1"] > 0.99
    assert params["m"]["f2"] == pytest.approx(0.75, abs=0.02)
    with pytest.raises(ValueError):
        ER.fs_em(pairs, ["f1", "f2"], fixed_u={"f1": 0.01})


def _jw_bound_py(a: str, b: str) -> float:
    """Pure-python twin of er._jw_upper_bound for the property test."""
    la, lb = len(a), len(b)
    mx = max(la, lb)
    if mx == 0:
        return 0.0
    j_ub = (2.0 + min(la, lb) / mx) / 3.0
    p = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        p += 1
    if j_ub > 0.7:
        return j_ub + 0.1 * p * (1.0 - j_ub)
    return j_ub


def test_jw_upper_bound_dominates_kernel():
    # the prefilter bound must dominate the exact kernel on EVERY pair —
    # fuzz over mixed lengths, shared prefixes, repeats, unicode
    rng = random.Random(7)
    alph = "abcdzé中"
    strs = [
        "".join(rng.choice(alph) for _ in range(rng.randint(0, 20)))
        for _ in range(120)
    ] + ["prefix_shared_x", "prefix_shared_yyyyyyyy", "ab", "ba" * 9]
    for i in range(len(strs) - 1):
        a, b = strs[i], strs[i + 1]
        assert ER._jaro_winkler_py(a, b) <= _jw_bound_py(a, b) + 1e-12, (a, b)


def test_jw_prefilter_is_lossless(spark, corpus):
    # same block/key/threshold with and without the JVM prefilter must
    # yield the IDENTICAL pair set (the bound is provably non-lossy)
    kw = dict(
        block="right(text, 10)",
        key="substr(text, 1, 24)",
        threshold=0.7,
        max_block=16,
    )
    with_f = {
        (r.a_id, r.b_id, r.jw_micro)
        for r in ER.jaro_winkler_pairs(corpus, **kw).collect()
    }
    without = {
        (r.a_id, r.b_id, r.jw_micro)
        for r in ER.jaro_winkler_pairs(corpus, prefilter=False, **kw).collect()
    }
    assert with_f == without and with_f


def test_jw_prefilter_prunes_jvm_side(spark):
    # pairs with no common prefix and strongly mismatched lengths must
    # fall out of the plan BEFORE the pandas UDF: the surviving-pair
    # count equals the exact result, and a direct bound check confirms
    # the planted junk pair is gated
    rows = [
        (0, "b shared-suffix"),                      # len 15
        (1, "a" * 60 + " shared-suffix"),            # len 74, no common prefix
        (2, "martha shared-suffix"),
        (3, "marhta shared-suffix"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = ER.jaro_winkler_pairs(
        df, block="right(text, 13)", key="text", threshold=0.9, max_block=16
    ).collect()
    assert {(r.a_id, r.b_id) for r in got} == {(2, 3)}
    # the (0, 1) pair is provably below threshold by the bound alone
    assert _jw_bound_py(rows[0][1], rows[1][1]) < 0.9
