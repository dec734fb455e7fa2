"""Incremental ER: persisted blocking index + batch-incident candidate
generation + touched-component-only cluster merge, proven EQUAL to a
full re-run over the combined corpus (no cap-crossing keys on this
fixture, so the monotone-increment semantic coincides with exactness)."""

from pyspark.sql import functions as F

from kiez_spark.functions import text as T
from kiez_spark.operators import clustering as CC
from kiez_spark.operators import er as ER


def _keys():
    return F.transform(T.shingles(T.tokens(F.col("text")), 3), T.token_hash)


def _split_corpus(spark, n=600):
    """repos_files split into corpus (first 3 of each 4-cluster + some
    singletons) and batch (the rest) so batch members must join EXISTING
    corpus clusters, merge them, and open new ones."""
    from kiez_spark import synth

    files = synth.repos_files(spark, n=n)
    docs = files.select(
        F.col("row_id").alias("doc_id"), F.col("content").alias("text")
    )
    batch = docs.filter(F.col("doc_id") % 4 == 3)
    corpus = docs.filter(F.col("doc_id") % 4 != 3)
    return docs, corpus, batch


def test_incremental_pairs_union_equals_full_reblock(spark):
    docs, corpus, batch = _split_corpus(spark)
    posting, stats = ER.build_blocking_index(corpus, _keys(), df_cap=64)
    inc = ER.incremental_blocking_pairs(
        batch, _keys(), posting, stats, df_cap=64, min_cbs=3
    )
    old = ER.metablocking_pairs(
        corpus, _keys(), df_cap=64, min_cbs=3, top_n=None
    ).select("a_id", "b_id", "cbs")
    full = ER.metablocking_pairs(
        docs, _keys(), df_cap=64, min_cbs=3, top_n=None
    ).select("a_id", "b_id", "cbs")
    got = old.unionByName(inc.select("a_id", "b_id", "cbs"))
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    assert inc.count() > 0  # the increment actually contributed edges


def test_incremental_pairs_union_df_cap(spark):
    # key 7 has corpus df 2 and batch df 2: cap 3 kills it ONLY when the
    # union frequency is consulted — a corpus-local cap would pair on it
    corpus = spark.createDataFrame(
        [(1, [7, 8]), (2, [7, 8])], "doc_id bigint, ks array<bigint>"
    )
    batch = spark.createDataFrame(
        [(11, [7, 9]), (12, [7, 9])], "doc_id bigint, ks array<bigint>"
    )
    posting, stats = ER.build_blocking_index(
        corpus, F.col("ks"), df_cap=3
    )
    got = ER.incremental_blocking_pairs(
        batch, F.col("ks"), posting, stats, df_cap=3, min_cbs=1
    ).collect()
    # key 7 union-df 4 > 3 -> dropped; only the batch-intra key 9 pairs
    assert [(r.a_id, r.b_id, r.cbs) for r in got] == [(11, 12, 1)]


def test_merge_components_equals_full_cc(spark):
    # old graph: {1,2,3}, {4,5}, {6} singleton, 7 isolated newcomer-to-be
    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a_id bigint, b_id bigint"
    )
    nodes = spark.range(1, 7).select(F.col("id"))
    assign0 = CC.connected_components(
        old_edges, nodes=nodes, pair_cols=("a_id", "b_id")
    )
    # increment: 8 bridges the two clusters; 9-6 extends a singleton;
    # 10 arrives with no edges at all
    new_edges = spark.createDataFrame(
        [(3, 8), (8, 4), (9, 6)], "a_id bigint, b_id bigint"
    )
    batch = spark.createDataFrame([(8,), (9,), (10,)], "id bigint")
    got = CC.merge_components(
        assign0, new_edges, batch_nodes=batch
    )
    full = CC.connected_components(
        old_edges.unionByName(new_edges),
        nodes=nodes.unionByName(batch.select("id")),
        pair_cols=("a_id", "b_id"),
    )
    g = {(r.id, r.component) for r in got.collect()}
    f = {(r.id, r.component) for r in full.collect()}
    assert g == f
    assert (10, 10) in g  # edge-less newcomer -> singleton


def test_incremental_er_end_to_end_equals_full_rerun(spark):
    docs, corpus, batch = _split_corpus(spark)
    # corpus state: index + clusters from the corpus-only run
    posting, stats = ER.build_blocking_index(corpus, _keys(), df_cap=64)
    corpus_pairs = ER.metablocking_pairs(
        corpus, _keys(), df_cap=64, min_cbs=3, top_n=None
    )
    assign0 = CC.connected_components(
        corpus_pairs, nodes=corpus.select("doc_id"), pair_cols=("a_id", "b_id")
    ).localCheckpoint()
    # increment
    inc = ER.incremental_blocking_pairs(
        batch, _keys(), posting, stats, df_cap=64, min_cbs=3
    )
    got = CC.merge_components(
        assign0, inc, batch_nodes=batch.select("doc_id")
    )
    # full re-run over the combined corpus
    full_pairs = ER.metablocking_pairs(
        docs, _keys(), df_cap=64, min_cbs=3, top_n=None
    )
    full = CC.connected_components(
        full_pairs, nodes=docs.select("doc_id"), pair_cols=("a_id", "b_id")
    )
    assert {(r.id, r.component) for r in got.collect()} == {
        (r.id, r.component) for r in full.collect()
    }
    # sanity: the increment merged batch members into existing clusters
    merged = got.groupBy("component").count().filter("count >= 4").count()
    assert merged > 0


def test_update_blocking_index_cap_crossing(spark):
    # key 7: corpus df 2, batch df 2 -> union 4 crosses cap 3 and must
    # leave the UPDATED posting table (monotone exclusion), while its
    # stats row keeps the true union df; key 9 stays under cap
    corpus = spark.createDataFrame(
        [(1, [7, 9]), (2, [7])], "doc_id bigint, ks array<bigint>"
    )
    batch = spark.createDataFrame(
        [(11, [7, 9]), (12, [7, 8])], "doc_id bigint, ks array<bigint>"
    )
    posting, stats = ER.build_blocking_index(corpus, F.col("ks"), df_cap=3)
    posting2, stats2 = ER.update_blocking_index(
        posting, stats, batch, F.col("ks"), df_cap=3
    )
    df_by_key = {r.k: r.df for r in stats2.collect()}
    assert df_by_key == {7: 4, 8: 1, 9: 2}
    got = {(r.k, r.id) for r in posting2.collect()}
    assert got == {(9, 1), (9, 11), (8, 12)}


def test_raw_delta_reconstruction_equals_full_build(spark):
    """The delta state store keeps UNCAPPED raw postings + per-version
    df contributions (jobs/run_er.py); reconstructing the capped posting
    table by filtering the raw union on the SUMMED df must equal a
    from-scratch build_blocking_index over the combined corpus — cap
    membership depends only on total frequency."""
    a = spark.createDataFrame(
        [(1, [7, 9]), (2, [7])], "doc_id bigint, ks array<bigint>"
    )
    b = spark.createDataFrame(
        [(11, [7, 9]), (12, [7, 8])], "doc_id bigint, ks array<bigint>"
    )
    cap = 3
    # delta writes: raw postings + df contribution per version
    raw_a = ER.blocking_postings_raw(a, F.col("ks"))
    raw_b = ER.blocking_postings_raw(b, F.col("ks"))
    stats_a = raw_a.groupBy("k").agg(F.count("*").alias("df"))
    stats_b = raw_b.groupBy("k").agg(F.count("*").alias("df"))
    # read-side reconstruction
    raw = raw_a.unionByName(raw_b)
    stats = (
        stats_a.unionByName(stats_b)
        .groupBy("k").agg(F.sum("df").alias("df"))
    )
    posting = raw.join(
        stats.filter(F.col("df") <= cap).select("k"), "k"
    ).select("k", "id")
    # from-scratch truth over the union
    full_posting, full_stats = ER.build_blocking_index(
        a.unionByName(b), F.col("ks"), df_cap=cap
    )
    assert {(r.k, r.id) for r in posting.collect()} == {
        (r.k, r.id) for r in full_posting.collect()
    }
    assert {(r.k, r.df) for r in stats.collect()} == {
        (r.k, r.df) for r in full_stats.collect()
    }


def test_crossed_cap_retractions_hand_case(spark):
    """Deliberate cap crossing: key A (docs 1,2,3) crosses when doc 4
    arrives (df_cap=3); pairs supported only via A (+ one other key)
    drop below min_cbs=2 and must be retracted — strict chain equals
    the from-scratch re-block (empty here)."""
    keys = F.col("karr")
    corpus = spark.createDataFrame(
        [(1, ["A", "B"]), (2, ["A", "B", "C"]), (3, ["A", "C"])],
        "doc_id bigint, karr array<string>",
    )
    batch = spark.createDataFrame(
        [(4, ["A", "Z1", "Z2"])], "doc_id bigint, karr array<string>"
    )
    posting, stats = ER.build_blocking_index(corpus, keys, df_cap=3)
    base = {
        (r.a_id, r.b_id)
        for r in ER.metablocking_pairs(
            corpus, keys, df_cap=3, min_cbs=2, top_n=None
        ).collect()
    }
    assert base == {(1, 2), (2, 3)}
    retr = {
        (r.a_id, r.b_id)
        for r in ER.crossed_cap_retractions(
            posting, stats, batch, keys, df_cap=3, min_cbs=2
        ).collect()
    }
    # retractions may include never-emitted affected pairs like (1, 3)
    # (cbs 1 < min_cbs at base too) — a documented set-difference no-op
    assert {(1, 2), (2, 3)} <= retr <= {(1, 2), (2, 3), (1, 3)}
    inc = ER.incremental_blocking_pairs(
        batch, keys, posting, stats, df_cap=3, min_cbs=2
    )
    assert inc.count() == 0
    full = ER.metablocking_pairs(
        corpus.unionByName(batch), keys, df_cap=3, min_cbs=2, top_n=None
    )
    assert (base | set()) - retr == {
        (r.a_id, r.b_id) for r in full.collect()
    } == set()


def test_strict_chain_equals_full_reblock_randomized(spark):
    """Property: over a random multi-batch chain with heavy cap
    crossings, (all emitted pairs) MINUS (all retractions) == the
    from-scratch re-block of the final corpus (min_cbs respected,
    top_n=None). This is the strict mode's full-re-run equality."""
    import random

    rng = random.Random(17)
    alphabet = [f"K{i}" for i in range(10)]
    cap, m = 4, 2

    def mkdocs(ids):
        return spark.createDataFrame(
            [(i, sorted(rng.sample(alphabet, 3))) for i in ids],
            "doc_id bigint, karr array<string>",
        )

    keys = F.col("karr")
    corpus = mkdocs(range(8)).localCheckpoint()
    batches = [mkdocs(range(8 + 4 * b, 12 + 4 * b)).localCheckpoint()
               for b in range(3)]

    posting, stats = ER.build_blocking_index(corpus, keys, df_cap=cap)
    emitted = {
        (r.a_id, r.b_id)
        for r in ER.metablocking_pairs(
            corpus, keys, df_cap=cap, min_cbs=m, top_n=None
        ).collect()
    }
    retracted = set()
    union = corpus
    for batch in batches:
        retracted |= {
            (r.a_id, r.b_id)
            for r in ER.crossed_cap_retractions(
                posting, stats, batch, keys, df_cap=cap, min_cbs=m
            ).collect()
        }
        emitted |= {
            (r.a_id, r.b_id)
            for r in ER.incremental_blocking_pairs(
                batch, keys, posting, stats, df_cap=cap, min_cbs=m
            ).collect()
        }
        posting, stats = ER.update_blocking_index(
            posting, stats, batch, keys, df_cap=cap
        )
        posting = posting.localCheckpoint()
        stats = stats.localCheckpoint()
        union = union.unionByName(batch)

    full = {
        (r.a_id, r.b_id)
        for r in ER.metablocking_pairs(
            union, keys, df_cap=cap, min_cbs=m, top_n=None
        ).collect()
    }
    # sanity: the fixture really exercises crossings and retractions
    assert retracted, "fixture produced no cap crossings"
    assert emitted - retracted == full
