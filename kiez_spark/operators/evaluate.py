"""Evaluation metrics: hits@k, pairwise precision/recall/F1, B-cubed.

hits@k mirrors /root/reference/kiez/evaluate/eval_metrics.py:7-61: the
fraction of gold (src -> tgt) pairs whose tgt appears among src's top-k
neighbors; one conditional aggregate per k, a single join overall.

pairwise_f1 is the record-linkage extension ([ext], BASELINE.json
north_rule): precision/recall/F1 over unordered matched pairs vs gold
pairs — the ≥0.99 acceptance metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_at_k(
    nn_df: DataFrame,
    gold: DataFrame,
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """nn_df: (query_id, cand_id, rank); gold: (src_id, tgt_id), one tgt
    per src (a dict in the reference). Returns one row per k:
    (k, hits, n_hits, n_gold) — the ratio plus its exact integer
    numerator/denominator, so consumers that must hash identically
    across engines can use integer arithmetic instead of rounding the
    double ratio (a 1-ulp cross-engine hazard on boundary corpora).

    Ratio semantics (unchanged from the eager pre-r6 form): n_hits
    counts SRCS whose best-ranked gold tgt sits within k; n_gold counts
    gold ROWS. For the reference's dict-shaped (1:1) gold these
    coincide; a multi-target or duplicate-row gold table keeps the
    per-row denominator rather than silently collapsing to distinct
    srcs. PRECONDITION: nn_df has unique (query_id, cand_id) rows —
    true for every top-k kneighbors output; duplicate neighbor rows
    would inflate the row count the denominator rides on.

    SINGLE-PASS and fully lazy: gold LEFT-joins onto the neighbor table,
    per-src best rank and the per-k conditional sums fold into ONE
    aggregation (n_gold rides along as a per-src row-count sum) — no
    separate gold.count() job, no driver-side .first(); the caller's one
    action computes everything. An empty gold set yields zero rows per k
    with hits = 0.0 (the previous eager form raised ZeroDivisionError)."""
    j = gold.select("src_id", "tgt_id").join(
        nn_df.select("query_id", "cand_id", "rank"),
        (F.col("src_id") == F.col("query_id"))
        & (F.col("tgt_id") == F.col("cand_id")),
        "left",
    )
    per_src = j.groupBy("src_id").agg(
        F.min("rank").alias("best_rank"),
        F.count(F.lit(1)).alias("_rows"),
    )
    sorted_ks = sorted(ks)
    agg = per_src.agg(
        F.coalesce(F.sum("_rows"), F.lit(0)).alias("n_gold"),
        *[
            F.sum(
                F.when(F.col("best_rank") <= kk, 1).otherwise(0)
            ).cast("bigint").alias(f"h{kk}")
            for kk in sorted_ks
        ],
    )
    per_k = agg.select(
        "n_gold",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kk).cast("int").alias("k"),
                        F.coalesce(F.col(f"h{kk}"), F.lit(0))
                        .cast("bigint")
                        .alias("n_hits"),
                    )
                    for kk in sorted_ks
                ]
            )
        ).alias("s"),
    )
    return per_k.select(
        F.col("s.k").alias("k"),
        F.when(
            F.col("n_gold") > 0, F.col("s.n_hits") / F.col("n_gold")
        ).otherwise(F.lit(0.0)).alias("hits"),
        F.col("s.n_hits").alias("n_hits"),
        F.col("n_gold").cast("bigint").alias("n_gold"),
    )


def _canon_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Unordered pair canonicalization (u < v) + dedup + self-pair drop."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def pairwise_f1(
    pred_pairs: DataFrame,
    gold_pairs: DataFrame,
    pred_cols: tuple[str, str] = ("src_id", "tgt_id"),
    gold_cols: tuple[str, str] = ("src_id", "tgt_id"),
) -> DataFrame:
    """One-row DataFrame (tp, fp, fn, precision, recall, f1).

    SINGLE-PASS and fully lazy: one full-outer join on the canonical
    pair key, then one aggregation counts both sides and the
    intersection together — the previous form ran THREE count jobs,
    each re-traversing the (possibly huge) candidate plan. At 100 TB
    the pair sets are the expensive operand; one traversal is the
    floor. Empty sides degrade to 0.0 metrics exactly as before."""
    pred = _canon_pairs(pred_pairs, *pred_cols).withColumn("_p", F.lit(1))
    gold = _canon_pairs(gold_pairs, *gold_cols).withColumn("_g", F.lit(1))
    j = pred.join(gold, ["u", "v"], "full_outer")
    agg = j.agg(
        F.count("_p").cast("bigint").alias("n_pred"),
        F.count("_g").cast("bigint").alias("n_gold"),
        F.count(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1))
        .cast("bigint")
        .alias("tp"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")
    ).otherwise(F.lit(0.0))
    with_pr = agg.select(
        "tp",
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_gold") - F.col("tp")).cast("bigint").alias("fn"),
        prec.alias("precision"),
        rec.alias("recall"),
    )
    return with_pr.withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2.0 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def bcubed(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "component",
    gold_col: str = "component",
) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) — the standard
    record-averaged ER clustering metric, complementing ``pairwise_f1``
    (pairwise metrics over-weight large clusters quadratically; B-cubed
    weights every record once). For record r in predicted cluster c and
    gold cluster g: p_r = |c∩g|/|c|, r_r = |c∩g|/|g|; the metric is the
    mean over records, computed in aggregate as sum(n_cg²/n_c)/N and
    sum(n_cg²/n_g)/N over the (c, g) contingency table.

    One row: (b3_precision, b3_recall, b3_f1, n_records). 100 TB shape:
    three map-side-combinable groupBys (contingency cells, cluster
    sizes, gold sizes) + joins keyed on cluster ids — the shuffles carry
    one row per cluster/cell, never per record, and a skewed giant
    cluster still combines map-side to a single cell row per partition.
    """
    joined = pred.select(
        F.col(id_col).alias("_id"), F.col(pred_col).alias("_c")
    ).join(
        gold.select(F.col(id_col).alias("_id"), F.col(gold_col).alias("_g")),
        "_id",
    )
    inter = joined.groupBy("_c", "_g").agg(F.count(F.lit(1)).alias("ncg"))
    nc = joined.groupBy("_c").agg(F.count(F.lit(1)).alias("nc"))
    ng = joined.groupBy("_g").agg(F.count(F.lit(1)).alias("ng"))
    per = inter.join(nc, "_c").join(ng, "_g")
    agg = per.agg(
        F.sum(F.col("ncg") * F.col("ncg") / F.col("nc")).alias("sp"),
        F.sum(F.col("ncg") * F.col("ncg") / F.col("ng")).alias("sr"),
        F.sum("ncg").alias("n"),
    )
    return agg.select(
        (F.col("sp") / F.col("n")).alias("b3_precision"),
        (F.col("sr") / F.col("n")).alias("b3_recall"),
        (
            2.0 * (F.col("sp") / F.col("n")) * (F.col("sr") / F.col("n"))
            / ((F.col("sp") / F.col("n")) + (F.col("sr") / F.col("n")))
        ).alias("b3_f1"),
        F.col("n").cast("bigint").alias("n_records"),
    )


def clusters_to_pairs(assignments: DataFrame, id_col: str = "id",
                      comp_col: str = "component") -> DataFrame:
    """Expand cluster assignments to all within-cluster unordered pairs.

    Self-join on the component id — quadratic per cluster by definition of
    pairwise metrics; gold clusters are small so this stays cheap.
    """
    a = assignments.select(F.col(comp_col).alias("c"), F.col(id_col).alias("u"))
    b = assignments.select(F.col(comp_col).alias("c"), F.col(id_col).alias("v"))
    return (
        a.join(b, "c")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
