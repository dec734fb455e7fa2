"""Hubness analysis measures as Spark aggregations.

Re-expresses /root/reference/kiez/analysis/estimation.py over a long-format
neighbor table (query_id, rank, cand_id). The k-occurrence histogram
(numpy bincount, estimation.py:292) is a group-count right-joined onto the
full entity range (zero-fill); every scalar measure is then an aggregation
over that histogram:

- k_skewness:           population skewness m3/m2^1.5 (scipy.stats.skew
                        default == Spark's skewness() formula)
- k_skewness_truncnorm: scipy truncnorm(a,b).moment(3) closed form
                        (raw 3rd moment of the lower-truncated std normal)
- gini:                 sort-based O(n log n) equivalent of the pairwise
                        |xi-xj| formula (equivalence is tested in the
                        reference, tests/analysis/test_estimation.py:46-52)
- robinhood, atkinson, antihub/hub occurrence, groupie ratio: direct aggs

All measures return in ONE job over the histogram — cheap at any scale
(the histogram has one row per entity, not per pair).
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kiez_spark.functions.vectors import erfc_expr

_SQRT2PI = math.sqrt(2.0 * math.pi)
_SQRT2 = math.sqrt(2.0)


def k_occurrence(
    nn_df: DataFrame,
    n_entities: int,
    k: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Reverse-neighbor counts, zero-filled over entity ids 0..n_entities-1.

    nn_df: (query_id, cand_id[, rank]); ranks are 1-based. Negative cand_id
    (the reference's missing-neighbor sentinel) is mask-filtered
    (estimation.py:285-289).
    """
    spark = nn_df.sparkSession
    filtered = nn_df.filter(F.col("cand_id") >= 0)
    if k is not None and rank_col in nn_df.columns:
        filtered = filtered.filter(F.col(rank_col) <= k)
    counts = filtered.groupBy("cand_id").count()
    # the reference's bincount uses minlength=n, growing for larger ids
    ids = spark.range(n_entities).select(F.col("id").alias("entity_id"))
    extra = counts.select(F.col("cand_id").alias("entity_id")).filter(
        F.col("entity_id") >= n_entities
    )
    universe = ids.unionByName(extra).distinct()
    return (
        universe.join(counts, universe["entity_id"] == counts["cand_id"], "left")
        .select(
            "entity_id",
            F.coalesce(F.col("count"), F.lit(0)).cast("bigint").alias("k_occ"),
        )
    )


def hubness_measures(
    k_occ: DataFrame,
    k: int,
    target_samples: int,
    hub_size: float = 2.0,
    include_gini: bool = True,
    atkinson_eps: float = 0.5,
) -> DataFrame:
    """One-row DataFrame of all scalar hubness measures over a k-occurrence
    table (entity_id, k_occ). Mirrors estimation.py:197-351.

    ``atkinson_eps`` follows estimation.py:131-149 including the eps=1
    geometric-mean branch (log(0) -> -inf -> geometric mean 0 -> index 1,
    matching numpy).
    """
    x = F.col("k_occ").cast("double")
    base = k_occ.select(x.alias("x"))

    if atkinson_eps == 1.0:
        atk_agg = F.avg(
            F.when(F.col("x") <= 0.0, F.lit(float("-inf"))).otherwise(
                F.log(F.col("x"))
            )
        ).alias("m_atk")
        atk_expr = 1.0 - F.exp(F.col("m_atk")) / F.col("mu")
    else:
        e1 = 1.0 - atkinson_eps
        atk_agg = F.avg(F.pow("x", F.lit(e1))).alias("m_atk")
        atk_expr = 1.0 - F.pow(F.col("m_atk"), F.lit(1.0 / e1)) / F.col("mu")

    aggs = base.agg(
        F.count("x").alias("n"),
        F.sum("x").alias("sx"),
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sd1"),
        F.max("x").alias("mx"),
        atk_agg,
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0)).alias("n_anti"),
        F.sum(F.when(F.col("x") >= hub_size * k, F.col("x")).otherwise(0.0)).alias(
            "hub_sum"
        ),
        F.skewness("x").alias("k_skewness"),
    )

    # second pass for |x - mu| (needs the global mean) — tiny broadcast join
    mu_row = F.broadcast(aggs.select("mu"))
    abs_dev = (
        base.crossJoin(mu_row)
        .agg(F.sum(F.abs(F.col("x") - F.col("mu"))).alias("sad"))
    )

    joined = aggs.crossJoin(F.broadcast(abs_dev))

    if include_gini:
        # gini's sorted-rank sum Σ(2i-1)·x_i via the VALUE histogram, not a
        # global row_number window (which would shuffle every entity row to
        # one task). Cardinality = #distinct k-occurrence values (≈ max
        # k-occ, tiny at any scale), so the cumulative window over the
        # histogram is a trivially small single-partition sort. For a value
        # v with count c after s smaller rows, Σ_{i=s+1..s+c}(2i-1) =
        # 2sc + c², all integer-exact in f64 → bit-identical to the old
        # per-row formula.
        hist = base.groupBy("x").agg(F.count("*").alias("c"))
        hw = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
        ghist = hist.withColumn("s", F.coalesce(F.sum("c").over(hw), F.lit(0)))
        gini_part = ghist.agg(
            F.sum(
                F.col("x")
                * (2.0 * F.col("s") * F.col("c") + F.col("c") * F.col("c"))
            ).alias("gini_num_part")
        )
        joined = joined.crossJoin(F.broadcast(gini_part))

    n = F.col("n").cast("double")
    a = (F.lit(0.0) - F.col("mu")) / F.col("sd1")
    phi_a = F.exp(-0.5 * a * a) / F.lit(_SQRT2PI)
    sf_a = F.lit(0.5) * erfc_expr(a / F.lit(_SQRT2))
    lam = phi_a / sf_a

    cols = [
        F.col("k_skewness"),
        (2.0 * lam + a * a * lam).alias("k_skewness_truncnorm"),
        atk_expr.alias("atkinson"),
    ]
    if include_gini:
        cols.append(
            ((F.col("gini_num_part") - n * F.col("sx")) / (n * F.col("sx"))).alias(
                "gini"
            )
        )
    cols += [
        (0.5 * F.col("sad") / F.col("sx")).alias("robinhood"),
        (F.col("n_anti") / n).alias("antihub_occurrence"),
        (F.col("hub_sum") / F.lit(float(k)) / F.lit(float(target_samples))).alias(
            "hub_occurrence"
        ),
        (F.col("mx") / F.lit(float(target_samples)) / F.lit(float(k))).alias(
            "groupie_ratio"
        ),
    ]
    out = joined.select(*cols)
    if include_gini:
        # keep the reference's column order (gini after atkinson)
        out = out.select(
            "k_skewness", "k_skewness_truncnorm", "atkinson", "gini",
            "robinhood", "antihub_occurrence", "hub_occurrence", "groupie_ratio",
        )
    return out


VALID_HUBNESS_MEASURES = [
    "all",
    "all_but_gini",
    "k_skewness",
    "k_skewness_truncnorm",
    "atkinson",
    "gini",
    "robinhood",
    "antihub_occurrence",
    "hub_occurrence",
    "groupie_ratio",
    # array-valued dispatch targets (estimation.py:18-32)
    "k_occurrence",
    "antihubs",
    "hubs",
]


def hubness_score(
    nn_df: DataFrame,
    n_queries: int,
    target_samples: int,
    k: int | None = None,
    hub_size: float = 2.0,
    return_value: str = "all_but_gini",
    atkinson_eps: float = 0.5,
    n_cols: int | None = None,
) -> DataFrame:
    """Driver mirroring estimation.py:197-351: k-truncate, mask negatives,
    histogram, measures; ``return_value`` selects one measure or
    'all'/'all_but_gini' (the reference's full dispatch incl. the
    array-valued 'k_occurrence'/'antihubs'/'hubs', VALID_HUBNESS_MEASURES
    estimation.py:18-32 — returned here as DataFrames). nn_df needs
    (query_id, cand_id, rank).

    ``n_cols``: the neighbor-table width (max rank), when the caller
    knows it. A requested k beyond the available neighbors is clamped
    with a warning (estimation.py:277-281); with ``n_cols=None`` the
    width is measured with one tiny scalar agg over nn_df (pass the hint
    to skip that job on an unpersisted candidate table)."""
    if return_value not in VALID_HUBNESS_MEASURES:
        raise ValueError(f"unknown hubness measure: {return_value!r}")
    if k is not None:
        width = n_cols
        if width is None:
            width = (
                nn_df.agg(F.max("rank")).first()[0]
                if "rank" in nn_df.columns
                else nn_df.groupBy("query_id").count().agg(F.max("count")).first()[0]
            )
        if width is not None and k > width:
            warnings.warn(
                f"k={k} > the {width} neighbors available per query;"
                f" clamping k to {width} (reference estimation.py:277-281)",
                stacklevel=2,
            )
            k = int(width)
    occ = k_occurrence(nn_df, n_queries, k)
    if return_value == "k_occurrence":
        return occ
    if return_value == "antihubs":
        return antihubs(occ)
    if k is None:
        k = (
            nn_df.agg(F.max("rank")).first()[0]
            if "rank" in nn_df.columns
            else nn_df.groupBy("query_id").count().agg(F.max("count")).first()[0]
        )
    if return_value == "hubs":
        return hubs(occ, k, hub_size)
    out = hubness_measures(
        occ, k, target_samples, hub_size,
        include_gini=return_value in ("all", "gini"),
        atkinson_eps=atkinson_eps,
    )
    if return_value in ("all", "all_but_gini"):
        return out
    return out.select(return_value)


def antihubs(k_occ: DataFrame) -> DataFrame:
    """Entity ids never among anyone's neighbors (estimation.py:152-169)."""
    return k_occ.filter(F.col("k_occ") == 0).select("entity_id")


def hubs(k_occ: DataFrame, k: int, hub_size: float = 2.0) -> DataFrame:
    """Entity ids with k-occurrence >= hub_size * k (estimation.py:172-194)."""
    return k_occ.filter(F.col("k_occ") >= hub_size * k).select("entity_id")
