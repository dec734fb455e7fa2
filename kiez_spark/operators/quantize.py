"""Scalar int8 embedding quantization ([ext] training-data set).

The 100 TB lever: an `array<double>` embedding column is 8 bytes/dim on
the wire; per-dim min/max scalar quantization stores 1 byte/dim (8x less
shuffle/storage for every ANN banding, candidate join, or index export)
at a bounded reconstruction error of (range/256)/2 per dim. Codes are
engine-exact integers: code = min(255, floor((x - mn) / (mx - mn) * 256))
with one global (pos, mn, mx) table — a single explode + groupBy agg,
broadcast back as two array literals in a 1-row cross join (no driver
collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_min_max(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row: (mn array<double>, mx array<double>) per-dimension
    bounds, position-ordered."""
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
    mm = ex.groupBy("pos").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    return mm.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))),
            lambda s: s["mn"],
        ).alias("mn"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))),
            lambda s: s["mx"],
        ).alias("mx"),
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<int>): int8-range codes per dimension. A constant
    dimension (mx == mn) codes to 0. x == mx codes to 255 (the 256 bucket
    is clamped)."""
    bounds = dim_min_max(emb, vec_col)
    src = emb.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    zipped = F.arrays_zip(
        F.col("vec").alias("v"), F.col("mn").alias("lo"), F.col("mx").alias("hi")
    )
    code = F.transform(
        zipped,
        lambda s: F.when(
            s["hi"] > s["lo"],
            F.least(
                F.lit(255),
                F.floor((s["v"] - s["lo"]) / (s["hi"] - s["lo"]) * 256),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return src.join(F.broadcast(bounds)).select("id", code.alias("qvec"))


def dequantize(
    q: DataFrame, bounds: DataFrame, qvec_col: str = "qvec"
) -> DataFrame:
    """Reconstruct approximate vectors at bucket centers:
    x' = mn + (code + 0.5) * (mx - mn) / 256."""
    zipped = F.arrays_zip(
        F.col(qvec_col).alias("c"), F.col("mn").alias("lo"), F.col("mx").alias("hi")
    )
    dq = F.transform(
        zipped,
        lambda s: s["lo"]
        + (s["c"].cast("double") + 0.5) * (s["hi"] - s["lo"]) / 256.0,
    )
    return q.join(F.broadcast(bounds)).select("id", dq.alias("vec"))
