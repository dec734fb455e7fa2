"""OpenEA-style dataset loaders (S1-S3 in SURVEY.md §2.1).

Reference: /root/reference/kiez/io/data_loading.py — reads .npy embedding
matrices + TSV id-maps + TSV entity links, filters the common embedding
matrix by KG membership, densely re-numbers each side 0..n-1 and remaps
the gold links. Here every artifact is a DataFrame:

- ``load_embeddings_npy``: .npy -> (row_idx, vec)  (driver-side numpy read,
  distributed createDataFrame — embedding files are dense artifacts, not
  big data; at real scale embeddings live in parquet already)
- ``load_id_map`` / ``load_links``: TSV via spark.read.csv(sep='\\t')
- ``split_embeddings``: membership semi-join + row_number dense re-id
- ``remap_links``: join-based uri->new-id remap of gold pairs
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kiez_spark.functions.ranking import dense_row_number


def load_embeddings_npy(spark: SparkSession, path: str) -> DataFrame:
    import numpy as np

    mat = np.load(path)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "row_idx bigint, vec array<double>")


def load_id_map(spark: SparkSession, path: str) -> DataFrame:
    """TSV of (index, uri) -> (row_idx, uri). Mirrors read_kg_ids
    (data_loading.py:8-21)."""
    return spark.read.csv(path, sep="\t").select(
        F.col("_c0").cast("bigint").alias("row_idx"), F.col("_c1").alias("uri")
    )


def load_links(spark: SparkSession, path: str) -> DataFrame:
    """TSV of (uri1, uri2) gold entity links."""
    return spark.read.csv(path, sep="\t").select(
        F.col("_c0").alias("uri1"), F.col("_c1").alias("uri2")
    )


def split_embeddings(emb: DataFrame, ids: DataFrame) -> DataFrame:
    """Membership filter + dense re-numbering (the _split_emb /
    _seperate_common_embedding semantics, data_loading.py:23-72):
    rows of ``emb`` whose row_idx appears in ``ids`` get new ids
    0..n-1 in row_idx order. Returns (new_id, row_idx, uri, vec).

    The renumber is the scalable bucket-offset scheme
    (functions/ranking.dense_row_number), NOT a global
    ``Window.orderBy`` — which would shuffle the entire membership
    table into one task."""
    member = emb.join(ids, "row_idx")
    return dense_row_number(member, "row_idx", out_col="new_id").select(
        "new_id", "row_idx", "uri", "vec"
    )


def remap_links(
    links: DataFrame, kg1: DataFrame, kg2: DataFrame
) -> DataFrame:
    """Gold links (uri1, uri2) -> (src_id, tgt_id) in the re-numbered id
    spaces of the two splits."""
    a = kg1.select(F.col("uri").alias("uri1"), F.col("new_id").alias("src_id"))
    b = kg2.select(F.col("uri").alias("uri2"), F.col("new_id").alias("tgt_id"))
    return links.join(a, "uri1").join(b, "uri2").select("src_id", "tgt_id")
