"""Structured-Streaming variants of the dedup/text operators.

The reference is batch-only (SURVEY.md §2.5: no streaming anywhere in
kiez), so these are [ext] training-data-pipeline operators: a document
firehose is deduplicated / fingerprinted incrementally instead of by
periodic batch reprocessing.

- ``dedup_stream``:      exact streaming dedup on sha256(text). With an
  event-time column, state is bounded by ``dropDuplicatesWithinWatermark``
  (late duplicates beyond the watermark are the accepted trade-off at
  unbounded scale); without one, global ``dropDuplicates`` (unbounded
  state — only for bounded backfills).
- ``signature_stream``:  stateless — the minhash/simhash column
  expressions from the batch engine run unchanged on a stream, proving
  the operators are engine-agnostic dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kiez_spark.functions import text as T


def dedup_stream(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    out = stream_df.withColumn("sha", F.sha2(F.col(text_col), 256))
    if ts_col:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["sha"]
        )
    return out.dropDuplicates(["sha"])


def signature_stream(
    stream_df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    tok = T.tokens(F.col(text_col))
    sh = F.array_distinct(T.shingles(tok, shingle_n))
    hmod = F.transform(sh, lambda s: T.token_hash(s) % F.lit(T.MINHASH_P))
    params = T.minhash_params(n_hashes, seed)
    sig = F.array(*[T.minhash_from_hashes(hmod, a, b) for a, b in params])
    return stream_df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        sig.alias("sig"),
        T.simhash64(tok).alias("simhash"),
    )
