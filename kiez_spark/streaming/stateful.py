"""Custom stateful streaming operator: ONLINE near-duplicate flagging.

A document stream is MinHash-banded (same family as operators/dedup.py);
per band key, ``applyInPandasWithState`` keeps the first document id ever
seen as state, and every later document colliding on that band key is
emitted as a near-duplicate candidate (doc_id, first_id). This is the
streaming analogue of the batch banded join — instead of joining a static
corpus against itself, state IS the corpus seen so far, bounded by the
number of distinct band keys.

Scale notes: state is partitioned by band key (a plain stream shuffle);
at 10^12-file scale you bound state with a TTL timeout (state expiry =
"dedup window") — wired here via ``GroupStateTimeout`` but defaulted to
NoTimeout for deterministic tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kiez_spark.functions import text as T

_OUT_SCHEMA = "band_key bigint, doc_id bigint, first_id bigint"
_STATE_SCHEMA = "first_id bigint"


def banded_keys(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(doc_id, band_key) — one row per (doc, band), keys hashed from the
    band's minhash-value tuple (identical construction to the batch
    minhash_lsh_pairs banding)."""
    rows_per_band = n_hashes // bands
    tok = T.tokens(F.col(text_col))
    sh = F.array_distinct(T.shingles(tok, shingle_n))
    hmod = F.transform(sh, lambda s: T.token_hash(s) % F.lit(T.MINHASH_P))
    params = T.minhash_params(n_hashes, seed)
    sig = [T.minhash_from_hashes(hmod, a, b) for a, b in params]
    band_keys = [
        F.xxhash64(
            F.concat_ws(
                "_",
                *[sig[b * rows_per_band + r].cast("string")
                  for r in range(rows_per_band)],
            ),
            F.lit(b),  # band index in the key: bands never cross-match
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(F.array(*band_keys)).alias("band_key"),
    )


def online_neardup_flags(
    stream_df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """Streaming (doc_id, first_id) collision flags, deduplicated across
    bands downstream by the caller if desired."""
    banded = banded_keys(
        stream_df, id_col, text_col, n_hashes, bands, shingle_n, seed
    )

    def flag(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415

        first = state.get[0] if state.exists else None
        out_docs, out_first = [], []
        for pdf in pdfs:
            for did in sorted(int(x) for x in pdf["doc_id"]):
                if first is None:
                    first = did
                elif did != first:
                    out_docs.append(did)
                    out_first.append(first)
        state.update((first,))
        if out_docs:
            yield pd.DataFrame(
                {
                    "band_key": key[0],
                    "doc_id": out_docs,
                    "first_id": out_first,
                }
            )

    return banded.groupBy("band_key").applyInPandasWithState(
        flag, _OUT_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
