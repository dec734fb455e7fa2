"""Deterministic, fully-distributed synthetic `repos_files` generator.

Produces the input_hint table (repo, path, commit, lang, content) with
planted near-duplicate clusters so gold entity clusters are known by
construction (FIXTURES.md F1). Everything is derived from the row id with
seeded xxhash64 column expressions — no driver-side data, no RNG state —
so the generator scales to any row count on any cluster and is
reproducible bit-for-bit at any parallelism.

Layout: ids [0, n_dup) form clusters of ``cluster_size`` near-duplicates
(each non-primary member differs from its cluster's base content by one
token edit); ids [n_dup, n) are singletons with unique content. The
``lang`` column is deliberately skewed (~50% one language) to exercise
salted-repartition / AQE-skew paths (FIXTURES.md skew requirement).

Embeddings are hash-feature vectors of the token stream: dim j of the
vector is the sum over tokens of a token-and-j-seeded value in [-1, 1] —
a one-token edit moves the vector by O(1/sqrt(L)), so near-duplicates are
also nearest neighbors in embedding space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "c", "go", "rs"]
# ~50% of rows land on 'py' (indices 0-4 of the 10-slot wheel)
_LANG_WHEEL = ["py", "py", "py", "py", "py", "java", "java", "c", "go", "rs"]


def repos_files(
    spark: SparkSession,
    n: int = 1000,
    cluster_size: int = 4,
    dup_fraction: float = 0.6,
    tokens_per_file: int = 40,
    vocab: int = 500,
    seed: int = 42,
) -> DataFrame:
    """The input table + gen columns (row_id, cluster_id, is_clustered)."""
    n_dup = int(n * dup_fraction) // cluster_size * cluster_size
    L = tokens_per_file

    df = spark.range(n).select(F.col("id").alias("row_id"))
    is_clustered = F.col("row_id") < n_dup
    cluster_id = F.when(
        is_clustered, (F.col("row_id") / cluster_size).cast("bigint")
    ).otherwise(F.col("row_id") + 10_000_000)
    member_idx = F.col("row_id") % cluster_size

    df = df.withColumn("cluster_id", cluster_id).withColumn(
        "is_clustered", is_clustered
    )

    # base token t of a cluster: hash(cluster_id, t, seed) into the vocab
    tokens = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda t: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("cluster_id") * 1315423911 + t, F.lit(seed)),
                F.lit(vocab),
            ).cast("string"),
        ),
    )
    # non-primary cluster members: replace ONE token (id-chosen position)
    edit_pos = F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed + 1)), F.lit(L))
    edit_tok = F.concat(
        F.lit("m"),
        F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed + 2)), F.lit(vocab)).cast(
            "string"
        ),
    )
    # singletons: every token position re-seeded by row_id (unique content)
    uniq_tokens = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda t: F.concat(
            F.lit("u"),
            F.pmod(
                F.xxhash64(F.col("row_id") * 2654435761 + t, F.lit(seed + 3)),
                F.lit(vocab * 50),
            ).cast("string"),
        ),
    )
    mutated = F.transform(
        tokens,
        lambda tok, i: F.when(
            is_clustered & (member_idx > 0) & (i == edit_pos), edit_tok
        ).otherwise(tok),
    )
    content = F.when(is_clustered, F.concat_ws(" ", mutated)).otherwise(
        F.concat_ws(" ", uniq_tokens)
    )

    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANG_WHEEL]),
        (F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed + 4)), F.lit(10)) + 1).cast(
            "int"
        ),
    )
    repo = F.concat(
        F.lit("org"),
        F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed + 5)), F.lit(50)).cast("string"),
        F.lit("/proj"),
        F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed + 6)), F.lit(10)).cast("string"),
    )
    path = F.concat(F.lit("src/f"), F.col("row_id").cast("string"), F.lit(".txt"))
    commit = F.substring(F.sha2(F.col("row_id").cast("string"), 256), 1, 40)

    return df.select(
        "row_id",
        "cluster_id",
        "is_clustered",
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def with_sha(files: DataFrame) -> DataFrame:
    """The per-row invariant column (BASELINE.json input_hint):
    sha256(content), carried through every stage."""
    return files.withColumn("content_sha", F.sha2(F.col("content"), 256))


def derive_embeddings(
    files: DataFrame, dim: int = 32, seed: int = 42
) -> DataFrame:
    """(id, vec, content_sha) hash-feature embeddings of the token stream.

    dim j of a document = sum over its tokens of a token-and-j-seeded
    value in [-1, 1]: with h = md5-60bit(token), h1 = h mod 2003,
    h2 = h mod 1999, the per-(token, j) value is
    ((a_j*h1 + b_j*h2 + c_j) mod 2001 - 1000) / 1000, a/b/c drawn once
    from RandomState(seed). Two distinct tokens share a whole VECTOR
    only when h1 AND h2 collide (~2.5e-7 per pair), so the structure
    matches the previous per-dim-independent-hash formula: a one-token
    edit moves the vector by O(1/sqrt(L)).

    EXACTNESS: the per-token numerators are summed as INT64 and divided
    by 1000 once at the end, so every vector component is a correctly
    rounded f64 of an exact integer ratio — bit-identical regardless of
    token order, partitioning, batch boundaries, or engine. This is
    what lets the linkage/alignment DuckDB oracles rebuild the very
    same embeddings in SQL (driver_queries._derived_emb_sql).

    Implementation is an Arrow-vectorized kernel (mapInPandas): each
    distinct token in a batch is hashed once, then all (token, dim)
    values come from one numpy broadcast and per-row sums from one
    reduceat — deterministic from content alone, any partitioning. The
    previous nested transform/aggregate column-expression form computed
    the same SHAPE of formula JVM-side, but Catalyst evaluates
    higher-order-function lambdas interpreted (outside whole-stage
    codegen): 32 dims x ~50 tokens x N rows of interpreted xxhash64
    calls made embedding derivation dominate the linkage pipeline
    (45s of a 50s n=20000 run — ~20x slower than this kernel).
    """
    import hashlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    rs = np.random.RandomState(seed)
    a = rs.randint(1, 2001, size=dim).astype(np.int64)
    b = rs.randint(1, 1999, size=dim).astype(np.int64)
    c = rs.randint(0, 2001, size=dim).astype(np.int64)

    def kernel(batches):
        cache: dict[str, int] = {}

        def tok_h(t: str) -> int:
            h = cache.get(t)
            if h is None:
                h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                cache[t] = h
            return h

        for pdf in batches:
            if pdf.empty:
                continue
            # (s or "") keeps the kernel total over null content — a null
            # row yields the zero vector instead of crashing the worker
            tok_lists = [(s or "").split(" ") for s in pdf["content"]]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = np.fromiter(
                (tok_h(t) for toks in tok_lists for t in toks),
                dtype=np.int64,
                count=int(lens.sum()),
            )
            h1 = (flat % 2003)[:, None]
            h2 = (flat % 1999)[:, None]
            # INT64 numerators, one divide at the end (see docstring:
            # exact integer sums make the vector order/engine-invariant)
            vals = ((h1 * a[None, :] + h2 * b[None, :] + c[None, :]) % 2001) - 1000
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(vals, starts, axis=0) / 1000.0
            sums[lens == 0] = 0.0  # reduceat on an empty slice is bogus
            yield pd.DataFrame(
                {
                    "id": pdf["row_id"].astype("int64"),
                    "vec": list(sums),
                    "content_sha": [
                        hashlib.sha256(s.encode()).hexdigest()
                        for s in pdf["content"]
                    ],
                }
            )

    return files.select("row_id", "content").mapInPandas(
        kernel, "id bigint, vec array<double>, content_sha string"
    )


def fast_embeddings(spark: SparkSession, n: int, dim: int = 32, seed: int = 42) -> DataFrame:
    """Throughput-bench embedding generator: (id, vec) with
    v[id, j] = 2*frac(sin(id*12.9898 + j*78.233 + seed)*43758.5453) - 1 —
    fully vectorized numpy in mapInPandas, deterministic per (id, j)
    regardless of partitioning. For BENCHMARK datasets only (the
    correctness path derives embeddings from content, derive_embeddings)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def gen(batches):
        j = np.arange(dim, dtype=np.float64)
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.float64)
            phase = ids[:, None] * 12.9898 + j[None, :] * 78.233 + seed
            v = np.sin(phase) * 43758.5453
            v = 2.0 * (v - np.floor(v)) - 1.0
            yield pd.DataFrame(
                {"id": pdf["id"].astype("int64"), "vec": list(v)}
            )

    parts = spark.sparkContext.defaultParallelism * 2
    return spark.range(n, numPartitions=parts).mapInPandas(
        gen, "id bigint, vec array<double>"
    )


def gold_clusters(files: DataFrame) -> DataFrame:
    """(id, component) gold assignment from generator metadata."""
    return files.select(
        F.col("row_id").alias("id"),
        F.when(F.col("is_clustered"), F.col("cluster_id"))
        .otherwise(F.col("row_id") + 10_000_000)
        .alias("component"),
    )


def gold_pairs(files: DataFrame) -> DataFrame:
    """All within-cluster unordered pairs (src_id, tgt_id), u < v."""
    members = files.filter(F.col("is_clustered")).select("row_id", "cluster_id")
    a = members.select(F.col("cluster_id").alias("c"), F.col("row_id").alias("src_id"))
    b = members.select(F.col("cluster_id").alias("c"), F.col("row_id").alias("tgt_id"))
    return (
        a.join(b, "c")
        .filter(F.col("src_id") < F.col("tgt_id"))
        .select("src_id", "tgt_id")
    )


def mutated_copy(
    files: DataFrame, id_offset: int = 1_000_000, edit_token: str = "zz9"
) -> DataFrame:
    """A second 'knowledge graph' for alignment tests: every file copied
    with one token edit (first token replaced) and row_id shifted by
    ``id_offset``. Gold alignment = (row_id, row_id + id_offset)."""
    out = files.withColumn("row_id", F.col("row_id") + id_offset).withColumn(
        "content", F.regexp_replace(F.col("content"), r"^\S+", edit_token)
    )
    if "path" in out.columns:
        out = out.withColumn("path", F.concat(F.col("path"), F.lit(".b")))
    return out


def gold_alignment(files: DataFrame, id_offset: int = 1_000_000) -> DataFrame:
    """(src_id, tgt_id) gold links for files vs mutated_copy(files)."""
    return files.select(
        F.col("row_id").alias("src_id"),
        (F.col("row_id") + id_offset).alias("tgt_id"),
    )
