"""Corpus-curation operators ([ext] training-data set).

Pure column expressions (whole-stage codegen, no shuffle, no Python) with
exact DuckDB twins in the driver oracle gate:

- scrub_text:     URL / e-mail masking with per-doc hit counts — the
                  standard pre-training text-cleaning pass.
- sample_by_hash: deterministic, seedable row sampling on a stable key
                  hash — reproducible corpus subsets regardless of
                  partitioning, executor count, or engine (the md5-based
                  hash is the same cross-engine primitive the minhash
                  ladder uses, functions/text.py token_hash).
- stratified_sample: deterministic per-stratum quotas (rank-by-hash
                  within each stratum) — the per-language / per-source
                  mixture control a pretraining data recipe needs.
- decontaminate:  benchmark-overlap flagging (shared word n-grams vs a
                  broadcast eval-set shingle index) — test-set leakage
                  detection before training.

Everything keeps an exact DuckDB twin in the driver oracle gate. The
sampling/splitting ops are pure column expressions (whole-stage codegen,
no shuffle); stratified_sample adds one strata-keyed exchange with the
rank filter pushed as a group limit, and decontaminate's only join is a
broadcast of the (small) benchmark shingle set — the 100 TB document side
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kiez_spark.functions import text as T

URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# hash-sampling resolution: rate is quantized to 1/2^20 buckets
_SAMPLE_BUCKETS = 1 << 20


def _hash_bucket(key_col: str, seed: int):
    """The shared sampling/splitting bucket: a stable hash of
    (key, seed) reduced to [0, 2^20). sample_by_hash and hash_split MUST
    use this same expression — that identity is what makes the train
    split of hash_split(w) equal the sample_by_hash(rate=w) row set
    (asserted in tests/test_dedup_text.py)."""
    return T.token_hash(
        F.concat_ws("_", F.col(key_col).cast("string"), F.lit(str(seed)))
    ) % F.lit(_SAMPLE_BUCKETS)


def scrub_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_urls, n_emails): URLs -> '<URL>', e-mail
    addresses -> '<EMAIL>' (URLs first, so mailto-ish forms inside URLs
    count once), with per-doc match counts for curation stats."""
    c = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(c, F.lit(URL_RE), 0))
    no_urls = F.regexp_replace(c, URL_RE, "<URL>")
    n_emails = F.size(F.regexp_extract_all(no_urls, F.lit(EMAIL_RE), 0))
    clean = F.regexp_replace(no_urls, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        clean.alias("clean_text"),
        n_urls.cast("int").alias("n_urls"),
        n_emails.cast("int").alias("n_emails"),
    )


def sample_by_hash(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by a stable hash of ``key_col``.

    Unlike ``DataFrame.sample`` the decision is a pure function of
    (key, seed): the same row is kept in every run, on any cluster
    layout, and the complement (same seed, keep = NOT kept) partitions
    the corpus exactly — the reproducible train/holdout split a data
    pipeline needs. The predicate is a plain column expression, so it
    pushes past projections and into scans where possible.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(rate * _SAMPLE_BUCKETS)
    return df.filter(_hash_bucket(key_col, seed) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    quotas: int | dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most N rows per stratum, chosen deterministically: rows
    rank within their stratum by (stable hash, key) and ranks ≤ quota
    survive. ``quotas`` is one int for every stratum or a
    {stratum: n} dict (strata absent from the dict keep 0 rows).

    This is the mixture-control sampler of a data recipe ("200k docs per
    language"): like sample_by_hash the choice is a pure function of
    (key, seed) — stable across runs and cluster layouts — but with an
    exact per-stratum count instead of a rate. One exchange on
    ``strata_col``; the constant rank bound is pushed as a group limit
    (WindowGroupLimit), so no stratum is ever fully sorted at scale.
    """
    from pyspark.sql import Window

    if isinstance(quotas, int):
        if quotas < 0:
            raise ValueError(f"quota must be >= 0, got {quotas}")
        max_n, quota_expr = quotas, F.lit(quotas)
    else:
        if not quotas:
            raise ValueError("quotas dict must be non-empty")
        if any(n < 0 for n in quotas.values()):
            raise ValueError(f"quotas must be >= 0: {quotas}")
        max_n = max(quotas.values())
        quota_expr = F.lit(0)
        for stratum, n in quotas.items():
            quota_expr = F.when(
                F.col(strata_col) == stratum, n
            ).otherwise(quota_expr)
    w = Window.partitionBy(strata_col).orderBy(
        _hash_bucket(key_col, seed), F.col(key_col)
    )
    rank = F.row_number().over(w)
    return (
        df.withColumn("__r", rank)
        .filter(F.col("__r") <= max_n)  # constant bound -> group limit
        .filter(F.col("__r") <= quota_expr)
        .drop("__r")
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    ngram: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_hits): training documents sharing at least one word
    ``ngram``-gram with the benchmark/eval set ``bench`` — the test-set
    decontamination pass (GPT-3 appendix C / PaLM style: 8-13 gram
    overlap; the default is lower because synthetic fixtures are short).

    ``n_hits`` counts the DISTINCT contaminated n-grams per document;
    docs with no overlap are absent (left-anti against this result is the
    clean corpus). The benchmark's distinct shingle hashes are broadcast
    — at 100 TB the corpus side is never shuffled, never collected; per
    doc the shingle set is deduped before the join so the probe stays
    one row per (doc, distinct-gram).
    """
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    bcol = bench_text_col or text_col

    def _sh(frame: DataFrame, col: str, keep_id: bool) -> DataFrame:
        tok = T.tokens(F.col(col))
        hashes = F.array_distinct(
            F.transform(T.shingles(tok, ngram), T.token_hash)
        )
        cols = [F.col(id_col).cast("bigint").alias("doc_id")] if keep_id else []
        return frame.select(*cols, F.explode(hashes).alias("h"))

    bench_sh = _sh(bench, bcol, keep_id=False).distinct()
    return (
        _sh(df, text_col, keep_id=True)
        .join(F.broadcast(bench_sh), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_uniq_frac: float = 0.30,
    max_top2gram_frac: float = 0.20,
    max_adj_repeat_frac: float = 0.10,
) -> DataFrame:
    """(doc_id, keep, reason): the Gopher-style keep/drop curation
    decision over the repetition signals, with the FIRST failing rule
    named — the audit column a production filter pipeline needs (drop
    rates per reason are the monitoring signal). Thresholds compare the
    6-dp-rounded fractions so the decision is engine-exact."""
    from kiez_spark.operators.text_analysis import repetition_features

    rep = repetition_features(df, id_col, text_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(F.col("uniq_token_frac") < min_uniq_frac, "low_uniq")
        .when(F.col("top2gram_frac") > max_top2gram_frac, "rep_2gram")
        .when(F.col("adj_repeat_frac") > max_adj_repeat_frac, "rep_adjacent")
        .otherwise("ok")
    )
    return rep.select(
        "doc_id",
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "ok")


# URL normalization: lowercase scheme+host, strip query/fragment, strip
# trailing slashes — the match key for URL-level dedup of scraped corpora
_URL_HOST_RE = r"^(https?://[^/?#]+)"
_URL_PATH_RE = r"^https?://[^/?#]+([^?#]*)"


def normalize_url(col):
    """Column expr: canonical form of one URL string."""
    host = F.lower(F.regexp_extract(col, _URL_HOST_RE, 1))
    path = F.regexp_replace(
        F.regexp_extract(col, _URL_PATH_RE, 1), r"/+$", ""
    )
    return F.concat(host, path)


def url_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """(norm_url, n_docs, first_id): URL-level duplicate groups — docs
    citing the same canonical URL (case-folded host, query/fragment and
    trailing slashes stripped) are crawl-dup candidates. One explode +
    one map-side-combinable groupBy; first_id = min doc id is the
    canonical representative (the survivor-election convention)."""
    urls = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
            )
        ).alias("url"),
    )
    return (
        urls.select("doc_id", normalize_url(F.col("url")).alias("norm_url"))
        .distinct()
        .groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("first_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Append a deterministic ``split`` label (e.g. train/val/test) from
    a stable hash of ``key_col``: the same row lands in the same split in
    every run, on any cluster layout, and the splits partition the corpus
    exactly (cumulative hash-bucket ranges). Weights are normalized; the
    last split absorbs the rounding remainder. Pure predicate exprs —
    no shuffle, pushes past projections."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative, sum > 0: {weights}")
    total = float(sum(weights.values()))
    bucket = _hash_bucket(key_col, seed)
    names = list(weights)
    cuts, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cuts.append(int(acc * _SAMPLE_BUCKETS))
    expr = F.lit(names[-1])
    for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
        expr = F.when(bucket < cut, name).otherwise(expr)
    return df.withColumn("split", expr)
