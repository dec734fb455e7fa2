"""Text-analysis operators over a documents table ([ext] training-data set).

All pure column expressions (whole-stage codegen; no Python in the hot
path) with exact DuckDB-SQL counterparts for the correctness oracle:

- token_count:        whitespace tokens
- quality features:   char count, token count, avg token length,
                      alnum ratio, stopword ratio, uniqueness ratio
- lang-id heuristic:  argmax over per-language stopword hit counts,
                      'und' (undetermined) when nothing hits
- fingerprint:        order-sensitive polynomial rolling hash
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kiez_spark.functions import text as T


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    tok = T.tokens(F.col(text_col))
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(tok).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, alnum_ratio,
    stop_ratio_en, uniq_ratio, quality) — quality is a simple bounded
    composite: long-enough docs with word-like tokens score high."""
    tok = T.tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("double")
    n_tokens = F.size(tok).cast("double")
    alnum = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    ).cast("double")
    stop_en = T.stopword_hits(tok, "en").cast("double")
    uniq = F.size(F.array_distinct(tok)).cast("double")
    avg_tok = F.when(n_tokens > 0, (alnum / n_tokens)).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_en / n_tokens).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_tokens > 0, uniq / n_tokens).otherwise(F.lit(0.0))
    quality = F.least(
        F.lit(1.0),
        (
            F.least(n_tokens / 20.0, F.lit(1.0)) * 0.4
            + alnum_ratio * 0.3
            + uniq_ratio * 0.3
        ),
    )
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio_en"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) via stopword votes; deterministic
    tie-break = lexicographic language code; 'und' when zero hits."""
    tok = T.tokens(F.col(text_col))
    langs = sorted(T.STOPWORDS)
    hits = {lang: T.stopword_hits(tok, lang) for lang in langs}
    best_hits = F.greatest(*[hits[lang] for lang in langs])
    pred = F.lit("und")
    # build reverse so earlier (lexicographically smaller) langs win ties
    for lang in reversed(langs):
        pred = F.when(
            (hits[lang] == best_hits) & (best_hits > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        pred.alias("lang_pred"),
        best_hits.cast("int").alias("lang_hits"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_m: int = 3,
) -> DataFrame:
    """(doc_id, term, tf, df_t, tfidf, term_rank) — the ``top_m`` highest
    tf-idf terms per document (keyword extraction / topical fingerprint
    for corpus curation). Smoothed idf = ln((N + 1) / (df_t + 1)) + 1,
    score = tf * idf; rank ties break lexicographically on term.

    Scale shape: one explode + two groupBys (term frequency per doc,
    document frequency per term — both map-side-combinable), N via a
    1-row broadcast cross join (no driver collect), per-doc rank window
    with rank<=m pushdown (WindowGroupLimit). No Python anywhere.
    """
    from pyspark.sql import Window

    tok = T.tokens(F.col(text_col))
    terms = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(tok).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_t, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("_n") + 1) / (F.col("df_t") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_m)
        .select("doc_id", "term", "tf", "df_t", "tfidf", "term_rank")
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, bm25, rank) — the ``k`` highest-scoring documents for a
    literal query under BM25 (Robertson et al.; the Lucene-style
    +1-inside-the-log smoothed idf, never negative):

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d)    = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with dl = |tokens(d)| and avgdl the corpus mean. The
    training-data-side retrieval primitive (eval-set mining, targeted
    corpus slicing) the tf-idf keyword extractor doesn't cover.

    Scale shape: the query terms are a driver-side literal list, so the
    term filter sits directly on the exploded token stream (only
    query-term postings survive the first shuffle); tf and df_t are
    map-side-combinable groupBys; N/avgdl ride one 1-row broadcast
    cross join (no driver collect); the global top-k is orderBy+limit —
    TakeOrderedAndProject, never a single-partition sort. Ties break on
    doc_id. Returns at most k rows; rank is dense 1..k over
    (score desc, doc_id)."""
    q_terms = sorted(
        {t for t in re.split(r"\s+", query.strip().lower()) if t}
    )
    if not q_terms:
        raise ValueError("bm25_topk: empty query")
    tok = T.tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"), tok.alias("_tok")
    )
    dl = base.select("doc_id", F.size("_tok").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    terms = base.select("doc_id", F.explode("_tok").alias("term")).filter(
        F.col("term").isin(q_terms)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    norm = F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * norm).alias("_s"))
    )
    top = scored.orderBy(F.col("_s").desc(), "doc_id").limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_s").desc(), "doc_id")
    return top.select(
        "doc_id",
        F.round("_s", 6).alias("bm25"),
        # the window runs over at most k already-reduced rows — not a
        # full-corpus single-partition sort
        F.row_number().over(w).cast("int").alias("rank"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) rolling-hash document fingerprint —
    order-sensitive (unlike sha), so permuted token streams differ."""
    tok = T.tokens(F.col(text_col))
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        T.rolling_fingerprint(tok).alias("fingerprint"),
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, uniq_token_frac, adj_repeat_frac,
    top2gram_frac, top3gram_frac) — Gopher-style repetition signals
    (Rae et al. 2021 quality rules): heavily repeated n-grams mark
    boilerplate/spam that poisons training data. Pure column exprs; the
    per-doc most-frequent-n-gram count is a bounded HOF over the doc's
    own distinct n-grams (docs are short; no shuffle, no Python)."""
    tok = T.tokens(F.col(text_col))
    n = F.size(tok)
    nd = F.size(F.array_distinct(tok))

    def top_frac(ng: int):
        sh = T.shingles(tok, ng)
        m = F.size(sh)
        top = F.array_max(
            F.transform(
                F.array_distinct(sh),
                lambda x: F.size(F.filter(sh, lambda y: y == x)),
            )
        )
        return F.when(m > 0, top.cast("double") / m).otherwise(F.lit(0.0))

    adj = F.size(
        F.filter(
            F.zip_with(
                F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    )
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        n.alias("n_tokens"),
        F.round(
            F.when(n > 0, nd.cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("uniq_token_frac"),
        F.round(
            F.when(n > 1, adj.cast("double") / (n - 1)).otherwise(F.lit(0.0)),
            6,
        ).alias("adj_repeat_frac"),
        F.round(top_frac(2), 6).alias("top2gram_frac"),
        F.round(top_frac(3), 6).alias("top3gram_frac"),
    )


def corpus_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """ONE summary row for corpus monitoring dashboards: doc count,
    token totals, exact-duplicate rate (distinct sha256), and mean doc
    length. All map-side-combinable scalar aggregates — one job, no
    wide shuffle of document rows.

    The mean is emitted as ``avg_tokens_micro`` — the floor of
    1e6 * total_tokens / n_docs as an exact BIGINT, computed with pure
    integer division so any engine produces the identical value (a
    rounded DOUBLE ratio can differ by 1 ulp across engines when its
    6-dp image lands on a rounding boundary — observed cross-engine).
    Split as (L div n)*1e6 + ((L mod n)*1e6) div n so the intermediate
    never exceeds ~n*1e6, overflow-safe even at 100 TB token counts
    where a naive 1e6*L would blow past int64."""
    tok = T.tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(tok).cast("bigint").alias("n_tok"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.sha2(F.col(text_col), 256).alias("sha"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("sha").alias("distinct_docs"),
        (F.count(F.lit(1)) - F.countDistinct("sha")).alias("exact_dup_docs"),
    )
    micro = (
        "(total_tokens div n_docs) * 1000000"
        " + ((total_tokens % n_docs) * 1000000) div n_docs"
    )
    return agg.withColumn("avg_tokens_micro", F.expr(micro).cast("bigint"))


def vocab_topk(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """(token, df_docs, rank): the corpus's top-k vocabulary by DOCUMENT
    frequency with a (df desc, token asc) deterministic tie-break.
    explode + distinct + one combinable groupBy; the global top-k runs
    as orderBy().limit() — Catalyst plans TakeOrderedAndProject, a
    distributed per-partition top-k merge, NOT a single-partition sort
    of the whole vocabulary (which is web-corpus-sized at scale). The
    rank window then runs over only the k surviving rows."""
    from pyspark.sql import Window

    tok = T.tokens(F.col(text_col))
    terms = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(F.array_distinct(tok)).alias("token"),
    )
    dfreq = terms.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs")
    )
    order = [F.col("df_docs").desc(), F.col("token").asc()]
    top = dfreq.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "df_docs", "rank"
    )
