"""Classic record-linkage string matching: blocking, edit-distance and
Jaro-Winkler comparison, sorted-neighborhood candidate generation, and
TF-IDF cosine pair scoring.

The reference (dobraczka/kiez) resolves entities purely in embedding
space (kiez/neighbors/*.py retrieves vector neighbors); the string-side
comparators here are the [ext] record-linkage tier the entity-resolution
brief demands on raw text columns. Every operator keeps the canonical
scale shape: candidate pairs come from a bounded generator (equi-join on
a blocking key with a block-size cap, a rank-window sorted neighborhood,
or a df-capped inverted index) — never an all-pairs product — and the
pairwise comparator runs only on those candidates.

Cross-engine determinism (DuckDB oracles):
- ``levenshtein`` / edit distance: integer, identical on both engines.
- Jaro-Winkler: the kernel below matches DuckDB's
  ``jaro_winkler_similarity`` bit-for-bit (validated on 30k fuzz pairs:
  textbook Jaro with floor(max/2)-1 window, t = transposed/2, Winkler
  boost p=0.1 over prefix<=4 only when jaro > 0.7, empty string -> 0.0).
  The emitted column is ``floor(jw * 1e6)`` as BIGINT — floor of a
  bit-identical double is exact on both engines, immune to the
  decimal-rounding boundary that bit corpus_stats' rounded ratio.
- sorted-neighborhood rank: both sides order by the same 7-char packed
  ASCII key (fits 2^53, so the bucketing double cast in
  functions/ranking.dense_row_number stays exact) with id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kiez_spark.functions.ranking import dense_row_number

__all__ = [
    "blocked_pairs",
    "levenshtein_pairs",
    "jaro_winkler_pairs",
    "snm_pairs",
    "tfidf_cosine_pairs",
    "phonetic_key",
    "fs_scores",
    "fs_em",
    "fs_em_posteriors",
    "random_pairs",
    "fs_u_probabilities",
    "build_blocking_index",
    "incremental_blocking_pairs",
    "update_blocking_index",
    "crossed_cap_retractions",
    "blocking_quality",
    "metablocking_pairs",
]


def blocked_pairs(
    df: DataFrame,
    block: str,
    key: str,
    id_col: str = "doc_id",
    max_block: int = 256,
    carry: dict[str, F.Column] | None = None,
) -> DataFrame:
    """(a_id, b_id, a_key, b_key) for every unordered id<id pair sharing
    a blocking key, skipping blocks larger than ``max_block`` rows.

    ``block`` / ``key`` are SQL expression strings. The cap is the
    standard blocking guard: a degenerate key (empty string, boilerplate
    header) would otherwise turn one block into an O(n^2) hotspot; the
    per-block pair cost is bounded at max_block^2/2. Skipped blocks are
    a deterministic function of the data, so the DuckDB oracle applies
    the same HAVING filter. The sizes join is a plain equi-join (the
    block-count table scales with distinct keys — never broadcast by
    hand; AQE may still decide to).

    ``carry``: optional {name: Column} of extra per-record expressions
    computed ONCE per record (before the pair join) and carried to both
    sides as ``a_<name>`` / ``b_<name>`` — the way per-key filter
    signatures (e.g. character-count vectors) ride along at O(records)
    instead of being recomputed O(pairs) times.
    """
    carry = carry or {}
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.expr(block).alias("_blk"),
        F.expr(key).alias("_key"),
        *[c.alias(f"_c_{n}") for n, c in carry.items()],
    )
    ok = (
        keyed.groupBy("_blk")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_block)
        .select("_blk")
    )
    keyed = keyed.join(ok, "_blk")
    a = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("a_id"),
        F.col("_key").alias("a_key"),
        *[F.col(f"_c_{n}").alias(f"a_{n}") for n in carry],
    )
    b = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("b_id"),
        F.col("_key").alias("b_key"),
        *[F.col(f"_c_{n}").alias(f"b_{n}") for n in carry],
    )
    return a.join(b, "_blk").filter(F.col("a_id") < F.col("b_id")).drop("_blk")


def levenshtein_pairs(
    df: DataFrame,
    block: str,
    key: str,
    id_col: str = "doc_id",
    max_dist: int = 8,
    max_block: int = 256,
) -> DataFrame:
    """(a_id, b_id, lev) for blocked pairs whose comparison keys are
    within ``max_dist`` edits.

    The JVM-side ``levenshtein(l, r, threshold)`` form early-exits the
    DP once the distance provably exceeds the bound (returns -1), so the
    per-pair cost is O(len * max_dist), not O(len^2) — the comparator
    stays inside whole-stage codegen; no Python worker is involved.
    All output columns are integers: hash-exact across engines.
    """
    pairs = blocked_pairs(df, block, key, id_col, max_block)
    lev = F.levenshtein(F.col("a_key"), F.col("b_key"), int(max_dist))
    return (
        pairs.withColumn("lev", lev)
        .filter((F.col("lev") >= 0) & (F.col("lev") <= max_dist))
        .select("a_id", "b_id", F.col("lev").cast("int").alias("lev"))
    )


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Textbook Jaro-Winkler, bit-compatible with DuckDB's
    jaro_winkler_similarity (see module docstring). Pure-Python float
    arithmetic = IEEE double, same operation order as the validated
    reference formula."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        c = s1[i]
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                p += 1
            else:
                break
        j = j + p * 0.1 * (1.0 - j)
    return j


_JW_COUNTED_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"


def _jw_count_vec(key: F.Column) -> F.Column:
    """37-bucket character-count vector of a comparison key (the 36
    counted chars + an 'other' bucket), as codegen exprs — computed ONCE
    per record and carried through the pair join (O(records), not
    O(pairs): evaluating the 72 replace() scans per PAIR was measured to
    blow the whole-stage-codegen method limit and fall back to
    interpreted eval at ~100x the cost)."""
    s = F.coalesce(key, F.lit(""))
    ln = F.length(s)
    cnts = [ln - F.length(F.replace(s, F.lit(c))) for c in _JW_COUNTED_CHARS]
    total = cnts[0]
    for c in cnts[1:]:
        total = total + c
    return F.array(*cnts, ln - total)


def _jw_bound_from(a: F.Column, b: F.Column, mb: F.Column) -> F.Column:
    """The Jaro-Winkler upper bound given the multiset-intersection
    bound ``mb`` (see _jw_upper_bound for the derivation); shared by the
    inline per-pair path and the carried-count-vector path so both
    produce bit-identical bound values."""
    la = F.length(a)
    lb = F.length(b)
    mn = F.least(la, lb).cast("double")
    mx = F.greatest(la, lb).cast("double")
    j_len = F.when(mx > 0.0, (F.lit(2.0) + mn / mx) / F.lit(3.0)).otherwise(
        F.lit(0.0)
    )
    mbd = mb.cast("double")
    j_ms = F.when(
        mn > 0.0,
        (mbd / la.cast("double") + mbd / lb.cast("double") + F.lit(1.0))
        / F.lit(3.0),
    ).otherwise(F.lit(0.0))
    j_ub = F.least(j_len, j_ms)
    p = F.lit(0)
    for i in range(1, 5):
        p = p + (F.substring(a, 1, i) == F.substring(b, 1, i)).cast("int")
    return F.when(
        j_ub > 0.7,
        j_ub + F.lit(0.1) * p.cast("double") * (F.lit(1.0) - j_ub),
    ).otherwise(j_ub)


def _mb_from_vecs(a_cnt: F.Column, b_cnt: F.Column) -> F.Column:
    """Multiset-intersection bound from two carried count vectors: one
    zip_with(least) + aggregate(sum) — ~75 interpreted int ops per pair,
    orders of magnitude under the per-pair replace() scans."""
    return F.aggregate(
        F.zip_with(a_cnt, b_cnt, lambda x, y: F.least(x, y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _jw_upper_bound(a_key: str, b_key: str) -> F.Column:
    """Whole-stage-codegen UPPER BOUND on Jaro-Winkler similarity from
    lengths, exact common-prefix length and the character-multiset
    intersection (the classic counting filter of string-similarity
    joins) — the provably non-lossy JVM prefilter gate for
    jaro_winkler_pairs.

    Derivation (textbook JW, the exact kernel below):
      - Jaro j = (m/l1 + m/l2 + (m-t)/m) / 3 with m <= min(l1, l2), so
        j <= (2 + min/max) / 3                  [m(1/l1+1/l2) <= 1+min/max]
      - every Jaro match pairs EQUAL characters and consumes one
        occurrence on each side, so m is also bounded by the character-
        multiset intersection: m <= mb := sum over counted chars c of
        min(cnt_a(c), cnt_b(c)) + min(other_a, other_b), where other =
        length minus counted occurrences (uncounted characters can only
        match each other). With (m-t)/m <= 1:
          j <= (mb/l1 + mb/l2 + 1) / 3
        Both bounds hold, hence j <= j_ub := least of the two.
        Per-character counts are codegen exprs:
        cnt(s, c) = length(s) - length(replace(s, c)).
      - Winkler jw = j + 0.1*p*(1-j) applies only when j > 0.7, with p =
        common-prefix length capped at 4; jw is INCREASING in j
        (slope 1 - 0.1p >= 0.6), hence for all j <= j_ub:
          jw <= j_ub + 0.1*p*(1 - j_ub)  if j_ub > 0.7
          jw <= j_ub                     otherwise (boost can't fire).
      - p is computed exactly JVM-side: sum over i in 1..4 of
        [substr(a,1,i) = substr(b,1,i)] — prefix-equality indicators are
        monotone, so the sum IS the common-prefix length (cap 4).
    The bound uses only exact integer lengths and a handful of correctly
    rounded f64 ops; callers compare against threshold - 1e-9 so a few
    ulps of evaluation error can never drop a true >= threshold pair.
    Empty/null keys give bound 0 — the kernel scores them 0.0, so
    dropping them is lossless whenever threshold > 0. The oracle row of
    ``jaro_winkler_pairs`` (full JW recomputed in SQL, no prefilter)
    re-certifies losslessness every round.

    This standalone form computes the count vectors inline per pair (it
    only sees the two key columns) — correct anywhere, but meant for
    one-off counts and tests; the hot path in jaro_winkler_pairs carries
    _jw_count_vec per RECORD through the pair join instead and applies
    the bit-identical _jw_bound_from/_mb_from_vecs bound (O(records)
    counting, small per-pair HOF)."""
    a = F.coalesce(F.col(a_key), F.lit(""))
    b = F.coalesce(F.col(b_key), F.lit(""))
    return _jw_bound_from(
        a, b, _mb_from_vecs(_jw_count_vec(a), _jw_count_vec(b))
    )


def jaro_winkler_pairs(
    df: DataFrame,
    block: str,
    key: str,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_block: int = 256,
    prefilter: bool = True,
) -> DataFrame:
    """(a_id, b_id, jw_micro) for blocked pairs with Jaro-Winkler
    similarity >= ``threshold``.

    Spark has no JVM Jaro-Winkler, so this is the documented slow path
    done right: an Arrow-batched pandas UDF over the *blocked candidate
    pairs only* (bounded by max_block^2 per block, never the corpus
    cross product). ``jw_micro = floor(jw * 1e6)`` is emitted instead of
    a decimal-rounded double: the kernel's doubles are bit-identical to
    DuckDB's, and floor on a bit-identical double is exact — no
    cross-engine decimal-rounding boundary exists.

    ``prefilter`` (default on, active when threshold > 0) gates the
    pandas UDF behind the cheap codegen bound of _jw_upper_bound: pairs
    whose length-ratio + common-prefix upper bound already sits below
    the threshold never reach Python. The bound is PROVABLY non-lossy
    (see _jw_upper_bound — the output pair set is identical, which the
    DuckDB oracle row re-certifies every round); at threshold 0.8 it
    drops every no-common-prefix pair with min/max length ratio < 0.4
    and progressively more as the prefix shortens."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _jw_batch(a, b):
        f = _jaro_winkler_py
        return pd.Series(
            [f(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
        )

    # real class objects, not strings: `from __future__ import annotations`
    # stringifies inline hints and pandas_udf then rejects the signature
    _jw_batch.__annotations__ = {
        "a": pd.Series,
        "b": pd.Series,
        "return": pd.Series,
    }
    # asNondeterministic: the kernel IS deterministic, but the marker
    # stops Catalyst's filter-pushdown from CLONING the UDF — without it
    # the `_jw >= threshold` filter is pushed below the projection and
    # the plan evaluates the Arrow kernel TWICE per pair (observed as two
    # ArrowEvalPython nodes; 2x the python cost of the whole operator)
    jw_udf = F.pandas_udf(_jw_batch, DoubleType()).asNondeterministic()

    if prefilter and threshold > 0:
        # count vectors ride the pair join from the record side
        # (O(records) replace() scans, codegen); the per-pair work is
        # the small zip_with/aggregate HOF + the closed-form bound
        pairs = blocked_pairs(
            df, block, key, id_col, max_block,
            carry={"cnt": _jw_count_vec(F.expr(key))},
        )
        pairs = pairs.filter(
            _jw_bound_from(
                F.coalesce(F.col("a_key"), F.lit("")),
                F.coalesce(F.col("b_key"), F.lit("")),
                _mb_from_vecs(F.col("a_cnt"), F.col("b_cnt")),
            )
            >= F.lit(float(threshold) - 1e-9)
        ).select("a_id", "b_id", "a_key", "b_key")
    else:
        pairs = blocked_pairs(df, block, key, id_col, max_block)
    scored = pairs.withColumn("_jw", jw_udf("a_key", "b_key"))
    return scored.filter(F.col("_jw") >= F.lit(float(threshold))).select(
        "a_id",
        "b_id",
        F.floor(F.col("_jw") * F.lit(1e6)).cast("bigint").alias("jw_micro"),
    )


def monge_elkan_pairs(
    df: DataFrame,
    block: str,
    key: str,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_block: int = 256,
) -> DataFrame:
    """(a_id, b_id, me_micro) for blocked pairs with symmetric
    Monge-Elkan similarity >= ``threshold`` — the standard comparator
    for MULTI-TOKEN fields (person names, addresses, org names) where
    whole-string Jaro-Winkler mis-scores token reorderings ("smith
    john" vs "john smith"): each token of one side is matched to its
    best-scoring token on the other, then averaged.

    INTEGER-EXACT cross-engine semantics (no double-sum ordering
    hazard): per token pair, jw_micro = floor(jw * 1e6) rides the
    bit-identical _jaro_winkler_py <-> DuckDB jaro_winkler_similarity
    contract (module docstring); then everything is int64 —
    me_dir = sum(count_occ * max_jw_micro) // n_tokens per direction,
    me_micro = (me_ab + me_ba) // 2, and the threshold compares
    me_micro >= floor(threshold * 1e6). Summation order cannot matter
    in integer space, so the DuckDB oracle replays it exactly.

    Tokenization convention (mirrored in the SQL twin): split on the
    single space character, drop empty tokens. A side with zero tokens
    contributes 0 for its direction (consistent with the JW kernel's
    empty-string -> 0.0 convention).

    100 TB shape: same boundedness as jaro_winkler_pairs — the pandas
    UDF sees only blocked candidates (<= max_block^2/2 per block,
    never a corpus cross product); token count per key is field-sized
    (a few tokens), so per-pair cost is O(n_a * n_b) tiny constants.
    No JVM prefilter: a non-lossy upper bound over the token
    max-assignment would need per-token length bands — blocked
    candidacy is the volume control here."""
    import math

    import pandas as pd
    from pyspark.sql.types import LongType

    thr_micro = int(math.floor(float(threshold) * 1e6 + 1e-9))

    def _me_dir_micro(atoks, btoks):
        # sum over a-token OCCURRENCES of the best jw_micro vs any
        # b-token, integer-divided by the occurrence count
        if not atoks or not btoks:
            return 0
        total = 0
        for t in atoks:
            best = 0
            for u in btoks:
                jm = int(math.floor(_jaro_winkler_py(t, u) * 1e6))
                if jm > best:
                    best = jm
            total += best
        return total // len(atoks)

    def _me_batch(a, b):
        out = []
        for x, y in zip(a, b):
            at = [t for t in (x or "").split(" ") if t]
            bt = [t for t in (y or "").split(" ") if t]
            out.append((_me_dir_micro(at, bt) + _me_dir_micro(bt, at)) // 2)
        return pd.Series(out, dtype="int64")

    _me_batch.__annotations__ = {
        "a": pd.Series,
        "b": pd.Series,
        "return": pd.Series,
    }
    # asNondeterministic: stops Catalyst filter-pushdown from cloning
    # the Arrow kernel (same ArrowEvalPython-duplication hazard as
    # jaro_winkler_pairs above)
    me_udf = F.pandas_udf(_me_batch, LongType()).asNondeterministic()

    pairs = blocked_pairs(df, block, key, id_col, max_block)
    scored = pairs.withColumn("_me", me_udf("a_key", "b_key"))
    return scored.filter(F.col("_me") >= F.lit(thr_micro)).select(
        "a_id", "b_id", F.col("_me").alias("me_micro")
    )


def _packed_key_expr(key: str) -> F.Column:
    """7-char packed-ASCII sort surrogate of SQL expression ``key``:
    sum(min(ascii(char_i), 127) * 128^(7-i)) over the space-right-padded
    first 7 chars. Order-equivalent to the string prefix for ASCII
    input, fits in 2^53 (128^7 = 5.6e14) so dense_row_number's bucketing
    double cast is exact.

    Non-ASCII guard: Spark's ascii() returns the full Unicode codepoint,
    so an unclamped high codepoint in a LATER position would outweigh an
    earlier-position difference and the packed order would silently
    deviate from lexical order. Each term is clamped to 127 (keeping the
    radix sound); all codepoints > 126 therefore collapse into one
    order-slot per position — exact lexical order is guaranteed for
    ASCII keys only, and callers with non-ASCII keys should normalize
    upstream. The SQL twin (driver_queries._packed_key_sql) applies the
    identical least(ascii(..), 127)."""
    padded = F.rpad(F.expr(key), 7, " ")
    col = F.lit(0).cast("bigint")
    for i in range(1, 8):
        col = col + (
            F.least(F.ascii(F.substring(padded, i, 1)), F.lit(127)).cast("bigint")
            * F.lit(128 ** (7 - i)).cast("bigint")
        )
    return col


def snm_pairs(
    df: DataFrame,
    key: str,
    id_col: str = "doc_id",
    window: int = 5,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs: rank every row by a packed
    sort key, pair each row with the next ``window`` rows in rank order.

    The rank is the distributed three-step renumber
    (functions/ranking.dense_row_number — range-bucketed, bucket-local
    windows), NOT a single-task global ``Window.orderBy``; the pairing
    is an equi-join on ``rn + delta`` after exploding delta in
    [1, window], so the expansion is exactly ``window`` rows per input
    row. Ties on the packed key break on ``id_col`` — both sides of the
    oracle order identically. Optional ``max_dist`` applies a
    whole-stage-codegen levenshtein filter on the pair keys.

    Output: (a_id, b_id, gap, lev) — all integers, hash-exact.
    """
    keyed = df.select(
        F.col(id_col).alias("_id"), F.expr(key).alias("_key")
    ).withColumn("_snm", _packed_key_expr("_key"))
    ranked = dense_row_number(
        keyed, "_snm", out_col="_rn", tiebreak_col="_id"
    ).select("_id", "_key", "_rn")
    a = ranked.select(
        F.col("_id").alias("a_id"),
        F.col("_key").alias("a_key"),
        F.col("_rn").alias("_rn_a"),
    ).withColumn(
        "gap", F.explode(F.sequence(F.lit(1), F.lit(int(window))))
    )
    b = ranked.select(
        F.col("_id").alias("b_id"),
        F.col("_key").alias("b_key"),
        (F.col("_rn")).alias("_rn_b"),
    )
    pairs = a.withColumn("_rn_b", F.col("_rn_a") + F.col("gap")).join(
        b, "_rn_b"
    )
    out = pairs.select(
        "a_id",
        "b_id",
        F.col("gap").cast("int").alias("gap"),
        F.levenshtein("a_key", "b_key").cast("int").alias("lev"),
    )
    if max_dist is not None:
        out = out.filter(F.col("lev") <= int(max_dist))
    return out


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    df_cap: int = 64,
    threshold: float = 0.35,
    n_docs: int | None = None,
) -> DataFrame:
    """(a_id, b_id, n_shared, cos) — TF-IDF cosine similarity over word
    ``shingle_n``-gram terms for pairs sharing at least one term.

    Inverted-index self-join: postings lists are capped at ``df_cap``
    documents (terms present in more docs carry ~no IDF signal and would
    dominate the join quadratically — the same guard as
    ngram_jaccard_pairs), so the join cost is O(#terms * df_cap^2) and
    no all-pairs product ever forms. Weights use the smoothed
    ln((N+1)/(df+1)) + 1 convention shared with tfidf_top_terms; norms
    are computed over the SAME capped term set, so cosine is exactly the
    capped-space cosine on both engines.
    """
    from kiez_spark.functions import text as T

    # non-distinct hashed shingle terms: tf is the real occurrence count
    # (the dedup twins use list_distinct sets; here repeats carry signal)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            T.shingles(T.tokens(F.col(text_col)), shingle_n), T.token_hash
        ).alias("_hs"),
    )
    terms = toks.select("_id", F.explode("_hs").alias("h"))
    tf = terms.groupBy("_id", "h").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("h").agg(F.count("*").alias("df_t"))
    if n_docs is None:
        # one scalar count job at plan-construction time — pass n_docs
        # when the caller already knows it (pipelines usually do)
        n_docs = df.count()
    w = F.col("tf") * (
        F.log((F.lit(float(n_docs + 1))) / (F.col("df_t") + F.lit(1.0)))
        + F.lit(1.0)
    )
    postings = (
        tf.join(dft.filter(F.col("df_t") <= df_cap), "h")
        .withColumn("w", w)
        .select("_id", "h", "w")
    )
    norms = postings.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    a = postings.select(
        F.col("_id").alias("a_id"), "h", F.col("w").alias("wa")
    )
    b = postings.select(
        F.col("_id").alias("b_id"), "h", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count("*").alias("n_shared"),
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
        )
    )
    na = norms.select(F.col("_id").alias("a_id"), F.col("norm").alias("na"))
    nb = norms.select(F.col("_id").alias("b_id"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select(
            "a_id",
            "b_id",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round("cos", 6).alias("cos"),
        )
    )


# --------------------------------------------------------------- phonetics

# simplified-soundex letter -> code map (classic soundex groups, but
# WITHOUT the H/W adjacency rule: runs collapse before zero-stripping, on
# the raw code string). Defining our own rule keeps the Spark and DuckDB
# expressions semantically identical — engine-builtin soundex() variants
# disagree on exactly the H/W corner.
_PHONETIC_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_PHONETIC_TO = "00000000111122222222334556"


def phonetic_key(col: F.Column) -> F.Column:
    """Simplified-soundex phonetic key of the first A-Za-z word of
    ``col``: first letter + first 3 non-zero collapsed codes, '0'-padded.

    Pure column expressions (upper/translate/regexp/rpad) with an exact
    SQL twin in driver_queries.SQL fragments — no UDF, stays inside
    whole-stage codegen. Empty/non-alpha input yields '0000'.
    """
    w = F.upper(F.regexp_extract(col, "^[A-Za-z]+", 0))
    code = F.translate(w, _PHONETIC_FROM, _PHONETIC_TO)
    # collapse runs per digit (6 chained regexps, NO backreference: the
    # DuckDB oracle runs RE2, which silently never matches `(.)\1+`)
    collapsed = code
    for d in "123456":
        collapsed = F.regexp_replace(collapsed, d + "{2,}", d)
    digits = F.translate(F.substring(collapsed, 2, 1000), "0", "")
    return F.when(w == "", F.lit("0000")).otherwise(
        F.concat(F.substring(w, 1, 1), F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


# ------------------------------------------------- Fellegi-Sunter scoring

import math


def _fs_weights(fields: dict) -> dict:
    """Per-field (agree_weight, disagree_weight) = log2(m/u),
    log2((1-m)/(1-u)) computed ONCE driver-side so both engines only sum
    the identical literal doubles (in field order) — IEEE addition of
    equal literals is bit-exact; no cross-engine log() is ever taken."""
    out = {}
    for name, (m, u) in fields.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"field {name}: need 0 < u < m < 1, got m={m} u={u}")
        out[name] = (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
    return out


def fs_scores(pairs: DataFrame, fields: dict) -> DataFrame:
    """Fellegi-Sunter match weight over candidate pairs.

    ``pairs`` must already carry one BOOLEAN agreement column per entry of
    ``fields`` (name -> (m, u) conditional agreement probabilities; the
    reference resolves entities purely in embedding space — this is the
    probabilistic record-linkage tier of the classic Fellegi-Sunter 1969
    model). Adds ``weight_micro = floor(1e6 * sum_i w_i)`` where w_i is
    the literal agree/disagree log2 weight — BIGINT, hash-exact across
    engines (see _fs_weights). Null agreements count as disagreement.

    Scale: a single projection over the (already bounded) candidate-pair
    set; no shuffle, no UDF.
    """
    w = _fs_weights(fields)
    total = F.lit(0.0)
    for name, (wa, wd) in w.items():
        total = total + F.when(
            F.coalesce(F.col(name), F.lit(False)), F.lit(wa)
        ).otherwise(F.lit(wd))
    return pairs.withColumn(
        "weight_micro", F.floor(total * F.lit(1e6)).cast("bigint")
    )


def _pattern_stats(pairs: DataFrame, field_cols: list) -> DataFrame:
    """(pattern bit-cols..., n_pairs) — the sufficient statistics of the
    FS mixture: ONE shuffle of the candidate pairs down to <= 2^k rows."""
    bits = [
        F.coalesce(F.col(c), F.lit(False)).cast("int").alias(c)
        for c in field_cols
    ]
    return pairs.select(*bits).groupBy(*field_cols).agg(
        F.count("*").alias("n_pairs")
    )


def fs_em(
    pairs: DataFrame,
    field_cols: list,
    n_iter: int = 30,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    fixed_u: dict | None = None,
):
    """EM estimate of the Fellegi-Sunter parameters (p, m_i, u_i).

    The distributed part is one aggregation to the <= 2^k agreement
    patterns (_pattern_stats); EM then iterates DRIVER-SIDE on that tiny
    sufficient-statistics table — at 100 TB the iteration cost is
    O(2^k * n_iter) regardless of corpus size, the canonical
    aggregate-once / iterate-on-stats design. Deterministic: fixed
    iteration count, fixed float64 ops, no randomness.

    ``fixed_u`` (name -> u_i) pins the non-match agreement probabilities
    and EM fits only (p, m_i). Use it when the candidate set comes from
    HIGH-PRECISION blocking: if (nearly) every candidate is a true match
    there is no non-match class in the data and the free two-class
    mixture is degenerate — u must then be estimated out-of-band from
    random pairings (fs_u_probabilities over random_pairs), the standard
    Splink-style protocol.

    Returns (params, patterns): params = {"p": .., "m": {f: ..},
    "u": {f: ..}}, patterns = list of (bits tuple, n_pairs, posterior).
    """
    import numpy as np

    rows = _pattern_stats(pairs, field_cols).collect()
    if not rows:
        raise ValueError("fs_em: no candidate pairs")
    G = np.array([[r[c] for c in field_cols] for r in rows], dtype=np.float64)
    n = np.array([r["n_pairs"] for r in rows], dtype=np.float64)
    k = len(field_cols)
    p = float(p0)
    m = np.full(k, float(m0))
    eps = 1e-9
    if fixed_u is not None:
        missing = [f for f in field_cols if f not in fixed_u]
        if missing:
            raise ValueError(f"fs_em: fixed_u missing fields {missing}")
        u = np.clip(
            np.array([float(fixed_u[f]) for f in field_cols]), eps, 1.0 - eps
        )
    else:
        u = np.full(k, float(u0))
    for _ in range(int(n_iter)):
        lm = G @ np.log(m) + (1.0 - G) @ np.log(1.0 - m)
        lu = G @ np.log(u) + (1.0 - G) @ np.log(1.0 - u)
        num = p * np.exp(lm)
        den = num + (1.0 - p) * np.exp(lu)
        w = num / np.maximum(den, eps)
        tot = float((n * w).sum())
        p = min(max(tot / float(n.sum()), eps), 1.0 - eps)
        m = np.clip((G.T @ (n * w)) / max(tot, eps), eps, 1.0 - eps)
        if fixed_u is None:
            nu = float((n * (1.0 - w)).sum())
            u = np.clip(
                (G.T @ (n * (1.0 - w))) / max(nu, eps), eps, 1.0 - eps
            )
    params = {
        "p": p,
        "m": {f: float(m[i]) for i, f in enumerate(field_cols)},
        "u": {f: float(u[i]) for i, f in enumerate(field_cols)},
    }
    lm = G @ np.log(m) + (1.0 - G) @ np.log(1.0 - m)
    lu = G @ np.log(u) + (1.0 - G) @ np.log(1.0 - u)
    post = p * np.exp(lm) / np.maximum(p * np.exp(lm) + (1 - p) * np.exp(lu), eps)
    patterns = [
        (tuple(int(x) for x in G[i]), int(n[i]), float(post[i]))
        for i in range(len(rows))
    ]
    return params, patterns


def fs_em_posteriors(
    spark, pairs: DataFrame, field_cols: list, **em_kwargs
) -> DataFrame:
    """DataFrame form of fs_em for the driver registry: one row per
    agreement pattern with (bits..., n_pairs, posterior_micro). Rows-only
    gate (EM is not SQL-expressible); deterministic ordering baked in by
    the driver's sorted compare."""
    _, patterns = fs_em(pairs, field_cols, **em_kwargs)
    rows = [
        tuple(bits) + (n, int(math.floor(post * 1e6)))
        for bits, n, post in patterns
    ]
    schema = (
        ", ".join(f"{c} int" for c in field_cols)
        + ", n_pairs bigint, posterior_micro bigint"
    )
    return spark.createDataFrame(rows, schema)


def random_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n_offsets: int = 3,
    seed: int = 7,
    max_rows: int | None = 100_000,
    n_rows: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random (a_id, b_id) pairings for u-probability
    estimation (a_id < b_id, no self-pairs, deduplicated).

    Ranks rows by ``xxhash64(id, seed)`` — a fixed permutation
    uncorrelated with content — and pairs rank r with rank
    (r + off) mod n for off = 1..n_offsets, so almost every pair is a
    non-match under any realistic duplicate rate. No RNG state:
    re-running yields the identical pair set (checkpoint/resume safe).

    Scale: when the corpus exceeds ``max_rows`` a hash predicate
    downsamples it first (u only needs a bounded sample); ranking is the
    bucketed dense_row_number (no single-partition global window), and
    the pairing is an equi-join on the partner rank.

    ``n_rows``: the EXACT row count of ``df``, when the caller already
    knows it (pipelines usually do — the ER job's state stores per-
    version doc counts). Passing it removes every full-corpus count job
    from this function in the undersampled case (the wrap-around
    pairing arithmetic needs the exact cardinality, so when the hash
    downsample fires, the filtered subset — a data-dependent size —
    still costs one count of the FILTERED frame).
    """
    d = df.select(F.col(id_col).alias("id"))
    n_known = int(n_rows) if n_rows is not None else None
    if max_rows is not None:
        n_total = n_known if n_known is not None else d.count()
        if n_total > max_rows:
            den = -(-n_total // max_rows)
            d = d.filter(
                F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(den)) == 0
            )
            n_known = None  # filtered cardinality is data-dependent
        else:
            n_known = n_total
    d = d.withColumn("_h", F.xxhash64("id", F.lit(seed)))
    ranked = dense_row_number(d, "_h", out_col="_rn", tiebreak_col="id").drop(
        "_h"
    )
    n = n_known if n_known is not None else ranked.count()
    if n < 2:
        raise ValueError(f"random_pairs: need >= 2 rows, got {n}")
    offs = F.array(*[F.lit(i) for i in range(1, int(n_offsets) + 1)])
    left = ranked.select(
        F.col("id").alias("_a"), F.explode(offs).alias("_off"), "_rn"
    ).withColumn("_partner", F.pmod(F.col("_rn") + F.col("_off"), F.lit(n)))
    right = ranked.select(F.col("id").alias("_b"), F.col("_rn").alias("_partner"))
    return (
        left.join(right, "_partner")
        .filter(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("a_id"),
            F.greatest("_a", "_b").alias("b_id"),
        )
        .distinct()
    )


def fs_u_probabilities(pairs: DataFrame, field_cols: list) -> dict:
    """Laplace-smoothed per-field agreement rates (name -> u) over a pair
    set — run it on random_pairs output to get the Fellegi-Sunter
    u-probabilities when blocking is too precise to expose a non-match
    class to EM (see fs_em's fixed_u). One aggregation, null = disagree;
    the +0.5/+1 smoothing keeps u strictly inside (0, 1) so log2 weights
    stay finite even when no random pair agrees."""
    aggs = [
        F.sum(F.coalesce(F.col(c), F.lit(False)).cast("int")).alias(c)
        for c in field_cols
    ] + [F.count(F.lit(1)).alias("_n")]
    r = pairs.agg(*aggs).collect()[0]
    n = float(r["_n"] or 0)
    if n == 0:
        raise ValueError("fs_u_probabilities: empty pair set")
    return {c: (float(r[c] or 0) + 0.5) / (n + 1.0) for c in field_cols}


# ---------------------------------------------- blocking-quality metrics


def blocking_quality(
    cand: DataFrame,
    gold: DataFrame,
    n_records: int,
) -> DataFrame:
    """One-row blocking audit: candidate count, gold count, recovered
    count, pair-completeness and reduction-ratio in exact micro units.

    cand/gold carry (a_id, b_id) with a_id < b_id. Each side is
    DEDUPED here before joining — the full-outer join counts would
    otherwise be wrong on duplicate input pairs (a cand pair appearing
    twice would double the joined gold row, misreporting n_gold), so
    the distinct is enforced rather than left as a precondition. All
    outputs are BIGINT (ratios via integer 1e6-scaled DIV) — hash-exact
    across engines, immune to the rounded-double boundary.

    SINGLE-PASS and fully lazy: one full-outer join on the pair key +
    one aggregation counts both sides and the intersection together
    (the previous form ran three separate count jobs, each
    re-traversing the candidate plan — 3x the scan cost on a 100 TB
    candidate set). At scale both sides are already bounded pair sets
    (never all-pairs), and the distinct folds into the join exchange.
    """
    c = cand.select("a_id", "b_id").distinct().withColumn("_c", F.lit(1))
    g = gold.select("a_id", "b_id").distinct().withColumn("_g", F.lit(1))
    j = c.join(g, ["a_id", "b_id"], "full_outer")
    agg = j.agg(
        F.count("_c").cast("bigint").alias("n_candidates"),
        F.count("_g").cast("bigint").alias("n_gold"),
        F.count(F.when(F.col("_c").isNotNull() & F.col("_g").isNotNull(), 1))
        .cast("bigint")
        .alias("n_found"),
    )
    total = int(n_records) * (int(n_records) - 1) // 2
    return agg.select(
        "n_candidates",
        "n_gold",
        "n_found",
        F.when(
            F.col("n_gold") > 0,
            F.expr("(1000000 * n_found) div n_gold"),
        ).otherwise(F.lit(0)).cast("bigint").alias("pair_completeness_micro"),
        (
            # DECIMAL(38,0) intermediate: the straight int64 form
            # 1000000*(total - n_candidates) wraps once n_records exceeds
            # ~4.3M (total ~9.2e12) — at odds with the 100TB framing.
            # Decimal keeps ~1e27 intermediates exact, and `div`
            # (IntegralDivide) truncates EXACTLY on decimals — unlike
            # decimal `/`, whose scale-reduced quotient rounds HALF_UP
            # and misreports boundary ratios by 1 micro unit (verified:
            # floor((total-2)*1e6/total) at n_records=10M).
            F.expr(
                f"(cast({total} as decimal(38,0)) - n_candidates)"
                f" * 1000000 div {total}"
            )
            if total
            else F.lit(0)
        ).cast("bigint").alias("reduction_ratio_micro"),
    )


# ------------------------------------------------------- incremental ER


def blocking_postings_raw(
    df: DataFrame, keys: F.Column, id_col: str = "doc_id"
) -> DataFrame:
    """UNCAPPED distinct (k, id) postings of one document set — the
    append-only unit of a delta-persisted blocking index: store each
    corpus version's raw postings plus its per-key df contribution, and
    the CAPPED posting table any version needs is reconstructed by
    filtering the union on the SUMMED df (cap membership depends only
    on the total frequency, never on the order deltas arrived)."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(keys)).alias("k")
    ).distinct()


def build_blocking_index(
    df: DataFrame,
    keys: F.Column,
    id_col: str = "doc_id",
    df_cap: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """(posting, stats) blocking index for incremental linkage.

    posting: (k, id) for every key whose document frequency <= df_cap;
    stats:   (k, df) for EVERY key, including over-cap ones.

    Persist both (parquet/Iceberg) and feed incremental_blocking_pairs.
    Storing stats beside the capped postings is what keeps the
    incremental df-cap UNION-exact: a key near the cap is re-evaluated
    against (corpus df + batch df) without rescanning the corpus, and a
    key already over cap stays excluded (df only grows). One shuffle of
    (k, id) + one of (k, df) — the per-corpus-version index build cost.
    """
    posting = blocking_postings_raw(df, keys, id_col)
    stats = posting.groupBy("k").agg(F.count("*").alias("df"))
    capped = posting.join(
        stats.filter(F.col("df") <= int(df_cap)).select("k"), "k"
    )
    return capped.select("k", "id"), stats


def incremental_blocking_pairs(
    batch_df: DataFrame,
    keys: F.Column,
    corpus_posting: DataFrame,
    corpus_stats: DataFrame,
    id_col: str = "doc_id",
    df_cap: int = 64,
    min_cbs: int = 2,
) -> DataFrame:
    """CBS-weighted candidate pairs INCIDENT TO THE BATCH only —
    batch x corpus plus batch x batch; corpus x corpus never re-pairs.
    Output (a_id, b_id, cbs) with a_id < b_id (ids must live in one
    namespace with batch ids disjoint from corpus ids).

    The df cap is evaluated on the UNION frequency (corpus stats df +
    batch df), so with (old corpus-run pairs) ∪ (these pairs) you get
    EXACTLY what a full re-block of the combined corpus (top_n=None)
    would — provided no key crossed the cap between versions. A key
    that does cross contributes no NEW pairs here but a full re-run
    would also retract its OLD pairs; incremental linkage keeps them:
    decisions are monotone (clusters merge on increment, never split),
    the production semantic for a daily-increment pipeline.

    Scale: the batch shuffles once to build its postings; the corpus
    side is the persisted index (pay once per corpus version). Both
    joins are key-equi-joins bounded by the df cap — O(df^2) worst case
    per key, never all-pairs.
    """
    bp = batch_df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(keys)).alias("k")
    ).distinct()
    bs = bp.groupBy("k").agg(F.count("*").alias("_df_b"))
    ok = (
        corpus_stats.select("k", "df")
        .join(bs, "k", "full_outer")
        .filter(
            F.coalesce(F.col("df"), F.lit(0))
            + F.coalesce(F.col("_df_b"), F.lit(0))
            <= int(df_cap)
        )
        .select("k")
    )
    bpo = bp.join(ok, "k")
    cpo = corpus_posting.select("k", F.col("id").alias("_cid")).join(ok, "k")
    cross = (
        bpo.join(cpo, "k")
        .select(
            F.least("id", "_cid").alias("a_id"),
            F.greatest("id", "_cid").alias("b_id"),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("cbs"))
    )
    b2 = bpo.select(F.col("id").alias("b_id"), "k")
    intra = (
        bpo.join(b2, "k")
        .filter(F.col("id") < F.col("b_id"))
        .select(F.col("id").alias("a_id"), "b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("cbs"))
    )
    return (
        cross.unionByName(intra)
        .filter(F.col("cbs") >= int(min_cbs))
        .select("a_id", "b_id", F.col("cbs").cast("int").alias("cbs"))
    )


def update_blocking_index(
    posting: DataFrame,
    stats: DataFrame,
    batch_df: DataFrame,
    keys: F.Column,
    id_col: str = "doc_id",
    df_cap: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Fold a processed batch into a build_blocking_index state: stats
    sum per key (full-outer — batch-new keys enter, corpus-only keys
    persist), postings union re-filtered to the UPDATED df cap. Keys
    that cross the cap at this version drop out of the posting table and
    stay out (df only grows — the same monotone-exclusion contract as
    incremental_blocking_pairs). Cost: one batch shuffle + one stats
    merge; the corpus posting table is never re-derived from text."""
    bp = batch_df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(keys)).alias("k")
    ).distinct()
    bs = bp.groupBy("k").agg(F.count("*").alias("_df_b"))
    stats2 = (
        stats.select("k", "df")
        .join(bs, "k", "full_outer")
        .select(
            "k",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("_df_b"), F.lit(0))
            ).alias("df"),
        )
    )
    posting2 = (
        posting.select("k", "id")
        .unionByName(bp.select("k", "id"))
        .join(stats2.filter(F.col("df") <= int(df_cap)).select("k"), "k")
    )
    return posting2.select("k", "id"), stats2


def crossed_cap_retractions(
    posting: DataFrame,
    stats: DataFrame,
    batch_df: DataFrame,
    keys: F.Column,
    id_col: str = "doc_id",
    df_cap: int = 64,
    min_cbs: int = 2,
) -> DataFrame:
    """Opt-in STRICT mode for incremental blocking: the (a_id, b_id)
    pairs a consumer must RETRACT so that
        (union of all emitted incremental pairs) MINUS (union of all
        retractions) == a full re-block of the combined corpus
    holds exactly — even when keys cross the df cap between versions.

    The default incremental semantic is monotone (keep-old-pairs:
    clusters merge, never split — see incremental_blocking_pairs). A
    key that crosses the cap at this version stops supporting pairs in
    a full re-run, so pairs whose remaining under-cap support falls
    below ``min_cbs`` would differ. This function computes exactly
    those pairs, BEFORE folding the batch into the state:

      crossed  = keys with old total df <= cap but old + batch df > cap
      affected = all id pairs inside each crossed key's posting list
                 (bounded by df_cap^2/2 per crossed key — never a scan)
      retract  = affected pairs whose shared-key count in the UPDATED
                 capped posting table drops below min_cbs

    Correctness: support only shrinks over versions (df grows, caps
    exclude monotonically). A pair in the final full re-run keeps
    support >= min_cbs at every version, so it is never retracted; a
    pair whose final support < min_cbs loses it exactly at a version
    where one of its keys crosses — it lands in that version's affected
    set and is retracted there. Retracting a never-emitted pair is a
    set-difference no-op. Proven against a from-scratch re-block in
    tests/test_er_incremental.py.
    """
    bp = batch_df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(keys)).alias("k")
    ).distinct()
    bs = bp.groupBy("k").agg(F.count("*").alias("_df_b"))
    merged = stats.select("k", "df").join(bs, "k", "full_outer").select(
        "k",
        F.coalesce(F.col("df"), F.lit(0)).alias("_df_old"),
        (
            F.coalesce(F.col("df"), F.lit(0))
            + F.coalesce(F.col("_df_b"), F.lit(0))
        ).alias("_df_new"),
    )
    crossed = merged.filter(
        (F.col("_df_old") <= int(df_cap)) & (F.col("_df_new") > int(df_cap))
    ).select("k")
    dying = posting.select("k", "id").join(crossed, "k")
    a = dying.select("k", F.col("id").alias("a_id"))
    b = dying.select("k", F.col("id").alias("b_id"))
    affected = (
        a.join(b, "k")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # UPDATED capped posting table (same fold as update_blocking_index)
    posting2 = (
        posting.select("k", "id")
        .unionByName(bp.select("k", "id"))
        .join(merged.filter(F.col("_df_new") <= int(df_cap)).select("k"), "k")
    )
    pa = posting2.select("k", F.col("id").alias("a_id"))
    pb = posting2.select("k", F.col("id").alias("b_id"))
    support = (
        affected.join(pa, "a_id")
        .join(pb, ["k", "b_id"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("_cbs"))
    )
    return (
        affected.join(support, ["a_id", "b_id"], "left")
        .filter(F.coalesce(F.col("_cbs"), F.lit(0)) < int(min_cbs))
        .select("a_id", "b_id")
    )


# -------------------------------------------------------- meta-blocking


def metablocking_pairs(
    df: DataFrame,
    keys: F.Column,
    id_col: str = "doc_id",
    df_cap: int = 64,
    min_cbs: int = 2,
    top_n: int | None = 10,
) -> DataFrame:
    """Meta-blocking with common-block-scheme (CBS) weighting: records
    sharing >= ``min_cbs`` block keys become pairs, optionally pruned to
    each record's ``top_n`` strongest partners (weight-ranked).

    ``keys`` is an array<...> column expression producing each record's
    block keys (e.g. shingle hashes). Classic Papadakis-style
    meta-blocking re-expressed as: explode distinct (id, key) ->
    df-capped inverted index (keys on more than ``df_cap`` records carry
    no discriminative signal and would cost O(df^2) — same guard as
    ngram_jaccard_pairs) -> self-join -> count shared keys per pair ->
    per-record rank window (WindowGroupLimit pushes the top_n).
    Output (a_id, b_id, cbs, rank) — all integers, hash-exact.
    """
    from pyspark.sql import Window

    posting = (
        df.select(F.col(id_col).alias("_id"), F.explode(F.array_distinct(keys)).alias("k"))
        .distinct()
    )
    ok = (
        posting.groupBy("k")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= df_cap)
        .select("k")
    )
    posting = posting.join(ok, "k")
    a = posting.select(F.col("_id").alias("a_id"), "k")
    b = posting.select(F.col("_id").alias("b_id"), "k")
    pairs = (
        a.join(b, "k")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("cbs"))
        .filter(F.col("cbs") >= int(min_cbs))
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cbs"), F.asc("b_id"))
    out = pairs.withColumn("rank", F.row_number().over(w))
    if top_n is not None:
        out = out.filter(F.col("rank") <= int(top_n))
    return out.select(
        "a_id",
        "b_id",
        F.col("cbs").cast("int").alias("cbs"),
        F.col("rank").cast("int").alias("rank"),
    )
