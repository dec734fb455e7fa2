"""Dedup + text-analysis + multimodal + similarity operators over the
driver-provided documents/embeddings tables and planted synthetic dups."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kiez_spark import synth
from kiez_spark.operators import dedup as D
from kiez_spark.operators import multimodal as M
from kiez_spark.operators import similarity as SIM
from kiez_spark.operators import text_analysis as TA

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Synthetic docs with known near-dup clusters: reuse repos_files
    content as (doc_id, text)."""
    files = synth.repos_files(spark, n=200, cluster_size=4, dup_fraction=0.6)
    return files.select(
        F.col("row_id").alias("doc_id"), F.col("content").alias("text")
    ).cache(), files


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "a  B c")],
        "doc_id bigint, text string",
    )
    groups = D.exact_duplicates(df).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2]  # 4 differs (case/whitespace kept)


def test_minhash_lsh_finds_planted_dups(spark, dup_docs):
    docs, files = dup_docs
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=8)
    got = {(r.src_id, r.tgt_id) for r in pairs.collect()}
    gold = {(r.src_id, r.tgt_id) for r in synth.gold_pairs(files).collect()}
    recall = len(got & gold) / len(gold)
    precision = len(got & gold) / max(1, len(got))
    assert recall > 0.95, f"minhash recall {recall}"
    assert precision > 0.95, f"minhash precision {precision}"


def test_shingle_kernel_tier_parity(spark, dup_docs):
    """The Arrow shingle/signature kernel (default tier) must be
    bit-identical to the expr tier: same distinct shingle hash sets in
    the same (first-occurrence) order, same signatures — on planted
    near-dups AND the normalization edge cases (nulls, empties, unicode,
    exotic whitespace, shingles >55 utf-8 bytes)."""
    docs, _ = dup_docs
    edge = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "a"),
            (5, "a b"),
            (6, "a b c"),
            (7, "a  b\tc\nd e"),
            (8, " x y z "),
            (10, "ümlaut ünïcode tökens hërę extra words"),
            (11, "\x0bv\x0c f\r n q r"),
            (12, ("w" * 30 + " ") * 6),  # >55-byte shingles
            (13, "İstanbul CASE ſtraße test here now"),
            (15, "dup dup dup dup dup dup"),
        ],
        "doc_id long, text string",
    )
    for src in (docs, edge):
        k = D._with_shingles(src, "doc_id", "text", 3, tier="kernel")
        e = D._with_shingles(src, "doc_id", "text", 3, tier="expr")
        for rk, re_ in zip(
            k.orderBy("doc_id").collect(), e.orderBy("doc_id").collect()
        ):
            assert rk.doc_id == re_.doc_id and rk.sh == re_.sh
        sk = D.minhash_signatures(src, n_hashes=16, tier="kernel")
        se = D.minhash_signatures(src, n_hashes=16, tier="expr")
        for rk, re_ in zip(
            sk.orderBy("doc_id").collect(), se.orderBy("doc_id").collect()
        ):
            assert rk.doc_id == re_.doc_id and rk.sig == re_.sig
    pk = sorted(
        map(
            tuple,
            D.minhash_lsh_pairs(
                docs, threshold=0.5, n_hashes=16, bands=8, tier="kernel"
            ).collect(),
        )
    )
    spark.catalog.clearCache()
    pe = sorted(
        map(
            tuple,
            D.minhash_lsh_pairs(
                docs, threshold=0.5, n_hashes=16, bands=8, tier="expr"
            ).collect(),
        )
    )
    assert pk == pe


def test_simhash_kernel_tier_parity(spark, dup_docs):
    """The Arrow simhash kernel (default tier) must be bit-identical to
    the exploded-vote expr tier — including null text (simhash 0) and
    empty-after-normalization text (split('') == [''] semantics: the
    vote of md5(''), i.e. the 60-bit md5('') constant)."""
    docs, _ = dup_docs
    edge = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "a"),
            (5, "a b"),
            (7, "a  b\tc\nd e"),
            (10, "ümlaut ünïcode tökens hërę extra words"),
            (11, "\x0bv\x0c f\r n q r"),
            (12, ("w" * 30 + " ") * 6),
            (14, "w" * 80),  # one >55-byte token
        ],
        "doc_id long, text string",
    )
    for src in (docs, edge):
        k = D.simhash_fingerprints(src, tier="kernel").orderBy("doc_id").collect()
        e = D.simhash_fingerprints(src, tier="expr").orderBy("doc_id").collect()
        assert len(k) == len(e)
        for rk, re_ in zip(k, e):
            assert rk.doc_id == re_.doc_id and rk.simhash == re_.simhash


def test_minhash_vs_ngram_jaccard_agree(spark, dup_docs):
    """The LSH-verified pairs must be a subset of exact inverted-index
    Jaccard pairs at the same threshold (both verify exactly)."""
    docs, _ = dup_docs
    lsh = {
        (r.src_id, r.tgt_id)
        for r in D.minhash_lsh_pairs(docs, threshold=0.6, n_hashes=16, bands=8).collect()
    }
    exact = {
        (r.src_id, r.tgt_id)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    assert lsh <= exact
    assert len(lsh) / max(1, len(exact)) > 0.9  # high recall at 8 bands


def test_simhash_near_dups(spark, dup_docs):
    docs, files = dup_docs
    pairs = D.simhash_pairs(docs, max_hamming=12, bands=6)
    got = {(r.src_id, r.tgt_id) for r in pairs.collect()}
    gold = {(r.src_id, r.tgt_id) for r in synth.gold_pairs(files).collect()}
    # one-token edits flip few simhash bits; most gold pairs are caught
    assert len(got & gold) / len(gold) > 0.8


def test_embedding_neardup_exact_vs_approx(spark, dup_docs):
    docs, files = dup_docs
    emb = synth.derive_embeddings(files, dim=32)
    exact = {
        (r.src_id, r.tgt_id)
        for r in D.embedding_neardup_pairs(emb, max_cos_dist=0.05).collect()
    }
    approx = {
        (r.src_id, r.tgt_id)
        for r in D.embedding_neardup_pairs(
            emb, max_cos_dist=0.05, approx=True, n_tables=8, n_bits=12
        ).collect()
    }
    assert approx <= exact
    assert len(approx & exact) / max(1, len(exact)) > 0.9


def test_text_analysis_ops(spark, docs):
    n = docs.count()
    tc = TA.token_counts(docs, "doc_id", "text")
    assert tc.count() == n
    row = tc.filter("n_tokens <= 0").count()
    assert row == 0
    q = TA.quality_features(docs, "doc_id", "text")
    stats = q.agg(F.min("quality"), F.max("quality")).first()
    assert 0.0 <= stats[0] and stats[1] <= 1.0
    li = TA.lang_id(docs, "doc_id", "text")
    assert li.count() == n
    fp = TA.fingerprints(docs, "doc_id", "text")
    # order sensitivity: permuted tokens give a different fingerprint
    two = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id bigint, text string",
    )
    f2 = TA.fingerprints(two).collect()
    assert f2[0].fingerprint != f2[1].fingerprint
    assert fp.count() == n


def test_jaccard_prefix_pairs_lossless(spark, dup_docs):
    """The AllPairs/PPJoin prefix+size filters must be LOSSLESS: output
    identical to the uncapped brute-force inverted-index join at every
    threshold (value-identical, not just pair-identical)."""
    docs, _ = dup_docs
    for t in (0.5, 0.7, 0.9):
        brute = {
            (r.src_id, r.tgt_id, round(r.jaccard, 9))
            for r in D.ngram_jaccard_pairs(
                docs, threshold=t, max_doc_freq=10_000_000
            ).collect()
        }
        pref = {
            (r.src_id, r.tgt_id, round(r.jaccard, 9))
            for r in D.jaccard_prefix_pairs(docs, threshold=t).collect()
        }
        assert brute == pref, t
    assert pref is not None and len(brute) > 0


def test_bm25_topk(spark, docs):
    """BM25 retrieval: rank/score contracts on the real corpus, then the
    two defining behaviors on a constructed one — term-stuffing wins on
    tf saturation, and at equal tf the SHORTER document outranks the
    longer (length normalization)."""
    top = TA.bm25_topk(docs, "the and data", k=10).collect()
    assert 0 < len(top) <= 10
    assert [r.rank for r in top] == list(range(1, len(top) + 1))
    scores = [r.bm25 for r in top]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)

    corpus = spark.createDataFrame(
        [
            (1, "needle needle needle in a stack"),
            (2, "needle in a very very long hay stack full of other words"),
            (3, "needle in stack"),
            (4, "nothing relevant here at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in TA.bm25_topk(corpus, "needle", k=4).collect()}
    assert 4 not in got  # no query term -> no row
    assert got[1].rank == 1  # highest tf wins
    # docs 2 and 3 tie on tf=1: shorter doc 3 must outrank longer doc 2
    assert got[3].bm25 > got[2].bm25


def test_multimodal_plumbing(spark, docs):
    blobs = M.pack_blobs(docs.limit(50))
    assert blobs.filter(F.col("n_bytes") != F.length(F.col("blob"))).count() == 0
    feats = M.decode_image(blobs, fake=True).collect()
    assert len(feats) == 50
    assert all(len(r.feat) == 8 for r in feats)
    assert all(abs(sum(r.feat) - 1.0) < 1e-9 for r in feats)
    # non-PPM bytes through the REAL path: NotImplementedError is
    # raised in the worker and surfaces wrapped by Spark
    with pytest.raises(Exception, match="only binary PPM"):
        M.decode_image(blobs).collect()
    frames = M.frame_sample(blobs, n_frames=4)
    per_doc = frames.groupBy("doc_id").count().agg(F.min("count")).first()[0]
    assert per_doc == 4


def test_similarity_ivf_vs_exact(spark, emb):
    exact = SIM.cosine_topk(emb, k=5)
    approx = SIM.ivf_topk(emb, k=5, n_cells=8, nprobe=4)
    hit = approx.select("query_id", "cand_id").intersect(
        exact.select("query_id", "cand_id")
    )
    recall = hit.count() / exact.count()
    assert recall > 0.5, f"IVF recall {recall}"  # nprobe=half the cells
    # nprobe = n_cells must be exhaustive = exact
    full = SIM.ivf_topk(emb, k=5, n_cells=8, nprobe=8)
    assert (
        full.select("query_id", "cand_id")
        .exceptAll(exact.select("query_id", "cand_id"))
        .count()
        == 0
    )


def test_minhash_lsh_join_incremental(spark, dup_docs):
    """Asymmetric new-batch x corpus join: each mutated doc must hit its
    source, and corpus x corpus pairs must never appear."""
    docs, _ = dup_docs
    corpus = docs.select("doc_id", "text")
    new = corpus.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+", "qqq").alias("text"),
    )
    pairs = D.minhash_lsh_join(new, corpus, threshold=0.5).collect()
    assert len(pairs) >= corpus.count()  # every mutant finds its source
    hits = {(r.new_id, r.corpus_id) for r in pairs}
    n = corpus.count()
    for cid in [r.doc_id for r in corpus.limit(5).collect()]:
        assert (cid + 10000, cid) in hits
    # side namespaces respected: new ids only on the left, corpus on right
    assert all(r.new_id >= 10000 and r.corpus_id < 10000 for r in pairs)
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common common"),
            (3, "cherry date common"),
        ],
        "doc_id bigint, text string",
    )
    out = TA.tfidf_top_terms(df, top_m=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3}
    for rows in by_doc.values():
        assert [r.term_rank for r in sorted(rows, key=lambda r: r.term_rank)] == [1, 2]
    # doc 1: 'apple' (tf=2, df=1) must outrank the shared 'common'
    top1 = min(by_doc[1], key=lambda r: r.term_rank)
    assert top1.term == "apple" and top1.tf == 2 and top1.df_t == 1
    # 'common' appears in all 3 docs -> lowest idf
    common = [r for r in out if r.term == "common"]
    assert all(r.df_t == 3 for r in common)


def test_minhash_index_roundtrip(spark, dup_docs, tmp_path_factory):
    """Joining against a saved corpus index must equal the direct join."""
    docs, _ = dup_docs
    corpus = docs.select("doc_id", "text")
    new = corpus.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+", "qqq").alias("text"),
    )
    path = str(tmp_path_factory.mktemp("mhidx") / "corpus_index")
    D.save_minhash_index(D.build_minhash_index(corpus), path)
    idx = D.load_minhash_index(spark, path)
    direct = {
        (r.new_id, r.corpus_id, round(r.jaccard, 9))
        for r in D.minhash_lsh_join(new, corpus, threshold=0.5).collect()
    }
    via_index = {
        (r.new_id, r.corpus_id, round(r.jaccard, 9))
        for r in D.minhash_lsh_join(
            new, corpus_index=idx, threshold=0.5
        ).collect()
    }
    assert direct == via_index and len(direct) > 0


def test_curation_ops(spark):
    from kiez_spark.operators import curation as CUR

    df = spark.createDataFrame(
        [
            (1, "go to https://a.io/x and http://b.c/y now"),
            (2, "mail a.b@c.de or x@y.org"),
            (3, "plain text only"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in CUR.scrub_text(df).collect()}
    assert out[1].n_urls == 2 and "<URL>" in out[1].clean_text
    assert "https" not in out[1].clean_text
    assert out[2].n_emails == 2 and out[2].clean_text.count("<EMAIL>") == 2
    assert out[3].clean_text == "plain text only"
    assert out[3].n_urls == 0 and out[3].n_emails == 0

    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    s1 = CUR.sample_by_hash(big, 0.3, seed=1)
    s1_again = CUR.sample_by_hash(big.repartition(13), 0.3, seed=1)
    ids1 = {r.doc_id for r in s1.collect()}
    assert ids1 == {r.doc_id for r in s1_again.collect()}  # layout-invariant
    assert 0.25 < len(ids1) / 5000 < 0.35
    # complement partitions exactly; different seed gives a different set
    s2 = {r.doc_id for r in CUR.sample_by_hash(big, 0.3, seed=2).collect()}
    assert s2 != ids1
    # samples are NESTED across rates (bucket < cut is monotone in cut):
    # growing a sample never drops previously selected rows
    ids_small = {r.doc_id for r in CUR.sample_by_hash(big, 0.1, seed=1).collect()}
    assert ids_small < ids1
    with pytest.raises(ValueError):
        CUR.sample_by_hash(big, 1.5)


def test_real_ppm_decode(spark, docs):
    """The REAL decode path: synthesized binary P6 PPMs parse to the
    right dims and features; non-PPM blobs still raise; the parser
    honors netpbm comments and whitespace."""
    import numpy as np

    blobs = M.synth_ppm_blobs(docs.limit(20))
    feats = M.decode_image(blobs).collect()
    assert len(feats) == 20
    assert all(r.height == 8 and r.width == 8 for r in feats)
    assert all(abs(sum(r.feat) - 1.0) < 1e-9 for r in feats)
    # python cross-check of one blob
    raw = bytes(blobs.orderBy("doc_id").first().blob)
    w, h, gray, psum = M._parse_ppm(raw)
    got = next(r for r in feats if r.doc_id == blobs.orderBy("doc_id").first().doc_id)
    assert (w, h) == (8, 8) and abs(got.mean_px - float(np.mean(gray))) < 1e-9
    # the exact-integer pair reproduces the mean: px_sum/px_n == mean_px
    assert got.px_sum == psum and got.px_n == 8 * 8 * 3
    assert abs(got.px_sum / got.px_n - got.mean_px) < 1e-12
    # comment + wide whitespace header variant
    body = bytes(range(2 * 3 * 3)) * 1
    ppm = b"P6\n# a comment\n 3\t2 \n255\n" + body
    w2, h2, g2, psum2 = M._parse_ppm(ppm)
    assert (w2, h2) == (3, 2) and len(g2) == 6 and psum2 == sum(body)
    # non-PPM magic -> honest NotImplementedError
    with pytest.raises(NotImplementedError):
        M._parse_ppm(b"\x89PNG....")


def test_real_wav_decode(spark, docs):
    """The REAL audio path: PCM16 RIFF/WAVE round-trip — sample values
    equal the source text bytes; truncated/foreign containers raise."""
    import numpy as np

    blobs = M.synth_wav_blobs(docs.limit(20))
    out = M.decode_audio(blobs).orderBy("doc_id").collect()
    assert len(out) == 20
    assert all(
        r.sample_rate == 8000 and r.n_channels == 1 and r.n_samples == 128
        for r in out
    )
    first_doc = docs.orderBy("doc_id").first()
    padded = (first_doc.text[:128] + " " * 128)[:128].encode()
    want = np.frombuffer(padded, dtype=np.uint8).astype(np.float64)
    got = next(r for r in out if r.doc_id == first_doc.doc_id)
    assert abs(got.mean_amp - float(want.mean())) < 1e-9
    assert abs(got.rms - float(np.sqrt((want**2).mean()))) < 1e-9
    with pytest.raises(Exception):
        M.decode_audio(
            spark.createDataFrame(
                [(1, bytearray(b"OggS not a wav"))], "doc_id bigint, blob binary"
            )
        ).collect()


def test_hash_split_partitions_exactly(spark):
    """hash_split: the labels partition the corpus exactly, reproduce
    under repartitioning, and land near the requested ratios; the
    'train' rows are exactly the sample_by_hash(rate=0.8) rows (same
    hash, same cut — split nests with sampling)."""
    from kiez_spark.operators import curation as CUR

    big = spark.range(4000).select(F.col("id").alias("doc_id"))
    s = CUR.hash_split(big, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in
              s.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 4000
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["val"] / 4000 - 0.1) < 0.03
    # stable under physical layout
    s2 = CUR.hash_split(big.repartition(13), {"train": 0.8, "val": 0.1,
                                              "test": 0.1})
    assert s.exceptAll(s2).count() == 0
    # train == the 0.8 hash sample (identical bucket cut)
    train = {r.doc_id for r in s.filter("split = 'train'").collect()}
    sample = {r.doc_id for r in CUR.sample_by_hash(big, 0.8).collect()}
    assert train == sample
    with pytest.raises(ValueError):
        CUR.hash_split(big, {})
    with pytest.raises(ValueError):
        CUR.hash_split(big, {"a": -1.0, "b": 2.0})
