"""The scale path end-to-end: LSH-blocked candidate generation through
the full linkage pipeline must still reach pairwise F1 >= 0.99."""

from kiez_spark import synth
from kiez_spark.linkage import link_files
from kiez_spark.operators import evaluate as E


def test_linkage_f1_lsh_tier(spark):
    files = synth.repos_files(spark, n=400, cluster_size=4, dup_fraction=0.6)
    res = link_files(
        spark, files, dim=32, k=5, n_candidates=10,
        hubness="csls", tier="lsh", max_dist=12.0,
        lsh_tables=12, lsh_bits=6, lsh_bucket_width=32.0,
    )
    row = E.pairwise_f1(
        E.clusters_to_pairs(res.clusters), synth.gold_pairs(files),
        pred_cols=("u", "v"),
    ).first()
    assert row.f1 >= 0.99, f"LSH-tier pairwise F1 {row.f1} < 0.99"


def test_resolver_lsh_euclidean_auto_calibration(spark):
    """An ANN backend name + euclidean metric through the resolver must
    WORK out of the box: bucket width auto-calibrates from the data
    (2 x median sample distance) and the bucketed family gets shallow
    ANDs (12 tables x 6 bits). Before auto-calibration the fixed W=2.0
    default produced ZERO candidates on this corpus — every approximate
    query silently returned empty."""
    from kiez_spark import synth
    from kiez_spark.resolver import make_engine

    files = synth.repos_files(spark, n=600)
    emb = synth.derive_embeddings(files).select("id", "vec").localCheckpoint()
    ann = make_engine("annoy", "csls", n_candidates=10, k=5,
                      metric="euclidean")
    ann.fit(emb)
    approx = ann.kneighbors(5).select("query_id", "cand_id")
    exact_eng = make_engine("faiss", "csls", n_candidates=10, k=5,
                            metric="euclidean")
    exact_eng.fit(emb)
    exact = exact_eng.kneighbors(5).select("query_id", "cand_id")
    assert approx.count() == 600 * 5  # full result set, no silent loss
    recall = approx.intersect(exact).count() / exact.count()
    assert recall >= 0.65, f"auto-calibrated euclidean LSH recall {recall:.3f}"
