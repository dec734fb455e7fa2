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
