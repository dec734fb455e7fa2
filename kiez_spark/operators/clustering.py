"""Transitive clustering: connected components via large-star/small-star.

[ext] operator (BASELINE.json north_rule) — the reference is single-node
and stops at neighbor lists; at cluster scale, matched pairs must be folded
into entity groups. Implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — public algorithm), which converges in O(log n) rounds vs
O(diameter) for naive label propagation:

  large-star: for each node u, connect every neighbor v > u to
              m = min(N(u) ∪ {u})
  small-star: orient edges to smaller ids; connect every v in
              N≤(u) ∪ {u} except m to m = min(N≤(u) ∪ {u})

Driver-side control flow Catalyst can't express (SURVEY.md §4): each round
``localCheckpoint``s to truncate lineage (mandatory — the self-join loop
otherwise compounds the plan exponentially) and convergence is detected by
an edge-set checksum (count + xor of pair hashes), two scalars per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """edges: directed pairs (u, v); treats them symmetrically."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    return (
        sym.join(nbr_min, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient toward smaller ids: u keeps neighbors v <= u
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    nbr_min = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        oriented.join(nbr_min, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(nbr_min.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
        ).alias("sig"),
    ).first()
    return int(row["cnt"]), int(row["sig"])


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    pair_cols: tuple[str, str] = ("src_id", "tgt_id"),
    max_iter: int = 25,
) -> DataFrame:
    """Cluster assignment (id, component); component = min id in component.

    pairs: edge list; nodes: optional (id) universe so isolated entities
    get singleton clusters.
    """
    # initial checkpoint is EAGER: the next round's stars consume `edges`
    # three times (sym union + join), so the upstream pair plan must be
    # cut off before that job runs. Per-round checkpoints are LAZY — the
    # checksum action right after materializes them, folding what were
    # two jobs per round (eager checkpoint, then checksum) into one.
    edges = (
        pairs.select(
            F.col(pair_cols[0]).cast("bigint").alias("u"),
            F.col(pair_cols[1]).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = None  # first round always runs; no checksum job on the input
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    # after convergence every edge points at its component root
    member = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component"))
    assign = member.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )
    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).cast("bigint").alias("id"))
        assign = (
            universe.join(assign, "id", "left")
            .select("id", F.coalesce("component", F.col("id")).alias("component"))
        )
    return assign
