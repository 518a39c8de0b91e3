"""Distributed connected components — alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14).

A generic graph operator the dedup layer plugs into (the in-window
``dedup_clusters`` uses the closely-related min-contraction; this
module is the literal alternating algorithm, exposed standalone so
any pair-producing operator — near-dup candidates, entity-resolution
matches, citation links — can cluster with it).

Shape per round: two groupBy-min shuffles + two joins, each keyed on
a node id, over an edge set that contracts toward a star forest.
Rounds are O(log d) in practice; every round ends in a
``localCheckpoint`` so lineage stays flat, and convergence is ONE
fixpoint probe job per round — a symmetric-difference ``take(1)``
over the two checkpointed (hence cached, distinct, canonical) edge
sets. The star forest is a fixpoint of both star operations, proved
in the paper, so `edges unchanged` is exactly `converged`.

No driver-side state beyond the one-row convergence flag; node ids
never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One star round over a symmetric-free canonical edge list.

    large-star: every neighbor v > u re-attaches to m(u) = min of
    u's closed neighborhood; small-star: every neighbor v <= u (and
    u itself) re-attaches to the min of u's smaller-or-self
    neighborhood. Both keep (a, b) edges canonicalized as a > b.
    """
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if large:
        side = sym
    else:
        side = sym.filter(F.col("v") < F.col("u")).union(
            sym.select("u").distinct().withColumn("v", F.col("u"))
        )
    m = side.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    attach = sym.filter(F.col("v") > F.col("u")) if large else side
    out = (
        attach.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node in ``edges`` with its component's MINIMUM
    node id. Returns ``(node, component)`` — one row per distinct
    node that appears in the edge list (attach singletons yourself;
    they never need to ride the iteration).

    Numeric or otherwise totally-ordered node ids required (the
    component representative is the order minimum).
    """
    e = (
        edges.select(
            F.greatest(src, dst).alias("u"), F.least(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select("v"))
        .distinct()
        .localCheckpoint()
    )
    first = e  # shared with `nodes`' lineage — never unpersisted here
    for _ in range(max_rounds):
        after_large = _star_round(e, large=True)
        after_small = _star_round(after_large, large=False).localCheckpoint()
        # single probe job: both sets are distinct + checkpointed, so
        # the symmetric difference reads cached rows and take(1)
        # early-exits on the first witness of change
        changed = not (
            after_small.exceptAll(e)
            .unionAll(e.exceptAll(after_small))
            .isEmpty()
        )
        # the probe was the old round's last reader — release its
        # blocks (same session-lifetime leak the round-8 advisor
        # flagged in the percentile/k-center/k-core loops)
        if e is not first:
            e.unpersist()
        e = after_small
        if not changed:
            break
    # star forest: u -> root(v); roots label themselves
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(
        labels.select("node"), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    return labels.unionByName(roots)
