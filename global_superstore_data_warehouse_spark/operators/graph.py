"""Distributed connected components — alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14).

A generic graph operator the dedup layer plugs into (the in-window
``dedup_clusters`` uses the closely-related min-contraction; this
module is the literal alternating algorithm, exposed standalone so
any pair-producing operator — near-dup candidates, entity-resolution
matches, citation links — can cluster with it).

Shape per round (round-14 rewrite; the algorithm is unchanged, the
physical plan is not): the edge list stays CANONICAL (u > v) across
rounds, which makes both star operations expressible without
re-deriving the symmetric view twice per star —

- large-star re-attaches exactly the REVERSED canonical rows to
  m(u) = min of u's closed neighborhood (one groupBy + one join);
- small-star's smaller-or-self neighborhood IS the canonical edge
  list itself, with the self rows recovered from the min-map
  directly (``least(min(v), u)`` already folds u in) instead of the
  old ``sym.select(u).distinct()`` union branch — one whole
  exchange per round gone;
- only the small-star round deduplicates: min-aggregation is
  duplicate-insensitive, so large-star's output can skip its
  ``distinct`` (a second exchange gone) and let the small round's
  final ``distinct`` clean up;
- the min-map m is NODE-sized, so both join sides ride a size-gated
  ``maybe_broadcast`` (gated on the initial node count, a one-time
  scalar off the checkpointed node frame — node ids never leave the
  original id set, so the initial count bounds every round). Below
  the gate each round's joins are broadcast-hash and the UNIQUE
  shuffle exchanges left are the two min-map groupBy aggregations
  plus the final distinct (7 -> 3 per round; the min-map subplan
  appears in several branches of the static plan but AQE's runtime
  stage cache executes it once — verified at sf0.01: 12 stages
  planned, 7 ran for one round body). Past the gate (billions of
  nodes) the hint drops itself and the same plan runs as ordinary
  shuffle joins — the standard alternating-star shape.

Rounds are O(log d) in practice; every round ends in a
``localCheckpoint`` so lineage stays flat, and convergence is ONE
fixpoint probe job per round — a symmetric-difference ``take(1)``
over the two checkpointed (hence cached, distinct, canonical) edge
sets. The star forest is a fixpoint of both star operations, proved
in the paper, so `edges unchanged` is exactly `converged`.

No driver-side state beyond the one-row convergence flag and the
node-count broadcast gate; node ids never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.debugplan import dump_plan
from global_superstore_data_warehouse_spark.operators.hints import maybe_broadcast


def _star_round(edges: DataFrame, large: bool, n_nodes: int) -> DataFrame:
    """One star round over a CANONICAL (u > v) edge list that may
    carry duplicates. Output is canonical; only the small round
    deduplicates (see module docstring).

    large-star: every neighbor v > u re-attaches to m(u) = min of
    u's closed neighborhood; small-star: every neighbor v <= u (and
    u itself) re-attaches to the min of u's smaller-or-self
    neighborhood. ``n_nodes`` (the initial node count — an upper
    bound on any round's node set) gates the broadcast of the
    node-sized min-map.
    """
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    if large:
        # closed-neighborhood min needs BOTH directions; duplicates
        # in `edges` are harmless under min
        sym = edges.union(rev)
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # canonical form: the v > u attach rows are exactly `rev`;
        # m(u) <= u < v, so the output is canonical and never a
        # self-loop — no filter, no distinct needed here
        return rev.join(maybe_broadcast(m, n_rows=n_nodes), "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    # small-star: the smaller-neighbor rows ARE the canonical edge
    # list; least(min(v), u) folds the self row into the min, and the
    # self ATTACH rows come straight off the min-map (u -> m(u)) —
    # no sym rebuild, no distinct-u union branch
    m = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        edges.join(maybe_broadcast(m, n_rows=n_nodes), "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select("u", F.col("m").alias("v")))
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
    # one scalar off the cached node frame: every round's node set is
    # a subset of the original ids, so this count is a sound upper
    # bound for the per-round broadcast gates (conservative past the
    # gate: at billions of nodes the hints drop and the same plan
    # runs the shuffle-join star rounds)
    n_nodes = nodes.count()
    first = e  # shared with `nodes`' lineage — never unpersisted here
    for rnd in range(max_rounds):
        after_large = _star_round(e, large=True, n_nodes=n_nodes)
        round_body = _star_round(after_large, large=False, n_nodes=n_nodes)
        if rnd == 0:
            # evidence hook (no-op unless SPARK_GRAFT_PLAN_DIR set):
            # the final explain is post-checkpoint, so the per-round
            # join strategy is captured here
            dump_plan(round_body, "star_cc_round_body")
        after_small = round_body.localCheckpoint()
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
