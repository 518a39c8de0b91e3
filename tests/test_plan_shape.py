"""Physical-plan shape assertions — the scale contract, enforced.

These tests pin the plan properties that make the engine viable at
100 TB: dimension lookups broadcast, scans are column-pruned, no
accidental cartesian products, aggregations are partial (map-side)
before the final shuffle.
"""

import re

from pyspark.sql import DataFrame

from global_superstore_data_warehouse_spark import registry


def _plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _q(spark, sf_dir, name) -> str:
    return _plan(registry.queries()[name](spark, sf_dir))


def test_star_views_broadcast_dims_no_cartesian(spark, sf_dir):
    for name in ["yearly_sales_profit", "sales_employees_regions", "order_details_wide"]:
        plan = _q(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        # the only nested-loop allowed is the deliberate 1-row
        # min-date broadcast (join type Cross); any Inner/Outer BNLJ
        # means a dim lookup degenerated
        bad_bnlj = [
            line
            for line in plan.splitlines()
            if "BroadcastNestedLoopJoin" in line
            and ("+-" in line or ":-" in line)  # tree lines carry the join type
            and "Cross" not in line
        ]
        assert not bad_bnlj, (name, bad_bnlj)


def test_lineitem_scan_is_column_pruned(spark, sf_dir):
    """yearly_sales_profit needs 5 of lineitem's 16 columns; the
    parquet ReadSchema must not contain the unused ones."""
    plan = _q(spark, sf_dir, "yearly_sales_profit")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li, "lineitem scan not found"
    assert "l_comment" not in li[0] and "l_shipdate" not in li[0]


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Single-scan wide agg: exactly one shuffle for the final
    aggregate (plus the presentation sort), partial HashAggregate
    before it."""
    plan = _q(spark, sf_dir, "pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final
    # no join anywhere in a single-table aggregation
    assert "Join" not in plan


def test_fact_orders_no_nested_loop(spark, sf_dir):
    plan = _q(spark, sf_dir, "fact_orders")
    bad_bnlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
        and ("+-" in line or ":-" in line)
        and "Cross" not in line  # 1-row min-date broadcast is deliberate
    ]
    assert not bad_bnlj, bad_bnlj
    assert "CartesianProduct" not in plan


def test_minhash_candidate_join_carries_narrow_rows(spark, sf_dir):
    """The class-collapsed band self-join must not shuffle token
    arrays — its join inputs carry only (cls, rep, band0, band1)."""
    plan = _q(spark, sf_dir, "minhash_lsh_candidates")
    # every operator output that carries the band columns (the
    # candidate-join inputs) must not also carry token arrays
    banded_outputs = [
        line for line in plan.splitlines() if "Output" in line and "band0" in line
    ]
    assert banded_outputs
    assert all("toks" not in line for line in banded_outputs), banded_outputs


def test_ngram_block_join_carries_narrow_rows(spark, sf_dir):
    """The 0.3-family bucket self-join (lang, len_b, band_id, bucket)
    must not shuffle token or shingle arrays, and the 8-seed
    signature feeding it must come from a materialized checkpoint
    (Scan ExistingRDD), not a recomputed lineage per join side."""
    plan = _q(spark, sf_dir, "ngram_jaccard_pairs")
    banded_lines = [line for line in plan.splitlines() if "band_id" in line]
    assert banded_lines
    assert all(
        "toks" not in line and "sh3" not in line for line in banded_lines
    ), banded_lines
    assert "ExistingRDD" in plan


def test_deterministic_sample_is_pure_filter(spark, sf_dir):
    """Sampling must add no shuffle — scan + filter + project only."""
    plan = _q(spark, sf_dir, "deterministic_sample")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_assignment_is_shuffle_free(spark, sf_dir):
    """IVF centroid assignment must be a folded expression over a
    1-row broadcast — no Exchange between the corpus scan and the
    list-id projection (the only shuffles allowed are the candidate
    join + rank windows downstream)."""
    plan = _q(spark, sf_dir, "ann_ivf_topk")
    lines = plan.splitlines()
    # the 1-row centroid attach is a broadcast cross join
    assert any("BroadcastNestedLoopJoin Cross" in l for l in lines)
    # the candidate join streams the corpus directly from its
    # assignment Project — a shuffle Exchange there would mean the
    # folded argmax degenerated into a repartition
    for i, l in enumerate(lines):
        if "BroadcastHashJoin Inner" in l and ("+-" in l or ":-" in l):
            child = lines[i + 1]
            assert "Exchange" not in child, (l, child)


def test_overlap_join_is_hash_not_nested_loop(spark, sf_dir):
    """The interval x interval overlap must plan its candidate stage
    as a HASH join on the bucket (the equi-conjunct) — a
    BroadcastNestedLoopJoin Inner would mean the bucket equality got
    lost and the plan degenerated to the quadratic inequality join."""
    plan = _q(spark, sf_dir, "session_maintenance_overlap")
    assert "CartesianProduct" not in plan
    bad_bnlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
        and ("+-" in line or ":-" in line)
        and "Cross" not in line
    ]
    assert not bad_bnlj, bad_bnlj
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_pagerank_rounds_no_cartesian(spark, sf_dir):
    """Every PageRank round joins ranks to the checkpointed edge
    list on the node key — hash/sort-merge only, and the edge list
    comes from a materialized checkpoint (no basket self-join
    recompute per round)."""
    plan = _q(spark, sf_dir, "part_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan  # the checkpointed edges/ranks


def test_semantic_dedup_pairs_only_intra_cluster(spark, sf_dir):
    """The pair join must key on list_id (hash join over the
    checkpointed assignment) — the only BNLJ allowed is the 1-row
    centroid broadcast (Cross)."""
    plan = _q(spark, sf_dir, "semantic_dedup")
    assert "CartesianProduct" not in plan
    bad_bnlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
        and ("+-" in line or ":-" in line)
        and "Cross" not in line
    ]
    assert not bad_bnlj, bad_bnlj
    assert "ExistingRDD" in plan  # checkpointed assigned corpus


def test_bpe_pair_count_is_single_shuffle(spark, sf_dir):
    """Bigram generation must stay in the row (zip_with projection):
    one Exchange total — the pair-count aggregate — plus the global
    rank's single-partition exchange over the aggregated frame."""
    plan = _q(spark, sf_dir, "bpe_pair_counts")
    assert "Join" not in plan
    # partial + final aggregate around the one pair-count shuffle
    assert plan.count("HashAggregate") >= 2


def test_gapfill_spine_joins_hash(spark, sf_dir):
    plan = _q(spark, sf_dir, "events_gapfill")
    assert "CartesianProduct" not in plan
    # the bounds attach is the deliberate 1-row broadcast cross; the
    # spine-to-hourly attach must be a hash join
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_weighted_sample_uses_take_ordered(spark, sf_dir):
    """The corpus-level top-K must plan as TakeOrderedAndProject
    (per-partition heaps), never a global single-partition window
    over the full corpus."""
    plan = _q(spark, sf_dir, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in plan


def test_cube_is_single_expand_aggregation(spark, sf_dir):
    """CUBE must plan as ONE Expand feeding partial+final aggregates
    — no join, no repeated scans."""
    plan = _q(spark, sf_dir, "sales_cube")
    assert plan.count("Expand") >= 1
    assert "Join" not in plan
    # formatted explain prints each scan twice (tree + detail block);
    # detail blocks carry exactly one Location line per distinct scan
    assert plan.count("Location:") == 1


def test_triangle_joins_are_hash(spark, sf_dir):
    plan = _q(spark, sf_dir, "copurchase_triangles")
    assert "CartesianProduct" not in plan
    bad_bnlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
        and ("+-" in line or ":-" in line)
        and "Cross" not in line  # the 1-row summary attach is deliberate
    ]
    assert not bad_bnlj, bad_bnlj
    assert "ExistingRDD" in plan  # checkpointed edge list


def test_lateness_single_event_shuffle(spark, sf_dir):
    """The running-max window is the only pass over raw events: one
    scan, no join."""
    plan = _q(spark, sf_dir, "lateness_profile")
    assert "Join" not in plan
    assert plan.count("Location:") == 1


def test_schema_evolution_no_shuffle_union(spark, sf_dir):
    """unionByName of the two projections must not shuffle before
    the final fill-rate aggregate (Union + partial agg only)."""
    plan = _q(spark, sf_dir, "schema_evolution_union")
    assert "Join" not in plan
    assert "Union" in plan


def test_round6_sketch_and_ann_plans(spark, sf_dir):
    """Round-6 additions keep the scale contract: the count-min probe
    join and the int8 rerank candidate scan broadcast their small
    side; the join-size estimator joins two fixed-size grids (never
    the raw keys); the expectations suite is ONE scan of orders for
    all row-local checks plus a key-only anti-join."""
    plan = _q(spark, sf_dir, "countmin_heavy_hitters")
    assert "BroadcastHashJoin" in plan  # tiny merged grid broadcasts
    assert "CartesianProduct" not in plan

    plan = _q(spark, sf_dir, "ann_int8_rerank")
    # 5-row quantized query set rides a broadcast; the corpus scan is
    # the stream side — never a shuffled pair materialization
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan

    plan = _q(spark, sf_dir, "join_size_estimate")
    assert "CartesianProduct" not in plan
    # the estimate never touches a row wider than (i, cell, c): no
    # orders x lineitem join appears anywhere in the plan
    assert "o_totalprice" not in plan

    plan = _q(spark, sf_dir, "expectations_report")
    # one scan computes every row-local check: orders parquet is read
    # at most twice (agg pass + key-only anti-join), not per-check
    assert len(re.findall(r"orders\.parquet", plan)) <= 2


def test_tpch_avg_yearly_broadcasts_the_part_slice(spark, sf_dir):
    """The Q17 decorrelation contract: the selected-part slice must
    reach lineitem as a broadcast (pruning BEFORE the stats pass),
    and the stats join-back must be a hash join, never nested-loop."""
    plan = _q(spark, sf_dir, "tpch_avg_yearly")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") >= 2  # lineitem + part only


def test_consistent_shard_rebalance_is_scan_plus_tiny_agg(spark, sf_dir):
    """Both ring assignments are pure projections: no join operator
    of any kind may appear — one scan, one aggregate."""
    plan = _q(spark, sf_dir, "consistent_shard_rebalance")
    for op in ("Join", "CartesianProduct", "Window"):
        assert op not in plan, op
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_kmv_overlap_has_no_per_day_rank_window(spark, sf_dir):
    """The sketch build must be the salted two-level k-min — a rank
    window partitioned by day alone would single-reduce each day at
    100 TB."""
    plan = _q(spark, sf_dir, "kmv_audience_overlap")
    assert "row_number" not in plan.lower()
    assert "BroadcastHashJoin" in plan  # the tiny day-pair join


def test_sorted_neighborhood_joins_on_rank_equality(spark, sf_dir):
    """The window realizes as explode + rank equi-join (hash join on
    rn), never a range/nested-loop pair generator."""
    plan = _q(spark, sf_dir, "sorted_neighborhood_pairs")
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "explode" in plan
    bad_bnlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line and "Cross" not in line
    ]
    assert not bad_bnlj, bad_bnlj


def test_bootstrap_ci_is_one_scan_partial_agg(spark, sf_dir):
    """The Poisson bootstrap must partial-aggregate the exploded scan
    map-side (HashAggregate before the exchange) and shuffle only B
    groups; the CI rank window runs over B rows."""
    plan = _q(spark, sf_dir, "bootstrap_revenue_ci")
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan
    # orders parquet is read for the bootstrap and the point estimate
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_stats_gated_views_never_shuffle_lineitem(spark, sf_dir):
    """Round-9 contract: the orders side of the flagship views rides
    a statistics-driven broadcast hint (catalog.table_rows -> 
    hints.stats_gated) below the gate, so the lineitem probe side is
    NEVER hash-partitioned for the join — AQE's late SMJ->BHJ
    conversion would still have written lineitem's shuffle map
    stage. Above the gate the hint drops and the shuffle join is the
    intended plan (pinned in test_hints by lowering the gate)."""
    for name in [
        "yearly_sales_profit",
        "demand_category_region",
        "seasonality_segment",
        "order_details_wide",
    ]:
        plan = _q(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        # the only allowed hash-partitioning exchanges are the
        # aggregation/sort ones on the (tiny) grouped output — never
        # on a lineitem join key
        bad = [
            line
            for line in plan.splitlines()
            if "hashpartitioning(l_orderkey" in line
        ]
        assert not bad, (name, bad)


def test_stats_gate_covers_every_lineitem_orders_site(spark, sf_dir):
    """Round-10 closure of the stats-gate ledger: the four previously
    ungated lineitem ⋈ orders sites (price_volume_mix,
    fulfillment_lead_time, abc_migration, and fact_orders' ord_keyed
    — which its own DM twin already gated) now ride the same
    catalog-statistics broadcast. Below the gate lineitem is never
    hash-partitioned on the join key."""
    for name in ["price_volume_mix", "fulfillment_lead_time", "abc_migration"]:
        plan = _q(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        bad = [
            line
            for line in plan.splitlines()
            if "hashpartitioning(l_orderkey" in line
        ]
        assert not bad, (name, bad)
    # fact_orders: the grain-dedup window legitimately shuffles
    # lineitem ONCE on (l_orderkey, l_linenumber); the gate removes
    # the join's SECOND lineitem exchange — so the only allowed
    # l_orderkey hash-partitioning is the composite window one
    plan = _q(spark, sf_dir, "fact_orders")
    assert "BroadcastHashJoin" in plan
    join_exchanges = [
        line
        for line in plan.splitlines()
        if "hashpartitioning(l_orderkey" in line
        and "l_linenumber" not in line
    ]
    assert not join_exchanges, join_exchanges
    window_exchanges = [
        line
        for line in plan.splitlines()
        if "hashpartitioning(l_orderkey" in line and "l_linenumber" in line
    ]
    assert window_exchanges, "grain-dedup window exchange missing"


def test_catalog_table_rows_matches_scan_counts(spark, sf_dir):
    """Footer statistics must equal the true row counts — they gate
    join strategy, so a drift here silently flips plans."""
    from global_superstore_data_warehouse_spark.catalog import load, table_rows

    for t in ["orders", "nation", "region", "customer"]:
        assert table_rows(sf_dir, t) == load(spark, sf_dir, t).count(), t
