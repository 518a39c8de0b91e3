"""Round-5 additions: unigram LM scoring, dedup savings report,
interval-union activity coverage — oracle parity + invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = [
    "unigram_logprob_scores",
    "dedup_savings_report",
    "user_activity_coverage",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_unigram_logprob_is_negative_and_bounded(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.textops import (
        unigram_logprob_scores,
    )

    rows = unigram_logprob_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # probabilities < 1 -> negative log-likelihood, positive bits
        assert r["avg_logprob"] < 0
        assert r["bits_per_token"] > 0
        assert r["n_tokens"] > 0


def test_dedup_savings_accounting_closes(spark, sf_dir):
    """The by-size report must tile the corpus exactly: doc and token
    totals equal the corpus totals, and removable tokens are exactly
    the non-canonical share."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.functions import text as T
    from global_superstore_data_warehouse_spark.plans.textops import (
        dedup_savings_report,
    )

    rep = dedup_savings_report(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_toks = docs.select(
        F.sum(F.size(F.filter(T.tokens("text"), lambda t: t != ""))).alias("s")
    ).collect()[0]["s"]
    assert sum(r["n_docs"] for r in rep) == n_docs
    assert sum(r["tokens_total"] for r in rep) == n_toks
    for r in rep:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert 0 <= r["tokens_removable"] <= r["tokens_total"]
    # singleton clusters remove nothing
    singles = [r for r in rep if r["cluster_size"] == 1]
    assert all(r["tokens_removable"] == 0 for r in singles)


def test_activity_coverage_invariants(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.events import (
        ACTIVE_WINDOW_S,
        user_activity_coverage,
    )

    rows = user_activity_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # union length sits between one window and events * window
        assert ACTIVE_WINDOW_S <= r["covered_s"] <= r["n_events"] * ACTIVE_WINDOW_S
        # union never exceeds the first-to-last span
        assert r["covered_s"] <= r["span_s"]
        assert r["n_islands"] >= 1
        assert 0 < r["coverage_ratio"] <= 1.0


def test_activity_coverage_matches_bruteforce_union(spark, sf_dir):
    """Independent algorithm check: the sweep-line window plan must
    equal a driver-side brute-force interval union per user."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        ACTIVE_WINDOW_S,
        user_activity_coverage,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("s")
    ).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["s"], r["s"] + ACTIVE_WINDOW_S)
        )
    expected = {}
    for u, ivs in by_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum(e - s for s, e in merged)
        expected[u] = (len(ivs), len(merged), covered)
    got = {
        r["user_id"]: (r["n_events"], r["n_islands"], r["covered_s"])
        for r in user_activity_coverage(spark, sf_dir).collect()
    }
    assert got == expected


def test_er_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "entity_resolution_customers", sf_dir)


def test_er_entities_tile_the_corpus(spark, sf_dir):
    """Entities exactly partition the customer table, clusters stay
    attribute-consistent, and the degenerate single-entity collapse
    (lone edit-distance rule on sequential names) cannot recur."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.conformance import (
        entity_resolution_customers,
    )

    rows = entity_resolution_customers(spark, sf_dir).collect()
    cust = load(spark, sf_dir, "customer")
    n = cust.count()
    assert sum(r["n_members"] for r in rows) == n
    assert len(rows) > n // 2, "match rule collapsed into giant chains"
    assert max(r["n_members"] for r in rows) <= 10


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_unigram_scores_vocab_rides_broadcast(spark, sf_dir):
    """The unigram 'model' (vocab counts) must broadcast back onto
    the exploded tokens and the scalar total must be a 1-row
    broadcast — the only corpus-sized Exchange is the per-doc
    aggregate's."""
    from global_superstore_data_warehouse_spark.plans.textops import (
        unigram_logprob_scores,
    )

    plan = _plan(unigram_logprob_scores(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the deliberate 1-row total
    assert "CartesianProduct" not in plan


def test_activity_coverage_single_exchange(spark, sf_dir):
    """Sweep-line plan: windows and both aggregates share ONE
    hashpartitioning exchange on user_id (plus AQE readers) — no
    join of any kind."""
    from global_superstore_data_warehouse_spark.plans.events import (
        user_activity_coverage,
    )

    import re

    plan = _plan(user_activity_coverage(spark, sf_dir))
    assert "Join" not in plan
    # formatted mode prints each node once in the tree and once in
    # the detail block — count detail headers
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan[:2000]


def test_skyline_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "part_skyline", sf_dir)


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    """No skyline member dominates another, and every non-member is
    dominated by some skyline member (2-D completeness)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.retail import part_skyline

    sky = [
        (r["p_retailprice"], r["p_size"])
        for r in part_skyline(spark, sf_dir).collect()
    ]
    assert sky

    def dominates(q, p):
        return q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])

    for p in sky:
        assert not any(dominates(q, p) for q in sky if q != p)
    allp = [
        (float(r["p_retailprice"]), r["p_size"])
        for r in load(spark, sf_dir, "part")
        .select(F.round("p_retailprice", 2).alias("p_retailprice"), "p_size")
        .collect()
    ]
    skyset = set(sky)
    for p in allp:
        if p not in skyset:
            assert any(dominates(q, p) for q in sky)


def test_activity_coverage_equals_catalyst_session_window(spark, sf_dir):
    """Cross-implementation check: the sweep-line islands are exactly
    Catalyst's session_window(gap=ACTIVE_WINDOW_S) sessions — same
    island count and same covered seconds (session window spans
    [min_ts, last_ts + gap))."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        ACTIVE_WINDOW_S,
        user_activity_coverage,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_timestamp(F.col("ts").cast("long")).alias("ts")
    )
    sw = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{ACTIVE_WINDOW_S} seconds")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(
                F.col("session_window.end").cast("long")
                - F.col("session_window.start").cast("long")
            ).alias("covered_s"),
        )
    )
    want = {r["user_id"]: (r["n_islands"], r["covered_s"]) for r in sw.collect()}
    got = {
        r["user_id"]: (r["n_islands"], r["covered_s"])
        for r in user_activity_coverage(spark, sf_dir).collect()
    }
    assert got == want


def test_cluster_balanced_sample_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "cluster_balanced_sample", sf_dir)


def test_cluster_balanced_sample_caps_every_cluster(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.embeddings import (
        CLUSTER_SAMPLE_QUOTA,
        cluster_balanced_sample,
        kmeans_assign,
    )

    sample = cluster_balanced_sample(spark, sf_dir)
    per_cluster = {
        r["cluster_id"]: r["n"]
        for r in sample.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_cluster
    assert all(n <= CLUSTER_SAMPLE_QUOTA for n in per_cluster.values())
    # under-quota clusters survive whole
    full = {
        r["cluster_id"]: r["n"]
        for r in kmeans_assign(spark, sf_dir)
        .groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for cid, n in full.items():
        assert per_cluster.get(cid, 0) == min(n, CLUSTER_SAMPLE_QUOTA)


def test_bigram_surprisal_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "bigram_surprisal_scores", sf_dir)


def test_bigram_surprisal_detects_scrambling_better_than_unigram(spark, sf_dir):
    """The reason the bigram gate exists: bigram surprisal is
    strictly more informative than unigram on word order. Sanity:
    every doc's conditional bits/token <= its unigram bits/token
    (conditioning can't raise entropy under MLE on the same corpus
    is not a theorem per-doc, so assert the corpus-level mean)."""
    from global_superstore_data_warehouse_spark.plans.textops import (
        bigram_surprisal_scores,
        unigram_logprob_scores,
    )

    bg = bigram_surprisal_scores(spark, sf_dir).agg(
        F.avg("bits_per_token").alias("b")
    ).collect()[0]["b"]
    ug = unigram_logprob_scores(spark, sf_dir).agg(
        F.avg("bits_per_token").alias("b")
    ).collect()[0]["b"]
    assert bg > 0 and ug > 0
    assert bg < ug, (bg, ug)  # conditioning reduces mean surprisal


def test_sketch_rollup_within_hll_tolerance(spark, sf_dir):
    """Each daily estimate and every cumulative union estimate sit
    within HLL tolerance of the exact distinct counts; the final
    cumulative equals (approximately) the global distinct users."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        daily_user_sketch_rollup,
    )

    rows = daily_user_sketch_rollup(spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    ).collect()
    seen_by_day, all_seen = {}, set()
    days = sorted({r["day"] for r in ev})
    per_day = {d: set() for d in days}
    for r in ev:
        per_day[r["day"]].add(r["user_id"])
    cum = set()
    exact_daily, exact_cum = {}, {}
    for d in days:
        cum |= per_day[d]
        exact_daily[str(d)] = len(per_day[d])
        exact_cum[str(d)] = len(cum)
    TOL = 0.15  # default lgConfigK=12 -> ~1.6% rsd; wide margin
    for r in rows:
        ed, ec = exact_daily[r["day"]], exact_cum[r["day"]]
        assert abs(r["daily_users_est"] - ed) <= max(3, TOL * ed), (r, ed)
        assert abs(r["cumulative_users_est"] - ec) <= max(3, TOL * ec), (r, ec)
    # cumulative is monotone non-decreasing
    ests = [r["cumulative_users_est"] for r in rows]
    assert ests == sorted(ests)


def test_bfs_layers_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "copurchase_bfs_layers", sf_dir)


def test_bfs_layers_are_shortest_distances(spark, sf_dir):
    """Independent check: hop_dist equals true shortest-path distance
    (capped at BFS_HOPS) computed by a driver-side BFS."""
    from collections import deque

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.linkrank import (
        BFS_HOPS,
        _copurchase_edges,
        copurchase_bfs_layers,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r["src"], set()).add(r["dst"])
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= BFS_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {
        r["l_partkey"]: r["hop_dist"]
        for r in copurchase_bfs_layers(spark, sf_dir).collect()
    }
    assert set(got) == set(adj)
    for node in adj:
        assert got[node] == dist.get(node, -1), node


def test_ewma_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "daily_revenue_ewma", sf_dir)


def test_ewma_recursion_matches_python_fold(spark, sf_dir):
    """Independent check: the Catalyst array fold equals the plain
    Python recurrence on the same series."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        daily_revenue_ewma,
    )

    rows = sorted(
        daily_revenue_ewma(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows
    acc = rows[0]["revenue"]
    assert abs(rows[0]["ewma"] - round(acc, 6)) < 1e-9
    for r in rows[1:]:
        acc = 0.3 * r["revenue"] + 0.7 * acc
        assert abs(r["ewma"] - round(acc, 6)) < 1e-6, r["day"]


def test_benford_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "benford_order_totals", sf_dir)


def test_benford_shares_form_distribution(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.observability import (
        benford_order_totals,
    )

    rows = benford_order_totals(spark, sf_dir).collect()
    digits = sorted(r["digit"] for r in rows)
    assert digits == list(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["chi2_term"] >= 0


def test_allocation_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "market_budget_allocation", sf_dir)


def test_allocation_sums_exactly_to_budget(spark, sf_dir):
    """The whole point of largest-remainder: every year's integer
    allocations sum to the budget EXACTLY, and each cell sits within
    1 cent of its proportional share."""
    from global_superstore_data_warehouse_spark.plans.retail import (
        ALLOC_BUDGET_CENTS,
        market_budget_allocation,
    )

    rows = market_budget_allocation(spark, sf_dir).collect()
    by_year = {}
    for r in rows:
        by_year.setdefault(r["order_year"], []).append(r)
    assert by_year
    for year, cells in by_year.items():
        assert sum(c["alloc_cents"] for c in cells) == ALLOC_BUDGET_CENTS, year
        total_rev = sum(c["revenue"] for c in cells)
        for c in cells:
            exact = c["revenue"] / total_rev * ALLOC_BUDGET_CENTS
            assert abs(c["alloc_cents"] - exact) < 1.0 + 1e-6, (year, c)


def test_split_leakage_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "split_near_dup_leakage", sf_dir)


def test_split_leakage_report_accounts_for_all_candidates(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        split_near_dup_leakage,
    )
    from global_superstore_data_warehouse_spark.plans.textops import (
        minhash_lsh_candidates,
    )

    rows = split_near_dup_leakage(spark, sf_dir).collect()
    n_cand = minhash_lsh_candidates(spark, sf_dir).count()
    assert sum(r["n_near_dup_pairs"] for r in rows) == n_cand
    for r in rows:
        assert r["crosses_boundary"] == (r["split_lo"] != r["split_hi"])
