"""PageRank / FK discovery / token entropy — oracle parity +
structural invariants."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["part_pagerank", "fk_discovery", "token_entropy_by_source"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_pagerank_mass_conserved(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.linkrank import part_pagerank

    rows = part_pagerank(spark, sf_dir).collect()
    assert rows
    # no dangling nodes (bidirectional edges) -> total rank mass is
    # conserved at 1.0 every round
    total_ppm = sum(r["rank_ppm"] for r in rows)
    assert abs(total_ppm - 1e6) < 1.0
    assert all(r["rank_ppm"] > 0 for r in rows)
    assert all(r["outdeg"] >= 1 for r in rows)


def test_pagerank_favors_high_degree(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.linkrank import part_pagerank

    rows = part_pagerank(spark, sf_dir).collect()
    by_rank = sorted(rows, key=lambda r: -r["rank_ppm"])
    n = len(rows)
    top_deg = sum(r["outdeg"] for r in by_rank[: n // 4]) / (n // 4)
    bot_deg = sum(r["outdeg"] for r in by_rank[-(n // 4):]) / (n // 4)
    assert top_deg > bot_deg  # rank correlates with connectivity


def test_fk_discovery_verdicts(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.observability import fk_discovery

    rows = {r["child"]: r for r in fk_discovery(spark, sf_dir).collect()}
    # the four real FKs hold at every scale
    for child in (
        "lineitem.l_orderkey",
        "lineitem.l_partkey",
        "orders.o_custkey",
        "customer.c_nationkey",
    ):
        assert rows[child]["is_fk"] == 1, child
        assert rows[child]["containment"] == 1.0
    # the negative control is rejected
    neg = rows["orders.o_orderkey"]
    assert neg["is_fk"] == 0
    assert neg["containment"] < 1.0


def test_entropy_bounded_by_vocab(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.textops import (
        token_entropy_by_source,
    )

    rows = token_entropy_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_nats"] <= math.log(r["vocab_size"]) + 1e-9


def test_convergence_probes_fire_when_under_budgeted(spark, sf_dir, monkeypatch):
    """The round-9 runtime convergence probes must be live checks,
    not dead code: an under-budgeted hop/peel count raises instead
    of silently returning a non-fixed-point."""
    import pytest

    from global_superstore_data_warehouse_spark.plans import linkrank

    # BFS with one hop on a graph of diameter > 1: reachable nodes
    # would be mis-reported as dist=-1 — the probe must catch it
    monkeypatch.setattr(linkrank, "BFS_HOPS", 1)
    with pytest.raises(RuntimeError, match="bfs probe"):
        linkrank.copurchase_bfs_layers(spark, sf_dir).collect()
    monkeypatch.undo()

    # k-core with zero peels and an unattainable K: one probe peel
    # empties the survivor set, so the bounded result is NOT the
    # fixed point and the probe must say so
    monkeypatch.setattr(linkrank, "KCORE_ROUNDS", 0)
    monkeypatch.setattr(linkrank, "KCORE_K", 100_000)
    with pytest.raises(RuntimeError, match="kcore probe"):
        linkrank.kcore_membership(spark, sf_dir).collect()


def test_pagerank_contraction_probe_fires_and_is_live(spark, sf_dir, monkeypatch):
    """Round-10 probe rework: the contraction invariant is asserted
    on the last two ALREADY-COMPUTED iterates (no extra round). Two
    pins: (1) the raise condition itself, against synthetic iterates
    that violate the bound (a mass leak between K-1 and K); (2) the
    probe is live inside part_pagerank's execution path."""
    import pytest

    from global_superstore_data_warehouse_spark.plans import linkrank

    # (1) unit: violating iterates raise, conforming ones don't
    prev = spark.createDataFrame(
        [(1, 0.5), (2, 0.5)], ["node", "rank"]
    )
    leaked = spark.createDataFrame(
        [(1, 3.0), (2, 0.0)], ["node", "rank"]  # L1 delta = 3.0
    )
    with pytest.raises(RuntimeError, match="contraction probe"):
        linkrank._assert_contraction(prev, leaked, bound=1.0)
    linkrank._assert_contraction(prev, prev, bound=1.0)  # no raise

    # (2) integration: part_pagerank must route through the probe
    calls = []
    real = linkrank._assert_contraction

    def spy(prev_df, curr_df, bound):
        calls.append(bound)
        return real(prev_df, curr_df, bound)

    monkeypatch.setattr(linkrank, "_assert_contraction", spy)
    linkrank.part_pagerank(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    assert calls == [linkrank.DAMPING ** (linkrank.N_ITER - 1) * 2.0]
