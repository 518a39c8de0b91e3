"""operators/graph.py — alternating large-star/small-star connected
components: union-find property tests + dedup-endgame equivalence."""

import random

from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.graph import (
    connected_components,
)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(20260814)
    for _ in range(6):
        n = rng.randint(4, 80)
        m = rng.randint(1, 120)
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        nodes = sorted({x for e in edges for x in e})
        df = spark.createDataFrame(edges, "src: long, dst: long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == _uf_components(edges, nodes)


def test_cc_chain_worst_case_diameter(spark):
    """A 200-node path: diameter-bound algorithms need ~200 rounds;
    the star family needs O(log n) — the loop must converge well
    inside max_rounds and label everything with the path's min."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert len(got) == 201
    assert set(got.values()) == {0}


def test_smallstar_dedup_equals_min_contraction(spark, duck, sf_dir):
    """The generic graph operator must reproduce dedup_clusters'
    labels exactly (same pair gen, same canonical-min contract)."""
    from global_superstore_data_warehouse_spark.plans.textops import (
        dedup_clusters,
        dedup_clusters_smallstar,
    )

    a = sorted(map(tuple, dedup_clusters(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_clusters_smallstar(spark, sf_dir).collect()))
    assert a == b


def test_cc_no_python_workers(spark):
    """The iteration is pure JVM: no Arrow/Python eval nodes."""
    edges = [(i % 7, (i * 3) % 11) for i in range(40)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df)
    plan = out._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
