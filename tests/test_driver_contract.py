"""Driver-contract tests: the surfaces the harness consumes —
__spark_entry__'s three functions and bench.py's single JSON line —
must keep their exact shape."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_contract():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 70
    # every oracle key names a registered query; callables are callable
    assert set(oracles) <= set(qs)
    for fn in qs.values():
        assert callable(fn)
    # oracle values are non-empty SQL strings
    for sql in oracles.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_bench_emits_one_json_line(tmp_path):
    # redirect the detail file: without this, every suite run would
    # overwrite the committed sf0.1 BENCH_DETAIL.json grading artifact
    # with this subprocess's sf0.001 output
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_BENCH_DETAIL=detail_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payloads = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(payloads) == 1, out.stdout
    doc = json.loads(payloads[0])
    # COMPACT stdout contract (round-8 fix): the driver parses the
    # JSON line out of a ~2000-char stdout tail, so the line carries
    # only the headline timings + an extras SUMMARY; full per-extra
    # detail goes to BENCH_DETAIL.json. Round 7's full line overgrew
    # the tail and was recorded unparsed — pin the budget here.
    assert set(doc) == {
        "metric", "value", "value_normalized", "unit", "queries",
        "extras", "canary", "sf",
    }
    assert len(payloads[0]) <= 1800
    assert doc["unit"] == "sec" and doc["sf"] == 0.001
    assert doc["value"] >= 0 and doc["queries"]
    # host-speed canary: frozen CPU loop + frozen Spark probe, so the
    # judge can normalize the headline total against machine drift
    canary = doc["canary"]
    assert canary["cpu_s"] > 0 and canary["spark_probe_s"] > 0
    assert canary["cpu_s_max"] >= canary["cpu_s"]
    assert doc["extras"]["detail"] == detail_path
    assert doc["extras"]["n"] >= 60 and doc["extras"]["total"] > 0
    # the detail file holds the full maps the compact line summarizes
    with open(detail_path) as f:
        detail = json.load(f)
    assert set(detail) == {
        "metric", "value", "value_normalized", "unit", "queries",
        "extra_queries", "extra_passes", "inherent_cost", "canary", "sf",
        "extras_budget_skipped", "headline_max_concurrency",
    }
    # round-14 scaling legibility: every headline timing reports the
    # max concurrently-active tasks the sampler observed (>= 0; 0 =
    # the query ran below the sampling horizon, i.e. fixed-cost-bound)
    conc = detail["headline_max_concurrency"]
    assert set(conc) == set(detail["queries"])
    assert all(isinstance(v, int) and v >= 0 for v in conc.values())
    # no silent caps: budget-skipped extras are named in the detail
    # file and counted on the compact line, disjoint from the timed
    skipped = detail["extras_budget_skipped"]
    assert doc["extras"]["skipped"] == len(skipped)
    assert not set(skipped) & set(detail["extra_queries"])
    assert detail["value"] == doc["value"]
    # canary-normalized headline (round-12): raw value rescaled to the
    # frozen reference host; present and consistent in both artifacts
    assert doc["value_normalized"] == detail["value_normalized"]
    assert doc["value_normalized"] > 0
    # every inherent-cost annotation points at a timed extra
    assert set(detail["inherent_cost"]) <= set(detail["extra_queries"])
    assert detail["queries"] == doc["queries"]
    assert len(detail["extra_queries"]) == doc["extras"]["n"]
    # every timed extra reports how many passes its minimum came from
    assert set(detail["extra_passes"]) == set(detail["extra_queries"])
    assert all(1 <= n <= 3 for n in detail["extra_passes"].values())
    # round-10 guarantee, derived from the graded metric itself:
    # bench.py's closing loop re-runs any min-of-1 entry that reaches
    # the final top-10 BY MIN until fixed point, so the graded
    # slowest-10 deltas are always min-of-2 — on any host, gated or not
    slowest10 = sorted(
        detail["extra_queries"], key=lambda n: -detail["extra_queries"][n]
    )[:10]
    assert all(detail["extra_passes"][n] >= 2 for n in slowest10), {
        n: detail["extra_passes"][n] for n in slowest10
    }


def test_correctness_window_is_the_intended_fifty():
    """The driver hashes only the FIRST 50 registered queries; pin the
    window so a refactor can't silently push a rotation target past
    it. Update this list deliberately, together with queries.py's
    rotation notes."""
    sys.path.insert(0, REPO)
    from global_superstore_data_warehouse_spark import registry
    from global_superstore_data_warehouse_spark.queries import ROUND14_WINDOW

    window = list(registry.queries())[:50]
    assert len(set(window)) == 50
    # since round 8 the window is DECLARED: registry.promote reorders
    # the registry to put ROUND14_WINDOW first, so the driver's first
    # 50 must be exactly that list, in order
    assert window == list(ROUND14_WINDOW)
    # round-14 composition: the standing changed-plan rule first —
    # every query whose PLAN changed in this optimization round
    # re-enters the very next window so the driver independently
    # oracle-verifies the edits (19: star-CC rewrite consumers,
    # singleton-pass fusions, co-purchase preamble rewrite, skew-gated
    # setsim salt, driver-thread overlap composites) — then the
    # stalest greens fill the remaining 31 slots (r08 tail + r09
    # cohort per tools/rotation_queue.py). No new registrations.
    changed_this_round = {
        "dedup_clusters_smallstar", "dedup_bcubed_agreement",
        "entity_resolution_customers", "dedup_clusters",
        "cluster_representatives", "dedup_savings_report",
        "minhash_lsh_candidates", "crossmodal_near_dup",
        "split_near_dup_leakage", "minhash_recall_eval",
        "simhash_recall_eval", "part_pagerank", "kcore_membership",
        "copurchase_bfs_layers", "copurchase_triangles",
        "clustering_coefficients", "market_basket_pairs",
        "jaccard_prefix_pairs", "superset_containment",
    }
    assert len(changed_this_round) == 19
    assert set(window[:19]) == changed_this_round
    rest = set(window) - changed_this_round
    assert len(rest) == 31  # the staleness fill (r08 tail + r09 cohort)
    # ...and every round-13 window entry rotated out this round (all
    # r13 hash-green) must stay registered — pytest parity retained
    from global_superstore_data_warehouse_spark.queries import ROUND13_WINDOW

    rotated_out = set(ROUND13_WINDOW) - set(window)
    all_names = set(registry.queries())
    assert rotated_out <= all_names, sorted(rotated_out - all_names)
    # Every round-14 window slot is oracle-backed: the two by-design
    # rows-only HLL estimates are outside this window (both freshly
    # r12), and the rotation tool keeps each estimate atomic with
    # its `_audit` twin for every future window (round-12 directive).
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    no_oracle = [n for n in window if n not in e.oracle_sql()]
    assert no_oracle == [], no_oracle


def test_bench_covers_every_registered_query():
    """Bench-coverage contract (round-12 verdict, 'What's wrong' #1):
    bench.py's EXTRA list is hand-maintained, so without this test a
    future registration could silently never get timed. Every
    registered query must be HEADLINE, EXTRA, or BENCH_EXEMPT — and
    an exemption must carry a real one-line reason."""
    sys.path.insert(0, REPO)
    import bench
    from global_superstore_data_warehouse_spark import registry

    names = set(registry.queries())
    # the hand-maintained lists must also be duplicate-free: a twice-
    # listed EXTRA entry would be re-timed every round and set() below
    # would hide it
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert len(bench.EXTRA) == len(set(bench.EXTRA)), sorted(
        n for n in set(bench.EXTRA) if bench.EXTRA.count(n) > 1
    )
    headline = set(bench.HEADLINE)
    extra = set(bench.EXTRA)
    exempt = dict(bench.BENCH_EXEMPT)
    # full coverage, no silent skips
    uncovered = names - headline - extra - set(exempt)
    assert not uncovered, sorted(uncovered)
    # the three sets are disjoint: an exempt entry that is also timed
    # (or a headline entry repeated in EXTRA) means the lists drifted
    assert not headline & extra
    assert not set(exempt) & (headline | extra), sorted(
        set(exempt) & (headline | extra)
    )
    # no dangling names: every benched/exempt name is a registered
    # query, except the declared unregistered equivalence variants
    # bench times alongside their registered twins
    unregistered_ok = {"event_transitions_pandas"}
    dangling = (headline | extra | set(exempt)) - names - unregistered_ok
    assert not dangling, sorted(dangling)
    # every exemption reason is a real sentence that cites the
    # measured single-pass cost it was decided on
    for name, reason in exempt.items():
        assert isinstance(reason, str) and len(reason) >= 30, name
        assert " s " in reason or "s;" in reason, (
            name, "reason must cite the measured sf0.1 time", reason,
        )
