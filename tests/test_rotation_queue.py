"""Unit tests for tools/rotation_queue.py's window suggestion — the
machinery that enforces the round-12 directive that a rows-only
estimate and its ``_audit`` twin enter a rotation window together or
not at all. The tool's report sections are exercised by running it
per-round; these pin the suggestion logic itself so a regression
shows up as a test failure, not a silently bad window suggestion."""

import importlib.util
import os

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "rotation_queue.py",
)
spec = importlib.util.spec_from_file_location("rotation_queue", TOOL)
rq = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rq)


def test_plain_staleness_order_oldest_first_alpha_tiebreak():
    names = ["b", "a", "c", "d"]
    green = {"a": "r05", "b": "r03", "c": "r05"}  # d never green
    suggestion, pair_of = rq.suggest_window(names, green, set(names), k=3)
    # never-green is most urgent, then oldest round, alpha within round
    assert suggestion == ["d", "b", "a"]
    assert pair_of == {}


def test_pair_staleness_is_the_older_member():
    # the estimate went green recently (rows-only row) but its audit
    # twin is stale — the UNIT must sort by the audit's older round
    # and both members must enter together, estimate first
    names = ["est", "est_audit", "x", "y", "z"]
    green = {"est": "r09", "est_audit": "r02", "x": "r01", "y": "r08", "z": "r09"}
    with_oracle = {"est_audit", "x", "y", "z"}  # est is rows-only
    suggestion, pair_of = rq.suggest_window(names, green, with_oracle, k=4)
    assert pair_of == {"est": "est_audit"}
    assert suggestion == ["x", "est", "est_audit", "y"]


def test_pair_that_does_not_fit_is_skipped_not_split():
    # k=2 with the stalest unit being a pair that fits, then another
    # pair that would overflow the last slot: the overflowing pair is
    # skipped WHOLE and a fresher single fills the window instead
    names = ["e1", "e1_audit", "e2", "e2_audit", "s"]
    green = {"e1": "r01", "e1_audit": "r01", "e2": "r02",
             "e2_audit": "r02", "s": "r09"}
    with_oracle = {"e1_audit", "e2_audit", "s"}
    suggestion, _ = rq.suggest_window(names, green, with_oracle, k=3)
    assert suggestion == ["e1", "e1_audit", "s"]
    # no estimate ever appears without its twin
    assert ("e2" in suggestion) == ("e2_audit" in suggestion)


def test_estimate_without_audit_twin_is_a_plain_unit():
    # a rows-only query with no `_audit` twin registered can't be
    # paired — it stays a single-slot unit (the weaker rows-only
    # check is all the evidence that exists for it)
    names = ["lonely", "a"]
    green = {"lonely": "r01", "a": "r05"}
    suggestion, pair_of = rq.suggest_window(names, green, {"a"}, k=2)
    assert pair_of == {}
    assert suggestion == ["lonely", "a"]


def test_round_ordering_is_numeric_not_lexicographic():
    # 'r100' must sort AFTER 'r99' (fresher), not before 'r13' — the
    # lexicographic trap once labels outgrow the two-digit padding
    names = ["fresh100", "stale9", "mid99"]
    green = {"fresh100": "r100", "stale9": "r9", "mid99": "r99"}
    suggestion, _ = rq.suggest_window(names, green, set(names), k=2)
    assert suggestion == ["stale9", "mid99"]
    assert rq._age_key("") < rq._age_key("r9") < rq._age_key("r99") \
        < rq._age_key("r100")


def test_short_suggestion_when_only_pairs_remain():
    # one single + one pair with k=2: the pair can't take the last
    # slot, so the suggestion is legitimately SHORT (1 name) — never
    # a split pair; main() warns so a maintainer can't paste a <k
    # window unnoticed
    names = ["s", "e", "e_audit"]
    green = {"s": "r01", "e": "r02", "e_audit": "r02"}
    suggestion, _ = rq.suggest_window(names, green, {"s", "e_audit"}, k=2)
    assert suggestion == ["s"]


def test_live_registry_suggestion_is_consistent():
    """On the real registry + real CORRECTNESS history the suggestion
    must be 50 names, all registered, with every rows-only estimate
    accompanied by its audit twin. The green map comes from the
    tool's own load_green so the criterion can't drift between the
    tool and this test."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from global_superstore_data_warehouse_spark import registry

    names = list(registry.queries())
    green = rq.load_green(repo)
    suggestion, pair_of = rq.suggest_window(
        names, green, set(registry.oracle_sql())
    )
    assert len(suggestion) == 50 and len(set(suggestion)) == 50
    assert set(suggestion) <= set(names)
    for est, aud in pair_of.items():
        assert (est in suggestion) == (aud in suggestion), (est, aud)
