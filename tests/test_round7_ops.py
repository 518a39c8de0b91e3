"""Round-7 operator tests: zone-map layout skipping evaluation and
distributed BPE merge learning."""

import pytest

from tests.conftest import assert_matches_oracle


def test_layout_skipping_eval_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "layout_skipping_eval", sf_dir)


def test_layout_skipping_is_lossless_and_zorder_covers_both(spark, sf_dir):
    """min/max pruning must never skip a matching row, and the report
    must show the layout trade it exists to show: Z-order skips on
    BOTH predicates; each single-dimension layout wins only its own
    dimension (date_sorted >= shuffled on the date predicate, and
    only zorder beats the baseline on the custkey band)."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        layout_skipping_eval,
    )

    rows = {
        (r["layout"], r["predicate"]): r
        for r in layout_skipping_eval(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    for r in rows.values():
        assert r["matched_in_skipped"] == 0, r  # pruning is lossless
        assert 0 <= r["zones_skipped"] <= r["n_zones"]
    assert (
        rows[("date_sorted", "march_1995")]["zones_skipped"]
        >= rows[("shuffled", "march_1995")]["zones_skipped"]
    )
    # strict at sf0.01+ (0.70 vs 0.00 skip_frac in the driver row);
    # at the tiny pytest fixture scale zone counts can tie, so >=
    assert (
        rows[("zorder_date_cust", "cust_band")]["zones_skipped"]
        >= rows[("shuffled", "cust_band")]["zones_skipped"]
    )
    assert (
        rows[("zorder_date_cust", "march_1995")]["zones_skipped"]
        >= rows[("shuffled", "march_1995")]["zones_skipped"]
    )


def test_bpe_learn_merges_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "bpe_learn_merges", sf_dir)


def test_bpe_merges_compose_and_freqs_never_increase(spark, sf_dir):
    """The best-pair frequency is non-increasing over rounds (a merge
    can only create pairs at most as frequent as itself, and losers
    stay losers), and merged symbols concatenate their parts."""
    from global_superstore_data_warehouse_spark.plans.textops import (
        BPE_MERGE_ROUNDS,
        bpe_learn_merges,
    )

    rows = bpe_learn_merges(spark, sf_dir).orderBy("step").collect()
    assert len(rows) == BPE_MERGE_ROUNDS
    freqs = [r["pair_freq"] for r in rows]
    assert all(f > 0 for f in freqs)
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
