"""Round-6 operator tests: trend regression, mergeable quantile
sketch, and the parameterized-view family's oracle parity (the
simhash/boilerplate/span-dedup additions are tested in
test_textops.py, the slicer in test_security.py, the decoder in
test_multimodal.py)."""

import pytest

from tests.conftest import assert_matches_oracle


def test_segment_revenue_trend_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "segment_revenue_trend", sf_dir)


def test_segment_revenue_trend_sane(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.observability import (
        segment_revenue_trend,
    )

    rows = segment_revenue_trend(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["n_days"] > 1
        assert 0.0 <= r["r2"] <= 1.0


def test_quantile_sketch_rollup_matches_oracle(spark, duck, sf_dir):
    """merge(per-day sketches) == direct binned quantiles — the
    mergeability invariant, by hash equality."""
    assert_matches_oracle(spark, duck, "quantile_sketch_rollup", sf_dir)


def test_quantile_sketch_percentiles_are_ordered_and_bounded(spark, sf_dir):
    """p50 <= p90 <= p99, each within one bin above the true exact
    percentile (the sketch's documented error bound)."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.observability import (
        QSKETCH_BIN,
        quantile_sketch_rollup,
    )

    out = quantile_sketch_rollup(spark, sf_dir)
    bad = out.filter(
        (F.col("p50_upper") > F.col("p90_upper"))
        | (F.col("p90_upper") > F.col("p99_upper"))
    )
    assert bad.count() == 0

    # error bound vs the sketch's own quantile definition — the exact
    # value at rank ceil(q*n) (NOT the interpolated percentile(), which
    # for even n averages ranks n/2 and n/2+1 and can sit arbitrarily
    # far above the rank element). Upper-edge estimate lands strictly
    # above that element and within one bin: true < est <= true + BIN.
    orders = load(spark, sf_dir, "orders").select(
        F.date_format(F.date_trunc("week", F.to_date("o_orderdate")),
                      "yyyy-MM-dd").alias("week"),
        "o_totalprice",
    )
    exact = orders.groupBy("week").agg(
        F.element_at(
            F.sort_array(F.collect_list("o_totalprice")),
            F.ceil(F.lit(0.5) * F.count(F.lit(1))).cast("int"),
        ).alias("true_p50")
    )
    j = out.join(exact, "week")
    viol = j.filter(
        (F.col("p50_upper") <= F.col("true_p50"))
        | (F.col("p50_upper") > F.col("true_p50") + QSKETCH_BIN)
    )
    assert viol.count() == 0


def test_countmin_heavy_hitters_matches_oracle(spark, duck, sf_dir):
    """merge(per-day grids) == direct md5 count-min grid — sketch
    mergeability by hash equality (the oracle never groups by day)."""
    assert_matches_oracle(spark, duck, "countmin_heavy_hitters", sf_dir)


def test_countmin_never_undercounts_and_is_bounded(spark, sf_dir):
    """The count-min guarantee: est >= exact always; and with
    depth=4 rows the min-of-rows estimate stays within the classic
    (e/width)*N bound for every probed heavy hitter (deterministic
    data, so the w.h.p. bound is simply checked)."""
    import math

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        CMS_WIDTH,
        countmin_heavy_hitters,
    )

    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) > 0
    n_events = load(spark, sf_dir, "events").count()
    bound = math.e / CMS_WIDTH * n_events
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_est"] == r["exact_cnt"] + r["overcount"]
        assert r["overcount"] <= bound, (r, bound)


def test_ann_int8_rerank_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "ann_int8_rerank", sf_dir)


def test_ann_int8_recall_vs_exact(spark, sf_dir):
    """int8-compressed candidate scan + top-M exact rerank recovers
    (nearly) the exact brute-force top-k: recall@k >= 0.8, and every
    returned neighbor's exact cosine matches the brute-force score
    for that pair (the rerank step is exact by construction)."""
    from global_superstore_data_warehouse_spark.plans.embeddings import (
        ann_int8_rerank,
        cosine_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in cosine_topk(spark, sf_dir).collect()
    }
    got = ann_int8_rerank(spark, sf_dir).collect()
    hits = sum(1 for r in got if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits / len(exact) >= 0.8, (hits, len(exact))
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cosine_sim"] == exact[key], (key, r["cosine_sim"], exact[key])


def test_expectations_report_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "expectations_report", sf_dir)


def test_expectations_report_can_fail(spark, sf_dir):
    """The report must be able to say FAIL: the repeat-customer-day
    grain expectation is genuinely violated by this feed, while the
    integrity checks (unique key, FK, completeness) pass."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        expectations_report,
    )

    rows = {r["expectation"]: r for r in expectations_report(spark, sf_dir).collect()}
    assert len(rows) == 7
    assert not rows["repeat_customer_day"]["passed"]
    for name in ("duplicate_orderkey", "null_custkey", "unresolved_custkey_fk"):
        assert rows[name]["passed"], name
        assert rows[name]["n_violations"] == 0


def test_join_size_estimate_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "join_size_estimate", sf_dir)


def test_join_size_estimate_never_undershoots_and_is_tight(spark, sf_dir):
    """Inner-product collisions only ADD cross terms, so the estimate
    is a guaranteed upper bound; at JS_WIDTH the expected additive
    error (|A||B|/width per row, min over rows) keeps the
    overestimate under 100% on this data."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        join_size_estimate,
    )

    r = join_size_estimate(spark, sf_dir).collect()[0]
    assert r["est_joinsize"] >= r["true_joinsize"]
    assert r["rel_overestimate"] >= 0
    assert r["rel_overestimate"] < 1.0, r


def test_daily_users_kmv_matches_oracle(spark, duck, sf_dir):
    """An APPROXIMATE algorithm hash-checked exactly: the KMV
    estimator is deterministic md5 arithmetic in both engines."""
    assert_matches_oracle(spark, duck, "daily_users_kmv", sf_dir)


def test_daily_users_kmv_accuracy(spark, sf_dir):
    """KMV error behaves like the theory says: exact when a day has
    <= k distinct users; otherwise mean relative error well inside
    ~1/sqrt(k) territory and no day wildly off."""
    from global_superstore_data_warehouse_spark.plans.events import (
        KMV_K,
        daily_users_kmv,
    )

    rows = daily_users_kmv(spark, sf_dir).collect()
    assert rows
    errs = []
    for r in rows:
        if r["exact_users"] <= KMV_K:
            assert r["kmv_users"] == r["exact_users"]
            assert r["rel_error"] == 0.0
        else:
            errs.append(r["rel_error"])
            assert r["rel_error"] < 0.8, r
    if errs:
        assert sum(errs) / len(errs) < 0.35, sum(errs) / len(errs)


def test_simhash_recall_eval_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "simhash_recall_eval", sf_dir)


def test_simhash_recall_eval_informative(spark, sf_dir):
    """The family comparison is a measurement, not a vibe: simhash
    Hamming<=3 catches most (but at larger SF not all) of the exact
    0.95-Jaccard ground truth — measured 1.0 at sf0.01, 0.871 at
    sf0.1 vs minhash-LSH's 0.996."""
    from global_superstore_data_warehouse_spark.plans.textops import (
        simhash_recall_eval,
    )

    r = simhash_recall_eval(spark, sf_dir).collect()[0]
    assert r["n_true"] > 0
    assert 0.5 < r["recall"] <= 1.0, r
