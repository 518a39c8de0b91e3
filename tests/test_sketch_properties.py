"""Property-based tests (hypothesis) for the round-6 sketch/codec
operators: the WAV codec must round-trip ARBITRARY int16 payloads and
rates; the count-min grid must never undercount ANY key multiset and
must be invariant to how the stream is batched (the merge-algebra
claim, on adversarial inputs rather than the fixtures)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from global_superstore_data_warehouse_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
)

FAST = dict(max_examples=200, deadline=None)
SPARKY = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    rate=st.integers(min_value=1, max_value=192_000),
)
@settings(**FAST)
def test_wav_roundtrip_arbitrary_payloads(samples, rate):
    got_rate, got = decode_wav(encode_wav(rate, np.array(samples, dtype=np.int16)))
    assert got_rate == rate
    assert got.tolist() == samples


@given(
    keys=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    split=st.integers(min_value=1, max_value=59),
)
@settings(**SPARKY)
def test_cms_never_undercounts_and_batching_invariant(spark, keys, split):
    """For an arbitrary key multiset: (1) est >= exact for every key;
    (2) grid(all rows) == merge(grid(first part), grid(rest)) — the
    commutative-merge claim on adversarial splits, not just the
    three-chunk fixture."""
    from collections import Counter

    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.streaming.sketches import (
        cms_merge,
        cms_partial,
    )

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    grid_all = {
        (r["i"], r["cell"]): r["c"] for r in cms_partial(df).collect()
    }

    split = min(split, len(keys))
    a = spark.createDataFrame([(k,) for k in keys[:split]], "user_id long")
    b_rows = [(k,) for k in keys[split:]]
    if b_rows:
        b = spark.createDataFrame(b_rows, "user_id long")
        merged = {
            (r["i"], r["cell"]): r["c"]
            for r in cms_merge(cms_partial(a), cms_partial(b)).collect()
        }
    else:
        merged = {
            (r["i"], r["cell"]): r["c"] for r in cms_partial(a).collect()
        }
    assert merged == grid_all

    # never undercount: min over rows of the key's cell >= exact count
    from global_superstore_data_warehouse_spark.plans.events import (
        CMS_DEPTH,
        _cms_cell,
    )

    exact = Counter(keys)
    probes = spark.createDataFrame(
        [(k,) for k in exact], "user_id long"
    ).select(
        "user_id",
        *[_cms_cell(i, F.col("user_id")).alias(f"cell{i}") for i in range(CMS_DEPTH)],
    )
    for r in probes.collect():
        est = min(grid_all.get((i, r[f"cell{i}"]), 0) for i in range(CMS_DEPTH))
        assert est >= exact[r["user_id"]], (r["user_id"], est, exact[r["user_id"]])


def test_daily_user_sketch_rollup_audit_matches_oracle(spark, duck, sf_dir):
    """The audit twin (round 11) turns the registry's only rows-only
    entries into hash-checked error-bound audits: exact counts +
    pass flags are oracle-expressible, and the flags being 1 IS the
    HLL tolerance check."""
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "daily_user_sketch_rollup_audit", sf_dir)


def test_events_hourly_approx_users_audit_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "events_hourly_approx_users_audit", sf_dir)


def test_sketch_audit_flags_catch_violations(spark, sf_dir):
    """The pass flag is a real comparator, not a constant: shrink the
    tolerance to zero-ish and some flag must drop to 0 (estimates are
    not exact at every group), proving the audit would catch a
    broken sketch."""
    from global_superstore_data_warehouse_spark.plans import events as E

    df = E.daily_user_sketch_rollup_audit(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.daily_ok == 1 and r.cumulative_ok == 1 for r in rows)
    # flag logic: _within is a strict bound comparator
    from pyspark.sql import functions as F

    probe = spark.range(1).select(
        E._within(F.lit(100.0), F.lit(100)).alias("eq"),
        E._within(F.lit(104.9), F.lit(100)).alias("in_rel"),
        E._within(F.lit(106.0), F.lit(100)).alias("out_rel"),
        E._within(F.lit(4.0), F.lit(1)).alias("in_abs"),
        E._within(F.lit(7.0), F.lit(1)).alias("out_abs"),
    ).first()
    assert (probe.eq, probe.in_rel, probe.out_rel, probe.in_abs,
            probe.out_abs) == (1, 1, 0, 1, 0)
