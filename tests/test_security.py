"""C9 roles/GRANTs — grant-matrix enforcement, secured-view oracle
parity, row-filter pushdown, mask joinability."""

import pytest

from tests.conftest import assert_matches_oracle


def _matrix():
    from global_superstore_data_warehouse_spark.security import reference_matrix

    return reference_matrix()


def test_secured_view_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "secured_customers_analyst", sf_dir)


def test_grant_matrix_denies_ungranted(spark, sf_dir):
    from global_superstore_data_warehouse_spark.security import PermissionDenied

    m = _matrix()
    # analyst reads customer + orders (both through secured views)
    # and nothing else
    with pytest.raises(PermissionDenied):
        m.secured_load(spark, sf_dir, "analyst", "lineitem")
    # source agents are confined to their own staging tables
    # (consumer.sql:91-92 / corporate.sql:93-94 grant per-schema)
    with pytest.raises(PermissionDenied):
        m.check("sa_superstore_consumer", "supplier", "select")
    with pytest.raises(PermissionDenied):
        m.check("sa_superstore_corporate", "customer", "select")
    # select does not imply write
    with pytest.raises(PermissionDenied):
        m.check("bl_dm", "customer", "insert")
    # unknown role == no grants
    with pytest.raises(PermissionDenied):
        m.check("nobody", "customer", "select")


def test_grant_matrix_star_and_validation():
    from global_superstore_data_warehouse_spark.security import GrantMatrix

    m = _matrix()
    # bl_cl's ON-ALL-TABLES grant (bl_3nf.sql:283 shape)
    for t in ("customer", "events", "documents"):
        m.check("bl_cl", t, "delete")
    with pytest.raises(ValueError):
        m.check("bl_cl", "customer", "truncate")
    with pytest.raises(ValueError):
        GrantMatrix().grant("r", "customer", "grant_option")
    with pytest.raises(KeyError):
        GrantMatrix().grant("r", "no_such_table", "select")


def test_row_filter_pushes_to_scan(spark, sf_dir):
    """Row-level security is an ordinary predicate: it must reach the
    parquet scan as a pushed filter, not run post-scan."""
    from global_superstore_data_warehouse_spark.security import (
        secured_customers_analyst,
    )

    df = secured_customers_analyst(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_mask_is_deterministic_and_join_preserving(spark, sf_dir):
    """The keyed mask maps equal inputs to equal tokens across
    independent loads (secured views stay joinable) and never leaks
    the raw value."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.security import (
        secured_customers_analyst,
    )

    a = secured_customers_analyst(spark, sf_dir).select(
        "c_custkey", F.col("name_masked").alias("m1")
    )
    b = secured_customers_analyst(spark, sf_dir).select(
        "c_custkey", F.col("name_masked").alias("m2")
    )
    joined = a.join(b, "c_custkey")
    assert joined.filter(F.col("m1") != F.col("m2")).count() == 0
    # masked column carries no raw names
    from global_superstore_data_warehouse_spark.catalog import load

    raw = set(r[0] for r in load(spark, sf_dir, "customer").select("c_name").limit(20).collect())
    masked = set(r[0] for r in a.select("m1").limit(1000).collect())
    assert raw.isdisjoint(masked)


def test_gdpr_cascade_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "gdpr_erasure_cascade", sf_dir)


def test_gdpr_cascade_removes_every_trace(spark, sf_dir):
    """No surviving order may belong to an erased customer, and the
    per-segment customer counts must drop by exactly the erased set."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.security import (
        _erasure_requests,
        gdpr_erasure_cascade,
    )

    c = load(spark, sf_dir, "customer")
    erased = {r[0] for r in _erasure_requests(c).collect()}
    assert erased, "erasure request set must be non-empty at sf0.001"

    report = gdpr_erasure_cascade(spark, sf_dir)
    total_kept = report.agg(F.sum("customers_kept")).collect()[0][0]
    # customers with >=1 surviving order, none of them erased
    o = load(spark, sf_dir, "orders")
    with_orders = {
        r[0]
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey")
        .distinct()
        .collect()
    }
    assert total_kept == len(with_orders - erased)


def test_gdpr_cascade_broadcasts_erasure_set(spark, sf_dir):
    """The erasure keyset must ride broadcast anti-joins — the big
    tables never shuffle for the request set."""
    from global_superstore_data_warehouse_spark.security import gdpr_erasure_cascade

    plan = gdpr_erasure_cascade(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_mask_key_is_injectable(spark, sf_dir):
    """A different mask key changes every mask (the pepper is a real
    control, not decoration) while preserving join-consistency
    within that key — and the default-key view is unchanged, keeping
    the driver hash stable."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.security import reference_matrix

    default = reference_matrix().secured_load(spark, sf_dir, "analyst", "customer")
    rotated = reference_matrix(mask_key="rotated-key").secured_load(
        spark, sf_dir, "analyst", "customer"
    )
    d = default.select("c_custkey", F.col("name_masked").alias("m_default"))
    r = rotated.select("c_custkey", F.col("name_masked").alias("m_rotated"))
    joined = d.join(r, "c_custkey").cache()
    try:
        n = joined.count()
        assert n > 0
        # every mask differs across keys...
        assert joined.filter(F.col("m_default") == F.col("m_rotated")).count() == 0
        # ...but within one key the mask stays join-preserving
        r2 = reference_matrix(mask_key="rotated-key").secured_load(
            spark, sf_dir, "analyst", "customer"
        ).select("c_custkey", F.col("name_masked").alias("m_rotated2"))
        again = r.join(r2, "c_custkey")
        assert again.filter(F.col("m_rotated") != F.col("m_rotated2")).count() == 0
    finally:
        joined.unpersist()


def test_pii_pepper_is_injectable(spark, sf_dir):
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.plans.curation import (
        pii_pseudonymize_customers,
    )

    d = pii_pseudonymize_customers(spark, sf_dir).select(
        "c_custkey", F.col("name_token").alias("t1")
    )
    r = pii_pseudonymize_customers(spark, sf_dir, pepper="other-pepper").select(
        "c_custkey", F.col("name_token").alias("t2")
    )
    j = d.join(r, "c_custkey")
    assert j.count() > 0
    assert j.filter(F.col("t1") == F.col("t2")).count() == 0


def test_secured_orders_slice_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "secured_orders_slice", sf_dir)


def test_slicer_predicates_push_into_scan(spark, sf_dir):
    """Both slicer params AND the policy's RLS predicate must reach
    the parquet scan's PushedFilters — a sliced secured view prunes
    row groups like any plain filtered scan."""
    import io
    from contextlib import redirect_stdout

    from global_superstore_data_warehouse_spark.security import (
        secured_orders_slice,
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        secured_orders_slice(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = " ".join(pushed)
    for col in ("o_orderdate", "o_orderpriority", "o_orderstatus"):
        assert col in line, (col, line)


def test_slicer_on_hidden_column_denied(spark, sf_dir):
    """A slicer must not become a side channel onto columns the
    policy hides (o_comment) or masks away (customer c_name)."""
    import pytest as _pytest

    from global_superstore_data_warehouse_spark.security import (
        PermissionDenied,
        reference_matrix,
    )

    m = reference_matrix()
    with _pytest.raises(PermissionDenied):
        m.slicer_load(spark, sf_dir, "analyst", "orders", {"o_comment": "x"})
    with _pytest.raises(PermissionDenied):
        m.slicer_load(spark, sf_dir, "analyst", "customer", {"c_name": "x"})


def test_slicer_respects_grants(spark, sf_dir):
    """No grant, no slice: analyst has no lineitem privilege at all."""
    import pytest as _pytest

    from global_superstore_data_warehouse_spark.security import (
        PermissionDenied,
        reference_matrix,
    )

    with _pytest.raises(PermissionDenied):
        reference_matrix().slicer_load(
            spark, sf_dir, "analyst", "lineitem", {"l_orderkey": 1}
        )
