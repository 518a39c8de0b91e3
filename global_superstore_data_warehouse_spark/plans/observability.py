"""Pipeline observability operators: join-key skew diagnostics and
population-stability (distribution drift) reports.

Both are "run before you scale" tools: the skew report is what you
consult before choosing broadcast/salt/AQE strategy for a 100 TB
join (operators/skew.py is the remedy; this is the diagnosis), and
the PSI report is the standing data-quality monitor that catches a
silently drifting upstream feed before it poisons a training run.

Scale shapes: both are two-stage aggregations — a keyed partial
aggregate that map-side-combines to one row per key/group, then a
tiny global aggregate over those rows. No corpus-sized shuffle, no
window over the full data, output bounded by the key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row skew profile of the lineitem→part join key: number of
    distinct keys, total rows, mean/max/p99 rows-per-key, the share
    of rows carried by the heaviest key, and the max/mean skew ratio.

    Decision thresholds (the point of the report): skew_ratio near 1
    → plain hash join partitions evenly; a heavy top_key_share →
    salt that key (operators/skew.salted_join) or let AQE split it;
    n_keys small enough → the other side is broadcastable.

    Plan: groupBy(key).count() partial-aggregates to one row per key,
    then a single global aggregate — the report costs one scan plus a
    keys-sized shuffle regardless of table size. ``percentile`` on
    the per-key counts is exact here; at extreme key cardinality the
    documented swap-in is ``percentile_approx`` (fixed-size sketch).
    """
    li = load(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("rows_per_key"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("rows_per_key").alias("total_rows"),
        F.round(F.avg("rows_per_key"), 6).alias("mean_rows"),
        F.max("rows_per_key").alias("max_rows"),
        F.round(F.expr("percentile(rows_per_key, 0.99)"), 6).alias("p99_rows"),
        F.round(F.max("rows_per_key") / F.sum("rows_per_key"), 6).alias("top_key_share"),
        F.round(F.max("rows_per_key") / F.avg("rows_per_key"), 6).alias("skew_ratio"),
    )


JOIN_SKEW_REPORT_ORACLE = """
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(rows_per_key) AS BIGINT) AS total_rows,
           ROUND(AVG(rows_per_key), 6) AS mean_rows,
           MAX(rows_per_key) AS max_rows,
           ROUND(quantile_cont(rows_per_key, 0.99), 6) AS p99_rows,
           ROUND(CAST(MAX(rows_per_key) AS DOUBLE) / SUM(rows_per_key), 6)
               AS top_key_share,
           ROUND(CAST(MAX(rows_per_key) AS DOUBLE) / AVG(rows_per_key), 6)
               AS skew_ratio
    FROM (
        SELECT l_partkey, COUNT(*) AS rows_per_key
        FROM lineitem GROUP BY l_partkey
    )
"""


# --- population stability (drift) -------------------------------------

# Laplace-style floor so a type absent from one period contributes a
# large-but-finite PSI term instead of ±infinity.
PSI_EPS = 1e-6


def psi_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-type mix, weekday vs
    weekend traffic: per type, p = weekday share, q = weekend share,
    psi_term = (p − q) · ln(p / q); the monitor alarms on
    Σ psi_term (> 0.1 investigate, > 0.25 act — the standard PSI
    rule of thumb). One row per event type so the report shows WHICH
    type drifted, not just that something did.

    Plan: one partial-aggregated groupBy(event_type, is_weekend) to a
    handful of rows, pivoted by conditional sums, shares computed
    against broadcast-sized totals — the corpus is scanned once and
    never re-shuffled. Spark's ``dayofweek`` is 1=Sunday..7=Saturday;
    the oracle's DuckDB ``dayofweek`` is 0=Sunday..6=Saturday — both
    sides encode "Saturday or Sunday" natively.
    """
    ev = load(spark, sf_dir, "events")
    is_weekend = F.dayofweek("ts").isin(1, 7)
    counts = (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.when(~is_weekend, 1).otherwise(0)).alias("weekday_n"),
            F.sum(F.when(is_weekend, 1).otherwise(0)).alias("weekend_n"),
        )
    )
    tot = counts.agg(
        F.sum("weekday_n").alias("weekday_tot"), F.sum("weekend_n").alias("weekend_tot")
    )
    p = F.greatest(F.col("weekday_n") / F.col("weekday_tot"), F.lit(PSI_EPS))
    q = F.greatest(F.col("weekend_n") / F.col("weekend_tot"), F.lit(PSI_EPS))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "weekday_n",
            "weekend_n",
            F.round(p, 6).alias("p_weekday"),
            F.round(q, 6).alias("q_weekend"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


PSI_EVENT_DRIFT_ORACLE = f"""
    WITH counts AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)
                    AS BIGINT) AS weekday_n,
               CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
                    AS BIGINT) AS weekend_n
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(weekday_n) AS BIGINT) AS weekday_tot,
               CAST(SUM(weekend_n) AS BIGINT) AS weekend_tot
        FROM counts
    )
    SELECT event_type, weekday_n, weekend_n,
           ROUND(p, 6) AS p_weekday,
           ROUND(q, 6) AS q_weekend,
           ROUND((p - q) * ln(p / q), 6) AS psi_term
    FROM (
        SELECT event_type, weekday_n, weekend_n,
               GREATEST(CAST(weekday_n AS DOUBLE) / weekday_tot, {PSI_EPS}) AS p,
               GREATEST(CAST(weekend_n AS DOUBLE) / weekend_tot, {PSI_EPS}) AS q
        FROM counts, tot
    )
"""
