"""Event-stream analytics over the ``events`` table (beyond-reference;
the reference has no streaming at all, SURVEY §2.11): tumbling and
sliding event-time windows, gap-based sessionization, per-key top-k.

These are the *batch* formulations — bit-comparable against the
DuckDB oracle; streaming/events.py reuses the same logic under
Structured Streaming with watermarks.

Timestamps are compared at whole-second granularity (floor) and
emitted as formatted strings: the parquet source is nanosecond
precision, which Spark reads as µs and DuckDB as ns — flooring to
seconds makes both engines agree everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import cpu_repartition

SESSION_GAP_SECONDS = 600


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (A3-style grouped agg
    keyed on event time)."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.groupBy(hour.alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_HOURLY_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour wide, 30-minute slide — every event
    lands in exactly two windows. Spark's window() generator aligns
    starts to multiples of the slide, which the oracle reproduces
    with epoch arithmetic."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(
            F.date_format(w.start, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("window_start", "event_type")
    )


EVENTS_SLIDING_ORACLE = """
    WITH starts AS (
        SELECT event_type,
               to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800) AS w
        FROM events
        UNION ALL
        SELECT event_type,
               to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800) AS w
        FROM events
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM starts
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-minute inactivity): the classic
    lag + cumulative-sum formulation — a per-user window, so the only
    shuffle is on user_id and state never concentrates on one node.
    The streaming twin is session_window()/applyInPandasWithState in
    streaming/events.py."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").cast("long").alias("sec"),  # floor to whole seconds
        "ts",
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec").over(order) > SESSION_GAP_SECONDS, 1
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(
                F.from_unixtime(F.min("sec")), "yyyy-MM-dd HH:mm:ss"
            ).alias("session_start"),
            F.date_format(
                F.from_unixtime(F.max("sec")), "yyyy-MM-dd HH:mm:ss"
            ).alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("int"))
    )


EVENTS_SESSIONIZE_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN sec - LAG(sec) OVER w > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), sess AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS INTEGER) AS session_seq,
           COUNT(*) AS n_events,
           strftime(to_timestamp(MIN(sec)), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(to_timestamp(MAX(sec)), '%Y-%m-%d %H:%M:%S') AS session_end,
           ROUND(SUM(value), 2) AS sum_value
    FROM sess
    GROUP BY user_id, session_seq
"""


def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-2 events by value (partitioned rank window —
    the §2.6 gap in the reference, filled Spark-style)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "value")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .withColumn("rank", F.col("rank").cast("int"))
    )


TOP_EVENTS_PER_USER_ORACLE = """
    SELECT user_id, event_id, event_type, value,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY value DESC, event_id ASC) AS INTEGER) AS rank
    FROM events
    QUALIFY rank <= 2
"""


# --- cohort retention -------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per week-offset of later activity. Two aggregations —
    (user → cohort week) then ((cohort, offset) → distinct users) —
    both partial-aggregated; no window, no self-join.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    )
    # ONE shuffle on user_id computes both the cohort week and the
    # distinct activity weeks (collect_set — bounded: weeks per user),
    # replacing the cohorts ⋈ activity self-join (which costs three
    # shuffles: two aggs + the join)
    per_user = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"), F.collect_set("week").alias("weeks")
    )
    return (
        per_user.select("user_id", "cohort_week", F.explode("weeks").alias("week"))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_ORACLE = """
    WITH ev AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ), cohorts AS (
        SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1
    ), activity AS (
        SELECT DISTINCT user_id, week FROM ev
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER) AS week_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY c.cohort_week, 2
    ORDER BY 1, 2
"""


# --- funnel -----------------------------------------------------------

FUNNEL_STAGES = ["view", "click", "purchase"]


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user advances a
    stage only with an event at-or-after their previous stage's first
    event. Each stage is one filtered aggregation joined on user_id —
    stage count bounds the number of shuffles; no window over raw
    events, no explode."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s1.agg(F.lit(1).alias("stage_no"), F.lit("view").alias("stage"), F.count(F.lit(1)).alias("users")),
        s2.agg(F.lit(2).alias("stage_no"), F.lit("click").alias("stage"), F.count(F.lit(1)).alias("users")),
        s3.agg(F.lit(3).alias("stage_no"), F.lit("purchase").alias("stage"), F.count(F.lit(1)).alias("users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage_no")


EVENT_FUNNEL_ORACLE = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
        GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY 1
    )
    SELECT 1 AS stage_no, 'view' AS stage, (SELECT COUNT(*) FROM s1) AS users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    ORDER BY stage_no
"""


# --- per-user transition counts (lag window) -------------------------

TRANSITIONS_SCHEMA = "user_id long, from_type string, to_type string, n long"


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (Markov bigrams over the
    time-ordered event sequence) as a pure-JVM lag window + grouped
    count: one hash shuffle on user_id, whole-stage codegen end to
    end, no Python workers. ``event_transitions_pandas`` is the
    grouped-``applyInPandas`` formulation of the same semantics, kept
    as an equivalence-tested alternative (the per-group custom-agg
    shape demo) — at scale the window plan wins: same shuffle, no
    Arrow round-trip.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("user_id", "from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def event_transitions_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInPandas`` variant of :func:`event_transitions`:
    each user's whole sequence lands in one Arrow batch, ordering and
    pairing happen in pandas, output is a typed count table. Integer
    counts are engine-exact, so the variant is value-hash-comparable
    with the window plan (tests/test_events_streaming.py asserts
    equality). State per group is one user's events — bounded; groups
    hash-partition across executors.
    """
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")

    def transitions(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        prev = pdf["event_type"].shift(1)
        mask = prev.notna()
        out = (
            pd.DataFrame(
                {
                    "user_id": pdf["user_id"][mask],
                    "from_type": prev[mask],
                    "to_type": pdf["event_type"][mask],
                }
            )
            .groupby(["user_id", "from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    # PIN the python stage's width: AQE byte-based coalescing shrank
    # the pre-applyInPandas exchange to 2 partitions (~2 MB total) and
    # serialized ALL pandas group work on 2 workers — 5.6 s wall with
    # 0.3 s of JVM CPU, measured at sf0.1. The explicit same-key
    # repartition is exempt from coalescing (the groupBy reuses its
    # partitioning — still exactly ONE exchange) and scales with the
    # session's shuffle setting (guide §4: size python stages by
    # compute, not bytes).
    ev = cpu_repartition(ev, "user_id")
    return ev.groupBy("user_id").applyInPandas(transitions, TRANSITIONS_SCHEMA)


EVENT_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_type
        FROM events
    )
    SELECT user_id, from_type, event_type AS to_type, COUNT(*) AS n
    FROM seq
    WHERE from_type IS NOT NULL
    GROUP BY 1, 2, 3
"""


# --- approximate distinct (HLL sketch) -------------------------------

def events_hourly_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly approximate distinct users via HyperLogLog++
    (``approx_count_distinct``, rsd=0.01) — the sketch path for
    count-distinct at 100 TB, where the exact distinct's per-group
    shuffle of every user id is the dominant cost and a fixed-size
    sketch mergeable map-side replaces it.

    No SQL oracle: HLL++ estimates are engine-specific (the driver
    records the weaker rows-only check). The test instead bounds the
    estimate against the exact count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("hour_start")
    )


# --- range/interval join (bucket-blocked) ----------------------------

MAINT_EVERY_HOURS = 4
MAINT_LEN_MINUTES = 90


def events_in_maintenance_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per generated maintenance window (90-minute windows
    every 4 hours across the event span): the range/interval-join
    workload, executed as a bucket-blocked EQUI-join
    (operators/rangejoin.py) — never as the quadratic
    points x intervals inequality join Spark would otherwise plan as
    a nested-loop. Windows span hour buckets (90 min > 60 min), so
    the multi-bucket explode path is exercised; empty windows are
    kept with zero counts via the left join.
    """
    from global_superstore_data_warehouse_spark.operators.rangejoin import (
        bucketed_interval_join,
    )

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    windows = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {MAINT_EVERY_HOURS} hours"))
            ).alias("win_start")
        )
        .select(
            "win_start",
            (F.col("win_start") + F.expr(f"interval {MAINT_LEN_MINUTES} minutes")).alias(
                "win_end"
            ),
        )
        # referenced twice (pair join + empty-window reattach): pin the
        # tiny frame so the bounds scan of events runs once, not per branch
        .localCheckpoint()
    )
    # inner pair join + aggregate, then reattach empty windows with
    # zero counts: cheaper than how='left' (whose unmatched-interval
    # reattach is an extra anti-join shuffle the aggregate consumer
    # doesn't need) — the window frame is tiny, so the final left
    # join broadcasts
    pairs = bucketed_interval_join(
        windows, ev, "win_start", "win_end", "ts", width_seconds=3600, how="inner"
    )
    counts = pairs.groupBy("win_start").agg(
        F.count("event_id").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )
    return windows.join(counts, "win_start", "left").select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
    )


EVENTS_IN_MAINTENANCE_WINDOWS_ORACLE = f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), windows AS (
        SELECT s.w AS win_start,
               s.w + INTERVAL {MAINT_LEN_MINUTES} MINUTE AS win_end
        FROM bounds, LATERAL (
            SELECT unnest(generate_series(lo, hi,
                   INTERVAL {MAINT_EVERY_HOURS} HOUR)) AS w
        ) s
    )
    SELECT strftime(w.win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(e.event_id) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM windows w
    LEFT JOIN events e
      ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY 1
"""


# --- built-in session_window (the Catalyst-native sessionizer) -------

def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events_sessionize``'s gap semantics via the BUILT-IN
    ``F.session_window`` aggregate — Catalyst's native session
    operator (one shuffle on the grouping key, sessions merged inside
    the aggregation, no lag/cumsum window pass). This is the form
    that shares code with the streaming job (``session_window`` is
    the only sessionizer that runs under ``readStream`` with state
    store merging); the lag+cumsum plan remains the pick when you
    need per-event session ids rather than per-session rollups.

    Boundary semantics (probed, and pinned by the oracle): two events
    exactly GAP apart MERGE — a new session starts only when the gap
    is strictly exceeded; ``window.end`` is last event ts + gap.
    Emits epoch-microsecond bounds (bigint) — timestamps never cross
    the driver compare."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


EVENTS_SESSION_WINDOW_ORACLE = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, value FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                         > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
    ), s AS (
        SELECT *,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + {SESSION_GAP_SECONDS} * 1000000 AS session_end_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM s
    GROUP BY user_id, sid
"""


# --- per-user outlier detection (telemetry anomaly scan) -------------

OUTLIER_Z = 2.5  # |z| threshold
OUTLIER_MIN_EVENTS = 5  # need a real distribution before flagging


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers over event values — the standard
    telemetry anomaly scan (and the training-data analogue: loss /
    length / score columns get exactly this filter before a corpus
    ships). Mean and sample-stddev come from an unbounded window per
    user (one shuffle, partial-aggregated); rows with
    ``|value - mean| > z * stddev`` survive. Users with fewer than
    ``OUTLIER_MIN_EVENTS`` events or zero variance never flag —
    stddev guards divide-by-zero explicitly."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    stats = ev.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_user_events"),
    )
    return (
        stats.filter(
            (F.col("n_user_events") >= OUTLIER_MIN_EVENTS)
            & (F.col("sd") > 0)
            & (F.abs(F.col("value") - F.col("mu")) > OUTLIER_Z * F.col("sd"))
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 3).alias("z"),
            "n_user_events",
        )
    )


EVENTS_VALUE_OUTLIERS_ORACLE = f"""
    WITH s AS (
        SELECT event_id, user_id, value,
               AVG(value) OVER (PARTITION BY user_id) AS mu,
               STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd,
               COUNT(*) OVER (PARTITION BY user_id) AS n_user_events
        FROM events
    )
    SELECT event_id, user_id,
           ROUND(value, 2) AS value,
           ROUND((value - mu) / sd, 3) AS z,
           n_user_events
    FROM s
    WHERE n_user_events >= {OUTLIER_MIN_EVENTS}
      AND sd > 0
      AND ABS(value - mu) > {OUTLIER_Z} * sd
"""


# --- gap-fill + forward-fill (time-series regularization) -------------


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the event stream into a DENSE hourly series per
    event type: every (type, hour) slot between the corpus's first
    and last hour exists exactly once, missing slots carry
    n_events=0 / is_gap=1, and avg_value is FORWARD-FILLED from the
    most recent observed hour (NULL before a type's first
    observation) — the standard gap-fill + locf shape feature
    pipelines need before windowed models.

    Plan shape: one partial-aggregated groupBy(type, hour) collapses
    the stream to |types|x|hours| rows; the spine is generated
    distributed (per-type ``sequence`` + ``explode`` — never a
    driver loop), sized types x hours, NOT corpus rows; the
    left join + ``last(ignorenulls)`` window both run on the
    collapsed frame partitioned by type. At 100 TB the stream scan
    dominates and everything after the first aggregate is
    metadata-sized; the window never sees raw events.
    """
    ev = load(spark, sf_dir, "events")
    # avg over integer MICRO-value units: a raw AVG(double) exposes
    # partial-aggregation sum order, which flipped one sf0.1 hour
    # (43.472812 vs ...13) at the 6dp rounding boundary; the integer
    # sum is order-free and the single division is deterministic
    # (values are non-negative, so per-row half-rounding agrees
    # across engines too)
    vmicro = F.round(F.col("value") * 1000000.0).cast("long")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(vmicro) / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("ff_avg_value"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
    )


EVENTS_GAPFILL_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                     / COUNT(*) / 1000000.0, 6) AS avg_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.hour_ts
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
            FROM bounds
        ) g
    )
    SELECT s.event_type,
           strftime(s.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
           last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ff_avg_value,
           CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_gap
    FROM spine s
    LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
"""


# --- burst dedup (batch twin of watermark dedup) ----------------------

DEDUP_WINDOW_SECONDS = 300


def events_dedup_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event duplicate verdict: an event is a burst-duplicate if
    the SAME (user_id, event_type, value) occurred within
    DEDUP_WINDOW_SECONDS before it — the batch twin of the streaming
    ``dropDuplicatesWithinWatermark`` job (streaming/events.py), with
    relative-to-previous (burst-collapse) semantics: each event
    compares against its immediate predecessor in the key's
    timeline, so a long burst collapses to its first event plus any
    event that falls a full window after its predecessor.

    Plan shape: ONE shuffle (the key-partitioned lag window); the
    verdict is a projection of the lag delta. No self-join, no range
    join — the window formulation is the scale-correct shape for
    per-key adjacency at 100 TB (same as events_sessionize).
    """
    ev = load(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp_ltz").cast("double")
    w = Window.partitionBy("user_id", "event_type", "value").orderBy(
        "ts", "event_id"
    )
    prev = F.lag(epoch).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        (
            prev.isNotNull() & ((epoch - prev) <= DEDUP_WINDOW_SECONDS)
        ).cast("int").alias("is_dup"),
    )


EVENTS_DEDUP_BURSTS_ORACLE = f"""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(CASE WHEN prev_e IS NOT NULL
                      AND epoch(ts) - prev_e <= {DEDUP_WINDOW_SECONDS}
                     THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM (
        SELECT event_id, user_id, event_type, ts,
               LAG(epoch(ts)) OVER (
                   PARTITION BY user_id, event_type, value
                   ORDER BY ts, event_id
               ) AS prev_e
        FROM events
    )
"""


# --- interval x interval overlap (sessions vs maintenance windows) ----


def session_maintenance_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many user sessions touch each maintenance window — the
    INTERVAL x INTERVAL overlap workload (sessions are [first_event,
    last_event+1s) spans; windows are the generated 90-min-every-4h
    maintenance intervals), executed by
    ``operators/rangejoin.interval_overlap_join``: bucket-blocked
    equi-join with a responsibility condition, never the quadratic
    inequality nested loop, no post-join dedup. Empty windows are
    reattached with zero counts (the pair join is inner).

    Scale shape: sessions come from one user_id-partitioned window
    (same plan as events_sessionize); the overlap join shuffles on
    the hour bucket; window count is span/4h so the reattach join
    broadcasts.
    """
    from global_superstore_data_warehouse_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec"), "ts"
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec").over(order) > SESSION_GAP_SECONDS, 1
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    sessions = flagged.groupBy("user_id", "session_seq").agg(
        F.min("sec").alias("s_start"),
        (F.max("sec") + 1).alias("s_end"),  # half-open; instant sessions live 1s
    )

    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    windows = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {MAINT_EVERY_HOURS} hours"))
            ).alias("win_ts")
        )
        .select(
            F.col("win_ts").cast("long").alias("w_start"),
            (F.col("win_ts").cast("long") + MAINT_LEN_MINUTES * 60).alias("w_end"),
        )
        .localCheckpoint()  # referenced twice: pair join + zero reattach
    )
    pairs = interval_overlap_join(
        sessions, windows, "s_start", "s_end", "w_start", "w_end", 3600
    )
    per_window = pairs.groupBy("w_start").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return (
        windows.join(F.broadcast(per_window), "w_start", "left")
        .select(
            F.date_format(
                F.col("w_start").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
            ).alias("win_start"),
            F.coalesce("n_sessions", F.lit(0)).alias("n_sessions"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
    )


SESSION_MAINTENANCE_OVERLAP_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN sec - LAG(sec) OVER w > {SESSION_GAP_SECONDS}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), sess AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
        FROM flagged
    ), sessions AS (
        SELECT user_id, session_seq,
               MIN(sec) AS s_start, MAX(sec) + 1 AS s_end
        FROM sess GROUP BY user_id, session_seq
    ), bounds AS (
        SELECT CAST(floor(epoch(date_trunc('hour', MIN(ts)))) AS BIGINT) AS lo,
               CAST(floor(epoch(date_trunc('hour', MAX(ts)))) AS BIGINT) AS hi
        FROM events
    ), windows AS (
        SELECT w AS w_start, w + {MAINT_LEN_MINUTES} * 60 AS w_end
        FROM (
            SELECT unnest(generate_series(lo, hi, {MAINT_EVERY_HOURS} * 3600)) AS w
            FROM bounds
        )
    ), pairs AS (
        SELECT w.w_start, s.user_id
        FROM sessions s JOIN windows w
          ON s.s_start < w.w_end AND w.w_start < s.s_end
    )
    SELECT strftime(to_timestamp(w.w_start), '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(COALESCE(COUNT(p.user_id), 0) AS BIGINT) AS n_sessions,
           CAST(COALESCE(COUNT(DISTINCT p.user_id), 0) AS BIGINT) AS n_users
    FROM windows w LEFT JOIN pairs p ON w.w_start = p.w_start
    GROUP BY w.w_start
"""


# --- 3-step path mining -----------------------------------------------

TRIGRAM_TOP_K = 25


def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step event-type paths per user timeline (the journey-
    mining extension of ``event_transitions``' 2-step matrix):
    double-lag over each user's chronological stream, count the
    (a -> b -> c) paths, keep the top TRIGRAM_TOP_K. (No session
    bound — this stream is sparse per user; the sessionized variant
    is the same plan with the events_sessionize keys added to the
    window partition.)

    Plan shape: ONE user-partitioned window pass derives both lags
    (shared shuffle), then a paths-sized aggregate and a rank over
    the aggregated path vocabulary. Raw events shuffle once.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    paths = (
        ev.withColumn("prev1", F.lag("event_type", 1).over(order))
        .withColumn("prev2", F.lag("event_type", 2).over(order))
        .filter(F.col("prev2").isNotNull())
        .select(
            F.concat_ws(" > ", "prev2", "prev1", "event_type").alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))
    w = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TRIGRAM_TOP_K)
    )


EVENT_TRIGRAMS_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    ), paths AS (
        SELECT LAG(event_type, 2) OVER w || ' > '
               || LAG(event_type, 1) OVER w || ' > '
               || event_type AS path,
               LAG(event_type, 2) OVER w AS prev2
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), counted AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM paths WHERE prev2 IS NOT NULL
        GROUP BY path
    )
    SELECT path, n_paths,
           CAST(ROW_NUMBER() OVER (ORDER BY n_paths DESC, path ASC) AS INTEGER)
               AS rank
    FROM counted
    QUALIFY rank <= {TRIGRAM_TOP_K}
"""


# --- lateness profile (watermark sizing) ------------------------------


def lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How out-of-order is the event feed, per event type: an event
    is LATE if an event with a larger timestamp precedes it in
    ARRIVAL order for the same user; its lateness is the gap to the
    running max. One summary row per type with the late share and
    the lateness distribution (p50/p95/max seconds) — THE input for
    choosing Structured Streaming watermarks (streaming/events.py
    uses '2 hours'; this report is how you justify or shrink that).

    Arrival order: the static corpus has no ingestion-sequence
    column (and its event_id order is perfectly time-sorted, which
    would make the report trivially zero), so arrival is simulated
    with a DETERMINISTIC jitter — md5 of the event id — which
    shuffles arrival while staying engine-identical and
    hash-checkable. In production, substitute the real ingestion
    offset/sequence column for the md5.

    Plan shape: one user-partitioned running-max window in arrival
    order (same single shuffle as sessionize), then a types-sized
    aggregate with exact percentiles over the lateness values.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.md5(F.col("event_id").cast("string")).alias("arrival"),
    )
    order = (
        Window.partitionBy("user_id")
        .orderBy("arrival")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_max = ev.withColumn("prior_max", F.max("sec").over(order))
    late_by = F.greatest(F.lit(0), F.col("prior_max") - F.col("sec"))
    flagged = with_max.select(
        "event_type",
        F.when(F.col("prior_max").isNull(), 0).otherwise(late_by).alias("late_s"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        F.round(F.avg((F.col("late_s") > 0).cast("double")), 6).alias("late_share"),
        F.round(F.expr("percentile(late_s, 0.5)"), 6).alias("p50_late_s"),
        F.round(F.expr("percentile(late_s, 0.95)"), 6).alias("p95_late_s"),
        F.max("late_s").alias("max_late_s"),
    )


LATENESS_PROFILE_ORACLE = """
    WITH e AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               md5(CAST(event_id AS VARCHAR)) AS arrival
        FROM events
    ), flagged AS (
        SELECT event_type,
               CASE WHEN prior_max IS NULL THEN 0
                    ELSE GREATEST(0, prior_max - sec) END AS late_s
        FROM (
            SELECT event_type, sec,
                   MAX(sec) OVER (PARTITION BY user_id ORDER BY arrival
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prior_max
            FROM e
        )
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           ROUND(AVG(CASE WHEN late_s > 0 THEN 1.0 ELSE 0.0 END), 6)
               AS late_share,
           ROUND(quantile_cont(late_s, 0.5), 6) AS p50_late_s,
           ROUND(quantile_cont(late_s, 0.95), 6) AS p95_late_s,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM flagged
    GROUP BY event_type
"""


# --- bidirectional nearest-event join ---------------------------------

# (sec, event_id) encoded into one orderable long so the window can
# carry the WHOLE row identity through last/first(ignorenulls). The
# encoding is only injective while event_id < base, so the plan
# GUARDS the assumption at runtime (raise_error folded into the key
# expression — evaluated row-by-row JVM-side, no extra job): at a
# scale factor where ids outgrow the base, the query fails loudly
# instead of silently decoding the wrong purchase.
NEAREST_KEY_BASE = 10_000_000


def nearest_purchase_to_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the SAME user's nearest purchase in
    time — in EITHER direction (the bidirectional generalization of
    the backward-only as-of join in asof_click_attribution): which
    purchases sit close to failures. Ties (equal absolute gap)
    resolve to the earlier (backward) purchase; errors with no
    purchase on either side keep a NULL neighbor (left semantics).

    Scale shape: the union-window as-of classic, doubled — one
    user-partitioned sort carries BOTH passes (last purchase-key at
    or before, first purchase-key after, via last/first(ignorenulls)
    over mirrored frames); the purchase's (sec, event_id) rides the
    window as ONE encoded long, so row identity survives without a
    join back. No inequality join anywhere; one shuffle on user_id.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "purchase")
    )
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
    ).withColumn(
        "pkey",
        F.when(
            F.col("event_id") >= NEAREST_KEY_BASE,
            F.raise_error(
                F.lit(
                    "nearest_purchase_to_error: event_id >= NEAREST_KEY_BASE "
                    f"({NEAREST_KEY_BASE}) — the (sec, event_id) long encoding "
                    "would collide; raise the base"
                )
            ).cast("long"),
        ).when(
            F.col("event_type") == "purchase",
            F.col("sec") * NEAREST_KEY_BASE + F.col("event_id"),
        ),
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    back = F.last("pkey", ignorenulls=True).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("pkey", ignorenulls=True).over(
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    errors = (
        base.withColumn("back_key", back)
        .withColumn("fwd_key", fwd)
        .filter(F.col("event_type") == "error")
    )
    # `div`, not `/`: the encoded key exceeds 2^53, so double
    # division would lose the low digits exactly where event_id lives
    back_sec = F.expr(f"back_key div {NEAREST_KEY_BASE}")
    fwd_sec = F.expr(f"fwd_key div {NEAREST_KEY_BASE}")
    back_gap = back_sec - F.col("sec")  # <= 0
    fwd_gap = fwd_sec - F.col("sec")  # >= 0
    use_back = F.col("back_key").isNotNull() & (
        F.col("fwd_key").isNull() | (-back_gap <= fwd_gap)
    )
    chosen = F.when(use_back, F.col("back_key")).otherwise(F.col("fwd_key"))
    chosen_gap = F.when(use_back, back_gap).otherwise(fwd_gap)
    return errors.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.date_format(F.to_timestamp("sec"), "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
        (chosen % NEAREST_KEY_BASE).alias("purchase_id"),
        chosen_gap.alias("gap_s"),
    )


NEAREST_PURCHASE_TO_ERROR_ORACLE = f"""
    WITH base AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(epoch(ts)) AS BIGINT)
                         * {NEAREST_KEY_BASE} + event_id END AS pkey
        FROM events
        WHERE event_type IN ('error', 'purchase')
    ), passes AS (
        SELECT *,
               LAST_VALUE(pkey IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_key,
               FIRST_VALUE(pkey IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS fwd_key
        FROM base
    )
    SELECT event_id AS error_id, user_id,
           strftime(to_timestamp(sec), '%Y-%m-%d %H:%M:%S') AS error_ts,
           CASE WHEN use_back THEN back_key % {NEAREST_KEY_BASE}
                ELSE fwd_key % {NEAREST_KEY_BASE} END AS purchase_id,
           CASE WHEN use_back THEN back_gap ELSE fwd_gap END AS gap_s
    FROM (
        SELECT *,
               back_key // {NEAREST_KEY_BASE} - sec AS back_gap,
               fwd_key // {NEAREST_KEY_BASE} - sec AS fwd_gap,
               back_key IS NOT NULL AND (fwd_key IS NULL
                   OR -(back_key // {NEAREST_KEY_BASE} - sec)
                      <= fwd_key // {NEAREST_KEY_BASE} - sec) AS use_back
        FROM passes
        WHERE event_type = 'error'
    )
"""


# --- interval-union coverage (Allen-algebra union length) -------------

ACTIVE_WINDOW_S = 300  # each event keeps its user "active" 5 minutes


def user_activity_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user UNION length of activity intervals: every event opens
    a [sec, sec + ACTIVE_WINDOW_S) window; overlapping windows merge,
    and the report gives each user's merged-island count, total
    covered seconds, first-to-last span, and coverage ratio — the
    interval-union measure behind "active time" metrics (and the
    dual of the gaps-and-islands calendar scan, here on REAL interval
    overlap rather than day adjacency).

    Scale shape: delegates to the generic sweep-line operator
    (``operators/intervals.interval_union_coverage``): one
    user-partitioned sort carries the running-max island flags and
    both downstream aggregates — the whole plan is one exchange on
    user_id, no inequality join, no self-join, no interval
    explosion. The operator is property-tested against brute-force
    union on ARBITRARY interval sets (ties, nesting, touching), not
    just these fixed-width windows.
    """
    from global_superstore_data_warehouse_spark.operators.intervals import (
        interval_union_coverage,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + ACTIVE_WINDOW_S).alias("e"),
    )
    return interval_union_coverage(
        ev, ["user_id"], "s", "e", order_cols=["event_id"]
    )


USER_ACTIVITY_COVERAGE_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS s,
               CAST(floor(epoch(ts)) AS BIGINT) + {ACTIVE_WINDOW_S} AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                    THEN 1 ELSE 0 END AS new_island
        FROM (
            SELECT *,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max_e
            FROM ev
        )
    ), numbered AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ), islands AS (
        SELECT user_id, island,
               COUNT(*) AS n_events,
               MIN(s) AS i_start, MAX(e) AS i_end
        FROM numbered GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_end - i_start) AS BIGINT) AS covered_s,
           CAST(MAX(i_end) - MIN(i_start) AS BIGINT) AS span_s,
           ROUND(SUM(i_end - i_start) * 1.0
                 / (MAX(i_end) - MIN(i_start)), 6) AS coverage_ratio
    FROM islands
    GROUP BY user_id
"""


# --- mergeable distinct-count sketches --------------------------------


def daily_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HyperLogLog sketches — the 100 TB distinct-count
    posture that ``events_hourly_approx_users`` (one-shot
    approx_count_distinct) can't give you: per-DAY HLL sketches of
    the active-user set are built once (this is what a production
    pipeline PERSISTS), then every aggregation level derives by
    sketch UNION, never by re-scanning events — here each day
    reports its own estimate plus the running cumulative distinct
    users over all days so far, a quantity that is NOT a sum of
    daily counts (repeat users collapse) and would otherwise need a
    growing re-scan per day.

    Plan: one event scan → days-sized sketch table
    (``hll_sketch_agg``, map-side combined binary state); the
    cumulative union is ``hll_union_agg`` over a running window of
    the DAYS-sized frame. Engine-specific estimates → registered
    without a SQL oracle (rows-only driver check); the pytest bound
    proves each estimate within HLL tolerance of the exact count.
    """
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.hll_sketch_estimate("sk").alias("daily_users_est"),
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
                "cumulative_users_est"
            ),
        )
        .orderBy("day")
    )


# Audit tolerances: HLL sketch (lgConfigK=12 -> rsd ~1.6%) and
# approx_count_distinct (rsd=0.01) both get a few-sigma relative
# bound plus a small-count absolute slack; the flags (not the
# engine-specific estimates) are the hash-checked output.
SKETCH_REL_TOL = 0.05
SKETCH_ABS_TOL = 5.0


def _within(est, exact):
    """1 iff |est - exact| <= max(rel*exact, abs) — deterministic."""
    bound = F.greatest(
        F.lit(SKETCH_REL_TOL) * exact.cast("double"), F.lit(SKETCH_ABS_TOL)
    )
    return (F.abs(est.cast("double") - exact.cast("double")) <= bound).cast(
        "int"
    )


def daily_user_sketch_rollup_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable twin of ``daily_user_sketch_rollup``: joins
    the HLL estimates to the EXACT daily and cumulative distinct
    user counts and emits integer pass flags on the ±tolerance
    bound. The engine-specific estimates never appear in the output
    — only the exact counts (oracle-expressible) and the flags
    (which the oracle asserts are 1), so the driver's hash compare
    becomes a real error-bound check on the sketch path instead of
    the rows-only record the sketch query itself gets.

    Exact cumulative distinct without a growing re-scan: each user
    contributes to the running count from their FIRST day only, so
    cumulative(day) = running sum of first-day user counts — one
    extra user-sized aggregate, then days-sized arithmetic."""
    est = daily_user_sketch_rollup(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
    )
    exact_daily = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_daily_users")
    )
    new_by_day = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    exact = (
        exact_daily.join(new_by_day, "day", "left")
        .select(
            "day",
            "exact_daily_users",
            F.sum(F.coalesce("new_users", F.lit(0)))
            .over(w)
            .alias("exact_cumulative_users"),
        )
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            "n_events",
            F.col("exact_daily_users").cast("bigint").alias(
                "exact_daily_users"
            ),
            F.col("exact_cumulative_users").cast("bigint").alias(
                "exact_cumulative_users"
            ),
            _within(F.col("daily_users_est"), F.col("exact_daily_users")).alias(
                "daily_ok"
            ),
            _within(
                F.col("cumulative_users_est"),
                F.col("exact_cumulative_users"),
            ).alias("cumulative_ok"),
        )
        .orderBy("day")
    )


DAILY_USER_SKETCH_ROLLUP_AUDIT_ORACLE = """
    WITH ev AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id
        FROM events
    ), daily AS (
        SELECT day,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_daily_users
        FROM ev GROUP BY day
    ), firsts AS (
        SELECT MIN(day) AS day, user_id FROM ev GROUP BY user_id
    ), new_by_day AS (
        SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day
    )
    SELECT d.day,
           CAST(d.n_events AS BIGINT) AS n_events,
           CAST(d.exact_daily_users AS BIGINT) AS exact_daily_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (
               ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS exact_cumulative_users,
           1 AS daily_ok,
           1 AS cumulative_ok
    FROM daily d LEFT JOIN new_by_day n ON n.day = d.day
    ORDER BY d.day
"""


def events_hourly_approx_users_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable twin of ``events_hourly_approx_users``: the
    HLL++ hourly estimate joined to the exact hourly distinct count,
    reduced to the exact count plus an integer pass flag on the
    ±tolerance bound (same audit contract as
    ``daily_user_sketch_rollup_audit``)."""
    est = events_hourly_approx_users(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        )
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        est.join(exact, "hour_start")
        .select(
            "hour_start",
            "n_events",
            F.col("exact_users").cast("bigint").alias("exact_users"),
            _within(F.col("approx_users"), F.col("exact_users")).alias(
                "approx_ok"
            ),
        )
        .orderBy("hour_start")
    )


EVENTS_HOURLY_APPROX_USERS_AUDIT_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS hour_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS approx_ok
    FROM events
    GROUP BY 1
    ORDER BY 1
"""


# --- mergeable count-min sketch (heavy-hitter counts) -----------------

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 128  # cells per row
CMS_TOPK = 20  # heavy hitters probed


def _cms_cell(i: int, key):
    """Row-``i`` count-min cell of ``key``: 60-bit md5-prefix hash of
    'cm{i}|{key}' mod width — the same seeded-md5 primitive the
    minhash/fastss family shares with its DuckDB oracles."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cm{i}|"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT-MIN sketch — the frequency companion to the
    HLL distinct-count rollup (daily_user_sketch_rollup) and the
    binned-quantile rollup: per-DAY depth x width cell-count grids of
    per-user event counts are the persisted state; the all-time
    sketch derives by CELL-SUM merge (never a re-scan), and any key's
    estimated count reads as min over rows of its hashed cell. Unlike
    HLL the md5-seeded sketch is fully DETERMINISTIC, so the oracle
    recomputes the identical grid DIRECTLY from raw rows and
    hash-equality proves merge(day sketches) == direct — the
    mergeability invariant itself. The classic guarantee (est >=
    exact, est <= exact + (e/width)*N w.h.p.) is pinned in pytest.

    Plan: one scan -> (day, row, cell) partial-agg'd counts (the
    persisted sketch table, |days| x depth x width rows max); cell-sum
    merge to one depth x width grid (tiny, broadcast); the exact
    top-k (the verification probe set — at 100 TB you'd probe
    candidate keys, not recompute exact counts) joins the broadcast
    grid on (row, cell) and takes min over rows. No UDFs, no
    all-pairs, sketch size independent of N."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    cells = ev.select(
        "day",
        F.posexplode(
            F.array(*[_cms_cell(i, F.col("user_id")) for i in range(CMS_DEPTH)])
        ).alias("i", "cell"),
    )
    day_sketch = cells.groupBy("day", "i", "cell").agg(
        F.count(F.lit(1)).alias("c")
    )  # <- the persisted per-day state
    cms = day_sketch.groupBy("i", "cell").agg(
        F.sum("c").alias("c")
    )  # <- sketch MERGE: cell-sum only
    topk = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(CMS_TOPK)
    )
    probes = topk.select(
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_cell(i, F.col("user_id")) for i in range(CMS_DEPTH)])
        ).alias("i", "cell"),
    )
    return (
        probes.join(F.broadcast(cms), ["i", "cell"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


COUNTMIN_HEAVY_HITTERS_ORACLE = f"""
    WITH grid AS (
        SELECT t.i AS i,
               ('0x' || substr(md5('cm' || t.i || '|' || user_id), 1, 15))::BIGINT
                   % {CMS_WIDTH} AS cell,
               COUNT(*) AS c
        FROM events, range({CMS_DEPTH}) t(i)
        GROUP BY 1, 2
    ), topk AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events
        GROUP BY user_id ORDER BY exact_cnt DESC, user_id LIMIT {CMS_TOPK}
    ), probes AS (
        SELECT k.user_id, k.exact_cnt, t.i AS i,
               ('0x' || substr(md5('cm' || t.i || '|' || k.user_id), 1, 15))::BIGINT
                   % {CMS_WIDTH} AS cell
        FROM topk k, range({CMS_DEPTH}) t(i)
    )
    SELECT p.user_id, p.exact_cnt,
           MIN(g.c) AS cms_est,
           MIN(g.c) - p.exact_cnt AS overcount
    FROM probes p JOIN grid g USING (i, cell)
    GROUP BY p.user_id, p.exact_cnt
"""


# --- deterministic approximate distinct (KMV) --------------------------

KMV_K = 32


def daily_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MINIMUM-VALUES approximate distinct users per day — the
    approximate-distinct path that, unlike HLL
    (``daily_user_sketch_rollup``, engine-specific binaries,
    rows-only driver check), IS cross-engine deterministic: hashes
    are the repo's 60-bit md5 primitive, the sketch is the k smallest
    distinct hashes per day, and the estimator is the textbook
    (k-1)/h_(k) (with the exact count used verbatim when a day has
    <= k distinct users — the sketch then contains the whole set).
    The DuckDB oracle recomputes the identical estimate, so the
    driver hash-checks an APPROXIMATE algorithm exactly. Output is
    self-auditing: exact count, estimate, and relative error per day
    (expected ~1/sqrt(k) ≈ 18%; bounds pinned in pytest).

    Scale shape: one scan → (day, hash) distinct (shuffle on day+h),
    per-day bottom-k via one rank window (k rows survive per day —
    the sketch is k longs per day, mergeable by keep-k-smallest-of-
    union, same discipline as the CMS/quantile/HLL family). The
    estimate itself derives from integer hashes with one exact-double
    fold, so no float-summation-order tolerance games."""
    ev = load(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    # null keys out BEFORE the rank window: a null hash would sort
    # NULLS FIRST in Spark but NULLS LAST in DuckDB and silently skew
    # the k-th minimum
    d = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), h.alias("h"))
        .distinct()
    )
    w_rank = Window.partitionBy("day").orderBy("h")
    w_all = Window.partitionBy("day")
    r = d.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "cnt", F.count(F.lit(1)).over(w_all)
    )
    agg = r.groupBy("day").agg(
        F.max("cnt").alias("exact_users"),
        F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))).alias("kth"),
    )
    est = F.when(
        F.col("exact_users") <= KMV_K, F.col("exact_users")
    ).otherwise(
        F.floor(
            F.lit(float(KMV_K - 1)) * F.lit(2.0**60) / F.col("kth")
        ).cast("long")
    )
    return agg.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "exact_users",
        est.alias("kmv_users"),
    ).withColumn(
        "rel_error",
        F.round(
            F.abs(F.col("kmv_users") - F.col("exact_users"))
            / F.col("exact_users"),
            6,
        ),
    )


DAILY_USERS_KMV_ORACLE = f"""
    WITH d AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day,
               ('0x' || substr(md5('kmv|' || user_id), 1, 15))::BIGINT AS h
        FROM events
        WHERE user_id IS NOT NULL
    ), r AS (
        SELECT day, h,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn,
               COUNT(*) OVER (PARTITION BY day) AS cnt
        FROM d
    ), a AS (
        SELECT day, MAX(cnt) AS exact_users,
               MAX(CASE WHEN rn <= {KMV_K} THEN h END) AS kth
        FROM r GROUP BY day
    ), e AS (
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(exact_users AS BIGINT) AS exact_users,
               CASE WHEN exact_users <= {KMV_K} THEN CAST(exact_users AS BIGINT)
                    ELSE CAST(FLOOR({KMV_K - 1}.0 * POW(2.0, 60) / kth) AS BIGINT)
               END AS kmv_users
        FROM a
    )
    SELECT day, exact_users, kmv_users,
           ROUND(ABS(kmv_users - exact_users) * 1.0 / exact_users, 6)
               AS rel_error
    FROM e
"""


# --- temporal split leakage audit --------------------------------------

SPLIT_CUTOFF = "2024-01-15 12:00:00"  # train < cutoff <= test (mid-activity, mid-month)


def temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval hygiene for TIME-based splits — the temporal sibling of
    ``split_near_dup_leakage`` (which audits content leakage): when a
    model trains on events before {SPLIT_CUTOFF} and evaluates after,
    any SESSION that SPANS the cutoff leaks future behavior into
    train-side features (session length, session value, "ended with
    purchase" labels all peek past the boundary). Per session-start
    day this reports the session census — clean-train, clean-test,
    spanning — plus the exact number of post-cutoff events sitting
    inside spanning sessions (the leaked rows a quarantine must
    drop). Sessions are the registered 10-minute-gap sessionization
    (``events_sessionize``), so the audit grades the same object the
    feature pipeline builds.

    Scale shape: one per-user lag/cumsum window (shuffle on user_id
    only), one session-level groupBy, one day-level rollup; the
    output is days-sized. All counts are exact integers.
    """
    cutoff = F.unix_timestamp(F.lit(SPLIT_CUTOFF))
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec").over(order) > SESSION_GAP_SECONDS, 1
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        )
        + 1,
    )
    sessions = flagged.groupBy("user_id", "session_seq").agg(
        F.min("sec").alias("smin"),
        F.max("sec").alias("smax"),
        F.sum((F.col("sec") >= cutoff).cast("long")).alias("n_post"),
    )
    classed = sessions.select(
        F.date_format(F.from_unixtime("smin"), "yyyy-MM-dd").alias("day"),
        (F.col("smax") < cutoff).cast("long").alias("is_train"),
        (F.col("smin") >= cutoff).cast("long").alias("is_test"),
        ((F.col("smin") < cutoff) & (F.col("smax") >= cutoff))
        .cast("long")
        .alias("is_spanning"),
        F.when(
            (F.col("smin") < cutoff) & (F.col("smax") >= cutoff),
            F.col("n_post"),
        )
        .otherwise(F.lit(0))
        .alias("leaked"),
    )
    return classed.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("is_train").alias("n_train_sessions"),
        F.sum("is_test").alias("n_test_sessions"),
        F.sum("is_spanning").alias("n_spanning_sessions"),
        F.sum("leaked").alias("leaked_future_events"),
    )


TEMPORAL_SPLIT_AUDIT_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch(ts)::BIGINT AS sec FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN sec - LAG(sec) OVER w > {SESSION_GAP_SECONDS}
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), seq AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                   AS session_seq
        FROM flagged
    ), sessions AS (
        SELECT user_id, session_seq,
               MIN(sec) AS smin, MAX(sec) AS smax,
               SUM(CASE WHEN sec >= epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                   THEN 1 ELSE 0 END) AS n_post
        FROM seq GROUP BY user_id, session_seq
    ), classed AS (
        SELECT strftime(to_timestamp(smin), '%Y-%m-%d') AS day,
               CASE WHEN smax < epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                    THEN 1 ELSE 0 END AS is_train,
               CASE WHEN smin >= epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                    THEN 1 ELSE 0 END AS is_test,
               CASE WHEN smin < epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                     AND smax >= epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                    THEN 1 ELSE 0 END AS is_spanning,
               CASE WHEN smin < epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                     AND smax >= epoch(TIMESTAMP '{SPLIT_CUTOFF}')
                    THEN n_post ELSE 0 END AS leaked
        FROM sessions
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(is_train) AS BIGINT) AS n_train_sessions,
           CAST(SUM(is_test) AS BIGINT) AS n_test_sessions,
           CAST(SUM(is_spanning) AS BIGINT) AS n_spanning_sessions,
           CAST(SUM(leaked) AS BIGINT) AS leaked_future_events
    FROM classed
    GROUP BY day
"""


# --- A/B conversion z-test ---------------------------------------------

AB_Z_CRITICAL = 1.959964  # two-sided 95%
AB_CONV_VALUE = 150.0  # conversion = a purchase at/above this value


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between a
    deterministic 50/50 user split (variant = user_id parity — the
    hash-bucket assignment an experimentation platform uses): the
    one-row readout every A/B dashboard computes. Conversion = user
    emitted at least one 'purchase' event.

    Engine-exact: counts are exact integers; rates and the pooled
    z-statistic are single fixed-shape double expressions over those
    integers (no float aggregation anywhere), rounded at the end.

    Scale shape: one scan → per-user any-purchase flag (groupBy
    user_id, map-side combined) → two-group aggregate → one row.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= AB_CONV_VALUE)
            ).cast("int")
        ).alias("conv")
    )
    g = per_user.groupBy((F.col("user_id") % 2 == 0).alias("is_a")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    row = g.agg(
        F.sum(F.when(F.col("is_a"), F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("is_a"), F.col("c"))).alias("conv_a"),
        F.sum(F.when(~F.col("is_a"), F.col("n"))).alias("n_b"),
        F.sum(F.when(~F.col("is_a"), F.col("c"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = F.when(se != 0.0, (p_a - p_b) / se)  # NULL when zero variance
    return row.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.round(p_a, 6).alias("rate_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        F.coalesce(
            (F.abs(z) > AB_Z_CRITICAL).cast("int"), F.lit(0)
        ).alias("significant"),
    )


AB_TEST_REPORT_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ), g AS (
        SELECT (user_id % 2 = 0) AS is_a, COUNT(*) AS n, SUM(conv) AS c
        FROM per_user GROUP BY 1
    ), row_ AS (
        SELECT SUM(CASE WHEN is_a THEN n END) AS n_a,
               SUM(CASE WHEN is_a THEN c END) AS conv_a,
               SUM(CASE WHEN NOT is_a THEN n END) AS n_b,
               SUM(CASE WHEN NOT is_a THEN c END) AS conv_b
        FROM g
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(conv_a AS BIGINT) AS conv_a,
           ROUND(conv_a / n_a, 6) AS rate_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_b AS BIGINT) AS conv_b,
           ROUND(conv_b / n_b, 6) AS rate_b,
           ROUND(CASE WHEN sqrt((conv_a + conv_b) / (n_a + n_b)
                        * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) <> 0.0
                 THEN (conv_a / n_a - conv_b / n_b)
                      / sqrt((conv_a + conv_b) / (n_a + n_b)
                        * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) END, 6) AS z_score,
           CAST(CASE WHEN ABS(COALESCE(CASE WHEN sqrt((conv_a + conv_b) / (n_a + n_b)
                        * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) <> 0.0
                 THEN (conv_a / n_a - conv_b / n_b)
                      / sqrt((conv_a + conv_b) / (n_a + n_b)
                        * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) END, 0.0)) > {AB_Z_CRITICAL}
                THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM row_
"""


# --- stream-stream interval join, driver-oracle-proven ----------------

JOIN_HORIZON_MINUTES = 30


def stream_interval_join_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The stream-STREAM interval join
    (``streaming/events.py::click_purchase_join_stream``) executed
    end-to-end under the driver's oracle gate: the events source is
    read as a STREAM, clicks and purchases (two watermarked streaming
    sides) interval-join on (user, purchase within 30 min after
    click), the joined rows drain through one availableNow pass into
    a memory sink, and the result folds to a per-purchase audit —
    click count, seconds from first/last click to the purchase — that
    the oracle reproduces with a plain batch SQL join. A hash match
    proves the streaming join (state buffering + watermark eviction
    machinery included) emitted EXACTLY the batch-semantics row set,
    the equivalence Structured Streaming promises for inner
    stream-stream joins.

    Scale shape: both streams partition by user_id; state holds only
    rows younger than watermark + horizon (the join's time bound
    makes eviction provable — the unbounded-state failure mode is the
    reason this operator family usually DOESN'T run at 100 TB/day).
    Purchases with no click in the horizon do not appear (inner
    join) — the left-outer variant would emit them with NULLs once
    the watermark passes.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from global_superstore_data_warehouse_spark.streaming.events import (
        click_purchase_join_stream,
        read_events_stream,
    )

    ckpt = _tempfile.mkdtemp(prefix="stream-ivj-ckpt-")
    try:
        stream = click_purchase_join_stream(
            read_events_stream(spark, sf_dir),
            horizon_minutes=JOIN_HORIZON_MINUTES,
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("stream_ivj_attr")
            .outputMode("append")
            .option("checkpointLocation", f"{ckpt}/q")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        joined = spark.sql("SELECT * FROM stream_ivj_attr")
        out = (
            joined.groupBy("purchase_id")
            .agg(
                F.first("user_id").alias("user_id"),
                F.count(F.lit(1)).alias("n_clicks"),
                F.max(
                    F.col("purchase_ts").cast("long")
                    - F.col("click_ts").cast("long")
                ).alias("first_click_lag_s"),
                F.min(
                    F.col("purchase_ts").cast("long")
                    - F.col("click_ts").cast("long")
                ).alias("last_click_lag_s"),
            )
            .select(
                "purchase_id",
                "user_id",
                F.col("n_clicks").cast("bigint").alias("n_clicks"),
                F.col("first_click_lag_s").cast("bigint").alias("first_click_lag_s"),
                F.col("last_click_lag_s").cast("bigint").alias("last_click_lag_s"),
            )
        )
        # result is purchase-with-clicks-sized; eager-checkpoint so
        # the memory-sink view and checkpoint dir can be reclaimed
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(ckpt, ignore_errors=True)


STREAM_INTERVAL_JOIN_ATTRIBUTION_ORACLE = f"""
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(MAX(FLOOR(EPOCH(p.ts)) - FLOOR(EPOCH(c.ts))) AS BIGINT)
               AS first_click_lag_s,
           CAST(MIN(FLOOR(EPOCH(p.ts)) - FLOOR(EPOCH(c.ts))) AS BIGINT)
               AS last_click_lag_s
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL {JOIN_HORIZON_MINUTES} MINUTE
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
"""


# --- stream-static enrichment + streamed dedup, driver-oracle-proven --

# Reference-data weights for the enrichment join: binary-exact doubles
# (k/2) so value * weight is ONE correctly-rounded multiply in either
# engine, plus the same weight in exact integer per-mille for the
# hash-stable aggregate arithmetic.
TYPE_WEIGHTS = {
    "click": (0.5, 500),
    "view": (1.0, 1000),
    "signup": (1.5, 1500),
    "purchase": (2.5, 2500),
    "error": (2.0, 2000),
}


def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC broadcast enrichment
    (``streaming/events.py::enrich_events_stream``) executed under
    the driver's oracle gate: the events stream left-joins a
    reference weight dimension per micro-batch (stateless broadcast
    hash join — the shape reference lookups take at 100 TB/day),
    drains availableNow, and folds to a per-type audit the oracle
    rebuilds with CASE weights. Sums ride exact integer cents x
    per-mille weights (no float accumulation); the float
    ``weighted_value`` column the streaming operator computes is
    pinned by its MAX (order-independent), proving the enriched
    column itself flowed through the stream.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from global_superstore_data_warehouse_spark.streaming.events import (
        enrich_events_stream,
        read_events_stream,
    )

    dim = spark.createDataFrame(
        [(t, w, pm) for t, (w, pm) in sorted(TYPE_WEIGHTS.items())],
        "event_type string, type_weight double, weight_permille int",
    )
    ckpt = _tempfile.mkdtemp(prefix="stream-enrich-ckpt-")
    try:
        q = (
            enrich_events_stream(read_events_stream(spark, sf_dir), dim)
            .writeStream.format("memory")
            .queryName("stream_enrich")
            .outputMode("append")
            .option("checkpointLocation", f"{ckpt}/q")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.sql("SELECT * FROM stream_enrich")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("bigint")
                .alias("sum_value_cents"),
                F.first("weight_permille").cast("int").alias("weight_permille"),
                F.max("weighted_value").alias("max_weighted_value"),
            )
            .withColumn(
                "sum_weighted_micro10",
                (F.col("sum_value_cents") * F.col("weight_permille")).cast(
                    "bigint"
                ),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(ckpt, ignore_errors=True)


def _weight_case_sql(col: str, idx: int) -> str:
    return (
        "CASE " + " ".join(
            f"WHEN {col} = '{t}' THEN {vals[idx]}"
            for t, vals in sorted(TYPE_WEIGHTS.items())
        ) + " END"
    )


STREAM_STATIC_ENRICHMENT_ORACLE = f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents,
           CAST({_weight_case_sql('event_type', 1)} AS INTEGER)
               AS weight_permille,
           MAX(ROUND(value * {_weight_case_sql('event_type', 0)}, 6))
               AS max_weighted_value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                * {_weight_case_sql('event_type', 1)} AS BIGINT)
               AS sum_weighted_micro10
    FROM events
    GROUP BY event_type
"""


def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streamed exactly-once repair
    (``streaming/events.py::dedup_events_stream``,
    ``dropDuplicatesWithinWatermark``) executed under the driver's
    oracle gate: the events table is staged DUPLICATED (every event
    delivered twice — the at-least-once source contract), streamed
    through the watermark-scoped dedup, drained availableNow, and
    folded to per-type counts/sums the oracle computes from the
    ORIGINAL table. A hash match proves the operator dropped exactly
    the redelivered copies. The duplicated feed is staged as one
    file so the drain sees one micro-batch — cross-batch redelivery
    beyond the watermark horizon is allowed to re-emit BY DESIGN
    (that is the "within watermark" contract; the horizon is sized
    to the source's redelivery window in production).
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from global_superstore_data_warehouse_spark.streaming.events import (
        dedup_events_stream,
        read_events_stream,
    )

    work = _tempfile.mkdtemp(prefix="stream-dedup-")
    try:
        ev = load(spark, sf_dir, "events")
        ev.unionAll(ev).coalesce(1).write.parquet(f"{work}/src")
        q = (
            dedup_events_stream(
                read_events_stream(spark, f"{work}/src", "*.parquet")
            )
            .writeStream.format("memory")
            .queryName("stream_dedup")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.sql("SELECT * FROM stream_dedup")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("bigint")
                .alias("sum_value_cents"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


STREAM_DEDUP_EXACTLY_ONCE_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events
    GROUP BY event_type
"""


# --- KMV audience overlap (theta-sketch-style set intersection) --------

KMV_OVERLAP_K = 32
_KMV_SALTS = 16


def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-day PURCHASER-audience overlap estimated from
    K-MINIMUM-VALUES sketches — the set-OPERATION side of the KMV
    family (``daily_users_kmv`` estimates cardinality of ONE set;
    this estimates Jaccard/intersection of TWO sets from their
    sketches alone, the theta-sketch trick behind every "audience
    overlap" product query). For each day pair (d, d+1): exact
    |A|, |B|, |A∩B| and Jaccard, next to the estimate computed ONLY
    from the two k-min sketches — take the k smallest of the sketch
    UNION, count how many of those appear in BOTH sketches, divide.
    Deterministic md5 hashing makes the "approximate" estimator
    hash-checkable against the DuckDB oracle; the abs-error column
    is the audit (expected ~1/sqrt(k); pinned in pytest).

    Scale shape: the sketch build is the TWO-LEVEL k-min — partial
    per (day, salt=h%16) keep-k-smallest (map-side combined,
    bounded k longs per salt), then per day merge = sort+slice of
    ≤16k longs. Identical result to a global per-day rank (the k
    global minima survive salting: each salt keeps ITS k smallest ⊇
    its share of the global k), without the single-reducer-per-day
    hot spot a rank window has at 100 TB. The pair join and all
    array work ride rows of ~k longs; the exact-intersection audit
    is one user-keyed self-join (drop it in production and the whole
    plan never touches a row wider than the sketch).
    """
    ev = load(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    du = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .select(F.to_date("ts").alias("day"), "user_id", h.alias("h"))
        .distinct()
    )
    partial = du.groupBy("day", F.pmod("h", F.lit(_KMV_SALTS)).alias("salt")).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, KMV_OVERLAP_K).alias("arr"),
        F.count(F.lit(1)).alias("n_part"),
    )
    days = partial.groupBy("day").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("arr"))), 1, KMV_OVERLAP_K
        ).alias("sk"),
        F.sum("n_part").alias("n"),
    )
    a = days.select(
        F.col("day").alias("day_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
    )
    b = days.select(
        F.col("day").alias("day_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        F.broadcast(b), F.date_add(F.col("day_a"), 1) == F.col("day_b")
    )
    uni = F.slice(
        F.array_sort(F.array_union("sk_a", "sk_b")), 1, KMV_OVERLAP_K
    )
    inter = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.date_add(F.col("x.day"), 1) == F.col("y.day")),
        )
        .groupBy(F.col("x.day").alias("day_a"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    est = pairs.withColumn("uni", uni).select(
        "day_a",
        "day_b",
        "n_a",
        "n_b",
        F.size("uni").alias("k_eff"),
        # hashes are distinct within every sketch, so array_intersect
        # is exact set intersection: union-top-k ∩ sk_a ∩ sk_b
        F.size(
            F.array_intersect(F.array_intersect("sk_a", "sk_b"), F.col("uni"))
        ).alias("nx"),
    )
    return (
        est.join(inter, "day_a", "left")
        .select(
            F.date_format("day_a", "yyyy-MM-dd").alias("day_a"),
            F.date_format("day_b", "yyyy-MM-dd").alias("day_b"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("bigint").alias("n_inter"),
            "k_eff",
            "nx",
        )
        .withColumn(
            "exact_jaccard",
            F.round(
                F.col("n_inter")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .withColumn(
            "kmv_jaccard", F.round(F.col("nx") * 1.0 / F.col("k_eff"), 6)
        )
        .withColumn(
            "abs_err",
            F.round(F.abs(F.col("kmv_jaccard") - F.col("exact_jaccard")), 6),
        )
        .drop("k_eff", "nx")
    )


KMV_AUDIENCE_OVERLAP_ORACLE = f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id,
               ('0x' || substr(md5('kmv|' || user_id), 1, 15))::BIGINT AS h
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), sk AS (
        SELECT day, h,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM du
    ), sks AS (
        SELECT day, h FROM sk WHERE rn <= {KMV_OVERLAP_K}
    ), days AS (
        SELECT day, COUNT(*) AS n FROM du GROUP BY day
    ), pairs AS (
        SELECT a.day AS day_a, b.day AS day_b, a.n AS n_a, b.n AS n_b
        FROM days a JOIN days b ON b.day = a.day + 1
    ), uni0 AS (
        SELECT p.day_a, s.h FROM pairs p JOIN sks s ON s.day = p.day_a
        UNION
        SELECT p.day_a, s.h FROM pairs p JOIN sks s ON s.day = p.day_b
    ), uni AS (
        SELECT day_a, h,
               ROW_NUMBER() OVER (PARTITION BY day_a ORDER BY h) AS rn
        FROM uni0
    ), x AS (
        SELECT u.day_a,
               COUNT(*) AS k_eff,
               SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                   THEN 1 ELSE 0 END) AS nx
        FROM uni u
        JOIN pairs p ON p.day_a = u.day_a
        LEFT JOIN sks sa ON sa.day = u.day_a AND sa.h = u.h
        LEFT JOIN sks sb ON sb.day = p.day_b AND sb.h = u.h
        WHERE u.rn <= {KMV_OVERLAP_K}
        GROUP BY u.day_a
    ), inter AS (
        SELECT a.day AS day_a, COUNT(*) AS n_inter
        FROM du a JOIN du b
          ON b.user_id = a.user_id AND b.day = a.day + 1
        GROUP BY a.day
    )
    SELECT strftime(p.day_a, '%Y-%m-%d') AS day_a,
           strftime(p.day_b, '%Y-%m-%d') AS day_b,
           CAST(p.n_a AS BIGINT) AS n_a,
           CAST(p.n_b AS BIGINT) AS n_b,
           CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
           ROUND(COALESCE(i.n_inter, 0) * 1.0
                 / (p.n_a + p.n_b - COALESCE(i.n_inter, 0)), 6)
               AS exact_jaccard,
           ROUND(x.nx * 1.0 / x.k_eff, 6) AS kmv_jaccard,
           ROUND(ABS(ROUND(x.nx * 1.0 / x.k_eff, 6)
                     - ROUND(COALESCE(i.n_inter, 0) * 1.0
                             / (p.n_a + p.n_b - COALESCE(i.n_inter, 0)), 6)),
                 6) AS abs_err
    FROM pairs p
    JOIN x ON x.day_a = p.day_a
    LEFT JOIN inter i ON i.day_a = p.day_a
"""


# --- Kaplan-Meier survival curve (right-censored churn) ----------------


def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival estimate of user lifetime (days between
    a user's first and last event), with RIGHT-CENSORING done
    properly: users still active on the corpus' final day are
    censored — they leave the risk set at their observed lifetime
    without counting as churn, which naive "retention curve"
    divisions get wrong. One row per distinct churn time t:
    at-risk count n_t, churn count d_t, and the product-limit
    survival S(t) = prod_{t_i <= t} (1 - d_i/n_i).

    Integer-exactness: S is carried in 1e6 micro-units through the
    recursion S_i = floor(S_{i-1} * (n_i - d_i) / n_i) — the product
    stays <= 1e6 * n (far under 2^63), the floor uses the
    (x - x%n)/n idiom, and both engines run the IDENTICAL integer
    recursion (Spark: one array fold; DuckDB: a recursive CTE), so
    a multiplicative chain of ~dozens of ratios is hash-stable with
    no float accumulation anywhere.

    Plan shape: one scan → per-user (first, last) groupBy; the
    lifetime histogram is a <= max-lifetime-sized frame (bounded by
    the calendar, NOT the user count); the risk counts come from one
    cumulative window over that tiny frame, and the recursion folds
    over the churn-time array (one row per distinct death time) in
    a single projection. At 100 TB the only corpus-scale stage is
    the first groupBy.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"), F.max(F.to_date("ts")).alias("ld")
    )
    mx = u.agg(F.max("ld").alias("m"))
    lt = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("ld", "fd").alias("t"),
        (F.col("ld") < F.col("m")).cast("long").alias("churned"),
    )
    per_t = lt.groupBy("t").agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    total = per_t.agg(F.sum("c").alias("tot"))
    risked = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn("n", F.col("tot") - (F.sum("c").over(w_cum) - F.col("c")))
        .filter(F.col("d") > 0)
        .select("t", "n", "d")
    )
    arr = risked.agg(
        F.array_sort(F.collect_list(F.struct("t", "n", "d"))).alias("arr")
    )
    out_t = "array<struct<t:int,n:bigint,d:bigint,s:bigint>>"

    def step(acc, x):
        prod = acc["s"] * (x["n"] - x["d"])
        new_s = ((prod - prod % x["n"]) / x["n"]).cast("long")
        return F.struct(
            new_s.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["t"].alias("t"),
                        x["n"].alias("n"),
                        x["d"].alias("d"),
                        new_s.alias("s"),
                    )
                ),
            ).alias("out"),
        )

    folded = arr.select(
        F.aggregate(
            "arr",
            F.struct(
                F.lit(1000000).cast("long").alias("s"),
                F.array().cast(out_t).alias("out"),
            ),
            step,
            lambda acc: acc["out"],
        ).alias("km")
    )
    return folded.select(F.explode("km").alias("x")).select(
        F.col("x.t").alias("lifetime_days"),
        F.col("x.n").alias("at_risk"),
        F.col("x.d").alias("churned"),
        F.col("x.s").alias("survival_micro"),
        F.round(F.col("x.s") / 1e6, 6).alias("survival"),
    )


KAPLAN_MEIER_CHURN_ORACLE = """
    WITH RECURSIVE u AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
               MAX(CAST(ts AS DATE)) AS ld
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ), mx AS (
        SELECT MAX(ld) AS m FROM u
    ), lt AS (
        SELECT CAST(ld - fd AS INTEGER) AS t,
               CASE WHEN ld < (SELECT m FROM mx) THEN 1 ELSE 0 END
                   AS churned
        FROM u
    ), per_t AS (
        SELECT t, SUM(churned) AS d, COUNT(*) AS c FROM lt GROUP BY t
    ), risked AS (
        SELECT t, d, c,
               (SELECT SUM(c) FROM per_t)
               - (SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c)
                   AS n
        FROM per_t
    ), deaths AS (
        SELECT t, n, d, ROW_NUMBER() OVER (ORDER BY t) AS i
        FROM risked WHERE d > 0
    ), km AS (
        SELECT 0 AS i, CAST(1000000 AS BIGINT) AS s
        UNION ALL
        SELECT d.i,
               (km.s * (d.n - d.d) - (km.s * (d.n - d.d)) % d.n) // d.n
        FROM km JOIN deaths d ON d.i = km.i + 1
    )
    SELECT d.t AS lifetime_days,
           CAST(d.n AS BIGINT) AS at_risk,
           CAST(d.d AS BIGINT) AS churned,
           CAST(k.s AS BIGINT) AS survival_micro,
           ROUND(k.s / 1e6, 6) AS survival
    FROM deaths d JOIN km k ON k.i = d.i
"""


# --- daily OHLC bars over purchase values -------------------------------


def daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over purchase event values — the time-series
    downsampling primitive (finance bars, metric rollups): per day,
    the FIRST value (open), max (high), min (low), LAST value
    (close), count, and the summed volume in exact cents. Open/close
    are order statistics in EVENT order with a total (ts, event_id)
    tie-break — ``first()``-style aggregates without the
    nondeterminism Spark's first() has under re-partitioning.

    Plan shape: two day-partitioned rank windows (bounded partitions)
    + one groupBy(day); the windows and the aggregate share the
    day-hash shuffle. Sum rides exact integer cents.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            F.to_date("ts").alias("day"), "ts", "event_id", "value"
        )
    )
    w_a = Window.partitionBy("day").orderBy(F.asc("ts"), F.asc("event_id"))
    w_d = Window.partitionBy("day").orderBy(F.desc("ts"), F.desc("event_id"))
    flagged = ev.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trades"),
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias(
                "open_v"
            ),
            F.round(F.max("value"), 4).alias("high_v"),
            F.round(F.min("value"), 4).alias("low_v"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias(
                "close_v"
            ),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("volume_cents"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_trades",
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "volume_cents",
        )
    )


DAILY_OHLC_ORACLE = """
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, ts, event_id, value
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ), flagged AS (
        SELECT day, value,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY ts ASC, event_id ASC) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM ev
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open_v,
           ROUND(MAX(value), 4) AS high_v,
           ROUND(MIN(value), 4) AS low_v,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close_v,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS volume_cents
    FROM flagged
    GROUP BY day
"""
