"""Corpus statistics & sampling operators (beyond-reference,
training-data pipeline): vocabulary building, deterministic sampling,
grouped quantiles, and hierarchical rollups.

Sampling uses md5-bucket hashing rather than rand(): the same rows
are selected on any engine, any partitioning, any run — the property
a reproducible training-data pipeline actually needs (rand(seed) is
partition-placement-dependent in Spark and non-portable to the
oracle).

Scale notes: vocab top-k is explode → map-side partial count →
TakeOrderedAndProject (no global sort materialization); sampling is
a pure filter (pushed to the scan, no shuffle); quantiles use exact
percentile per group here for oracle parity with approx_percentile
as the documented 100 TB swap-in; rollup is one pass with Spark's
native partial-aggregated ROLLUP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import stats_gated
from global_superstore_data_warehouse_spark.functions.text import tokens
from global_superstore_data_warehouse_spark.plans.views import SALES, SALES_SQL

VOCAB_K = 100
SAMPLE_PCT = 10  # percent


def _md5_bucket(c: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket from the md5 of a key —
    bit-identical in Spark and DuckDB."""
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % buckets).cast("int")


def _md5_bucket_sql(expr: str, buckets: int = 100) -> str:
    return f"CAST(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {buckets} AS INTEGER)"


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus vocabulary: explode tokens, count, take the K
    most frequent (ties broken lexicographically)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(VOCAB_K)
    )


VOCAB_TOPK_ORACLE = f"""
    SELECT t.token, COUNT(*) AS freq
    FROM documents d,
         LATERAL (SELECT unnest(string_split_regex(trim(d.text), '\\s+')) AS token) t
    WHERE t.token <> ''
    GROUP BY t.token
    ORDER BY freq DESC, t.token
    LIMIT {VOCAB_K}
"""


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible {SAMPLE_PCT}% document sample by md5 bucket of
    doc_id — a pure filter, engine- and partitioning-independent."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(_md5_bucket(F.col("doc_id")) < SAMPLE_PCT).select(
        "doc_id", "lang", "n_chars"
    )


DETERMINISTIC_SAMPLE_ORACLE = f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_md5_bucket_sql('doc_id')} < {SAMPLE_PCT}
"""


# per-language sampling rates: downsample the dominant language,
# keep the tail — the standard training-mix rebalancing move.
STRATA_RATES = {"en": 5, "es": 20, "de": 20}
DEFAULT_RATE = 50


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: each language keeps
    ``rate`` % of its documents, selected by the same md5 bucket."""
    docs = load(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_RATE)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("rate", rate)
        .filter(_md5_bucket(F.col("doc_id")) < F.col("rate"))
        .select("doc_id", "lang", "rate")
    )


_rate_sql = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in STRATA_RATES.items()
) + f" ELSE {DEFAULT_RATE} END"

STRATIFIED_SAMPLE_ORACLE = f"""
    SELECT doc_id, lang, CAST(rate AS INTEGER) AS rate
    FROM (SELECT doc_id, lang, {_rate_sql} AS rate FROM documents)
    WHERE {_md5_bucket_sql('doc_id')} < rate
"""


QUANTILES = [0.25, 0.5, 0.75, 0.95]


def priority_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value quantiles per order priority (linear
    interpolation — identical semantics to DuckDB quantile_cont).
    At 100 TB swap percentile() for approx_percentile(), documented
    accuracy tradeoff; the plan shape is unchanged."""
    orders = load(spark, sf_dir, "orders")
    qarr = F.expr(
        f"percentile(o_totalprice, array({', '.join(str(q) for q in QUANTILES)}))"
    )
    per_prio = orders.groupBy(
        F.col("o_orderpriority").alias("order_priority")
    ).agg(qarr.alias("qs"))
    return (
        per_prio.select(
            "order_priority", F.posexplode("qs").alias("idx", "quantile_value")
        )
        .select(
            "order_priority",
            F.element_at(F.array(*[F.lit(q) for q in QUANTILES]), F.col("idx") + 1).alias("quantile"),
            F.round("quantile_value", 4).alias("quantile_value"),
        )
        .orderBy("order_priority", "quantile")
    )


PRIORITY_PRICE_QUANTILES_ORACLE = f"""
    WITH per_prio AS (
        SELECT o_orderpriority AS order_priority,
               quantile_cont(o_totalprice, {QUANTILES}) AS qs
        FROM orders
        GROUP BY 1
    )
    SELECT order_priority,
           ({QUANTILES})[t.i] AS quantile,
           ROUND(qs[t.i], 4) AS quantile_value
    FROM per_prio, LATERAL (SELECT unnest(range(1, {len(QUANTILES) + 1})) AS i) t
    ORDER BY order_priority, quantile
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical year → quarter rollup of sales (native ROLLUP:
    one pass, partial-aggregated; NULL marks subtotal levels)."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )
    return (
        lineitem.join(stats_gated(orders, sf_dir, "orders"), lineitem.l_orderkey == orders.o_orderkey)
        .rollup("order_year", "order_quarter")
        .agg(
            F.round(F.sum(SALES()), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("order_quarter").asc_nulls_first(),
        )
    )


SALES_ROLLUP_ORACLE = f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(quarter(o.o_orderdate) AS INTEGER) AS order_quarter,
           ROUND(SUM({SALES_SQL}), 2) AS total_sales,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY ROLLUP(order_year, order_quarter)
    ORDER BY order_year ASC NULLS FIRST, order_quarter ASC NULLS FIRST
"""


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PRIORITY_COLS = ["urgent", "high", "medium", "not_specified", "low"]


def sales_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value matrix: years × order-priority columns via native
    ``pivot`` with an explicit value list (no extra distinct-values
    job, deterministic column order — the form that scales, since a
    data-driven pivot needs a full pre-scan)."""
    orders = load(spark, sf_dir, "orders")
    piv = (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renamed = piv.select(
        "order_year",
        *[F.col(f"`{p}`").alias(c) for p, c in zip(PRIORITIES, PRIORITY_COLS)],
    )
    return renamed.orderBy("order_year")


SALES_PIVOT_ORACLE = f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           {", ".join(
               f"ROUND(SUM(CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END), 2) AS {c}"
               for p, c in zip(PRIORITIES, PRIORITY_COLS)
           )}
    FROM orders
    GROUP BY 1
    ORDER BY 1
"""


MEASURES = ["quantity", "extendedprice", "discount", "tax"]


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): each lineitem row fans out to one row per
    measure via ``stack`` — the inverse of sales_pivot, and the shape
    feature-store exports use (long-form (entity, feature, value)).
    Narrow scan (5 cols), no shuffle until the presentation sort;
    summary-aggregated per measure to keep the checked output
    bounded."""
    lineitem = load(spark, sf_dir, "lineitem")
    stack_expr = "stack(4, " + ", ".join(
        f"'{m}', CAST(l_{m} AS DOUBLE)" for m in MEASURES
    ) + ") AS (measure, value)"
    long = lineitem.selectExpr("l_orderkey", "l_linenumber", stack_expr)
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
        .orderBy("measure")
    )


LINEITEM_MEASURES_UNPIVOT_ORACLE = """
    WITH long AS (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE) FROM lineitem
    )
    SELECT measure, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(AVG(value), 6) AS mean
    FROM long
    GROUP BY measure
    ORDER BY measure
"""


# --- TF-IDF top terms ------------------------------------------------

TFIDF_TOP_TERMS = 3


def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by smoothed TF-IDF
    (tf x (ln((N+1)/(df+1)) + 1), ties break lexicographically).

    Scale shape: two partial-aggregated shuffles (doc-term counts,
    then term document-frequencies); the df side is vocabulary-sized
    — orders of magnitude smaller than the corpus — so it rides back
    as a BROADCAST join. The tf frame feeds BOTH the df aggregation
    and the final join, and exchange reuse does not dedup the two
    subtrees under AQE here, so tf sits behind a (lazy)
    localCheckpoint — one corpus scan, one tokenize, one doc-term
    aggregation, shared by both branches. N is a 1-row broadcast.

    Engine parity: ln is evaluated on identical doubles in both
    engines and the score is rounded to 6 places; the fixed driver
    datasets make this deterministic (pinned by the oracle tests at
    two scale factors).
    """
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0)
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOP_TERMS)
    )


TFIDF_TOPK_TERMS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents d,
             LATERAL (SELECT unnest(string_split_regex(trim(d.text), '\\s+')) AS term) t
        WHERE t.term <> ''
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
        SELECT tf.doc_id, tf.term, CAST(tf.tf AS INTEGER) AS tf,
               ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                   AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    -- rank over the ROUNDED score, exactly like the Spark plan:
    -- ranking by the raw double would diverge whenever two distinct
    -- raws round to the same 6-decimal value
    SELECT doc_id, term, tf, tfidf,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {TFIDF_TOP_TERMS}
"""


# --- winsorized (robust) group statistics ----------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_segment_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-segment account-balance statistics: values are
    WINSORIZED — clipped to the segment's [p05, p95] — before the
    mean/stddev, so a handful of extreme balances can't swing the
    reported central tendency (the robust-aggregation step every
    metrics pipeline needs once data is big enough to contain
    garbage). Exact linear-interpolation percentiles (DuckDB
    quantile_cont semantics); at 100 TB swap percentile() for
    approx_percentile() with a stated accuracy, shape unchanged.

    Plan: one groupBy computes both clip bounds per segment, rides a
    broadcast back onto the scan (segment count is tiny), then one
    second groupBy aggregates the clipped values — two shuffles on
    the same small key domain, no window over the full table.
    """
    c = load(spark, sf_dir, "customer")
    bounds = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.expr(f"percentile(c_acctbal, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(c_acctbal, {WINSOR_HI})").alias("hi"),
    )
    clipped = c.join(
        F.broadcast(bounds), c.c_mktsegment == bounds.segment
    ).select(
        "segment",
        F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi")).alias(
            "bal"
        ),
        "c_acctbal",
    )
    return clipped.groupBy("segment").agg(
        F.count("*").cast("int").alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
        F.round(F.avg("bal"), 4).alias("winsorized_mean"),
        F.round(F.stddev_samp("bal"), 4).alias("winsorized_std"),
        F.sum((F.col("c_acctbal") != F.col("bal")).cast("int"))
        .cast("int")
        .alias("n_clipped"),
    )


WINSORIZED_SEGMENT_BALANCES_ORACLE = f"""
    WITH bounds AS (
        SELECT c_mktsegment AS segment,
               quantile_cont(c_acctbal, {WINSOR_LO}) AS lo,
               quantile_cont(c_acctbal, {WINSOR_HI}) AS hi
        FROM customer GROUP BY 1
    ), clipped AS (
        SELECT b.segment,
               LEAST(GREATEST(c.c_acctbal, b.lo), b.hi) AS bal,
               c.c_acctbal
        FROM customer c JOIN bounds b ON c.c_mktsegment = b.segment
    )
    SELECT segment,
           CAST(COUNT(*) AS INTEGER) AS n,
           ROUND(AVG(c_acctbal), 4) AS raw_mean,
           ROUND(AVG(bal), 4) AS winsorized_mean,
           ROUND(stddev_samp(bal), 4) AS winsorized_std,
           CAST(SUM(CASE WHEN c_acctbal <> bal THEN 1 ELSE 0 END) AS INTEGER)
               AS n_clipped
    FROM clipped
    GROUP BY segment
"""


# --- CUBE (all grouping-set combinations) -----------------------------


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over the FULL CUBE of (priority, status): all four
    grouping sets — per pair, per priority, per status, grand total —
    in one pass, with explicit GROUPING flags so consumers can tell a
    real NULL from a subtotal row (the reason labels also coalesce to
    'ALL'). Completes the grouping-sets family next to
    ``sales_rollup``'s hierarchy-only ROLLUP.

    Scale shape: Catalyst plans CUBE as one Expand (x4 here) over the
    partial-aggregated input — one scan, one shuffle; cost scales
    with the grouping-set count, which is why the cube stops at two
    dimensions (2^n sets).
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            # grouping() is an aggregate-context function: it must be
            # computed inside agg(), not a downstream select
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_priority",
            "g_status",
            "n_orders",
            "revenue",
        )
    )


SALES_CUBE_ORACLE = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


# --- BM25 retrieval ---------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_DOCS = 5
BM25_QUERIES = [
    (1, ["hash", "join", "table"]),
    (2, ["sort", "merge", "spark"]),
    (3, ["window", "agg", "stream"]),
]


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval: top-{BM25_TOP_DOCS} documents per query by
    Okapi BM25 (k1={BM25_K1}, b={BM25_B}; idf = ln(1 + (N-df+0.5)/
    (df+0.5))) over three fixed keyword queries — the ranked-search
    counterpart of ``tfidf_topk_terms``'s per-document term view.

    Engine-exact discipline: document length, term frequency, and
    document frequency are exact integers; avgdl is one double from
    two exact ints; each (query term, doc) contribution is computed
    with an identical expression tree in both engines and quantized
    to MICRO units — so the per-(query, doc) score is an exact
    INTEGER SUM over matched terms (never a float sum whose order
    Spark's partial aggregation could permute), and ranking ties
    break on doc_id.

    Scale shape: the inverted structure is (doc, term, tf) — one
    corpus scan behind a shared localCheckpoint feeding tf, dl, df;
    the query set and the vocabulary-sized df ride broadcasts; the
    only corpus-scale shuffle is the per-(query, doc) sum, whose
    input is already pruned to query terms by the broadcast
    semi-join. At 100 TB this is exactly a distributed inverted
    index probe: partition by term, prune to query terms, aggregate
    per doc.
    """
    docs = load(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    qrows = [(qid, t) for qid, ts in BM25_QUERIES for t in ts]
    queries = spark.createDataFrame(qrows, "query_id int, term string")

    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl
    )
    contrib = F.round(
        idf * (F.col("tf") * F.lit(BM25_K1 + 1.0) / denom) * F.lit(1000000.0)
    ).cast("long")

    scored = (
        tf.join(F.broadcast(queries), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BM25_TOP_DOCS)
        .select("query_id", "doc_id", "score_micro", "rank")
    )


def _bm25_query_values() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, ts in BM25_QUERIES for t in ts
    )
    return f"(VALUES {rows}) q(query_id, term)"


BM25_TOPK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents d,
             LATERAL (SELECT unnest(string_split_regex(trim(d.text), '\\s+')) AS term) t
        WHERE t.term <> ''
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
    ), q AS (
        SELECT * FROM {_bm25_query_values()}
    ), contrib AS (
        SELECT q.query_id, tf.doc_id,
               CAST(ROUND(
                   ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * {BM25_K1 + 1.0}
                      / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                         + {BM25_B} * dl.dl / (s.total_dl / s.n_docs))))
                   * 1000000.0) AS BIGINT) AS c
        FROM tf
        JOIN q USING (term)
        JOIN dl USING (doc_id)
        JOIN df USING (term)
        CROSS JOIN stats s
    )
    SELECT query_id, doc_id,
           CAST(SUM(c) AS BIGINT) AS score_micro,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY SUM(c) DESC, doc_id ASC) AS INTEGER) AS rank
    FROM contrib
    GROUP BY query_id, doc_id
    QUALIFY rank <= {BM25_TOP_DOCS}
"""


# --- exact-integer Pearson correlation matrix --------------------------

CORR_MEASURES = [
    ("quantity", "CAST(l_quantity AS BIGINT)"),
    ("price_cents", "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"),
    ("discount_bp", "CAST(ROUND(l_discount * 10000) AS BIGINT)"),
    ("tax_bp", "CAST(ROUND(l_tax * 10000) AS BIGINT)"),
]


def measure_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between the lineitem measures —
    the feature-redundancy screen a modeling pipeline runs before
    training — computed so the hash can't drift: every measure is
    quantized to an exact integer unit (cents / basis points), the
    five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are exact
    INTEGER sums (Spark's built-in ``corr`` and a naive AVG both sum
    doubles in partition order — the exposure the gapfill fix in
    this round measured), and r is derived from them at the very end
    with one fixed-shape double expression.

    Scale shape: ONE scan aggregates all 14 sufficient statistics
    map-side into a single row; the 6-pair matrix is unpivoted from
    that row — no joins, no windows, nothing grows with the corpus.
    Long sums hold to ~3e16 per statistic (fine at these SFs); the
    100 TB variant casts the products to decimal(38,0) — same plan,
    wider accumulator.
    """
    li = load(spark, sf_dir, "lineitem")
    cols = {name: F.expr(sql) for name, sql in CORR_MEASURES}
    aggs = [F.count(F.lit(1)).alias("n")]
    names = [name for name, _ in CORR_MEASURES]
    # per-row products stay in int64 (<= ~1e14) but their SUMS pass
    # 9.2e18 already at sf0.1 — accumulate the product sums in
    # decimal(38,0) (DuckDB's BIGINT sums widen to HUGEINT on their
    # own, same exact integers)
    for name in names:
        aggs.append(F.sum(cols[name]).alias(f"s_{name}"))
        aggs.append(
            F.sum((cols[name] * cols[name]).cast("decimal(38,0)")).alias(
                f"ss_{name}"
            )
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum((cols[a] * cols[b]).cast("decimal(38,0)")).alias(
                    f"sp_{a}_{b}"
                )
            )
    row = li.agg(*aggs)

    # the derived products (n·Σxy, Σx·Σy, ...) exceed int64 already at
    # sf0.1 (~1.8e22) — widen to decimal(38,0) for the exact derived
    # integers, cast to double only at the end (DuckDB reaches the
    # same exact integers via HUGEINT; the int→double conversion is
    # the same nearest-double in both)
    def d(c: str) -> F.Column:
        return F.col(c).cast("decimal(38,0)")

    pairs = None
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            num = (d("n") * d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")).cast(
                "double"
            )
            da = (d("n") * d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}")).cast(
                "double"
            )
            db = (d("n") * d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}")).cast(
                "double"
            )
            one = row.select(
                F.lit(a).alias("measure_x"),
                F.lit(b).alias("measure_y"),
                F.col("n").cast("bigint").alias("n"),
                F.round(num / (F.sqrt(da) * F.sqrt(db)), 6).alias("pearson_r"),
            )
            pairs = one if pairs is None else pairs.unionAll(one)
    return pairs


def _corr_oracle() -> str:
    names = [name for name, _ in CORR_MEASURES]
    exprs = dict(CORR_MEASURES)
    stats = ["COUNT(*) AS n"]
    for name in names:
        stats.append(f"SUM({exprs[name]}) AS s_{name}")
        stats.append(f"SUM({exprs[name]} * {exprs[name]}) AS ss_{name}")
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            stats.append(f"SUM({exprs[a]} * {exprs[b]}) AS sp_{a}_{b}")
    selects = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            selects.append(
                f"""SELECT '{a}' AS measure_x, '{b}' AS measure_y,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)
             / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))
                * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))), 6)
           AS pearson_r
    FROM stats"""
            )
    return (
        "WITH stats AS (SELECT " + ", ".join(stats) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(selects)
    )


MEASURE_CORRELATIONS_ORACLE = _corr_oracle()


# --- mutual information between categorical columns --------------------

MI_PAIRS = [
    ("c_mktsegment", "c_nationkey"),
    ("c_mktsegment", "acctbal_band"),
    ("c_nationkey", "acctbal_band"),
]
MI_BAND = 1000


def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between customer categorical columns (the
    dependence screen feature selection runs where Pearson only sees
    linear numeric relationships): MI(X;Y) = Σ p(x,y) ln(p(x,y) /
    (p(x)p(y))) over the joint contingency table; 0 iff independent.
    Pairs: segment x nation, segment x balance band, nation x band.

    Engine-exact: all probabilities are ratios of exact counts; each
    CELL's contribution is computed with one fixed-shape double
    expression and quantized to NANO units, so the per-pair total is
    an exact integer sum over cells — the float-sum-order trap (the
    gapfill lesson) can't bite, and ln appears only on count ratios
    identical in both engines.

    Scale shape: one scan per pair builds the joint contingency
    table (map-side combined, |X| x |Y| rows); marginals derive from
    the joint by a second cells-sized aggregation — the raw table is
    never re-scanned; windows over cells-sized frames only.
    """
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").cast("string").alias("c_mktsegment"),
        F.col("c_nationkey").cast("string").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") / MI_BAND)
        .cast("long")
        .cast("string")
        .alias("acctbal_band"),
    )
    out = None
    for xc, yc in MI_PAIRS:
        joint = cust.groupBy(
            F.col(xc).alias("x"), F.col(yc).alias("y")
        ).agg(F.count(F.lit(1)).alias("nxy"))
        wx = Window.partitionBy("x")
        wy = Window.partitionBy("y")
        wall = Window.partitionBy()
        cells = joint.select(
            "nxy",
            F.sum("nxy").over(wx).alias("nx"),
            F.sum("nxy").over(wy).alias("ny"),
            F.sum("nxy").over(wall).alias("n"),
        )
        contrib = F.round(
            (F.col("nxy") / F.col("n"))
            * F.log(
                (F.col("nxy") * F.col("n"))
                / (F.col("nx") * F.col("ny"))
            )
            * F.lit(1000000000.0)
        ).cast("long")
        one = cells.agg(
            F.lit(xc).alias("col_x"),
            F.lit(yc).alias("col_y"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(contrib).alias("mi_nano"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def _mi_oracle() -> str:
    parts = []
    sql_cols = {
        "c_mktsegment": "CAST(c_mktsegment AS VARCHAR)",
        "c_nationkey": "CAST(c_nationkey AS VARCHAR)",
        "acctbal_band": (
            f"CAST(CAST(FLOOR(c_acctbal / {MI_BAND}) AS BIGINT) AS VARCHAR)"
        ),
    }
    for xc, yc in MI_PAIRS:
        parts.append(
            f"""SELECT '{xc}' AS col_x, '{yc}' AS col_y,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(ROUND((nxy / n) * ln((nxy * n) / (nx * ny))
            * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi_nano
FROM (
    SELECT nxy,
           SUM(nxy) OVER (PARTITION BY x) AS nx,
           SUM(nxy) OVER (PARTITION BY y) AS ny,
           SUM(nxy) OVER () AS n
    FROM (
        SELECT {sql_cols[xc]} AS x, {sql_cols[yc]} AS y,
               COUNT(*) AS nxy
        FROM customer GROUP BY 1, 2
    )
)"""
        )
    return "\nUNION ALL\n".join(parts)


MUTUAL_INFORMATION_ORACLE = _mi_oracle()


# --- exact percentiles WITHOUT a total sort (histogram refinement) ----

PCTL_PERMILLE = (500, 950, 990)  # P50 / P95 / P99
PCTL_BUCKETS = 1024
PCTL_NARROW_MAX = 100_000  # rows below which the final rank step runs


def exact_percentile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics of ``l_extendedprice`` (P50/P95/P99 as
    k-th smallest, k = 1 + (n * permille) // 1000 - adjusted below)
    computed by ITERATIVE HISTOGRAM REFINEMENT instead of a total
    sort — the selection algorithm that finds an exact quantile of
    100 TB in a few scans: bucket the current [lo, hi] candidate
    range into {PCTL_BUCKETS} equi-width bins, count per bin
    (map-side-combined, bins-sized result), locate the bin holding
    the k-th element, recurse into it. Candidate mass shrinks ~1000x
    per pass, so two passes take 600k rows to <100k-row slices; the
    final exact rank runs a window ONLY over the narrowed slice.
    ``percentile()`` (exact, sort-based) and ``approx_percentile``
    (sketch, bounded error) bracket this from either side — this is
    the scan-bounded EXACT middle the repo's quantile family lacked:
    no full sort, no approximation.

    Driver state is scalars only (per-pass bin counts for the three
    targets, <= 3 * {PCTL_BUCKETS} longs). The kth-smallest
    definition (discrete, type-1) makes the oracle a plain
    ORDER BY ... LIMIT 1 OFFSET k-1 per target — exact value
    equality, no interpolation arithmetic to drift.
    """
    col = "l_extendedprice"
    li = load(spark, sf_dir, "lineitem").select(F.col(col).alias("v"))
    li = li.localCheckpoint(eager=True)  # 3 refinement passes reuse it
    n = li.count()
    out_rows = []
    for perm in PCTL_PERMILLE:
        k = 1 + (n - 1) * perm // 1000  # 1-indexed kth smallest
        lo, hi = [float(x) for x in li.agg(F.min("v"), F.max("v")).first()]
        rank_in_range = k  # rank of the target within (candidates)
        cand = li
        cand_n = n
        while cand_n > PCTL_NARROW_MAX and hi > lo:
            width = (hi - lo) / PCTL_BUCKETS
            # the filter below reuses this EXACT expression, so the
            # narrowed slice always holds precisely the rows the
            # histogram counted into the chosen bin (a boundary
            # re-derivation like `v >= lo + b*width` could disagree
            # with floor() in the last float ulp and corrupt the rank)
            bin_of = F.least(
                F.lit(PCTL_BUCKETS - 1),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            )
            binned = (
                cand.select(bin_of.alias("b")).groupBy("b").count().collect()
            )
            counts = {r["b"]: r["count"] for r in binned}
            acc = 0
            for b in range(PCTL_BUCKETS):
                c = counts.get(b, 0)
                if acc + c >= rank_in_range:
                    rank_in_range -= acc
                    prev = cand
                    cand = cand.filter(bin_of == b).localCheckpoint(
                        eager=True
                    )
                    # eager=True just materialized the new slice, so
                    # the superseded one's cached blocks are dead
                    # weight for the rest of the session — release
                    # them (li itself is reused by the other targets)
                    if prev is not li:
                        prev.unpersist()
                    lo = lo + b * width
                    hi = hi if b == PCTL_BUCKETS - 1 else lo + width
                    cand_n = c
                    break
                acc += c
            else:  # pragma: no cover - counts always cover the rank
                break
        kth = (
            cand.sort("v")
            .limit(rank_in_range)
            .agg(F.max("v"))
            .first()[0]
        )
        if cand is not li:
            cand.unpersist()
        out_rows.append((perm, int(k), float(kth)))
    li.unpersist()  # result below is a literal frame; nothing depends on it
    return spark.createDataFrame(
        out_rows, "permille int, k bigint, value double"
    )


EXACT_PERCENTILE_TWOPASS_ORACLE = f"""
    WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
    targets AS (
        SELECT p.perm, 1 + (n.n - 1) * p.perm // 1000 AS k
        FROM (VALUES {", ".join(f"({p})" for p in PCTL_PERMILLE)}) p(perm)
        CROSS JOIN n
    ),
    ranked AS (
        SELECT l_extendedprice AS v,
               ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS r
        FROM lineitem
    )
    SELECT CAST(t.perm AS INTEGER) AS permille,
           CAST(t.k AS BIGINT) AS k,
           r.v AS value
    FROM targets t JOIN ranked r ON r.r = t.k
"""


# --- quantile normalization (rank matching to the pooled reference) ----


def quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION of each source's document-length
    distribution onto the pooled corpus distribution — the
    rank-matching transform (microarray-normalization classic, and
    the score-calibration trick for making per-source quality
    scores comparable before a global threshold): a doc at
    within-source rank r of n_s maps to the pooled value at rank
    ceil(r * N / n_s). After the transform every source has (up to
    rank granularity) the SAME marginal distribution, so one global
    cutoff treats sources fairly even when one source's scorer runs
    hot.

    Exactness: both ranks are integers, the target rank is the
    integer ceil idiom (r*N + n_s - 1) DIV n_s — no float quantile
    interpolation anywhere; ties order by (value, doc_id), a total
    order both engines share.

    Scale shape: the per-source rank is a window partitioned by
    source (bounded partitions); the POOLED rank reuses
    ``add_surrogate_key_auto`` — a global window at test scale, the
    range-partition + offset path past 5M rows, so no single-reducer
    sort at 100 TB; the final step is one equi-join on the target
    rank.
    """
    from global_superstore_data_warehouse_spark.operators.keys import (
        add_surrogate_key_auto,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w_r = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("source")
    s = d.withColumn("src_rank", F.row_number().over(w_r)).withColumn(
        "n_s", F.count(F.lit(1)).over(w_n)
    )
    g = add_surrogate_key_auto(d, ["n_chars", "doc_id"], name="k").select(
        F.col("k"), F.col("n_chars").alias("norm_chars")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    with_target = s.crossJoin(F.broadcast(tot)).withColumn(
        "target_rank",
        F.expr("(src_rank * n + n_s - 1) div n_s").cast("long"),
    )
    return (
        with_target.join(g, with_target.target_rank == g.k)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("src_rank").cast("bigint").alias("src_rank"),
            "target_rank",
            "norm_chars",
        )
    )


QUANTILE_NORMALIZATION_ORACLE = """
    WITH d AS (
        SELECT doc_id, source, n_chars FROM documents
    ), s AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS src_rank,
               COUNT(*) OVER (PARTITION BY source) AS n_s
        FROM d
    ), g AS (
        SELECT n_chars AS norm_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS k
        FROM d
    ), tot AS (
        SELECT COUNT(*) AS n FROM d
    )
    SELECT s.doc_id, s.source, s.n_chars,
           CAST(s.src_rank AS BIGINT) AS src_rank,
           CAST((s.src_rank * t.n + s.n_s - 1) // s.n_s AS BIGINT)
               AS target_rank,
           g.norm_chars
    FROM s CROSS JOIN tot t
    JOIN g ON g.k = (s.src_rank * t.n + s.n_s - 1) // s.n_s
"""


# --- leave-one-out target encoding (leakage-safe, smoothed) ------------

TE_SMOOTHING = 10  # pseudo-observations pulled toward the global prior


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of the customer market segment
    against the label "customer has placed an urgent-priority
    order" — the categorical-feature encoder done the leakage-safe
    way: each row's own label is SUBTRACTED from its group sum
    before the rate is formed (plain mean encoding leaks the label
    into the feature and inflates validation scores), and the rate
    is smoothed toward the global prior with {TE_SMOOTHING}
    pseudo-observations (Micci-Barreca 2001).

    Exactness: enc_i = (sum_g - y_i + m * prior) / (n_g - 1 + m)
    with prior = p/n is computed as ONE integer ratio by multiplying
    through by n — ((sum_g - y_i)*n + m*p) over ((n_g - 1 + m)*n) —
    floored to 1e6 micro-units via the same integer idiom both
    engines share. No float division until the display column.

    Plan shape: label build is one orders groupBy(custkey); the
    group stats are a segment-sized aggregate broadcast back; the
    global (p, n) is a broadcast 1-row frame. One fact scan, one
    dimension join, zero windows.
    """
    labels = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                (F.col("o_orderpriority") == "1-URGENT").cast("long")
            ).alias("y")
        )
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = cust.join(
        labels, cust.c_custkey == labels.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    grp = rows.groupBy("c_mktsegment").agg(
        F.sum("y").alias("sum_g"), F.count(F.lit(1)).alias("n_g")
    )
    tot = rows.agg(F.sum("y").alias("p"), F.count(F.lit(1)).alias("n"))
    # magnitude note: 1e6 * sum_g * n tops out ~2e18 at sf10 — inside
    # BIGINT; past that, swap n for a 1e6-floored prior (documented,
    # same idiom) rather than widening to DECIMAL
    m = TE_SMOOTHING
    enc_micro = F.expr(
        f"1000000 * ((sum_g - y) * n + {m} * p) "
        f"div ((n_g - 1 + {m}) * n)"
    )
    return (
        rows.join(F.broadcast(grp), "c_mktsegment")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("y").cast("int").alias("y"),
            enc_micro.cast("bigint").alias("enc_micro"),
        )
        .withColumn("enc", F.round(F.col("enc_micro") / 1e6, 6))
    )


TARGET_ENCODING_LOO_ORACLE = f"""
    WITH labels AS (
        SELECT o_custkey,
               MAX(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1 ELSE 0 END) AS y
        FROM orders GROUP BY o_custkey
    ), rows_ AS (
        SELECT c.c_custkey, c.c_mktsegment, COALESCE(l.y, 0) AS y
        FROM customer c LEFT JOIN labels l ON l.o_custkey = c.c_custkey
    ), grp AS (
        SELECT c_mktsegment, SUM(y) AS sum_g, COUNT(*) AS n_g
        FROM rows_ GROUP BY c_mktsegment
    ), tot AS (
        SELECT SUM(y) AS p, COUNT(*) AS n FROM rows_
    )
    SELECT r.c_custkey,
           r.c_mktsegment AS segment,
           CAST(r.y AS INTEGER) AS y,
           CAST(1000000 * ((g.sum_g - r.y) * t.n + {TE_SMOOTHING} * t.p)
                // ((g.n_g - 1 + {TE_SMOOTHING}) * t.n) AS BIGINT)
               AS enc_micro,
           ROUND((1000000 * ((g.sum_g - r.y) * t.n + {TE_SMOOTHING} * t.p)
                // ((g.n_g - 1 + {TE_SMOOTHING}) * t.n)) / 1e6, 6) AS enc
    FROM rows_ r
    JOIN grp g ON g.c_mktsegment = r.c_mktsegment
    CROSS JOIN tot t
"""


# --- deterministic Poisson bootstrap confidence interval ----------------

BOOT_B = 200  # resamples
# Draw-derivation modulus: the largest prime below 2^48. Each order
# hashes ONCE (md5 -> two independent 48-bit seeds h1, h2); resample
# j's uniform draw is then u_j = (h1*(2j+1) + h2*j) mod BOOT_P —
# pure integer codegen, no per-resample hashing. For j != j' the
# seed->draw map (h1,h2) -> (u_j, u_j') is a bijection mod the prime
# (determinant j'-j != 0), so the B draws per order are PAIRWISE
# INDEPENDENT exactly — ample for bootstrap order statistics.
# Known (accepted) higher-order structure: u_j reduces to the
# arithmetic progression h1 + j*(2*h1 + h2) mod BOOT_P, so within one
# order u_{j+2} = 2*u_{j+1} - u_j (mod P) — triples and beyond are
# linearly dependent. Joint fidelity of the B resample means therefore
# rests on the CLT ACROSS orders (each order contributes an
# independent (h1,h2)), not on per-draw randomness within an order;
# that is exactly what a bootstrap CI of a SUM over many orders needs.
# If stronger joint independence is ever required, mix j nonlinearly
# (e.g. (h1 + j) * (h2 + j*j) mod P) — costs one extra multiply.
BOOT_P = 281_474_976_710_597  # = 2^48 - 59, prime
# FROZEN Poisson(1) CDF thresholds in mod-BOOT_P units:
# floor(P(X<=k) * BOOT_P) for k = 0..5 (weights cap at 6; identical
# literals in plan and oracle, so both engines draw the same w)
BOOT_POISSON_T48 = [
    103548857136039,
    207097714272078,
    258872142840097,
    276130285696104,
    280444821410106,
    281307728552906,
]


def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order total via
    the POISSON BOOTSTRAP (Chamandy et al., the single-pass resampling
    scheme built for distributed data: instead of drawing n rows with
    replacement per resample — impossible without global coordination
    — each row independently contributes Poisson(1) copies to each
    resample; resample sizes concentrate tightly around n). B={B}
    resamples in ONE scan: every order explodes into (resample,
    weight) pairs with the weight drawn DETERMINISTICALLY — ONE
    md5 per ORDER yields two 48-bit seeds (hex 1-12, 13-24); each
    resample j's uniform draw is the pairwise-independent
    multiply-mod-prime mix (h1*(2j+1) + h2*j) mod BOOT_P, cut by
    the frozen Poisson(1) CDF thresholds above — pure integer
    comparisons, so the "randomness" is engine-exact and the driver
    can hash-check a bootstrap.

    Exactness: order totals enter as integer cents; each resample
    mean is the integer ratio (1000 * sum_wx) DIV sum_w
    (milli-cents — magnitudes <= 1e16 at sf1, inside BIGINT); the CI
    endpoints are order statistics (ranks ceil(.025B), ceil(.975B))
    of those B integers — no float enters until the display columns.

    Plan shape: scan -> explode(B) -> groupBy(resample) partial-
    aggregated to B rows -> one B-row rank window. The explode
    multiplies the scan by B; production would bootstrap a measure
    column slice (two narrow columns), which is exactly what this
    plan reads.
    """
    # COST DISCIPLINE (this plan multiplies the scan by B):
    # 1) ONE md5 + TWO hex convs per ORDER (not per draw): the B
    #    per-resample draws derive from the two 48-bit seeds by
    #    multiply-mod-prime integer arithmetic (header comment above
    #    BOOT_P proves the draws pairwise independent). Round-11
    #    rewrite: the previous shape hashed md5 per (order, j) —
    #    B/2 hashes + B 12-hex convs per order dominated the 22 s
    #    sf0.1 runtime; this one is pure codegen after one hash.
    #    Max magnitude: h1*(2j+1) + h2*j < 2^48*399 + 2^48*199
    #    ~ 1.7e17 — comfortably inside BIGINT, no overflow in
    #    either engine (ANSI-safe).
    # 2) the Poisson cut is SIX inlined integer comparisons, NOT a
    #    higher-order array filter — zip_with/filter lambdas run
    #    interpreted and cost ~5x the whole md5 at 30M rows.
    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderkey"),
    )
    h = F.md5(F.concat(F.lit("boot|"), F.col("o_orderkey").cast("string")))

    def u48(start: int):
        return F.conv(F.substring("h", start, 12), 16, 10).cast("long")

    def w_of(u):
        out = F.lit(0)
        for t in BOOT_POISSON_T48:
            out = out + F.when(u >= F.lit(t), 1).otherwise(0)
        return out

    j_col = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    drawn = (
        o.withColumn("h", h)
        .select("cents", u48(1).alias("h1"), u48(13).alias("h2"))
        .select("cents", "h1", "h2", j_col)
        .select(
            "cents",
            "b",
            (
                (
                    F.col("h1") * (2 * F.col("b") + 1)
                    + F.col("h2") * F.col("b")
                )
                % F.lit(BOOT_P)
            ).alias("u"),
        )
    )
    res = (
        drawn.withColumn("w", w_of(F.col("u")))
        .groupBy("b")
        .agg(
            F.sum(F.col("w").cast("long") * F.col("cents")).alias("sum_wx"),
            F.sum("w").cast("long").alias("sum_w"),
        )
        .select(
            "b", F.expr("1000 * sum_wx div sum_w").alias("mean_mc")
        )
    )
    ranked = res.withColumn(
        "r", F.row_number().over(Window.orderBy("mean_mc", "b"))
    )
    lo_r = -(-25 * BOOT_B // 1000)  # ceil(0.025 * B)
    hi_r = -(-975 * BOOT_B // 1000)  # ceil(0.975 * B)
    point = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("1000 * sum(cents) div count(1)").alias("point_mc"),
    )
    ci = ranked.agg(
        F.max(F.when(F.col("r") == lo_r, F.col("mean_mc"))).alias("lo_mc"),
        F.max(F.when(F.col("r") == hi_r, F.col("mean_mc"))).alias("hi_mc"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_orders",
        F.round(F.col("point_mc") / 1e5, 6).alias("mean_total"),
        F.round(F.col("lo_mc") / 1e5, 6).alias("ci_lo"),
        F.round(F.col("hi_mc") / 1e5, 6).alias("ci_hi"),
        F.col("point_mc").cast("bigint").alias("point_mc"),
        F.col("lo_mc").cast("bigint").alias("lo_mc"),
        F.col("hi_mc").cast("bigint").alias("hi_mc"),
    )


bootstrap_revenue_ci.__doc__ = bootstrap_revenue_ci.__doc__.format(B=BOOT_B)

_BOOT_W_SQL = (
    "("
    + " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in BOOT_POISSON_T48
    )
    + ")"
)

BOOTSTRAP_REVENUE_CI_ORACLE = f"""
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ), seeded AS (
        SELECT cents,
               ('0x' || substr(md5('boot|' || o_orderkey), 1, 12))::BIGINT
                   AS h1,
               ('0x' || substr(md5('boot|' || o_orderkey), 13, 12))::BIGINT
                   AS h2
        FROM o
    ), drawn AS (
        SELECT cents, r.range AS b,
               (h1 * (2 * r.range + 1) + h2 * r.range) % {BOOT_P} AS u
        FROM seeded CROSS JOIN range({BOOT_B}) r
    ), res AS (
        SELECT b, 1000 * SUM({_BOOT_W_SQL} * cents)
                   // SUM({_BOOT_W_SQL}) AS mean_mc
        FROM drawn GROUP BY b
    ), ranked AS (
        SELECT mean_mc,
               ROW_NUMBER() OVER (ORDER BY mean_mc, b) AS r
        FROM res
    ), ci AS (
        SELECT MAX(CASE WHEN r = CAST(CEIL(0.025 * {BOOT_B}) AS INTEGER)
                   THEN mean_mc END) AS lo_mc,
               MAX(CASE WHEN r = CAST(CEIL(0.975 * {BOOT_B}) AS INTEGER)
                   THEN mean_mc END) AS hi_mc
        FROM ranked
    ), point AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               1000 * SUM(cents) // COUNT(*) AS point_mc
        FROM o
    )
    SELECT p.n_orders,
           ROUND(p.point_mc / 1e5, 6) AS mean_total,
           ROUND(c.lo_mc / 1e5, 6) AS ci_lo,
           ROUND(c.hi_mc / 1e5, 6) AS ci_hi,
           CAST(p.point_mc AS BIGINT) AS point_mc,
           CAST(c.lo_mc AS BIGINT) AS lo_mc,
           CAST(c.hi_mc AS BIGINT) AS hi_mc
    FROM point p CROSS JOIN ci c
"""
