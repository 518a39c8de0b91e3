"""Training-data curation operators (beyond-reference, LLM-pipeline
layer): Gopher-style repetition signals, concat-and-chunk sequence
packing, and a scalable as-of (event attribution) join.

All three follow the engine's scale rules:

- ``repetition_stats`` is a pure per-row projection (zero shuffles):
  repetition ratios come from array expressions over the token list,
  so the operator is embarrassingly parallel. Multiplicity counting
  is sort-and-scan (O(n log n) per row, functions/text.py
  ``max_multiplicity``); for book-length documents the explode +
  groupBy(doc_id, token) formulation is the documented swap-in,
  trading the per-row sort for one partial-aggregated shuffle.
- ``pack_chunks`` shuffles ONCE, on the shard key (``source``): the
  running token offset is a per-shard window cumsum, which is how
  packing runs at 100 TB (a global cumsum would serialize; packing
  within shards is also what keeps pack membership stable when new
  shards arrive). Order within a shard is md5(doc_id) — a
  deterministic pseudo-shuffle, so packs mix sources' documents
  without an RNG (re-runs are idempotent).
- ``asof_click_attribution`` is the union-window as-of shape: tag
  both event streams, sort once per user, and carry the last click
  forward with an IGNORE NULLS running window. One shuffle on
  user_id, running state is O(1) per row. The naive alternative — an
  inequality self-join purchase x click — explodes quadratically in
  events-per-user and cannot survey 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions import text as T
from global_superstore_data_warehouse_spark.plans.textops import ALL_TOKS_SQL

PACK_BUDGET = 256  # tokens per pack (context-window budget)


# --- Gopher-style repetition signals ---------------------------------

def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition ratios (the Gopher/MassiveText family
    of repetition filters): most-frequent-word share, most-frequent-
    bigram share, distinct-word share. High top-word / top-bigram
    fractions flag boilerplate and degenerate generations."""
    docs = load(spark, sf_dir, "documents")
    # tokenize ONCE in a standalone projection (textops._shingles
    # documents why: inlined splits re-evaluate per reference)
    tok = docs.select("doc_id", T.tokens("text").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    # sort-and-scan multiplicity (O(n log n)), not per-distinct
    # filter scans (O(distinct x n) interpreted HOF evals — measured
    # ~10x slower at sf0.1); identical integers, same oracle
    top_word_cnt = T.max_multiplicity(toks)
    # bigrams: zip the token list against itself shifted by one
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    top_bigram_cnt = T.max_multiplicity(bigrams)
    return tok.select(
        "doc_id",
        n.alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_unique_words"),
        F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 6).alias(
            "unique_word_frac"
        ),
        F.round(top_word_cnt / n.cast("double"), 6).alias("top_word_frac"),
        F.round(top_bigram_cnt / (n - 1).cast("double"), 6).alias(
            "top_bigram_frac"
        ),
    )


REPETITION_STATS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               {ALL_TOKS_SQL} AS toks,
               CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n
        FROM documents
    ), b AS (
        SELECT doc_id, toks, n,
               list_transform(range(1, n), i -> toks[i] || ' ' || toks[i + 1])
                   AS bigrams
        FROM t
    )
    SELECT doc_id,
           n AS n_words,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique_words,
           ROUND(len(list_distinct(toks)) / CAST(n AS DOUBLE), 6)
               AS unique_word_frac,
           ROUND(list_max(list_transform(list_distinct(toks),
                     t -> len(list_filter(toks, w -> w = t))))
                 / CAST(n AS DOUBLE), 6) AS top_word_frac,
           ROUND(list_max(list_transform(list_distinct(bigrams),
                     t -> len(list_filter(bigrams, w -> w = t))))
                 / CAST(n - 1 AS DOUBLE), 6) AS top_bigram_frac
    FROM b
"""


# --- concat-and-chunk sequence packing -------------------------------

def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document a pack id for concat-and-chunk training
    batches: within a shard (``source``), documents are laid out in a
    deterministic md5 order, the running token offset is a window
    cumsum, and pack_id = floor(start_offset / PACK_BUDGET) — i.e.
    the context window the document STARTS in. This is the standard
    GPT-style packing layout (documents concatenated, then cut every
    PACK_BUDGET tokens); a document may straddle a boundary, which
    the start_offset exposes to the downstream tokenizer."""
    docs = load(spark, sf_dir, "documents")
    n_tok = T.token_count("text")
    keyed = docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("order_key"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("order_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    return keyed.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(float(PACK_BUDGET))).cast("int").alias("pack_id"),
    )


PACK_CHUNKS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS order_key
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY order_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST(FLOOR((cum - n_tokens) / {float(PACK_BUDGET)}) AS INTEGER)
               AS pack_id
    FROM c
"""


# --- as-of attribution (union-window, not inequality join) -----------

def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent STRICTLY-PRIOR click by
    the same user (ties on ts break by event_id): the as-of /
    point-in-time join over event streams, built as one union-window
    pass — never as a purchase x click inequality join.

    Returns (purchase_id, user_id, click_id, micros_since_click);
    click columns are NULL for never-clicked users. The time delta is
    integer microseconds (not a float division) so the value is
    engine-exact."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "ts", "event_type")
    )
    prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    with_click = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(prior)
        .alias("click_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(prior)
        .alias("click_ts"),
    )
    return with_click.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias(
            "micros_since_click"
        ),
    )


# --- composite quality filter (C4/Gopher-style keep/drop) ------------

MIN_WORDS = 30
MIN_UNIQUE_FRAC = 0.4
MAX_TOP_WORD_FRAC = 0.15


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop decision per document (the C4/Gopher
    filter-pipeline shape): minimum length, minimum lexical
    diversity, maximum single-word repetition. Each rule is its own
    boolean column so downstream audits can attribute every drop;
    ``keep`` is their conjunction. Pure per-row projection — zero
    shuffles, composes with repetition_stats' expressions."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", T.tokens("text").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    uniq_frac = F.size(F.array_distinct(toks)) / n.cast("double")
    top_word_cnt = T.max_multiplicity(toks)  # see repetition_stats
    top_frac = top_word_cnt / n.cast("double")
    len_ok = n >= MIN_WORDS
    uniq_ok = uniq_frac >= MIN_UNIQUE_FRAC
    rep_ok = top_frac <= MAX_TOP_WORD_FRAC
    return tok.select(
        "doc_id",
        n.alias("n_words"),
        len_ok.alias("len_ok"),
        uniq_ok.alias("uniq_ok"),
        rep_ok.alias("rep_ok"),
        (len_ok & uniq_ok & rep_ok).alias("keep"),
    )


QUALITY_FILTER_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               {ALL_TOKS_SQL} AS toks,
               CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n
        FROM documents
    ), s AS (
        SELECT doc_id, n,
               len(list_distinct(toks)) / CAST(n AS DOUBLE) AS uniq_frac,
               list_max(list_transform(list_distinct(toks),
                   t2 -> len(list_filter(toks, w -> w = t2))))
                   / CAST(n AS DOUBLE) AS top_frac
        FROM t
    )
    SELECT doc_id, n AS n_words,
           n >= {MIN_WORDS} AS len_ok,
           uniq_frac >= {MIN_UNIQUE_FRAC} AS uniq_ok,
           top_frac <= {MAX_TOP_WORD_FRAC} AS rep_ok,
           (n >= {MIN_WORDS} AND uniq_frac >= {MIN_UNIQUE_FRAC}
            AND top_frac <= {MAX_TOP_WORD_FRAC}) AS keep
    FROM s
"""


# --- PII pseudonymization / generalization ---------------------------

# Documented TEST pepper (keeps the driver hash stable). The real
# control is the injectable ``pepper`` parameter below — production
# passes a secret-manager value, never this literal.
PII_PEPPER = "gsdw-pepper-v1"
ACCTBAL_BAND = 1000.0


def pii_pseudonymize_customers(
    spark: SparkSession, sf_dir: str, pepper: str = PII_PEPPER
) -> DataFrame:
    """Privacy pass before a table enters a training corpus:
    direct identifiers are replaced by a KEYED hash (md5 with an
    injectable pepper — same input maps to the same token so joins
    still work, but raw values are not recoverable without the
    pepper), and quasi-identifiers are generalized (account balance
    banded to $1000 buckets). Pure projection: zero shuffles, and the
    pseudonym is deterministic so re-runs are idempotent."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(F.concat(F.lit(pepper + "|"), F.col("c_name"))).alias(
            "name_token"
        ),
        F.floor(F.col("c_acctbal") / F.lit(ACCTBAL_BAND))
        .cast("int")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


PII_PSEUDONYMIZE_CUSTOMERS_ORACLE = f"""
    SELECT c_custkey,
           md5('{PII_PEPPER}|' || c_name) AS name_token,
           CAST(FLOOR(c_acctbal / {ACCTBAL_BAND}) AS INTEGER) AS acctbal_band,
           c_mktsegment
    FROM customer
"""


ASOF_CLICK_ATTRIBUTION_ORACLE = """
    WITH ev AS (
        SELECT event_id, user_id, ts, event_type
        FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS click_id,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS click_ts
        FROM ev
    )
    SELECT event_id AS purchase_id, user_id, click_id,
           epoch_us(ts) - epoch_us(click_ts) AS micros_since_click
    FROM w WHERE event_type = 'purchase'
"""


# --- benchmark decontamination (n-gram overlap) ----------------------

DECON_NGRAM = 5  # overlap unit: 5-token n-grams
EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" split


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile n-gram-overlap
    pass): a training document is CONTAMINATED if it shares any
    5-token n-gram with the held-out eval split — here derived
    deterministically as ``doc_id % 97 == 0`` so the query is
    oracle-checkable against static data. Returns every training doc
    with its shared-distinct-n-gram count and the contamination flag.

    Plan: both splits explode to (doc_id, gram) rows in one pass over
    the corpus; the eval side collapses to DISTINCT grams and rides a
    broadcast (an eval split is benchmark-sized — thousands of docs —
    even when the training side is 100 TB); the overlap is a
    broadcast semi-join + per-doc count, so the training corpus
    shuffles only its gram hits, never its text. If the eval set ever
    outgrows broadcast, the same plan shuffle-joins on the gram hash
    unchanged."""
    from global_superstore_data_warehouse_spark.plans.textops import _shingles

    docs = load(spark, sf_dir, "documents")
    # tokenize in a standalone projection — _shingles re-references
    # the array per gram position (its docstring has the O(N^2) math)
    tok = docs.select(
        "doc_id",
        (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"),
        T.tokens("text").alias("toks"),
    )
    grams = tok.select(
        "doc_id",
        "is_eval",
        F.explode(_shingles(F.col("toks"), DECON_NGRAM)).alias("gram"),
    )
    eval_grams = grams.filter("is_eval").select("gram").distinct()
    hits = (
        grams.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_ngrams"))
    )
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def _ngram_sql(toks: str, n: int) -> str:
    gram = " || ' ' || ".join(f"{toks}[i+{k}]" if k else f"{toks}[i]" for k in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {gram}) "
        "ELSE [] END"
    )


DECONTAMINATE_NGRAMS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {ALL_TOKS_SQL} AS toks FROM documents
    ), g AS (
        SELECT doc_id, unnest({_ngram_sql('toks', DECON_NGRAM)}) AS gram FROM t
    ), eval_g AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0
    ), hits AS (
        SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
        FROM g JOIN eval_g USING (gram)
        WHERE g.doc_id % {EVAL_MOD} <> 0
        GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared, 0) AS n_shared_ngrams,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {EVAL_MOD} <> 0
"""


# --- per-domain quota sampling ---------------------------------------

QUOTA_PER_SOURCE = 15


def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap (the corpus-mixing control every
    large-scale pipeline runs before training: no source may exceed
    its document budget): keep the first ``QUOTA_PER_SOURCE`` docs of
    each source in deterministic md5(doc_id) order — an unbiased,
    RNG-free pick that is stable across re-runs.

    Plan: one shuffle on source + a row_number window. At test scale
    a whole source fits one window partition; at 100 TB a hot domain
    would not — the documented swap-ins are (a) the two-phase top-K
    (per-partition top-K, then top-K of the K·P survivors — bounded
    state both phases) or (b) the md5-threshold approximate quota of
    ``stats.deterministic_sample`` when ±1% on the cap is acceptable."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "sample_rank")
    )


DOMAIN_QUOTA_SAMPLE_ORACLE = f"""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS INTEGER) AS sample_rank
    FROM documents
    QUALIFY sample_rank <= {QUOTA_PER_SOURCE}
"""


# --- end-to-end curation pipeline ------------------------------------

def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data flow in ONE plan: quality filter ->
    exact dedup (canonical = min doc_id per content fingerprint) ->
    concat-and-chunk packing of the survivors. Demonstrates that the
    curation operators compose without materialization barriers: the
    whole chain is a single Catalyst plan whose only shuffles are the
    fingerprint-dedup window and the per-shard packing window.

    At 100 TB each stage would typically persist (quarantine tables,
    dedup survivors) — but nothing in the shapes requires it, so an
    incremental run can fuse them exactly like this."""
    docs = load(spark, sf_dir, "documents")
    # tokenize ONCE in a standalone projection (see repetition_stats)
    tok = docs.select(
        "doc_id", "source", "text", T.tokens("text").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    uniq_frac = F.size(F.array_distinct(toks)) / n.cast("double")
    top_frac = T.max_multiplicity(toks) / n.cast("double")
    kept = tok.filter(
        (n >= MIN_WORDS)
        & (uniq_frac >= MIN_UNIQUE_FRAC)
        & (top_frac <= MAX_TOP_WORD_FRAC)
    )
    # exact dedup on the content fingerprint; min doc_id is canonical
    fp_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        kept.withColumn("__rn", F.row_number().over(fp_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # pack the survivors (same layout rules as pack_chunks);
    # n_tokens == size(toks) == token_count(text) by construction
    keyed = survivors.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("order_key"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("order_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return keyed.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(float(PACK_BUDGET))).cast("int").alias("pack_id"),
    )


CURATION_PIPELINE_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, source, text,
               {ALL_TOKS_SQL} AS toks,
               CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n
        FROM documents
    ), kept AS (
        SELECT doc_id, source, text, n
        FROM scored
        WHERE n >= {MIN_WORDS}
          AND len(list_distinct(toks)) / CAST(n AS DOUBLE) >= {MIN_UNIQUE_FRAC}
          AND list_max(list_transform(list_distinct(toks),
                  t2 -> len(list_filter(toks, w -> w = t2))))
              / CAST(n AS DOUBLE) <= {MAX_TOP_WORD_FRAC}
    ), survivors AS (
        SELECT doc_id, source, n AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS order_key
        FROM kept
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ), c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY order_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM survivors
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST(FLOOR((cum - n_tokens) / {float(PACK_BUDGET)}) AS INTEGER)
               AS pack_id
    FROM c
"""


# --- Bloom-prefiltered decontamination (the 100 TB variant) ----------

BLOOM_BITS = 1 << 20  # m: bitmap size in bits (128 KiB)
BLOOM_HASHES = 3  # k: hash functions (xxhash64 seeds 0..k-1)


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decontaminate_ngrams`` with a Bloom-filter prefilter on the
    training side — the shape that holds when the eval set outgrows a
    comfortable broadcast hash join but its BITMAP still fits
    anywhere (a 1 G-gram eval split at 10 bits/gram is ~1.25 GB of
    bitmap vs tens of GB of hashed strings).

    Build: eval grams hash JVM-side (``xxhash64`` with k seeds) to
    bit positions; only the DISTINCT POSITIONS are collected (bounded
    by min(k x eval grams, m) ints — eval-set-sized metadata, same
    budget class as the broadcast in ``decontaminate_ngrams``) and
    packed into an ``array<bigint>`` bitmap that rides one broadcast
    row. Probe: each training gram tests its k bits with pure JVM
    expressions (``element_at`` + ``shiftleft`` + ``&`` — no Python,
    no shuffle); only Bloom survivors (true hits + ~0.1% false
    positives at these m/k settings) reach the exact confirm join, so
    the result is EXACT and shares ``decontaminate_ngrams``' oracle.
    The training corpus never ships its text: the candidate shuffle
    carries (doc_id, gram) for the pre-pruned sliver only."""
    from global_superstore_data_warehouse_spark.plans.textops import _shingles

    docs = load(spark, sf_dir, "documents")
    # standalone tokenize projection (see decontaminate_ngrams)
    tok = docs.select(
        "doc_id",
        (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"),
        T.tokens("text").alias("toks"),
    )
    grams = tok.select(
        "doc_id",
        "is_eval",
        F.explode(_shingles(F.col("toks"), DECON_NGRAM)).alias("gram"),
    )

    def _positions(col: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(BLOOM_BITS)).cast("long")
            for seed in range(BLOOM_HASHES)
        ]

    eval_grams = grams.filter("is_eval").select("gram").distinct()
    pos_rows = (
        eval_grams.select(
            F.explode(F.array(*_positions(F.col("gram")))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_BITS // 64)
    for r in pos_rows:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # Spark longs are signed: re-wrap bit 63 into two's complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bloom = spark.createDataFrame([(words,)], "bloom: array<bigint>")

    train_grams = grams.filter(~F.col("is_eval")).crossJoin(F.broadcast(bloom))
    for i, pos in enumerate(_positions(F.col("gram"))):
        train_grams = train_grams.withColumn(f"__p{i}", pos)
    bit_tests = [
        f"(element_at(bloom, cast(shiftright(__p{i}, 6) + 1 as int))"
        f" & shiftleft(1L, cast(__p{i} & 63 as int))) != 0"
        for i in range(BLOOM_HASHES)
    ]
    candidates = train_grams.filter(F.expr(" AND ".join(bit_tests))).select(
        "doc_id", "gram"
    )
    # exact confirm: false positives die here, so output == exact plan
    hits = (
        candidates.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_ngrams"))
    )
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


# exact by construction (Bloom only prunes; confirm join is exact)
DECONTAMINATE_BLOOM_ORACLE = DECONTAMINATE_NGRAMS_ORACLE


QUOTA_SALT_PARTITIONS = 16


def domain_quota_sample_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``domain_quota_sample``'s documented hot-domain swap-in made
    real: two-phase top-K. Phase 1 splits each source into
    ``QUOTA_SALT_PARTITIONS`` salt shards (deterministic hash of
    doc_id) and keeps the quota-K smallest md5 keys per shard —
    windows run over (source, salt), so no single sort ever sees a
    whole hot domain. Phase 2 re-ranks only the K x SALT survivors
    per source (bounded rows) to the exact global top-K.

    Phase 1's per-shard top-K is a SUPERSET of the global top-K
    (the K smallest overall lie in some shard and are in its local
    top-K), so the result is IDENTICAL to the single-window plan —
    same oracle, equivalence-tested — while the biggest sort shrinks
    from |hot domain| to K x SALT."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("order_key"),
        F.pmod(F.hash("doc_id"), F.lit(QUOTA_SALT_PARTITIONS)).alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy("order_key", "doc_id")
    survivors = (
        keyed.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= QUOTA_PER_SOURCE)
        .drop("__r1", "salt")
    )
    w2 = Window.partitionBy("source").orderBy("order_key", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "sample_rank")
    )


DOMAIN_QUOTA_SAMPLE_TWOPHASE_ORACLE = DOMAIN_QUOTA_SAMPLE_ORACLE


# --- overlapping context-window chunking ------------------------------

CHUNK_TOKENS = 64  # chunk size (context-window budget per chunk)
CHUNK_OVERLAP = 16  # tokens shared by consecutive chunks
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunker: split every document into
    CHUNK_TOKENS-token windows advancing by CHUNK_STRIDE, so
    consecutive chunks share CHUNK_OVERLAP tokens (boundary context
    is never lost to a hard cut). The last chunk is short when the
    tail is; a document shorter than one chunk yields exactly one.

    Plan: tokenize ONCE (standalone projection — textops._shingles
    documents why), derive the chunk count with pure integer
    arithmetic, explode a 0..n_chunks-1 index, and slice the token
    array per chunk. Zero shuffles, bounded fan-out
    (~n_tokens/CHUNK_STRIDE rows per doc), and the token array rides
    only within a partition — the embarrassingly parallel shape that
    holds at 100 TB. Unlike ``pack_chunks`` (which assigns documents
    to packs), this SPLITS documents, so the pair covers both
    directions of the training-data layout problem."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", T.tokens("text").alias("toks"))
    # integer chunk count: 1 + ceil(max(0, n - CHUNK) / STRIDE)
    n_chunks = F.expr(
        f"1 + (greatest(0, size(toks) - {CHUNK_TOKENS})"
        f" + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}"
    )
    chunked = tok.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("ci"),
    )
    start = F.col("ci") * CHUNK_STRIDE + 1
    return chunked.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_token"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n_tokens") - start + 1)
        .cast("int")
        .alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("toks", start, F.lit(CHUNK_TOKENS))).alias(
            "chunk_text"
        ),
    )


CHUNK_OVERLAP_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {ALL_TOKS_SQL} AS toks,
               CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, toks, n,
               unnest(range(0, 1 + (greatest(0, n - {CHUNK_TOKENS})
                                    + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}))
                   AS ci
        FROM t
    )
    SELECT doc_id,
           CAST(ci AS INTEGER) AS chunk_idx,
           CAST(ci * {CHUNK_STRIDE} + 1 AS INTEGER) AS start_token,
           CAST(least({CHUNK_TOKENS}, n - (ci * {CHUNK_STRIDE} + 1) + 1)
                AS INTEGER) AS n_chunk_tokens,
           array_to_string(
               list_slice(toks, ci * {CHUNK_STRIDE} + 1,
                          ci * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM c
"""


# --- multi-touch attribution (the panel view asof_click_ gives 1-touch) ---

ATTR_WINDOW_DAYS = 7
_DAY_US = 86_400_000_000


def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate every purchase's value across ALL its prior touches
    (click/view/signup) in a {ATTR_WINDOW_DAYS}-day window with
    time-decay weights — the multi-touch generalization of
    asof_click_attribution's last-touch join, reported per channel:
    touch count, purchases reached, attributed value, and the
    channel's share of total purchase value. Purchases with no touch
    in the window report under the ``direct`` channel at full value,
    so attributed value CONSERVES total purchase value exactly
    (pytest-pinned).

    Determinism across engines: the decay weight is a stepped
    INTEGER (<1d: 8, <2d: 4, <4d: 2, else 1 — halving buckets
    instead of a float ``pow`` whose libm rounding differs between
    JVM and DuckDB); shares are integer/integer doubles (IEEE
    division is correctly rounded, hence engine-exact), per-touch
    allocations round at 6 dp, channel sums at 2.

    Scale shape: the touch-to-purchase join is EQUI-keyed on
    user_id (the inequality is a residual filter, never a cartesian
    — per-user event counts bound the blowup); share normalization
    windows on purchase_id (fully parallel); the report is
    channel-cardinality-sized with a broadcast 1-row total.
    """
    ev = load(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view", "signup")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.unix_micros("ts").alias("t_us"),
        F.col("event_type").alias("ch"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
        F.col("value").alias("p_value"),
    )
    j = purch.join(touches, "user_id", "left").withColumn(
        "in_window",
        F.col("t_us").isNotNull()
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(ATTR_WINDOW_DAYS * _DAY_US)),
    )
    age = F.col("p_us") - F.col("t_us")
    w = (
        F.when(~F.col("in_window"), F.lit(0))
        .when(age < 1 * _DAY_US, 8)
        .when(age < 2 * _DAY_US, 4)
        .when(age < 4 * _DAY_US, 2)
        .otherwise(1)
        .cast("long")
    )
    weighted = j.withColumn("w", w)
    tot_w = F.sum("w").over(Window.partitionBy("purchase_id"))
    alloc = (
        weighted.withColumn("tw", tot_w)
        # a purchase with no in-window touch keeps ONE row (left join
        # null or zero-weight touches collapse to 'direct')
        .withColumn(
            "keep",
            F.when(F.col("tw") > 0, F.col("w") > 0).otherwise(
                F.row_number().over(
                    Window.partitionBy("purchase_id").orderBy(
                        F.asc_nulls_first("touch_id")
                    )
                )
                == 1
            ),
        )
        .filter(F.col("keep"))
        .withColumn(
            "channel", F.when(F.col("tw") > 0, F.col("ch")).otherwise(F.lit("direct"))
        )
        .withColumn(
            "attributed",
            F.round(
                F.when(
                    F.col("tw") > 0, F.col("w") / F.col("tw") * F.col("p_value")
                ).otherwise(F.col("p_value")),
                6,
            ),
        )
    )
    tot = purch.agg(F.sum("p_value").alias("total_value"))
    return (
        alloc.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_attributions"),
            F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
            F.round(F.sum("attributed"), 2).alias("attributed_value"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_attributions",
            "n_purchases",
            "attributed_value",
            F.round(F.col("attributed_value") / F.col("total_value"), 6).alias(
                "share_of_total"
            ),
        )
    )


MULTITOUCH_ATTRIBUTION_ORACLE = f"""
    WITH touches AS (
        SELECT user_id, event_id AS touch_id, epoch_us(ts) AS t_us,
               event_type AS ch
        FROM events WHERE event_type IN ('click', 'view', 'signup')
    ), purch AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us,
               value AS p_value
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT p.purchase_id, p.p_us, p.p_value, t.touch_id, t.t_us, t.ch,
               t.t_us IS NOT NULL AND t.t_us < p.p_us
                   AND t.t_us >= p.p_us - {ATTR_WINDOW_DAYS * _DAY_US}
                   AS in_window
        FROM purch p LEFT JOIN touches t USING (user_id)
    ), weighted AS (
        SELECT *,
               CAST(CASE WHEN NOT in_window THEN 0
                         WHEN p_us - t_us < {1 * _DAY_US} THEN 8
                         WHEN p_us - t_us < {2 * _DAY_US} THEN 4
                         WHEN p_us - t_us < {4 * _DAY_US} THEN 2
                         ELSE 1 END AS BIGINT) AS w
        FROM j
    ), alloc AS (
        SELECT *,
               CASE WHEN tw > 0 THEN ch ELSE 'direct' END AS channel,
               ROUND(CASE WHEN tw > 0 THEN w * 1.0 / tw * p_value
                          ELSE p_value END, 6) AS attributed
        FROM (
            SELECT *, SUM(w) OVER (PARTITION BY purchase_id) AS tw,
                   ROW_NUMBER() OVER (PARTITION BY purchase_id
                       ORDER BY touch_id ASC NULLS FIRST) AS rn
            FROM weighted
        )
        WHERE CASE WHEN tw > 0 THEN w > 0 ELSE rn = 1 END
    ), tot AS (
        SELECT SUM(p_value) AS total_value FROM purch
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_attributions,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           ROUND(SUM(attributed), 2) AS attributed_value,
           ROUND(ROUND(SUM(attributed), 2) / total_value, 6)
               AS share_of_total
    FROM alloc, tot
    GROUP BY channel, total_value
"""


# --- Shapley-value channel attribution ----------------------------------

SHAPLEY_CHANNELS = ["click", "view", "signup"]  # bit order 1, 2, 4


def _shapley_terms() -> list[tuple[str, int, int, int]]:
    """(channel, S_mask, S_plus_mask, weight6) for every channel and
    every coalition S not containing it. weight6 = 6 * |S|!(n-|S|-1)!/n!
    for n=3: {0: 2, 1: 1, 2: 2} — exact sixths, no float factorials."""
    w6 = {0: 2, 1: 1, 2: 2}
    out = []
    for b, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << b
        for s in range(8):
            if s & bit:
                continue
            out.append((ch, s, s | bit, w6[bin(s).count("1")]))
    return out


def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE marketing attribution (Zhao et al. 2018; the
    order-independent game-theoretic counterpart of
    ``multitouch_attribution``'s time-decay allocation): treat the
    three touch channels as players, the empirical conversion rate
    of each observed channel-subset as the coalition value
    v(S) = purchasers(S) / users(S), and credit each channel its
    Shapley value phi_c = sum over coalitions S not containing c of
    |S|!(n-|S|-1)!/n! * (v(S+c) - v(S)). Unobserved coalitions
    contribute v = 0 (documented convention — with three channels
    all eight subsets are observed at every test SF).

    Exactness: v(S) is floored to integer nano-units
    ((1e9*p) DIV e), the factorial weights are exact SIXTHS
    (w6 in {2,1,2}), and phi accumulates as BIGINT
    sum(w6 * delta_nano); the single final division by 6e9 rounds
    once at 6 dp. The coalition table and the 24 (channel, S, S+c)
    terms are embedded literals — identical in both engines.

    Plan shape: ONE corpus scan -> per-user bitmask groupBy (1500
    rows at sf0.01, map-side combined), an 8-row coalition frame,
    and a 24-row literal join; everything after the first groupBy is
    constant-sized. The per-user agg is the same pivot-by-max shape
    as lang_id_confusion.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    flags = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == ch).cast("int")).alias(f"has_{i}")
            for i, ch in enumerate(SHAPLEY_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    mask = sum(
        (F.col(f"has_{i}") * (1 << i) for i in range(len(SHAPLEY_CHANNELS))),
        F.lit(0),
    )
    per_mask = flags.groupBy(mask.alias("mask")).agg(
        F.count(F.lit(1)).alias("e"), F.sum("conv").alias("p")
    )
    all_masks = spark.createDataFrame(
        [(m,) for m in range(8)], "mask int"
    )
    rates = (
        all_masks.join(per_mask, "mask", "left")
        .select(
            "mask",
            F.coalesce(
                F.expr("1000000000 * p div e"), F.lit(0)
            ).alias("r_nano"),
            F.coalesce("e", F.lit(0)).alias("e"),
            F.coalesce("p", F.lit(0)).alias("p"),
        )
        .localCheckpoint(eager=True)  # tiny; joined twice below
    )
    terms = spark.createDataFrame(
        _shapley_terms(), "channel string, s int, s_plus int, w6 long"
    )
    rs = rates.select(F.col("mask").alias("s"), F.col("r_nano").alias("r_s"))
    rp = rates.select(
        F.col("mask").alias("s_plus"), F.col("r_nano").alias("r_sp")
    )
    phi = (
        terms.join(rs, "s")
        .join(rp, "s_plus")
        .groupBy("channel")
        .agg(
            F.sum(F.col("w6") * (F.col("r_sp") - F.col("r_s")))
            .cast("bigint")
            .alias("phi_num")
        )
    )
    # exposure/conversion context per channel (users whose mask
    # contains the channel's bit)
    ctx = (
        terms.select("channel", F.col("s_plus").alias("mask"))
        .distinct()
        .join(rates, "mask")
        .groupBy("channel")
        .agg(
            F.sum("e").cast("bigint").alias("exposed_users"),
            F.sum("p").cast("bigint").alias("converted_users"),
        )
    )
    return phi.join(ctx, "channel").select(
        "channel",
        "exposed_users",
        "converted_users",
        "phi_num",
        F.round(F.col("phi_num") / 6.0e9, 6).alias("shapley_value"),
    )


def _shapley_oracle() -> str:
    terms_sql = ", ".join(
        f"('{ch}', {s}, {sp}, {w6})" for ch, s, sp, w6 in _shapley_terms()
    )
    has_cols = ", ".join(
        f"MAX(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) AS has_{i}"
        for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    mask_expr = " + ".join(
        f"has_{i} * {1 << i}" for i in range(len(SHAPLEY_CHANNELS))
    )
    return f"""
    WITH flags AS (
        SELECT user_id, {has_cols},
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ), per_mask AS (
        SELECT {mask_expr} AS mask, COUNT(*) AS e, SUM(conv) AS p
        FROM flags GROUP BY {mask_expr}
    ), all_masks(mask) AS (
        VALUES (0), (1), (2), (3), (4), (5), (6), (7)
    ), rates AS (
        SELECT a.mask,
               COALESCE(1000000000 * p.p // p.e, 0) AS r_nano,
               COALESCE(p.e, 0) AS e, COALESCE(p.p, 0) AS p
        FROM all_masks a LEFT JOIN per_mask p ON p.mask = a.mask
    ), terms(channel, s, s_plus, w6) AS (
        VALUES {terms_sql}
    ), phi AS (
        SELECT t.channel,
               CAST(SUM(t.w6 * (rp.r_nano - rs.r_nano)) AS BIGINT)
                   AS phi_num
        FROM terms t
        JOIN rates rs ON rs.mask = t.s
        JOIN rates rp ON rp.mask = t.s_plus
        GROUP BY t.channel
    ), ctx AS (
        SELECT channel,
               CAST(SUM(e) AS BIGINT) AS exposed_users,
               CAST(SUM(p) AS BIGINT) AS converted_users
        FROM (SELECT DISTINCT channel, s_plus AS mask FROM terms) tm
        JOIN rates USING (mask)
        GROUP BY channel
    )
    SELECT p.channel, c.exposed_users, c.converted_users, p.phi_num,
           ROUND(p.phi_num / 6.0e9, 6) AS shapley_value
    FROM phi p JOIN ctx c ON c.channel = p.channel
"""


SHAPLEY_CHANNEL_ATTRIBUTION_ORACLE = _shapley_oracle()
