"""Training-mix construction operators (beyond-reference, LLM-pipeline
layer): temperature-based source reweighting, leakage-safe dataset
splits, and balanced shard assignment for the training reader.

Scale posture (the shapes that survive 100 TB):

- ``temperature_mixture_sample``: the per-source sampling rate is a
  function of the SOURCE COUNT only, so the plan is (tiny per-source
  count aggregate) -> (broadcast join back) -> (pure md5-threshold
  filter). The corpus-sized side is touched exactly once and never
  shuffled; the count aggregate is map-side-combined into one row per
  source. No RNG: inclusion is a deterministic md5 threshold, so
  re-runs (and retried tasks) pick the same documents.
- ``leakage_safe_splits``: split assignment is a pure projection —
  zero shuffles. The split key is the md5 of NORMALIZED content, not
  the doc id, so every member of an exact/near-duplicate family of
  reformatted copies lands in the same split (train/test leakage via
  duplicated documents is the classic eval-inflation bug; splitting
  on content fingerprints is the standard countermeasure). For
  near-dup-cluster-level splitting, feed ``textops.dedup_clusters``
  labels through the same hash (see ``split_of`` — any stable group
  key works).
- ``training_shards``: shard id is a salted md5 bucket of the doc id
  — uniform regardless of upstream key skew — and the audit is one
  partial-aggregated shuffle producing SHARDS rows. The write path
  twin is ``df.repartition(SHARDS, shard).sortWithinPartitions`` +
  ``sources/layout.py`` range-sorted writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions.text import tokens
from global_superstore_data_warehouse_spark.operators.hints import spread_scan

# temperature-sampling pivot: a source with <= PIVOT_DOCS documents is
# kept whole; larger sources keep PIVOT_SQRT/sqrt(n) of their docs —
# i.e. rate ∝ n^(alpha-1) with alpha = 0.5, the multilingual-mixing
# temperature every large pretraining corpus applies so head sources
# don't drown the tail. Expressed per-source (no cross-source
# normalizer) so the rate needs no float summation whose order could
# differ between engines.
PIVOT_DOCS = 100

SPLIT_TRAIN_PCT = 80  # md5 bucket < 80  -> train
SPLIT_VAL_PCT = 90    # 80 <= bucket < 90 -> val, rest test

SHARDS = 16


def _permille(c: Column, salt: str) -> Column:
    """Deterministic [0, 1000) bucket from a salted md5 — bit-identical
    in Spark and DuckDB (same construction as stats._md5_bucket, with
    a salt so different operators' buckets are uncorrelated)."""
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000).cast("int")


def _permille_sql(expr: str, salt: str) -> str:
    return (
        "CAST(CAST(('0x' || substr(md5("
        f"'{salt}' || CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS INTEGER)"
    )


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted corpus sample: source ``d`` with ``n_d``
    documents keeps ``min(1, sqrt(PIVOT_DOCS / n_d))`` of them —
    sampling rate ∝ n^-0.5, i.e. the alpha = 0.5 temperature that
    flattens the source distribution toward (but not all the way to)
    uniform. Sources at or under the pivot are kept whole.

    The keep decision is ``md5(doc) mod 1000 < floor(1000 * rate)``:
    integer threshold on a deterministic hash, so the sample is
    reproducible, partitioning-independent, and engine-agnostic (the
    oracle computes the identical permille). ``sqrt`` is IEEE-exact
    (correctly rounded in both engines), so the floor'd threshold
    cannot disagree across engines the way a normalized softmax-style
    weight (order-dependent float sum) could.
    """
    docs = load(spark, sf_dir, "documents")
    rates = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "keep_permille",
            F.least(
                F.lit(1000),
                F.floor(F.lit(1000.0) * F.sqrt(F.lit(float(PIVOT_DOCS)) / F.col("n_docs"))),
            ).cast("int"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(_permille(F.col("doc_id"), "mix:") < F.col("keep_permille"))
        .select("doc_id", "source", "n_docs", "keep_permille")
    )


TEMPERATURE_MIXTURE_SAMPLE_ORACLE = f"""
    SELECT d.doc_id, d.source, r.n_docs, r.keep_permille
    FROM documents d
    JOIN (
        SELECT source, COUNT(*) AS n_docs,
               CAST(LEAST(1000, FLOOR(1000.0 * SQRT({PIVOT_DOCS}.0 / COUNT(*))))
                    AS INTEGER) AS keep_permille
        FROM documents GROUP BY source
    ) r USING (source)
    WHERE {_permille_sql('d.doc_id', 'mix:')} < r.keep_permille
"""


# --- leakage-safe splits ---------------------------------------------

def split_of(group_key: Column) -> Column:
    """train/val/test label from any stable group key: all rows with
    the same key land in the same split (the leakage guarantee)."""
    b = _permille(group_key, "split:") / 10  # [0, 100)
    return (
        F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign train/val/test at the CONTENT-FINGERPRINT level, not the
    row level: the split key is md5 of casefolded/punct-stripped text
    (the same normalizer as ``textops.dedup_normalized_docs``), so
    every reformatted copy of a document is guaranteed the same split
    and eval numbers can't be inflated by training on a near-copy of
    a test document. Pure projection — zero shuffles; at 100 TB this
    is a free extra column on the curation scan."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " +", " "
        )
    )
    key = F.md5(norm)
    return docs.select(
        "doc_id",
        key.alias("content_key"),
        split_of(key).alias("split"),
    )


_NORM_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')))"
)

LEAKAGE_SAFE_SPLITS_ORACLE = f"""
    SELECT doc_id, content_key,
           CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN bucket < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, {_NORM_SQL} AS content_key,
               {_permille_sql(_NORM_SQL, 'split:')} / 10 AS bucket
        FROM documents
    )
"""


# --- training shard assignment ---------------------------------------

def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced shard audit for the training reader: docs are assigned
    to ``SHARDS`` shards by salted md5 of doc_id (uniform even when
    doc ids are dense/skewed), and the query reports per-shard volume
    (docs, chars) — the balance check run before a training job whose
    data-parallel readers each own a shard. One partial-aggregated
    shuffle to SHARDS rows. The write twin is
    ``repartition(SHARDS, shard)`` + per-shard md5-ordered
    ``sortWithinPartitions`` (the RNG-free intra-shard shuffle of
    ``curation.pack_chunks``)."""
    docs = load(spark, sf_dir, "documents")
    shard = (_permille(F.col("doc_id"), "shard:") % SHARDS).alias("shard_id")
    return (
        docs.select(shard, "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


TRAINING_SHARDS_ORACLE = f"""
    SELECT {_permille_sql('doc_id', 'shard:')} % {SHARDS} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
"""


# --- deterministic weighted sampling (Efraimidis–Spirakis) ------------

WSAMPLE_K = 200
_WSAMPLE_SALT = "es|"
_U32 = 4294967296.0  # 2^32


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized: the
    Efraimidis–Spirakis A-ES scheme — each doc gets key
    ln(u) / w (u uniform in (0,1), w = n_chars); the top
    WSAMPLE_K keys are a weighted sample without replacement, i.e.
    long documents are proportionally more likely to be drawn.
    ``u`` comes from a salted md5 of the doc id ((h + 0.5) / 2^32 —
    never exactly 0, so ln is finite), not an RNG, so the sample is
    reproducible across engines, runs, partitionings, and retries —
    the property that makes a training subset auditable.

    Scale shape: the key is a pure projection; the corpus-level
    top-K is ``orderBy().limit(K)``, which Spark plans as
    TakeOrderedAndProject — per-partition K-row heaps merged on one
    tiny final stage — NOT a global row_number window (that would
    drag the whole corpus through a single partition, the classic
    global-window scale-killer). Only the K survivors see a window,
    for rank assignment over K rows. The float key is used ONLY for
    ordering and excluded from the output, so cross-engine last-ulp
    ln() differences cannot touch the hash (ordering flips would
    need two keys within ~1e-16, impossible with 32-bit-distinct u
    values at any realistic corpus size).
    """
    docs = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_WSAMPLE_SALT), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(_U32)
    key = F.log(u) / F.col("n_chars")
    topk = (
        docs.select("doc_id", "n_chars", key.alias("__k"))
        .orderBy(F.desc("__k"), F.asc("doc_id"))
        .limit(WSAMPLE_K)
    )
    w = Window.orderBy(F.desc("__k"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "n_chars", F.row_number().over(w).alias("rank")
    )


WEIGHTED_SAMPLE_TOPK_ORACLE = f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln((CAST(('0x' || substr(md5('{_WSAMPLE_SALT}'
                        || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                  / {_U32}) / n_chars AS k
        FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id ASC) AS INTEGER)
               AS rank
    FROM keyed
    QUALIFY rank <= {WSAMPLE_K}
"""


# --- near-dup leakage audit across splits -----------------------------


def split_near_dup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit content-fingerprint splitting still NEEDS: exact
    normalization catches reformatted copies, but NEAR-duplicates
    (edited boilerplate, truncation-differing crawls) can still straddle the
    train/test boundary and inflate eval numbers. This composes the
    MinHash-LSH candidate generator with the split assignment and
    reports, per split-pair, how many near-dup candidate pairs cross
    it — the go/no-go evidence before trusting an eval set.

    Scale shape: the candidate pairs are the bounded LSH output
    (never all-pairs); the split table is a zero-shuffle projection
    joined twice on doc_id; the report is a handful of rows. The
    (train, test) row is THE number that must be ~0 after near-dup
    dedup runs.
    """
    from global_superstore_data_warehouse_spark.plans.textops import (
        minhash_lsh_candidates,
    )

    cand = minhash_lsh_candidates(spark, sf_dir).select("doc_id_a", "doc_id_b")
    splits = leakage_safe_splits(spark, sf_dir).select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("doc_id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_id_b"), F.col("split").alias("split_b")
    )
    tagged = cand.join(sa, "doc_id_a").join(sb, "doc_id_b")
    # order the pair label so (train,test) and (test,train) pool
    lo = F.least("split_a", "split_b")
    hi = F.greatest("split_a", "split_b")
    return (
        tagged.groupBy(lo.alias("split_lo"), hi.alias("split_hi"))
        .agg(F.count(F.lit(1)).alias("n_near_dup_pairs"))
        .withColumn("crosses_boundary", F.col("split_lo") != F.col("split_hi"))
    )


from global_superstore_data_warehouse_spark.plans.textops import (  # noqa: E402
    MINHASH_LSH_CANDIDATES_ORACLE as _LSH_CAND_ORACLE,
)

SPLIT_NEAR_DUP_LEAKAGE_ORACLE = f"""
    WITH cand AS (
        {_LSH_CAND_ORACLE}
    ), splits AS (
        {LEAKAGE_SAFE_SPLITS_ORACLE}
    )
    SELECT LEAST(a.split, b.split) AS split_lo,
           GREATEST(a.split, b.split) AS split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs,
           LEAST(a.split, b.split) <> GREATEST(a.split, b.split)
               AS crosses_boundary
    FROM cand c
    JOIN splits a ON a.doc_id = c.doc_id_a
    JOIN splits b ON b.doc_id = c.doc_id_b
    GROUP BY 1, 2
"""


# --- DSIR: data selection via hashed-n-gram importance weights ------

# Xie et al., NeurIPS 2023, "Data Selection for Language Models via
# Importance Resampling": score every raw-pool document by how much
# more likely its hashed n-gram features are under the TARGET
# distribution than under the RAW distribution, then keep the
# highest-weighted documents. Here the target is the English slice of
# the corpus (the deterministic stand-in for "looks like the
# high-quality domain") and the raw pool is the whole corpus.
DSIR_BUCKETS = 64


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight over hashed unigram+bigram
    features: weight(d) = sum_b n_b(d) * lr_b where lr_b is the
    per-bucket log-likelihood ratio
    ln p_target(b) - ln p_raw(b) (Laplace-smoothed bucket unigram
    models), n_b(d) the document's feature count in bucket b.

    Determinism across engines: lr_b is rounded to MICRO-log units
    (bigint, round(lr * 1e6)) before the per-document sum, so the
    document weight is an exact INTEGER dot product — no float
    summation whose order could differ between Spark and DuckDB; the
    readable double is derived from the integer at the end. `ln`
    itself is computed once per bucket ({DSIR_BUCKETS} rows), where
    a last-place rounding divergence could only flip a micro-unit on
    a knife-edge — the same exposure class as the round-6dp log ops
    in plans/textops.py, but on 64 model rows instead of per-row.

    Scale shape: the feature model is {DSIR_BUCKETS} rows built by two
    map-side-combined aggregates over one corpus scan (bucket =
    md5-hash of the feature mod {DSIR_BUCKETS} — a pure projection);
    per-document bucket counts join the broadcast 64-row lr table and
    re-aggregate by doc_id. Two shuffles total, both on keys with
    bounded cardinality (bucket, doc_id); `selected` compares the
    weight to the scalar 0 (more target-like than raw-like), so no
    global ranking window is needed. At 100 TB the model fits in one
    broadcast and the corpus is scanned once for counts and once for
    scoring (or once total if the bucket counts are cached).
    """
    # spread the single-split scan: the token+bigram explode + md5
    # bucketing feeds THREE aggregations, each of which otherwise
    # re-ran it in ONE task (measured: five serialized 0.6-1.7 s
    # single-task stages at sf0.1; guide §2.5)
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    )
    toks = F.filter(tokens("text"), lambda t: t != "")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.concat(toks, bigrams)).alias("feat"),
    ).withColumn(
        "bucket",
        (
            F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).cast("int"),
    )
    doc_counts = feats.groupBy("doc_id", "lang", "source", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    raw = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        feats.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    # scalar totals ride a broadcast 1-row frame (no unpartitioned
    # window); the model table is DSIR_BUCKETS rows
    totals = (
        raw.agg(F.sum("c_raw").alias("tot_raw"))
        .crossJoin(tgt.agg(F.sum("c_tgt").alias("tot_tgt")))
    )
    model = (
        raw.join(tgt, "bucket", "left")
        .withColumn("c_tgt", F.coalesce("c_tgt", F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.col("c_tgt") + 1)
                        / (F.col("tot_tgt") + F.lit(DSIR_BUCKETS))
                    )
                    - F.log(
                        (F.col("c_raw") + 1)
                        / (F.col("tot_raw") + F.lit(DSIR_BUCKETS))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        doc_counts.join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("n").cast("bigint").alias("n_feats"),
            F.sum(F.col("n") * F.col("lr_micro")).cast("bigint").alias("w_micro"),
        )
        .select(
            "doc_id",
            "lang",
            "source",
            "n_feats",
            F.round(F.col("w_micro") / 1e6, 6).alias("dsir_logweight"),
            (F.col("w_micro") > 0).alias("selected"),
        )
    )


DSIR_IMPORTANCE_WEIGHTS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, source,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t <> '') AS ts
        FROM documents
    ), feats AS (
        SELECT doc_id, lang, source, f AS feat
        FROM (
            SELECT doc_id, lang, source, unnest(ts) AS f FROM toks
            UNION ALL
            SELECT doc_id, lang, source,
                   unnest(list_transform(
                       range(1, len(ts)),
                       i -> ts[i] || ' ' || ts[i + 1])) AS f
            FROM toks
        )
    ), bucketed AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5(feat), 1, 8))::BIGINT
                    % {DSIR_BUCKETS} AS INTEGER) AS bucket
        FROM feats
    ), doc_counts AS (
        SELECT doc_id, lang, source, bucket, COUNT(*) AS n
        FROM bucketed GROUP BY 1, 2, 3, 4
    ), raw AS (
        SELECT bucket, COUNT(*) AS c_raw FROM bucketed GROUP BY 1
    ), tgt AS (
        SELECT bucket, COUNT(*) AS c_tgt FROM bucketed
        WHERE lang = 'en' GROUP BY 1
    ), model AS (
        SELECT r.bucket,
               CAST(ROUND((
                   ln((COALESCE(t.c_tgt, 0) + 1) * 1.0 /
                      (SUM(COALESCE(t.c_tgt, 0)) OVER () + {DSIR_BUCKETS}))
                 - ln((r.c_raw + 1) * 1.0 /
                      (SUM(r.c_raw) OVER () + {DSIR_BUCKETS}))
               ) * 1e6) AS BIGINT) AS lr_micro
        FROM raw r LEFT JOIN tgt t USING (bucket)
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(SUM(d.n) AS BIGINT) AS n_feats,
           ROUND(SUM(d.n * m.lr_micro) / 1e6, 6) AS dsir_logweight,
           SUM(d.n * m.lr_micro) > 0 AS selected
    FROM doc_counts d JOIN model m USING (bucket)
    GROUP BY 1, 2, 3
"""


# --- UniMax language budget allocation --------------------------------

# Character budget as a fraction of the corpus (numerator/denominator
# kept integer so B itself is an exact integer in both engines).
UNIMAX_BUDGET_NUM = 1
UNIMAX_BUDGET_DEN = 2
MICRO = 1_000_000


def unimax_language_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a total character budget B = total/2
    across languages as EQUALLY as possible, never asking a language
    for more characters than it has — the waterfilling allocation
    ``alloc_l = min(n_l, W)`` with the waterline W chosen so the
    allocations sum to B. Small languages are consumed whole
    (epochs = 1 at cap); the surplus is split evenly among the
    languages above the line. This is the sampling scheme that
    replaced temperature mixing in mT5-class multilingual corpora.

    Closed form instead of iteration: sort languages ascending by
    size; language i is BELOW the waterline iff
    ``n_i * (L - i + 1) <= B - P_{i-1}`` (P = running size prefix) —
    an ALL-INTEGER comparison, so the below/above decision cannot
    drift between engines. With k = the last below-line language,
    ``W = (B - P_k) / (L - k)``, reported in exact integer
    micro-chars via integer division. Two tiny whole-frame windows
    over an L-row frame (L = #languages, single digits) after one
    map-side-combined groupBy of the corpus — the corpus is scanned
    once and never shuffled at row grain.
    """
    langs = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("n_chars"))
    )
    w_ord = Window.orderBy("n_chars", "lang")
    w_all = Window.partitionBy()
    ranked = (
        langs.withColumn("rnk", F.row_number().over(w_ord))
        .withColumn("n_langs", F.count(F.lit(1)).over(w_all))
        .withColumn("prefix", F.sum("n_chars").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("budget", F.expr(f"{UNIMAX_BUDGET_NUM} * sum(n_chars) over () div {UNIMAX_BUDGET_DEN}"))
        .withColumn(
            "below",
            F.col("n_chars") * (F.col("n_langs") - F.col("rnk") + 1)
            <= F.col("budget") - (F.col("prefix") - F.col("n_chars")),
        )
    )
    k_cols = ranked.withColumn(
        "k", F.max(F.when(F.col("below"), F.col("rnk")).otherwise(F.lit(0))).over(w_all)
    ).withColumn(
        "p_k",
        F.max(F.when(F.col("below"), F.col("prefix")).otherwise(F.lit(0))).over(w_all),
    )
    alloc = F.when(
        F.col("rnk") <= F.col("k"), F.col("n_chars") * MICRO
    ).otherwise(
        F.expr(f"(budget - p_k) * {MICRO} div (n_langs - k)")
    )
    return k_cols.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("rnk").cast("int").alias("rnk"),
        alloc.cast("bigint").alias("alloc_micro_chars"),
        (F.col("rnk") <= F.col("k")).cast("int").alias("consumed_whole"),
    )


UNIMAX_LANGUAGE_BUDGETS_ORACLE = f"""
    WITH langs AS (
        SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY lang
    ), ranked AS (
        SELECT lang, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, lang) AS rnk,
               COUNT(*) OVER () AS n_langs,
               SUM(n_chars) OVER (ORDER BY n_chars, lang
                   ROWS UNBOUNDED PRECEDING) AS prefix,
               ({UNIMAX_BUDGET_NUM} * SUM(n_chars) OVER ())
                   // {UNIMAX_BUDGET_DEN} AS budget
        FROM langs
    ), flagged AS (
        SELECT *,
               (n_chars * (n_langs - rnk + 1)
                   <= budget - (prefix - n_chars)) AS below
        FROM ranked
    ), kk AS (
        SELECT *,
               MAX(CASE WHEN below THEN rnk ELSE 0 END) OVER () AS k,
               MAX(CASE WHEN below THEN prefix ELSE 0 END) OVER () AS p_k
        FROM flagged
    )
    SELECT lang, n_chars, CAST(rnk AS INTEGER) AS rnk,
           CAST(CASE WHEN rnk <= k THEN n_chars * {MICRO}
                ELSE ((budget - p_k) * {MICRO}) // (n_langs - k)
           END AS BIGINT) AS alloc_micro_chars,
           CAST(CASE WHEN rnk <= k THEN 1 ELSE 0 END AS INTEGER)
               AS consumed_whole
    FROM kk
"""


# --- semantic (embedding-level) split-leakage audit -------------------


def split_semantic_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEMANTIC twin of ``split_near_dup_leakage``: near-duplicate
    pairs in EMBEDDING space (within-cluster cosine >=
    SemDeDup threshold) crossed with the content-fingerprint split
    assignment. Fingerprint-level splitting guarantees exact and
    lexical near-copies share a split — but two documents can be
    semantically near-identical with different fingerprints
    (paraphrases, translations), and THOSE pairs crossing the
    train/eval boundary are the leakage this audit surfaces; it is
    the embedding-side go/no-go an eval pipeline runs next to the
    lexical one. One row per unordered split pair that leaks:
    alphabetical (split_a, split_b), pair count, distinct docs per
    side.

    Plan shape: the pair generator is cluster-confined (never a
    corpus cross join); split labels are a pure projection joined on
    the doc-id-sized pair frame; the roll-up is a <=3-row aggregate.
    The audit's cost IS the semantic dedup pass, which the pipeline
    already runs.
    """
    from global_superstore_data_warehouse_spark.plans.embeddings import (
        semantic_near_dup_pairs,
    )

    # checkpointed: the label frame joins BOTH pair endpoints, and
    # without the cut the full fingerprint lineage executes twice
    splits = (
        leakage_safe_splits(spark, sf_dir)
        .select(F.col("doc_id"), F.col("split"))
        .localCheckpoint(eager=True)
    )
    pairs = semantic_near_dup_pairs(spark, sf_dir)
    labeled = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("vec_a"), F.col("split").alias("sa")
            ),
            "vec_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("vec_b"), F.col("split").alias("sb")
            ),
            "vec_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    return (
        labeled.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            F.when(F.col("sa") < F.col("sb"), F.col("vec_a"))
            .otherwise(F.col("vec_b"))
            .alias("doc_a"),
            F.when(F.col("sa") < F.col("sb"), F.col("vec_b"))
            .otherwise(F.col("vec_a"))
            .alias("doc_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_a").cast("bigint").alias("n_docs_a"),
            F.countDistinct("doc_b").cast("bigint").alias("n_docs_b"),
        )
    )


from global_superstore_data_warehouse_spark.plans.embeddings import (  # noqa: E402
    SEMANTIC_NEAR_DUP_PAIRS_ORACLE as _SEM_PAIRS_ORACLE,
)

SPLIT_SEMANTIC_LEAKAGE_ORACLE = f"""
    WITH pairs AS (
        {_SEM_PAIRS_ORACLE}
    ), splits AS (
        {LEAKAGE_SAFE_SPLITS_ORACLE}
    ), labeled AS (
        SELECT p.vec_a, p.vec_b, sa.split AS sa, sb.split AS sb
        FROM pairs p
        JOIN splits sa ON sa.doc_id = p.vec_a
        JOIN splits sb ON sb.doc_id = p.vec_b
        WHERE sa.split <> sb.split
    ), canon AS (
        SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
               CASE WHEN sa < sb THEN vec_a ELSE vec_b END AS doc_a,
               CASE WHEN sa < sb THEN vec_b ELSE vec_a END AS doc_b
        FROM labeled
    )
    SELECT split_a, split_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS n_docs_a,
           CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_b
    FROM canon
    GROUP BY split_a, split_b
"""


# --- consistent-hash ring sharding + rebalance audit ------------------

RING_WORKERS = 8
RING_VNODES = 8  # virtual nodes per worker (variance smoothing)


def _ring_points(n_workers: int) -> list[tuple[int, str]]:
    """The ring as (point, worker) literals, computed at PLAN-BUILD
    time with hashlib so the Spark plan and the DuckDB oracle embed
    the IDENTICAL constants (no engine hash in the ring itself)."""
    import hashlib

    pts = []
    for w in range(n_workers):
        for v in range(RING_VNODES):
            h = hashlib.md5(f"ring:w{w}:{v}".encode()).hexdigest()
            pts.append((int(h[:8], 16), f"w{w}"))
    return sorted(pts)


def _ring_worker_of(pos: Column, pts: list[tuple[int, str]]) -> Column:
    """First ring point clockwise >= pos (wrap to the ring minimum) —
    as a pure array-literal projection: no join, no shuffle, the ring
    rides whole-stage codegen as ~n_workers*VNODES struct literals."""
    arr = F.array(
        *[
            F.struct(
                F.lit(p).cast("long").alias("point"),
                F.lit(w).alias("worker"),
            )
            for p, w in pts
        ]
    )
    cand = F.filter(arr, lambda x: x.getField("point") >= pos)
    wrap = F.lit(pts[0][1])  # pts sorted: [0] is the ring minimum
    return F.when(
        F.size(cand) > 0, F.array_min(cand).getField("worker")
    ).otherwise(wrap)


def _ring_sql(pts: list[tuple[int, str]]) -> str:
    return ", ".join(f"({p}, '{w}')" for p, w in pts)


_DOC_POS_SQL = (
    "CAST(('0x' || substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT)"
)


def consistent_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring sharding (Karger et al.; the memcached /
    Dynamo placement scheme) with the audit that justifies it: assign
    every document to a worker on an md5 ring (RING_VNODES virtual
    nodes per worker), then RE-assign on a ring with ONE MORE worker
    and report, per original worker, how many documents moved.
    Modulo sharding (``training_shards``) reshuffles ~n/(n+1) of all
    keys when a worker joins; the ring moves only the arcs the new
    worker claims — expected 1/(n+1) of the corpus, and ONLY to the
    new worker (a moved doc's new owner is always w{RING_WORKERS}).
    That invariant is pytest-pinned; this report is the go/no-go a
    resharding operation reads before touching 100 TB.

    Plan shape: both assignments are PURE PROJECTIONS over an
    embedded sorted ring literal (successor lookup = filter +
    array_min over ~(n+1)*VNODES structs, in codegen); the roll-up
    is one partial-aggregated groupBy to n_workers rows. Zero joins,
    zero row-scale shuffles, exactly one corpus scan.
    """
    # spread the single-split scan: the two ring-successor lookups
    # (md5 + filter/array_min over the ~(n+1)*VNODES point literals)
    # otherwise run in ONE task (measured 1.1 s single-task at
    # sf0.1; guide §2.5 — no-op once the table splits on its own)
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    ).select("doc_id")
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    )
    before = _ring_worker_of(pos, _ring_points(RING_WORKERS))
    after = _ring_worker_of(pos, _ring_points(RING_WORKERS + 1))
    return (
        docs.select(
            before.alias("worker"),
            (before != after).cast("int").alias("moved"),
        )
        .groupBy("worker")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("moved").cast("bigint").alias("n_moved"),
        )
    )


CONSISTENT_SHARD_REBALANCE_ORACLE = f"""
    WITH ring_a(point, worker) AS (
        VALUES {_ring_sql(_ring_points(RING_WORKERS))}
    ), ring_b(point, worker) AS (
        VALUES {_ring_sql(_ring_points(RING_WORKERS + 1))}
    ), d AS (
        SELECT doc_id, {_DOC_POS_SQL} AS pos FROM documents
    ), a AS (
        SELECT d.doc_id,
               COALESCE(
                   (SELECT r.worker FROM ring_a r WHERE r.point >= d.pos
                    ORDER BY r.point LIMIT 1),
                   (SELECT r.worker FROM ring_a r
                    ORDER BY r.point LIMIT 1)
               ) AS worker
        FROM d
    ), b AS (
        SELECT d.doc_id,
               COALESCE(
                   (SELECT r.worker FROM ring_b r WHERE r.point >= d.pos
                    ORDER BY r.point LIMIT 1),
                   (SELECT r.worker FROM ring_b r
                    ORDER BY r.point LIMIT 1)
               ) AS worker
        FROM d
    )
    SELECT a.worker,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a.worker <> b.worker THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved
    FROM a JOIN b USING (doc_id)
    GROUP BY a.worker
"""
