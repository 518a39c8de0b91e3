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
