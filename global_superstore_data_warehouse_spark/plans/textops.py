"""Text-analysis & deduplication queries over the ``documents`` table
(beyond-reference, training-data pipeline ops; BASELINE.json north
star). Every operator has a value-exact DuckDB oracle — md5 is the
shared hash primitive across engines.

Scale notes: all per-doc features are array expressions inside
whole-stage codegen (no UDFs, no shuffle); pair-generation operators
shuffle only on candidate keys (content hash, LSH band, (lang,
n_chars) block), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions import text as T
from global_superstore_data_warehouse_spark.operators.dedup import dedup_exact

TOKS_SQL = "list_distinct(string_split_regex(trim(text), '\\s+'))"
ALL_TOKS_SQL = "string_split_regex(trim(text), '\\s+')"


# --- token counting --------------------------------------------------

def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_actual"),
        T.total_token_chars(toks).alias("total_token_chars"),
    )


TOKEN_STATS_ORACLE = f"""
    SELECT doc_id,
           CAST(len({ALL_TOKS_SQL}) AS INTEGER) AS n_tokens,
           CAST(len({TOKS_SQL}) AS INTEGER) AS n_distinct,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           CAST(list_aggregate(list_transform({ALL_TOKS_SQL}, w -> length(w)), 'sum') AS INTEGER)
               AS total_token_chars
    FROM documents
"""


# --- quality scoring -------------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: distinct-token ratio, stopword
    ratio, mean token length, composite score."""
    docs = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_stop = T.stopword_count(toks, T.EN_STOPWORDS).cast("double")
    distinct_ratio = F.round(n_distinct / n, 6)
    stop_ratio = F.round(n_stop / n, 6)
    mean_len = F.round(T.total_token_chars(toks).cast("double") / n, 6)
    score = F.round(
        0.5 * (n_distinct / n) + 0.3 * (1 - n_stop / n) + 0.2 * F.least(F.lit(1.0), n / 100.0),
        6,
    )
    return docs.select(
        "doc_id",
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        score.alias("quality_score"),
    )


_EN = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)

TEXT_QUALITY_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               {ALL_TOKS_SQL} AS toks,
               CAST(len({ALL_TOKS_SQL}) AS DOUBLE) AS n
        FROM documents
    )
    SELECT doc_id,
           ROUND(len(list_distinct(toks)) / n, 6) AS distinct_ratio,
           ROUND(len(list_filter(toks, w -> w IN ({_EN}))) / n, 6) AS stopword_ratio,
           ROUND(CAST(list_aggregate(list_transform(toks, w -> length(w)), 'sum') AS DOUBLE) / n, 6)
               AS mean_token_len,
           ROUND(0.5 * (len(list_distinct(toks)) / n)
                 + 0.3 * (1 - len(list_filter(toks, w -> w IN ({_EN}))) / n)
                 + 0.2 * least(1.0, n / 100.0), 6) AS quality_score
    FROM t
"""


# --- language-ID heuristic -------------------------------------------

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID with a fixed precedence order
    (en > es > de on ties) — deterministic, and honest about being a
    heuristic: scores are returned alongside the prediction."""
    docs = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    s = T.lang_scores(toks)
    predicted = (
        F.when((s["es"] > s["en"]) & (s["es"] >= s["de"]), F.lit("es"))
        .when(s["de"] > s["en"], F.lit("de"))
        .otherwise(F.lit("en"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        s["en"].alias("score_en"),
        s["es"].alias("score_es"),
        s["de"].alias("score_de"),
        predicted.alias("predicted_lang"),
    )


_ES = ", ".join(f"'{w}'" for w in T.ES_STOPWORDS)
_DE = ", ".join(f"'{w}'" for w in T.DE_STOPWORDS)

LANG_ID_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang, {ALL_TOKS_SQL} AS toks FROM documents
    ), s AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(toks, w -> w IN ({_EN}))) AS INTEGER) AS score_en,
               CAST(len(list_filter(toks, w -> w IN ({_ES}))) AS INTEGER) AS score_es,
               CAST(len(list_filter(toks, w -> w IN ({_DE}))) AS INTEGER) AS score_de
        FROM t
    )
    SELECT doc_id, lang AS labeled_lang, score_en, score_es, score_de,
           CASE WHEN score_es > score_en AND score_es >= score_de THEN 'es'
                WHEN score_de > score_en THEN 'de'
                ELSE 'en' END AS predicted_lang
    FROM s
"""


# --- fingerprints ----------------------------------------------------

def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        T.bow_fingerprint("text").alias("bow_fingerprint"),
        T.min_token_hash("text").alias("min_token_hash"),
    )


DOC_FINGERPRINTS_ORACLE = f"""
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(list_sort({TOKS_SQL}), ' ')) AS bow_fingerprint,
           list_min(list_transform({TOKS_SQL}, w -> md5(w))) AS min_token_hash
    FROM documents
"""


# --- exact dedup -----------------------------------------------------

def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup_exact(docs, on="text", id_col="doc_id")


DEDUP_EXACT_DOCS_ORACLE = """
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS copies
    FROM documents GROUP BY md5(text)
"""


# --- n-gram Jaccard near-dup -----------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard, with 3-gram-shingle
    Jaccard reported alongside. Candidate generation blocks on
    (lang, n_chars) — a shuffle join on the block key, never
    all-pairs; at 100 TB the block key would widen to (lang,
    length-bucket) + an LSH pre-filter (see minhash_lsh_candidates).
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(T.tokens("text"))
    sh3 = _shingles(T.tokens("text"), 3)
    d = docs.select("doc_id", "lang", "n_chars", toks.alias("toks"), sh3.alias("sh3"))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.n_chars") == F.col("b.n_chars"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    j1 = T.jaccard(F.col("a.toks"), F.col("b.toks"))
    # compute the cheap token-Jaccard first and FILTER before the
    # 3-gram-shingle Jaccard: ~99.8% of blocked pairs fail the 0.3
    # threshold, so the expensive shingle intersection runs only for
    # survivors (the Filter between the two projections stops
    # Catalyst from collapsing them into one compute-everything pass)
    scored = pairs.select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.round(j1, 6).alias("jaccard_tokens"),
        F.col("a.sh3").alias("sh3_a"),
        F.col("b.sh3").alias("sh3_b"),
    ).filter(F.col("jaccard_tokens") >= 0.3)
    j3 = T.jaccard(F.col("sh3_a"), F.col("sh3_b"))
    return scored.select(
        "doc_id_a",
        "doc_id_b",
        "jaccard_tokens",
        F.round(j3, 6).alias("jaccard_shingles3"),
    )


def _shingles(toks: Column, n: int) -> Column:
    """Distinct n-gram shingles of a token array (empty when the doc
    has fewer than n tokens)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


SHINGLES3_SQL = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN "
    "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) "
    "ELSE [] END)"
)

NGRAM_JACCARD_PAIRS_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, lang, n_chars,
               list_distinct(t) AS toks,
               {SHINGLES3_SQL} AS sh3
        FROM (SELECT doc_id, lang, n_chars, {ALL_TOKS_SQL} AS t FROM documents)
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(len(list_intersect(a.toks, b.toks)) * 1.0
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6)
               AS jaccard_tokens,
           ROUND(CASE WHEN len(a.sh3) + len(b.sh3) = 0 THEN NULL
                 ELSE len(list_intersect(a.sh3, b.sh3)) * 1.0
                      / (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3))) END, 6)
               AS jaccard_shingles3
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) * 1.0
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.3
"""


# --- MinHash + LSH dedup ---------------------------------------------

NUM_HASHES = 8
ROWS_PER_BAND = 4


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, the 100 TB-shaped plan:
    signature (8 md5 min-hashes) → 2 bands → *explode* bands and
    shuffle-join on (band_id, bucket) — never an OR-join, never
    all-pairs — then verify candidates with true token Jaccard.
    Output: verified pairs with jaccard >= 0.5."""
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(T.tokens("text"))
    sig = docs.select("doc_id", toks.alias("toks"), *T.minhash_signature(toks, NUM_HASHES))
    banded = sig.select(
        "doc_id",
        *T.lsh_bands([f"mh{i}" for i in range(NUM_HASHES)], ROWS_PER_BAND),
    )
    n_bands = NUM_HASHES // ROWS_PER_BAND
    # Candidate generation runs over NARROW rows (doc_id, band, bucket)
    # — token arrays must not ride through the bucket self-join, whose
    # output is quadratic in bucket size on duplicate-heavy corpora.
    # Tokens are re-attached afterwards, once per distinct pair.
    exploded = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_id"), F.col(f"band{i}").alias("bucket"))
                for i in range(n_bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band_id", "bb.bucket")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    tok_tbl = docs.select("doc_id", toks.alias("toks"))
    ta, tb = tok_tbl.alias("ta"), tok_tbl.alias("tb")
    verified = (
        cand.join(ta, F.col("doc_id_a") == F.col("ta.doc_id"))
        .join(tb, F.col("doc_id_b") == F.col("tb.doc_id"))
    )
    j = T.jaccard(F.col("ta.toks"), F.col("tb.toks"))
    return (
        verified.select("doc_id_a", "doc_id_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def _sig_sql() -> str:
    mh = ",\n               ".join(
        f"list_min(list_transform(toks, w -> md5('s{i}|' || w))) AS mh{i}"
        for i in range(NUM_HASHES)
    )
    return mh


MINHASH_LSH_CANDIDATES_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ), sig AS (
        SELECT doc_id, toks,
               {_sig_sql()}
        FROM t
    ), banded AS (
        SELECT doc_id, toks,
               md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band0,
               md5(concat_ws('|', mh4, mh5, mh6, mh7)) AS band1
        FROM sig
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM banded a JOIN banded b
          ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
    )
    SELECT c.doc_id_a, c.doc_id_b,
           ROUND(len(list_intersect(ta.toks, tb.toks)) * 1.0
                 / (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))), 6)
               AS jaccard
    FROM cand c
    JOIN t ta ON ta.doc_id = c.doc_id_a
    JOIN t tb ON tb.doc_id = c.doc_id_b
    WHERE len(list_intersect(ta.toks, tb.toks)) * 1.0
          / (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))) >= 0.5
"""


# --- SimHash ---------------------------------------------------------

SIMHASH_BITS = 16


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct tokens: per-token 16-bit md5
    hash; each bit position accumulates +1/-1 across tokens; the
    sign vector is the fingerprint. Explode + conditional-sum
    groupBy — one shuffle on doc_id, fully codegen'd."""
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(T.tokens("text"))
    exploded = docs.select("doc_id", F.explode(toks).alias("w")).withColumn(
        "v", T.hex16_of_md5(F.col("w"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("v"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = exploded.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return agg.select("doc_id", simhash.cast("int").alias("simhash"))


def _simhash_sql() -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH e AS (
        SELECT doc_id, ('0x' || substr(md5(w.w), 1, 4))::INTEGER AS v
        FROM documents, unnest({TOKS_SQL}) AS w(w)
    ), s AS (
        SELECT doc_id, {sums} FROM e GROUP BY doc_id
    )
    SELECT doc_id, CAST({combine} AS INTEGER) AS simhash FROM s
    """


SIMHASH_DOCS_ORACLE = _simhash_sql()


# --- near-dup clustering (connected components) ----------------------

CLUSTER_JACCARD = 0.3


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: near-dup pairs → connected components →
    canonical document per cluster (min doc_id). Every document gets
    a cluster_id; docs with no near-dup are their own canonical.

    Spark formulation: iterative min-label propagation to fixpoint —
    each round, every node takes the min of its own label and its
    neighbors' labels; rounds = graph diameter (near-dup clusters are
    shallow). Each round is one shuffle join on doc_id;
    ``localCheckpoint`` truncates the growing lineage. This is the
    partition-parallel classic for 100 TB-scale components (the
    large-star/small-star refinement drops in unchanged if diameters
    ever grow).
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(T.tokens("text"))
    d = docs.select("doc_id", "lang", "n_chars", toks.alias("toks"))
    a, b = d.alias("a"), d.alias("b")
    j1 = T.jaccard(F.col("a.toks"), F.col("b.toks"))
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(j1 >= CLUSTER_JACCARD)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = d.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint()
    while True:
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                F.col("label").alias("old_label"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        if new_labels.filter(F.col("label") != F.col("old_label")).isEmpty():
            break
        labels = new_labels.select("doc_id", "label")
    return new_labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_canonical"),
    )


DEDUP_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM (SELECT doc_id, lang, n_chars, {TOKS_SQL} AS toks FROM documents) a
        JOIN (SELECT doc_id, lang, n_chars, {TOKS_SQL} AS toks FROM documents) b
          ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks)) * 1.0
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
              >= {CLUSTER_JACCARD}
    ), sym AS (
        SELECT src, dst FROM pairs
        UNION ALL
        SELECT dst, src FROM pairs
    ), reach(n, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.dst, r.r
        FROM reach r JOIN sym s ON s.src = r.n
    )
    SELECT n AS doc_id,
           MIN(r) AS cluster_id,
           (MIN(r) = n) AS is_canonical
    FROM reach
    GROUP BY n
"""


# --- cross-modal near-dup (text + embedding agreement) ---------------

COSINE_DUP_THRESHOLD = 0.4


def crossmodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone training-data dedup: MinHash-LSH candidate pairs
    verified by BOTH signals — token-set Jaccard AND embedding cosine
    (documents.doc_id ≡ embeddings.vec_id). A pair is a duplicate
    only when lexical and semantic evidence agree — filtering out
    template text that shares tokens but not meaning, and unrelated
    documents that happen to collide in an LSH bucket.

    Plan: narrow LSH candidate generation (as minhash_lsh_candidates)
    → per-pair re-attach of token arrays and unit-normalized
    embeddings (four shuffle joins on ids, each payload attached once
    per distinct pair) → one Jaccard + one dot-fold per pair.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(T.tokens("text"))
    sig = docs.select("doc_id", *T.minhash_signature(toks, NUM_HASHES))
    banded = sig.select(
        "doc_id", *T.lsh_bands([f"mh{i}" for i in range(NUM_HASHES)], ROWS_PER_BAND)
    )
    n_bands = NUM_HASHES // ROWS_PER_BAND
    exploded = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_id"), F.col(f"band{i}").alias("bucket"))
                for i in range(n_bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band_id", "bb.bucket")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )

    from global_superstore_data_warehouse_spark.operators import similarity as S

    tok_tbl = docs.select("doc_id", toks.alias("toks"))
    emb = load(spark, sf_dir, "embeddings")
    emb_n = emb.select(
        "vec_id", S.norm(F.col("embedding")).alias("nrm"), "embedding"
    ).select("vec_id", S.normalize(F.col("embedding"), F.col("nrm")).alias("emb_n"))

    ta, tb = tok_tbl.alias("ta"), tok_tbl.alias("tb")
    ea, eb = emb_n.alias("ea"), emb_n.alias("eb")
    verified = (
        cand.join(ta, F.col("doc_id_a") == F.col("ta.doc_id"))
        .join(tb, F.col("doc_id_b") == F.col("tb.doc_id"))
        .join(ea, F.col("doc_id_a") == F.col("ea.vec_id"))
        .join(eb, F.col("doc_id_b") == F.col("eb.vec_id"))
    )
    j = F.round(T.jaccard(F.col("ta.toks"), F.col("tb.toks")), 6)
    cos = F.round(S.dot(F.col("ea.emb_n"), F.col("eb.emb_n")), 6)
    return (
        verified.select(
            "doc_id_a",
            "doc_id_b",
            j.alias("jaccard"),
            cos.alias("cosine_sim"),
        )
        .filter((F.col("jaccard") >= 0.5) & (F.col("cosine_sim") >= COSINE_DUP_THRESHOLD))
    )


def _crossmodal_oracle() -> str:
    from global_superstore_data_warehouse_spark.operators import similarity as S

    nd = S.ndot_sql("ea.embedding", "ea.nrm", "eb.embedding", "eb.nrm", 64)
    return f"""
    WITH t AS (
        SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ), sig AS (
        SELECT doc_id, toks,
               {_sig_sql()}
        FROM t
    ), banded AS (
        SELECT doc_id,
               md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band0,
               md5(concat_ws('|', mh4, mh5, mh6, mh7)) AS band1
        FROM sig
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM banded a JOIN banded b
          ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
    ), en AS (
        SELECT vec_id, embedding, {S.norm_sql('embedding', 64)} AS nrm FROM embeddings
    )
    SELECT c.doc_id_a, c.doc_id_b,
           ROUND(len(list_intersect(ta.toks, tb.toks)) * 1.0
                 / (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))), 6)
               AS jaccard,
           ROUND({nd}, 6) AS cosine_sim
    FROM cand c
    JOIN t ta ON ta.doc_id = c.doc_id_a
    JOIN t tb ON tb.doc_id = c.doc_id_b
    JOIN en ea ON ea.vec_id = c.doc_id_a
    JOIN en eb ON eb.vec_id = c.doc_id_b
    WHERE ROUND(len(list_intersect(ta.toks, tb.toks)) * 1.0
          / (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))), 6) >= 0.5
      AND ROUND({nd}, 6) >= {COSINE_DUP_THRESHOLD}
"""


CROSSMODAL_NEAR_DUP_ORACLE = _crossmodal_oracle()
