"""Exact set-similarity join via prefix filtering (the AllPairs /
PPJoin family): all document pairs whose token-set Jaccard is >= TAU,
with GUARANTEED recall 1.0 — the exact counterpart to the
probabilistic MinHash-LSH candidate generator in plans/textops.py.

Why a second similarity join: MinHash trades recall for cost (its
bands miss a tunable fraction of true pairs); prefix filtering is
exact. Order every token by global rarity; a document's PREFIX is its
(|T| - ceil(tau*|T|) + 1) rarest tokens. Theorem (Bayardo et al.,
WWW'07 "Scaling Up All Pairs Similarity Search"): two sets with
Jaccard >= tau must share at least one prefix token under any fixed
total order — so blocking on prefix tokens generates a candidate
superset, and the exact Jaccard verify keeps precisely the true
pairs. Rarity ordering makes blocks as small as the theorem allows:
candidates meet only on their RAREST tokens, so the df^2 blow-up of
blocking on a stop-word never happens.

Scale shape: (1) one distinct-token explode + df count
(map-side-combined), (2) a per-doc window to pick prefixes (shuffle
on doc_id), (3) the candidate self-join keyed on prefix token —
bounded by sum over tokens of prefix-df^2, which rarity ordering
drives toward the output size, (4) exact verify on the pair rows.
Token ARRAYS ride the verify join once per candidate, never the
blocking shuffle. At the test corpus's tiny synthetic vocabulary
(31 tokens) blocks are dense; with a real Zipfian vocabulary the
prefix blocks are the rare tail and the join is output-bound.

floor/ceil discipline: the prefix length uses ceil(tau * n) on IEEE
doubles; double(0.95) < 0.95 exactly, so the computed ceil can only
be <= the exact one — the prefix can only be LONGER than required
(recall preserved), and both engines compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions.text import tokens

TAU = 0.95


def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.filter(tokens("text"), lambda t: t != "")).alias("ts"),
    ).withColumn("n", F.size("ts"))

    ex = toks.select("doc_id", "n", F.explode("ts").alias("token"))
    dfreq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    # global rarity order (df asc, token asc — total, deterministic);
    # the df table is vocabulary-sized -> broadcast
    ranked = ex.join(F.broadcast(dfreq), "token")
    w = Window.partitionBy("doc_id").orderBy("df", "token")
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(TAU) * F.col("n")) + 1)
        .select("doc_id", "token")
    )

    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    ta = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"), F.col("n").alias("na")
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"), F.col("n").alias("nb")
    )
    shared = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = shared / (F.col("na") + F.col("nb") - shared)
    return (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("shared", shared)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= TAU)
        .select("doc_a", "doc_b", "shared", F.round("jaccard", 6).alias("jaccard"))
    )


# the oracle is the brute-force EXACT join (token equi-join, no
# prefix): identical output proves the prefix filter's recall is 1.0,
# not approximately 1.0.
JACCARD_PREFIX_PAIRS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, token
        FROM documents d,
             LATERAL (SELECT unnest(string_split_regex(trim(d.text), '\\s+')) AS token) t
        WHERE token <> ''
        GROUP BY doc_id, token
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS INTEGER) AS shared
        FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared, ROUND(jaccard, 6) AS jaccard
    FROM (
        SELECT doc_a, doc_b, shared,
               shared * 1.0 / (sa.n + sb.n - shared) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    )
    WHERE jaccard >= {TAU}
"""
