"""Similarity-search queries over the ``embeddings`` table
(array<float> vectors): brute-force cosine top-k (correctness
baseline), random-hyperplane LSH top-k (the scale path), near-dup
pair detection, and per-label centroids.

Similarity values are computed with the identical sequential
double-precision fold in both engines (operators/similarity.py), so
they hash-match without tolerance tricks; ranking ties break on
vec_id for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import spread_scan
from global_superstore_data_warehouse_spark.operators import similarity as S

DIMS = 64
NUM_QUERIES = 5  # query set = vec_id < 5
TOP_K = 3
NUM_PLANES = 6
NEAR_DUP_THRESHOLD = 0.4


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set,
    scan the corpus once; rank window is partitioned per query so the
    top-k shuffle carries only qualifying rows."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sim = F.round(S.cosine(F.col("q_emb"), F.col("embedding")), 6)
    ranked = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_K)


COSINE_TOPK_ORACLE = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {NUM_QUERIES}
    ), pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND({S.cosine_sql('q.q_emb', 'e.embedding', DIMS)}, 6) AS cosine_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: vectors hash to a 2^planes
    bucket space via deterministic random hyperplanes; each query
    searches only its own bucket. At 100 TB the bucket column
    becomes the shuffle/partition key and the per-bucket scan
    replaces the full-corpus scan."""
    planes = S.hyperplanes(NUM_PLANES, DIMS)
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", S.lsh_bucket(F.col("embedding"), planes)
    )
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = F.round(S.cosine(F.col("q_emb"), F.col("embedding")), 6)
    ranked = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_K)


def _ann_oracle() -> str:
    planes = S.hyperplanes(NUM_PLANES, DIMS)
    bucket = S.lsh_bucket_sql("embedding", planes, DIMS)
    return f"""
    WITH b AS (
        SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
        FROM b WHERE vec_id < {NUM_QUERIES}
    ), cand AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND({S.cosine_sql('q.q_emb', 'e.embedding', DIMS)}, 6) AS cosine_sim
        FROM b e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM cand
    QUALIFY rank <= {TOP_K}
    """


ANN_LSH_TOPK_ORACLE = _ann_oracle()


NUM_LISTS = 8  # IVF coarse centroids (seed vectors vec_id < 8)
NPROBE = 2


def _unit_centroid_row(emb: DataFrame) -> DataFrame:
    """One row, NUM_LISTS unit-normalized array columns cn0..cn{n-1}:
    the coarse quantizer (seed vectors vec_id < NUM_LISTS —
    deterministic, so oracles can rebuild the identical index).
    Norms are materialized in a separate projection so the fold isn't
    re-run per element."""
    cents = emb.filter(F.col("vec_id") < NUM_LISTS)
    return (
        cents.groupBy()
        .agg(
            *[
                F.max(F.when(F.col("vec_id") == j, F.col("embedding"))).alias(f"c{j}")
                for j in range(NUM_LISTS)
            ]
        )
        .select(
            *[F.col(f"c{j}") for j in range(NUM_LISTS)],
            *[S.norm(F.col(f"c{j}")).alias(f"nc{j}") for j in range(NUM_LISTS)],
        )
        .select(
            *[
                S.normalize(F.col(f"c{j}"), F.col(f"nc{j}")).alias(f"cn{j}")
                for j in range(NUM_LISTS)
            ]
        )
    )


def _best_list():
    """argmax list id for the ``embedding`` column against the
    broadcast cn* centroid columns: max (sim, -list_id) struct —
    highest sim, ties to the smaller list id, matching the oracle's
    ORDER BY sim DESC, list_id ASC. Each dot fold appears exactly
    once in the projection (see ann_ivf_topk's expression-shape
    notes)."""
    return (
        -F.array_max(
            F.array(
                *[
                    F.struct(
                        S.dot(F.col("embedding"), F.col(f"cn{j}")).alias("sim"),
                        F.lit(-j).cast("int").alias("neg_list"),
                    )
                    for j in range(NUM_LISTS)
                ]
            )
        ).getField("neg_list")
    ).cast("int")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer of NUM_LISTS
    seed vectors (embeddings with vec_id < NUM_LISTS — deterministic,
    so the oracle can rebuild the identical index) partitions the
    corpus into inverted lists; each query probes its NPROBE nearest
    lists and brute-forces only those.

    Scale shape: the centroid set rides in ONE broadcast row of
    array columns; assignment is a per-row projection of NUM_LISTS
    dot folds plus one ``array_max`` over (sim, -list_id) structs —
    no join, no shuffle, stays in codegen. The only shuffle is the
    candidate join on list_id (the natural partition key of an IVF
    index at 100 TB: each list is a parquet partition and probing
    prunes directories).

    Two deliberate expression-shape choices (together ~30-40% faster
    than the previous when-chain plan, A/B-measured interleaved at
    sf0.1):

    - each dot fold appears exactly ONCE in the projection (struct
      array + array_max). The previous nested when-chain referenced
      the running best twice per step; CollapseProject inlines
      single-use aliases so the *static* expression tree doubled per
      centroid. Runtime subexpression elimination caps the re-compute
      cost, but codegen still compiles the blown-up tree and the
      interpreted fallback paths pay it in full.
    - corpus/query vectors are NOT normalized: argmax_j cos(e, c_j)
      = argmax_j dot(e, c_j/|c_j|) because |e| is constant across j
      and only the centroids (NUM_LISTS vectors in one broadcast
      row) need unit-normalizing. Skipping the row-side normalize
      also avoids CollapseProject inlining the norm fold into the
      per-element divide lambda (a 64x recompute).

    Honest cost note: with only NUM_QUERIES=5 queries the index
    *build* (NUM_LISTS dot folds per corpus row) dominates and the
    total work is the same order as the brute-force scan. IVF pays
    off when the assignment is computed once and persisted
    (list_id as the partition key) and queries amortize it — this
    query deliberately includes the build so the driver checks the
    whole pipeline.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    cent_row = _unit_centroid_row(emb)
    with_cents = emb.crossJoin(F.broadcast(cent_row))
    corpus = with_cents.select("vec_id", "embedding", _best_list().alias("list_id"))

    # queries probe their NPROBE nearest lists (tiny: queries × lists)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).crossJoin(F.broadcast(cent_row))
    probe_sims = [
        (j, S.dot(F.col("embedding"), F.col(f"cn{j}"))) for j in range(NUM_LISTS)
    ]
    q_lists = (
        q.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.array(
                    *[
                        F.struct(s.alias("sim"), F.lit(j).cast("int").alias("list_id"))
                        for j, s in probe_sims
                    ]
                )
            ).alias("p"),
        )
        .select("query_id", "q_emb", F.col("p.sim").alias("sim"), F.col("p.list_id").alias("list_id"))
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("list_id"))
            ),
        )
        .filter(F.col("probe_rank") <= NPROBE)
        .select("query_id", "q_emb", "list_id")
    )

    cand = corpus.join(
        F.broadcast(q_lists),
        (corpus.list_id == q_lists.list_id) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = F.round(S.cosine(F.col("q_emb"), F.col("embedding")), 6)
    ranked = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_K)


def _ivf_oracle() -> str:
    # assignment sims use the identical raw-row x unit-centroid fold
    # as the Spark plan (only the centroid is normalized; the row
    # norm cancels in the argmax), so list assignment is
    # bit-identical across engines
    nsim = (
        f"list_aggregate(list_transform(range(1, {DIMS + 1}), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * "
        f"(CAST(c.embedding[i] AS DOUBLE) / c.nrm)), 'sum')"
    )
    qcos = S.cosine_sql("q.q_emb", "e.embedding", DIMS)
    return f"""
    WITH cents AS (
        SELECT vec_id AS list_id, embedding,
               {S.norm_sql('embedding', DIMS)} AS nrm
        FROM embeddings WHERE vec_id < {NUM_LISTS}
    ), assigned AS (
        SELECT e.vec_id, e.embedding, CAST(c.list_id AS INTEGER) AS list_id
        FROM embeddings e CROSS JOIN cents c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY {nsim} DESC, c.list_id ASC) = 1
    ), q_lists AS (
        SELECT e.vec_id AS query_id, e.embedding AS q_emb,
               CAST(c.list_id AS INTEGER) AS list_id
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id < {NUM_QUERIES}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY {nsim} DESC, c.list_id ASC) <= {NPROBE}
    ), cand AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND({qcos}, 6) AS cosine_sim
        FROM assigned e JOIN q_lists q
          ON e.list_id = q.list_id AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM cand
    QUALIFY rank <= {TOP_K}
    """


ANN_IVF_TOPK_ORACLE = _ivf_oracle()


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the
    cheap-and-exact candidate key in this corpus; swap for the LSH
    bucket when no label exists). Vectors are unit-normalized ONCE
    per row before the pair join, so each pair costs a single
    dot-fold instead of dot + two norms."""
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    emb_n = emb.select(
        "vec_id", "label", S.norm(F.col("embedding")).alias("nrm"), "embedding"
    ).select(
        "vec_id", "label", S.normalize(F.col("embedding"), F.col("nrm")).alias("emb_n")
    )
    a = emb_n.alias("a")
    b = emb_n.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = F.round(S.dot(F.col("a.emb_n"), F.col("b.emb_n")), 6)
    return pairs.select(
        F.col("a.vec_id").alias("vec_id_a"),
        F.col("b.vec_id").alias("vec_id_b"),
        F.col("a.label").alias("label"),
        sim.alias("cosine_sim"),
    ).filter(F.col("cosine_sim") >= NEAR_DUP_THRESHOLD)


# oracle applies the identical normalize-then-dot fold so values are
# bit-identical (see operators/similarity.ndot_sql)
_ND = S.ndot_sql("a.embedding", "a.nrm", "b.embedding", "b.nrm", DIMS)

EMBEDDING_NEAR_DUP_ORACLE = f"""
    WITH en AS (
        SELECT vec_id, label, embedding, {S.norm_sql('embedding', DIMS)} AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
           ROUND({_ND}, 6) AS cosine_sim
    FROM en a JOIN en b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_ND}, 6) >= {NEAR_DUP_THRESHOLD}
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids: posexplode to (label, dim, value) rows,
    mean per (label, dim). The explode multiplies rows by DIMS but
    the aggregation is map-side partial — at scale this beats any
    driver-side vector math by construction."""
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "val")
    ).select("label", (F.col("dim0") + 1).alias("dim"), F.col("val").cast("double").alias("val"))
    return (
        exploded.groupBy("label", "dim")
        .agg(
            # + 0.0 normalizes IEEE -0.0 to +0.0: a mean that rounds
            # to zero may carry either sign depending on summation
            # order, and the value-hash serializes the sign
            (F.round(F.avg("val"), 4) + F.lit(0.0)).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


EMBEDDING_CENTROIDS_ORACLE = f"""
    SELECT label, CAST(i AS INTEGER) AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS centroid_val,
           COUNT(*) AS n_vectors
    FROM embeddings, range(1, {DIMS + 1}) t(i)
    GROUP BY label, i
"""


# --- k-means (Lloyd) over embeddings ---------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2  # fixed, unrolled in the oracle


def _sq_dist(a, b):
    """Sequential-fold squared euclidean distance (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sq_dist_sql(a: str, b: str, dims: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dims + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means via ``KMEANS_ITERS`` Lloyd rounds — the canonical
    iterative algorithm in its scale-correct Spark shape: centroids
    are a K-row frame that rides a BROADCAST into the assignment
    cross join; the re-estimate is posexplode → per-(cluster, dim)
    mean (map-side partial) → ordered array reassembly with
    ``array_sort(collect_list(struct(dim, val)))`` — K·DIMS rows, no
    driver collect anywhere (MLlib's own Lloyd collects to the
    driver per round; this stays distributed end-to-end).

    Determinism: init = the first K vectors by vec_id; assignment
    ties break on centroid id; re-estimated centroids round to 6 dp
    in BOTH engines so the second assignment sees identical floats.
    Returns the final assignment with its squared distance."""
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    assign = None
    for it in range(KMEANS_ITERS):
        assign = (
            e.crossJoin(F.broadcast(cents))
            .select("vec_id", "v", "cid", _sq_dist(F.col("v"), F.col("c")).alias("d"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("d", "cid")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        if it < KMEANS_ITERS - 1:
            m = (
                assign.select("cid", F.posexplode("v").alias("dim0", "val"))
                .groupBy("cid", "dim0")
                .agg((F.round(F.avg("val"), 6) + F.lit(0.0)).alias("cv"))
            )
            cents = m.groupBy("cid").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim0", "cv"))),
                    lambda s: s["cv"],
                ).alias("c")
            )
    return assign.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.round("d", 6).alias("sq_dist"),
    )


_KM_D0 = _sq_dist_sql("e.v", "c0.c", DIMS)
_KM_D1 = _sq_dist_sql("e.v", "c1.c", DIMS)

KMEANS_ASSIGN_ORACLE = f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), c0 AS (
        SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {KMEANS_K}
    ), a1 AS (
        SELECT e.vec_id, c0.cid, {_KM_D0} AS d
        FROM e CROSS JOIN c0
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                   ORDER BY d, cid) = 1
    ), m1 AS (
        SELECT a1.cid, i AS dim, ROUND(AVG(e.v[i]), 6) + 0.0 AS cv
        FROM a1 JOIN e USING (vec_id), range(1, {DIMS + 1}) t(i)
        GROUP BY a1.cid, i
    ), c1 AS (
        SELECT cid, list(cv ORDER BY dim) AS c FROM m1 GROUP BY cid
    ), a2 AS (
        SELECT e.vec_id, c1.cid, {_KM_D1} AS d
        FROM e CROSS JOIN c1
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                   ORDER BY d, cid) = 1
    )
    SELECT vec_id, cid AS cluster_id, ROUND(d, 6) AS sq_dist FROM a2
"""


# --- ANN quality evaluation (recall@k vs the exact baseline) ---------

def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of BOTH approximate indexes against the exact
    brute-force baseline, per query — the measurement loop every ANN
    deployment needs before trusting the approximate path ("measure,
    don't guess"): recall = |ann top-k ∩ exact top-k| / k. Queries
    whose ANN bucket/list missed every true neighbor still appear
    (hits 0, recall 0) — silent dropouts are exactly what this query
    exists to expose.

    Plan: the three top-k frames are tiny (queries × k rows), so the
    intersection joins and the final assembly are broadcast-sized; at
    100 TB the cost is the three underlying searches themselves, and
    in practice the eval runs on a sampled query set while production
    traffic takes only the ANN path.
    """
    exact = cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = ann_lsh_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")

    base = exact.groupBy("query_id").agg(F.count("*").cast("int").alias("k"))

    def hits(approx: DataFrame, name: str) -> DataFrame:
        return (
            exact.join(approx, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").cast("int").alias(name))
        )

    return (
        base.join(hits(lsh, "lsh_hits"), "query_id", "left")
        .join(hits(ivf, "ivf_hits"), "query_id", "left")
        .select(
            "query_id",
            "k",
            F.coalesce("lsh_hits", F.lit(0)).alias("lsh_hits"),
            F.coalesce("ivf_hits", F.lit(0)).alias("ivf_hits"),
        )
        .select(
            "query_id",
            "k",
            "lsh_hits",
            F.round(F.col("lsh_hits") / F.col("k").cast("double"), 6).alias(
                "lsh_recall"
            ),
            "ivf_hits",
            F.round(F.col("ivf_hits") / F.col("k").cast("double"), 6).alias(
                "ivf_recall"
            ),
        )
    )


ANN_RECALL_ORACLE = f"""
    WITH exact AS (
        SELECT query_id, neighbor_id FROM ({COSINE_TOPK_ORACLE})
    ), lsh AS (
        SELECT query_id, neighbor_id FROM ({ANN_LSH_TOPK_ORACLE})
    ), ivf AS (
        SELECT query_id, neighbor_id FROM ({ANN_IVF_TOPK_ORACLE})
    ), base AS (
        SELECT query_id, CAST(COUNT(*) AS INTEGER) AS k
        FROM exact GROUP BY query_id
    ), lh AS (
        SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS lsh_hits
        FROM exact e JOIN lsh USING (query_id, neighbor_id)
        GROUP BY e.query_id
    ), ih AS (
        SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS ivf_hits
        FROM exact e JOIN ivf USING (query_id, neighbor_id)
        GROUP BY e.query_id
    )
    SELECT b.query_id, b.k,
           COALESCE(lh.lsh_hits, 0) AS lsh_hits,
           ROUND(COALESCE(lh.lsh_hits, 0) / CAST(b.k AS DOUBLE), 6) AS lsh_recall,
           COALESCE(ih.ivf_hits, 0) AS ivf_hits,
           ROUND(COALESCE(ih.ivf_hits, 0) / CAST(b.k AS DOUBLE), 6) AS ivf_recall
    FROM base b
    LEFT JOIN lh ON b.query_id = lh.query_id
    LEFT JOIN ih ON b.query_id = ih.query_id
"""


# --- graded ranking quality: NDCG@k + MRR of the ANN indexes ----------

# Position discounts 1/log2(p+1) frozen as INTEGER micro-units at
# authoring time, identical literals in the Spark plan and the oracle
# — the DCG sum is then exact integer arithmetic (engine-order-proof),
# with ONE final division by the (constant) ideal DCG. rel(gold rank
# r) = TOP_K - r + 1, so IDCG = sum_p (TOP_K-p+1) * DISC[p].
NDCG_DISC_MICRO = (1_000_000, 630_930, 500_000)  # p = 1..TOP_K
NDCG_IDCG_MICRO = sum(
    (TOP_K - p + 1) * NDCG_DISC_MICRO[p - 1] for p in range(1, TOP_K + 1)
)


def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking quality of BOTH approximate indexes vs the
    exact baseline, per query: NDCG@k (did the ANN list put the MOST
    similar neighbors FIRST?) and MRR (how deep is the first true
    neighbor?). Recall@k (``ann_recall``) treats the top-k as a set;
    NDCG is the metric that separates an index that returns the
    right set in the wrong order from one that nails the ranking —
    the standard offline gate for retrieval-augmented pipelines.

    rel of an ANN hit = TOP_K - exact_rank + 1 (graded by the exact
    ranking), discounted by the frozen 1/log2(p+1) micro-table at
    the ANN position p; misses contribute 0. MRR is reported in
    exact micro-units (1e6 DIV first-hit position; 0 = no hit in
    the top-k). All sums are integer; the single float division per
    metric happens once, then ROUND 6 — no accumulation-order
    exposure.

    Plan shape: three queries*k-sized frames, broadcast-sized joins
    — the cost is the underlying searches, as with ``ann_recall``.
    """
    disc = F.when(F.col("rank") == 1, F.lit(NDCG_DISC_MICRO[0]))
    for p in range(2, TOP_K + 1):
        disc = disc.when(F.col("rank") == p, F.lit(NDCG_DISC_MICRO[p - 1]))
    exact = cosine_topk(spark, sf_dir).select(
        "query_id",
        "neighbor_id",
        (F.lit(TOP_K) - F.col("rank") + 1).cast("long").alias("rel"),
    )

    def metrics(approx: DataFrame, tag: str) -> DataFrame:
        a = approx.select(
            "query_id", "neighbor_id", disc.cast("long").alias("disc"), "rank"
        )
        scored = a.join(exact, ["query_id", "neighbor_id"], "left")
        return scored.groupBy("query_id").agg(
            F.round(
                F.sum(
                    F.coalesce(F.col("rel"), F.lit(0)) * F.col("disc")
                ) / F.lit(float(NDCG_IDCG_MICRO)),
                6,
            ).alias(f"{tag}_ndcg"),
            F.coalesce(
                F.expr(
                    "1000000 div min(CASE WHEN rel IS NOT NULL THEN rank END)"
                ),
                F.lit(0),
            ).cast("long").alias(f"{tag}_mrr_micro"),
        )

    lsh = metrics(ann_lsh_topk(spark, sf_dir), "lsh")
    ivf = metrics(ann_ivf_topk(spark, sf_dir), "ivf")
    return lsh.join(ivf, "query_id").select(
        "query_id", "lsh_ndcg", "lsh_mrr_micro", "ivf_ndcg", "ivf_mrr_micro"
    )


RETRIEVAL_NDCG_EVAL_ORACLE = f"""
    WITH exact AS (
        SELECT query_id, neighbor_id,
               CAST({TOP_K} - rank + 1 AS BIGINT) AS rel
        FROM ({COSINE_TOPK_ORACLE})
    ), lsh AS (
        SELECT query_id, neighbor_id, rank FROM ({ANN_LSH_TOPK_ORACLE})
    ), ivf AS (
        SELECT query_id, neighbor_id, rank FROM ({ANN_IVF_TOPK_ORACLE})
    ), disc(p, d) AS (
        VALUES (1, {NDCG_DISC_MICRO[0]}), (2, {NDCG_DISC_MICRO[1]}),
               (3, {NDCG_DISC_MICRO[2]})
    ), lm AS (
        SELECT l.query_id,
               ROUND(SUM(COALESCE(e.rel, 0) * dc.d)
                     / {float(NDCG_IDCG_MICRO)}, 6) AS lsh_ndcg,
               CAST(COALESCE(1000000 // MIN(CASE WHEN e.rel IS NOT NULL
                    THEN l.rank END), 0) AS BIGINT) AS lsh_mrr_micro
        FROM lsh l
        JOIN disc dc ON dc.p = l.rank
        LEFT JOIN exact e USING (query_id, neighbor_id)
        GROUP BY l.query_id
    ), im AS (
        SELECT i.query_id,
               ROUND(SUM(COALESCE(e.rel, 0) * dc.d)
                     / {float(NDCG_IDCG_MICRO)}, 6) AS ivf_ndcg,
               CAST(COALESCE(1000000 // MIN(CASE WHEN e.rel IS NOT NULL
                    THEN i.rank END), 0) AS BIGINT) AS ivf_mrr_micro
        FROM ivf i
        JOIN disc dc ON dc.p = i.rank
        LEFT JOIN exact e USING (query_id, neighbor_id)
        GROUP BY i.query_id
    )
    SELECT query_id, lm.lsh_ndcg, lm.lsh_mrr_micro,
           im.ivf_ndcg, im.ivf_mrr_micro
    FROM lm JOIN im USING (query_id)
"""



# --- per-dimension feature standardization ----------------------------

def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION z-score standardization of the embedding corpus
    (the preprocessing step before distance-based indexing/clustering
    when dimensions have heterogeneous scales): posexplode to
    (vec_id, dim, val), one partial-aggregated groupBy(dim) for
    mean/stddev — DIMS rows, broadcast back — then the scaled value.
    Two scans' worth of work but ONE corpus shuffle-free projection
    plus a dims-sized broadcast join: the corpus-sized side never
    shuffles (posexplode is pipelined into the scan).

    Output stays exploded (vec_id, dim, z) rather than re-assembled:
    re-collecting arrays would add a vec_id shuffle for a result the
    downstream consumer (an indexer) explodes again anyway. The
    array twin is one groupBy(vec_id, sort_array(collect_list)).
    stddev is the sample stddev (both engines' default)."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    dim_stats = flat.groupBy("dim").agg(
        F.avg("val").alias("mu"), F.stddev_samp("val").alias("sigma")
    )
    return (
        flat.join(F.broadcast(dim_stats), "dim")
        .select(
            "vec_id",
            "dim",
            F.round((F.col("val") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
        )
    )


EMBEDDING_STANDARDIZE_ORACLE = f"""
    WITH flat AS (
        SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
               CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
        FROM embeddings, LATERAL (SELECT unnest(range(1, {DIMS + 1})) AS i) t
    ),
    dim_stats AS (
        SELECT dim, AVG(val) AS mu, STDDEV_SAMP(val) AS sigma
        FROM flat GROUP BY dim
    )
    SELECT f.vec_id, f.dim, ROUND((f.val - s.mu) / s.sigma, 6) AS z
    FROM flat f JOIN dim_stats s USING (dim)
"""


# --- hard-negative mining for contrastive training --------------------

HN_K = 5


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: for each query vector,
    the HN_K highest-cosine corpus vectors whose LABEL differs — the
    near-boundary impostors that make contrastive losses learn
    anything (random negatives are trivially separable). Same
    broadcast-query brute-force shape as ``cosine_topk`` with the
    label inequality pushed into the pair filter; the scale path is
    the IVF/LSH bucketed candidate generator feeding the same
    label-aware rank.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("label") != F.col("q_label"))
    sim = F.round(S.cosine(F.col("q_emb"), F.col("embedding")), 6)
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("negative_id"), sim.alias("cosine_sim")
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine_sim"), F.asc("negative_id")
                )
            ),
        )
        .filter(F.col("rank") <= HN_K)
    )


HARD_NEGATIVE_MINING_ORACLE = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
        FROM embeddings WHERE vec_id < {NUM_QUERIES}
    ), pairs AS (
        SELECT q.query_id, e.vec_id AS negative_id,
               ROUND({S.cosine_sql('q.q_emb', 'e.embedding', DIMS)}, 6) AS cosine_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.label <> q.q_label
    )
    SELECT query_id, negative_id, cosine_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, negative_id ASC) AS INTEGER) AS rank
    FROM pairs
    QUALIFY rank <= {HN_K}
"""


# --- SemDeDup-style semantic deduplication ----------------------------

SEMDEDUP_THRESHOLD = 0.4


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., 2023): cluster
    the corpus with the coarse quantizer, then WITHIN each cluster
    drop every vector that has a lower-id neighbor above the cosine
    threshold — one keep/drop decision per row, ``dup_of`` naming
    the lowest-id retained-or-earlier neighbor so the decision is
    auditable. Keeps exactly the earliest member of every
    near-duplicate neighborhood; deterministic (id order, no RNG).

    Scale shape: the all-pairs comparison is confined to a cluster
    (the SemDeDup trick — at 100 TB you raise NUM_LISTS so the
    expected list size stays bounded, keeping intra-list pairs
    ~n²/k); assignment is the broadcast-quantizer projection (no
    shuffle), the pair join shuffles on list_id only, and the
    assigned corpus is checkpointed narrow so the self-join's two
    branches don't recompute the quantizer. Never a corpus-level
    cross join.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    cent_row = _unit_centroid_row(emb)
    n_part = spark.sparkContext.defaultParallelism
    # per-vector norms precomputed once — see semantic_near_dup_pairs
    corpus = (
        emb.crossJoin(F.broadcast(cent_row))
        .select(
            "vec_id",
            "embedding",
            _best_list().alias("list_id"),
            S.norm(F.col("embedding")).alias("nrm"),
        )
        .repartition(n_part, "vec_id")
        .localCheckpoint(eager=True)
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    sim = F.round(
        S.dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    dups = (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .filter(sim >= SEMDEDUP_THRESHOLD)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min(F.col("b.vec_id")).alias("dup_of"))
    )
    return (
        corpus.select("vec_id", "list_id")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("keep"),
        )
    )


def _semantic_dedup_oracle() -> str:
    # identical cents/assigned CTEs as the IVF oracle: raw-row x
    # unit-centroid fold, ties to the smaller list id
    nsim = (
        f"list_aggregate(list_transform(range(1, {DIMS + 1}), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * "
        f"(CAST(c.embedding[i] AS DOUBLE) / c.nrm)), 'sum')"
    )
    paircos = S.cosine_sql("a.embedding", "b.embedding", DIMS)
    return f"""
    WITH cents AS (
        SELECT vec_id AS list_id, embedding,
               {S.norm_sql('embedding', DIMS)} AS nrm
        FROM embeddings WHERE vec_id < {NUM_LISTS}
    ), assigned AS (
        SELECT e.vec_id, e.embedding, CAST(c.list_id AS INTEGER) AS list_id
        FROM embeddings e CROSS JOIN cents c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY {nsim} DESC, c.list_id ASC) = 1
    ), dups AS (
        SELECT a.vec_id, MIN(b.vec_id) AS dup_of
        FROM assigned a JOIN assigned b
          ON a.list_id = b.list_id AND b.vec_id < a.vec_id
        WHERE ROUND({paircos}, 6) >= {SEMDEDUP_THRESHOLD}
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, a.list_id, d.dup_of,
           CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS keep
    FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """


SEMANTIC_DEDUP_ORACLE = _semantic_dedup_oracle()


def semantic_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster semantic near-dup PAIRS (vec_a < vec_b,
    cosine >= SEMDEDUP_THRESHOLD) — the pair-level intermediate of
    ``semantic_dedup``, exposed for composition (the split-leakage
    audit consumes it). Same scale shape: quantizer assignment is a
    broadcast projection, the self-join is confined to a cluster."""
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    cent_row = _unit_centroid_row(emb)
    n_part = spark.sparkContext.defaultParallelism
    # norms are precomputed ONCE per vector (corpus-scale) instead of
    # re-folded per PAIR — dot/(na*nb) with stored sqrt values is
    # bit-identical to the inline cosine (same IEEE ops, same order),
    # but the pair stage folds one array walk instead of three
    corpus = (
        emb.crossJoin(F.broadcast(cent_row))
        .select(
            "vec_id",
            "embedding",
            _best_list().alias("list_id"),
            S.norm(F.col("embedding")).alias("nrm"),
        )
        .repartition(n_part, "vec_id")
        .localCheckpoint(eager=True)
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    sim = F.round(
        S.dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= SEMDEDUP_THRESHOLD)
    )


def _semantic_pairs_oracle() -> str:
    nsim = (
        f"list_aggregate(list_transform(range(1, {DIMS + 1}), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * "
        f"(CAST(c.embedding[i] AS DOUBLE) / c.nrm)), 'sum')"
    )
    paircos = S.cosine_sql("a.embedding", "b.embedding", DIMS)
    return f"""
    WITH cents AS (
        SELECT vec_id AS list_id, embedding,
               {S.norm_sql('embedding', DIMS)} AS nrm
        FROM embeddings WHERE vec_id < {NUM_LISTS}
    ), assigned AS (
        SELECT e.vec_id, e.embedding, CAST(c.list_id AS INTEGER) AS list_id
        FROM embeddings e CROSS JOIN cents c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY {nsim} DESC, c.list_id ASC) = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({paircos}, 6) AS cosine_sim
    FROM assigned a JOIN assigned b
      ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    WHERE ROUND({paircos}, 6) >= {SEMDEDUP_THRESHOLD}
    """


SEMANTIC_NEAR_DUP_PAIRS_ORACLE = _semantic_pairs_oracle()



# --- cluster-balanced diversity sampling ------------------------------

CLUSTER_SAMPLE_QUOTA = 40


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling over the embedding corpus: cap every
    k-means cluster at CLUSTER_SAMPLE_QUOTA vectors, chosen in
    deterministic md5 order — the cluster-balanced subset selection
    step of the SemDeDup/diversity-filter family (dense regions of
    embedding space contribute bounded mass to the training mix,
    sparse regions survive whole).

    Composition: the fully-distributed Lloyd assignment
    (``kmeans_assign`` — broadcast centroids, no driver collect)
    feeds the per-group quota shape of ``curation.domain_quota_sample``
    keyed on cluster_id. The quota window sorts only (vec_id,
    cluster_id) narrow rows; embeddings never ride the shuffle. At
    extreme cluster cardinalities the two-phase top-K variant
    (``domain_quota_sample_twophase``) swaps in unchanged.
    """
    assign = kmeans_assign(spark, sf_dir).select("vec_id", "cluster_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        assign.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= CLUSTER_SAMPLE_QUOTA)
        .withColumn("sample_rank", F.col("sample_rank").cast("int"))
    )


CLUSTER_BALANCED_SAMPLE_ORACLE = f"""
    WITH assign AS (
        {KMEANS_ASSIGN_ORACLE}
    ), ranked AS (
        SELECT vec_id, cluster_id,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster_id
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS sample_rank
        FROM assign
    )
    SELECT vec_id, cluster_id, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked
    WHERE sample_rank <= {CLUSTER_SAMPLE_QUOTA}
"""


# --- int8 scalar-quantized ANN with exact rerank ----------------------

RERANK_M = 10  # approx candidates refined exactly per query


def ann_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-corpus ANN: per-vector symmetric int8 quantization
    (scale = max|x|/127) shrinks the scanned corpus 4x vs float32 /
    8x vs float64 — at 100 TB the int8 code table IS what you
    persist and scan; the float vectors are fetched only for the
    top-M rerank (M rows per query, not |corpus|). The candidate
    scan ranks by integer dot products (EXACT arithmetic — the
    approx scores are bit-identical across engines by construction,
    no float summation-order tolerance games), then the top-M
    candidates are re-scored with exact float cosine and the final
    top-k is returned with both scores for audit.

    Plan: quantize in one projection (no shuffle), broadcast the
    quantized query set, one corpus scan for the integer-dot
    candidate ranking, rerank window over M x |queries| rows.
    Recall vs the exact brute-force baseline is pinned in pytest."""
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    z = (
        emb.withColumn("scale", S.int8_scale(F.col("embedding")))
        .withColumn("q8", S.int8_quantize(F.col("embedding"), F.col("scale")))
        .drop("scale")
        .withColumn(
            "n2", F.greatest(S.int_dot(F.col("q8"), F.col("q8")), F.lit(1))
        )
    )
    q = z.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("q8").alias("qq8"),
        F.col("n2").alias("qn2"),
    )
    pairs = z.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    approx = F.round(
        S.int_dot(F.col("qq8"), F.col("q8"))
        / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("n2"))),
        6,
    )
    cand = (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "q_emb",
            "embedding",
            approx.alias("approx_sim"),
        )
        .withColumn(
            "arank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("approx_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("arank") <= RERANK_M)
    )
    exact = F.round(S.cosine(F.col("q_emb"), F.col("embedding")), 6)
    return (
        cand.select(
            "query_id", "neighbor_id", "approx_sim", exact.alias("cosine_sim")
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= TOP_K)
    )


def _int8_oracle() -> str:
    scale = S.int8_scale_sql("embedding")
    return f"""
    WITH qz AS (
        SELECT vec_id, embedding,
               {S.int8_quantize_sql('embedding', scale)} AS q8
        FROM embeddings
    ), z AS (
        SELECT vec_id, embedding, q8,
               greatest({S.int_dot_sql('q8', 'q8', DIMS)}, 1) AS n2
        FROM qz
    ), q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, q8 AS qq8, n2 AS qn2
        FROM z WHERE vec_id < {NUM_QUERIES}
    ), cand AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.q_emb, e.embedding,
               ROUND({S.int_dot_sql('q.qq8', 'e.q8', DIMS)}
                     / (sqrt(q.qn2) * sqrt(e.n2)), 6) AS approx_sim
        FROM z e CROSS JOIN q WHERE e.vec_id <> q.query_id
    ), top_m AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY approx_sim DESC, neighbor_id ASC) AS arank
        FROM cand
        QUALIFY arank <= {RERANK_M}
    ), scored AS (
        SELECT query_id, neighbor_id, approx_sim,
               ROUND({S.cosine_sql('q_emb', 'embedding', DIMS)}, 6) AS cosine_sim
        FROM top_m
    )
    SELECT query_id, neighbor_id, approx_sim, cosine_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {TOP_K}
    """


ANN_INT8_RERANK_ORACLE = _int8_oracle()


# --- product quantization: train codebooks, encode, ADC scan ---------

PQ_M = 4                 # subspaces
PQ_SUBDIM = DIMS // PQ_M  # 16 dims per subspace
PQ_K = 8                 # codes per subspace -> 3 bits, 12-bit vector code


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, the full train → encode → search
    loop (Jégou et al.'s PQ): split every vector into {PQ_M}
    subvectors, train a {PQ_K}-centroid codebook per subspace
    (deterministic init = the first {PQ_K} vectors' subvectors, one
    Lloyd refinement — the same broadcast-assign / posexplode-mean
    shape as kmeans_assign), encode the corpus as {PQ_M} small codes
    per vector, then answer each query with ASYMMETRIC DISTANCE
    COMPUTATION: a per-query lookup table of query-subvector ×
    centroid distances (broadcast, {PQ_M}·{PQ_K} rows per query)
    joined to the code table and summed — the corpus's float vectors
    are never touched during the scan. Returns per-query top
    {TOP_K} by ADC distance with the true float distance alongside
    (the rerank/audit column).

    Scale shape: codebooks and LUTs are broadcast-sized model state;
    the ADC scan is code-table × LUT join + map-side-combined sum —
    at 100 TB the code table (12 bits/vector here vs 2048 for the
    floats) IS the thing you scan, the same compressed-scan posture
    as ann_int8_rerank but sublinear in dimension. Argmin windows
    partition on (vec_id, m) — fully parallel.

    Determinism: codebook means round to 6 dp in both engines (the
    kmeans_assign discipline); distance sums are rounded AFTER the
    fixed-order sequential fold; ranking ties break on vec_id.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    subs = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("v", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    init = subs.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("c")
    )
    a0 = (
        subs.join(F.broadcast(init), "m")
        .select("vec_id", "m", "sv", "cid", _sq_dist(F.col("sv"), F.col("c")).alias("d"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d", "cid")),
        )
        .filter(F.col("rn") == 1)
    )
    cb = (
        a0.select("m", "cid", F.posexplode("sv").alias("dim0", "val"))
        .groupBy("m", "cid", "dim0")
        .agg((F.round(F.avg("val"), 6) + F.lit(0.0)).alias("cv"))
        .groupBy("m", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )
    )
    codes = (
        subs.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "cid", _sq_dist(F.col("sv"), F.col("c")).alias("d"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("cid").alias("code"))
    )
    lut = (
        subs.filter(F.col("vec_id") < NUM_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("m").alias("lm"), "sv")
        .join(F.broadcast(cb.withColumnRenamed("m", "lm")), "lm")
        .select(
            "query_id",
            "lm",
            F.col("cid").alias("lcid"),
            _sq_dist(F.col("sv"), F.col("c")).alias("dpart"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["lm"]) & (codes["code"] == lut["lcid"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dpart"), 6).alias("adc_dist"))
    )
    topk = (
        adc.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
            ),
        )
        .filter(F.col("rank") <= TOP_K)
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    eq = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    en = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    return (
        topk.join(F.broadcast(eq), "query_id")
        .join(en, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "adc_dist",
            F.round(_sq_dist(F.col("qv"), F.col("nv")), 6).alias("true_sq_dist"),
        )
    )


_PQ_SUB_D = _sq_dist_sql("s.sv", "i.c", PQ_SUBDIM)
_PQ_CB_D = _sq_dist_sql("s.sv", "c.c", PQ_SUBDIM)
_PQ_LUT_D = _sq_dist_sql("q.sv", "c.c", PQ_SUBDIM)
_PQ_TRUE_D = _sq_dist_sql("eq.v", "en.v", DIMS)

ANN_PQ_ADC_ORACLE = f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), subs AS (
        SELECT vec_id, m,
               list_slice(v, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM})
                   AS sv
        FROM e, range(0, {PQ_M}) t(m)
    ), init AS (
        SELECT m, vec_id AS cid, sv AS c FROM subs WHERE vec_id < {PQ_K}
    ), a0 AS (
        SELECT s.vec_id, s.m, s.sv, i.cid, {_PQ_SUB_D} AS d
        FROM subs s JOIN init i USING (m)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                   ORDER BY d, cid) = 1
    ), cbm AS (
        SELECT a0.m, a0.cid, i AS dim, ROUND(AVG(a0.sv[i]), 6) + 0.0 AS cv
        FROM a0, range(1, {PQ_SUBDIM + 1}) t(i)
        GROUP BY a0.m, a0.cid, i
    ), cb AS (
        SELECT m, cid, list(cv ORDER BY dim) AS c FROM cbm GROUP BY m, cid
    ), codes AS (
        SELECT s.vec_id, s.m, c.cid AS code, {_PQ_CB_D} AS d
        FROM subs s JOIN cb c USING (m)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                   ORDER BY d, cid) = 1
    ), lut AS (
        SELECT q.vec_id AS query_id, q.m, c.cid, {_PQ_LUT_D} AS dpart
        FROM subs q JOIN cb c USING (m)
        WHERE q.vec_id < {NUM_QUERIES}
    ), adc AS (
        SELECT l.query_id, cd.vec_id, ROUND(SUM(l.dpart), 6) AS adc_dist
        FROM codes cd JOIN lut l ON cd.m = l.m AND cd.code = l.cid
        WHERE cd.vec_id <> l.query_id
        GROUP BY l.query_id, cd.vec_id
    ), topk AS (
        SELECT query_id, vec_id AS neighbor_id, adc_dist,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
        FROM adc
        QUALIFY rank <= {TOP_K}
    )
    SELECT t.query_id, t.neighbor_id, t.rank, t.adc_dist,
           ROUND({_PQ_TRUE_D}, 6) AS true_sq_dist
    FROM topk t
    JOIN e eq ON eq.vec_id = t.query_id
    JOIN e en ON en.vec_id = t.neighbor_id
"""


# --- IVF + PQ on residuals: the IVFADC index ------------------------


def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", §IV): the composition of the two scale levers
    this family builds separately — IVF pruning (scan only the
    NPROBE probed cells, not the corpus) and PQ compression (scan
    {PQ_M} small codes per vector, not floats). A coarse quantizer
    of NUM_LISTS seed vectors assigns every vector to a cell; PQ
    codebooks are trained on the RESIDUAL v - c_cell (residual
    energy is what's left after the coarse quantizer explains the
    cell mean — the standard IVFADC refinement over quantizing raw
    vectors); queries probe their NPROBE nearest cells and score
    candidates by per-cell asymmetric-distance lookup tables over
    the QUERY residual. Returns per-query top {TOP_K} by ADC
    distance with the exact float distance alongside for audit.

    Scale shape: seeds, codebooks, and per-(query, cell) LUTs are
    broadcast-sized model state ({PQ_M}·{PQ_K} rows per probed
    cell); the scan side touches ONLY the code rows of probed cells
    — cell_id is the partition key of the persisted index at 100 TB,
    so probing prunes partitions, and the per-cell scan reads
    {PQ_M} small ints per vector. All argmin windows partition on
    (vec_id[, m]) — fully parallel, no global sort.

    Determinism: same disciplines as ann_pq_adc — codebook means
    round to 6 dp, ADC sums round AFTER the fixed-order fold,
    ranking ties break on vec_id; coarse assignment argmin breaks
    ties on cell id.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    seeds = e.filter(F.col("vec_id") < NUM_LISTS).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("c")
    )
    assigned = (
        e.crossJoin(F.broadcast(seeds))
        .select("vec_id", "v", "cell", _sq_dist(F.col("v"), F.col("c")).alias("d"), "c")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d", "cell")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cell",
            F.zip_with("v", "c", lambda a, b: a - b).alias("r"),
        )
    )
    rsubs = assigned.select(
        "vec_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("r", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "cell", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    init = rsubs.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("c")
    )
    a0 = (
        rsubs.join(F.broadcast(init), "m")
        .select(
            "vec_id", "m", "sv", "cid", _sq_dist(F.col("sv"), F.col("c")).alias("d")
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d", "cid")),
        )
        .filter(F.col("rn") == 1)
    )
    cb = (
        a0.select("m", "cid", F.posexplode("sv").alias("dim0", "val"))
        .groupBy("m", "cid", "dim0")
        .agg((F.round(F.avg("val"), 6) + F.lit(0.0)).alias("cv"))
        .groupBy("m", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )
    )
    codes = (
        rsubs.join(F.broadcast(cb), "m")
        .select(
            "vec_id", "cell", "m", "cid", _sq_dist(F.col("sv"), F.col("c")).alias("d")
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("d", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "m", F.col("cid").alias("code"))
    )
    # queries probe their NPROBE nearest cells, then build one LUT per
    # probed cell over the query's residual AGAINST THAT CELL
    q = e.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probes = (
        q.crossJoin(F.broadcast(seeds))
        .select(
            "query_id", "qv", "cell", _sq_dist(F.col("qv"), F.col("c")).alias("d"), "c"
        )
        .withColumn(
            "prank",
            F.row_number().over(Window.partitionBy("query_id").orderBy("d", "cell")),
        )
        .filter(F.col("prank") <= NPROBE)
        .select(
            "query_id",
            "cell",
            F.zip_with("qv", "c", lambda a, b: a - b).alias("qr"),
        )
    )
    qsubs = probes.select(
        "query_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("qr", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("query_id", "cell", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    lut = qsubs.join(F.broadcast(cb), "m").select(
        "query_id",
        F.col("cell").alias("lcell"),
        F.col("m").alias("lm"),
        F.col("cid").alias("lcid"),
        _sq_dist(F.col("sv"), F.col("c")).alias("dpart"),
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["cell"] == lut["lcell"])
            & (codes["m"] == lut["lm"])
            & (codes["code"] == lut["lcid"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dpart"), 6).alias("adc_dist"))
    )
    topk = (
        adc.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
            ),
        )
        .filter(F.col("rank") <= TOP_K)
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    en = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    return (
        topk.join(F.broadcast(q), "query_id")
        .join(en, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "adc_dist",
            F.round(_sq_dist(F.col("qv"), F.col("nv")), 6).alias("true_sq_dist"),
        )
    )


_IVFPQ_COARSE_D = _sq_dist_sql("e.v", "s.c", DIMS)
_IVFPQ_SUB_D = _sq_dist_sql("s.sv", "i.c", PQ_SUBDIM)
_IVFPQ_CB_D = _sq_dist_sql("s.sv", "c.c", PQ_SUBDIM)
_IVFPQ_LUT_D = _sq_dist_sql("q.sv", "c.c", PQ_SUBDIM)
_IVFPQ_QCOARSE_D = _sq_dist_sql("q.qv", "s.c", DIMS)
_IVFPQ_TRUE_D = _sq_dist_sql("eq.v", "en.v", DIMS)

ANN_IVF_PQ_ORACLE = f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), seeds AS (
        SELECT CAST(vec_id AS INTEGER) AS cell, v AS c
        FROM e WHERE vec_id < {NUM_LISTS}
    ), assigned AS (
        SELECT e.vec_id, s.cell,
               list_transform(range(1, {DIMS + 1}),
                              i -> e.v[i] - s.c[i]) AS r
        FROM e CROSS JOIN seeds s
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY {_IVFPQ_COARSE_D}, s.cell) = 1
    ), rsubs AS (
        SELECT vec_id, cell, m,
               list_slice(r, m * {PQ_SUBDIM} + 1,
                          m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
        FROM assigned, range(0, {PQ_M}) t(m)
    ), init AS (
        SELECT m, vec_id AS cid, sv AS c FROM rsubs WHERE vec_id < {PQ_K}
    ), a0 AS (
        SELECT s.vec_id, s.m, s.sv, i.cid, {_IVFPQ_SUB_D} AS d
        FROM rsubs s JOIN init i USING (m)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                   ORDER BY d, cid) = 1
    ), cbm AS (
        SELECT a0.m, a0.cid, i AS dim, ROUND(AVG(a0.sv[i]), 6) + 0.0 AS cv
        FROM a0, range(1, {PQ_SUBDIM + 1}) t(i)
        GROUP BY a0.m, a0.cid, i
    ), cb AS (
        SELECT m, cid, list(cv ORDER BY dim) AS c FROM cbm GROUP BY m, cid
    ), codes AS (
        SELECT s.vec_id, s.cell, s.m, c.cid AS code, {_IVFPQ_CB_D} AS d
        FROM rsubs s JOIN cb c USING (m)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                   ORDER BY d, cid) = 1
    ), qv AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {NUM_QUERIES}
    ), probes AS (
        SELECT q.query_id, s.cell,
               list_transform(range(1, {DIMS + 1}),
                              i -> q.qv[i] - s.c[i]) AS qr
        FROM qv q CROSS JOIN seeds s
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q.query_id
                ORDER BY {_IVFPQ_QCOARSE_D}, s.cell) <= {NPROBE}
    ), qsubs AS (
        SELECT query_id, cell, m,
               list_slice(qr, m * {PQ_SUBDIM} + 1,
                          m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
        FROM probes, range(0, {PQ_M}) t(m)
    ), lut AS (
        SELECT q.query_id, q.cell, q.m, c.cid, {_IVFPQ_LUT_D} AS dpart
        FROM qsubs q JOIN cb c USING (m)
    ), adc AS (
        SELECT l.query_id, cd.vec_id, ROUND(SUM(l.dpart), 6) AS adc_dist
        FROM codes cd
        JOIN lut l ON cd.cell = l.cell AND cd.m = l.m AND cd.code = l.cid
        WHERE cd.vec_id <> l.query_id
        GROUP BY l.query_id, cd.vec_id
    ), topk AS (
        SELECT query_id, vec_id AS neighbor_id, adc_dist,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
        FROM adc
        QUALIFY rank <= {TOP_K}
    )
    SELECT t.query_id, t.neighbor_id, t.rank, t.adc_dist,
           ROUND({_IVFPQ_TRUE_D}, 6) AS true_sq_dist
    FROM topk t
    JOIN e eq ON eq.vec_id = t.query_id
    JOIN e en ON en.vec_id = t.neighbor_id
"""


# --- margin-based bitext mining (Artetxe & Schwenk 2019) --------------

MARGIN_K = 4  # kNN neighborhood size for the margin normalizer


def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-corpus mining across languages with MARGIN scoring
    (Artetxe & Schwenk 2019, the LASER/CCMatrix recipe): a raw
    cosine threshold fails because some source sentences are "hubs"
    (high cosine to everything), so each candidate pair (x, y) is
    scored relative to its neighborhoods — here the DISTANCE margin

        margin(x, y) = cos(x, y)
                     - ( avg cos of x's K-NN in the target side
                       + avg cos of y's K-NN in the source side ) / 2

    and x's best y is mined when its margin is positive (better than
    its neighborhood average). Sides: lang='en' documents vs
    lang='de' documents (documents.doc_id ≡ embeddings.vec_id).

    Engine-exact discipline: cosines become integer MICRO-units
    (round(cos*1e6)), so the K-NN sums are exact integers and the
    ranking score ``2K*cm - sum_knn_x - sum_knn_y`` is pure integer
    arithmetic — no float-sum-order exposure anywhere in the
    ranking; the float margin is derived LAST for display. (The
    ratio-margin variant divides by the neighborhood average, which
    is ill-defined when synthetic cosines go negative — the distance
    margin is subtraction-only, total, and rank-equivalent for
    mining.)

    Scale shape: the de side (the smaller language) broadcasts;
    cosine reuses per-side precomputed norms so each pair costs ONE
    64-dim fold, not three; both K-NN reductions are rank windows
    partitioned by one side (partial top-K per partition); output is
    |en|-sized. At 100 TB the broadcast side becomes the LSH/IVF
    bucketed candidate join the ANN family already implements —
    margin scoring composes with any candidate generator.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    sides = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "vec_id", "embedding", "lang"
    )

    def side(lang: str, idc: str, embc: str, nc: str) -> DataFrame:
        s = sides.filter(F.col("lang") == lang).select(
            F.col("vec_id").alias(idc), F.col("embedding").alias(embc)
        )
        return s.withColumn(nc, S.norm(F.col(embc)))

    en = side("en", "x_id", "x_emb", "x_norm")
    de = side("de", "y_id", "y_emb", "y_norm")

    cm = F.round(
        S.dot(F.col("x_emb"), F.col("y_emb"))
        / (F.col("x_norm") * F.col("y_norm"))
        * 1000000.0
    ).cast("long")
    pairs = (
        en.crossJoin(F.broadcast(de))
        .select("x_id", "y_id", cm.alias("cm"))
        .localCheckpoint(eager=True)
    )

    wx = Window.partitionBy("x_id").orderBy(F.desc("cm"), F.asc("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.desc("cm"), F.asc("x_id"))
    sum_x = (
        pairs.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= MARGIN_K)
        .groupBy("x_id")
        .agg(F.sum("cm").alias("sx"))
    )
    sum_y = (
        pairs.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= MARGIN_K)
        .groupBy("y_id")
        .agg(F.sum("cm").alias("sy"))
    )

    score = (
        F.lit(2 * MARGIN_K) * F.col("cm") - F.col("sx") - F.col("sy")
    ).alias("score")
    best = (
        pairs.join(sum_x, "x_id")
        .join(sum_y, "y_id")
        .select("x_id", "y_id", "cm", score)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("x_id").orderBy(
                    F.desc("score"), F.asc("y_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        F.col("x_id").alias("src_id"),
        F.col("y_id").alias("tgt_id"),
        F.round(F.col("cm") / 1000000.0, 6).alias("cosine_sim"),
        # EXACT integer margin in 2K*micro-cosine units (score/8e6
        # would be the float margin, but score ≡ 4 mod 8 lands the
        # quotient on an exact 6dp half and Spark/DuckDB round those
        # in different directions for negatives — measured once in
        # 808 rows at sf0.1; integers can't disagree)
        F.col("score").alias("margin_micro8"),
        (F.col("score") > 0).cast("int").alias("mined"),
    )


BITEXT_MARGIN_MINING_ORACLE = f"""
    WITH emb AS (
        SELECT e.vec_id, e.embedding, d.lang,
               {S.norm_sql('e.embedding', DIMS)} AS nrm
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        WHERE d.lang IN ('en', 'de')
    ), pairs AS (
        SELECT x.vec_id AS x_id, y.vec_id AS y_id,
               CAST(ROUND({S.dot_sql('x.embedding', 'y.embedding', DIMS)}
                    / (x.nrm * y.nrm) * 1000000.0) AS BIGINT) AS cm
        FROM emb x CROSS JOIN emb y
        WHERE x.lang = 'en' AND y.lang = 'de'
    ), sum_x AS (
        SELECT x_id, SUM(cm) AS sx FROM (
            SELECT x_id, cm, ROW_NUMBER() OVER (PARTITION BY x_id
                   ORDER BY cm DESC, y_id ASC) AS rn
            FROM pairs) WHERE rn <= {MARGIN_K} GROUP BY x_id
    ), sum_y AS (
        SELECT y_id, SUM(cm) AS sy FROM (
            SELECT y_id, cm, ROW_NUMBER() OVER (PARTITION BY y_id
                   ORDER BY cm DESC, x_id ASC) AS rn
            FROM pairs) WHERE rn <= {MARGIN_K} GROUP BY y_id
    ), scored AS (
        SELECT p.x_id, p.y_id, p.cm,
               {2 * MARGIN_K} * p.cm - s.sx - t.sy AS score
        FROM pairs p
        JOIN sum_x s USING (x_id)
        JOIN sum_y t USING (y_id)
    )
    SELECT x_id AS src_id, y_id AS tgt_id,
           ROUND(cm / 1000000.0, 6) AS cosine_sim,
           CAST(score AS BIGINT) AS margin_micro8,
           CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INTEGER) AS mined
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY x_id
            ORDER BY score DESC, y_id ASC) = 1
"""


# --- greedy k-center coreset (farthest-point traversal) ----------------

KCENTER_K = 8


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy K-CENTER coreset selection (Gonzalez 1985 farthest-point
    traversal): seed with the smallest vec_id, then K-1 times pick
    the vector FARTHEST from the chosen set (max over corpus of min
    squared distance to any center, ties to the smaller vec_id). The
    classic 2-approximation to the k-center cover, and the diversity
    counterweight to ``cluster_balanced_sample`` (quota sampling
    keeps cluster PROPORTIONS; k-center maximizes SPREAD — the
    "select the most different examples" primitive for active
    learning / eval-set construction). One row per selected center:
    selection round, vec_id, and the covering radius at selection
    (sqrt of the max-min squared distance — monotonically
    non-increasing; the round-K radius is the standard stopping
    diagnostic).

    Determinism/exactness: squared distances fold sequentially in
    double (same element order in both engines → bit-identical
    doubles), the argmax is (mind DESC, vec_id ASC) — no float
    tolerance needed; only the REPORTED radius is rounded.

    Scale shape: K-1 rounds, each ONE corpus scan computing
    least(mind, sqdist(embedding, literal_center)) — the new center
    rides into the plan as a 64-double literal (no join, no
    broadcast exchange), the argmax is a 1-row sort-limit collect
    (scalar-only driver data, graph-trio discipline), and the
    running min-distance column is checkpointed per round so lineage
    stays flat. At 100 TB: K scans, zero shuffles beyond the top-1
    reductions.
    """
    # spread the single-split scan: per-row vector math otherwise
    # runs in ONE task (guide §2.5; no-op once the table splits)
    emb = spread_scan(
        load(spark, sf_dir, "embeddings"), sf_dir, "embeddings", by="vec_id"
    )
    corpus = emb.select("vec_id", "embedding").localCheckpoint(eager=True)

    first = corpus.orderBy("vec_id").first()
    centers = [(1, first.vec_id, None)]

    def center_lit(vec):
        return F.array(*[F.lit(float(x)) for x in vec])

    mind = corpus.withColumn(
        "mind", S.sqdist(F.col("embedding"), center_lit(first.embedding))
    ).localCheckpoint(eager=True)
    for rnd in range(2, KCENTER_K + 1):
        nxt = (
            mind.orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .select("vec_id", "embedding", "mind")
            .first()
        )
        centers.append((rnd, nxt.vec_id, float(nxt.mind)))
        if rnd < KCENTER_K:
            prev = mind
            mind = mind.withColumn(
                "mind",
                F.least(
                    F.col("mind"),
                    S.sqdist(F.col("embedding"), center_lit(nxt.embedding)),
                ),
            ).localCheckpoint(eager=True)
            # the superseded round's blocks are never read again;
            # release them instead of carrying K generations of the
            # corpus in the block store for the session lifetime
            prev.unpersist()
    # the result below is a literal frame — nothing depends on the
    # checkpoints anymore
    mind.unpersist()
    corpus.unpersist()
    rows = [
        (
            r,
            int(v),
            None if d is None else round(d**0.5, 6),
        )
        for r, v, d in centers
    ]
    return spark.createDataFrame(
        rows, "sel_round int, vec_id bigint, radius double"
    )


def _kcenter_oracle() -> str:
    d_to = lambda c: S.sqdist_sql("m.embedding", f"{c}.embedding", DIMS)
    sql = f"""
    WITH e AS (
        SELECT vec_id, embedding FROM embeddings
    ), c1 AS (
        SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1
    ), m1 AS (
        SELECT m.vec_id, m.embedding,
               {S.sqdist_sql('m.embedding', 'c.embedding', DIMS)} AS mind
        FROM e m CROSS JOIN c1 c
    )"""
    for i in range(2, KCENTER_K + 1):
        sql += f""", c{i} AS (
        SELECT vec_id, embedding, mind FROM m{i - 1}
        ORDER BY mind DESC, vec_id ASC LIMIT 1
    )"""
        if i < KCENTER_K:
            sql += f""", m{i} AS (
        SELECT m.vec_id, m.embedding,
               LEAST(m.mind, {d_to('c')}) AS mind
        FROM m{i - 1} m CROSS JOIN c{i} c
    )"""
    selects = [
        "SELECT 1 AS sel_round, CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(NULL AS DOUBLE) AS radius FROM c1"
    ]
    for i in range(2, KCENTER_K + 1):
        selects.append(
            f"SELECT {i} AS sel_round, CAST(vec_id AS BIGINT) AS vec_id, "
            f"ROUND(SQRT(mind), 6) AS radius FROM c{i}"
        )
    return sql + "\n    " + "\n    UNION ALL ".join(selects)


KCENTER_CORESET_ORACLE = _kcenter_oracle()


# --- reciprocal-rank fusion of the two ANN indexes ----------------------

RRF_K = 60  # the standard Cormack et al. damping constant
RRF_TOP = 5


def rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher 2009) of
    the LSH and IVF approximate indexes — the standard "combine two
    retrievers without score calibration" operator (RAG hybrid
    search fuses BM25 + dense exactly this way): each system
    contributes 1/(k + rank) per hit, summed per (query, neighbor),
    and the fused ranking orders by that sum. Rank-based, so the two
    systems' incomparable cosine scales never meet.

    Integer-exactness: the contribution is carried as
    ``1e9 DIV (k + rank)`` — exact integer division, summed as
    BIGINT; ties in the fused score break on neighbor_id. No float
    appears anywhere in the scoring.

    Plan shape: both index outputs are queries x k rows; the fusion
    is one union + one tiny groupBy + one per-query rank window over
    <= 2k candidates. At 100 TB the cost is the two index probes —
    fusion itself never touches corpus-scale data.
    """
    contrib = F.expr(f"1000000000 div ({RRF_K} + rank)")
    lsh = ann_lsh_topk(spark, sf_dir).select(
        "query_id",
        "neighbor_id",
        contrib.alias("score"),
        F.lit(1).alias("in_lsh"),
        F.lit(0).alias("in_ivf"),
    )
    ivf = ann_ivf_topk(spark, sf_dir).select(
        "query_id",
        "neighbor_id",
        contrib.alias("score"),
        F.lit(0).alias("in_lsh"),
        F.lit(1).alias("in_ivf"),
    )
    fused = (
        lsh.unionByName(ivf)
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum("score").cast("bigint").alias("rrf_micro"),
            F.max("in_lsh").cast("int").alias("in_lsh"),
            F.max("in_ivf").cast("int").alias("in_ivf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select(
            "query_id",
            "fused_rank",
            "neighbor_id",
            "rrf_micro",
            "in_lsh",
            "in_ivf",
        )
    )


RANK_FUSION_RRF_ORACLE = f"""
    WITH lsh AS (
        SELECT query_id, neighbor_id, rank FROM ({ANN_LSH_TOPK_ORACLE})
    ), ivf AS (
        SELECT query_id, neighbor_id, rank FROM ({ANN_IVF_TOPK_ORACLE})
    ), contrib AS (
        SELECT query_id, neighbor_id,
               1000000000 // ({RRF_K} + rank) AS score,
               1 AS in_lsh, 0 AS in_ivf
        FROM lsh
        UNION ALL
        SELECT query_id, neighbor_id,
               1000000000 // ({RRF_K} + rank) AS score,
               0 AS in_lsh, 1 AS in_ivf
        FROM ivf
    ), fused AS (
        SELECT query_id, neighbor_id,
               CAST(SUM(score) AS BIGINT) AS rrf_micro,
               CAST(MAX(in_lsh) AS INTEGER) AS in_lsh,
               CAST(MAX(in_ivf) AS INTEGER) AS in_ivf
        FROM contrib
        GROUP BY query_id, neighbor_id
    )
    SELECT query_id, fused_rank, neighbor_id, rrf_micro, in_lsh, in_ivf
    FROM (
        SELECT *,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_micro DESC, neighbor_id ASC
               ) AS INTEGER) AS fused_rank
        FROM fused
    )
    WHERE fused_rank <= {RRF_TOP}
"""
