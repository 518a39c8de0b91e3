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

Scale shape — CLASS-COLLAPSED (same trick as the MinHash plan's
``_bow_classes``): identical token SETS collapse to one class first,
so every pairwise stage runs at class cardinality, and doc pairs are
re-expanded through the membership table at the end as pure output
materialization. This is what keeps the join alive on corpora with
heavy exact duplication (this synthetic corpus saturates its
31-token vocabulary, so thousands of docs share ONE token set — the
doc-level join degenerated to minutes at sf0.1; the class-level join
is milliseconds and the quadratic part is only writing the
inherently quadratic output). Stages: (1) distinct-token fingerprint
-> class collapse, (2) class-level df + rarity order, (3) per-class
prefix window, (4) candidate self-join on prefix token WITH the
PPJoin length filter (tau*na <= nb <= na/tau, conservatively
floored/ceiled so float error only ever ADMITS extra candidates),
(5) exact Jaccard verify per class pair, (6) expansion: cross-class
survivors join membership twice; intra-class pairs (Jaccard 1.0 by
construction) come straight off the membership self-join.

floor/ceil discipline: the prefix length uses ceil(tau * n) on IEEE
doubles; double(0.95) < 0.95 exactly, so the computed ceil can only
be <= the exact one — the prefix can only be LONGER than required
(recall preserved), and both engines compute the identical value.
The oracle is still the BRUTE-FORCE doc-level join: identical output
proves recall 1.0 end-to-end, including the collapse/expand step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions.text import tokens
from global_superstore_data_warehouse_spark.operators.hints import (
    cpu_repartition,
    spread_scan,
)

TAU = 0.95

# Hot-key salt factor for the prefix-token candidate self-joins
# (guide §2.5 "salt the key"): on a saturated vocabulary a single
# prefix token can block thousands of classes, and the join's hash
# partitioning then lands that block's quadratic candidate work on
# ONE task (measured at sf0.1: a 10.4 s max task against a 1 ms
# median in jaccard_prefix_pairs' save stage). One join side is
# exploded SALTS ways, the other carries pmod(xxhash64(cls), SALTS);
# every true pair matches exactly one replica, so output is
# identical while the hot block splits SALTS ways. The replication
# is a bounded constant on the (small, prefix-length-bounded) build
# rows — not on the quadratic candidate output.
SALTS = 32


def _salt_factor(max_df: int | None, n_classes: int) -> int:
    """SKEW-CONDITIONAL salt (round-14, the r13 verdict's #7): fire
    the SALTS-way replication only when the hottest token block is
    genuinely hot — its document frequency (the block's row bound)
    claims at least a 1/SALTS share of all classes, i.e. that one
    block's quadratic candidate work would dominate a single reducer.
    On an unskewed vocabulary (real-corpus regime: max df << classes)
    this returns 1 and the join runs un-replicated — same code path,
    a constant salt column, no build-side blow-up — mirroring
    spread_scan's self-disabling gate discipline. The two scalars
    are cheap by construction: n_classes reads a checkpointed frame,
    max_df rides the df aggregate the plan builds anyway."""
    if not max_df:
        return 1
    return SALTS if max_df * SALTS >= n_classes else 1


def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the single-split scan: the sort+distinct tokenize and
    # per-doc md5 fingerprint feeding BOTH checkpoints otherwise run
    # single-task (guide §2.5; no-op once the table splits on its own)
    return jaccard_pairs_for_docs(
        spread_scan(load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id")
    )


def jaccard_pairs_for_docs(docs: DataFrame) -> DataFrame:
    """The exact join over an arbitrary ``documents``-shaped frame —
    callers that only need ground truth over a (deterministic)
    document sample filter BEFORE this plan, so every stage runs at
    sample cardinality (see textops.minhash_recall_eval)."""
    toks = (
        docs.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))
            ).alias("ts"),
        )
        .withColumn("n", F.size("ts"))
        .filter(F.col("n") > 0)  # empty sets have no defined Jaccard
        .withColumn("cls", F.md5(F.concat_ws("\x1f", "ts")))
    )
    # membership and class-exemplar checkpoints are independent (both
    # derive from the tokenize projection, neither from the other) —
    # materialize them in two driver threads (guide §2.6,
    # operators/par.py): same two jobs, overlapped wall clock
    from global_superstore_data_warehouse_spark.operators.par import (
        build_concurrently,
    )

    member, classes = build_concurrently(
        lambda: toks.select("doc_id", "cls").localCheckpoint(eager=True),
        lambda: toks.groupBy("cls")
        .agg(
            F.min("doc_id").alias("rep"),
            F.min_by("ts", "doc_id").alias("ts"),  # identical across members
            F.min("n").alias("n"),
        )
        .localCheckpoint(eager=True),
    )

    ex = classes.select("cls", "rep", "n", F.explode("ts").alias("token"))
    # vocabulary-sized; checkpointed because it now has two consumers
    # (the rarity-order broadcast AND the salt-gate aggregate below) —
    # without it each would re-run the explode+groupBy lineage
    dfreq = (
        ex.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=True)
    )

    # skew gate for the candidate join's salt (see _salt_factor):
    # n_classes off the cached checkpoint, max df via one tiny
    # aggregate over the cached vocabulary rows
    n_classes = classes.count()
    max_df = dfreq.agg(F.max("df")).first()[0]
    salts = _salt_factor(max_df, n_classes)

    # class-level rarity order (df asc, token asc — total,
    # deterministic); the df table is vocabulary-sized -> broadcast
    ranked = ex.join(F.broadcast(dfreq), "token")
    w = Window.partitionBy("cls").orderBy("df", "token")
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(TAU) * F.col("n")) + 1)
        .select("cls", "rep", "n", "rn", "token")
    )

    # candidate class pairs: shared prefix token + PPJoin length
    # filter (J >= tau forces tau*na <= nb <= na/tau) + PPJoin
    # POSITIONAL filter (Xiao et al., WWW'08): J >= tau needs
    # shared >= alpha = ceil(tau/(1+tau) * (na+nb)); a match on the
    # rn-th rarest token can contribute at most
    # 1 + min(na - rn_a, nb - rn_b) shared tokens, so smaller-upper-
    # bound matches can't produce a qualifying pair and are pruned
    # BEFORE the array verify (the verify join is the cost center on
    # dense-vocabulary corpora). Float discipline: alpha subtracts
    # 1e-9 before ceil so double error can only ADMIT an extra
    # candidate, never reject a true pair; same one-sided rule as
    # the length band's ceil/floor.
    alpha = F.ceil(
        F.lit(TAU / (1.0 + TAU)) * (F.col("a.n") + F.col("b.n")) - F.lit(1e-9)
    )
    # salt the prefix-token block key (see SALTS): side a replicated
    # per salt, side b keyed by pmod(xxhash64(cls), SALTS) — equality
    # on (token, salt) splits a hot token's candidate block SALTS ways
    # the salted join's own exchanges are cpu_repartition-pinned on
    # (token, salt): the candidate blocks are byte-tiny but CPU-heavy,
    # so AQE's byte model would otherwise coalesce the salted join
    # back into one task (observed: the salt alone moved the 10.4 s
    # hot task but AQE re-serialized it)
    pre_a = cpu_repartition(
        prefix.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
        ),
        "token",
        "salt",
    )
    pre_b = cpu_repartition(
        prefix.withColumn(
            "salt", F.pmod(F.xxhash64("cls"), F.lit(salts)).cast("int")
        ),
        "token",
        "salt",
    )
    cands = (
        pre_a.alias("a")
        .join(
            pre_b.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.rep") < F.col("b.rep"))
            & (F.col("b.n") >= F.ceil(F.lit(TAU) * F.col("a.n")))
            & (F.col("b.n") <= F.floor(F.col("a.n") / F.lit(TAU)))
            & (
                1
                + F.least(
                    F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
                )
                >= alpha
            ),
        )
        .select(F.col("a.cls").alias("cls_a"), F.col("b.cls").alias("cls_b"))
        .distinct()
    )

    ca = classes.select(
        F.col("cls").alias("cls_a"), F.col("ts").alias("ts_a"), F.col("n").alias("na")
    )
    cb = classes.select(
        F.col("cls").alias("cls_b"), F.col("ts").alias("ts_b"), F.col("n").alias("nb")
    )
    shared = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = shared / (F.col("na") + F.col("nb") - shared)
    cls_pairs = (
        # pin the verify width: the array_intersect per candidate is
        # CPU-dense and the distinct's exchange would otherwise be
        # byte-coalesced (same hazard as the textops verify stages)
        cpu_repartition(cands, "cls_a")
        .join(ca, "cls_a")
        .join(cb, "cls_b")
        .withColumn("shared", shared)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= TAU)
        .select("cls_a", "cls_b", "shared", F.round("jaccard", 6).alias("jaccard"))
    )

    # expand cross-class survivors through membership (docs of
    # different classes can interleave ids -> normalize with
    # least/greatest), and emit intra-class pairs directly (identical
    # sets: shared = n, Jaccard exactly 1.0)
    ma = member.select(F.col("cls").alias("cls_a"), F.col("doc_id").alias("d1"))
    mb = member.select(F.col("cls").alias("cls_b"), F.col("doc_id").alias("d2"))
    cross = (
        cls_pairs.join(ma, "cls_a")
        .join(mb, "cls_b")
        .select(
            F.least("d1", "d2").alias("doc_a"),
            F.greatest("d1", "d2").alias("doc_b"),
            "shared",
            "jaccard",
        )
    )
    intra = (
        member.alias("x")
        .join(
            member.alias("y"),
            (F.col("x.cls") == F.col("y.cls"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .join(
            classes.select(F.col("cls").alias("cls_n"), "n"),
            F.col("x.cls") == F.col("cls_n"),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("n").alias("shared"),
            F.round(F.lit(1.0), 6).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


# the oracle is the brute-force EXACT join (token equi-join, no
# prefix): identical output proves the prefix filter's recall is 1.0,
# not approximately 1.0. ``doc_filter`` lets composing evals apply
# the same deterministic document-sample predicate as their Spark
# plan (TRUE = full corpus).
def exact_pairs_oracle(doc_filter: str = "TRUE") -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, token
        FROM (SELECT * FROM documents WHERE {doc_filter}) d,
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


JACCARD_PREFIX_PAIRS_ORACLE = exact_pairs_oracle()


# --- containment / proper-superset detection -------------------------

def superset_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CONTAINMENT audit: for every document, how many
    OTHER documents' token sets strictly contain it (quote extraction
    / subset-page dedup — the asymmetric relative of the symmetric
    Jaccard join above: containment |A∩B|/|A| = 1.0 exactly when
    A ⊆ B, which a Jaccard threshold can never express for
    differently-sized sets). Output per document: set size, exact
    duplicates (same token set), and the count of documents whose set
    is a proper superset.

    Scale shape — the same class-collapse + rarity-blocking spine as
    ``jaccard_pairs_for_docs``: identical token sets collapse to one
    class, so the pairwise stage runs at class cardinality; a class
    pair (a ⊊ b) is only generated where b contains a's single
    RAREST token (containment prefix length at tau=1.0 is
    n - ceil(n) + 1 = 1 — the Bayardo prefix theorem specialized to
    subset containment), plus the length filter n_b > n_a (a proper
    subset is strictly smaller; equal size forces equal sets = same
    class). On a real crawl the rarest-token df is small and the
    candidate join is near-linear; on THIS corpus's saturated
    31-token vocabulary the block barely prunes (5.7M candidates
    from 3.9k classes at sf0.1), so the subset TEST must be cheap:
    each class carries a 62-bit token bitmask and the test is
    ``(m_a & m_b) == m_a`` evaluated inside the join's codegen —
    no array joins, no array_except per candidate. Two tiers,
    chosen by the observed vocabulary size (a scalar):

    - vocab <= 62: one bit per DISTINCT TOKEN (dense df-ordered
      index) — the mask test IS the exact subset test, verify-free;
    - vocab > 62: two independent hashed 62-bit Bloom masks as a
      NECESSARY-condition prefilter (a ⊆ b ⇒ mask_a ⊆ mask_b, so
      recall stays 1.0), exact array_except verify only on the
      survivors (measured 11x survivor cut at sf0.1).

    Both tiers are equality-tested against each other
    (tests/test_round7_ops.py) and against the brute-force oracle.
    Rewrite measured at sf0.1: 32.5 s → ~7 s. The final report is
    doc-sized with no global window.
    """
    return _superset_containment(spark, sf_dir, force_bloom=False)


def _superset_containment(
    spark: SparkSession, sf_dir: str, force_bloom: bool
) -> DataFrame:
    # spread the single-split scan (same rationale as
    # jaccard_prefix_pairs; no-op at scale)
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    )
    toks = (
        docs.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))
            ).alias("ts"),
        )
        .withColumn("n", F.size("ts"))
        .filter(F.col("n") > 0)
        .withColumn("cls", F.md5(F.concat_ws("\x1f", "ts")))
    )
    classes = toks.groupBy("cls").agg(
        F.min_by("ts", "doc_id").alias("ts"),
        F.min("n").alias("n"),
        F.count(F.lit(1)).alias("sz"),
    )

    ex0 = classes.select("cls", F.explode("ts").alias("token"))
    # membership and the vocabulary df table are independent eager
    # materializations (guide §2.6, operators/par.py) — overlapped.
    # dfreq is checkpointed because it has three consumers (the
    # mask-bit projection, the rarest-token broadcast, and the
    # scalar agg below) that each re-ran the tokenize+explode+groupBy
    # lineage before.
    from global_superstore_data_warehouse_spark.operators.par import (
        build_concurrently,
    )

    member, dfreq = build_concurrently(
        lambda: toks.select("doc_id", "n", "cls").localCheckpoint(eager=True),
        lambda: ex0.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=True),
    )
    # one vocabulary-sized aggregate yields BOTH scalars: the mask
    # tier (vocab) and the salt gate's hottest-block bound (max df) —
    # same job count as the old bare count()
    vocab, max_df = dfreq.agg(
        F.count(F.lit(1)), F.max("df")
    ).first()
    exact_masks = vocab <= 62 and not force_bloom
    if exact_masks:
        # dense one-bit-per-token index, df-ordered (deterministic)
        bits = dfreq.select(
            "token",
            "df",
            (F.row_number().over(Window.orderBy("df", "token")) - 1).alias(
                "rk"
            ),
        ).select(
            "token",
            "df",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rk AS INT))").alias(
                "bit1"
            ),
            F.lit(0).cast("long").alias("bit2"),
        )
    else:
        # two independent hashed 62-bit Bloom masks (k=1 each)
        def _bit(seed: str) -> F.Column:
            return F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(xxhash64(concat('{seed}', token)), 62) AS INT))"
            )

        bits = dfreq.select(
            "token", "df", _bit("sb1:").alias("bit1"), _bit("sb2:").alias("bit2")
        )
    masks = (
        ex0.join(F.broadcast(bits), "token")
        .groupBy("cls")
        .agg(F.bit_or("bit1").alias("m1"), F.bit_or("bit2").alias("m2"))
    )
    classes = classes.join(masks, "cls").localCheckpoint(eager=True)
    # skew gate for the rarest-token join's salt (see _salt_factor):
    # cached-checkpoint count + the max df already read above
    salts = _salt_factor(max_df, classes.count())

    ex = classes.select("cls", "n", "m1", "m2", F.explode("ts").alias("token"))
    rarest = (
        ex.join(F.broadcast(dfreq), "token")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cls").orderBy("df", "token")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cls", "n", "m1", "m2", "token")
    )

    # rarest emits ONE row per class a and b's tokens are distinct, so
    # each (a, b) pair arises at most once — no distinct needed; the
    # mask subset test runs inside the join's generated code
    # salted block key (see SALTS): the rarest-token side replicates
    # per salt, the token-explode side keys by pmod(xxhash64(cls));
    # a hot token's candidate block then splits SALTS ways instead of
    # landing on one task
    rarest_s = cpu_repartition(
        rarest.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
        ),
        "token",
        "salt",
    )
    ex_s = cpu_repartition(
        ex.withColumn(
            "salt", F.pmod(F.xxhash64("cls"), F.lit(salts)).cast("int")
        ),
        "token",
        "salt",
    )
    cand = (
        rarest_s.alias("a")
        .join(
            ex_s.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("b.n") > F.col("a.n"))
            & (
                F.col("a.m1").bitwiseAND(F.col("b.m1")) == F.col("a.m1")
            )
            & (
                F.col("a.m2").bitwiseAND(F.col("b.m2")) == F.col("a.m2")
            ),
        )
        .select(F.col("a.cls").alias("cls_a"), F.col("b.cls").alias("cls_b"))
    )
    if exact_masks:
        # the dense mask test was the exact subset test already
        sup = (
            cand.join(
                classes.select(
                    F.col("cls").alias("cls_b"), F.col("sz").alias("sz_b")
                ),
                "cls_b",
            )
            .groupBy("cls_a")
            .agg(F.sum("sz_b").alias("n_sup"))
        )
    else:
        ca = classes.select(F.col("cls").alias("cls_a"), F.col("ts").alias("ts_a"))
        cb = classes.select(
            F.col("cls").alias("cls_b"),
            F.col("ts").alias("ts_b"),
            F.col("sz").alias("sz_b"),
        )
        sup = (
            cand.join(ca, "cls_a")
            .join(cb, "cls_b")
            .filter(F.size(F.array_except("ts_a", "ts_b")) == 0)
            .groupBy("cls_a")
            .agg(F.sum("sz_b").alias("n_sup"))
        )
    cls_sz = classes.select("cls", "sz").join(
        sup.withColumnRenamed("cls_a", "cls"), "cls", "left"
    )
    return (
        member.join(cls_sz, "cls")
        .select(
            "doc_id",
            F.col("n").cast("int").alias("n_tokens"),
            (F.col("sz") - 1).cast("bigint").alias("n_exact_dups"),
            F.coalesce("n_sup", F.lit(0)).cast("bigint").alias("n_superset_docs"),
        )
    )


# brute-force oracle: class x class subset test via list_has_all —
# independent of the rarity-blocked candidate path, so identical
# output proves the block generates every true subset pair
SUPERSET_CONTAINMENT_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               list_sort(list_distinct(list_filter(
                   string_split_regex(trim(text), '\\s+'),
                   t -> t <> ''))) AS ts
        FROM documents
    ), t2 AS (
        SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0
    ), cls AS (
        SELECT ts, MIN(n) AS n, COUNT(*) AS sz FROM t2 GROUP BY ts
    ), sup AS (
        SELECT a.ts AS ts_a, SUM(b.sz) AS n_sup
        FROM cls a JOIN cls b
          ON b.n > a.n AND list_has_all(b.ts, a.ts)
        GROUP BY a.ts
    )
    SELECT d.doc_id,
           CAST(d.n AS INTEGER) AS n_tokens,
           CAST(c.sz - 1 AS BIGINT) AS n_exact_dups,
           CAST(COALESCE(s.n_sup, 0) AS BIGINT) AS n_superset_docs
    FROM t2 d
    JOIN cls c ON c.ts = d.ts
    LEFT JOIN sup s ON s.ts_a = d.ts
"""
