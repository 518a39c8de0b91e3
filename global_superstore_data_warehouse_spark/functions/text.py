"""Text-analysis column expressions (beyond-reference, training-data
pipeline): tokenization, quality features, language-ID heuristic,
document fingerprints, MinHash signatures, SimHash.

Everything is built-in `pyspark.sql.functions` over array columns —
JVM-side, no Python UDFs — so the hot path stays in whole-stage
codegen and the only shuffles are the groupBys the callers add.
MD5 is the shared hash primitive because it is bit-identical across
engines (the DuckDB oracle uses the same md5), making every operator
here hash-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
ES_STOPWORDS = ("el", "la", "de", "que", "y", "en")
DE_STOPWORDS = ("der", "die", "das", "und", "ist")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def distinct_tokens(c: Column | str) -> Column:
    return F.array_distinct(tokens(c))


def stopword_count(toks: Column, stopwords: Sequence[str]) -> Column:
    lits = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda w: F.array_contains(lits, w)))


def total_token_chars(toks: Column) -> Column:
    return F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda acc, x: acc + x
    )


def bow_fingerprint(c: Column | str) -> Column:
    """Order-canonical bag-of-words fingerprint: md5 of the sorted
    distinct token list — identical for any permutation of the same
    vocabulary."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(c))))


def min_token_hash(c: Column | str) -> Column:
    """Single-seed MinHash (the 1-element signature): lexicographic
    min of per-token md5s."""
    return F.array_min(F.transform(distinct_tokens(c), lambda w: F.md5(w)))


def minhash_seeds(num_hashes: int) -> list[int]:
    """60-bit XOR seed constants (md5 prefix of 'seed{i}') — computed
    once in Python and inlined as LITERALS into both the Spark plan
    and the oracle SQL, so seed-i mixing is engine-independent."""
    import hashlib

    return [
        int(hashlib.md5(f"seed{i}".encode()).hexdigest()[:15], 16)
        for i in range(num_hashes)
    ]


def _seed_mixer(seed: int):
    """Single-parameter lambda factory. NB: a two-parameter lambda
    (e.g. ``lambda h, c=lit``) would be interpreted by
    ``F.transform`` as an (element, index) function and the index
    would silently replace the bound default."""
    lit = F.lit(seed)
    return lambda h: h.bitwiseXOR(lit)


def minhash_signature(hashed: Column, num_hashes: int) -> list[Column]:
    """k-seed MinHash signature over a PRE-HASHED token array (the
    60-bit md5-prefix longs of ``hashed_set``). Seed i's hash of
    token-hash h is h XOR C_i (``minhash_seeds``); the signature
    component is the min over the document's distinct token hashes.
    P[min-hash collision] per seed = Jaccard similarity.

    Why XOR mixes instead of k seeded md5s: one md5 pass over the
    tokens (already paid by ``hashed_set``) plus k bijective integer
    mixes replaces k full md5 passes — the md5 fold dominated the
    whole near-dup family's CPU (~8x less hash work; measured in
    SCALE.md). XOR by a constant is a bijection on the hash domain,
    so each seed induces a valid (approximately min-wise independent)
    permutation; family recall on the real corpus is MEASURED, not
    assumed, by the registered ``minhash_recall_eval`` (1.0 at
    sf0.01, 0.999 at sf0.1 — identical to the seeded-md5 family it
    replaced)."""
    seeds = minhash_seeds(num_hashes)
    return [
        F.array_min(F.transform(hashed, _seed_mixer(seeds[i]))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def lsh_bands(signature_cols: Sequence[str], rows_per_band: int) -> list[Column]:
    """Band the signature for LSH: hash each group of ``rows_per_band``
    signature components into one bucket key. Docs sharing any band
    bucket become candidate pairs. Components are cast to string
    explicitly so the BIGINT signature concatenates identically to
    the oracle's concat_ws (DuckDB auto-casts; Spark must not rely on
    implicit coercion under ANSI)."""
    bands = []
    cols = list(signature_cols)
    for b in range(0, len(cols), rows_per_band):
        group = [F.col(c).cast("string") for c in cols[b : b + rows_per_band]]
        bands.append(F.md5(F.concat_ws("|", *group)).alias(f"band{b // rows_per_band}"))
    return bands


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element array columns."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def hashed_set(toks: Column) -> Column:
    """Distinct 60-bit token hashes (md5 hex prefix as BIGINT) for
    set arithmetic: array_intersect over primitive longs is several
    times cheaper than over strings — the difference between the
    verification stage of the dedup family being string-compare
    bound or not, and an 8-byte (vs full-token) shuffle payload at
    100 TB. md5-prefix (not xxhash) so the DuckDB oracle computes
    the identical value: ('0x' || substr(md5(w),1,15))::BIGINT.
    Collisions are shared by both engines, so parity is exact by
    construction (and at ~2^-60 per pair, vanishing in practice)."""
    return F.array_distinct(
        F.transform(
            toks, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
        )
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-profile language scores (n-gram heuristic family)."""
    return {
        "en": stopword_count(toks, EN_STOPWORDS),
        "es": stopword_count(toks, ES_STOPWORDS),
        "de": stopword_count(toks, DE_STOPWORDS),
    }


def hex16_of_md5(c: Column) -> Column:
    """First 16 bits of md5(c) as an int — the SimHash per-token
    hash. Spark: conv(hex,16,10); oracle: ('0x'||hex)::INT. Both
    read the identical md5 hex prefix, so values agree exactly."""
    return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("int")


def max_multiplicity(arr: Column) -> Column:
    """Count of the most frequent element of an array column, in one
    O(n log n) pass: sort, then a single ``aggregate`` fold tracking
    (prev, current run, best run). Replaces the naive
    per-distinct-element ``filter`` scan — O(distinct x n) interpreted
    higher-order-function evaluations, which measured ~10x slower at
    sf0.1 — while producing the identical integer, so oracles keep
    counting the straightforward way. NULL for an empty array
    (matching SQL ``list_max`` over an empty list).

    PRECONDITION: STRING arrays only. The fold's ``prev`` slot and
    its sentinel are string-typed, so a numeric array would compare
    through implicit casts (and an element equal to the '' sentinel
    string cannot exist mid-array after sorting — '' sorts first, and
    the first comparison always starts a fresh run of 1 regardless).
    Both call sites (token / bigram repetition) pass strings; to make
    this generic, build the zero struct's prev from
    ``element_at(arr, 1)``'s type."""
    s = F.array_sort(arr)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc, x):
        # first element: x == sentinel '' would still yield run 1
        # (0 + 1), so no special case is needed
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    folded = F.aggregate(s, zero, merge, lambda acc: acc["best"])
    return F.when(F.size(arr) == 0, F.lit(None).cast("int")).otherwise(folded)
