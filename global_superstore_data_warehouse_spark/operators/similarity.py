"""Vector-similarity operators over ``array<float>`` embedding
columns (beyond-reference: ANN / near-dup search for training-data
pipelines).

All arithmetic is explicit double-precision left-fold over the
array — `F.zip_with` + `F.aggregate`, pure Catalyst expressions, no
UDFs — both because it stays in codegen and because the identical
sequential fold is expressible in the DuckDB oracle, giving
bit-reproducible similarity values across engines.

Scale design: brute-force top-k is the correctness baseline (one
broadcast of the query set, one scan of the corpus, per-partition
partial top-k via the rank window). The LSH variant buckets vectors
by random-hyperplane signs so the candidate set per query shrinks by
~2^planes; buckets are plain columns, so the bucket join is an
ordinary shuffle join that AQE handles — this is the path that
survives a corpus that no longer fits a broadcast.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str, dims: int) -> str:
    """Oracle-side dot product with the same sequential fold."""
    return (
        f"list_aggregate(list_transform(range(1, {dims + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def cosine_sql(a: str, b: str, dims: int) -> str:
    return (
        f"({dot_sql(a, b, dims)} / "
        f"(sqrt({dot_sql(a, a, dims)}) * sqrt({dot_sql(b, b, dims)})))"
    )


def normalize(a: Column, nrm: Column) -> Column:
    """Unit-normalize with a *pre-materialized* norm column — passing
    `norm(a)` inline would re-fold the norm once per element."""
    return F.transform(a, lambda x: x.cast("double") / nrm)


def ndot_sql(a: str, na: str, b: str, nb: str, dims: int) -> str:
    """Oracle-side dot of two normalized vectors, with the identical
    per-element (x/na)*(y/nb) order as the Spark plan, so assignment
    similarities are bit-identical across engines."""
    return (
        f"list_aggregate(list_transform(range(1, {dims + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) / {na}) * (CAST({b}[i] AS DOUBLE) / {nb})), 'sum')"
    )


def norm_sql(a: str, dims: int) -> str:
    return f"sqrt({dot_sql(a, a, dims)})"


def cosine_pandas_udf():
    """Vectorized (Arrow-batched) cosine as a pandas UDF — the
    alternate implementation for when the expression fold becomes the
    bottleneck (very high dims). Same semantics as ``cosine``; the
    equivalence is pinned by tests/test_embeddings.py. Import-guarded:
    falls back to None when pandas/pyarrow are unavailable."""
    try:
        import numpy as np
        import pandas as pd

        from pyspark.sql.functions import pandas_udf
    except ImportError:  # pragma: no cover
        return None

    def _cos(a, b):
        import numpy as _np
        import pandas as _pd

        av = _np.stack(a.to_numpy()).astype(_np.float64)
        bv = _np.stack(b.to_numpy()).astype(_np.float64)
        num = (av * bv).sum(axis=1)
        den = _np.sqrt((av * av).sum(axis=1)) * _np.sqrt((bv * bv).sum(axis=1))
        return _pd.Series(num / den)

    # set REAL annotation objects: `from __future__ import annotations`
    # stringifies inline hints module-wide, and pandas_udf's eval-type
    # inference cannot resolve the strings outside module globals
    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")


def hyperplanes(num_planes: int, dims: int) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes derived from md5 — the
    same literals are inlined into both the Spark plan and the
    oracle SQL, so bucket assignment is engine-independent."""
    planes = []
    for j in range(num_planes):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"h{j}_{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit j = sign(emb · plane_j)."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        d = dot(emb, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(d > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucket_sql(emb: str, planes: list[list[float]], dims: int) -> str:
    parts = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        parts.append(
            f"CASE WHEN {dot_sql(emb, arr, dims)} > 0 THEN {2**j} ELSE 0 END"
        )
    return "CAST(" + " + ".join(parts) + " AS INTEGER)"


# --- int8 scalar quantization (compressed-corpus ANN) -----------------


def int8_scale(emb: Column) -> Column:
    """Per-vector symmetric quantization scale: max|x| / 127 (clamped
    away from zero so an all-zero vector quantizes to zeros instead of
    dividing by zero). One fold over the array."""
    return (
        F.greatest(
            F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double")))),
            F.lit(1e-30),
        )
        / F.lit(127.0)
    )


def int8_quantize(emb: Column, scale: Column) -> Column:
    """int8 code array: floor(x/scale + 0.5) — an explicit, engine-
    neutral rounding (both engines floor identically-rounded IEEE
    doubles), NOT round(), whose half-away/half-even convention
    differs across engines. ``scale`` must be a pre-materialized
    column, not an inline fold."""
    return F.transform(
        emb, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
    )


def int_dot(a: Column, b: Column) -> Column:
    """EXACT integer dot product of two code arrays — the approx
    similarity is derived from integers, so it is bit-identical in
    any engine (no float summation-order concerns at all)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int8_scale_sql(e: str) -> str:
    return (
        f"(greatest(list_max(list_transform({e},"
        " x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0)"
    )


def int8_quantize_sql(e: str, scale: str) -> str:
    return (
        f"list_transform({e},"
        f" x -> CAST(floor(CAST(x AS DOUBLE) / {scale} + 0.5) AS INTEGER))"
    )


def int_dot_sql(a: str, b: str, dims: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dims + 1}), "
        f"i -> CAST({a}[i] AS BIGINT) * CAST({b}[i] AS BIGINT)), 'sum')"
    )


def sqdist(a: Column, b: Column) -> Column:
    """Squared euclidean distance, same sequential-fold discipline as
    ``dot`` (element order i=1..n, (x-y)*(x-y) — not pow — so the
    DuckDB twin reproduces bit-identical doubles)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sqdist_sql(a: str, b: str, dims: int) -> str:
    """Oracle-side squared euclidean distance, identical fold."""
    return (
        f"list_aggregate(list_transform(range(1, {dims + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), 'sum')"
    )
