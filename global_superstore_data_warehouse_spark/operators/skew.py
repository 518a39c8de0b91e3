"""Skew-mitigation join (SURVEY §4 / 100 TB design): salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but it only splits *partitions*, not single hot keys on
the build side of a shuffle join. Salting is the explicit fix: the
large side scatters each key across ``salt`` sub-keys; the small
side replicates each row once per sub-key; the join key becomes
(key, salt) so one hot key's rows spread over ``salt`` reducers.

Cost model: small side inflates ×salt (still tiny), large side
shuffles once as before but with a balanced key space. Use when one
key holds >~1/parallelism of the rows; keep ``salt`` ≈ the skew
factor, not larger (replication is pure overhead for uniform keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


# join types whose semantics survive small-side replication: every
# output row is either a matched pair (salt keys line up 1:1) or an
# unmatched LARGE row (emitted once — the large side is salted, not
# replicated). right/full outer would emit each unmatched SMALL row
# once per salt value; express those as salted_join(small-as-large)
# or a plain join instead.
_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    how: str = "inner",
    salt: int = 8,
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated across all salt values. Output equals the plain join
    (salt columns are dropped); only the shuffle distribution
    changes.

    ``how`` is restricted to ``_SAFE_HOW``: for right/full outer the
    replicated small side would yield ``salt`` copies of each
    unmatched small row, silently corrupting the result — rejected
    loudly rather than mis-joined. Keys are strings and resolved
    against the aliased join inputs, so identically-named columns on
    the other side can't be captured (the round-1 ambiguity bug).

    The salt is a pure function of the large row's data (hash of
    ``spread_cols``, default all columns): any distribution is
    CORRECT (the small side covers every salt value), but it must be
    DETERMINISTIC under task retry — a nondeterministic salt (e.g.
    one derived from ``monotonically_increasing_id``) upstream of the
    shuffle re-maps rows to different reducers when a stage retries
    after a fetch failure, losing/duplicating rows (the SPARK-23207
    family). Fully identical duplicate rows share a salt; pass
    ``spread_cols`` naming a unique column if the large side carries
    heavy exact-duplicate rows that must also spread.
    """
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows would be emitted once per salt value. Swap the sides "
            "(salt the other table) or use a plain join."
        )
    spread = spread_cols if spread_cols else large.columns
    salted_large = large.withColumn(
        SALT_COL,
        F.pmod(F.hash(*[F.col(c) for c in spread]), F.lit(salt)).cast("int"),
    ).alias("__salted_l")
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    ).alias("__salted_r")
    joined = salted_large.join(
        replicated_small,
        (F.col(f"__salted_l.{large_key}") == F.col(f"__salted_r.{small_key}"))
        & (F.col(f"__salted_l.{SALT_COL}") == F.col(f"__salted_r.{SALT_COL}")),
        how,
    )
    return joined.drop(SALT_COL)
