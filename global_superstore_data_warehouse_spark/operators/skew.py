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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str | Column,
    small_key: str | Column,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated across all salt values. Output equals the plain join
    (salt columns are dropped); only the shuffle distribution
    changes."""
    lk = F.col(large_key) if isinstance(large_key, str) else large_key
    sk = F.col(small_key) if isinstance(small_key, str) else small_key
    # deterministic spread: hash the whole row's key + a fast-varying
    # physical hint; any distribution is CORRECT (the small side
    # covers every salt), this one is merely balanced
    salted_large = large.withColumn(
        SALT_COL, F.pmod(F.hash(lk, F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_large.join(
        replicated_small,
        (lk == sk) & (salted_large[SALT_COL] == replicated_small[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)
