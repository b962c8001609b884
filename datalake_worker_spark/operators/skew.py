"""Skew-handling: salted joins (SURVEY.md §2.2 / the 100 TB discipline).

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime; ``salted_join`` is the explicit fallback for the cases
AQE can't fix — e.g. a single hot key whose build side also explodes.

Mechanics: the skewed (large) side gets a random salt in [0, S); the
small side is replicated S× with every salt value; the join key becomes
(key, salt), spreading one hot key over S reducers. Salting uses a
deterministic per-row hash (not rand()) so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on` with key salting.

    `small` is replicated salt_buckets×: only use when small is
    dim-sized. Output columns = large.* + small.* minus the duplicate key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_buckets))
    l = large.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l.join(s, [on, "_salt"], how)
    return out.drop("_salt")
