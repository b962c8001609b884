"""Skew-handling: salted joins (SURVEY.md §2.2 / the 100 TB discipline).

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime; ``salted_join`` is the explicit fallback for the cases
AQE can't fix — e.g. a single hot key whose build side also explodes.

Mechanics: the skewed (large) side gets a per-row salt in [0, S); the
small side is replicated S× with every salt value; the join key becomes
(key, salt), spreading one hot key over S reducers. The salt must vary
across IDENTICAL rows (duplicate rows are exactly the hot-key shape), so
it derives from the row's physical position, not its content — join
RESULTS are unaffected, only the partitioning of work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column(s) `on` with key salting.

    `small` is replicated salt_buckets×: only use when small is
    dim-sized (or key-collapsed: one row per join key, as in a
    frequency/flag table), and only with inner/left joins (an outer
    small side would surface each unmatched row S times).
    Output columns = large.* + small.* minus the duplicate key(s).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    l = large.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l.join(s, keys + ["_salt"], how)
    return out.drop("_salt")
