"""Skew mitigation for large joins (north-star: "skewed keys → salting or
AQE skew-join").

Spark's AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default here)
splits oversized shuffle partitions automatically — that is the first line
of defense and needs no code.  ``salted_join`` is the explicit fallback for
the cases AQE cannot fix: a single hot key whose rows must all meet the same
matching rows (e.g. a fact table where 30% of rows share one key joined to
a medium dimension too big to broadcast).

Pattern: the skewed (probe) side gets a per-row salt in [0, salt);
the build side is replicated `salt` times; the join key becomes
(key, salt) — the hot key's rows now spread across `salt` reducers.
Cost: build side ×salt (choose salt ≪ executor count; replication must
stay cheaper than the stall of one straggler reducer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = '__salt'


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                how: str = 'inner', salt: int = 16) -> DataFrame:
    """Equi-join with per-row salting of the skewed side.

    Result equals ``skewed.join(other, on, how)`` for how in
    ('inner', 'left'); the salt column never escapes.
    """
    if how not in ('inner', 'left'):
        raise ValueError('salted_join supports inner/left joins')
    # deterministic per-row salt (hash of a monotonic ordinal): reproducible
    # runs, uniform spread — the salt must NOT be a function of the join key
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast('int'))
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))) \
        .withColumn(SALT_COL, F.col(SALT_COL).cast('int'))
    out = salted.join(replicated, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)
