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


def topk_per_group(df: DataFrame, k: int, group_cols: list[str],
                   order_cols: list, salt_key=None, salt_buckets: int = 32,
                   rank_name: str = 'rank') -> DataFrame:
    """EXACT top-k rows per group without serializing each group into a
    single window task — the skew-safe replacement for
    ``row_number() OVER (PARTITION BY group ORDER BY ...) <= k``.

    Phase 1 ranks within (group, salt) — salt_buckets× the parallelism
    of the naive window — and keeps k rows per salt bucket, a SUPERSET
    of the true top-k (every true top-k row is also top-k inside its
    own bucket, for any partition of the group's rows).  Phase 2 ranks
    only the ≤ salt_buckets×k survivors per group.  The salt never
    reaches the output, so the result is exactly the naive window's.

    `order_cols` must be a DETERMINISTIC total order (include a unique
    tiebreak column last); `salt_key` is any Column to salt on (default:
    a uniform random-free spread via the first order column is NOT safe
    — pass a high-cardinality key such as the row id).  Adds
    `rank_name` (1..k within the group).
    """
    if int(k) < 1:
        raise ValueError('topk_per_group: k must be >= 1')
    if int(salt_buckets) < 1:
        raise ValueError('topk_per_group: salt_buckets must be >= 1')
    if salt_key is None:
        raise ValueError('topk_per_group: salt_key is required (a '
                         'high-cardinality column to spread each group '
                         'across salt buckets)')
    from pyspark.sql import Window
    salted = df.withColumn('__tkg_s', F.pmod(F.hash(salt_key),
                                             F.lit(int(salt_buckets))))
    w1 = Window.partitionBy(*(group_cols + ['__tkg_s'])).orderBy(*order_cols)
    cand = (salted.withColumn('__tkg_r1', F.row_number().over(w1))
                  .where(F.col('__tkg_r1') <= int(k)))
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (cand.withColumn(rank_name, F.row_number().over(w2))
                .where(F.col(rank_name) <= int(k))
                .drop('__tkg_s', '__tkg_r1'))
