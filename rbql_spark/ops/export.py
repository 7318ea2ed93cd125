"""Deterministic sharded export (superset op, SURVEY §2.8): the
"materialize the training set" step — content-hash shard assignment, a
value-checkable per-shard manifest, and the parquet writer that lays the
shards out on disk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD31 = (1 << 31)


def _h32(col: Column) -> Column:
    """32-bit md5-derived hash (first 8 hex chars) — engine-portable."""
    return F.conv(F.substring(F.md5(F.encode(col, 'utf-8')), 1, 8),
                  16, 10).cast('long')


def shard_assign(df: DataFrame, n_shards: int,
                 key_col: str = 'doc_id') -> DataFrame:
    """Add a `shard` column: md5(key) mod n_shards — a pure function of
    the data, so the same corpus always shards identically regardless of
    cluster size or partitioning (unlike hash-partition file layout,
    which follows the physical plan)."""
    return df.withColumn(
        'shard', _h32(F.col(key_col).cast('string')) % int(n_shards))


def shard_manifest(df: DataFrame, n_shards: int,
                   key_col: str = 'doc_id',
                   content_cols: list[str] | None = None) -> DataFrame:
    """Per-shard manifest: (shard, n_rows, content_checksum) where the
    checksum is the mod-2^31 sum of each row's md5-32 digest over
    key + content columns — order-independent, so it verifies a shard's
    CONTENT no matter how the rows were written or later re-read, and
    any engine can recompute it (the DuckDB oracle does).

    Scale shape: one scan, one partial+final aggregation on the (tiny)
    shard key; the digest sum is exact integer math.
    """
    cols = content_cols if content_cols is not None else \
        [c for c in df.columns if c != key_col]
    payload = F.concat_ws(
        ':', F.col(key_col).cast('string'),
        *[F.coalesce(F.col(c).cast('string'), F.lit('')) for c in cols])
    return (shard_assign(df, n_shards, key_col)
            .select('shard', _h32(payload).alias('__d'))
            .groupBy('shard')
            .agg(F.count(F.lit(1)).alias('n_rows'),
                 (F.sum('__d') % _MOD31).cast('long').alias('content_checksum'))
            .orderBy('shard'))


def write_sharded(df: DataFrame, path: str, n_shards: int,
                  key_col: str = 'doc_id',
                  content_cols: list[str] | None = None) -> DataFrame:
    """Write the corpus as parquet partitioned by content-hash shard
    (path/shard=N/...) and return the manifest for the written data.
    Readers prune to single shards via partition pruning on `shard`; the
    returned manifest lets any downstream verify each shard's content
    survived the copy (recompute shard_manifest over the re-read data
    and compare)."""
    assigned = shard_assign(df, n_shards, key_col)
    assigned.write.mode('overwrite').partitionBy('shard').parquet(path)
    back = assigned.sparkSession.read.parquet(path)
    return shard_manifest(back.drop('shard'), n_shards, key_col, content_cols)


def verify_shards(df: DataFrame, manifest: DataFrame, n_shards: int,
                  key_col: str = 'doc_id',
                  content_cols: list[str] | None = None) -> bool:
    """True iff the corpus' recomputed manifest equals `manifest`
    (driver-side compare of n_shards rows — bounded)."""
    got = {tuple(r) for r in
           shard_manifest(df, n_shards, key_col, content_cols).collect()}
    want = {tuple(r) for r in manifest.collect()}
    return got == want
