"""Record-number (NR) assignment, designed for multi-executor scale.

The reference's NR is the 1-based position in the single input stream
(rbql_engine.py:743-752).  On Spark, input order = (partition order, row
order within partition) of the scan.  Two strategies:

* ``order_surrogate`` — ``monotonically_increasing_id()``: zero-cost, no job,
  NOT dense, but strictly increasing in input order.  Sufficient for every
  *internal* use (sort stability, DISTINCT first-seen, ARRAY_AGG order, TOP
  without ORDER BY) which only need a total order consistent with input.
* ``dense`` — exact 1-based dense NR, needed only when the query *textually
  references* NR/aNR/bNR.  Computed with the classic two-pass trick
  (per-partition counts → driver cumsum → broadcast offsets + per-partition
  ``row_number``).  No global shuffle, no single-partition window; scales to
  arbitrary partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attach_order_surrogate(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.monotonically_increasing_id())


def attach_dense_nr(df: DataFrame, col: str) -> DataFrame:
    """Attach exact 1-based dense row numbers without a global sort."""
    pid, mid, off = '__rbql_pid', '__rbql_mid', '__rbql_off'
    d = df.withColumn(pid, F.spark_partition_id()) \
          .withColumn(mid, F.monotonically_increasing_id())
    counts = sorted(
        (r[0], r[1]) for r in d.groupBy(pid).count().collect()
    )
    offsets = []
    running = 0
    for p, c in counts:
        offsets.append((p, running))
        running += c
    if not offsets:
        return df.withColumn(col, F.lit(None).cast('long'))
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(offsets, '{} int, {} long'.format(pid, off))
    w = Window.partitionBy(pid).orderBy(mid)
    return (
        d.join(F.broadcast(offsets_df), pid)
         .withColumn(col, F.row_number().over(w).cast('long') + F.col(off))
         .drop(pid, mid, off)
    )


def attach_running_count(df: DataFrame, order_col: str, cond, out_col: str,
                         cache_registry: list | None = None) -> DataFrame:
    """Running count of ``cond`` in ``order_col`` order, INCLUDING the
    current row — the NU counter (reference: rbql_engine.py:693,711-770).

    Sequential semantics without a sequential plan: an unpartitioned
    ``Window.orderBy`` would funnel the whole table through one task, so
    this uses the same two-phase partition prefix sum as
    :func:`attach_dense_nr` — range-partition by the order key (each
    partition holds a contiguous key range, ranges ascend with partition
    id), count condition matches per partition, cumulative offsets on the
    driver (one row per partition), then a partition-LOCAL ordered window
    adds the within-partition running count to the partition's offset.
    The range-partitioned frame is persisted because the range sampler is
    not stable across jobs and the offsets pass and the main pass must
    see identical partitions (the :func:`attach_nr` ORDER_SRC precedent).

    Cache lifetime: the persist MUST outlive every action on the returned
    DataFrame — unpersisting earlier re-samples the range partitioner and
    silently mis-numbers (the offsets were computed against the pinned
    partitioning).  ``cache_registry`` (r14 verdict #5) collects the
    pinned frame so the QUERY's result handle can unpersist it at its
    terminal action (StageResult.release(); the eager API paths call it
    after their final collect/write); without a registry the entry is
    left to Spark's LRU block eviction (MEMORY_AND_DISK spills, evicts
    under pressure; bounded by the session's working set).
    """
    pid, off, flag = '__rbql_pid', '__rbql_off', '__rbql_flag'
    spark = df.sparkSession
    try:
        n_parts = max(1, int(spark.conf.get('spark.sql.shuffle.partitions')))
    except Exception:
        n_parts = 200
    d = (df.withColumn(flag, F.when(cond, F.lit(1)).otherwise(F.lit(0)))
           .repartitionByRange(n_parts, F.col(order_col))
           .withColumn(pid, F.spark_partition_id()))
    from pyspark import StorageLevel
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(d)
    counts = sorted((r[0], int(r[1] or 0))
                    for r in d.groupBy(pid).agg(F.sum(flag)).collect())
    if not counts:
        return df.withColumn(out_col, F.lit(0).cast('long'))
    offsets = []
    running = 0
    for p, c in counts:
        offsets.append((p, running))
        running += c
    offsets_df = spark.createDataFrame(
        offsets, '{} int, {} long'.format(pid, off))
    w = (Window.partitionBy(pid).orderBy(F.col(order_col))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(F.broadcast(offsets_df), pid)
             .withColumn(out_col,
                         (F.sum(flag).over(w) + F.col(off)).cast('long'))
             .drop(pid, off, flag))


def attach_nr(df: DataFrame, col: str, dense: bool,
              cache_registry: list | None = None) -> DataFrame:
    from .binding import ORDER_SRC_COL
    if ORDER_SRC_COL in df.columns:
        # the source captured its own order key before a repartition (CSV
        # line-parallel parsing) — partition order no longer reflects input
        # order, so derive NR from that key instead
        if dense:
            # range-partitioned sort restores input order across partitions;
            # the two-pass dense numbering then applies (no single-partition
            # window — scales with the sort).  Persist pins the partitioning:
            # the range sampler is not stable across jobs, and the offset
            # pass and the main pass must see identical partitions.
            from pyspark import StorageLevel
            ordered = df.orderBy(F.col(ORDER_SRC_COL)).drop(ORDER_SRC_COL) \
                        .persist(StorageLevel.MEMORY_AND_DISK)
            if cache_registry is not None:
                cache_registry.append(ordered)
            return attach_dense_nr(ordered, col)
        return df.withColumnRenamed(ORDER_SRC_COL, col)
    if dense:
        return attach_dense_nr(df, col)
    return attach_order_surrogate(df, col)
