"""Corpus/table profiling (superset op, SURVEY §2.8): the "analyze"
step every ingestion pipeline runs before processing — per-column row,
null, and exact-distinct counts plus min/max, in ONE aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx_distinct: bool = False,
                  approx_rsd: float = 0.05) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) — min/max rendered as strings so heterogeneous column types
    share one result schema.

    Scale shape: a SINGLE global aggregation job computes every column's
    statistics — one corpus scan, never a scan per column.  By default the
    multiple COUNT(DISTINCT col) aggregates compile to Spark's
    Expand-based multi-distinct plan (one shuffle carrying
    (column-tag, value) rows).  At 100 TB that exact-distinct shuffle is
    the dominant cost: approx_distinct=True swaps in HyperLogLog++
    (approx_count_distinct, relative error approx_rsd), which partial-
    aggregates map-side into fixed-size sketches — the shuffle carries
    one sketch per column per task instead of the value stream.  (The
    approx variant is engine-specific sketch state, so it is validated by
    an rsd-bound pytest against the exact path rather than a DuckDB
    replay.)  The single wide result row is unpivoted to per-column rows
    with an inline array of structs (no driver-side collect).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    nd = ((lambda c: F.approx_count_distinct(c, rsd=approx_rsd))
          if approx_distinct else F.count_distinct)
    aggs = [F.count(F.lit(1)).alias('__n')]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias('__nn{}'.format(i)),
            nd(F.col(c)).alias('__nd{}'.format(i)),
            F.min(F.col(c)).cast('string').alias('__mn{}'.format(i)),
            F.max(F.col(c)).cast('string').alias('__mx{}'.format(i)),
        ]
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias('column'),
                 F.col('__n').alias('n_rows'),
                 (F.col('__n') - F.col('__nn{}'.format(i))).alias('n_nulls'),
                 F.col('__nd{}'.format(i)).alias('n_distinct'),
                 F.col('__mn{}'.format(i)).alias('min_value'),
                 F.col('__mx{}'.format(i)).alias('max_value'))
        for i, c in enumerate(cols)])
    return (wide.select(F.explode(rows).alias('__r'))
                .select('__r.column', '__r.n_rows', '__r.n_nulls',
                        '__r.n_distinct', '__r.min_value', '__r.max_value'))
