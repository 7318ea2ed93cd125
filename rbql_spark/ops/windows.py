"""Window / set-op / HAVING superset operators (absent from the reference —
SURVEY §2.5 "none" — implemented natively on Spark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def events_row_number(events: DataFrame) -> DataFrame:
    """row_number / rank / lag / lead per user ordered by event time.

    Returns UNORDERED output: a per-row operator must not fuse a global
    display sort (a full-corpus range Exchange at 100 TB) — callers that
    want presentation order sort at their own boundary.
    """
    w = Window.partitionBy('user_id').orderBy(F.col('ts').asc(), F.col('event_id').asc())
    return events.select(
        'user_id', 'event_id', 'value',
        F.row_number().over(w).alias('rn'),
        F.rank().over(w).alias('rnk'),
        F.lag('value', 1).over(w).alias('prev_value'),
        F.lead('value', 1).over(w).alias('next_value'),
    )


def events_running_sum(events: DataFrame) -> DataFrame:
    """Per-user running sum; unordered output (see events_row_number)."""
    w = (Window.partitionBy('user_id')
         .orderBy(F.col('ts').asc(), F.col('event_id').asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        'user_id', 'event_id',
        F.round(F.sum('value').over(w), 6).alias('running_value'),
    )


def tumbling_window_agg(events: DataFrame, width: str = '1 hour') -> DataFrame:
    """Event-time tumbling window aggregation (batch form of the streaming
    operator; the same projection works under readStream + withWatermark).

    Output is UNORDERED (all batch aggs here are): a display sort is a
    full-result range Exchange at corpus scale — callers sort at their own
    presentation boundary.
    """
    win = F.window(F.col('ts'), width)
    return (events.groupBy(win.alias('win'), F.col('event_type'))
                  .agg(F.count(F.lit(1)).alias('n_events'),
                       F.round(F.sum('value'), 6).alias('sum_value'))
                  .select(F.col('win.start').alias('window_start'),
                          'event_type', 'n_events', 'sum_value'))


def sliding_window_agg(events: DataFrame, width: str = '2 hours',
                       slide: str = '1 hour') -> DataFrame:
    win = F.window(F.col('ts'), width, slide)
    return (events.groupBy(win.alias('win'))
                  .agg(F.count(F.lit(1)).alias('n_events'))
                  .select(F.col('win.start').alias('window_start'), 'n_events'))


def session_window_agg(events: DataFrame, gap: str = '30 minutes') -> DataFrame:
    win = F.session_window(F.col('ts'), gap)
    return (events.groupBy(win.alias('win'), F.col('user_id'))
                  .agg(F.count(F.lit(1)).alias('n_events'))
                  .select('user_id', F.col('win.start').alias('session_start'),
                          'n_events'))


def having_filter(df: DataFrame, group_col: str, agg_col: str, min_count: int) -> DataFrame:
    """GROUP BY … HAVING count(*) >= N (reference rejects HAVING with a hint,
    rbql_engine.py:963-964 — provided natively here as a superset)."""
    return (df.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias('cnt'), F.round(F.sum(agg_col), 6).alias('total'))
              .filter(F.col('cnt') >= min_count))
