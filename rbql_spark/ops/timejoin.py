"""Time-keyed joins Spark lacks natively: as-of join and interval join.

Open-source Spark has no ASOF JOIN (it exists in DuckDB/Pandas/kdb) and
executes point-in-interval predicates as a broadcast-nested-loop or a
sort-merge over an inequality — both quadratic-ish at corpus scale.
These operators re-express the semantics as compositions Spark runs
well:

  * `asof_join` — the union-and-carry-forward pattern: tag both inputs,
    union them, and per partition key run ONE window ordered by time in
    which each left row picks up the last non-null right payload at or
    before it.  Cost: one shuffle on the `by` key + an in-partition
    sort — the same as any keyed window; never a cross product, and
    skew only where a single `by` key is itself hot.
  * `interval_join` — time-binned equi-join: intervals are exploded to
    the fixed-width bins they cover, points map to exactly ONE bin, and
    the equi-join on (by, bin) prunes candidates before the exact
    containment filter.  Candidate count is |points| + Σ interval
    spans / bin_width, not |points| × |intervals|; each point matches
    an interval once (its own bin), so no post-join dedup is needed.

Reference scope note: the reference engine (rbql_engine.py joins,
:991-1013) supports only equality joins; these are part of the
deliberate large-scale superset (SURVEY.md §2.3 "not implemented"
row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['asof_join', 'interval_join']


def asof_join(left: DataFrame, right: DataFrame, on: str = 'ts',
              by: str = 'user_id', tolerance: str | None = None,
              suffix: str = '_r') -> DataFrame:
    """Backward as-of join: each left row is matched with the LAST right
    row of the same `by` key whose `on` value is <= the left row's
    (inclusive — the DuckDB/pandas `asof backward` tie rule).  Right
    payload columns arrive suffixed; the matched right timestamp rides
    as `{on}{suffix}`.  Unmatched left rows keep NULL payloads (left
    outer semantics).

    `tolerance` (an INTERVAL string like '2 hours') additionally voids
    matches older than `on - tolerance`, like pandas merge_asof.

    The right side must be unique per (by, on) — the standard as-of
    contract; ambiguous same-instant right rows would make the result
    engine-dependent, so pre-aggregate (e.g. max payload per instant)
    before calling.  One shuffle on `by`, one in-partition sort, no
    cross product.
    """
    payload = [c for c in right.columns if c not in (by, on)]
    clashes = ({c + suffix for c in payload} | {on + suffix}) \
        & set(left.columns)
    if clashes:
        raise ValueError('asof_join output name collision: left already '
                         'has {} — pick another suffix'.format(sorted(clashes)))
    # the union-then-sort below compares the two sides' `on` values on one
    # clock; mixing NTZ with tz-aware timestamps would coerce through the
    # session timezone and reorder rows across DST transitions (the same
    # hazard interval_join guards at its binning step)
    l_ntz = dict(left.dtypes)[on] == 'timestamp_ntz'
    if (dict(right.dtypes)[on] == 'timestamp_ntz') != l_ntz:
        raise ValueError('asof_join: left and right `{}` columns mix '
                         'TIMESTAMP_NTZ with tz-aware timestamps — cast '
                         'both sides to one kind first'.format(on))
    # NULL-keyed / NULL-time right rows can never match under join
    # semantics (e.ts >= NULL and NULL = NULL are both false in the
    # oracle); left in, a NULL-ts row would sort first and leak its
    # payload, and NULL keys would "match" other NULL keys through the
    # window partition
    right = right.where(F.col(by).isNotNull() & F.col(on).isNotNull())
    # the matched marker travels as ONE struct so its timestamp and
    # payload stay atomic: carrying payload columns independently with
    # last(ignorenulls) would skip a matched marker whose payload value
    # is NULL and leak an OLDER marker's value forward
    pack_t = 'struct<__t:{}{}>'.format(
        dict(right.dtypes)[on],
        ''.join(',{}:{}'.format(c, dict(right.dtypes)[c])
                for c in payload))
    l_tag = left.select(
        F.col(by), F.col(on), F.lit(1).alias('__side'),
        *[F.col(c) for c in left.columns if c not in (by, on)],
        F.lit(None).cast(pack_t).alias('__pack'))
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias('__side'),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in (by, on)],
        F.struct(F.col(on).alias('__t'),
                 *[F.col(c) for c in payload]).alias('__pack'))
    # right rows sort BEFORE left rows at the same instant, so the
    # carry-forward window sees them — the inclusive (<=) tie rule
    w = (Window.partitionBy(by)
         .orderBy(F.col(on).asc(), F.col('__side').asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = l_tag.unionByName(r_tag).select(
        '*', F.last('__pack', ignorenulls=True).over(w).alias('__m'))
    out = (carried.where(F.col('__side') == 1)
           .select(by, on,
                   *[c for c in left.columns if c not in (by, on)],
                   *[F.col('__m.{}'.format(c)).alias(c + suffix)
                     for c in payload],
                   F.col('__m.__t').alias(on + suffix)))
    if tolerance is not None:
        stale = F.col(on + suffix) < \
            F.col(on) - F.expr('INTERVAL {}'.format(tolerance))
        out = out.select(
            by, on, *[c for c in left.columns if c not in (by, on)],
            *[F.when(stale, F.lit(None)).otherwise(F.col(c + suffix))
               .alias(c + suffix) for c in payload],
            F.when(stale, F.lit(None)).otherwise(F.col(on + suffix))
             .alias(on + suffix))
    return out


def _us(col: Column, ntz: bool) -> Column:
    # microsecond precision: unix_timestamp() truncates sub-seconds,
    # which shifted end-boundary arithmetic by up to a second (an
    # interval ending at 10:00:00.250 must still generate the 10:00 bin
    # for a point at 10:00:00.100).
    if ntz:
        # unix_micros rejects TIMESTAMP_NTZ (the type parquet timestamps
        # read as).  A session-tz cast is NOT safe here: across a DST
        # transition the offset differs between values on opposite sides
        # of it, so a point and its containing interval could land in
        # non-adjacent bins and silently drop the pair.  Wall-clock
        # arithmetic against an NTZ epoch literal is timezone-free — a
        # fixed-offset conversion by construction.
        return F.timestamp_diff(
            'MICROSECOND',
            F.lit('1970-01-01 00:00:00').cast('timestamp_ntz'), col)
    return F.unix_micros(col.cast('timestamp'))


def _bin_of(col: Column, bin_seconds: int, ntz: bool) -> Column:
    return F.floor(_us(col, ntz) / F.lit(int(bin_seconds) * 1_000_000)) \
            .cast('long')


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str = 'ts', start_col: str = 'start_ts',
                  end_col: str = 'end_ts', by: str = 'user_id',
                  bin_seconds: int = 3600) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair of the same
    `by` key with start <= point < end (half-open, the windowing
    convention).  Output = point columns + interval columns.

    Naively this is an inequality join — Spark plans it as a broadcast
    nested loop (quadratic work at corpus scale).  Here each interval
    explodes to the `bin_seconds`-wide time bins it covers and each
    point maps to its single bin, so candidates come from an EQUI-join
    on (by, bin) and only then pass the exact containment filter.  A
    point lies in exactly one bin, so a qualifying pair appears exactly
    once — no dedup stage.  Pick bin_seconds near the typical interval
    span: candidate blow-up is ~(span / bin_seconds + 2) copies per
    interval (storage of the exploded build side, not of the points).
    """
    # output-name collision guard (mirrors asof_join's): a shared
    # non-`by` column name would emit duplicate columns and break any
    # downstream select/collect
    clashes = (set(points.columns) & set(intervals.columns)) - {by}
    if clashes:
        raise ValueError('interval_join output name collision: both '
                         'sides carry {} — rename or drop on one side'
                         .format(sorted(clashes)))
    # binning must be a fixed-offset conversion on BOTH sides, keyed off
    # each column's own type; mixing NTZ points with tz-aware intervals
    # (or vice versa) would bin the two sides on different clocks
    p_ntz = dict(points.dtypes)[point_col] == 'timestamp_ntz'
    i_ntz = dict(intervals.dtypes)[start_col] == 'timestamp_ntz'
    if p_ntz != i_ntz or \
            (dict(intervals.dtypes)[end_col] == 'timestamp_ntz') != i_ntz:
        raise ValueError('interval_join: point and interval time columns '
                         'mix TIMESTAMP_NTZ with tz-aware timestamps — '
                         'cast both sides to one kind first')
    # the last candidate bin holds end − 1µs (half-open upper bound)
    bin_us = int(bin_seconds) * 1_000_000
    last_bin = F.floor((_us(F.col(end_col), i_ntz) - 1)
                       / F.lit(bin_us)).cast('long')
    n_bins = last_bin - _bin_of(F.col(start_col), bin_seconds, i_ntz)
    # a start >= end interval contains no point under half-open
    # semantics — dropping it is exact AND prevents the descending bin
    # sequence such a row would otherwise generate
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    iv = intervals.select(
        '*',
        F.explode(F.sequence(
            _bin_of(F.col(start_col), bin_seconds, i_ntz),
            _bin_of(F.col(start_col), bin_seconds, i_ntz) + n_bins))
         .alias('__bin'))
    pt = points.select('*', _bin_of(F.col(point_col), bin_seconds, p_ntz)
                       .alias('__bin'))
    cond = ((pt[by] == iv[by]) & (pt['__bin'] == iv['__bin'])
            & (pt[point_col] >= iv[start_col])
            & (pt[point_col] < iv[end_col]))
    return (pt.join(iv, cond)
              .select(*[pt[c] for c in points.columns],
                      *[iv[c] for c in intervals.columns
                        if c not in (by,)])
              .drop('__bin'))
