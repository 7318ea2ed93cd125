"""As-of and interval joins (superset; reference joins are equality-only,
rbql_engine.py:991-1013): semantics vs hand-built expectations and vs
DuckDB replays, plus plan-shape guards (no nested-loop/cartesian)."""

import os
from datetime import datetime

from pyspark.sql import functions as F


def _mk_events(spark):
    rows = [
        # (user, ts, event_id, value)
        (1, datetime(2024, 1, 1, 10, 0), 100, 1.0),
        (1, datetime(2024, 1, 1, 11, 0), 101, 2.0),
        (1, datetime(2024, 1, 1, 13, 0), 102, 3.0),
        (2, datetime(2024, 1, 1, 10, 30), 200, 4.0),
        (3, datetime(2024, 1, 1, 9, 0), 300, 5.0),
    ]
    return spark.createDataFrame(
        rows, 'user_id long, ts timestamp, event_id long, value double')


def _mk_markers(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 10.0),   # same instant as e100
        (1, datetime(2024, 1, 1, 12, 0), 20.0),
        (2, datetime(2024, 1, 1, 9, 0), 30.0),
    ]
    return spark.createDataFrame(
        rows, 'user_id long, ts timestamp, mval double')


def test_asof_join_semantics(spark):
    from rbql_spark.ops.timejoin import asof_join
    ev, mk = _mk_events(spark), _mk_markers(spark)
    got = {r['event_id']: (r['mval_r'], r['ts_r'])
           for r in asof_join(ev, mk).collect()}
    # inclusive tie: the 10:00 event matches the 10:00 marker
    assert got[100] == (10.0, datetime(2024, 1, 1, 10, 0))
    # carry-forward between markers
    assert got[101][0] == 10.0
    # the 13:00 event sees the newer 12:00 marker
    assert got[102] == (20.0, datetime(2024, 1, 1, 12, 0))
    assert got[200][0] == 30.0
    # user 3 has no markers: left outer NULLs
    assert got[300] == (None, None)
    # every left row survives exactly once
    assert len(got) == ev.count()


def test_asof_join_tolerance(spark):
    from rbql_spark.ops.timejoin import asof_join
    ev, mk = _mk_events(spark), _mk_markers(spark)
    got = {r['event_id']: r['mval_r']
           for r in asof_join(ev, mk, tolerance='1 hours').collect()}
    assert got[100] == 10.0      # 0 min old
    assert got[101] == 10.0      # 60 min old — inclusive boundary
    assert got[102] == 20.0      # 60 min old
    assert got[200] is None      # 90 min old: voided
    assert got[300] is None


def test_asof_join_matches_duckdb(spark, sf_dir):
    import duckdb

    from rbql_spark.ops.timejoin import asof_join
    ev = spark.read.parquet(os.path.join(sf_dir, 'events.parquet')) \
        .select('user_id', 'ts', 'event_id', 'value')
    mk = (ev.filter(F.col('event_id') % 19 == 0)
            .groupBy('user_id', 'ts').agg(F.max('value').alias('mval')))
    pdf = asof_join(ev, mk).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM '{}'".format(
        os.path.join(sf_dir, 'events.parquet')))
    odf = con.sql(
        "WITH e AS (SELECT user_id, ts, event_id, value FROM events), "
        "m AS (SELECT user_id, ts, max(value) AS mval FROM events "
        "WHERE event_id % 19 = 0 GROUP BY 1, 2) "
        "SELECT e.user_id, e.ts, e.event_id, e.value, m.mval AS mval_r, "
        "m.ts AS ts_r FROM e ASOF LEFT JOIN m "
        "ON e.user_id = m.user_id AND e.ts >= m.ts").df()

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(v) for v in row) for row in
                      df[cols].itertuples(index=False, name=None))
    assert canon(pdf) == canon(odf)


def test_interval_join_semantics_and_plan(spark):
    from rbql_spark.ops.timejoin import interval_join
    ev = _mk_events(spark)
    iv = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 30), datetime(2024, 1, 1, 11, 0), 7.0)],
        'user_id long, start_ts timestamp, end_ts timestamp, ival double')
    res = interval_join(ev, iv, point_col='ts', start_col='start_ts',
                        end_col='end_ts', by='user_id')
    rows = res.collect()
    # half-open: 10:00 in, 11:00 (== end) out, 13:00 out, other users out
    assert {r['event_id'] for r in rows} == {100}
    # the binned rewrite must plan as an equi-join, never a nested loop
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastNestedLoopJoin' not in plan
    assert 'CartesianProduct' not in plan


def test_interval_join_multi_bin_span(spark):
    # an interval spanning several bins still matches each point once
    from rbql_spark.ops.timejoin import interval_join
    ev = _mk_events(spark)
    iv = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0), datetime(2024, 1, 1, 14, 0), 8.0)],
        'user_id long, start_ts timestamp, end_ts timestamp, ival double')
    rows = interval_join(ev, iv, point_col='ts', start_col='start_ts',
                         end_col='end_ts', by='user_id',
                         bin_seconds=1800).collect()
    assert sorted(r['event_id'] for r in rows) == [100, 101, 102]


def test_asof_join_suffix_collision_raises(spark):
    import pytest

    from rbql_spark.ops.timejoin import asof_join
    ev = _mk_events(spark).withColumnRenamed('value', 'mval_r')
    with pytest.raises(ValueError, match='collision'):
        asof_join(ev, _mk_markers(spark))


def test_interval_join_ignores_empty_intervals(spark):
    from rbql_spark.ops.timejoin import interval_join
    ev = _mk_events(spark)
    iv = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 0), 1.0),
         (1, datetime(2024, 1, 1, 12, 0), datetime(2024, 1, 1, 11, 0), 2.0),
         (1, datetime(2024, 1, 1, 9, 30), datetime(2024, 1, 1, 10, 30), 3.0)],
        'user_id long, start_ts timestamp, end_ts timestamp, ival double')
    rows = interval_join(ev, iv, point_col='ts', start_col='start_ts',
                         end_col='end_ts', by='user_id').collect()
    # only the real interval matches; zero-width and inverted ones match
    # nothing (half-open semantics) instead of mis-binning
    assert [(r['event_id'], r['ival']) for r in rows] == [(100, 3.0)]


def test_asof_join_randomized_vs_duckdb(spark):
    # seeded randomized differential check: arbitrary key/time layouts,
    # duplicate left instants, keys with no markers, marker-only keys —
    # all compared value-for-value against DuckDB's native ASOF JOIN
    import random
    from datetime import timedelta

    import duckdb

    rnd = random.Random(90210)
    base = datetime(2024, 3, 1)
    for trial in range(5):
        ev_rows = [(rnd.randint(1, 6),
                    base + timedelta(minutes=rnd.randint(0, 600)),
                    i, float(rnd.randint(-50, 50)))
                   for i in range(rnd.randint(5, 60))]
        mk_keyed = {}
        for _ in range(rnd.randint(0, 25)):
            k = (rnd.randint(1, 8),
                 base + timedelta(minutes=rnd.randint(0, 600)))
            mk_keyed[k] = float(rnd.randint(0, 9))  # unique per (by, on)
        mk_rows = [(k[0], k[1], v) for k, v in mk_keyed.items()]

        ev = spark.createDataFrame(
            ev_rows, 'user_id long, ts timestamp, event_id long, value double')
        if mk_rows:
            mk = spark.createDataFrame(
                mk_rows, 'user_id long, ts timestamp, mval double')
        else:
            mk = spark.createDataFrame(
                [], 'user_id long, ts timestamp, mval double')

        from rbql_spark.ops.timejoin import asof_join
        pdf = asof_join(ev, mk).toPandas()

        con = duckdb.connect()
        con.execute('CREATE TABLE e (user_id BIGINT, ts TIMESTAMP, '
                    'event_id BIGINT, value DOUBLE)')
        con.execute('CREATE TABLE m (user_id BIGINT, ts TIMESTAMP, '
                    'mval DOUBLE)')
        con.executemany('INSERT INTO e VALUES (?,?,?,?)', ev_rows)
        if mk_rows:
            con.executemany('INSERT INTO m VALUES (?,?,?)', mk_rows)
        odf = con.sql(
            'SELECT e.user_id, e.ts, e.event_id, e.value, '
            'm.mval AS mval_r, m.ts AS ts_r FROM e ASOF LEFT JOIN m '
            'ON e.user_id = m.user_id AND e.ts >= m.ts').df()

        def canon(df):
            cols = sorted(df.columns)
            return sorted(tuple(str(v) for v in row) for row in
                          df[cols].itertuples(index=False, name=None))
        assert canon(pdf) == canon(odf), 'trial {}'.format(trial)


def test_asof_join_single_shuffle(spark, sf_dir):
    # the operator itself must add exactly ONE exchange (the by-key
    # window); inputs here are pre-shaped so no upstream agg pollutes
    # the count
    from rbql_spark.ops.timejoin import asof_join
    ev = spark.read.parquet(os.path.join(sf_dir, 'events.parquet')) \
        .select('user_id', 'ts', 'event_id', 'value')
    mk = spark.read.parquet(os.path.join(sf_dir, 'events.parquet')) \
        .filter('event_id % 50 = 0') \
        .select('user_id', 'ts', F.col('value').alias('mval'))
    plan = asof_join(ev, mk)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count('Exchange') == 1, plan
    assert 'CartesianProduct' not in plan
    assert 'BroadcastNestedLoopJoin' not in plan


def test_asof_join_null_payload_marker_does_not_leak(spark):
    # round-9 review regression: a matched marker whose payload is NULL
    # must yield NULL (not an older marker's value), NULL-ts markers
    # never match, and NULL keys never match each other — all matching
    # DuckDB ASOF semantics
    from rbql_spark.ops.timejoin import asof_join
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 13, 0), 100, 1.0),
         (None, datetime(2024, 1, 1, 13, 0), 101, 2.0)],
        'user_id long, ts timestamp, event_id long, value double')
    mk = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), 5.0),
         (1, datetime(2024, 1, 1, 12, 0), None),    # NULL payload
         (1, None, 7.0),                            # NULL ts: never matches
         (None, datetime(2024, 1, 1, 9, 0), 9.0)],  # NULL key: never matches
        'user_id long, ts timestamp, mval double')
    got = {r['event_id']: (r['mval_r'], r['ts_r'])
           for r in asof_join(ev, mk).collect()}
    # the 12:00 marker matches; its NULL payload must ride with its ts
    assert got[100] == (None, datetime(2024, 1, 1, 12, 0))
    # NULL-keyed left rows never match NULL-keyed markers
    assert got[101] == (None, None)


def test_interval_join_subsecond_end_boundary(spark):
    # round-9 review regression: an interval ending just past a bin
    # boundary (fractional seconds) must still generate that bin
    from rbql_spark.ops.timejoin import interval_join
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0, 100000), 100, 1.0)],
        'user_id long, ts timestamp, event_id long, value double')
    iv = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0),
          datetime(2024, 1, 1, 10, 0, 0, 250000), 7.0)],
        'user_id long, start_ts timestamp, end_ts timestamp, ival double')
    rows = interval_join(ev, iv, point_col='ts', start_col='start_ts',
                         end_col='end_ts', by='user_id').collect()
    assert [r['event_id'] for r in rows] == [100]
    # and the half-open bound still excludes a point AT the end instant
    ev2 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0, 250000), 101, 1.0)],
        'user_id long, ts timestamp, event_id long, value double')
    assert interval_join(ev2, iv, point_col='ts', start_col='start_ts',
                         end_col='end_ts', by='user_id').count() == 0


def test_interval_join_ntz_session_tz_invariant(spark):
    # round-10 advisor fix: NTZ binning must be a fixed-offset
    # conversion, so results cannot depend on the session timezone even
    # when the data spans a DST transition of that zone (2024-03-10
    # 02:00 America/New_York).  The old session-tz cast mapped
    # wall-clock values through a zone-dependent (and around the gap,
    # non-injective) function.
    from rbql_spark.ops.timejoin import interval_join
    ev = spark.createDataFrame(
        [(1, '2024-03-10 01:45:00', 100),
         (1, '2024-03-10 02:30:00', 101),   # nonexistent NY wall-clock
         (1, '2024-03-10 03:15:00', 102),
         (1, '2024-03-10 05:30:00', 103)],
        'user_id long, raw string, event_id long') \
        .select('user_id', F.col('raw').cast('timestamp_ntz').alias('ts'),
                'event_id')
    iv = spark.createDataFrame(
        [(1, '2024-03-10 01:30:00', '2024-03-10 03:30:00', 7.0)],
        'user_id long, s string, e string, ival double') \
        .select('user_id', F.col('s').cast('timestamp_ntz').alias('start_ts'),
                F.col('e').cast('timestamp_ntz').alias('end_ts'), 'ival')
    prev = spark.conf.get('spark.sql.session.timeZone')
    try:
        got = {}
        for tz in ('UTC', 'America/New_York'):
            spark.conf.set('spark.sql.session.timeZone', tz)
            rows = interval_join(ev, iv, point_col='ts',
                                 start_col='start_ts', end_col='end_ts',
                                 by='user_id').collect()
            got[tz] = sorted(r['event_id'] for r in rows)
        assert got['UTC'] == got['America/New_York'] == [100, 101, 102]
    finally:
        spark.conf.set('spark.sql.session.timeZone', prev)


def test_interval_join_collision_and_mixed_kind_guards(spark):
    import pytest

    from rbql_spark.ops.timejoin import interval_join
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), 1.0)],
        'user_id long, ts timestamp, value double')
    iv = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0), datetime(2024, 1, 1, 11, 0), 2.0)],
        'user_id long, start_ts timestamp, end_ts timestamp, value double')
    with pytest.raises(ValueError, match='collision.*value'):
        interval_join(ev, iv, point_col='ts', start_col='start_ts',
                      end_col='end_ts', by='user_id')
    iv_ok = iv.withColumnRenamed('value', 'ival')
    # mixing NTZ points with tz-aware intervals bins the sides on
    # different clocks — rejected explicitly
    ev_ntz = ev.select('user_id', F.col('ts').cast('timestamp_ntz')
                       .alias('ts'), 'value')
    with pytest.raises(ValueError, match='mix TIMESTAMP_NTZ'):
        interval_join(ev_ntz, iv_ok, point_col='ts', start_col='start_ts',
                      end_col='end_ts', by='user_id')


def test_asof_join_mixed_timestamp_kind_guard(spark):
    # round-11 (verdict #4): asof_join's union-then-sort compares both
    # sides' `on` values on one clock — mixed NTZ / tz-aware inputs must
    # raise (the interval_join guard, mirrored) instead of silently
    # coercing through the session timezone
    import pytest
    from pyspark.sql import functions as F

    from rbql_spark.ops.timejoin import asof_join
    left = spark.createDataFrame(
        [(1, '2024-01-01 10:00:00', 5.0)],
        'user_id long, raw string, value double') \
        .select('user_id', F.col('raw').cast('timestamp').alias('ts'), 'value')
    right_ntz = spark.createDataFrame(
        [(1, '2024-01-01 09:00:00', 'm1')],
        'user_id long, raw string, marker string') \
        .select('user_id', F.col('raw').cast('timestamp_ntz').alias('ts'),
                'marker')
    with pytest.raises(ValueError, match='mix TIMESTAMP_NTZ'):
        asof_join(left, right_ntz)
    # both-NTZ inputs stay allowed (one clock, fixed offset)
    left_ntz = left.select('user_id',
                           F.col('ts').cast('timestamp_ntz').alias('ts'),
                           'value')
    got = asof_join(left_ntz, right_ntz).collect()
    assert len(got) == 1 and got[0]['marker_r'] == 'm1'
