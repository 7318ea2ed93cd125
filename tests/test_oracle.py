"""Local mirror of the driver's t2 correctness gate: run each queries()
entry AND its oracle_sql() through DuckDB on the same parquet, compare
row-count + column names + values (order-insensitive, floats rounded)."""

import datetime
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR_TEST',
                        os.path.join(os.environ.get('SPARK_GRAFT_TESTDATA', '/root/testdata'), 'sf0.001'))

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return 'nan'
        return round(v, 4)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    return v


def _norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_val(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.fixture(scope='module')
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute("CREATE VIEW {} AS SELECT * FROM '{}/{}.parquet'".format(t, SF_DIR, t))
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize('name', sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [list(r) for r in qdf.collect()]

    res = duck.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        'column names differ: {} vs {}'.format(spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), \
        'row counts differ: {} vs {}'.format(len(spark_rows), len(duck_rows))
    ns, nd = _norm_rows(spark_rows, spark_cols), _norm_rows(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, 'first mismatches: {}'.format(mismatches[:3])


@pytest.mark.parametrize('name', sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    assert qdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 9
