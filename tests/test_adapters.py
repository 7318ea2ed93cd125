import os
import sqlite3

import pytest


def test_pandas_bridge_named(spark):
    import pandas as pd

    from rbql_spark.sources.pandas_bridge import query_pandas_dataframe
    pdf = pd.DataFrame({'name': ['alice', 'bob', 'carol'], 'age': [30, 25, 41]})
    out = query_pandas_dataframe(spark, 'SELECT a.name, a.age * 2 AS dbl WHERE a.age > 26 ORDER BY a.age', pdf)
    assert list(out.columns) == ['name', 'dbl']
    assert out.values.tolist() == [['alice', 60], ['carol', 82]]


def test_pandas_bridge_headerless(spark):
    import pandas as pd

    from rbql_spark.sources.pandas_bridge import query_pandas_dataframe
    pdf = pd.DataFrame([['x', 1], ['y', 2]])
    out = query_pandas_dataframe(spark, 'SELECT a1, a2 + 10', pdf)
    assert out.values.tolist() == [['x', 11], ['y', 12]]


def test_pandas_bridge_join(spark):
    import pandas as pd

    from rbql_spark.sources.pandas_bridge import query_pandas_dataframe
    a = pd.DataFrame({'k': ['u', 'f'], 'v': [1, 2]})
    b = pd.DataFrame({'k': ['u', 'f'], 'cap': ['Washington', 'Paris']})
    out = query_pandas_dataframe(spark, 'SELECT a.v, b.cap INNER JOIN b ON a.k == b.k', a, join_pdf=b)
    assert sorted(out.values.tolist()) == [[1, 'Washington'], [2, 'Paris']]


@pytest.fixture()
def sqlite_db(tmp_path):
    path = os.path.join(str(tmp_path), 'test.db')
    conn = sqlite3.connect(path)
    conn.execute('CREATE TABLE people (name TEXT, age INTEGER, score REAL)')
    conn.executemany('INSERT INTO people VALUES (?, ?, ?)',
                     [('alice', 30, 1.5), ('böb', 25, None), ('carol', 41, 3.25)])
    conn.execute('CREATE TABLE pets (owner TEXT, pet TEXT)')
    conn.executemany('INSERT INTO pets VALUES (?, ?)',
                     [('alice', 'cat'), ('carol', 'dog')])
    conn.commit()
    conn.close()
    return path


def test_sqlite_typed_passthrough(spark, sqlite_db):
    from rbql_spark.sources.sqlite_bridge import query_sqlite
    rows, header = query_sqlite(spark, 'SELECT a.name, a.age + 1, a.score WHERE a.age > 24 ORDER BY a.age',
                                sqlite_db, 'people')
    assert header == ['name', 'col2', 'score']
    assert rows == [['böb', 26, None], ['alice', 31, 1.5], ['carol', 42, 3.25]]


def test_sqlite_join_by_table_name(spark, sqlite_db):
    from rbql_spark.sources.sqlite_bridge import query_sqlite
    rows, _ = query_sqlite(spark, 'SELECT a.name, b.pet INNER JOIN pets ON a.name == b.owner ORDER BY a.name',
                           sqlite_db, 'people')
    assert rows == [['alice', 'cat'], ['carol', 'dog']]


def test_parquet_null_free_columns_footer_proof(spark, tmp_path):
    """Footer null-count statistics prove null-free columns; any column
    with a null (or without stats) is disqualified — absence of proof,
    never an assumption."""
    import pandas as pd
    from rbql_spark.registry import parquet_null_free_columns

    p = str(tmp_path / 'nf.parquet')
    pdf = pd.DataFrame({'clean': [1, 2, 3, 4],
                        'dirty': [1.0, None, 3.0, 4.0],
                        'text': ['a', 'b', 'c', 'd']})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(p)
    proven = parquet_null_free_columns(p)
    assert 'clean' in proven and 'text' in proven
    assert 'dirty' not in proven
    # nonexistent path → empty proof, no raise
    assert parquet_null_free_columns(str(tmp_path / 'missing')) == frozenset()


def test_parquet_null_free_disqualifies_extensionless_data_files(spark, tmp_path):
    """spark.read.parquet(dir) reads every non-hidden data file regardless of
    extension; a directory holding an extension-less part file (Hive-style
    '000000_0') must yield NO proof — otherwise nulls hiding in the
    unexamined file would bypass the reference-parity null guards."""
    import os
    import shutil
    import pandas as pd
    from rbql_spark.registry import parquet_null_free_columns

    p = str(tmp_path / 'mixed.parquet')
    pdf = pd.DataFrame({'clean': [1, 2, 3, 4]})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(p)
    assert 'clean' in parquet_null_free_columns(p)
    # Clone a data file under a Hive-style extension-less name.
    part = next(n for n in os.listdir(p) if n.endswith('.parquet'))
    shutil.copy(os.path.join(p, part), os.path.join(p, '000000_0'))
    assert parquet_null_free_columns(p) == frozenset()
    # Hidden/underscore metadata files never disqualify.
    os.remove(os.path.join(p, '000000_0'))
    with open(os.path.join(p, '_metadata_extra'), 'w') as f:
        f.write('x')
    assert 'clean' in parquet_null_free_columns(p)
