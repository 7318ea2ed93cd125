"""NamespaceRegistry + FROM-resolution (the %rbql magic internals; the magic
registration itself needs a live IPython kernel and is exercised manually)."""


def test_namespace_registry_resolves_tables(spark):
    import pandas as pd

    from rbql_spark.api import collect_result_rows, run_query
    from rbql_spark.ipython_ext import NamespaceRegistry

    ns = {
        'people_pdf': pd.DataFrame({'name': ['alice', 'bob'], 'age': [30, 25]}),
        'people_sdf': spark.createDataFrame([('carol', 41)], 'name string, age long'),
        'rows_table': [['x', '1'], ['y', '2']],
    }
    reg = NamespaceRegistry([ns])

    res = run_query(spark, 'SELECT a.name FROM people_pdf WHERE a.age > 26',
                    input_handle=None, registry=reg)
    assert collect_result_rows(res) == [['alice']]

    res = run_query(spark, 'SELECT a.name, a.age FROM people_sdf',
                    input_handle=None, registry=reg)
    assert collect_result_rows(res) == [['carol', 41]]

    res = run_query(spark, 'SELECT a1 FROM rows_table WHERE a2 == "2"',
                    input_handle=None, registry=reg)
    assert collect_result_rows(res) == [['y']]


def test_rbql_table_names_index(spark, tmp_path, monkeypatch):
    import os

    from rbql_spark import query_csv
    data = os.path.join(str(tmp_path), 'dim.csv')
    with open(data, 'w') as f:
        f.write('us,USA\nfr,France\n')
    main = os.path.join(str(tmp_path), 'main.csv')
    with open(main, 'w') as f:
        f.write('1,us\n2,fr\n')
    home = os.path.join(str(tmp_path), 'home')
    os.makedirs(home)
    with open(os.path.join(home, '.rbql_table_names'), 'w') as f:
        f.write('countries {}\n'.format(data))
    monkeypatch.setenv('HOME', home)
    res = query_csv(spark, 'SELECT a1, b2 INNER JOIN countries ON a2 == b1', main,
                    policy='simple')
    rows = [list(r) for r in res.display_df(ordered=True).collect()]
    assert rows == [['1', 'USA'], ['2', 'France']]
