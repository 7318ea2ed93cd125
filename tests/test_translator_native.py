"""Translator coverage tests: each expression must BOTH produce the Python
value AND compile natively (no Python stage in the plan)."""

import datetime

import pytest

from rbql_spark import query_dataframe


def _run_native(spark, df, query):
    res = query_dataframe(spark, query, df)
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert 'MapInPandas' not in plan and 'BatchEvalPython' not in plan, \
        'fell back to Python:\n' + plan[:600]
    return [list(r) for r in res.display_df(ordered=True).collect()]


@pytest.fixture(scope='module')
def num_df(spark):
    return spark.createDataFrame([(4.0, 2, 'Hello World', '42')],
                                 'x double, n long, s string, ints string')


def test_math_functions_native(spark, num_df):
    rows = _run_native(spark, num_df,
                       'SELECT math.sqrt(a.x), math.floor(a.x / 3), math.ceil(a.x / 3), '
                       'math.log(a.x), math.pow(a.n, 3), math.trunc(a.x)')
    import math
    assert rows[0][0] == pytest.approx(2.0)
    assert rows[0][1] == math.floor(4.0 / 3)
    assert rows[0][2] == math.ceil(4.0 / 3)
    assert rows[0][3] == pytest.approx(math.log(4.0))
    assert rows[0][4] == pytest.approx(8.0)
    assert rows[0][5] == 4


def test_str_methods_native(spark, num_df):
    rows = _run_native(spark, num_df,
                       "SELECT a.s.title(), a.s.count('l'), a.ints.zfill(5), "
                       "a.s.capitalize(), a.ints.isdigit(), a.s.isdigit()")
    assert rows[0] == ['Hello World', 'Hello World'.count('l'), '00042',
                       'Hello world', True, False]


def test_int_float_casts_native(spark, num_df):
    rows = _run_native(spark, num_df, 'SELECT int(a.ints) * 2, float(a.ints) / 4')
    assert rows[0] == [84, 10.5]


def test_int_cast_error_parity(spark):
    df = spark.createDataFrame([('abc',)], 's string')
    from rbql_spark.api import collect_result_rows
    res = query_dataframe(spark, 'SELECT int(a.s)', df)
    from rbql_spark.errors import RbqlRuntimeError
    with pytest.raises(RbqlRuntimeError, match="invalid literal for int"):
        collect_result_rows(res)


@pytest.fixture(scope='module')
def ts_df(spark):
    return spark.createDataFrame(
        [(datetime.datetime(2024, 3, 15, 14, 30, 45), datetime.date(2024, 3, 15))],
        'ts timestamp, d date')


def test_datetime_attrs_native(spark, ts_df):
    rows = _run_native(spark, ts_df,
                       'SELECT a.ts.year, a.ts.month, a.ts.day, a.ts.hour, '
                       'a.ts.minute, a.ts.second, a.d.year')
    assert rows[0] == [2024, 3, 15, 14, 30, 45, 2024]


def test_datetime_methods_native(spark, ts_df):
    rows = _run_native(spark, ts_df, 'SELECT a.d.weekday(), a.d.isoformat()')
    assert rows[0] == [datetime.date(2024, 3, 15).weekday(), '2024-03-15']


def test_datetime_compare_native(spark, ts_df):
    rows = _run_native(spark, ts_df,
                       'SELECT a.d WHERE a.ts > datetime.datetime(2024, 1, 1)')
    assert len(rows) == 1


def test_boolop_value_position(spark):
    # ADVICE r1 (high): `a1 or "default"` must return the operand value,
    # not a boolean
    df = spark.createDataFrame([('x',), ('',), ('y',)], 's string')
    rows = _run_native(spark, df, 'SELECT a.s or "default"')
    assert [r[0] for r in rows] == ['x', 'default', 'y']


def test_boolop_and_value_position(spark):
    df = spark.createDataFrame([('x',), ('',)], 's string')
    rows = _run_native(spark, df, 'SELECT a.s and "yes"')
    assert [r[0] for r in rows] == ['yes', '']


def test_boolop_numeric_or_default(spark):
    df = spark.createDataFrame([(0,), (7,)], 'n long')
    rows = _run_native(spark, df, 'SELECT a.n or -1')
    assert [r[0] for r in rows] == [-1, 7]


def test_boolop_predicate_still_native(spark):
    df = spark.createDataFrame([(1, 'x'), (5, 'y'), (9, 'x')], 'n long, s string')
    rows = _run_native(spark, df, "SELECT a.n WHERE a.n > 2 and a.s == 'x'")
    assert [r[0] for r in rows] == [9]


def test_zfill_parity(spark):
    # ADVICE r1: zfill must not truncate and must respect a leading sign
    df = spark.createDataFrame([('abcdef',), ('-5',), ('+5',), ('42',), ('',)], 's string')
    rows = _run_native(spark, df, 'SELECT a.s.zfill(3)')
    assert [r[0] for r in rows] == [s.zfill(3) for s in ['abcdef', '-5', '+5', '42', '']]


def test_str_float_python_repr(spark):
    # ADVICE r1 (low): str() on floats must match Python repr (falls back)
    df = spark.createDataFrame([(1e16,), (0.1,)], 'x double')
    from rbql_spark import query_dataframe
    res = query_dataframe(spark, 'SELECT str(a.x)', df)
    vals = [r[0] for r in res.display_df(ordered=True).collect()]
    assert vals == [str(1e16), str(0.1)]


def test_round_float_python_parity(spark):
    # Python rounds the binary double: round(2.675, 2) == 2.67, and
    # single-arg round returns an int
    df = spark.createDataFrame([(2.675,), (0.5,)], 'x double')
    from rbql_spark import query_dataframe
    res = query_dataframe(spark, 'SELECT round(a.x, 2), round(a.x)', df)
    vals = [list(r) for r in res.display_df(ordered=True).collect()]
    assert vals == [[round(2.675, 2), round(2.675)], [round(0.5, 2), round(0.5)]]


def test_round_int_native(spark):
    df = spark.createDataFrame([(125,), (135,)], 'n long')
    rows = _run_native(spark, df, 'SELECT round(a.n, -1), round(a.n)')
    assert rows == [[120, 125], [140, 135]]


def test_telemetry_counts_native_and_fallback(spark):
    # round-11 (r9 verdict item #3): StageResult carries per-query
    # translator telemetry so fallbacks are observable, not inferred
    df = spark.createDataFrame([(1, 'ab'), (2, 'cd')], 'x long, s string')
    res = query_dataframe(spark, "SELECT a.x * 2, a.s.upper() WHERE a.x > 0", df)
    tel = res.telemetry
    assert tel['native_count'] == 3 and tel['fallback_count'] == 0
    # an untranslatable expression is counted with its reason
    res2 = query_dataframe(spark, "SELECT ''.join(reversed(a.s))", df)
    tel2 = res2.telemetry
    assert tel2['fallback_count'] == 1
    assert any('reversed' in r or 'join' in r for r in tel2['fallback_reasons'])
    # pipe chains sum across stages
    res3 = query_dataframe(
        spark, "SELECT a.x * 2 AS y | SELECT a.y + 1 WHERE a.y > 0", df)
    assert res3.telemetry['native_count'] == 3


def test_bench_gates_fully_native(spark, sf_dir):
    # the rbql_* bench gates must plan ZERO Python expression stages:
    # every SELECT item / WHERE / sort key / UPDATE value translates to
    # native Catalyst columns (telemetry-backed, replacing plan-string
    # spot checks on a 6-gate subset).  Includes the three JS-dialect
    # gates — the JS front-end's helper shapes translate natively too
    # (jsdialect/native.py).
    import __spark_entry__ as entrymod
    q = entrymod.queries()
    gates = [n for n in q if n.startswith('rbql_') and n != 'rbql_array_agg']
    assert len(gates) == 23   # 24 rbql_* minus the array_agg wrapper
    for name in gates:
        fn = q[name]
        fn(spark, sf_dir)
        tel = fn.last_telemetry
        assert tel is not None, name
        assert tel['fallback_count'] == 0, (name, tel['fallback_reasons'])
        assert tel['native_count'] > 0 or name == 'rbql_except', name


def test_re_search_native_rlike(spark):
    # round-11: re.search/match/fullmatch with a literal Java-identical
    # pattern translate to rlike — the top corpus fallback class
    df = spark.createDataFrame(
        [('alpha beta',), ('gamma',), (' beta x',)], 's string')
    rows = _run_native(
        spark, df, 'SELECT a.s WHERE re.search("a.*be", a.s) is not None')
    assert [r[0] for r in rows] == ['alpha beta']
    rows = _run_native(
        spark, df, 'SELECT a.s WHERE re.match("ga", a.s) is not None')
    assert [r[0] for r in rows] == ['gamma']      # match anchors at start
    rows = _run_native(
        spark, df, 'SELECT a.s WHERE re.fullmatch("gamma", a.s) is not None')
    assert [r[0] for r in rows] == ['gamma']
    # truthiness and `is None` views
    rows = _run_native(
        spark, df, 'SELECT a.s WHERE re.search("beta", a.s)')
    assert [r[0] for r in rows] == ['alpha beta', ' beta x']
    rows = _run_native(
        spark, df, 'SELECT a.s WHERE re.search("beta", a.s) is None')
    assert [r[0] for r in rows] == ['gamma']
    # value parity with the Python evaluator on the same query
    import re as _re
    expected = [[s] for s in ['alpha beta', 'gamma', ' beta x']
                if _re.search('a.*be', s) is not None]
    assert _run_native(
        spark, df,
        'SELECT a.s WHERE re.search("a.*be", a.s) is not None') == expected


def test_re_search_unsafe_patterns_fall_back(spark):
    # class escapes (\w unicode-vs-ASCII), named groups, and inline-flag
    # constructs mean different things in Java — they must keep pyeval
    df = spark.createDataFrame([('héllo wörld',), ('x1',)], 's string')
    for pat in [r'\\w+', r'(?P<x>a)', r'(?i)abc']:
        res = query_dataframe(
            spark, 'SELECT a.s WHERE re.search("{}", a.s) is not None'.format(pat), df)
        assert res.telemetry['fallback_count'] == 1, pat
    # and the pyeval answer is Python-correct for the unicode case
    res = query_dataframe(
        spark, r'SELECT a.s WHERE re.search("\w+$", a.s) is not None', df)
    vals = [r[0] for r in res.display_df(ordered=True).collect()]
    assert vals == ['héllo wörld', 'x1']    # Python \w matches ö; Java would not


def test_format_literal_template_native(spark):
    df = spark.createDataFrame([('car', 5), ('dog', 7)], 's string, n long')
    rows = _run_native(spark, df, 'SELECT "{} has {}!".format(a.s, a.n)')
    assert [r[0] for r in rows] == ['car has 5!', 'dog has 7!']
    rows = _run_native(spark, df, 'SELECT "{{{}}}".format(a.s)')
    assert [r[0] for r in rows] == ['{car}', '{dog}']
    # spec'd / indexed placeholders keep the Python evaluator (parity)
    res = query_dataframe(spark, 'SELECT "{0} {0}".format(a.s)', df)
    assert res.telemetry['fallback_count'] == 1
    vals = [r[0] for r in res.display_df(ordered=True).collect()]
    assert vals == ['car car', 'dog dog']


def test_like_uppercase_alias_native(spark):
    df = spark.createDataFrame([('lada',), ('toyota',)], 's string')
    rows = _run_native(spark, df, "SELECT a.s WHERE LIKE(a.s, 'la%')")
    assert [r[0] for r in rows] == ['lada']


def test_null_cell_python_parity_native(spark):
    """Typed inputs carry real NULL cells (2D array / pandas / parquet
    sources); the native fast path must render them the way the
    reference's real-Python evaluator does: str(None)/f'{None}'/
    '{}'.format(None) -> 'None', str(None-bool) -> 'None', and equality
    with a null is a VALUE comparison (False), not SQL three-valued
    logic.  Before round 12 the native path silently emitted NULL where
    the reference emits 'None' (verified against the reference engine)."""
    from rbql_spark import query_table

    tbl = [['x', 1], [None, 2]]
    for q, expected in [
        ("SELECT str(a1)", [['x'], ['None']]),
        ("SELECT f'{a1}!'", [['x!'], ['None!']]),
        ('SELECT "{}!".format(a1)', [['x!'], ['None!']]),
        ("SELECT f'{a1}={a2}'", [['x=1'], ['None=2']]),
        ("SELECT a1 == 'x'", [[True], [False]]),
        ("SELECT a1 != 'x'", [[False], [True]]),
    ]:
        rows, _ = query_table(spark, q, [list(r) for r in tbl])
        assert rows == expected, q
    # bool column with a null: str() renders 'None', not 'False'
    df_rows = [[True], [None], [False]]
    rows, _ = query_table(spark, 'SELECT str(a1)', [list(r) for r in df_rows])
    assert rows == [['True'], ['None'], ['False']]


def test_nu_builtin_select_and_update_parity(spark):
    """NU is the reference's update counter: 0 in SELECT loops
    (rbql_engine.py:744), the 1-based running count of updated records
    (including the current one) in UPDATE loops."""
    from rbql_spark import query_table

    rows, _ = query_table(spark, 'SELECT NU, a1', [['x', 1], ['y', 2]])
    assert rows == [[0, 'x'], [0, 'y']]
    rows, _ = query_table(spark, "UPDATE SET a2 = NU WHERE a1 != 'y'",
                          [['x', 1], ['y', 2], ['z', 3]])
    assert rows == [['x', 1], ['y', 2], ['z', 2]]


def test_out_of_width_none_type_calls_native(spark):
    """len()/int()/float() of an out-of-width field (safe_get None,
    rbql_engine.py:249-250) translate natively: zero-row tables succeed
    with the right output TYPE (the reference runs zero records), any
    real row raises the real-Python TypeError at the right record."""
    import pytest
    from rbql_spark import query_table
    from rbql_spark.api import query_dataframe, _rows_to_handle
    from rbql_spark.errors import RbqlRuntimeError

    # empty input: the reference's 'empty input' corpus case — no
    # evaluator fallback, no error, zero rows
    h = _rows_to_handle(spark, [], None)
    res = query_dataframe(spark,
                          'select NR, a1, len(a3) where int(a1) > 5', h)
    assert res.telemetry['fallback_count'] == 0
    assert res.display_df().count() == 0

    # rows present: real-Python TypeError text, reference record number
    for q, msg in [
        ('select len(a3)', "object of type 'NoneType' has no len()"),
        ('select int(a3)', "int() argument must be a string, a bytes-like "
                           "object or a real number, not 'NoneType'"),
        ('select float(a3)', "float() argument must be a string or a real "
                             "number, not 'NoneType'"),
    ]:
        with pytest.raises(RbqlRuntimeError) as ei:
            query_table(spark, q, [['x', 'y']])
        assert str(ei.value) == 'At record 1, Details: ' + msg
