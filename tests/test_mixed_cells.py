"""Mixed-type columns — the tagged-cell representation (r14 verdict #1).

The reference engines hold per-cell dynamic values; these tests pin the
semantics the representation must reproduce: value round-trips, runtime
type dispatch, host-sorted ORDER BY (both dialects), value-keyed
GROUP BY/JOIN, NumHandler first-value aggregation, heterogeneous UPDATE.
The V8-TimSort equivalence experiment lives in
test_js_sort_matches_v8_timsort (CPython's list.sort is the same TimSort
rbql-js relies on — verified against live node per-case here).
"""

import json
import shutil
import subprocess

import pytest

from rbql_spark import query_table
from rbql_spark.errors import exception_to_error_info
from rbql_spark.mixedcell import (
    MIXED_STRUCT, is_mixed_type, pack_value, unpack_value,
)

NODE = shutil.which('node')


def _err(spark, q, tbl, dialect='python'):
    try:
        query_table(spark, q, [list(r) for r in tbl], dialect=dialect)
        return None
    except Exception as e:
        return exception_to_error_info(e)[1]


def test_pack_unpack_roundtrip():
    for v in (5, -3, 2.5, True, False, 'x', '', None):
        assert unpack_value(pack_value(v) if v is not None else None) == v
        if v is not None:
            u = unpack_value(dict(zip(('s', 'n', 'k'), pack_value(v))))
            assert u == v and type(u) is type(v)
    with pytest.raises(TypeError):
        pack_value([1, 2])


def test_passthrough_preserves_cell_types(spark):
    tbl = [[1, 'b'], [2, 5], [3, 2.5], [4, True], [5, None]]
    rows, _ = query_table(spark, 'SELECT a2', [list(r) for r in tbl])
    got = [r[0] for r in rows]
    assert got == ['b', 5, 2.5, True, None]
    assert [type(v).__name__ for v in got] == \
        ['str', 'int', 'float', 'bool', 'NoneType']


def test_value_semantics_not_string_semantics(spark):
    tbl = [[5], ['5'], [7]]
    rows, _ = query_table(spark, 'SELECT a1 WHERE a1 == 5',
                          [list(r) for r in tbl])
    assert rows == [[5]]                     # int 5 only, not '5'
    rows, _ = query_table(spark, "SELECT a1 WHERE a1 == '5'",
                          [list(r) for r in tbl])
    assert rows == [['5']]
    rows, _ = query_table(spark, 'SELECT DISTINCT a1',
                          [[5], ['5'], [5], ['5']])
    assert rows == [[5], ['5']]              # first-seen order
    # Python value-equality dedup: 5 == 5.0 collapses (first occurrence
    # kept), True == 1 is its own key here (5 != True), '5' stays distinct
    rows, _ = query_table(spark, 'SELECT DISTINCT a1',
                          [[5], [5.0], [True], ['5']])
    assert rows == [[5], [True], ['5']]


def test_string_method_errors_match_reference(spark):
    tbl = [[1, 'b'], [2, 5]]
    m = _err(spark, 'SELECT a2.upper()', tbl)
    assert m == "At record 2, Details: 'int' object has no attribute 'upper'"
    m = _err(spark, 'SELECT a2.toUpperCase()', tbl, dialect='js')
    assert m == 'At record 2, Details: number.toUpperCase is not a function'


def test_order_by_python_typeerror_parity(spark):
    tbl = [[1, 'b'], [2, 5], [3, 'a']]
    m = _err(spark, 'SELECT a1 ORDER BY a2', tbl)
    assert m is not None and 'not supported between instances of' in m
    # runtime-homogeneous after WHERE: sorts fine (the reference only
    # raises when an actual cross-type comparison happens)
    rows, _ = query_table(
        spark, 'SELECT a2 WHERE isinstance(a2, str) ORDER BY a2',
        [list(r) for r in tbl])
    assert rows == [['a'], ['b']]


@pytest.mark.skipif(NODE is None, reason='node unavailable')
def test_js_sort_matches_v8_timsort(spark):
    """JS mixed ORDER BY must reproduce V8's Array#sort outcome with the
    reference's INCONSISTENT stable_compare comparator — checked against
    live node per table."""
    import random
    rnd = random.Random(7)
    script = (
        "function sc(a,b){for(var i=0;i<a.length;i++){if(a[i]!==b[i])"
        "return a[i]<b[i]?-1:1;}}\n"
        "const cases=JSON.parse(require('fs').readFileSync(0,'utf8'));\n"
        "console.log(JSON.stringify(cases.map(ks=>{"
        "const e=ks.map((k,i)=>[k,i+1]);e.sort(sc);return e.map(x=>x[1]);})));")
    words = ['a', 'zz', 'w9', 'alpha', '5x']
    cases = []
    for _ in range(6):
        n = rnd.randint(2, 25)
        cases.append([rnd.choice([rnd.randint(-9, 30), rnd.choice(words)])
                      for _ in range(n)])
    v8 = json.loads(subprocess.run(
        [NODE, '-e', script], input=json.dumps(cases).encode(),
        capture_output=True, check=True).stdout)
    for keys, expect_perm in zip(cases, v8):
        tbl = [[i + 1, k] for i, k in enumerate(keys)]
        rows, _ = query_table(spark, 'SELECT a1 ORDER BY a2',
                              [list(r) for r in tbl], dialect='js')
        assert [r[0] for r in rows] == expect_perm, (keys, rows, expect_perm)


def test_group_by_value_keys(spark):
    # Python: 5 and 5.0 and True==1 collapse; '5' distinct; key output is
    # the FIRST-SEEN value; mixed key set ordering raises like sorted()
    tbl = [[1, 5.0], [2, 5], [3, 1], [4, True]]
    rows, _ = query_table(spark, 'SELECT a2, COUNT(1) GROUP BY a2',
                          [list(r) for r in tbl])
    assert rows == [[1, 2], [5.0, 2]]        # sorted keys; first-seen reps
    m = _err(spark, 'SELECT a2, COUNT(1) GROUP BY a2', [[1, 5], [2, '5']])
    assert m is not None and 'not supported between instances of' in m


def test_numhandler_first_value_aggregation(spark):
    # first value string → parse-all (ints parse, floats truncate via
    # int(), unparseable strings error)
    rows, _ = query_table(spark, 'SELECT MAX(a2)', [[1, '3'], [2, 4.5], [3, 5]])
    assert rows == [[5]]
    rows, _ = query_table(spark, 'SELECT SUM(a2)', [[1, '3'], [2, 4.5], [3, 5]])
    assert rows == [[12]]                    # int('3') + int(4.5) + 5
    # first value numeric → raw accumulation; a later string raises where
    # the comparison touches it, with the exact record number
    m = _err(spark, 'SELECT MAX(a2)', [[1, 3], [2, '4.5'], [3, 5]])
    assert m == ("At record 2, Details: '>' not supported between "
                 "instances of 'str' and 'int'")
    m = _err(spark, 'SELECT SUM(a2)', [[1, 3], [2, 'x']])
    assert m == ("At record 2, Details: unsupported operand type(s) "
                 "for +=: 'int' and 'str'")
    # JS: parse_number coerces everything, Number(null)=0
    rows, _ = query_table(spark, 'SELECT MIN(a1)', [[3], [None], [7]],
                          dialect='js')
    assert rows == [[0]]
    rows, _ = query_table(spark, 'SELECT MAX(a1)', [[3], ['4.5'], [5]],
                          dialect='js')
    assert rows == [[5]]


def test_heterogeneous_update(spark):
    tbl = [[1, 'b'], [2, 5], [3, 'a']]
    rows, _ = query_table(spark, 'UPDATE a1 = a2', [list(r) for r in tbl])
    assert rows == [['b', 'b'], [5, 5], ['a', 'a']]
    # mixed target receiving plain values packs them per cell
    rows, _ = query_table(spark, 'UPDATE a2 = 99 WHERE a1 == 1',
                          [list(r) for r in tbl])
    assert rows == [[1, 99], [2, 5], [3, 'a']]


def test_join_python_value_equality(spark):
    tbl = [[1, 5], [2, 'a'], [3, 2], [4, '2']]
    join = [[5.0, 'five'], ['a', 'letter'], [2, 'two']]
    rows, _ = query_table(spark, 'SELECT a1, b2 JOIN B ON a2 == b1',
                          [list(r) for r in tbl],
                          join_table=[list(r) for r in join])
    # 5 == 5.0 matches; 'a' matches; int 2 matches; '2' does NOT
    assert rows == [[1, 'five'], [2, 'letter'], [3, 'two']]


def test_mixed_struct_detector():
    from pyspark.sql import types as T
    assert is_mixed_type(MIXED_STRUCT)
    other = T.StructType([T.StructField('s', T.StringType()),
                          T.StructField('n', T.DoubleType())])
    assert not is_mixed_type(other)
    assert not is_mixed_type(T.StringType())


# ---------------------------------------------------------------------------
# round 16: driver-surface type fidelity (r15 verdict #1-#4)

def test_update_typed_value_into_string_column(spark):
    # reference safe_set (rbql_engine.py:260-264) assigns the REAL value;
    # pre-r16 this silently stringified through query_table/pandas
    rows, _ = query_table(spark, 'UPDATE a1 = 99 WHERE a2 == "a"',
                          [['x', 'a'], ['y', 'b']])
    assert rows == [[99, 'a'], ['y', 'b']]
    assert type(rows[0][0]) is int and type(rows[1][0]) is str


def test_update_no_where_retypes_wholesale(spark):
    rows, _ = query_table(spark, 'UPDATE a1 = 99', [['x', 'a'], ['y', 'b']])
    assert rows == [[99, 'a'], [99, 'b']]
    assert all(type(r[0]) is int for r in rows)


def test_update_string_into_int_column(spark):
    rows, _ = query_table(spark, 'UPDATE a1 = "z" WHERE a2 == "a"',
                          [[1, 'a'], [2, 'b']])
    assert rows == [['z', 'a'], [2, 'b']]
    assert type(rows[1][0]) is int


def test_update_float_into_int_column_keeps_cell_kinds(spark):
    rows, _ = query_table(spark, 'UPDATE a1 = 1.5 WHERE a2 == "a"',
                          [[1, 'a'], [2, 'b']])
    assert rows == [[1.5, 'a'], [2, 'b']]
    assert type(rows[0][0]) is float and type(rows[1][0]) is int


def test_js_undefined_expression_yields_null_cells(spark):
    # rbql-js writes undefined as null; property misses are legal JS
    rows, _ = query_table(spark, 'SELECT a1.foo', [['x'], ['y']],
                          dialect='js')
    assert rows == [[None], [None]]


def test_js_undefined_mixed_with_values(spark):
    rows, _ = query_table(spark, 'SELECT a1.length',
                          [['x'], [5], ['yz'], [7]], dialect='js')
    assert rows == [[1], [None], [2], [None]]


def test_js_null_property_read_raises_v8_text(spark):
    msg = _err(spark, 'SELECT a1.length', [['x'], [5], ['yz'], [None]],
               dialect='js')
    assert msg == ("At record 4, Details: Cannot read properties of null "
                   "(reading 'length')")


def test_nullable_long_collect_preserves_int(spark):
    # pre-r16 the Arrow/pandas collect degraded nullable long to float
    rows, _ = query_table(spark, 'SELECT None if NR == 1 else a1',
                          [[1], [2]])
    assert rows == [[None], [2]]
    assert type(rows[1][0]) is int


def test_bigint_cells_roundtrip_exactly():
    for v in (2 ** 53 + 1, -(2 ** 53) - 1, 2 ** 63, 10 ** 30):
        cell = pack_value(v)
        assert cell[2] == 5 and unpack_value(dict(zip(('s', 'n', 'k'), cell))) == v
    # boundary: 2^53 itself stays a plain int kind
    assert pack_value(2 ** 53)[2] == 1


def test_bigint_through_query_table(spark):
    big = 2 ** 53 + 1
    rows, _ = query_table(spark, 'SELECT a1', [[big], ['s']])
    assert rows == [[big], ['s']] and type(rows[0][0]) is int


def test_bigint_minmax_returns_exact_value(spark):
    big = 2 ** 53 + 1
    rows, _ = query_table(spark, 'SELECT MAX(a1) AS m', [[big], [5]])
    assert rows == [[big]]


def test_bigint_join_key_matches_exact_only(spark):
    big = 2 ** 53 + 1
    rows, _ = query_table(
        spark, 'SELECT a1, b2 JOIN b ON a1 == b1', [[big], [7]],
        join_table=[[big, 'hit'], [7, 'seven'], ['s', 'str']])
    assert rows == [[big, 'hit'], [7, 'seven']]


def test_bigint_exact_double_equals_float_key(spark):
    # 2^60 is exactly a double: the bigint cell must meet the float key
    # (host semantics: 2**60 == 2.0**60)
    rows, _ = query_table(
        spark, 'SELECT a1, b2 JOIN b ON a1 == b1', [[float(2 ** 60)], [7]],
        join_table=[[2 ** 60, 'hit'], [7, 'seven'], ['s', 'str']])
    assert rows == [[float(2 ** 60), 'hit'], [7, 'seven']]


def test_int_float_mixture_keeps_per_cell_types(spark):
    # reference: [1.5, 7] keeps 7 an int; a double column made it 7.0
    rows, _ = query_table(spark, 'SELECT a1', [[1.5], [7]])
    assert rows == [[1.5], [7]]
    assert type(rows[1][0]) is int
    rows, _ = query_table(spark, 'SELECT a1, COUNT(*) AS c GROUP BY a1',
                          [[1.5], [7], [7.0], [7]])
    assert rows == [[1.5, 1], [7, 3]]


def test_nan_cells_roundtrip_and_render(spark):
    # reference cells hold real float('nan'): str() renders 'nan', the
    # value collects as nan (pre-r16 both degraded to None)
    rows, _ = query_table(spark, 'SELECT a1, str(a1)', [[float('nan')], [9.0]])
    assert rows[0][0] != rows[0][0] and rows[0][1] == 'nan'
    assert rows[1] == [9.0, '9.0']


def test_nan_minmax_first_value_rule(spark):
    # Python's min/max chain: nan wins only from the FIRST slot
    rows, _ = query_table(spark, 'SELECT MAX(a1) AS m', [[float('nan')], [9.0]])
    assert rows[0][0] != rows[0][0]
    rows, _ = query_table(spark, 'SELECT MAX(a1) AS m', [[9.0], [float('nan')]])
    assert rows == [[9.0]]
    rows, _ = query_table(spark, 'SELECT MIN(a1) AS m', [[9.0], [float('nan')], [2.0]])
    assert rows == [[2.0]]


def test_nan_group_keys_stay_distinct(spark):
    # independent float('nan') objects never equal under Python dict keys
    rows, _ = query_table(spark, 'SELECT a1, COUNT(*) AS c GROUP BY a1',
                          [[float('nan')], [float('nan')], [2.0]])
    assert sorted(r[1] for r in rows) == [1, 1, 1]


def test_nan_join_key_matches_nothing(spark):
    rows, _ = query_table(
        spark, 'SELECT a1, b2 LEFT JOIN b ON a1 == b1',
        [[float('nan')], ['x']],
        join_table=[[float('nan'), 'hit'], ['x', 'sx']])
    assert rows[0][1] is None and rows[1][1] == 'sx'


def test_raw_mixed_sum_int_preservation_is_per_group(spark):
    # group 'delta' holds only ints → int sum, even though another
    # group's cells are floats (NumHandler raw path keeps cell kinds)
    rows, _ = query_table(
        spark, 'SELECT a2, SUM(a1) AS s GROUP BY a2',
        [[72, 'delta'], [1.5, 'x'], [2, 'x']])
    by_key = {r[0]: r[1] for r in rows}
    assert by_key['delta'] == 72 and type(by_key['delta']) is int
    assert by_key['x'] == 3.5


def test_unhashable_list_distinct_and_group(spark):
    from rbql_spark.errors import RbqlRuntimeError
    with pytest.raises(RbqlRuntimeError, match=r"At record 1, Details: unhashable type: 'list'"):
        query_table(spark, 'SELECT DISTINCT [a1, a1 + 1]', [[1], [2]])
    with pytest.raises(RbqlRuntimeError, match=r"^unhashable type: 'list'"):
        query_table(spark, 'SELECT DISTINCT [a1] ORDER BY a1', [[1], [2]])
    # WHERE shifts the blamed record to the first SURVIVING input row
    with pytest.raises(RbqlRuntimeError, match=r"At record 2, "):
        query_table(spark, 'SELECT DISTINCT [a1, a1 + 1] WHERE a1 > 1', [[1], [2]])
    # empty result: the writer is never touched — succeeds
    rows, _ = query_table(spark, 'SELECT DISTINCT [a1] WHERE a1 > 99', [[1], [2]])
    assert rows == []


def test_sum_null_operand_word_tracks_accumulator(spark):
    from rbql_spark.errors import RbqlRuntimeError
    # null BEFORE any value: the int-0 initializer is the left operand
    with pytest.raises(RbqlRuntimeError, match=r"\+=: 'int' and 'NoneType'"):
        query_table(spark, 'SELECT SUM(a1)', [[None], [1.5]])
    # null AFTER a float landed: the accumulator drifted to float
    with pytest.raises(RbqlRuntimeError, match=r"\+=: 'float' and 'NoneType'"):
        query_table(spark, 'SELECT SUM(a1)', [[1.5], [None]])


# ---------------------------------------------------------------------------
# round 16b: aggregate accident parity (avg/variance/median nulls, raw-path
# words, cross-group first-failure ordering)

def _agg_err(spark, q, tbl):
    from rbql_spark.errors import RbqlError
    try:
        query_table(spark, q, [list(r) for r in tbl])
        return None
    except Exception as e:
        return str(e)


def test_avg_leading_null_blames_second_row(spark):
    assert _agg_err(spark, 'SELECT AVG(a1) AS v', [[None], [3.5]]) == \
        "At record 2, Details: unsupported operand type(s) for +: 'NoneType' and 'float'"
    assert _agg_err(spark, 'SELECT AVG(a1) AS v', [[None], [None]]) == \
        "At record 2, Details: unsupported operand type(s) for +: 'NoneType' and 'NoneType'"
    assert _agg_err(spark, 'SELECT AVG(a1) AS v', [[None]]) == \
        "float() argument must be a string or a real number, not 'NoneType'"


def test_variance_squares_first_value(spark):
    assert _agg_err(spark, 'SELECT VARIANCE(a1) AS v', [[None], [3.5]]) == \
        "At record 1, Details: unsupported operand type(s) for ** or pow(): 'NoneType' and 'int'"
    assert _agg_err(spark, 'SELECT a2, VARIANCE(a1) GROUP BY a2',
                    [[1.5, 'x'], ['s', 'y'], [3, 'y']]) == \
        "At record 2, Details: unsupported operand type(s) for ** or pow(): 'str' and 'int'"


def test_avg_string_concat_accidents(spark):
    # a leading-str group concatenates until a non-str arrives
    assert _agg_err(spark, 'SELECT a2, AVG(a1) GROUP BY a2',
                    [[1.5, 'x'], ['s', 'y'], [3, 'y']]) == \
        'At record 3, Details: can only concatenate str (not "int") to str'
    # an all-str group (raw path: the global first record is numeric)
    # fails bare in float() at finalize, quoting the concatenation
    assert _agg_err(spark, 'SELECT a2, AVG(a1) GROUP BY a2',
                    [[1.5, 'x'], ['s', 'y'], ['t', 'y']]) == \
        "could not convert string to float: 'st'"


def test_sum_word_is_per_group_accumulator(spark):
    # group 'gamma' sees only the str: its accumulator is still int-0
    assert _agg_err(spark, 'SELECT a2, SUM(a1) GROUP BY a2',
                    [[1.5, 'x'], ['s', 'y'], [3, 'y']]) == \
        "At record 2, Details: unsupported operand type(s) for +=: 'int' and 'str'"


def test_cross_group_failures_blame_first_in_stream(spark):
    # both groups fail; the reference's sequential loop stops at record 3
    assert _agg_err(spark, 'SELECT a2, MAX(a1) GROUP BY a2',
                    [[1.5, 'x'], [2, 'y'], [None, 'y'], [None, 'x']]) == \
        "At record 3, Details: '>' not supported between instances of 'NoneType' and 'int'"


def test_median_null_messages(spark):
    assert _agg_err(spark, 'SELECT MEDIAN(a1) AS m', [[None], [None]]) == \
        "'<' not supported between instances of 'NoneType' and 'NoneType'"
    assert _agg_err(spark, 'SELECT MEDIAN(a1) AS m', [[3.5], [None]]) == \
        "'<' not supported between instances of 'NoneType' and 'float'"


def test_median_odd_count_keeps_middle_int(spark):
    rows, _ = query_table(spark, 'SELECT MEDIAN(a1) AS m', [[1], [3], [9]])
    assert rows == [[3]] and type(rows[0][0]) is int
    rows, _ = query_table(spark, 'SELECT MEDIAN(a1) AS m', [[1], [3]])
    assert rows == [[2.0]] and type(rows[0][0]) is float
    rows, _ = query_table(spark, 'SELECT MEDIAN(a1) AS m', [['5'], ['3'], ['9']])
    assert rows == [[5]] and type(rows[0][0]) is int


def test_bool_aggregates_raw_semantics(spark):
    rows, _ = query_table(spark, 'SELECT MIN(a1) AS m, MAX(a1) AS x, SUM(a1) AS s',
                          [[True], [False], [True]])
    assert rows == [[False, True, 2]]
    assert [type(v) for v in rows[0]] == [bool, bool, int]
