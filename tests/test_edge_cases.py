"""Robustness edge cases: empty inputs, all-null columns, single rows,
unicode, and empty results through every operator path."""

import pytest

from rbql_spark import query_table


def test_empty_input_select(spark):
    rows, header = query_table(spark, 'SELECT a1, a2', [])
    assert rows == []


def test_empty_input_aggregate_emits_nothing(spark):
    rows, _ = query_table(spark, 'SELECT COUNT(1), SUM(a1)', [])
    assert rows == []


def test_empty_input_group_by(spark):
    rows, _ = query_table(spark, 'SELECT a1, COUNT(1) GROUP BY a1', [])
    assert rows == []


def test_empty_input_order_top(spark):
    rows, _ = query_table(spark, 'SELECT TOP 5 a1 ORDER BY a1', [])
    assert rows == []


def test_filter_to_empty(spark):
    rows, _ = query_table(spark, "SELECT a1 WHERE a1 == 'nope'", [['x'], ['y']])
    assert rows == []


def test_single_row_everything(spark):
    rows, _ = query_table(
        spark, "SELECT DISTINCT a1, len(a1), a1.upper() ORDER BY a1", [['solo']])
    assert rows == [['solo', 4, 'SOLO']]


def test_all_null_column(spark):
    rows, _ = query_table(spark, 'SELECT a2, a2 is None', [['x', None], ['y', None]])
    assert rows == [[None, True], [None, True]]


def test_unicode_values_and_sort(spark):
    rows, _ = query_table(spark, 'SELECT a1 ORDER BY a1',
                          [['яблоко'], ['ананас'], ['ésime'], ['zèbre']])
    assert rows == [[x] for x in sorted(['яблоко', 'ананас', 'ésime', 'zèbre'])]


def test_empty_string_vs_null_distinction(spark):
    # Python value semantics: None == '' is False (not SQL null)
    rows, _ = query_table(spark, "SELECT a1 == '', a1 is None", [[''], [None]])
    assert rows == [[True, False], [False, True]]


def test_whitespace_only_fields(spark):
    rows, _ = query_table(spark, "SELECT a1.strip(), len(a1)", [['   '], ['\t x ']])
    assert rows == [['', 3], ['x', 4]]


def test_very_wide_select_list(spark):
    n = 60
    query = 'SELECT ' + ', '.join('a1 + {}'.format(i) for i in range(n))
    rows, _ = query_table(spark, query, [[1], [2]])
    assert rows[0] == [1 + i for i in range(n)]
    assert rows[1] == [2 + i for i in range(n)]


def test_deep_pipe_chain(spark):
    q = ('SELECT a1, a2 WHERE a2 > 0'
         ' | SELECT a1, a2 * 2 AS d'
         ' | SELECT a1, a.d WHERE a.d > 4'
         ' | SELECT DISTINCT a1')
    rows, _ = query_table(spark, q, [['x', 1], ['y', 3], ['y', 5]],
                          input_column_names=['k', 'v'])
    assert rows == [['y']]


def test_join_empty_a_side(spark):
    rows, _ = query_table(spark, 'SELECT a1, b2 INNER JOIN b ON a1 == b1',
                          [], join_table=[['k', 'v']])
    assert rows == []


def test_zero_in_arithmetic(spark):
    rows, _ = query_table(spark, 'SELECT a1 * 0, a1 - a1, a1 // 1', [[7]])
    assert rows == [[0, 0, 7]]


def test_negative_numbers_and_mod(spark):
    # Python % sign-of-divisor semantics
    rows, _ = query_table(spark, 'SELECT a1 % 3, a1 % -3, a1 // 3', [[-7]])
    assert rows == [[-7 % 3, -7 % -3, -7 // 3]]


# -- ADVICE r1: sample-based type inference must not silently mangle values --

def test_coercer_raises_on_lossy_mismatch():
    import pyspark.sql.types as T
    from rbql_spark.pyeval import _coercer
    with pytest.raises(TypeError, match='inferred from a sample'):
        _coercer(T.LongType())(3.7)
    with pytest.raises(TypeError):
        _coercer(T.LongType())(True)   # would print '1' instead of 'True'
    with pytest.raises(TypeError):
        _coercer(T.StringType())([1, 2])  # writer joins lists; str() would not
    assert _coercer(T.LongType())(3) == 3
    assert _coercer(T.DoubleType())(3) == 3.0
    assert _coercer(T.StringType())(3.5) == '3.5'
    assert _coercer(T.StringType())(True) == 'True'


def test_infer_mixed_scalars_use_tagged_struct():
    # r15: mixed scalar kinds carry the tagged-cell struct (mixedcell.py)
    # instead of stringifying — each cell keeps its runtime type
    import pyspark.sql.types as T

    from rbql_spark.mixedcell import is_mixed_type
    from rbql_spark.pyeval import _infer_spark_type
    assert is_mixed_type(_infer_spark_type([1, True]))
    assert is_mixed_type(_infer_spark_type([1, 'x']))
    assert is_mixed_type(_infer_spark_type([2.5, 'x', False]))
    assert isinstance(_infer_spark_type([1, 2]), T.LongType)
    # r16: int+float mixtures also keep per-cell types (the reference's
    # 7 stays int next to 1.5 — a double column degraded it to 7.0)
    assert is_mixed_type(_infer_spark_type([1, 2.5]))
    assert isinstance(_infer_spark_type([2.5, 3.5]), T.DoubleType)
    assert isinstance(_infer_spark_type(['a', 'b']), T.StringType)


def test_fallback_type_drift_raises_not_truncates(spark):
    # rows beyond the 64-row inference sample that produce a float in an
    # int-inferred column must error loudly, not be int()-truncated
    from rbql_spark import query_dataframe
    from rbql_spark.api import collect_result_rows
    from rbql_spark.errors import RbqlRuntimeError
    df = spark.createDataFrame([(i,) for i in range(2000)], 'n long').coalesce(1)
    res = query_dataframe(
        spark, 'SELECT a.n.bit_length() if a.n != 1995 else 3.7', df)
    with pytest.raises(RbqlRuntimeError, match='inferred from a sample'):
        collect_result_rows(res)


def test_boolop_value_mixed_int_float_keeps_operand_type(spark):
    # `a1 or 0.5` returns the winning OPERAND with its own type (int 7),
    # not a merged double (7.0) — int/float-mixed and/or falls back to the
    # Python evaluator for value parity
    rows, _ = query_table(spark, 'SELECT a1 or 0.5', [[7], [0]])
    assert rows == [[7], [0.5]]
    rows, _ = query_table(spark, 'SELECT a1 and 0.5', [[7], [0]])
    assert rows == [[0.5], [0]]


def test_string_coercer_accepts_numpy_float32():
    import numpy as np
    from pyspark.sql import types as T

    from rbql_spark.pyeval import _coercer
    c = _coercer(T.StringType())
    # numpy scalars stringify through the Python-float repr (the reference
    # engine only ever holds Python floats)
    assert c(np.float32(1.5)) == '1.5'
    assert c(np.float64(2.25)) == '2.25'
    assert c(np.int32(7)) == '7'


def test_pipeline_ops_tolerate_null_text(spark):
    # real corpora carry null documents; none of the round-6 ops may crash
    from pyspark.sql import functions as F

    from rbql_spark.ops.dedup import dedup_lines
    from rbql_spark.ops.sampling import chunk_documents
    from rbql_spark.ops.textstats import (
        lm_score, quality_filter, repetition_stats,
    )
    df = spark.createDataFrame(
        [(1, 'the cat sat on the mat'), (2, None), (3, '')],
        'doc_id long, text string')

    rep = {r['doc_id']: r for r in repetition_stats(df).collect()}
    assert set(rep) == {1, 2, 3}
    assert rep[2]['dup_word_frac'] == 0.0 and rep[2]['top_ngram_count'] == 0

    qf = {r['doc_id']: r for r in quality_filter(
        df, min_words=2, mean_word_len_range=(2, 12)).collect()}
    assert set(qf) == {1, 2, 3}
    assert qf[1]['keep'] and not qf[3]['keep']

    # null/empty docs have no tokens: they emit no chunks and no LM rows
    ch = {r['doc_id'] for r in chunk_documents(df, chunk_size=4, overlap=1).collect()}
    assert ch == {1}
    lm = {r['doc_id'] for r in lm_score(df).collect()}
    assert lm == {1}

    # null text splits to no lines -> doc drops from the rebuild (empty
    # text keeps its single empty line)
    dl = {r['doc_id']: r for r in dedup_lines(df, min_count=2).collect()}
    assert dl[1]['clean_text'] == 'the cat sat on the mat'
    assert dl[3]['n_lines'] == 1 and dl[3]['n_removed'] == 0
