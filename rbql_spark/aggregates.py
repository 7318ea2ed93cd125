"""Aggregate-call detection and Spark aggregation expressions.

The reference detects aggregates at *runtime* via token leakage
(rbql_engine.py:284-290,624-644,863-899); we detect them *statically* from
the select-item AST, which matches the observable corpus behavior including
the ``max``/``min``/``sum`` builtin-vs-aggregator polymorphism
(``mad_max`` etc., rbql_engine.py:902-939): a lowercase call with one scalar
positional argument is an aggregator; with multiple args / an obviously
iterable literal argument it stays the Python builtin.

Spark mapping (all map-side-combinable native aggregates; numeric-coercion
semantics of NumHandler, rbql_engine.py:293-314, reproduced with try_cast +
raise_error):

  COUNT → count(1)      SUM → sum     MIN/MAX → min/max     AVG → avg
  VARIANCE → var_pop    MEDIAN → median (exact)  ANY_VALUE → min_by(val, nr)
  ARRAY_AGG → array_sort(collect_list(struct(nr, val))) → input order
"""

from __future__ import annotations

import ast
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import (
    NUMERIC_CONVERSION_ERROR,
    RbqlParsingError,
    WRONG_AGGREGATION_USAGE_ERROR,
)

_EXPLICIT_AGG_FUNCS = {
    'COUNT': 'count', 'count': 'count', 'Count': 'count',
    'MIN': 'min', 'Min': 'min',
    'MAX': 'max', 'Max': 'max',
    'SUM': 'sum', 'Sum': 'sum',
    'AVG': 'avg', 'avg': 'avg', 'Avg': 'avg',
    'VARIANCE': 'variance', 'variance': 'variance', 'Variance': 'variance',
    'MEDIAN': 'median', 'median': 'median', 'Median': 'median',
    'ANY_VALUE': 'any_value', 'any_value': 'any_value', 'Any_value': 'any_value',
    'ARRAY_AGG': 'array_agg', 'array_agg': 'array_agg',
}
_POLYMORPHIC = {'max': 'max', 'min': 'min', 'sum': 'sum'}
_ITERABLE_LITERALS = (ast.List, ast.Tuple, ast.Set, ast.ListComp, ast.SetComp,
                      ast.GeneratorExp, ast.Dict, ast.DictComp, ast.Starred)
_ITERABLE_PRODUCING_NAMES = {'sorted', 'list', 'set', 'tuple', 'range', 'reversed', 'zip', 'map', 'filter'}


def _looks_iterable(node: ast.expr) -> bool:
    """Static stand-in for the reference's value-type dispatch in mad_max
    (rbql_engine.py:902-939): args that obviously produce an iterable keep
    the Python builtin meaning."""
    if isinstance(node, _ITERABLE_LITERALS):
        return True
    if isinstance(node, ast.Call):
        if isinstance(node.func, ast.Attribute) and node.func.attr == 'split':
            return True
        if isinstance(node.func, ast.Name) and node.func.id in _ITERABLE_PRODUCING_NAMES:
            return True
    return False

NUMERIC_AGGS = {'min', 'max', 'sum', 'avg', 'variance', 'median'}


@dataclass
class AggCall:
    kind: str                  # count/min/max/sum/avg/variance/median/any_value/array_agg
    arg_text: str | None       # inner expression source (None for count)
    post_proc_text: str | None = None  # ARRAY_AGG second arg (lambda source)


def _classify_call(node: ast.Call) -> AggCall | None:
    if not isinstance(node.func, ast.Name) or node.keywords:
        return None
    name = node.func.id
    kind = _EXPLICIT_AGG_FUNCS.get(name) or _POLYMORPHIC.get(name)
    if kind is None:
        return None
    if name in _POLYMORPHIC:
        # lowercase max/min/sum: builtin unless exactly one scalar-looking arg
        if len(node.args) != 1 or _looks_iterable(node.args[0]):
            return None
    if kind == 'array_agg':
        if len(node.args) not in (1, 2):
            return None
        post = ast.unparse(node.args[1]) if len(node.args) == 2 else None
        return AggCall(kind=kind, arg_text=ast.unparse(node.args[0]), post_proc_text=post)
    if len(node.args) != 1:
        return None
    if kind == 'count':
        return AggCall(kind='count', arg_text=None)
    return AggCall(kind=kind, arg_text=ast.unparse(node.args[0]))


def detect_aggregate(item_text: str, dialect: str = 'python') -> AggCall | None:
    """Return the AggCall if the whole select item is one aggregate call.

    An aggregate call *nested* inside a larger expression is a parse error
    (token-leak parity, rbql_engine.py:45-46,638-639,765-766).
    """
    try:
        root = ast.parse(item_text.strip(), mode='eval').body
    except SyntaxError:
        return None
    top: AggCall | None = None
    if isinstance(root, ast.Call):
        top = _classify_call(root)
    # scan for nested (illegal) aggregate usage, skipping the allowed root
    # call and lambda bodies (ARRAY_AGG post-proc)
    for node in ast.walk(root):
        if node is root or not isinstance(node, ast.Call):
            continue
        if top is not None and isinstance(root, ast.Call) and node in ast.walk(root.func):
            continue
        found = _classify_call(node)
        if found is None:
            continue
        if top is not None and top.kind == 'array_agg':
            continue  # inside post-proc lambda — runs on the final list
        from .errors import wrong_aggregation_usage_error
        raise RbqlParsingError(wrong_aggregation_usage_error(dialect))
    return top


def str_parse_fire(scol: Column, dialect: str = 'python') -> Column:
    """The exact condition under which the aggregate string-parse guard
    raises — shared by the guard itself and the first-failure probes so
    they can never disagree (js: Number() semantics, '' is 0, hex parses,
    'NaN' errors; py: int()/float() parse)."""
    if dialect == 'js':
        trimmed = F.trim(scol)
        hexm = trimmed.rlike('^0[xX][0-9a-fA-F]+$')
        casted = (F.when(scol.isNull(), F.lit(None).cast('double'))
                   .when(trimmed == F.lit(''), F.lit(0.0))
                   .when(hexm, F.conv(F.substring(trimmed, 3, 65), 16, 10)
                                .try_cast('double'))
                   .otherwise(trimmed.try_cast('double')))
        return scol.isNotNull() & (casted.isNull() | F.isnan(casted))
    return scol.isNotNull() & scol.try_cast('double').isNull()


def numeric_coerce(col: Column, tag: str, nr: Column | None = None,
                   dialect: str = 'python') -> tuple[Column, str]:
    """NumHandler parity: strings parse to numbers, failure is a hard error
    carrying the record number (main-loop wrap, rbql_engine.py:756-767)."""
    if tag in ('int', 'float', 'null', 'any'):
        return col, tag
    if tag == 'bool':
        return col.cast('double'), 'float'
    def _str_guarded(scol: Column) -> Column:
        if dialect == 'js':
            # rbql-js parse_number = Number(val) with a NaN check
            # (rbql-js/rbql.js:282-289): ''/whitespace → 0, 0x-hex parses,
            # 'NaN' IS NaN → error (same shape as jsdialect _tonum_tcol)
            trimmed = F.trim(scol)
            hexm = trimmed.rlike('^0[xX][0-9a-fA-F]+$')
            casted = (F.when(scol.isNull(), F.lit(None).cast('double'))
                       .when(trimmed == F.lit(''), F.lit(0.0))
                       .when(hexm, F.conv(F.substring(trimmed, 3, 65), 16, 10)
                                    .try_cast('double'))
                       .otherwise(trimmed.try_cast('double')))
        else:
            casted = scol.try_cast('double')
        bad = str_parse_fire(scol, dialect)
        prefix = [F.lit('At record '), nr.cast('string'), F.lit(', Details: ')] if nr is not None else []
        conv_phrase = 'to a number' if dialect == 'js' else 'to int or float'
        err_msg = F.concat(
            *prefix,
            F.lit('Unable to convert value "'), scol,
            F.lit('" {}. MIN, MAX, SUM, AVG, MEDIAN and VARIANCE '
                  'aggregate functions convert their string arguments to '
                  'numeric values'.format(conv_phrase)),
        )
        return F.when(bad, F.raise_error(err_msg)).otherwise(casted)

    if tag == 'str':
        return _str_guarded(col), 'float'
    if tag == 'mixed':
        # tagged-cell column (mixedcell.py): numeric cells pass through
        # (ints/floats/bools are numbers to NumHandler), string cells go
        # through the same parse-or-error guard as a string column
        from .mixedcell import K_STR, norm_n
        k = col.getField('k')
        val = F.when(k == F.lit(K_STR), _str_guarded(col.getField('s'))) \
               .otherwise(norm_n(col))
        # a null CELL must stay null (null_arg_guard handles reference
        # None-in-aggregate error parity above this)
        return F.when(col.isNull(), F.lit(None).cast('double')).otherwise(val), 'float'
    raise RbqlParsingError(NUMERIC_CONVERSION_ERROR.format('<' + tag + '>'))


def null_arg_guard(kind: str, raw: Column, coerced: Column, tag: str,
                   nr_err: Column) -> Column:
    """Reference parity for NULL aggregate inputs (round-12): the
    reference's aggregators run real Python, so a None cell is a
    RUNTIME ERROR, not a SQL skip — SumAggregator's ``0 += None`` and
    Avg/Variance's ``cur_sum + None`` raise at the offending record,
    and a string column's NumHandler raises inside ``int(None)`` /
    ``float(None)`` (rbql_engine.py:293-314,363-407).  This wraps the
    aggregated argument for the ORDER-INDEPENDENT kinds (sum/avg/
    variance always error when any null exists; string columns error in
    parse for all six kinds) so the error fires inside the aggregation
    scan.  MIN/MAX/MEDIAN on non-string columns are order-dependent
    (None doubles as the reference's "unset" sentinel) and are handled
    group-level in the engine (null_group_guards).

    Message text is the reference's for the common shapes; the operand
    TYPE word comes from the column tag ('int' unless the tag is
    float), which matches except when a float column's very first
    record is the null (the reference's int-0 initializer wins there).
    Further message-text-only divergences (outcome parity fuzz-pinned;
    round-12 advisory): when a group's FIRST value is the None,
    the reference's Avg/Variance store it silently and raise at the
    NEXT record with reversed operands ("'NoneType' and 'float'") — or
    at finalize (a float(None) message) for a lone trailing-null group —
    while this guard raises at the null record with "'<t>' and
    'NoneType'"; MEDIAN's all-null multi-row group reports
    "'NoneType' and '<t>'" where the reference says "'NoneType' and
    'NoneType'".  The differential fuzz asserts outcome + NoneType
    marker only, by design.
    """
    t = 'float' if tag == 'float' else 'int'
    if tag in ('str', 'mixed'):
        fn = ('int() argument must be a string, a bytes-like object or a '
              'real number' if kind == 'sum'
              else 'float() argument must be a string or a real number')
        msg = F.concat(F.lit('At record '), nr_err.cast('string'),
                       F.lit(', Details: {}, not '.format(fn)),
                       F.lit("'NoneType'"))
        return F.when(raw.isNull(), F.raise_error(msg)).otherwise(coerced)
    if kind == 'sum':
        msg = F.concat(F.lit('At record '), nr_err.cast('string'),
                       F.lit(", Details: unsupported operand type(s) for "
                             "+=: '{}' and 'NoneType'".format(t)))
        return F.when(raw.isNull(), F.raise_error(msg)).otherwise(coerced)
    if kind in ('avg', 'variance'):
        msg = F.concat(F.lit('At record '), nr_err.cast('string'),
                       F.lit(", Details: unsupported operand type(s) for "
                             "+: '{}' and 'NoneType'".format(t)))
        return F.when(raw.isNull(), F.raise_error(msg)).otherwise(coerced)
    return coerced


def null_group_guards(kind: str, raw: Column, nr: Column, rec_of,
                      prefix: str,
                      shared_names: tuple | None = None,
                      with_marker: bool = False,
                      word_col: Column | None = None) -> tuple[list[Column], object]:
    """Group-level null guards for the ORDER-DEPENDENT aggregate kinds.

    MIN/MAX (reference rbql_engine.py:329-360): ``None`` is the
    aggregator's unset sentinel, so nulls BEFORE the group's first
    non-null are silently ignored, while a null arriving AFTER any
    non-null hits ``min(cur, None)`` and raises.  MEDIAN collects and
    sorts at finalize: a single-null group returns None (nothing to
    compare), any group mixing a null with another value raises in the
    sort, with no record prefix.

    Returns (guard agg expressions, wrap) where wrap(out, tag) rewrites
    the aggregate's output column to raise when the guard condition
    holds.  The error record is exact when the offending null follows
    the group's first non-null directly in NR order; for
    null-both-before-and-after patterns the reported record is the
    group's last null (the condition itself stays exact).
    """
    # order comparisons use the RAW nr (the order surrogate is globally
    # order-faithful); the human-readable record number is recovered
    # from the stored ordinal via rec_of — nr_err is a pure function of
    # nr, so no extra min_by/max_by buffers are needed (they measured
    # ~30% on the group-agg bench gate)
    if shared_names is not None:
        # another aggregate over the SAME argument column already emitted
        # the buffers — reuse them (MIN+MAX+MEDIAN of one column would
        # otherwise triple the guard cost)
        g_null_min, g_null_max, g_nn_min, g_cnt = shared_names
        aggs: list[Column] = []
    else:
        g_null_min = '{}_nl'.format(prefix)
        g_null_max = '{}_nh'.format(prefix)
        g_nn_min = '{}_fv'.format(prefix)
        g_cnt = '{}_ct'.format(prefix)
        null_ord = F.when(raw.isNull(), nr)
        aggs = [
            F.min(null_ord).alias(g_null_min),
            F.max(null_ord).alias(g_null_max),
            F.min(F.when(raw.isNotNull(), nr)).alias(g_nn_min),
            F.count(F.lit(1)).alias(g_cnt),
        ]
    g_word = None
    if word_col is not None:
        # per-group word for the non-None operand of the TypeError: the
        # group's first value's runtime kind (raw-path mixed columns mix
        # kinds; approximation only under mid-group int→float drift)
        g_word = '{}_wd'.format(prefix)
        aggs.append(F.min_by(F.when(raw.isNotNull(), word_col),
                             F.when(raw.isNotNull(), nr)).alias(g_word))

    def wrap(out: Column, tag: str) -> Column:
        t = {'float': 'float', 'bool': 'bool'}.get(tag, 'int')
        word = F.coalesce(F.col(g_word), F.lit(t)) if g_word is not None \
            else F.lit(t)
        if tag in ('str', 'mixed'):
            # string column: NumHandler raises inside int()/float() at
            # the first null — order-independent once any non-null
            # string exists; an ALL-null group never engaged the parser
            # (the reference's first-value string detection saw None)
            # and returns None.  Documented approximation: the
            # reference's string detection is GLOBAL (one NumHandler per
            # aggregator across all groups), so an all-null group in a
            # table whose other groups hold strings would raise there;
            # this guard tests per group — replicating the global rule
            # would need a cross-group aggregation pass for an
            # accident-of-implementation edge.
            fn = ('int() argument must be a string, a bytes-like object '
                  'or a real number' if kind in ('min', 'max')
                  else 'float() argument must be a string or a real '
                       'number')
            cond = (F.col(g_null_min).isNotNull()
                    & F.col(g_nn_min).isNotNull())
            msg = F.concat(F.lit('At record '),
                           rec_of(F.col(g_null_min)).cast('string'),
                           F.lit(', Details: {}, not '.format(fn)),
                           F.lit("'NoneType'"))
            return F.when(cond, F.raise_error(msg)).otherwise(out)
        if kind == 'sum':
            # the reference's SumAggregator starts at int 0 and raises at
            # the group's FIRST null; the operand word is the running
            # accumulator's type THERE — still 'int' when no value
            # preceded the null in the group, else the column's kind
            cond = F.col(g_null_min).isNotNull()
            word = F.when(F.col(g_nn_min).isNull()
                          | (F.col(g_null_min) < F.col(g_nn_min)),
                          F.lit('int')).otherwise(F.lit(t))
            parts = [F.lit('At record '),
                     rec_of(F.col(g_null_min)).cast('string'),
                     F.lit(", Details: unsupported operand type(s) "
                           "for +=: '"), word,
                     F.lit("' and 'NoneType'")]
            if with_marker:
                # non-dense NR: ride the raw order surrogate so the
                # driver-side resolver recovers the exact input record
                parts += [F.lit('\n__RBQL_SURR_'),
                          F.col(g_null_min).cast('string'), F.lit('__')]
            msg = F.concat(*parts)
            return F.when(cond, F.raise_error(msg)).otherwise(out)
        if kind == 'median':
            # list.sort compares NoneType-vs-t or t-vs-NoneType depending
            # on which sorts first — null-first groups report the
            # reversed operand order, exactly like the reference
            cond = F.col(g_null_min).isNotNull() & (F.col(g_cnt) > 1)
            msg = F.when(
                F.col(g_nn_min).isNull() | (F.col(g_null_min) < F.col(g_nn_min)),
                F.lit("'<' not supported between instances of "
                      "'{}' and 'NoneType'".format(t))
            ).otherwise(
                F.lit("'<' not supported between instances of "
                      "'NoneType' and '{}'".format(t)))
            return F.when(cond, F.raise_error(msg)).otherwise(out)
        op = '<' if kind == 'min' else '>'
        cond = (F.col(g_null_max).isNotNull()
                & F.col(g_nn_min).isNotNull()
                & (F.col(g_null_max) > F.col(g_nn_min)))
        raw_rec = F.when(F.col(g_null_min) > F.col(g_nn_min),
                         F.col(g_null_min)).otherwise(F.col(g_null_max))
        parts = [F.lit('At record '), rec_of(raw_rec).cast('string'),
                 F.lit(", Details: '{}' not supported between "
                       "instances of 'NoneType' and '".format(op)),
                 word, F.lit("'")]
        if with_marker:
            # non-dense NR: ride the raw order surrogate so the
            # driver-side resolver recovers the exact input record
            parts += [F.lit('\n__RBQL_SURR_'), raw_rec.cast('string'),
                      F.lit('__')]
        msg = F.concat(*parts)
        return F.when(cond, F.raise_error(msg)).otherwise(out)

    wrap.guard_names = (g_null_min, g_null_max, g_nn_min, g_cnt)
    return aggs, wrap


def mixed_raw_guard(kind: str, col: Column, nr_err: Column,
                    first_kind_name: str) -> Column:
    """Raw-accumulation path for a MIXED aggregate argument whose FIRST
    value was NOT a string (NumHandler.parse, rbql_engine.py:293-314:
    string detection looks only at the first value — a non-str first
    value disables parsing forever, so later values accumulate RAW and
    a string cell raises the Python TypeError where the reference's
    min()/max()/+= touches it).

    For the ORDER-INDEPENDENT kinds (sum/avg/variance) ANY string cell
    errors; this wraps the numeric argument with that guard.  The error
    text reproduces the reference's shape with the operand type taken
    from the first value's kind (approximation documented in README —
    the running accumulator's exact type can drift int→float mid-group).
    """
    from .mixedcell import K_STR, norm_n
    k = col.getField('k')
    if kind == 'sum':
        msg_body = "unsupported operand type(s) for +=: '{}' and 'str'".format(
            first_kind_name)
    else:
        msg_body = "unsupported operand type(s) for +: '{}' and 'str'".format(
            first_kind_name)
    msg = F.concat(F.lit('At record '), nr_err.cast('string'),
                   F.lit(', Details: ' + msg_body))
    return F.when(col.isNotNull() & (k == F.lit(K_STR)), F.raise_error(msg)) \
            .otherwise(norm_n(col))


def mixed_minmax_exprs(kind: str, col: Column, nr: Column,
                       guard_prefix: str):
    """MIN/MAX/MEDIAN over a raw-path mixed argument: the reference
    compares raw Python values per group — a group mixing strings with
    numbers raises at the first cross-kind comparison; a pure-string
    MIN/MAX group returns the lexicographic extremum; a numeric group
    the numeric one (kind taken from the winning row).  Returns
    (agg expressions, finalize(rec_of) -> Column yielding a MIXED
    struct result).  Error-text approximation (README): the numeric
    operand type prints 'int' even when the running accumulator had
    drifted to float."""
    from .mixedcell import MIXED_STRUCT, K_FLOAT, K_INT, K_STR, norm_n
    k = col.getField('k')
    n_field = norm_n(col)
    is_str = col.isNotNull() & (k == F.lit(K_STR))
    is_num = col.isNotNull() & (k != F.lit(K_STR))
    # Python's min/max chain never lets nan win a comparison: the result
    # is nan IFF the group's FIRST value is nan, and later nans are
    # ignored — exclude them from the extremum, flag the first value
    is_nan = F.coalesce(F.isnan(n_field), F.lit(False))
    clean_num = is_num & ~is_nan
    p = guard_prefix
    sfn = F.min if kind == 'min' else F.max
    sort_sign = F.lit(1 if kind == 'min' else -1)
    aggs = [
        F.sum(is_str.cast('long')).alias(p + '_ns'),
        F.sum(is_num.cast('long')).alias(p + '_nn'),
        F.min_by(is_str, F.when(col.isNotNull(), nr)).alias(p + '_f'),
        sfn(F.when(is_str, col.getField('s'))).alias(p + '_sv'),
        (F.min if kind != 'max' else F.max)(
            F.when(clean_num, n_field)).alias(p + '_nv'),
        F.min_by(F.when(is_num, is_nan),
                 F.when(is_num, nr)).alias(p + '_fnan'),
        # one min_by for (kind, exact text) so a tie cannot split them:
        # text is non-null only for bigint cells, whose double is rounded
        F.min_by(F.when(clean_num, F.struct(k.alias('wk'),
                                            col.getField('s').alias('ws'))),
                 F.when(clean_num, sort_sign * n_field)).alias(p + '_nw'),
        F.min(F.when(is_str, nr)).alias(p + '_snr'),
        F.min(F.when(is_num, nr)).alias(p + '_nnr'),
        # first numeric row's kind — the real operand word of a cross-kind
        # TypeError ('float' when the first number is a float, not a
        # hardcoded 'int'); bigints print 'int' like the reference's ints
        F.min_by(F.when(is_num, k), F.when(is_num, nr)).alias(p + '_fnk'),
    ]
    op = '<' if kind in ('min', 'median') else '>'

    def _kind_word(kcol: Column) -> Column:
        from .mixedcell import K_BOOL as _KB, K_FLOAT as _KF
        return (F.when(kcol == F.lit(_KF), F.lit('float'))
                 .when(kcol == F.lit(_KB), F.lit('bool'))
                 .otherwise(F.lit('int')))

    def finalize(rec_of, with_marker: bool = False) -> Column:
        mixed_group = (F.col(p + '_ns') > 0) & (F.col(p + '_nn') > 0)
        # the failing comparison happens at the first MINORITY-kind row
        # (the reference's running value carries the first row's kind);
        # the numeric operand word is the first numeric row's kind — an
        # approximation only when the accumulator drifts int→float
        # between that row and the cross-kind comparison (README)
        cross = F.when(F.col(p + '_f'), F.col(p + '_nnr')) \
                 .otherwise(F.col(p + '_snr'))
        num_word = _kind_word(F.col(p + '_fnk'))
        parts = [
            F.lit('At record '), rec_of(cross).cast('string'),
            F.lit(", Details: '{}' not supported between instances of '".format(op)),
            F.when(F.col(p + '_f'), num_word).otherwise(F.lit('str')),
            F.lit("' and '"),
            F.when(F.col(p + '_f'), F.lit('str')).otherwise(num_word),
            F.lit("'")]
        if with_marker:
            # non-dense NR: ride the raw order surrogate on a marker line
            # so the driver-side resolver recovers the exact input record
            parts += [F.lit('\n__RBQL_SURR_'), cross.cast('string'),
                      F.lit('__')]
        msg = F.concat(*parts)
        str_res = F.struct(F.col(p + '_sv').alias('s'),
                           F.lit(None).cast('double').alias('n'),
                           F.lit(K_STR).cast('byte').alias('k'))
        first_nan = F.coalesce(F.col(p + '_fnan'), F.lit(False))
        num_res = F.struct(
            F.when(first_nan, F.lit(None).cast('string'))
             .otherwise(F.col(p + '_nw').getField('ws')).alias('s'),
            F.when(first_nan, F.lit(float('nan')))
             .otherwise(F.col(p + '_nv')).alias('n'),
            F.when(first_nan, F.lit(K_FLOAT))
             .otherwise(F.coalesce(F.col(p + '_nw').getField('wk'),
                                   F.lit(K_INT))).cast('byte').alias('k'))
        return (F.when(mixed_group, F.raise_error(msg).cast(MIXED_STRUCT))
                 .when(F.col(p + '_ns') > 0, str_res)
                 .when(F.col(p + '_nn') > 0, num_res)
                 .otherwise(F.lit(None).cast(MIXED_STRUCT)))
    return aggs, finalize


def spark_agg_expr(kind: str, arg: Column | None, nr: Column, out_name: str) -> Column:
    if kind == 'count':
        return F.count(F.lit(1)).alias(out_name)
    if kind == 'sum':
        return F.sum(arg).alias(out_name)
    if kind == 'min':
        return F.min(arg).alias(out_name)
    if kind == 'max':
        return F.max(arg).alias(out_name)
    if kind == 'avg':
        return F.avg(arg).alias(out_name)
    if kind == 'variance':
        return F.var_pop(arg).alias(out_name)
    if kind == 'median':
        return F.median(arg).alias(out_name)
    if kind == 'any_value':
        return F.min_by(arg, nr).alias(out_name)
    if kind == 'array_agg':
        collected = F.collect_list(F.struct(nr.alias('n'), arg.alias('v')))
        return F.transform(F.array_sort(collected), lambda s: s['v']).alias(out_name)
    raise AssertionError(kind)
