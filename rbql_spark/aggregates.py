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

    As of round 16 this arg-level guard serves only the parse paths
    (str/mixed-parse tags); plain and raw-mixed sum/avg/variance route
    through null_group_guards, which reproduces the reference's
    accumulator accidents (Avg's second-row reversed operands,
    Variance's ** message, Sum's running-accumulator word, Median's
    sort-order operand words incl. all-null groups) exactly.
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
        g_null_min, g_null_max, g_nn_min, g_cnt, g_nnl = shared_names
        aggs: list[Column] = []
    else:
        g_null_min = '{}_nl'.format(prefix)
        g_null_max = '{}_nh'.format(prefix)
        g_nn_min = '{}_fv'.format(prefix)
        g_cnt = '{}_ct'.format(prefix)
        g_nnl = '{}_nc'.format(prefix)
        null_ord = F.when(raw.isNull(), nr)
        aggs = [
            F.min(null_ord).alias(g_null_min),
            F.max(null_ord).alias(g_null_max),
            F.min(F.when(raw.isNotNull(), nr)).alias(g_nn_min),
            F.count(F.lit(1)).alias(g_cnt),
            F.sum(raw.isNull().cast('long')).alias(g_nnl),
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
            # the int-0 initializer absorbs bools/ints; only floats
            # drift the accumulator
            acc = F.when(word == F.lit('float'), F.lit('float')) \
                   .otherwise(F.lit('int'))
            word = F.when(F.col(g_nn_min).isNull()
                          | (F.col(g_null_min) < F.col(g_nn_min)),
                          F.lit('int')).otherwise(acc)
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
        if kind in ('avg', 'variance'):
            # Avg stores the FIRST value raw (even None) and fails on
            # the addition at the SECOND row; Variance squares the first
            # value immediately, so a null-first group fails right there
            # with the ** message (rbql_engine.py:376-409)
            def _with_rec(raw_rec: Column, body: Column) -> Column:
                parts = [F.lit('At record '),
                         rec_of(raw_rec).cast('string'),
                         F.lit(', Details: unsupported operand type(s) '
                               'for '), body]
                if with_marker:
                    parts += [F.lit('\n__RBQL_SURR_'),
                              raw_rec.cast('string'), F.lit('__')]
                return F.concat(*parts)
            null_first = F.col(g_nn_min).isNull() | \
                (F.col(g_null_min) < F.col(g_nn_min))
            cond = F.col(g_null_min).isNotNull()
            if kind == 'variance':
                msg = F.when(
                    null_first,
                    _with_rec(F.col(g_null_min),
                              F.lit("** or pow(): 'NoneType' and 'int'"))
                ).otherwise(
                    _with_rec(F.col(g_null_min),
                              F.concat(F.lit("+: '"), word,
                                       F.lit("' and 'NoneType'"))))
                return F.when(cond, F.raise_error(msg)).otherwise(out)
            # avg
            lone = null_first & (F.col(g_cnt) == 1)
            # null-first with ≥2 rows: the failure is at the group's
            # SECOND row — exact when it is the first value (one null)
            # or the last null (two-null prefix); ≥3 leading nulls blame
            # a later null (README residual).  The second-null candidate
            # exists only when the group holds ≥2 nulls (the first null
            # IS the leading row here).
            cand_null = F.when(F.col(g_nnl) >= 2, F.col(g_null_max))
            rec2 = F.when(cand_null.isNull(), F.col(g_nn_min)) \
                    .when(F.col(g_nn_min).isNull(), cand_null) \
                    .otherwise(F.least(F.col(g_nn_min), cand_null))
            word2 = F.when(rec2 == F.col(g_nn_min), word) \
                     .otherwise(F.lit('NoneType'))
            msg = F.when(
                ~null_first,
                _with_rec(F.col(g_null_min),
                          F.concat(F.lit("+: '"), word,
                                   F.lit("' and 'NoneType'")))
            ).otherwise(
                _with_rec(rec2,
                          F.concat(F.lit("+: 'NoneType' and '"), word2,
                                   F.lit("'"))))
            lone_msg = F.lit('float() argument must be a string or a '
                             "real number, not 'NoneType'")
            return (F.when(lone, F.raise_error(lone_msg))
                     .when(cond, F.raise_error(msg)).otherwise(out))
        if kind == 'median':
            # list.sort compares NoneType-vs-t or t-vs-NoneType depending
            # on which sorts first — null-first groups report the
            # reversed operand order, exactly like the reference; an
            # all-null multi-row group compares None to None
            vword = F.when(F.col(g_nn_min).isNull(), F.lit('NoneType')) \
                     .otherwise(word)
            cond = F.col(g_null_min).isNotNull() & (F.col(g_cnt) > 1)
            msg = F.when(
                F.col(g_nn_min).isNull() | (F.col(g_null_min) < F.col(g_nn_min)),
                F.concat(F.lit("'<' not supported between instances of '"),
                         vword, F.lit("' and 'NoneType'"))
            ).otherwise(
                F.concat(F.lit("'<' not supported between instances of "
                               "'NoneType' and '"), vword, F.lit("'")))
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

    wrap.guard_names = (g_null_min, g_null_max, g_nn_min, g_cnt, g_nnl)
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


def reference_agg_failure_probe(df, key_cols, argcol, kind, tag,
                                nr_col, dialect='python'):
    """ERROR-PATH first-failure probe: one window job simulating the
    reference's sequential aggregator per group (NumHandler raw path,
    rbql_engine.py:293-428) and returning ``(order surrogate of the
    GLOBALLY-first failing record, its exact Details text)`` — or None
    when no record-level failure exists (bare finalize failures keep
    the in-plan guard's text).  Registered on StageResult's resolver
    (engine._make_surrogate_resolver), so the job runs ONLY after an
    error actually surfaced; the in-plan group guards stay the RAISERS
    while this fixes per-group positional words, avg's second-row
    blame, and the cross-group first-in-stream ordering that finalize
    raises cannot see.

    Known approximation (README): the running extremum/accumulator word
    uses the group's first value's kind; int→float drift mid-group
    before the failing row prints the first kind.  Mixed GROUP BY keys
    partition by the raw canon here, not host equality — groups that
    host-collapse (5 vs 5.0) may split, which can only make the probe
    miss a failure (guard text then stands), never invent one."""
    if dialect == 'js' or kind not in ('sum', 'avg', 'variance',
                                      'min', 'max'):
        return None
    keys = list(key_cols or [])

    def probe():
        from pyspark.sql import Window
        raw = F.col(argcol)
        if tag == 'mixed':
            from .mixedcell import K_BOOL, K_FLOAT, K_STR
            kf = raw.getField('k')
            kw_expr = (F.when(raw.isNull(), F.lit('NoneType'))
                        .when(kf == F.lit(K_STR), F.lit('str'))
                        .when(kf == F.lit(K_FLOAT), F.lit('float'))
                        .when(kf == F.lit(K_BOOL), F.lit('bool'))
                        .otherwise(F.lit('int')))
        elif tag in ('int', 'float', 'bool'):
            kw_expr = F.when(raw.isNull(), F.lit('NoneType')) \
                       .otherwise(F.lit(tag))
        else:
            return None
        gsel = ([F.col(c).alias('__g{}'.format(i))
                 for i, c in enumerate(keys)]
                or [F.lit(1).alias('__g0')])
        sel = df.select(*gsel, F.col(nr_col).alias('__pnr'),
                        kw_expr.alias('__kw'))
        gcols = ['__g{}'.format(i) for i in range(max(len(keys), 1))]
        w = Window.partitionBy(*gcols).orderBy('__pnr')
        before = w.rowsBetween(Window.unboundedPreceding, -1)
        kwc = F.col('__kw')
        is_val = kwc != F.lit('NoneType')
        rn = F.row_number().over(w)
        first_kw = F.first(kwc).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        first_val_kw = F.first(F.when(is_val, kwc), ignorenulls=True) \
                        .over(before)
        vals_before = F.count(F.when(is_val, F.lit(1))).over(before)
        floats_before = F.count(F.when(kwc == F.lit('float'), F.lit(1))) \
                         .over(before)
        strs_before = F.count(F.when(kwc == F.lit('str'), F.lit(1))) \
                       .over(before)

        def plus(op, a, b):
            return F.concat(
                F.lit('unsupported operand type(s) for {}: \''.format(op)),
                a, F.lit("' and '"), b, F.lit("'"))

        if kind == 'sum':
            acc = F.when(floats_before > 0, F.lit('float')) \
                   .otherwise(F.lit('int'))
            fail = kwc.isin('NoneType', 'str')
            msg = plus('+=', acc, kwc)
        elif kind in ('avg', 'variance'):
            num_acc = (F.when(vals_before == 1, first_val_kw)
                        .when(floats_before > 0, F.lit('float'))
                        .otherwise(F.lit('int')))
            if kind == 'variance':
                fail1 = (rn == 1) & kwc.isin('NoneType', 'str')
                msg1 = F.concat(
                    F.lit("unsupported operand type(s) for ** or pow(): '"),
                    kwc, F.lit("' and 'int'"))
                fail2 = (rn >= 2) & ~first_kw.isin('NoneType', 'str') & \
                    kwc.isin('NoneType', 'str')
                fail = fail1 | fail2
                msg = F.when(fail1, msg1).otherwise(plus('+', num_acc, kwc))
            else:
                fail_nf = (rn == 2) & (first_kw == F.lit('NoneType'))
                fail_sf = ((first_kw == F.lit('str')) & (rn >= 2)
                           & (kwc != F.lit('str'))
                           & (strs_before == rn - 1))
                msg_sf = F.concat(F.lit('can only concatenate str (not "'),
                                  kwc, F.lit('") to str'))
                fail_vf = (rn >= 2) & ~first_kw.isin('NoneType', 'str') & \
                    kwc.isin('NoneType', 'str')
                fail = fail_nf | fail_sf | fail_vf
                msg = (F.when(fail_nf, plus('+', F.lit('NoneType'), kwc))
                        .when(fail_sf, msg_sf)
                        .otherwise(plus('+', num_acc, kwc)))
        else:  # min / max
            op = '<' if kind == 'min' else '>'
            acc = F.coalesce(first_val_kw, F.lit('int'))
            cross = (((kwc == F.lit('str')) & (acc != F.lit('str')))
                     | (is_val & (kwc != F.lit('str'))
                        & (acc == F.lit('str'))))
            fail = (vals_before >= 1) & \
                ((kwc == F.lit('NoneType')) | cross)
            msg = F.concat(
                F.lit("'{}' not supported between instances of '".format(op)),
                kwc, F.lit("' and '"), acc, F.lit("'"))
        row = (sel.select('__pnr', fail.alias('__f'), msg.alias('__m'))
                  .where(F.col('__f'))
                  .agg(F.min('__pnr').alias('s'),
                       F.min_by('__m', '__pnr').alias('m')).collect())
        if not row or row[0]['s'] is None:
            return None
        return int(row[0]['s']), str(row[0]['m'])
    return probe


def avgvar_mixed_group_guards(kind, raw, nr, rec_of, prefix,
                              with_marker=False):
    """In-plan raise conditions for AVG/VARIANCE over a raw-path MIXED
    argument (the reference's first-value-raw accumulators meet str and
    None cells in every combination).  The raised text is approximate
    where position matters — reference_agg_failure_probe rewrites it on
    the error path — but the bare finalize shapes (lone-null avg,
    all-str avg groups) carry their exact reference text directly,
    record-free."""
    from .mixedcell import K_STR
    k = raw.getField('k')
    kw = (F.when(raw.isNull(), F.lit('NoneType'))
           .when(k == F.lit(K_STR), F.lit('str'))
           .otherwise(F.lit('num')))
    p = prefix
    bad = raw.isNull() | (k == F.lit(K_STR))
    aggs = [
        F.count(F.lit(1)).alias(p + '_act'),
        F.sum((kw == F.lit('str')).cast('long')).alias(p + '_ans'),
        F.sum(raw.isNull().cast('long')).alias(p + '_ann'),
        F.min_by(kw, nr).alias(p + '_afk'),
        F.min(F.when(bad, nr)).alias(p + '_abn'),
        F.min(F.when(raw.isNotNull() & (k != F.lit(K_STR)), nr))
         .alias(p + '_avn'),
        F.min(F.when(kw != F.lit('str'), nr)).alias(p + '_ansr'),
        F.max(F.when(raw.isNull(), nr)).alias(p + '_anx'),
        # all-str groups: the reference concatenates the cells and fails
        # in float() at finalize, quoting the concatenation — rebuild it
        # (group is degenerate/always-failing; reference holds the same
        # string in memory)
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    k == F.lit(K_STR),
                    F.struct(nr.alias('o'), raw.getField('s').alias('v'))))),
                lambda x: x['v']), '').alias(p + '_acat'),
    ]

    def wrap(out: Column, tag: str) -> Column:
        cnt = F.col(p + '_act')
        n_str = F.col(p + '_ans')
        n_null = F.col(p + '_ann')
        first_kw = F.col(p + '_afk')
        bad_nr = F.col(p + '_abn')
        all_str = (n_str == cnt) & (cnt >= 1)
        lone_null = (first_kw == F.lit('NoneType')) & (cnt == 1)
        rec_fail = bad_nr.isNotNull() & ~(
            (kind == 'avg') & (lone_null | all_str))
        # avg: a clean leading-str prefix only fails when a non-str
        # arrives; pure-str groups fail bare instead
        if kind == 'avg':
            rec_fail = bad_nr.isNotNull() & ~lone_null & ~all_str & ~(
                (first_kw == F.lit('str')) & (n_str == cnt))
        # the blamed record must never PRECEDE the reference's true
        # failing row — the resolver's probe only overrides records
        # <= the raised one.  str-first groups fail at the first
        # non-str row; a leading None fails at the second row (bound
        # above by min(first value, last null of a multi-null group));
        # value-first groups fail at the first bad row exactly.
        rec_raw = bad_nr
        if kind == 'avg':
            second_null = F.when(F.col(p + '_ann') >= 2, F.col(p + '_anx'))
            rec_nf = F.when(second_null.isNull(), F.col(p + '_avn')) \
                      .when(F.col(p + '_avn').isNull(), second_null) \
                      .otherwise(F.least(F.col(p + '_avn'), second_null))
            rec_raw = (F.when(first_kw == F.lit('NoneType'),
                              F.coalesce(rec_nf, bad_nr))
                        .when(first_kw == F.lit('str'),
                              F.coalesce(F.col(p + '_ansr'), bad_nr))
                        .otherwise(bad_nr))
        parts = [F.lit('At record '), rec_of(rec_raw).cast('string'),
                 F.lit(", Details: unsupported operand type(s) for "
                       "{}: 'NoneType' and 'str'".format(
                           '**' if kind == 'variance' else '+'))]
        if with_marker:
            parts += [F.lit('\n__RBQL_SURR_'), rec_raw.cast('string'),
                      F.lit('__')]
        approx_msg = F.concat(*parts)
        lone_msg = F.lit('float() argument must be a string or a real '
                         "number, not 'NoneType'")
        cat_msg = F.concat(F.lit("could not convert string to float: '"),
                           F.col(p + '_acat'), F.lit("'"))
        if kind == 'variance':
            # all-str / lone-null groups fail at their first row (**)
            return F.when(F.col(p + '_abn').isNotNull(),
                          F.raise_error(approx_msg)).otherwise(out)
        return (F.when(lone_null, F.raise_error(lone_msg))
                 .when(all_str, F.raise_error(cat_msg))
                 .when(rec_fail, F.raise_error(approx_msg))
                 .otherwise(out))

    wrap.guard_names = None
    return aggs, wrap
