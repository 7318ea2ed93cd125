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


def detect_aggregate(item_text: str) -> AggCall | None:
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
        raise RbqlParsingError(WRONG_AGGREGATION_USAGE_ERROR)
    return top


def numeric_coerce(col: Column, tag: str, nr: Column | None = None) -> tuple[Column, str]:
    """NumHandler parity: strings parse to numbers, failure is a hard error
    carrying the record number (main-loop wrap, rbql_engine.py:756-767)."""
    if tag in ('int', 'float', 'null', 'any'):
        return col, tag
    if tag == 'bool':
        return col.cast('double'), 'float'
    if tag == 'str':
        casted = col.try_cast('double')
        prefix = [F.lit('At record '), nr.cast('string'), F.lit(', Details: ')] if nr is not None else []
        err_msg = F.concat(
            *prefix,
            F.lit('Unable to convert value "'), col,
            F.lit('" to int or float. MIN, MAX, SUM, AVG, MEDIAN and VARIANCE '
                  'aggregate functions convert their string arguments to numeric values'),
        )
        guarded = F.when(col.isNotNull() & casted.isNull(), F.raise_error(err_msg)) \
                   .otherwise(casted)
        return guarded, 'float'
    raise RbqlParsingError(NUMERIC_CONVERSION_ERROR.format('<' + tag + '>'))


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
