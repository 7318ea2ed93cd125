"""Native Catalyst translation of ``__js__`` runtime-helper shapes.

The JS transpiler (transpile.py) emits ``__js__.<op>(…)`` wherever
ECMAScript semantics diverge from Python; this module teaches the
expression translator those shapes so the common JS subset stays
JVM-side — WHERE predicates reach the parquet scan, comparisons and
string ops run in whole-stage codegen, only genuinely dynamic
expressions ride the Arrow evaluator.

Every translation here is semantics-preserving for non-error inputs
per the ECMAScript abstract operations (ToNumber/ToString, Abstract
Relational / Equality Comparison), including the null-as-0 relational
coercion, NaN-compares-false, and the throw-on-null member access —
or it rejects with TranslationFallback.  Known micro-divergences of
the native path, excluded from translation rather than fudged: float
arithmetic results (V8 renders integral doubles without '.0' — the
Python-hosted runtime normalizes, a Spark double column can't), so
+,-,*,% translate only when both operand tags are int (closed under
those ops) or the string-concat combinations.
"""

from __future__ import annotations

import ast
import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tr_mod():
    from .. import translator
    return translator


def js_name_path(node: ast.expr):
    """('gt',) for __js__.gt, ('Math','floor') for __js__.Math.floor;
    None when the node is not rooted at the __js__ namespace."""
    parts: list[str] = []
    cur = node
    while isinstance(cur, ast.Attribute):
        parts.append(cur.attr)
        cur = cur.value
    if isinstance(cur, ast.Name) and cur.id == '__js__':
        return tuple(reversed(parts))
    return None


def js_truthy_pred(tc) -> Column:
    """ECMAScript ToBoolean of a typed column (predicate position)."""
    t = _tr_mod()
    tag, col = tc.tag, tc.col
    if tag == 'bool':
        return F.coalesce(col, F.lit(False))
    if tag == 'int':
        return col.isNotNull() & (col != F.lit(0))
    if tag == 'float':
        return col.isNotNull() & ~F.isnan(col) & (col != F.lit(0.0))
    if tag == 'str':
        return col.isNotNull() & (col != F.lit(''))
    if tag == 'null':
        return F.lit(False)
    if tag.startswith('array:'):
        return col.isNotNull()   # JS arrays are always truthy; a null cell isn't
    raise t.TranslationFallback('JS truthiness of {}'.format(tag))


_NUMERIC = ('int', 'float')


def _to_number_parts(tr, node: ast.expr):
    """JS ToNumber of an operand → (double Column, nan_cond Column).

    Handles the transpiler's parseInt/parseFloat/Number wrappers in
    operand position (prefix-parse semantics, rbql-js exposes V8's) so
    ``where parseInt(a1) > 10`` translates without the Arrow evaluator.
    """
    t = _tr_mod()
    path = None
    if isinstance(node, ast.Call):
        path = js_name_path(node.func)
    if path in (('parseInt',), ('parseFloat',)) and len(node.args) == 1:
        v = tr._expr(node.args[0])
        if v.tag == 'int':
            col = v.col.cast('double')
            return F.coalesce(col, F.lit(0.0)), v.col.isNull()   # parseInt(null)→NaN
        if v.tag == 'float' and path == ('parseFloat',):
            return F.coalesce(v.col, F.lit(0.0)), v.col.isNull() | F.isnan(v.col)
        if v.tag == 'float' and path == ('parseInt',):
            nan = v.col.isNull() | F.isnan(v.col)
            return F.coalesce(v.col.cast('long').cast('double'), F.lit(0.0)), nan
        if v.tag == 'str':
            trimmed = F.trim(v.col)
            pat = r'^[+-]?[0-9]+' if path == ('parseInt',) else \
                r'^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?'
            ext = F.regexp_extract(trimmed, pat, 0)
            col = ext.try_cast('double')
            nan = v.col.isNull() | (ext == F.lit('')) | col.isNull()
            return F.coalesce(col, F.lit(0.0)), nan
        raise t.TranslationFallback('{} on {}'.format(path[0], v.tag))
    if path == ('Number',) and len(node.args) == 1:
        return _to_number_parts(tr, node.args[0])
    v = tr._expr(node)
    return _tonum_tcol(tr, v)


def _tonum_tcol(tr, v):
    t = _tr_mod()
    tag, col = v.tag, v.col
    if tag == 'int':
        return F.coalesce(col.cast('double'), F.lit(0.0)), F.lit(False)
    if tag == 'float':
        return F.coalesce(col, F.lit(0.0)), F.isnan(F.coalesce(col, F.lit(0.0)))
    if tag == 'bool':
        return F.coalesce(col.cast('double'), F.lit(0.0)), F.lit(False)
    if tag == 'null':
        return F.lit(0.0), F.lit(False)
    if tag == 'str':
        trimmed = F.trim(col)
        hexm = trimmed.rlike('^0[xX][0-9a-fA-F]+$')
        casted = (F.when(col.isNull() | (trimmed == F.lit('')), F.lit(0.0))
                   .when(hexm, F.conv(F.substring(trimmed, 3, 65), 16, 10)
                                .try_cast('double'))
                   .otherwise(trimmed.try_cast('double')))
        nan = casted.isNull() | F.isnan(F.coalesce(casted, F.lit(0.0)))
        return F.coalesce(casted, F.lit(0.0)), nan
    raise t.TranslationFallback('JS ToNumber of {}'.format(tag))


def _to_string_col(tr, v) -> Column:
    """JS ToString of a typed column; translatable tags only."""
    t = _tr_mod()
    tag, col = v.tag, v.col
    if tag == 'str':
        return F.coalesce(col, F.lit('null'))
    if tag == 'int':
        return F.coalesce(col.cast('string'), F.lit('null'))
    if tag == 'bool':
        return (F.when(col.isNull(), F.lit('null'))
                 .when(col, F.lit('true')).otherwise(F.lit('false')))
    if tag == 'null':
        return F.lit('null')
    if tag == 'strnum':
        # a mixed `+` result: its column already holds the V8 rendering of
        # the runtime value (concat string, or int without '.0'), and JS
        # ToString of either runtime shape IS that rendering — so the
        # column passes through.  The branches never yield null, but stay
        # defensive.
        return F.coalesce(col, F.lit('null'))
    # float: V8 renders integral doubles without '.0' — keep in the runtime
    raise t.TranslationFallback('JS ToString of {}'.format(tag))


_CMP = {
    'lt': lambda a, b: a < b, 'gt': lambda a, b: a > b,
    'le': lambda a, b: a <= b, 'ge': lambda a, b: a >= b,
}


def _const_num(node: ast.expr):
    """Literal operand value usable for translate-time ToNumber folding;
    returns None when the node is not a foldable literal."""
    if isinstance(node, ast.Constant) and not isinstance(node.value, bool) and \
            isinstance(node.value, (int, float, str)):
        return node.value
    return None


def _cmp_literal_fast(tr, op: str, xn: ast.expr, yn: ast.expr):
    """Pushdown-friendly shape for <col> OP <literal>: plain comparison
    conjoined with null/NaN masks (parquet pushes conjuncts; a CASE or
    coalesce wrapper would block the scan filter).  The null branch —
    ToNumber(null) is 0 — folds to a constant at translate time."""
    from . import runtime as _jsrt
    t = _tr_mod()
    for col_node, lit_node, flipped in ((xn, yn, False), (yn, xn, True)):
        litv = _const_num(lit_node)
        if litv is None or not isinstance(col_node, (ast.Name, ast.Attribute,
                                                     ast.Subscript)):
            continue
        try:
            col = tr._expr(col_node)
        except t.TranslationFallback:
            return None
        rt_fn = getattr(_jsrt, op)
        # the null-cell branch folds to a constant: the runtime comparator
        # IS the ECMAScript algorithm (ToNumber(null)=0 inside)
        null_branch = bool(rt_fn(litv, None) if flipped else rt_fn(None, litv))
        if col.tag in _NUMERIC:
            nlit = _jsrt.to_number(litv)
            if isinstance(nlit, float) and nlit != nlit:
                return None   # literal folds to NaN: handled by the slow path
            base = _CMP[op](F.lit(nlit), col.col) if flipped else _CMP[op](col.col, F.lit(nlit))
            pred = (base | col.col.isNull()) if null_branch else (base & col.col.isNotNull())
            if col.tag == 'float':
                pred = pred & ~F.coalesce(F.isnan(col.col), F.lit(False))
            return t.TCol(pred, 'bool')
        if col.tag == 'str' and isinstance(litv, str):
            base = _CMP[op](F.lit(litv), col.col) if flipped else _CMP[op](col.col, F.lit(litv))
            pred = (base | col.col.isNull()) if null_branch else (base & col.col.isNotNull())
            return t.TCol(pred, 'bool')
        return None
    return None


def _cmp(tr, op: str, xn: ast.expr, yn: ast.expr):
    t = _tr_mod()
    fast = _cmp_literal_fast(tr, op, xn, yn)
    if fast is not None:
        return fast
    fn = _CMP[op]
    x_path = js_name_path(xn.func) if isinstance(xn, ast.Call) else None
    y_path = js_name_path(yn.func) if isinstance(yn, ast.Call) else None
    x = None if x_path in (('parseInt',), ('parseFloat',), ('Number',)) else tr._expr(xn)
    y = None if y_path in (('parseInt',), ('parseFloat',), ('Number',)) else tr._expr(yn)
    if x is not None and y is not None and x.tag == 'str' and y.tag == 'str':
        # Abstract Relational: both strings → code-unit compare; a null on
        # either side falls to the numeric branch (ToNumber(null)=0)
        both = x.col.isNotNull() & y.col.isNotNull()
        nx, nanx = _tonum_tcol(tr, x)
        ny, nany = _tonum_tcol(tr, y)
        num_path = F.when(nanx | nany, F.lit(False)).otherwise(fn(nx, ny))
        return t.TCol(F.when(both, fn(x.col, y.col)).otherwise(num_path), 'bool')
    nx, nanx = _to_number_parts(tr, xn) if x is None else _tonum_tcol(tr, x)
    ny, nany = _to_number_parts(tr, yn) if y is None else _tonum_tcol(tr, y)
    return t.TCol(F.when(nanx | nany, F.lit(False)).otherwise(fn(nx, ny)), 'bool')


_NUM_WRAPS = (('parseInt',), ('parseFloat',), ('Number',))


def _eq(tr, strict: bool, negate: bool, xn: ast.expr, yn: ast.expr):
    """Abstract (loose) / Strict Equality Comparison.

    A parseInt/parseFloat/Number-wrapped operand is a NUMBER value and is
    never null itself (a null argument makes it NaN, folded into the nan
    condition by _to_number_parts) — its null-ness column is a non-null
    dummy below."""
    t = _tr_mod()
    x_path = js_name_path(xn.func) if isinstance(xn, ast.Call) else None
    y_path = js_name_path(yn.func) if isinstance(yn, ast.Call) else None
    x = None if x_path in _NUM_WRAPS else tr._expr(xn)
    y = None if y_path in _NUM_WRAPS else tr._expr(yn)

    def done(col: Column):
        return t.TCol(~col if negate else col, 'bool')

    # null literal against anything: only null/undefined compare equal
    # (same rule in loose AND strict comparison for table cells)
    if x is not None and x.tag == 'null':
        if y is None:
            return done(F.lit(False))   # null vs a number value
        return done(y.col.isNull())
    if y is not None and y.tag == 'null':
        if x is None:
            return done(F.lit(False))
        return done(x.col.isNull())

    # pushdown-friendly fast path: <numeric col> ==/=== <numeric literal>
    # (null never equals a number, so the null mask is a plain conjunct)
    from . import runtime as _jsrt
    for col_v, lit_node in ((x, yn), (y, xn)):
        litv = _const_num(lit_node)
        if col_v is None or litv is None:
            continue
        if col_v.tag in _NUMERIC and isinstance(litv, (int, float)):
            pred = (col_v.col == F.lit(litv)) & col_v.col.isNotNull()
            if col_v.tag == 'float':
                pred = pred & ~F.coalesce(F.isnan(col_v.col), F.lit(False))
            return done(pred)
        if not strict and col_v.tag in _NUMERIC and isinstance(litv, str):
            nlit = _jsrt.to_number(litv)
            if isinstance(nlit, float) and nlit != nlit:
                return done(F.lit(False))   # number == non-numeric string
            pred = (col_v.col == F.lit(nlit)) & col_v.col.isNotNull()
            if col_v.tag == 'float':
                pred = pred & ~F.coalesce(F.isnan(col_v.col), F.lit(False))
            return done(pred)
        if strict and col_v.tag in _NUMERIC and isinstance(litv, str):
            return done(F.lit(False))

    # 'numeric-ish': a number after coercion. Loose equality coerces
    # booleans and numeric strings; strict keeps types apart.
    def numish(v, wrapped):
        if wrapped:
            return True
        if v.tag in _NUMERIC:
            return True
        return (not strict) and v.tag in ('bool', 'str')

    x_num = numish(x, x is None)
    y_num = numish(y, y is None)

    if x is not None and y is not None and x.tag == 'str' and y.tag == 'str':
        return done(x.col.eqNullSafe(y.col))
    if x is not None and y is not None and x.tag == 'bool' and y.tag == 'bool':
        return done(x.col.eqNullSafe(y.col))
    if strict and x is not None and y is not None and x.tag != y.tag and \
            not (x.tag in _NUMERIC and y.tag in _NUMERIC):
        # strict cross-type: never equal (null/null handled above only for
        # the null LITERAL; two differently-typed columns can still both be
        # null ≡ JS null === null)
        return done(x.col.isNull() & y.col.isNull())
    if strict and x is not None and y is None and x.tag not in _NUMERIC:
        return done(F.lit(False))   # non-number === number-value
    if strict and y is not None and x is None and y.tag not in _NUMERIC:
        return done(F.lit(False))
    if x_num and y_num:
        xa = F.lit(0) if x is None else x.col   # wrapped → never-null value
        ya = F.lit(0) if y is None else y.col
        nx, nanx = _to_number_parts(tr, xn) if x is None else _tonum_tcol(tr, x)
        ny, nany = _to_number_parts(tr, yn) if y is None else _tonum_tcol(tr, y)
        both_null = xa.isNull() & ya.isNull()
        either_null = xa.isNull() | ya.isNull()
        return done(F.when(both_null, F.lit(True))
                     .when(either_null, F.lit(False))
                     .when(nanx | nany, F.lit(False))
                     .otherwise(nx == ny))
    raise t.TranslationFallback('JS equality on {} vs {}'.format(
        x.tag if x is not None else 'number', y.tag if y is not None else 'number'))


_NULL_READ_MSG = "Cannot read properties of null (reading '{}')"


def _null_guarded(tr, v, reading: str, result: Column, cast_type: str) -> Column:
    cond = v.col.isNull()
    err = tr._value_error(cond, F.lit(_NULL_READ_MSG.format(reading)))
    return F.when(cond, err.cast(cast_type)).otherwise(result)


_STR_METHODS_SIMPLE = {
    'toUpperCase': F.upper, 'toLowerCase': F.lower, 'trim': F.trim,
    'trimStart': F.ltrim, 'trimEnd': F.rtrim,
}


def _method(tr, node: ast.Call):
    """__js__.method(obj, 'name', args…) — string methods on str columns."""
    t = _tr_mod()
    if len(node.args) < 2 or not (isinstance(node.args[1], ast.Constant)
                                  and isinstance(node.args[1].value, str)):
        raise t.TranslationFallback('dynamic JS method name')
    name = node.args[1].value
    margs = node.args[2:]
    obj_node = node.args[0]
    # RegExp literal .test with a static pattern → rlike
    if name == 'test' and isinstance(obj_node, ast.Call) and \
            js_name_path(obj_node.func) == ('RegExp',) and len(margs) == 1:
        if all(isinstance(a, ast.Constant) and isinstance(a.value, str)
               for a in obj_node.args):
            pat = obj_node.args[0].value
            flags = obj_node.args[1].value if len(obj_node.args) > 1 else ''
            if t._java_safe_regex(pat) and set(flags) <= {'i', 'g'}:
                target = tr._expr(margs[0])
                if target.tag == 'str':
                    jpat = ('(?i)' + pat) if 'i' in flags else pat
                    # RegExp.test(ToString(null)) tests the string 'null'
                    return t.TCol(F.coalesce(target.col, F.lit('null')).rlike(jpat),
                                  'bool')
        raise t.TranslationFallback('RegExp.test outside the static subset')
    obj = tr._expr(obj_node)
    if obj.tag != 'str':
        raise t.TranslationFallback('JS method .{} on {}'.format(name, obj.tag))
    if name in _STR_METHODS_SIMPLE and not margs:
        return t.TCol(_null_guarded(tr, obj, name,
                                    _STR_METHODS_SIMPLE[name](obj.col), 'string'), 'str')
    lit_args = [a.value for a in margs
                if isinstance(a, ast.Constant) and isinstance(a.value, (str, int))]
    all_lit = len(lit_args) == len(margs)
    if name == 'split' and all_lit and len(lit_args) == 1 and \
            isinstance(lit_args[0], str) and lit_args[0] != '':
        sep = _re.escape(lit_args[0])
        return t.TCol(_null_guarded(tr, obj, name,
                                    F.split(obj.col, sep, -1), 'array<string>'),
                      'array:str')
    if name in ('startsWith', 'endsWith', 'includes') and all_lit and \
            len(lit_args) == 1 and isinstance(lit_args[0], str):
        fn = {'startsWith': obj.col.startswith, 'endsWith': obj.col.endswith,
              'includes': obj.col.contains}[name]
        return t.TCol(_null_guarded(tr, obj, name, fn(F.lit(lit_args[0])), 'boolean'),
                      'bool')
    if name == 'indexOf' and all_lit and len(lit_args) == 1 and \
            isinstance(lit_args[0], str) and lit_args[0] != '':
        res = (F.instr(obj.col, lit_args[0]) - F.lit(1)).cast('long')
        return t.TCol(_null_guarded(tr, obj, name, res, 'long'), 'int')
    if name == 'charAt' and all_lit and len(lit_args) <= 1:
        i = lit_args[0] if lit_args else 0
        if isinstance(i, int) and i >= 0:
            res = F.coalesce(F.substring(obj.col, i + 1, 1), F.lit(''))
            return t.TCol(_null_guarded(tr, obj, name, res, 'string'), 'str')
    if name == 'slice' and all_lit and margs and \
            all(isinstance(v, int) and v >= 0 for v in lit_args):
        start = lit_args[0]
        if len(lit_args) == 1:
            res = F.substring(obj.col, start + 1, 2 ** 30)
        else:
            end = lit_args[1]
            res = F.substring(obj.col, start + 1, max(end - start, 0))
        return t.TCol(_null_guarded(tr, obj, name, res, 'string'), 'str')
    if name == 'repeat' and all_lit and len(lit_args) == 1 and \
            isinstance(lit_args[0], int) and lit_args[0] >= 0:
        return t.TCol(_null_guarded(tr, obj, name,
                                    F.repeat(obj.col, lit_args[0]), 'string'), 'str')
    raise t.TranslationFallback('JS method .{}'.format(name))


_MATH_INT = {'floor', 'ceil', 'trunc', 'round', 'abs', 'sign', 'min', 'max'}


def _math(tr, name: str, node: ast.Call):
    t = _tr_mod()
    args = [tr._expr(a) for a in node.args]
    if not all(a.tag == 'int' for a in args):
        # float args: NaN propagation / integral-double rendering — runtime
        raise t.TranslationFallback('Math.{} on non-int'.format(name))
    cols = [F.coalesce(a.col, F.lit(0)) for a in args]   # ToNumber(null)=0
    if name in ('floor', 'ceil', 'trunc', 'round', 'abs') and len(cols) == 1:
        out = F.abs(cols[0]) if name == 'abs' else cols[0]   # int is its own floor
        return t.TCol(out, 'int')
    if name == 'sign' and len(cols) == 1:
        return t.TCol(F.signum(cols[0]).cast('long'), 'int')
    if name == 'min' and cols:
        return t.TCol(F.least(*cols) if len(cols) > 1 else cols[0], 'int')
    if name == 'max' and cols:
        return t.TCol(F.greatest(*cols) if len(cols) > 1 else cols[0], 'int')
    if name == 'sqrt' and len(cols) == 1:
        # sqrt of a negative is NaN in both JS and Spark
        return t.TCol(F.sqrt(cols[0].cast('double')), 'float')
    raise t.TranslationFallback('Math.{}'.format(name))


def _is_string_at_runtime(node: ast.expr, v) -> Column:
    """Column<bool>: whether this operand's RUNTIME value is a string.

    JS `+` picks concat iff either operand IS a string after ToPrimitive
    (ECMA-262 ApplyStringOrNumericBinaryOperator).  A str-TAGGED column
    still holds null cells whose runtime value is null, not a string —
    `null + 1` must be numeric 1, never 'null1' (caught by the seeded
    node differential fuzz, seed 6005)."""
    if v.tag != 'str':
        return F.lit(False)
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return F.lit(True)
    return v.col.isNotNull()


def _tonum_int_like(v) -> Column:
    """JS ToNumber for an operand reached on the `+` numeric branch: a
    str-tagged column is only evaluated here when its cell is null
    (ToNumber(null)=0); int/bool/null tags coalesce nulls to 0."""
    if v.tag == 'str' or v.tag == 'null':
        return F.lit(0)
    return F.coalesce(v.col.cast('long'), F.lit(0))


def _add(tr, xn: ast.expr, yn: ast.expr):
    t = _tr_mod()
    x, y = tr._expr(xn), tr._expr(yn)
    if x.tag == 'int' and y.tag == 'int':
        return t.TCol(F.coalesce(x.col, F.lit(0)) + F.coalesce(y.col, F.lit(0)), 'int')
    if 'str' in (x.tag, y.tag) or 'strnum' in (x.tag, y.tag):
        for v in (x, y):
            if v.tag not in ('str', 'strnum', 'int', 'bool', 'null'):
                raise t.TranslationFallback('JS + on {} vs {}'.format(x.tag, y.tag))
        # literal string on either side: concat always applies, so even a
        # 'strnum' operand is safe (ToString of a strnum is its column)
        for node, v in ((xn, x), (yn, y)):
            if v.tag == 'str' and isinstance(node, ast.Constant) \
                    and isinstance(node.value, str):
                return t.TCol(F.concat(_to_string_col(tr, x),
                                       _to_string_col(tr, y)), 'str')
        if 'strnum' in (x.tag, y.tag):
            # the inner mixed result's RUNTIME type (string vs number) is
            # branch-dependent, so the outer `+` cannot decide concat vs
            # numeric natively: `a2 + 1 + 1` must be 2 on a null cell, not
            # '11' (r14 ADVICE) — host it in the runtime
            raise t.TranslationFallback('JS + consuming a mixed +-result (strnum)')
        concat_branch = F.concat(_to_string_col(tr, x), _to_string_col(tr, y))
        x_str = _is_string_at_runtime(xn, x)
        y_str = _is_string_at_runtime(yn, y)
        # numeric branch (no runtime string): every str-tagged operand is
        # null there, so the sum is int-valued and renders without '.0'.
        # The result is tagged 'strnum', NOT 'str': its runtime value is a
        # string on one branch and a NUMBER on the other, so only contexts
        # with rendering semantics (final projection, JS ToString) may
        # consume it — every other consumer falls back to the runtime.
        num_branch = (_tonum_int_like(x) + _tonum_int_like(y)).cast('string')
        return t.TCol(F.when(x_str | y_str, concat_branch)
                       .otherwise(num_branch), 'strnum')
    raise t.TranslationFallback('JS + on {} vs {}'.format(x.tag, y.tag))


def _int_arith(tr, op: str, xn: ast.expr, yn: ast.expr):
    t = _tr_mod()
    x, y = tr._expr(xn), tr._expr(yn)
    if not (x.tag == 'int' and y.tag == 'int'):
        raise t.TranslationFallback('JS {} on {} vs {}'.format(op, x.tag, y.tag))
    xc, yc = F.coalesce(x.col, F.lit(0)), F.coalesce(y.col, F.lit(0))
    if op == 'sub':
        return t.TCol(xc - yc, 'int')
    if op == 'mul':
        return t.TCol(xc * yc, 'int')
    if op == 'mod':
        # JS remainder takes the dividend's sign — Java/Spark % agrees;
        # a zero divisor yields NaN in JS, so only a provably nonzero
        # literal divisor translates
        if isinstance(yn, ast.Constant) and isinstance(yn.value, int) and yn.value != 0:
            return t.TCol(xc % yc, 'int')
        raise t.TranslationFallback('JS % without a nonzero literal divisor')
    raise t.TranslationFallback('JS ' + op)


def translate_value(tr, node: ast.Call, path: tuple):
    """Value-position translation of a __js__ helper call."""
    t = _tr_mod()
    a = node.args
    if path[0] in _CMP and len(a) == 2:
        return _cmp(tr, path[0], a[0], a[1])
    if path[0] in ('loose_eq', 'loose_ne', 'strict_eq', 'strict_ne') and len(a) == 2:
        return _eq(tr, path[0].startswith('strict'), path[0].endswith('ne'), a[0], a[1])
    if path[0] == 'add' and len(a) == 2:
        return _add(tr, a[0], a[1])
    if path[0] in ('sub', 'mul', 'mod') and len(a) == 2:
        return _int_arith(tr, path[0], a[0], a[1])
    if path[0] == 'neg' and len(a) == 1:
        v = tr._expr(a[0])
        if v.tag == 'int':
            return t.TCol(-F.coalesce(v.col, F.lit(0)), 'int')
        raise t.TranslationFallback('JS unary - on {}'.format(v.tag))
    if path[0] == 'not_' and len(a) == 1:
        return t.TCol(~js_truthy_pred(tr._expr(a[0])), 'bool')
    if path[0] == 'truthy' and len(a) == 1:
        return t.TCol(js_truthy_pred(tr._expr(a[0])), 'bool')
    if path[0] == 'member' and len(a) == 2 and \
            isinstance(a[1], ast.Constant) and a[1].value == 'length':
        v = tr._expr(a[0])
        if v.tag == 'str':
            return t.TCol(_null_guarded(tr, v, 'length',
                                        F.length(v.col).cast('long'), 'long'), 'int')
        if v.tag.startswith('array:'):
            return t.TCol(_null_guarded(tr, v, 'length',
                                        F.size(v.col).cast('long'), 'long'), 'int')
        raise t.TranslationFallback('JS .length on {}'.format(v.tag))
    if path[0] == 'like' and len(a) == 2:
        # JS like(): RegExp.test ToString-coerces the operand
        # (rbql-js/rbql.js:243) — so null tests 'null' and ints test
        # their decimal rendering; never-null bool keeps WHERE usage in
        # the pushable-conjunct shape
        if not (isinstance(a[1], ast.Constant) and isinstance(a[1].value, str)):
            raise t.TranslationFallback('JS like() with non-literal pattern')
        from ..functions.like import like_to_java_regex
        v = tr._expr(a[0])
        return t.TCol(_to_string_col(tr, v).rlike(
            like_to_java_regex(a[1].value)), 'bool')
    if path[0] == 'method':
        return _method(tr, node)
    if path == ('Math',):
        raise t.TranslationFallback('bare Math reference')
    if path[0] == 'Math' and len(path) == 2:
        return _math(tr, path[1], node)
    if path[0] == 'tpl' and len(a) == 1 and isinstance(a[0], ast.List):
        parts = []
        for el in a[0].elts:
            if isinstance(el, ast.Constant) and isinstance(el.value, str):
                parts.append(F.lit(el.value))
            else:
                parts.append(_to_string_col(tr, tr._expr(el)))
        return t.TCol(F.concat(*parts) if parts else F.lit(''), 'str')
    if path[0] in ('and_', 'or_', 'nullish') and len(a) == 2 and \
            isinstance(a[1], ast.Lambda):
        x = tr._expr(a[0])
        y = tr._expr(a[1].body)
        tag = x.tag if x.tag == y.tag else (
            y.tag if x.tag == 'null' else (x.tag if y.tag == 'null' else None))
        if x.tag in _NUMERIC and y.tag in _NUMERIC and x.tag != y.tag:
            tag = None   # int/float merge would re-render values
        if tag is None:
            raise t.TranslationFallback('mixed-type JS &&/||/?? in value position')
        if path[0] == 'and_':
            col = F.when(js_truthy_pred(x), y.col).otherwise(x.col)
        elif path[0] == 'or_':
            col = F.when(js_truthy_pred(x), x.col).otherwise(y.col)
        else:
            col = F.when(x.col.isNull(), y.col).otherwise(x.col)
        return t.TCol(col, tag)
    if path[0] in ('Number', 'parseInt', 'parseFloat') and len(a) == 1:
        inner = tr._expr(a[0])
        if inner.tag == 'int':
            # identity for non-null ints; parseInt(null) is NaN — translate
            # only when the argument cannot be null (literal / arithmetic)
            if isinstance(a[0], ast.Constant):
                return inner
        raise t.TranslationFallback('{} in value position'.format(path[0]))
    raise t.TranslationFallback('__js__.{}'.format('.'.join(path)))


def translate_predicate(tr, node: ast.Call, path: tuple) -> Column:
    """Predicate-position translation (WHERE / if-test): &&, ||, ! and
    ?? combine as JS-truthiness predicates; everything else translates
    as a value and takes its truthiness."""
    a = node.args
    if path[0] in ('and_', 'or_') and len(a) == 2 and isinstance(a[1], ast.Lambda):
        px = _pred_operand(tr, a[0])
        py = _pred_operand(tr, a[1].body)
        return (px & py) if path[0] == 'and_' else (px | py)
    if path[0] == 'not_' and len(a) == 1:
        return ~_pred_operand(tr, a[0])
    if path[0] == 'nullish' and len(a) == 2 and isinstance(a[1], ast.Lambda):
        x = tr._expr(a[0])
        return F.when(x.col.isNull(), _pred_operand(tr, a[1].body)) \
                .otherwise(js_truthy_pred(x))
    v = translate_value(tr, node, path)
    if v.tag == 'bool':
        # every bool-producing __js__ translation is never-null by
        # construction (complete when-chains / null-masked conjuncts) —
        # skipping the truthiness coalesce keeps the predicate in the
        # parquet-pushable conjunct shape
        return v.col
    return js_truthy_pred(v)


def _pred_operand(tr, node: ast.expr) -> Column:
    if isinstance(node, ast.Call):
        path = js_name_path(node.func)
        if path is not None:
            return translate_predicate(tr, node, path)
    return js_truthy_pred(tr._expr(node))
