"""Opportunistic Python-expression → Spark ``Column`` translator.

RBQL expressions are arbitrary Python (reference README.md:5-21).  The general
evaluator is the Arrow-batched fallback in :mod:`rbql_spark.pyeval`; this
module converts the *common subset* to native Catalyst expressions so that
predicate pushdown, column pruning and whole-stage codegen apply.  The policy
(SURVEY §7.3) is: a translation must be semantics-preserving for non-error
inputs or be rejected (``TranslationFallback``) — when in doubt, fall back.

Covered: literals, all variable forms, arithmetic (incl. Python ``//``/``%``
sign semantics), comparisons (type-checked to avoid Spark implicit casts that
Python would reject), boolean ops with Python truthiness in predicate
position, conditional expressions, ``in``, ``is None``, f-strings, ``like()``,
``int/float/str/abs/len/round/min/max``, common ``str`` methods, and
``datetime.date/datetime`` literal constructors.
"""

from __future__ import annotations

import ast
import datetime as _dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .binding import NR_COL, Binding, VarRef
from .errors import RbqlParsingError
from .functions.like import like_to_java_regex


class TranslationFallback(Exception):
    """Expression not in the translatable subset — use the Python evaluator."""


class TCol:
    """A translated column + coarse type tag for type-directed decisions."""

    __slots__ = ('col', 'tag')

    def __init__(self, col: Column, tag: str):
        self.col = col
        self.tag = tag


_NUM = ('int', 'float')


def _is_num(tag: str) -> bool:
    return tag in _NUM


def _merge_num(a: str, b: str) -> str:
    return 'int' if a == 'int' and b == 'int' else 'float'


def _py_str(col: Column) -> Column:
    """Python str() of a str/int column INCLUDING the null case: str(None)
    (and f'{None}', '{}'.format(None)) renders 'None', where a bare Spark
    cast/concat would propagate NULL — a silent value divergence from the
    reference on typed inputs with null cells (round-12; the dual
    evaluator runs real Python and always rendered 'None')."""
    return F.when(col.isNull(), F.lit('None')).otherwise(col.cast('string'))


_JAVA_SAFE_ESCAPES = set('.*+?()[]{}|^$\\/-')


def _java_safe_regex(pat: str) -> bool:
    """True when `pat` means the same thing to Python `re` and Java
    `java.util.regex` (what rlike runs).  Conservative: plain characters,
    the shared metacharacter set, and escapes of metacharacters only —
    class escapes (\\w \\d \\s \\b …, unicode-vs-ASCII divergent), named
    groups ((?P<…> vs (?<…>), and inline-flag/lookaround constructs are
    rejected so the Python evaluator keeps those."""
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == '\\':
            if i + 1 >= n or pat[i + 1] not in _JAVA_SAFE_ESCAPES:
                return False
            i += 2
            continue
        if c == '(' and pat[i:i + 2] == '(?':
            return False
        i += 1
    return True


def as_predicate(tc: TCol) -> Column:
    """Python truthiness of a value in boolean context."""
    if tc.tag == 'bool':
        return tc.col
    if tc.tag in _NUM:
        return tc.col.isNotNull() & (tc.col != F.lit(0))
    if tc.tag == 'str':
        return tc.col.isNotNull() & (tc.col != F.lit(''))
    if tc.tag == 'null':
        return F.lit(False)
    if tc.tag.startswith('array:'):
        return F.size(tc.col) > 0
    if tc.tag == 'match_opt':
        return tc.col.eqNullSafe(F.lit(True))
    raise TranslationFallback('truthiness of type {!r}'.format(tc.tag))



class ExpressionTranslator:
    def __init__(self, binding: Binding):
        self.binding = binding
        # set when a translated expression references NR_COL internally
        # (the NoneType-call guards carry the record number) — such a
        # column cannot run before NR is attached, so the engine's
        # early-filter pushdown must skip it
        self.uses_nr_col = False
        # record_errors: value-parity guards (int('x') / float('x'))
        # wrap their message with the reference's 'At record N, Details: '
        # prefix (+ the exact-NR surrogate marker).  The engine's
        # early-filter pushdown translator sets this False so those
        # guards stay NR-free and the predicate can run before NR attach
        # — a deliberate divergence (recordless message) paid only on
        # the pushed-down WHERE error path, never on results.
        self.record_errors = True
        # conditions under which a record-wrapped guard in a translated
        # expression fires — harvested by the engine into error-path
        # probes that find the FIRST failing record (reference semantics:
        # the sequential loop stops at the first failure; Spark surfaces
        # an arbitrary task's failure, so the exact record is recovered
        # by min(NR) over these conditions, jobs run only on error)
        self.error_probes: list[tuple[Column, Column]] = []

    def translate(self, expr_text: str) -> TCol:
        try:
            tree = ast.parse(expr_text.strip(), mode='eval')
        except SyntaxError:
            raise  # surfaced as ('syntax error', …) by the API layer
        return self._expr(tree.body)

    def translate_predicate(self, expr_text: str) -> Column:
        tree = ast.parse(expr_text.strip(), mode='eval')
        return self._predicate(tree.body)

    def _predicate(self, node: ast.expr) -> Column:
        """Translate a node used in boolean context (WHERE, if-test, not).

        and/or combine as boolean predicates here; in value context
        (:meth:`_expr`) they keep Python operand-value semantics instead.
        Null parts behave as falsy, matching Python truthiness of None.
        """
        if isinstance(node, ast.BoolOp):
            parts = [self._predicate(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            return ~self._predicate(node.operand)
        if isinstance(node, ast.Call):
            # JS-dialect &&/||/!/?? combine as JS-truthiness predicates
            from .jsdialect import native as _jsnative
            js_path = _jsnative.js_name_path(node.func)
            if js_path is not None:
                return _jsnative.translate_predicate(self, node, js_path)
        return as_predicate(self._expr(node))

    # ------------------------------------------------------------------

    # Python datetime attribute → Spark extraction function (value parity:
    # both return ints; .weekday() handled in _method_call)
    _DT_ATTRS = {
        'year': F.year, 'month': F.month, 'day': F.day,
        'hour': F.hour, 'minute': F.minute, 'second': F.second,
    }

    # math.<fn> with identical float semantics in the JVM
    _MATH_FNS = {
        'sqrt': F.sqrt, 'floor': lambda c: F.floor(c).cast('long'),
        'ceil': lambda c: F.ceil(c).cast('long'),
        'log': F.log, 'log2': F.log2, 'log10': F.log10,
        'exp': F.exp, 'sin': F.sin, 'cos': F.cos, 'tan': F.tan,
        'asin': F.asin, 'acos': F.acos, 'atan': F.atan,
        'degrees': F.degrees, 'radians': F.radians, 'fabs': F.abs,
        'trunc': lambda c: c.cast('long'),
    }
    _MATH_INT_RESULT = {'floor', 'ceil', 'trunc'}

    def _var(self, node: ast.expr) -> VarRef | None:
        """Recognize a variable-reference node; None if not a variable."""
        b = self.binding
        if isinstance(node, ast.Name):
            m = re.match(r'^([ab])([1-9][0-9]*)$', node.id)
            if m:
                return b.resolve_index(m.group(1), int(m.group(2)), node.id)
            return b.resolve_builtin(node.id)
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name) and node.value.id in ('a', 'b'):
            if node.attr == 'NR':
                return b.resolve_builtin('NR' if node.value.id == 'a' else 'bNR')
            return b.resolve_name(node.value.id, node.attr, ast.unparse(node), attr_style=True)
        if isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name) and node.value.id in ('a', 'b'):
            sl = node.slice
            if isinstance(sl, ast.Constant):
                if isinstance(sl.value, str):
                    return b.resolve_name(node.value.id, sl.value, ast.unparse(node), attr_style=False)
                if isinstance(sl.value, int):
                    return b.resolve_index(node.value.id, sl.value, ast.unparse(node))
        return None

    def _expr(self, node: ast.expr) -> TCol:
        ref = self._var(node)
        if ref is not None:
            col, tag = self.binding.spark_column(ref)
            return TCol(col, tag)

        if isinstance(node, ast.Constant):
            v = node.value
            if v is None:
                return TCol(F.lit(None), 'null')
            if isinstance(v, bool):
                return TCol(F.lit(v), 'bool')
            if isinstance(v, int):
                return TCol(F.lit(v), 'int')
            if isinstance(v, float):
                return TCol(F.lit(v), 'float')
            if isinstance(v, str):
                return TCol(F.lit(v), 'str')
            raise TranslationFallback('constant {!r}'.format(v))

        if isinstance(node, ast.Attribute):
            # datetime component access on timestamp/date columns
            base = self._expr(node.value)
            if base.tag in ('ts', 'date') and node.attr in self._DT_ATTRS:
                return TCol(self._DT_ATTRS[node.attr](base.col).cast('long'), 'int')
            raise TranslationFallback('attribute .{} on {}'.format(node.attr, base.tag))
        if isinstance(node, ast.BinOp):
            return self._binop(node)
        if isinstance(node, ast.UnaryOp):
            return self._unaryop(node)
        if isinstance(node, ast.Compare):
            return self._compare(node)
        if isinstance(node, ast.BoolOp):
            # Value position: Python and/or return an OPERAND, not a boolean
            # (`a1 or "default"` → 'x' or 'default', never True/False).
            vals = [self._expr(v) for v in node.values]
            tag = vals[0].tag
            for v in vals[1:]:
                if v.tag == tag:
                    continue
                if _is_num(v.tag) and _is_num(tag):
                    # Python returns the winning OPERAND with its own type
                    # ('a.n or 0.5' can yield int 7); a merged numeric Spark
                    # column would render it 7.0 — punt to the Python
                    # evaluator for value parity
                    raise TranslationFallback('int/float-mixed and/or in value position')
                elif tag == 'null':
                    tag = v.tag
                elif v.tag != 'null':
                    raise TranslationFallback('mixed-type and/or in value position')
            preds = [as_predicate(v) for v in vals[:-1]]  # last operand is never tested
            col = vals[-1].col
            for v, p in zip(reversed(vals[:-1]), reversed(preds)):
                if isinstance(node.op, ast.Or):
                    col = F.when(p, v.col).otherwise(col)   # first truthy operand
                else:
                    col = F.when(p, col).otherwise(v.col)   # first falsy operand
            return TCol(col, tag)
        if isinstance(node, ast.IfExp):
            test = self._predicate(node.test)
            body = self._expr(node.body)
            orelse = self._expr(node.orelse)
            if (_is_num(body.tag) and _is_num(orelse.tag)
                    and body.tag != orelse.tag):
                # branches of different numeric kinds: the reference keeps
                # the taken branch's RUNTIME type per cell (`a1 if c else
                # 2.5` can yield int 4); a merged double column would
                # render it 4.0 — punt to the Python evaluator, whose
                # inference now carries int/float mixes as tagged cells
                raise TranslationFallback('int/float-mixed conditional')
            tag = body.tag if body.tag == orelse.tag else (
                body.tag if orelse.tag == 'null'
                else (orelse.tag if body.tag == 'null' else None))
            if tag is None:
                raise TranslationFallback('mixed-type conditional')
            return TCol(F.when(test, body.col).otherwise(orelse.col), tag)
        if isinstance(node, ast.Call):
            return self._call(node)
        if isinstance(node, ast.JoinedStr):
            return self._fstring(node)
        if isinstance(node, (ast.Tuple, ast.List)):
            elems = [self._expr(e) for e in node.elts]
            tags = {e.tag for e in elems}
            if tags <= {'str', 'null'}:
                return TCol(F.array(*[e.col for e in elems]), 'array:str')
            if tags == {'int'}:
                # keep ints ints: the reference renders [1, 2], not [1.0, 2.0]
                return TCol(F.array(*[e.col.cast('long') for e in elems]), 'array:int')
            if tags == {'float'}:
                return TCol(F.array(*[e.col.cast('double') for e in elems]), 'array:float')
            raise TranslationFallback('heterogeneous collection literal')
        if isinstance(node, ast.Subscript):
            return self._subscript(node)
        raise TranslationFallback('unsupported node {}'.format(type(node).__name__))

    def _subscript(self, node: ast.Subscript) -> TCol:
        base = self._expr(node.value)
        if isinstance(node.slice, ast.Constant) and isinstance(node.slice.value, int) and not isinstance(node.slice.value, bool):
            i = node.slice.value
            if base.tag.startswith('array:'):
                elem_tag = base.tag.split(':', 1)[1]
                if i >= 0:
                    # Python raises IndexError OOB; element_at yields null.
                    # get() (0-based, null OOB) — accept null-vs-raise divergence
                    # only in the no-error case: valid index behaves identically.
                    return TCol(F.get(base.col, i), elem_tag)
                return TCol(F.try_element_at(base.col, F.lit(i)), elem_tag)  # negative = from end
            if base.tag == 'str':
                if i >= 0:
                    return TCol(F.substring(base.col, i + 1, 1), 'str')
                return TCol(F.substring(base.col, F.length(base.col) + i + 1, F.lit(1)), 'str')
        if isinstance(node.slice, ast.Slice):
            if base.tag == 'str' and node.slice.step is None:
                lo = node.slice.lower
                hi = node.slice.upper
                lo_v = lo.value if isinstance(lo, ast.Constant) else (None if lo is None else '?')
                hi_v = hi.value if isinstance(hi, ast.Constant) else (None if hi is None else '?')
                if lo_v != '?' and hi_v != '?':
                    if (lo_v is None or lo_v >= 0) and (hi_v is None or hi_v >= 0):
                        start = (lo_v or 0)
                        if hi_v is None:
                            return TCol(F.substring(base.col, start + 1, 2 ** 30), 'str')
                        length = max(hi_v - start, 0)
                        return TCol(F.substring(base.col, start + 1, length), 'str')
                    if lo_v is not None and lo_v < 0 and hi_v is None:
                        # s[-n:] — last n chars
                        return TCol(F.when(F.length(base.col) >= -lo_v, F.substring(base.col, F.length(base.col) + lo_v + 1, F.lit(2 ** 30))).otherwise(base.col), 'str')
        raise TranslationFallback('unsupported subscript')

    # ------------------------------------------------------------------

    def _binop(self, node: ast.BinOp) -> TCol:
        lhs = self._expr(node.left)
        rhs = self._expr(node.right)
        op = node.op
        if isinstance(op, ast.Add):
            if lhs.tag == 'str' and rhs.tag == 'str':
                return TCol(F.concat(lhs.col, rhs.col), 'str')
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                return TCol(lhs.col + rhs.col, _merge_num(lhs.tag, rhs.tag))
            if lhs.tag.startswith('array:') and lhs.tag == rhs.tag:
                return TCol(F.concat(lhs.col, rhs.col), lhs.tag)
            raise TranslationFallback('+ on {}/{}'.format(lhs.tag, rhs.tag))
        if isinstance(op, (ast.Sub, ast.Mult)):
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                col = lhs.col - rhs.col if isinstance(op, ast.Sub) else lhs.col * rhs.col
                return TCol(col, _merge_num(lhs.tag, rhs.tag))
            raise TranslationFallback('arith on {}/{}'.format(lhs.tag, rhs.tag))
        if isinstance(op, ast.Div):
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                return TCol(lhs.col.cast('double') / rhs.col.cast('double'), 'float')
            raise TranslationFallback('div on {}/{}'.format(lhs.tag, rhs.tag))
        if isinstance(op, ast.FloorDiv):
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                col = F.floor(lhs.col.cast('double') / rhs.col.cast('double'))
                if lhs.tag == 'int' and rhs.tag == 'int':
                    return TCol(col.cast('long'), 'int')
                return TCol(col.cast('double'), 'float')
            raise TranslationFallback('// on {}/{}'.format(lhs.tag, rhs.tag))
        if isinstance(op, ast.Mod):
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                # Python % takes the sign of the divisor: ((a % b) + b) % b
                col = ((lhs.col % rhs.col) + rhs.col) % rhs.col
                return TCol(col, _merge_num(lhs.tag, rhs.tag))
            raise TranslationFallback('% on {}/{}'.format(lhs.tag, rhs.tag))
        if isinstance(op, ast.Pow):
            if _is_num(lhs.tag) and _is_num(rhs.tag):
                return TCol(F.pow(lhs.col, rhs.col), 'float')
            raise TranslationFallback('** on {}/{}'.format(lhs.tag, rhs.tag))
        raise TranslationFallback('operator {}'.format(type(op).__name__))

    def _unaryop(self, node: ast.UnaryOp) -> TCol:
        if isinstance(node.op, ast.Not):
            return TCol(~self._predicate(node.operand), 'bool')
        val = self._expr(node.operand)
        if isinstance(node.op, ast.USub) and _is_num(val.tag):
            return TCol(-val.col, val.tag)
        if isinstance(node.op, ast.UAdd) and _is_num(val.tag):
            return val
        raise TranslationFallback('unary {}'.format(type(node.op).__name__))

    _COMPARABLE = {'int', 'float', 'str', 'bool', 'ts', 'date'}

    def _compare(self, node: ast.Compare) -> TCol:
        out: Column | None = None
        left = self._expr(node.left)
        for op, comparator in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)):
                if not (isinstance(comparator, ast.Constant) and comparator.value is None):
                    raise TranslationFallback('is: only None comparisons')
                if left.tag == 'match_opt':
                    # match is None ⟺ the pattern did not match; a NULL
                    # input (no string to search) also yields no match
                    hit = left.col.eqNullSafe(F.lit(True))
                    piece = ~hit if isinstance(op, ast.Is) else hit
                else:
                    piece = left.col.isNull() if isinstance(op, ast.Is) else left.col.isNotNull()
                left = TCol(F.lit(None), 'null')  # chained after `is` is weird; keep simple
            elif isinstance(op, (ast.In, ast.NotIn)):
                if isinstance(comparator, (ast.List, ast.Tuple, ast.Set)):
                    if not all(isinstance(e, ast.Constant) for e in comparator.elts):
                        raise TranslationFallback('in: non-literal collection')
                    vals = [e.value for e in comparator.elts]
                    # Python membership is VALUE equality: None in ['x']
                    # is False (not SQL NULL), and None in [None] is True
                    # — coalesce the three-valued isin to False and test
                    # a literal None explicitly
                    nonnull = [v for v in vals if v is not None]
                    piece = F.coalesce(
                        left.col.isin(nonnull) if nonnull else F.lit(False),
                        F.lit(False))
                    if any(v is None for v in vals):
                        piece = piece | left.col.isNull()
                    right = left
                else:
                    right = self._expr(comparator)
                    if right.tag == 'str' and left.tag == 'str':
                        piece = right.col.contains(left.col)
                    elif right.tag.startswith('array:'):
                        piece = F.array_contains(right.col, left.col)
                    else:
                        raise TranslationFallback('in on {}'.format(right.tag))
                if isinstance(op, ast.NotIn):
                    piece = ~piece
                left = right
            else:
                right = self._expr(comparator)
                lt, rt = left.tag, right.tag
                compatible = (
                    (_is_num(lt) and _is_num(rt))
                    or (lt == rt and lt in self._COMPARABLE)
                    or ('null' in (lt, rt))
                    or (lt in ('ts', 'date') and rt in ('ts', 'date'))
                )
                if not compatible:
                    # Python would raise (ordering) or return False (==) on
                    # mixed types where Spark would implicitly cast — reject.
                    raise TranslationFallback('compare {} vs {}'.format(lt, rt))
                if isinstance(op, ast.Eq):
                    # Python equality with None is a VALUE comparison
                    # (None == x → False, None == None → True) — exactly
                    # null-safe equality, not SQL three-valued logic
                    piece = left.col.eqNullSafe(right.col)
                elif isinstance(op, ast.NotEq):
                    piece = ~left.col.eqNullSafe(right.col)
                elif isinstance(op, ast.Lt):
                    piece = left.col < right.col
                elif isinstance(op, ast.LtE):
                    piece = left.col <= right.col
                elif isinstance(op, ast.Gt):
                    piece = left.col > right.col
                elif isinstance(op, ast.GtE):
                    piece = left.col >= right.col
                else:
                    raise TranslationFallback('comparison {}'.format(type(op).__name__))
                left = right
            out = piece if out is None else (out & piece)
        return TCol(out, 'bool')

    # ------------------------------------------------------------------

    def _none_type_error(self, py_msg: str) -> Column:
        """A column that raises the real-Python TypeError the moment any
        row evaluates it — the native rendering of an expression the
        reference can only FAIL on (len(None)/int(None)/float(None) of an
        out-of-width field: safe_get None, rbql_engine.py:249-250, wrapped
        by the main loop at 756-767).  On a ZERO-row table nothing
        evaluates, so the query succeeds with the right output TYPE —
        closing the empty-table evaluator fallbacks (round 13).  Record
        numbers: exact when the stage attached dense NR; on the
        surrogate path the visible number is the partition-ordinal
        approximation and the raw surrogate rides on a marker line that
        the driver-side unwrap resolves to the exact input record number
        (engine._make_surrogate_resolver, round 14)."""
        if self.record_errors:
            # the raise is unconditional where it is reached — as the
            # whole expression (the out-of-width class) every record
            # fails, so the first-record probe is the constant truth
            self.error_probes.append((F.lit(True), F.lit(py_msg)))
        return self._record_error(F.lit(py_msg))

    def _record_error(self, *msg_parts: Column) -> Column:
        """raise_error column carrying the reference's 'At record N,
        Details: <msg>' wrapper (rbql_engine.py:756-767 wraps every
        per-record runtime error this way) plus the exact-NR surrogate
        marker on the non-dense path."""
        self.uses_nr_col = True
        nr = F.col(NR_COL)
        if self.binding.nr_dense:
            parts = [F.lit('At record '), nr.cast('string'),
                     F.lit(', Details: '), *msg_parts]
        else:
            rec = (nr % F.lit(1 << 33)) + 1
            parts = [F.lit('At record '), rec.cast('string'),
                     F.lit(', Details: '), *msg_parts,
                     F.lit('\n__RBQL_SURR_'), nr.cast('string'), F.lit('__')]
        return F.raise_error(F.concat(*parts))

    def _value_error(self, fire_cond: Column, *msg_parts: Column) -> Column:
        """Value-parity guard message (int('x') / float('x')): record-
        wrapped when record_errors (ordinary stages), bare when the
        engine translates for early-filter pushdown (NR not attached yet).
        ``fire_cond`` is the exact condition under which the guard raises
        — registered as a first-failing-record probe together with the
        Details message COLUMN, so the error path can re-render the
        min-NR row's exact message (prefix + quoted value, r14 verdict
        #2) even when a later row's task failed first or the guard ran
        recordless inside a pushed-down WHERE."""
        msg = F.concat(*msg_parts)
        self.error_probes.append((fire_cond, msg))
        if self.record_errors:
            return self._record_error(*msg_parts)
        return F.raise_error(msg)

    def _call(self, node: ast.Call) -> TCol:
        if node.keywords:
            raise TranslationFallback('keyword arguments')
        fn = node.func
        # JS-dialect runtime helpers (__js__.<op>) — ECMAScript-semantics
        # native translation (jsdialect/native.py)
        from .jsdialect import native as _jsnative
        js_path = _jsnative.js_name_path(fn)
        if js_path is not None:
            return _jsnative.translate_value(self, node, js_path)
        # datetime constructors with literal args → Spark literal
        if isinstance(fn, ast.Attribute) and isinstance(fn.value, ast.Name) and fn.value.id == 'datetime':
            if fn.attr in ('date', 'datetime') and all(
                isinstance(a, ast.Constant) and isinstance(a.value, int) for a in node.args
            ):
                vals = [a.value for a in node.args]
                if fn.attr == 'date':
                    return TCol(F.lit(_dt.date(*vals)), 'date')
                return TCol(F.lit(_dt.datetime(*vals)), 'ts')
            raise TranslationFallback('datetime call')

        if isinstance(fn, ast.Attribute) and isinstance(fn.value, ast.Name) and fn.value.id == 'math':
            if fn.attr in self._MATH_FNS and len(node.args) == 1:
                v = self._expr(node.args[0])
                if _is_num(v.tag):
                    out_tag = 'int' if fn.attr in self._MATH_INT_RESULT else 'float'
                    return TCol(self._MATH_FNS[fn.attr](v.col), out_tag)
            if fn.attr == 'pow' and len(node.args) == 2:
                x, y = self._expr(node.args[0]), self._expr(node.args[1])
                if _is_num(x.tag) and _is_num(y.tag):
                    return TCol(F.pow(x.col, y.col), 'float')
            raise TranslationFallback('math.{}'.format(fn.attr))

        if isinstance(fn, ast.Attribute) and isinstance(fn.value, ast.Name) \
                and fn.value.id == 're' \
                and fn.attr in ('search', 'match', 'fullmatch') \
                and len(node.args) == 2 \
                and isinstance(node.args[0], ast.Constant) \
                and isinstance(node.args[0].value, str):
            pat = node.args[0].value
            if not _java_safe_regex(pat):
                raise TranslationFallback('re.{} pattern outside the '
                                          'Java-identical subset'.format(fn.attr))
            target = self._expr(node.args[1])
            if target.tag != 'str':
                raise TranslationFallback('re.{} on {}'.format(fn.attr, target.tag))
            if fn.attr == 'match':
                jpat = '^(?:{})'.format(pat)
            elif fn.attr == 'fullmatch':
                jpat = '^(?:{})$'.format(pat)
            else:
                jpat = pat
            # tag 'match_opt': truthy/None-comparison views of a would-be
            # Match object; any other use (e.g. .group()) falls back
            return TCol(target.col.rlike(jpat), 'match_opt')

        if isinstance(fn, ast.Attribute):
            return self._method_call(fn, node.args)

        if not isinstance(fn, ast.Name):
            raise TranslationFallback('computed callee')
        name = fn.id
        args = node.args

        if name in ('like', 'LIKE') and len(args) == 2:
            text = self._expr(args[0])
            if text.tag != 'str':
                raise TranslationFallback('like() on non-string')
            if isinstance(args[1], ast.Constant) and isinstance(args[1].value, str):
                # reference like_to_regex: rbql_engine.py:267-281 (% → .*, _ → .)
                return TCol(text.col.rlike(like_to_java_regex(args[1].value)), 'bool')
            raise TranslationFallback('like() with non-literal pattern')

        if name == 'int' and len(args) == 1:
            v = self._expr(args[0])
            if v.tag in ('int', 'bool'):
                return TCol(v.col.cast('long'), 'int')
            if v.tag == 'float':
                # Python int() truncates toward zero; Spark double→long cast
                # also truncates toward zero.
                return TCol(v.col.cast('long'), 'int')
            if v.tag == 'str':
                # Python-parity guard: unparseable non-null strings raise
                # (int('x') → ValueError) instead of silently becoming null.
                # Exotic accepted-by-Python forms ('1_0') raise here instead;
                # int(None) propagates null rather than raising.
                casted = v.col.try_cast('long')
                fire = v.col.isNotNull() & casted.isNull()
                guarded = F.when(
                    fire,
                    self._value_error(
                        fire,
                        F.lit("invalid literal for int() with base 10: '"),
                        v.col, F.lit("'"))
                ).otherwise(casted)
                return TCol(guarded, 'int')
            if v.tag == 'null':
                return TCol(self._none_type_error(
                    'int() argument must be a string, a bytes-like object '
                    "or a real number, not 'NoneType'").cast('long'), 'int')
            raise TranslationFallback('int() on {}'.format(v.tag))
        if name == 'float' and len(args) == 1:
            v = self._expr(args[0])
            if v.tag in _NUM or v.tag == 'bool':
                return TCol(v.col.cast('double'), 'float')
            if v.tag == 'str':
                casted = v.col.try_cast('double')
                fire = v.col.isNotNull() & casted.isNull()
                guarded = F.when(
                    fire,
                    self._value_error(
                        fire,
                        F.lit("could not convert string to float: '"),
                        v.col, F.lit("'"))
                ).otherwise(casted)
                return TCol(guarded, 'float')
            if v.tag == 'null':
                return TCol(self._none_type_error(
                    'float() argument must be a string or a real number, '
                    "not 'NoneType'").cast('double'), 'float')
            raise TranslationFallback('float() on {}'.format(v.tag))
        if name == 'str' and len(args) == 1:
            v = self._expr(args[0])
            if v.tag in ('int', 'str'):
                return TCol(_py_str(v.col), 'str')
            if v.tag == 'float':
                # Spark double→string ('1.0E16') diverges from Python repr
                # ('1e+16') for large/small magnitudes — evaluate in Python.
                raise TranslationFallback('str() on float')
            if v.tag == 'bool':
                # null FIRST: otherwise a NULL cell falls to 'False' while
                # Python str(None) is 'None'
                return TCol(F.when(v.col.isNull(), F.lit('None'))
                             .when(v.col, F.lit('True'))
                             .otherwise(F.lit('False')), 'str')
            if v.tag == 'null':
                return TCol(F.lit('None'), 'str')
            raise TranslationFallback('str() on {}'.format(v.tag))
        if name == 'abs' and len(args) == 1:
            v = self._expr(args[0])
            if _is_num(v.tag):
                return TCol(F.abs(v.col), v.tag)
        if name == 'len' and len(args) == 1:
            v = self._expr(args[0])
            if v.tag == 'str':
                return TCol(F.length(v.col).cast('long'), 'int')
            if v.tag.startswith('array:'):
                return TCol(F.size(v.col).cast('long'), 'int')
            if v.tag == 'null':
                return TCol(self._none_type_error(
                    "object of type 'NoneType' has no len()").cast('long'),
                    'int')
        if name == 'round':
            v = self._expr(args[0])
            if v.tag == 'float':
                # Python rounds the BINARY double (round(2.675, 2) → 2.67)
                # while bround works on the decimal rendering (→ 2.68), and
                # single-arg round(float) returns int — evaluate in Python.
                raise TranslationFallback('round() on float')
            if v.tag == 'int':
                nd = 0
                if len(args) == 2:
                    nd_node = args[1]
                    neg = False
                    if isinstance(nd_node, ast.UnaryOp) and isinstance(nd_node.op, ast.USub):
                        neg, nd_node = True, nd_node.operand
                    if not (isinstance(nd_node, ast.Constant) and isinstance(nd_node.value, int)):
                        raise TranslationFallback('round() ndigits must be literal')
                    nd = -nd_node.value if neg else nd_node.value
                if nd >= 0:
                    return v  # identity on ints
                # negative ndigits on ints: banker's rounding → bround HALF_EVEN
                return TCol(F.bround(v.col, nd).cast('long'), 'int')
        if name in ('min', 'max') and len(args) >= 2:
            vals = [self._expr(a) for a in args]
            if all(_is_num(v.tag) for v in vals) or all(v.tag == 'str' for v in vals):
                f = F.least if name == 'min' else F.greatest
                tag = vals[0].tag if len({v.tag for v in vals}) == 1 else 'float'
                return TCol(f(*[v.col for v in vals]), tag)
        raise TranslationFallback('call {}()'.format(name))

    _WS_LEAD = r'^[\s ]+'
    _WS_TRAIL = r'[\s ]+$'

    def _method_call(self, fn: ast.Attribute, args: list[ast.expr]) -> TCol:
        base = self._expr(fn.value)
        m = fn.attr
        if base.tag == 'str':
            if m == 'format' and isinstance(fn.value, ast.Constant) \
                    and isinstance(fn.value.value, str):
                return self._literal_format(fn.value.value, args)
            if m == 'lower' and not args:
                return TCol(F.lower(base.col), 'str')
            if m == 'upper' and not args:
                return TCol(F.upper(base.col), 'str')
            if m == 'strip' and not args:
                return TCol(F.regexp_replace(F.regexp_replace(base.col, self._WS_LEAD, ''), self._WS_TRAIL, ''), 'str')
            if m == 'lstrip' and not args:
                return TCol(F.regexp_replace(base.col, self._WS_LEAD, ''), 'str')
            if m == 'rstrip' and not args:
                return TCol(F.regexp_replace(base.col, self._WS_TRAIL, ''), 'str')
            if m in ('startswith', 'endswith') and len(args) == 1:
                arg = self._expr(args[0])
                if arg.tag == 'str':
                    f = F.startswith if m == 'startswith' else F.endswith
                    return TCol(f(base.col, arg.col), 'bool')
            if m == 'replace' and len(args) == 2:
                a0, a1 = self._expr(args[0]), self._expr(args[1])
                if a0.tag == 'str' and a1.tag == 'str':
                    return TCol(F.replace(base.col, a0.col, a1.col), 'str')
            if m == 'split':
                if len(args) == 0:
                    stripped = F.regexp_replace(F.regexp_replace(base.col, self._WS_LEAD, ''), self._WS_TRAIL, '')
                    return TCol(F.when(stripped == '', F.array().cast('array<string>'))
                                .otherwise(F.split(stripped, r'\s+')), 'array:str')
                if len(args) == 1 and isinstance(args[0], ast.Constant) and isinstance(args[0].value, str):
                    # limit=-1 keeps trailing empty strings, matching Python
                    return TCol(F.split(base.col, re.escape(args[0].value), -1), 'array:str')
            if m == 'find' and len(args) == 1:
                arg = self._expr(args[0])
                if arg.tag == 'str':
                    return TCol((F.instr(base.col, arg.col) - 1).cast('long'), 'int')
            if m == 'count' and len(args) == 1 and isinstance(args[0], ast.Constant) \
                    and isinstance(args[0].value, str) and args[0].value:
                # non-overlapping substring count, same as Python str.count
                sub = args[0].value
                diff = F.length(base.col) - F.length(F.replace(base.col, F.lit(sub), F.lit('')))
                return TCol((diff / len(sub)).cast('long'), 'int')
            if m == 'zfill' and len(args) == 1 and isinstance(args[0], ast.Constant) \
                    and isinstance(args[0].value, int):
                # Python zfill never truncates and inserts zeros AFTER a
                # leading sign: '-5'.zfill(4) → '-005', 'abcdef'.zfill(3)
                # stays 'abcdef' (a bare lpad would corrupt both).
                w = args[0].value
                first = F.substring(base.col, 1, 1)
                rest = F.substring(base.col, 2, 2 ** 30)
                padded = (F.when(F.length(base.col) >= w, base.col)
                          .when(first.isin('+', '-'),
                                F.concat(first, F.lpad(rest, max(w - 1, 0), '0')))
                          .otherwise(F.lpad(base.col, w, '0')))
                return TCol(padded, 'str')
            if m == 'title' and not args:
                return TCol(F.initcap(base.col), 'str')
            if m == 'capitalize' and not args:
                return TCol(F.concat(F.upper(F.substring(base.col, 1, 1)),
                                     F.lower(F.substring(base.col, 2, 2 ** 30))), 'str')
            if m in ('isdigit', 'isalpha', 'isalnum', 'isspace') and not args:
                pat = {'isdigit': r'^[0-9]+$', 'isalpha': r'^\p{L}+$',
                       'isalnum': r'^[\p{L}\p{N}]+$', 'isspace': r'^\s+$'}[m]
                return TCol(base.col.rlike(pat), 'bool')
            if m == 'join' and len(args) == 1:
                arg = self._expr(args[0])
                if arg.tag.startswith('array:'):
                    if isinstance(fn.value, ast.Constant) and isinstance(fn.value.value, str):
                        return TCol(F.array_join(arg.col, fn.value.value), 'str')
        if base.tag in ('ts', 'date'):
            if m == 'weekday' and not args:
                # Python: Monday=0; Spark dayofweek: Sunday=1
                return TCol(((F.dayofweek(base.col) + 5) % 7).cast('long'), 'int')
            if m == 'isoformat' and not args and base.tag == 'date':
                return TCol(F.date_format(base.col, 'yyyy-MM-dd'), 'str')
            if m == 'date' and not args and base.tag == 'ts':
                return TCol(F.to_date(base.col), 'date')
        raise TranslationFallback('method .{}() on {}'.format(m, base.tag))

    def _literal_format(self, tmpl: str, args: list[ast.expr]) -> TCol:
        """'{} ({})'.format(x, y) on a LITERAL template → concat, the same
        translation (and the same str/int-only operand rule — Spark's
        double rendering diverges from Python repr) as f-strings.  Only
        bare auto-numbered '{}' placeholders qualify; indexed/named/spec'd
        placeholders keep the Python evaluator."""
        segs: list[str] = ['']
        i, n = 0, len(tmpl)
        while i < n:
            two = tmpl[i:i + 2]
            if two == '{{':
                segs[-1] += '{'
                i += 2
            elif two == '}}':
                segs[-1] += '}'
                i += 2
            elif two == '{}':
                segs.append('')
                i += 2
            elif tmpl[i] in '{}':
                raise TranslationFallback('format() placeholder with spec')
            else:
                segs[-1] += tmpl[i]
                i += 1
        if len(segs) - 1 != len(args):
            raise TranslationFallback('format() arity mismatch')
        parts: list[Column] = []
        if segs[0]:
            parts.append(F.lit(segs[0]))
        for seg, arg in zip(segs[1:], args):
            v = self._expr(arg)
            if v.tag not in ('str', 'int', 'null'):
                raise TranslationFallback('format() on {}'.format(v.tag))
            parts.append(_py_str(v.col))
            if seg:
                parts.append(F.lit(seg))
        return TCol(F.concat(*parts) if parts else F.lit(''), 'str')

    def _fstring(self, node: ast.JoinedStr) -> TCol:
        parts: list[Column] = []
        for piece in node.values:
            if isinstance(piece, ast.Constant):
                parts.append(F.lit(piece.value))
                continue
            if isinstance(piece, ast.FormattedValue):
                if piece.conversion != -1 or piece.format_spec is not None:
                    raise TranslationFallback('f-string format spec')
                v = self._expr(piece.value)
                # floats excluded: Spark double→string formatting diverges
                # from Python repr for large/small magnitudes
                if v.tag in ('str', 'int', 'null'):
                    parts.append(_py_str(v.col))
                    continue
            raise TranslationFallback('f-string piece')
        return TCol(F.concat(*parts) if parts else F.lit(''), 'str')
