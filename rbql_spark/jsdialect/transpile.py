"""JS AST → Python expression source (the engine's native dialect).

The output obeys one invariant: evaluating the generated Python over the
engine's row environment (a/b records, a1.., NR/NF/… builtins, the
``__js__`` runtime module and the per-query ``__jsenv__`` environment in
globals) produces exactly the value V8 would produce for the original JS
expression over the same cells.  Where Python and JS semantics coincide
(literals, column refs, indexing the a/b records) plain Python is
emitted so the native Column translator keeps those shapes JVM-side;
everything divergent routes through ``__js__`` helpers, which the
translator also recognizes for the common cases (see translator.py).

RBQL-grammar surfaces are preserved verbatim so the shared engine
machinery keeps working on the transpiled text:
  * aggregate calls   MIN/MAX/COUNT/SUM/AVG/VARIANCE/MEDIAN/ANY_VALUE/
                      ARRAY_AGG/UNNEST (any reference-accepted casing,
                      rbql-js/rbql.js:540-577,269-279) stay top-level
                      calls under their original names;
  * like()/LIKE()     map to the shared like() function;
  * column variables  a1../b1.., a.attr, a["name"], a[1], NR, NF, aNR,
                      bNR, bNF, NU, RBQL_VERSION pass through.
"""

from __future__ import annotations

import re

from .jsparser import JsSyntaxError, parse_js_expression

# names the engine's row environment binds — never treated as JS globals
_VAR_RGX = re.compile(r'^[ab][0-9]+$')
_BUILTIN_VARS = {'a', 'b', 'NR', 'NF', 'aNR', 'bNR', 'bNF', 'NU', 'RBQL_VERSION'}

# reference-accepted aggregate spellings (rbql-js/rbql.js:534-579: every
# function plus lowercase/Titlecase consts; UNFOLD is the deprecated
# UNNEST alias, rbql.js:279)
_AGG_UPPER = {'MIN', 'MAX', 'COUNT', 'SUM', 'AVG', 'VARIANCE', 'MEDIAN',
              'ANY_VALUE', 'ARRAY_AGG', 'UNNEST', 'UNFOLD'}

_NAMESPACES = {'Math', 'JSON', 'String', 'Number', 'Object', 'Array'}
_GLOBAL_FUNCS = {'parseInt', 'parseFloat', 'isNaN', 'isFinite', 'RegExp'}
_GLOBAL_CONSTS = {'NaN': '__js__.NaN', 'Infinity': '__js__.Infinity'}


class _Transpiler:
    def __init__(self):
        self.scopes: list[set[str]] = []   # arrow-function parameter scopes

    def _in_scope(self, name: str) -> bool:
        return any(name in s for s in self.scopes)

    # ------------------------------------------------------------------
    def emit(self, node) -> str:
        kind = node[0]
        fn = getattr(self, '_e_' + kind, None)
        if fn is None:
            raise JsSyntaxError('Unsupported expression form: {}'.format(kind))
        return fn(node)

    def _e_num(self, node) -> str:
        v = node[1]
        if isinstance(v, float) and v.is_integer() and abs(v) <= 2 ** 53:
            v = int(v)
        return repr(v)

    def _e_str(self, node) -> str:
        return repr(node[1])

    def _e_const(self, node) -> str:
        v = node[1]
        if v is None:
            return 'None'
        if v is True:
            return 'True'
        if v is False:
            return 'False'
        if v == 'undefined':
            return '__js__.undefined'
        return repr(v)

    def _e_regex(self, node) -> str:
        return '__js__.RegExp({!r}, {!r})'.format(node[1], node[2])

    def _e_name(self, node) -> str:
        name = node[1]
        if self._in_scope(name):
            return name
        if _VAR_RGX.match(name) or name in _BUILTIN_VARS:
            return name
        if name in ('like', 'LIKE'):
            # JS like() ToString-coerces its operand (RegExp.test
            # semantics, rbql-js/rbql.js:243) — route to the runtime's
            # coercing wrapper, NOT the shared Python py_like (which
            # reproduces rbql-py's re.match TypeError on non-strings)
            return '__js__.like'
        if name in _NAMESPACES or name in _GLOBAL_FUNCS:
            return '__js__.' + name
        if name in _GLOBAL_CONSTS:
            return _GLOBAL_CONSTS[name]
        return "__jsenv__.ref({!r})".format(name)

    def _e_member(self, node) -> str:
        _, obj, name = node
        if obj[0] == 'name' and obj[1] in ('a', 'b') and not self._in_scope(obj[1]):
            # record attribute: engine variable surface (binding.py)
            return '{}.{}'.format(obj[1], name)
        if obj[0] == 'name' and obj[1] in _NAMESPACES and not self._in_scope(obj[1]):
            from . import runtime
            ns = getattr(runtime, obj[1])
            attr = 'from_' if (obj[1] == 'Array' and name == 'from') else name
            if hasattr(type(ns), attr) or hasattr(ns, attr):
                return '__js__.{}.{}'.format(obj[1], attr)
            return "__js__.member(__js__.{}, {!r})".format(obj[1], name)
        return '__js__.member({}, {!r})'.format(self.emit(obj), name)

    def _e_index(self, node) -> str:
        _, obj, key = node
        if obj[0] == 'name' and obj[1] in ('a', 'b') and not self._in_scope(obj[1]):
            # a[1] / a["name"] — engine variable surface
            if key[0] == 'num' and isinstance(key[1], int):
                return '{}[{}]'.format(obj[1], key[1])
            if key[0] == 'str':
                return '{}[{!r}]'.format(obj[1], key[1])
        return '__js__.index({}, {})'.format(self.emit(obj), self.emit(key))

    def _e_call(self, node) -> str:
        _, callee, args = node
        spread_args = any(a[0] == 'spread' for a in args)

        def arglist() -> str:
            out = []
            for a in args:
                if a[0] == 'spread':
                    out.append('*__js__.spread({})'.format(self.emit(a[1])))
                else:
                    out.append(self.emit(a))
            return ', '.join(out)

        if callee[0] == 'name' and not self._in_scope(callee[1]):
            name = callee[1]
            if name.upper() in _AGG_UPPER and not spread_args:
                # aggregate / UNNEST surface: keep the original spelling
                return '{}({})'.format(name, arglist())
            if name in ('like', 'LIKE'):
                # see the name-position branch above: JS like() coerces
                return '__js__.like({})'.format(arglist())
            if name in _GLOBAL_FUNCS:
                return '__js__.{}({})'.format(name, arglist())
            if name in _NAMESPACES:
                # String(x) / Number(x) conversion calls
                return '__js__.{}({})'.format(name, arglist())
            return "__jsenv__.ref({!r})({})".format(name, arglist())
        if callee[0] == 'member':
            _, obj, mname = callee
            target = self._e_member(callee)
            if target.startswith('__js__.') and '(' not in target:
                # namespace member (__js__.Math.floor / __js__.String.raw):
                # direct call keeps the shape the native translator matches
                return '{}({})'.format(target, arglist())
            # anything else — string/array/regex/record-attr methods —
            # dispatches through the runtime with JS method semantics
            return '__js__.method({}, {!r}{}{})'.format(
                self.emit(obj), mname, ', ' if args else '', arglist())
        return '__js__.call({}{}{})'.format(
            self.emit(callee), ', ' if args else '', arglist())

    def _e_tagged_tpl(self, node) -> str:
        _, tag, parts, raw_parts = node
        if tag == ('member', ('name', 'String'), 'raw'):
            return '__js__.String.raw([{}])'.format(self._tpl_items(raw_parts))
        raise JsSyntaxError('Unsupported tagged template')

    def _tpl_items(self, parts) -> str:
        out = []
        for p in parts:
            if isinstance(p, str):
                out.append(repr(p))
            else:
                out.append(self.emit(p))
        return ', '.join(out)

    def _e_tpl(self, node) -> str:
        _, parts, _raw = node
        return '__js__.tpl([{}])'.format(self._tpl_items(parts))

    _UNARY = {'!': 'not_', '-': 'neg', '~': 'bnot'}

    def _e_unary(self, node) -> str:
        _, op, x = node
        if op == '-' and x[0] == 'num':
            v = x[1]
            if isinstance(v, float) and v.is_integer() and abs(v) <= 2 ** 53:
                v = int(v)
            return repr(-v)
        if op == '+':
            return '__js__.jsnum(__js__.to_number(__js__.to_primitive({})))'.format(self.emit(x))
        if op == 'typeof':
            if x[0] == 'name' and not self._in_scope(x[1]) and \
                    not _VAR_RGX.match(x[1]) and x[1] not in _BUILTIN_VARS and \
                    x[1] not in _NAMESPACES and x[1] not in _GLOBAL_FUNCS and \
                    x[1] not in _GLOBAL_CONSTS:
                # typeof of an undeclared identifier: 'undefined', no throw
                return "__js__.typeof_(__jsenv__.ref_safe({!r}))".format(x[1])
            return '__js__.typeof_({})'.format(self.emit(x))
        if op == 'void':
            return '__js__.void_({})'.format(self.emit(x))
        return '__js__.{}({})'.format(self._UNARY[op], self.emit(x))

    _BIN = {
        '+': 'add', '-': 'sub', '*': 'mul', '/': 'div', '%': 'mod',
        '**': 'pow_',
        '<': 'lt', '>': 'gt', '<=': 'le', '>=': 'ge',
        '==': 'loose_eq', '!=': 'loose_ne',
        '===': 'strict_eq', '!==': 'strict_ne',
        '&': 'band', '|': 'bor', '^': 'bxor',
        '<<': 'shl', '>>': 'shr', '>>>': 'ushr',
        'in': 'in_', 'instanceof': 'instanceof_',
    }

    def _e_bin(self, node) -> str:
        _, op, x, y = node
        return '__js__.{}({}, {})'.format(self._BIN[op], self.emit(x), self.emit(y))

    _LOGIC = {'&&': 'and_', '||': 'or_', '??': 'nullish'}

    def _e_logic(self, node) -> str:
        _, op, x, y = node
        return '__js__.{}({}, lambda: {})'.format(
            self._LOGIC[op], self.emit(x), self.emit(y))

    def _e_cond(self, node) -> str:
        _, test, then, els = node
        return '(({}) if __js__.truthy({}) else ({}))'.format(
            self.emit(then), self.emit(test), self.emit(els))

    def _e_arrow(self, node) -> str:
        _, params, body = node
        self.scopes.append(set(params))
        try:
            body_src = self.emit(body)
        finally:
            self.scopes.pop()
        return '(lambda {}: {})'.format(', '.join(params), body_src)

    def _e_array(self, node) -> str:
        items = []
        for it in node[1]:
            if it[0] == 'spread':
                items.append('*__js__.spread({})'.format(self.emit(it[1])))
            else:
                items.append(self.emit(it))
        if len(items) == 1 and items[0].startswith('*'):
            return '[{}]'.format(items[0])
        return '[{}]'.format(', '.join(items))

    def _e_object(self, node) -> str:
        pairs = ['({}, {})'.format(self.emit(k), self.emit(v)) for k, v in node[1]]
        return '__js__.obj([{}])'.format(', '.join(pairs))

    def _e_new(self, node) -> str:
        callee = node[1]
        if callee[0] == 'call':
            return self._e_call(callee)
        # bare `new Foo` without arguments
        return self._e_call(('call', callee, []))

    def _e_spread(self, node) -> str:
        raise JsSyntaxError("Unexpected token '...'")


def js_expr_to_python(js_source: str) -> str:
    """Transpile one JS expression to equivalent Python source."""
    ast_ = parse_js_expression(js_source)
    return _Transpiler().emit(ast_)


def js_update_target_to_python(target: str) -> str:
    """UPDATE assignment targets (a2 / a.attr / a["x"] / a[1]) share the
    engine's variable surface — identity, kept as a named hook."""
    return target
