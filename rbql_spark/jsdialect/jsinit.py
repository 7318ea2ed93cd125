"""Interpreter for JS-dialect user init code (``--init-source-file`` /
``js_init_code``).

The reference evals init code in the query scope (rbql-js/rbql.js
embeds it into the generated loop).  The observable surface is the set
of bindings the query's expressions can call, so this interprets the
statement forms init files actually use — function declarations,
const/let/var declarations, arrow-function assignments, require() —
into Python callables/values collected into a bindings dict for
:class:`rbql_spark.jsdialect.runtime.JsEnv`.

Function bodies support the statement subset: declarations, ``if``/
``else`` chains, ``return``, and bare expression statements.  Anything
richer raises a parsing error naming the construct rather than
silently misbehaving.
"""

from __future__ import annotations

import re

from . import runtime as _rt
from .jsparser import JsSyntaxError, Parser, tokenize
from .transpile import _Transpiler

JS_INIT_MARKER = '#__rbql_js_init__\n'


def _strip_comments(src: str) -> str:
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in '\'"`':
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == '\\' else 1
            out.append(src[i:j + 1])
            i = j + 1
            continue
        if c == '/' and i + 1 < n and src[i + 1] == '/':
            j = src.find('\n', i)
            i = n if j < 0 else j
            continue
        if c == '/' and i + 1 < n and src[i + 1] == '*':
            j = src.find('*/', i + 2)
            i = n if j < 0 else j + 2
            continue
        out.append(c)
        i += 1
    return ''.join(out)


def _split_statements(src: str) -> list[str]:
    """Split on ';' and statement-closing '}' at brace/paren depth zero."""
    parts: list[str] = []
    depth = 0
    start = 0
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in '\'"`':
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == '\\' else 1
            i = j + 1
            continue
        if c in '([{':
            depth += 1
        elif c in ')]}':
            depth -= 1
            if depth == 0 and c == '}':
                parts.append(src[start:i + 1])
                start = i + 1
                i += 1
                continue
        elif c == ';' and depth == 0:
            parts.append(src[start:i])
            start = i + 1
        i += 1
    parts.append(src[start:])
    return [p.strip() for p in parts if p.strip()]


_FUNC_RGX = re.compile(
    r'^(?:async\s+)?function\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*\(([^)]*)\)\s*\{(.*)\}$',
    re.DOTALL)
_DECL_RGX = re.compile(
    r'^(?:const|let|var)\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*=\s*(.*)$', re.DOTALL)
_RETURN_RGX = re.compile(r'^return(?:\s+(.*))?$', re.DOTALL)
_IF_RGX = re.compile(r'^if\s*\(', re.DOTALL)


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def _compile_expr(src: str, scope: set[str]):
    tp = _Transpiler()
    tp.scopes.append(scope)
    py = tp.emit(Parser(src.strip()).parse_expression())
    return compile(py, '<js init expr>', 'eval')


def _parse_body(body: str, scope: set[str]):
    """Body → list of executable steps; `scope` grows with declarations."""
    steps = []
    for stmt in _split_statements(body):
        m = _RETURN_RGX.match(stmt)
        if m is not None:
            expr = m.group(1)
            steps.append(('return', _compile_expr(expr, scope) if expr else None))
            continue
        m = _DECL_RGX.match(stmt)
        if m is not None:
            name, rhs = m.group(1), m.group(2)
            code = _compile_expr(rhs, scope | {name})
            scope.add(name)
            steps.append(('decl', name, code))
            continue
        if _IF_RGX.match(stmt):
            steps.append(_parse_if(stmt, scope))
            continue
        if _FUNC_RGX.match(stmt):
            raise JsSyntaxError('Nested function declarations in init code are not supported')
        # assignment to an existing local: name = expr
        am = re.match(r'^([A-Za-z_$][A-Za-z0-9_$]*)\s*=(?!=)\s*(.*)$', stmt, re.DOTALL)
        if am is not None and am.group(1) in scope:
            steps.append(('assign', am.group(1), _compile_expr(am.group(2), scope)))
            continue
        steps.append(('expr', _compile_expr(stmt, scope)))
    return steps


def _parse_if(stmt: str, scope: set[str]):
    """if (cond) { ... } [else if (…) { … }]* [else { … }] → ('if', [(cond_code|None, steps)])"""
    branches = []
    rest = stmt
    while True:
        m = re.match(r'^if\s*\(', rest)
        if m is None:
            break
        # find matching close paren
        depth = 0
        i = rest.find('(')
        j = i
        while j < len(rest):
            if rest[j] == '(':
                depth += 1
            elif rest[j] == ')':
                depth -= 1
                if depth == 0:
                    break
            j += 1
        cond_src = rest[i + 1:j]
        after = rest[j + 1:].strip()
        if after.startswith('{'):
            k = _match_brace(after)
            block, after = after[1:k], after[k + 1:].strip()
        else:
            block, after = after, ''
        branches.append((_compile_expr(cond_src, scope), _parse_body(block, scope)))
        if after.startswith('else'):
            after = after[4:].strip()
            if after.startswith('if'):
                rest = after
                continue
            if after.startswith('{'):
                k = _match_brace(after)
                branches.append((None, _parse_body(after[1:k], scope)))
            elif after:
                branches.append((None, _parse_body(after, scope)))
        break
    return ('if', branches)


def _match_brace(src: str) -> int:
    depth = 0
    for i, c in enumerate(src):
        if c == '{':
            depth += 1
        elif c == '}':
            depth -= 1
            if depth == 0:
                return i
    raise JsSyntaxError('Unbalanced braces in init code')


def _run_steps(steps, local_env: dict, glb: dict):
    for step in steps:
        kind = step[0]
        if kind == 'return':
            raise _Return(eval(step[1], glb, local_env) if step[1] is not None else _rt.undefined)
        if kind in ('decl', 'assign'):
            local_env[step[1]] = eval(step[2], glb, local_env)
        elif kind == 'expr':
            eval(step[1], glb, local_env)
        elif kind == 'if':
            for cond_code, body_steps in step[1]:
                if cond_code is None or _rt.truthy(eval(cond_code, glb, local_env)):
                    _run_steps(body_steps, local_env, glb)
                    break


class _StubModule(dict):
    """require() stand-in: every property reads as undefined, so calling
    one raises the JS 'x.y is not a function' shape via runtime.method."""


def interpret_js_init(source: str) -> dict:
    """Interpret init code → {name: value} user bindings."""
    bindings: dict = {}
    env = _rt.JsEnv(bindings)
    glb = {'__js__': _rt, '__jsenv__': env}
    src = _strip_comments(source)
    for stmt in _split_statements(src):
        m = _FUNC_RGX.match(stmt)
        if m is not None:
            name, params_src, body = m.group(1), m.group(2), m.group(3)
            params = [p.strip() for p in params_src.split(',') if p.strip()]
            scope = set(params)
            steps = _parse_body(body, scope)

            def make_fn(params=params, steps=steps):
                def fn(*args):
                    local = {p: (args[i] if i < len(args) else _rt.undefined)
                             for i, p in enumerate(params)}
                    try:
                        _run_steps(steps, local, glb)
                    except _Return as r:
                        return r.value
                    return _rt.undefined
                return fn
            bindings[name] = make_fn()
            continue
        m = _DECL_RGX.match(stmt)
        if m is not None:
            name, rhs = m.group(1), m.group(2)
            rm = re.match(r"^require\s*\(\s*['\"]([^'\"]*)['\"]\s*\)$", rhs.strip())
            if rm is not None:
                bindings[name] = _StubModule()
                continue
            tp = _Transpiler()
            py = tp.emit(Parser(rhs.strip()).parse_expression())
            bindings[name] = eval(py, glb)
            continue
        if not stmt:
            continue
        # bare expression statement at top level
        tp = _Transpiler()
        py = tp.emit(Parser(stmt).parse_expression())
        eval(py, glb)
    return bindings
