"""Unit tests for the JS dialect front-end: parser shapes, transpiled
Python source, and runtime semantics — including a direct node-based
oracle for the value-semantics helpers (each expression evaluated by V8
itself and by the transpiled Python, no Spark involved)."""

import json
import math
import os
import shutil
import subprocess

import pytest

from rbql_spark.jsdialect import js_expr_to_python, JsSyntaxError
from rbql_spark.jsdialect import runtime as js
from rbql_spark.jsdialect.jsinit import interpret_js_init
from rbql_spark.jsdialect.jsparser import parse_js_expression

NODE = shutil.which('node')


# ---------------------------------------------------------------------------
# parser

def test_parser_shapes():
    assert parse_js_expression('a1')[0] == 'name'
    assert parse_js_expression('a1 + 1')[0] == 'bin'
    assert parse_js_expression('a1 && a2')[0] == 'logic'
    assert parse_js_expression('a1 ? 1 : 2')[0] == 'cond'
    assert parse_js_expression('v => v.length')[0] == 'arrow'
    assert parse_js_expression('(x, y) => x + y')[1] == ['x', 'y']
    assert parse_js_expression('/ab+/i.test(a1)')[0] == 'call'
    assert parse_js_expression('`x${a1}y`')[0] == 'tpl'
    assert parse_js_expression('[1, ...a2, 3]')[0] == 'array'
    assert parse_js_expression('{a: 1, [a2]: 2}')[0] == 'object'


def test_parser_precedence():
    # unary minus binds tighter than %, ** is right-associative
    assert js_eval('-7 % 3') == -1
    assert js_eval('2 ** 3 ** 2') == 512
    assert js_eval('1 + 2 * 3') == 7
    assert js_eval('(1 + 2) * 3') == 9


def test_parser_errors():
    with pytest.raises(JsSyntaxError, match='Unexpected identifier'):
        parse_js_expression('a1 > 0 and a1 < 40')
    with pytest.raises(JsSyntaxError, match='Unexpected identifier'):
        parse_js_expression('a1 LIKE "%x"')
    with pytest.raises(JsSyntaxError, match='Unexpected end of input'):
        parse_js_expression('a1 +')
    with pytest.raises(JsSyntaxError):
        parse_js_expression('a1 === ')
    with pytest.raises(JsSyntaxError):
        parse_js_expression("'unterminated")


# ---------------------------------------------------------------------------
# transpiled evaluation (Python hosts JS semantics)

def js_eval(src: str, **env):
    glb = {'__js__': js, '__jsenv__': js.JsEnv()}
    glb.update(env)
    return eval(js_expr_to_python(src), glb)


def test_tonumber_tostring():
    assert js_eval("'5' - 2") == 3
    assert js_eval("'5' + 2") == '52'
    assert js_eval("null + 5") == 5
    assert js_eval("null + 'x'") == 'nullx'
    assert js_eval("[1,2] + ''") == '1,2'
    assert js_eval("1.5 + 1.5") == 3          # integral doubles render as ints
    assert js.to_string(0.1 + 0.2) == '0.30000000000000004'
    assert js.to_string(1e21) == '1e+21'
    assert js.to_string(1e-7) == '1e-7'
    assert js.to_string(float('nan')) == 'NaN'


def test_equality_semantics():
    assert js_eval("5 == '5'") is True
    assert js_eval("5 === '5'") is False
    assert js_eval("null == 0") is False
    assert js_eval("null == null") is True
    assert js_eval("undefined == null") is True
    assert js_eval("NaN == NaN") is False
    assert js_eval("'' == 0") is True
    assert js_eval("true == 1") is True


def test_relational_semantics():
    assert js_eval("null > -1") is True       # ToNumber(null) = 0
    assert js_eval("null < 1") is True
    assert js_eval("'abc' > 5") is False      # NaN comparisons are false
    assert js_eval("'10' > 5") is True
    assert js_eval("'b' > 'a'") is True
    assert js_eval("'10' < '9'") is True      # both strings: code-unit order


def test_logic_values():
    assert js_eval("'' || 'dflt'") == 'dflt'
    assert js_eval("0 && 'x'") == 0
    assert js_eval("'a' && 'b'") == 'b'
    assert js_eval("null ?? 7") == 7
    assert js_eval("0 ?? 7") == 0
    assert js_eval("![]") is False            # arrays are truthy
    assert js_eval("!NaN") is True


def test_division_and_remainder():
    assert js_eval("5 / 2") == 2.5
    assert js_eval("6 / 2") == 3
    assert js_eval("1 / 0") == math.inf
    assert math.isnan(js_eval("0 / 0"))
    assert js_eval("-7 % 3") == -1
    assert js_eval("7 % -3") == 1


def test_string_methods():
    assert js_eval("'a|b|c'.split('|')") == ['a', 'b', 'c']
    assert js_eval("'hello'.slice(-3)") == 'llo'
    assert js_eval("'hello'.indexOf('l')") == 2
    assert js_eval("'aXbXc'.replace('X', '-')") == 'a-bXc'   # first only
    assert js_eval("'aXbXc'.replace(/X/g, '-')") == 'a-b-c'
    assert js_eval("'ab'.repeat(3)") == 'ababab'
    assert js_eval("'7'.padStart(3, '0')") == '007'
    assert js_eval("'abc'.charCodeAt(1)") == 98


def test_array_methods():
    assert js_eval("[3, 1, 2].sort()") == [1, 2, 3]
    assert js_eval("[10, 9].sort()") == [10, 9]      # default sort is lexicographic
    assert js_eval("[1, 2, 3].map(v => v * 2)") == [2, 4, 6]
    assert js_eval("[1, 2, 3, 4].filter(v => v % 2 == 0)") == [2, 4]
    assert js_eval("[1, 2, 3].reduce((acc, v) => acc + v, 10)") == 16
    assert js_eval("[[1, 2], [3]].flat()") == [1, 2, 3]
    assert js_eval("[1, 2].concat([3], 4)") == [1, 2, 3, 4]
    assert js_eval("[...'ab', 1]") == ['a', 'b', 1]


def test_globals():
    assert js_eval("parseInt('12px')") == 12
    assert js_eval("parseInt('0x1f')") == 31
    assert js_eval("parseInt('ff', 16)") == 255
    assert math.isnan(js_eval("parseInt('px')"))
    assert js_eval("parseFloat('1.5e2x')") == 150
    assert js_eval("Math.round(2.5)") == 3
    assert js_eval("Math.round(-2.5)") == -2          # JS rounds .5 toward +inf
    assert js_eval("Math.max()") == -math.inf
    assert math.isnan(js_eval("Math.max(1, NaN)"))
    assert js_eval("JSON.stringify({a: [1, null]})") == '{"a":[1,null]}'
    assert js_eval("JSON.parse('[1, 2]')") == [1, 2]
    assert js_eval("typeof 5") == 'number'
    assert js_eval("typeof null") == 'object'
    assert js_eval("typeof whatever") == 'undefined'
    assert js_eval("String(12.0)") == '12'
    assert js_eval("Number('')") == 0
    assert js_eval("isNaN('abc')") is True


def test_unknown_name_error():
    with pytest.raises(js.JsReferenceError, match='zorp is not defined'):
        js_eval('zorp(1)')


def test_member_on_null_throws():
    with pytest.raises(js.JsTypeError, match="Cannot read properties of null"):
        js_eval('a1.length', a1=None)


def test_init_code():
    b = interpret_js_init('''
// a comment
function classify(v) {
    const n = v * 2;
    if (n > 10) { return "big"; }
    return "small";
}
const factor = 3;
const fs = require('fs');
''')
    assert b['classify'](6) == 'big'
    assert b['classify'](2) == 'small'
    assert b['factor'] == 3
    assert 'fs' in b


# ---------------------------------------------------------------------------
# node oracle: V8 itself judges the runtime's value semantics

_ORACLE_EXPRS = [
    "'5' + 3", "'5' - 3", "null + 1", "undefined + 1 + ''", "[] + 1",
    "[5] * 2", "'  7  ' * 2", "'0x10' * 1", "1/3 + ''", "0.1 + 0.2 + ''",
    "(5).toFixed(2)", "'a,b'.split(',').length", "NaN === NaN",
    "null >= 0", "null > 0", "'z' > 'a'", "'2' > '10'", "2 > '10'",
    "'abc'.slice(1, -1)", "'abc'.substring(2, 0)", "'x'.padEnd(3, 'ab')",
    "[3, 20, 100].sort() + ''", "Math.min('3', 2)", "parseInt(' 42abc')",
    "parseFloat('.5e1')", "typeof undefined", "!!'0'", "!!''",
    "'ab'.indexOf('b', 1)", "'aaa'.replace('a', 'b')",
    "JSON.stringify([1, 'x', null])", "(123.456).toFixed(1)",
    "'AbC'.toLowerCase() + 'x'.toUpperCase()", "[1, [2, [3]]].flat(2) + ''",
    "5 % 3 * -1", "(-5) % 3", "2 ** -1", "1e21 + ''", "1.5e-7 + ''",
    "'b' + 1 + 2", "1 + 2 + 'b'", "true + true", "'' || null || 0 || 'x'",
    "undefined ?? null ?? 'y'",
]


@pytest.mark.skipif(not NODE, reason='node not available')
def test_runtime_vs_v8():
    script = ('const exprs = ' + json.dumps(_ORACLE_EXPRS) + ';\n'
              'const out = exprs.map(e => {\n'
              '  try { const v = eval(e);\n'
              '    return (typeof v === "number" && !isFinite(v)) ? String(v) : v; }\n'
              '  catch (err) { return "__ERROR__"; }\n'
              '});\n'
              'process.stdout.write(JSON.stringify(out));')
    res = subprocess.run([NODE, '-e', script], stdout=subprocess.PIPE, timeout=60)
    expected = json.loads(res.stdout.decode())
    for expr, want in zip(_ORACLE_EXPRS, expected):
        try:
            got = js_eval(expr)
        except Exception:
            got = '__ERROR__'
        if isinstance(got, float):
            if math.isnan(got):
                got = 'NaN'
            elif math.isinf(got):
                got = 'Infinity' if got > 0 else '-Infinity'
        if isinstance(got, float) and isinstance(want, (int, float)):
            assert got == pytest.approx(want), expr
        else:
            assert got == want, '{}: got {!r}, V8 says {!r}'.format(expr, got, want)
