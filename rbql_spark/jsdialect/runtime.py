"""ECMAScript value semantics hosted in Python (the ``__js__`` namespace).

Transpiled JS expressions call these helpers wherever JS and Python
semantics diverge; the reference implementation is the spec behavior of
the reference's JS engine (rbql-js/rbql.js evals user expressions in
V8).  The subset implemented is the one observable through RBQL
expressions over table cells: numbers (JS numbers modeled as Python
int/float with integral-float normalization so ToString matches V8),
strings, arrays (Python lists), plain objects (dicts), null (None),
undefined (singleton), RegExp.

Everything here is executor-safe: no Spark imports, picklable module
functions only.
"""

from __future__ import annotations

import json as _json
import math as _math
import re as _re


class JsUndefined:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return 'undefined'

    def __bool__(self):
        return False


undefined = JsUndefined()
NaN = float('nan')
Infinity = float('inf')


class JsReferenceError(Exception):
    """name is not defined — V8 message shape ('x is not defined')."""


class JsTypeError(Exception):
    pass


def _is_nan(v) -> bool:
    return isinstance(v, float) and v != v


def jsnum(v):
    """Normalize a JS number: integral floats collapse to int (V8 has one
    number type; ToString(3.0) === '3', and our engine's output typing
    benefits from real ints)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer() and abs(v) <= 2 ** 53:
        return int(v)
    return v


def to_number(v):
    if v is None:
        return 0
    if v is undefined:
        return NaN
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0
        try:
            if s[:2].lower() in ('0x',) or (s[:3].lower() in ('-0x', '+0x')):
                return int(s, 16)
            if '.' in s or 'e' in s.lower() or s.lower().strip('+-') in ('infinity',):
                if s.lstrip('+-').lower() == 'infinity':
                    return -Infinity if s[0] == '-' else Infinity
                return jsnum(float(s))
            return int(s)
        except ValueError:
            return NaN
    if isinstance(v, list):
        return to_number(_array_to_primitive(v))
    return NaN


def _format_exponent(mant: str, exp: int) -> str:
    return '{}e{}{}'.format(mant, '+' if exp >= 0 else '-', abs(exp))


def num_to_string(v) -> str:
    """ECMAScript Number::toString (the shortest-roundtrip algorithm V8
    uses matches Python repr for doubles; formatting differences —
    integral values, exponent thresholds at 1e21 / 1e-7, exponent
    zero-padding — are normalized here)."""
    if isinstance(v, bool):
        return 'true' if v else 'false'
    if isinstance(v, int):
        if abs(v) < 10 ** 21:
            return str(v)
        v = float(v)
    if v != v:
        return 'NaN'
    if v == Infinity:
        return 'Infinity'
    if v == -Infinity:
        return '-Infinity'
    if v == 0:
        return '0'
    if v.is_integer() and abs(v) < 1e21:
        return str(int(v))
    r = repr(v)
    if 'e' in r:
        mant, _, exp_s = r.partition('e')
        exp = int(exp_s)
        if mant.endswith('.0'):
            mant = mant[:-2]
        if -7 < exp < 21:
            return repr(v)  # unreachable for python repr thresholds
        return _format_exponent(mant, exp)
    # python switches to exponent outside [1e-4, 1e16); JS outside [1e-6, 1e21)
    a = abs(v)
    if a < 1e-6:
        mant, _, exp_s = '{:e}'.format(v).partition('e')
        mant = mant.rstrip('0').rstrip('.')
        return _format_exponent(mant, int(exp_s))
    return r


def to_string(v) -> str:
    if v is None:
        return 'null'
    if v is undefined:
        return 'undefined'
    if isinstance(v, bool):
        return 'true' if v else 'false'
    if isinstance(v, (int, float)):
        return num_to_string(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ','.join('' if x is None or x is undefined else to_string(x) for x in v)
    if isinstance(v, dict):
        return '[object Object]'
    if isinstance(v, JsRegExp):
        return '/{}/{}'.format(v.source, v.flags)
    if callable(v):
        return str(v)
    return str(v)


def _array_to_primitive(v: list):
    return to_string(v)


def to_primitive(v, hint='default'):
    if isinstance(v, list):
        return _array_to_primitive(v)
    if isinstance(v, dict):
        return '[object Object]'
    return v


def truthy(v) -> bool:
    if v is None or v is undefined:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v == v and v != 0
    if isinstance(v, str):
        return v != ''
    return True  # arrays/objects/functions are always truthy in JS


# ---------------------------------------------------------------------------
# operators

def add(x, y):
    x = to_primitive(x)
    y = to_primitive(y)
    if isinstance(x, str) or isinstance(y, str):
        return to_string(x) + to_string(y)
    nx, ny = to_number(x), to_number(y)
    if _is_nan(nx) or _is_nan(ny):
        return NaN
    return jsnum(nx + ny)


def _arith(x, y):
    nx, ny = to_number(to_primitive(x)), to_number(to_primitive(y))
    return nx, ny, _is_nan(nx) or _is_nan(ny)


def sub(x, y):
    nx, ny, bad = _arith(x, y)
    return NaN if bad else jsnum(nx - ny)


def mul(x, y):
    nx, ny, bad = _arith(x, y)
    return NaN if bad else jsnum(nx * ny)


def div(x, y):
    nx, ny, bad = _arith(x, y)
    if bad:
        return NaN
    if ny == 0:
        if nx == 0 or _is_nan(nx):
            return NaN
        neg = (nx < 0) != (isinstance(ny, float) and _math.copysign(1.0, ny) < 0)
        return -Infinity if neg else Infinity
    return jsnum(nx / ny)


def mod(x, y):
    nx, ny, bad = _arith(x, y)
    if bad or ny == 0 or nx in (Infinity, -Infinity):
        return NaN
    if ny in (Infinity, -Infinity):
        return jsnum(nx)
    if nx == 0:
        return 0
    return jsnum(_math.fmod(nx, ny))   # JS remainder takes the dividend's sign


def pow_(x, y):
    nx, ny, bad = _arith(x, y)
    if bad:
        return NaN
    try:
        r = nx ** ny
    except (OverflowError, ZeroDivisionError):
        # 1e308**2 overflows, 0**-1 divides by zero: both are Infinity in JS
        return Infinity
    if isinstance(r, complex):
        return NaN   # fractional power of a negative base
    return jsnum(r)


def neg(x):
    n = to_number(to_primitive(x))
    return NaN if _is_nan(n) else jsnum(-n)


def _to_int32(v) -> int:
    n = to_number(to_primitive(v))
    if _is_nan(n) or n in (Infinity, -Infinity):
        return 0
    n = int(n)
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _to_uint32(v) -> int:
    n = to_number(to_primitive(v))
    if _is_nan(n) or n in (Infinity, -Infinity):
        return 0
    return int(n) & 0xFFFFFFFF


def band(x, y):
    return _to_int32(_to_int32(x) & _to_int32(y))


def bor(x, y):
    return _to_int32(_to_int32(x) | _to_int32(y))


def bxor(x, y):
    return _to_int32(_to_int32(x) ^ _to_int32(y))


def bnot(x):
    return _to_int32(~_to_int32(x))


def shl(x, y):
    return _to_int32((_to_int32(x) << (_to_uint32(y) & 31)) & 0xFFFFFFFF)


def shr(x, y):
    return _to_int32(x) >> (_to_uint32(y) & 31)


def ushr(x, y):
    return (_to_uint32(x)) >> (_to_uint32(y) & 31)


def _relational(x, y):
    """Abstract Relational Comparison: returns (px, py, string_mode) or
    None when either side is NaN (all comparisons false)."""
    px, py = to_primitive(x, 'number'), to_primitive(y, 'number')
    if isinstance(px, str) and isinstance(py, str):
        return px, py, True
    nx, ny = to_number(px), to_number(py)
    if _is_nan(nx) or _is_nan(ny):
        return None
    return nx, ny, False


def lt(x, y):
    r = _relational(x, y)
    return False if r is None else r[0] < r[1]


def gt(x, y):
    r = _relational(x, y)
    return False if r is None else r[0] > r[1]


def le(x, y):
    r = _relational(x, y)
    return False if r is None else r[0] <= r[1]


def ge(x, y):
    r = _relational(x, y)
    return False if r is None else r[0] >= r[1]


def strict_eq(x, y):
    if (x is None) or (x is undefined) or (y is None) or (y is undefined):
        return x is y or (x is None and y is None)
    if isinstance(x, bool) != isinstance(y, bool):
        return False
    if isinstance(x, (int, float)) and isinstance(y, (int, float)):
        if _is_nan(x) or _is_nan(y):
            return False
        return float(x) == float(y)
    if type(x) is not type(y):
        return False
    if isinstance(x, (list, dict)):
        return x is y   # reference identity in JS
    return x == y


def strict_ne(x, y):
    return not strict_eq(x, y)


def loose_eq(x, y):
    xn = x is None or x is undefined
    yn = y is None or y is undefined
    if xn or yn:
        return xn and yn
    if isinstance(x, bool):
        return loose_eq(int(x), y)
    if isinstance(y, bool):
        return loose_eq(x, int(y))
    x_num = isinstance(x, (int, float))
    y_num = isinstance(y, (int, float))
    if x_num and y_num:
        if _is_nan(x) or _is_nan(y):
            return False
        return float(x) == float(y)
    if x_num and isinstance(y, str):
        return loose_eq(x, to_number(y))
    if isinstance(x, str) and y_num:
        return loose_eq(to_number(x), y)
    if isinstance(x, (list, dict)) and (y_num or isinstance(y, str)):
        return loose_eq(to_primitive(x), y)
    if isinstance(y, (list, dict)) and (x_num or isinstance(x, str)):
        return loose_eq(x, to_primitive(y))
    if type(x) is type(y):
        if isinstance(x, (list, dict)):
            return x is y
        return x == y
    return False


def loose_ne(x, y):
    return not loose_eq(x, y)


def and_(x, y_thunk):
    return y_thunk() if truthy(x) else x


def or_(x, y_thunk):
    return x if truthy(x) else y_thunk()


def nullish(x, y_thunk):
    return y_thunk() if (x is None or x is undefined) else x


def not_(x):
    return not truthy(x)


def typeof_(v) -> str:
    if v is undefined:
        return 'undefined'
    if v is None:
        return 'object'
    if isinstance(v, bool):
        return 'boolean'
    if isinstance(v, (int, float)):
        return 'number'
    if isinstance(v, str):
        return 'string'
    if callable(v):
        return 'function'
    return 'object'


def void_(v):
    return undefined


def in_(key, obj):
    if isinstance(obj, dict):
        return to_string(key) in obj
    if isinstance(obj, list):
        n = to_number(key)
        return isinstance(n, int) and 0 <= n < len(obj)
    raise JsTypeError("Cannot use 'in' operator to search for '{}' in {}".format(
        to_string(key), to_string(obj)))


def instanceof_(x, y):
    # the only constructors exposed are the namespace objects
    return False


def tpl(parts) -> str:
    """Template literal: alternating literal strings and evaluated values."""
    out = []
    for p in parts:
        out.append(p if isinstance(p, str) else to_string(p))
    return ''.join(out)


def spread(v):
    if isinstance(v, (list, str)):
        return list(v)
    raise JsTypeError('{} is not iterable'.format(to_string(v)))


# ---------------------------------------------------------------------------
# RegExp

_FLAG_MAP = {'i': _re.IGNORECASE, 'm': _re.MULTILINE, 's': _re.DOTALL,
             'u': 0, 'g': 0, 'y': 0}


def _js_regex_to_python(pattern: str) -> str:
    """JS and Python regex syntax agree on the RBQL-observable subset;
    translate the named-group spelling and leave the rest."""
    return pattern.replace('(?<', '(?P<').replace('(?P<=', '(?<=').replace('(?P<!', '(?<!')


class JsRegExp:
    __slots__ = ('source', 'flags', '_rx', 'lastIndex')

    def __init__(self, source, flags=''):
        if isinstance(source, JsRegExp):
            flags = flags or source.flags
            source = source.source
        self.source = source if isinstance(source, str) else to_string(source)
        self.flags = flags or ''
        f = 0
        for ch in self.flags:
            if ch not in _FLAG_MAP:
                raise JsSyntaxErrorLike(
                    "Invalid flags supplied to RegExp constructor '{}'".format(self.flags))
            f |= _FLAG_MAP[ch]
        try:
            self._rx = _re.compile(_js_regex_to_python(self.source), f)
        except _re.error as e:
            raise JsSyntaxErrorLike('Invalid regular expression: /{}/: {}'.format(
                self.source, e))
        self.lastIndex = 0

    @property
    def global_(self):
        return 'g' in self.flags

    def test(self, s) -> bool:
        return self._rx.search(to_string(s)) is not None

    def exec(self, s):
        m = self._rx.search(to_string(s))
        if m is None:
            return None
        return [m.group(0)] + [g if g is not None else undefined for g in m.groups()]


class JsSyntaxErrorLike(Exception):
    """Runtime-constructed RegExp syntax error."""


# ---------------------------------------------------------------------------
# property / method access

def _char_fallback(s: str, i) -> str:
    n = to_number(i)
    if isinstance(n, int) and 0 <= n < len(s):
        return s[n]
    return ''


def member(obj, name):
    """obj.name — property read with JS semantics."""
    if obj is None or obj is undefined:
        raise JsTypeError("Cannot read properties of {} (reading '{}')".format(
            'null' if obj is None else 'undefined', name))
    if isinstance(obj, str):
        if name == 'length':
            return len(obj)
        if name == 'constructor':
            return String
        return _StringMethods.get(obj, name)
    if isinstance(obj, list):
        if name == 'length':
            return len(obj)
        return _ArrayMethods.get(obj, name)
    if isinstance(obj, bool) or isinstance(obj, (int, float)):
        return _NumberMethods.get(obj, name)
    if isinstance(obj, dict):
        return obj.get(name, undefined)
    if isinstance(obj, JsRegExp):
        if name == 'source':
            return obj.source
        if name == 'flags':
            return obj.flags
        if name == 'lastIndex':
            return obj.lastIndex
        if name == 'global':
            return obj.global_
        if name in ('test', 'exec'):
            return getattr(obj, name)
        return undefined
    if isinstance(obj, _Namespace):
        return obj._get(name)
    # engine record objects (a / b) and anything else: python attribute
    try:
        return getattr(obj, name)
    except AttributeError:
        return undefined


def index(obj, key):
    """obj[key] — computed property read."""
    if obj is None or obj is undefined:
        raise JsTypeError("Cannot read properties of {} (reading '{}')".format(
            'null' if obj is None else 'undefined', to_string(key)))
    if isinstance(obj, (str, list)):
        if isinstance(key, str) and not key.lstrip('-').isdigit():
            return member(obj, key)
        n = to_number(key)
        if isinstance(n, int) and 0 <= n < len(obj):
            return obj[n]
        return undefined
    if isinstance(obj, dict):
        return obj.get(to_string(key), undefined)
    return member(obj, to_string(key))


def method(obj, name, *args):
    """obj.name(args) — property read + call, one step (lets string/array
    methods dispatch without building bound wrappers per row)."""
    f = member(obj, name)
    if f is undefined or not callable(f):
        raise JsTypeError('{}.{} is not a function'.format(typeof_(obj), name))
    return f(*args)


def call(f, *args):
    if not callable(f):
        raise JsTypeError('{} is not a function'.format(to_string(f)))
    return f(*args)


def _clamp_index(n, length, default):
    if n is None:
        return default
    n = to_number(n)
    if _is_nan(n):
        return 0
    n = int(n)
    if n < 0:
        n += length
    return max(0, min(n, length))


class _StringMethods:
    @staticmethod
    def get(s: str, name: str):
        fn = getattr(_StringMethods, '_m_' + name, None)
        if fn is None:
            return undefined
        return lambda *args: fn(s, *args)

    @staticmethod
    def _m_split(s, sep=undefined, limit=undefined):
        if sep is undefined:
            out = [s]
        elif isinstance(sep, JsRegExp):
            out = sep._rx.split(s)
            out = [x if x is not None else undefined for x in out]
        else:
            sep = to_string(sep)
            if sep == '':
                out = list(s)
            else:
                out = s.split(sep)
        if limit is not undefined and limit is not None:
            out = out[:max(0, int(to_number(limit)))]
        return out

    @staticmethod
    def _m_indexOf(s, needle=undefined, start=0):
        return s.find(to_string(needle), int(to_number(start) or 0))

    @staticmethod
    def _m_lastIndexOf(s, needle=undefined):
        return s.rfind(to_string(needle))

    @staticmethod
    def _m_includes(s, needle=undefined, start=0):
        return to_string(needle) in s[int(to_number(start) or 0):]

    @staticmethod
    def _m_startsWith(s, needle=undefined, start=0):
        return s.startswith(to_string(needle), int(to_number(start) or 0))

    @staticmethod
    def _m_endsWith(s, needle=undefined, end=None):
        return s.endswith(to_string(needle)) if end is None else \
            s[:int(to_number(end))].endswith(to_string(needle))

    @staticmethod
    def _m_slice(s, a=None, b=None):
        start = _clamp_index(a, len(s), 0)
        end = _clamp_index(b, len(s), len(s))
        return s[start:end] if start < end else ''

    @staticmethod
    def _m_substring(s, a=None, b=None):
        start = max(0, min(int(to_number(a) or 0) if a is not None else 0, len(s)))
        end = max(0, min(int(to_number(b)) if b is not None and not _is_nan(to_number(b)) else len(s), len(s)))
        if start > end:
            start, end = end, start
        return s[start:end]

    @staticmethod
    def _m_substr(s, a=0, length=None):
        start = int(to_number(a) or 0)
        if start < 0:
            start = max(0, len(s) + start)
        if length is None:
            return s[start:]
        return s[start:start + max(0, int(to_number(length) or 0))]

    @staticmethod
    def _m_toUpperCase(s):
        return s.upper()

    @staticmethod
    def _m_toLowerCase(s):
        return s.lower()

    @staticmethod
    def _m_trim(s):
        return s.strip()

    @staticmethod
    def _m_trimStart(s):
        return s.lstrip()

    @staticmethod
    def _m_trimEnd(s):
        return s.rstrip()

    @staticmethod
    def _m_charAt(s, i=0):
        return _char_fallback(s, i)

    @staticmethod
    def _m_at(s, i=0):
        n = to_number(i)
        if not isinstance(n, int):
            return undefined
        if n < 0:
            n += len(s)
        return s[n] if 0 <= n < len(s) else undefined

    @staticmethod
    def _m_charCodeAt(s, i=0):
        n = to_number(i)
        if isinstance(n, int) and 0 <= n < len(s):
            return ord(s[n])
        return NaN

    @staticmethod
    def _m_codePointAt(s, i=0):
        n = to_number(i)
        if isinstance(n, int) and 0 <= n < len(s):
            return ord(s[n])
        return undefined

    @staticmethod
    def _m_concat(s, *args):
        return s + ''.join(to_string(a) for a in args)

    @staticmethod
    def _m_repeat(s, n=0):
        n = int(to_number(n) or 0)
        if n < 0:
            raise JsTypeError('Invalid count value: {}'.format(n))
        return s * n

    @staticmethod
    def _m_padStart(s, width=0, fill=' '):
        width = int(to_number(width) or 0)
        fill = to_string(fill)
        if len(s) >= width or not fill:
            return s
        pad = (fill * width)[:width - len(s)]
        return pad + s

    @staticmethod
    def _m_padEnd(s, width=0, fill=' '):
        width = int(to_number(width) or 0)
        fill = to_string(fill)
        if len(s) >= width or not fill:
            return s
        pad = (fill * width)[:width - len(s)]
        return s + pad

    @staticmethod
    def _m_replace(s, pat, repl):
        return _StringMethods._replace_impl(s, pat, repl, all_mode=False)

    @staticmethod
    def _m_replaceAll(s, pat, repl):
        return _StringMethods._replace_impl(s, pat, repl, all_mode=True)

    @staticmethod
    def _replace_impl(s, pat, repl, all_mode):
        if isinstance(pat, JsRegExp):
            count = 0 if (all_mode or pat.global_) else 1
            if callable(repl) and not isinstance(repl, str):
                return pat._rx.sub(lambda m: to_string(repl(m.group(0), *m.groups())), s, count=count)
            rtext = to_string(repl).replace('\\', '\\\\')
            rtext = _re.sub(r'\$(\d+)', r'\\\1', rtext).replace('$&', '\\g<0>')
            return pat._rx.sub(rtext, s, count=count)
        pat = to_string(pat)
        if callable(repl) and not isinstance(repl, str):
            if all_mode:
                out, rest = [], s
                while True:
                    i = rest.find(pat)
                    if i < 0 or pat == '':
                        out.append(rest)
                        break
                    out.append(rest[:i])
                    out.append(to_string(repl(pat)))
                    rest = rest[i + len(pat):]
                return ''.join(out)
            i = s.find(pat)
            if i < 0:
                return s
            return s[:i] + to_string(repl(pat)) + s[i + len(pat):]
        repl = to_string(repl)
        if all_mode:
            return s.replace(pat, repl)
        return s.replace(pat, repl, 1)   # JS string-pattern replace: first only

    @staticmethod
    def _m_match(s, pat):
        rx = pat if isinstance(pat, JsRegExp) else JsRegExp(to_string(pat))
        if rx.global_:
            out = [m.group(0) for m in rx._rx.finditer(s)]
            return out if out else None
        return rx.exec(s)

    @staticmethod
    def _m_search(s, pat):
        rx = pat if isinstance(pat, JsRegExp) else JsRegExp(to_string(pat))
        m = rx._rx.search(s)
        return m.start() if m else -1

    @staticmethod
    def _m_localeCompare(s, other):
        other = to_string(other)
        return -1 if s < other else (1 if s > other else 0)

    @staticmethod
    def _m_toString(s):
        return s

    @staticmethod
    def _m_valueOf(s):
        return s

    @staticmethod
    def _m_normalize(s, form='NFC'):
        import unicodedata
        return unicodedata.normalize(form, s)


class _ArrayMethods:
    @staticmethod
    def get(a: list, name: str):
        fn = getattr(_ArrayMethods, '_m_' + name, None)
        if fn is None:
            return undefined
        return lambda *args: fn(a, *args)

    @staticmethod
    def _m_indexOf(a, v=undefined, start=0):
        for i in range(int(to_number(start) or 0), len(a)):
            if strict_eq(a[i], v):
                return i
        return -1

    @staticmethod
    def _m_lastIndexOf(a, v=undefined):
        for i in range(len(a) - 1, -1, -1):
            if strict_eq(a[i], v):
                return i
        return -1

    @staticmethod
    def _m_includes(a, v=undefined):
        return any(strict_eq(x, v) or (_is_nan_val(x) and _is_nan_val(v)) for x in a)

    @staticmethod
    def _m_join(a, sep=undefined):
        sep = ',' if sep is undefined else to_string(sep)
        return sep.join('' if x is None or x is undefined else to_string(x) for x in a)

    @staticmethod
    def _m_slice(a, s=None, e=None):
        start = _clamp_index(s, len(a), 0)
        end = _clamp_index(e, len(a), len(a))
        return a[start:end] if start < end else []

    @staticmethod
    def _m_concat(a, *args):
        out = list(a)
        for x in args:
            if isinstance(x, list):
                out.extend(x)
            else:
                out.append(x)
        return out

    @staticmethod
    def _m_map(a, f, *rest):
        return [f(v, i, a) if _arity(f) >= 3 else (f(v, i) if _arity(f) == 2 else f(v))
                for i, v in enumerate(a)]

    @staticmethod
    def _m_filter(a, f):
        return [v for i, v in enumerate(a) if truthy(_call_cb(f, v, i, a))]

    @staticmethod
    def _m_forEach(a, f):
        for i, v in enumerate(a):
            _call_cb(f, v, i, a)
        return undefined

    @staticmethod
    def _m_some(a, f):
        return any(truthy(_call_cb(f, v, i, a)) for i, v in enumerate(a))

    @staticmethod
    def _m_every(a, f):
        return all(truthy(_call_cb(f, v, i, a)) for i, v in enumerate(a))

    @staticmethod
    def _m_find(a, f):
        for i, v in enumerate(a):
            if truthy(_call_cb(f, v, i, a)):
                return v
        return undefined

    @staticmethod
    def _m_findIndex(a, f):
        for i, v in enumerate(a):
            if truthy(_call_cb(f, v, i, a)):
                return i
        return -1

    @staticmethod
    def _m_reduce(a, f, *init):
        it = iter(enumerate(a))
        if init:
            acc = init[0]
        else:
            try:
                _, acc = next(it)
            except StopIteration:
                raise JsTypeError('Reduce of empty array with no initial value')
        for i, v in it:
            acc = f(acc, v, i, a) if _arity(f) >= 4 else (
                f(acc, v, i) if _arity(f) == 3 else f(acc, v))
        return acc

    @staticmethod
    def _m_reverse(a):
        a.reverse()
        return a

    @staticmethod
    def _m_sort(a, cmp=None):
        import functools
        if cmp is None:
            a.sort(key=lambda v: (v is undefined, to_string(v) if v is not undefined else ''))
        else:
            def c(x, y):
                r = to_number(cmp(x, y))
                return -1 if r < 0 else (1 if r > 0 else 0)
            a.sort(key=functools.cmp_to_key(c))
        return a

    @staticmethod
    def _m_flat(a, depth=1):
        depth = int(to_number(depth) if depth != 1 else 1)
        def fl(xs, d):
            out = []
            for x in xs:
                if isinstance(x, list) and d > 0:
                    out.extend(fl(x, d - 1))
                else:
                    out.append(x)
            return out
        return fl(a, depth)

    @staticmethod
    def _m_push(a, *vals):
        a.extend(vals)
        return len(a)

    @staticmethod
    def _m_pop(a):
        return a.pop() if a else undefined

    @staticmethod
    def _m_shift(a):
        return a.pop(0) if a else undefined

    @staticmethod
    def _m_unshift(a, *vals):
        a[:0] = list(vals)
        return len(a)

    @staticmethod
    def _m_at(a, i=0):
        n = to_number(i)
        if not isinstance(n, int):
            return undefined
        if n < 0:
            n += len(a)
        return a[n] if 0 <= n < len(a) else undefined

    @staticmethod
    def _m_toString(a):
        return to_string(a)


def _is_nan_val(v):
    return isinstance(v, float) and v != v


def _arity(f) -> int:
    try:
        return f.__code__.co_argcount
    except AttributeError:
        return 1


def _call_cb(f, v, i, a):
    n = _arity(f)
    if n >= 3:
        return f(v, i, a)
    if n == 2:
        return f(v, i)
    return f(v)


class _NumberMethods:
    @staticmethod
    def get(v, name: str):
        if name == 'toFixed':
            def to_fixed(digits=0):
                d = int(to_number(digits) or 0)
                return '{:.{}f}'.format(float(v), d)
            return to_fixed
        if name == 'toString':
            def to_str(radix=10):
                r = int(to_number(radix) or 10)
                if r == 10:
                    return num_to_string(v)
                n = int(v)
                if n == 0:
                    return '0'
                digits = '0123456789abcdefghijklmnopqrstuvwxyz'
                sign = '-' if n < 0 else ''
                n = abs(n)
                out = []
                while n:
                    out.append(digits[n % r])
                    n //= r
                return sign + ''.join(reversed(out))
            return to_str
        if name == 'valueOf':
            return lambda: v
        if name == 'toPrecision':
            return lambda p=undefined: num_to_string(v) if p is undefined else '{:.{}g}'.format(float(v), int(to_number(p)))
        return undefined


# ---------------------------------------------------------------------------
# global namespaces

class _Namespace:
    _name = ''

    def _get(self, name):
        v = getattr(self, name, undefined)
        return v


class _Math(_Namespace):
    _name = 'Math'
    PI = _math.pi
    E = _math.e
    LN2 = _math.log(2)
    LN10 = _math.log(10)
    SQRT2 = _math.sqrt(2)

    @staticmethod
    def floor(x=undefined):
        n = to_number(x)
        return NaN if _is_nan(n) else (n if n in (Infinity, -Infinity) else int(_math.floor(n)))

    @staticmethod
    def ceil(x=undefined):
        n = to_number(x)
        return NaN if _is_nan(n) else (n if n in (Infinity, -Infinity) else int(_math.ceil(n)))

    @staticmethod
    def round(x=undefined):
        n = to_number(x)
        if _is_nan(n):
            return NaN
        if n in (Infinity, -Infinity):
            return n
        return int(_math.floor(n + 0.5))   # JS rounds .5 toward +Infinity

    @staticmethod
    def trunc(x=undefined):
        n = to_number(x)
        return NaN if _is_nan(n) else (n if n in (Infinity, -Infinity) else int(n))

    @staticmethod
    def abs(x=undefined):
        n = to_number(x)
        return NaN if _is_nan(n) else jsnum(abs(n))

    @staticmethod
    def sign(x=undefined):
        n = to_number(x)
        if _is_nan(n):
            return NaN
        return 0 if n == 0 else (1 if n > 0 else -1)

    @staticmethod
    def sqrt(x=undefined):
        n = to_number(x)
        if _is_nan(n) or n < 0:
            return NaN
        return jsnum(_math.sqrt(n))

    @staticmethod
    def cbrt(x=undefined):
        n = to_number(x)
        if _is_nan(n):
            return NaN
        return jsnum(_math.copysign(abs(n) ** (1 / 3), n))

    @staticmethod
    def min(*args):
        best = Infinity
        for a in args:
            n = to_number(a)
            if _is_nan(n):
                return NaN
            if n < best:
                best = n
        return jsnum(best)

    @staticmethod
    def max(*args):
        best = -Infinity
        for a in args:
            n = to_number(a)
            if _is_nan(n):
                return NaN
            if n > best:
                best = n
        return jsnum(best)

    @staticmethod
    def pow(x=undefined, y=undefined):
        return pow_(x, y)

    @staticmethod
    def log(x=undefined):
        n = to_number(x)
        if _is_nan(n) or n < 0:
            return NaN
        return -Infinity if n == 0 else jsnum(_math.log(n))

    @staticmethod
    def log2(x=undefined):
        n = to_number(x)
        if _is_nan(n) or n < 0:
            return NaN
        return -Infinity if n == 0 else jsnum(_math.log2(n))

    @staticmethod
    def log10(x=undefined):
        n = to_number(x)
        if _is_nan(n) or n < 0:
            return NaN
        return -Infinity if n == 0 else jsnum(_math.log10(n))

    @staticmethod
    def exp(x=undefined):
        n = to_number(x)
        if _is_nan(n):
            return NaN
        try:
            return jsnum(_math.exp(n))
        except OverflowError:
            return Infinity

    @staticmethod
    def hypot(*args):
        ns = [to_number(a) for a in args]
        if any(_is_nan(n) for n in ns):
            return NaN
        return jsnum(_math.hypot(*ns))

    @staticmethod
    def random():
        import random as _random
        return _random.random()

    for _t in ('sin', 'cos', 'tan', 'asin', 'acos', 'atan', 'sinh', 'cosh',
               'tanh', 'atan2'):
        exec('''
@staticmethod
def {0}(*args):
    ns = [to_number(a) for a in args]
    if any(_is_nan(n) for n in ns):
        return NaN
    try:
        return jsnum(_math.{0}(*ns))
    except ValueError:
        return NaN
'''.format(_t))
    del _t


class _JSON(_Namespace):
    _name = 'JSON'

    @staticmethod
    def stringify(v=undefined, replacer=None, space=None):
        if v is undefined or callable(v):
            return undefined

        def default(o):
            if o is undefined:
                return None
            raise TypeError

        def clean(o):
            if o is undefined:
                return None
            if isinstance(o, list):
                return [clean(x) for x in o]
            if isinstance(o, dict):
                return {k: clean(val) for k, val in o.items() if val is not undefined and not callable(val)}
            if isinstance(o, float) and (o != o or o in (Infinity, -Infinity)):
                return None
            return o
        kwargs = {'separators': (',', ':'), 'ensure_ascii': False}
        if space:
            n = int(to_number(space)) if not isinstance(space, str) else None
            kwargs = {'indent': n if n is not None else space, 'ensure_ascii': False}
        return _json.dumps(clean(v), **kwargs)

    @staticmethod
    def parse(s=undefined):
        try:
            return _json.loads(to_string(s))
        except ValueError as e:
            raise JsSyntaxErrorLike('Unexpected token in JSON at position 0: {}'.format(e))


class _String(_Namespace):
    _name = 'String'

    def __call__(self, v=''):
        return to_string(v)

    @staticmethod
    def fromCharCode(*args):
        return ''.join(chr(int(to_number(a) or 0)) for a in args)

    @staticmethod
    def raw(parts):
        # transpiler pre-assembles the raw parts list (tagged template)
        return tpl(parts)


class _Number(_Namespace):
    _name = 'Number'
    MAX_SAFE_INTEGER = 2 ** 53 - 1
    MIN_SAFE_INTEGER = -(2 ** 53 - 1)
    MAX_VALUE = 1.7976931348623157e308
    MIN_VALUE = 5e-324
    EPSILON = 2.220446049250313e-16
    POSITIVE_INFINITY = Infinity
    NEGATIVE_INFINITY = -Infinity
    NaN = NaN

    def __call__(self, v=0):
        return jsnum(to_number(v))

    @staticmethod
    def isInteger(v=undefined):
        return isinstance(v, int) and not isinstance(v, bool) or (
            isinstance(v, float) and v == v and v not in (Infinity, -Infinity) and v.is_integer())

    @staticmethod
    def isFinite(v=undefined):
        return isinstance(v, (int, float)) and not isinstance(v, bool) and \
            v == v and v not in (Infinity, -Infinity)

    @staticmethod
    def isNaN(v=undefined):
        return _is_nan_val(v)

    @staticmethod
    def parseFloat(v=undefined):
        return parseFloat(v)

    @staticmethod
    def parseInt(v=undefined, radix=undefined):
        return parseInt(v, radix)


class _Object(_Namespace):
    _name = 'Object'

    @staticmethod
    def keys(o=undefined):
        if isinstance(o, dict):
            return list(o.keys())
        if isinstance(o, list):
            return [str(i) for i in range(len(o))]
        if isinstance(o, str):
            return [str(i) for i in range(len(o))]
        return []

    @staticmethod
    def values(o=undefined):
        if isinstance(o, dict):
            return list(o.values())
        if isinstance(o, (list, str)):
            return list(o)
        return []

    @staticmethod
    def entries(o=undefined):
        if isinstance(o, dict):
            return [[k, v] for k, v in o.items()]
        if isinstance(o, (list, str)):
            return [[str(i), v] for i, v in enumerate(o)]
        return []

    @staticmethod
    def assign(target=undefined, *sources):
        if not isinstance(target, dict):
            raise JsTypeError('Cannot convert undefined or null to object')
        for s in sources:
            if isinstance(s, dict):
                target.update(s)
        return target


class _Array(_Namespace):
    _name = 'Array'

    @staticmethod
    def isArray(v=undefined):
        return isinstance(v, list)

    @staticmethod
    def from_(v=undefined, f=None):
        if isinstance(v, (list, str)):
            items = list(v)
        elif isinstance(v, dict) and 'length' in v:
            items = [undefined] * int(to_number(v['length']))
        else:
            items = []
        if f is not None:
            items = [_call_cb(f, x, i, items) for i, x in enumerate(items)]
        return items

    def _get(self, name):
        if name == 'from':
            return self.from_
        return super()._get(name)

    @staticmethod
    def of(*args):
        return list(args)


# ---------------------------------------------------------------------------
# top-level functions

_PARSEINT_RGX = _re.compile(r'^[+-]?[0-9]+')


def parseInt(v=undefined, radix=undefined):
    if isinstance(v, (int, float)) and not isinstance(v, bool) and \
            (radix is undefined or radix is None or to_number(radix) in (10, 0)):
        if _is_nan_val(v) or v in (Infinity, -Infinity):
            return NaN
        return int(v)
    s = to_string(v).strip()
    r = 10 if radix is undefined or radix is None else int(to_number(radix) or 0)
    if r == 16 or (r in (0, 10) and s[:2].lower() in ('0x',)) or \
            (r in (0, 16) and s.lstrip('+-')[:2].lower() == '0x'):
        s2 = s.lstrip('+-')
        sign = -1 if s.startswith('-') else 1
        if s2[:2].lower() == '0x':
            s2 = s2[2:]
        m = _re.match(r'^[0-9a-fA-F]+', s2)
        return NaN if m is None else sign * int(m.group(0), 16)
    if r == 0:
        r = 10
    if r == 10:
        m = _PARSEINT_RGX.match(s)
        return NaN if m is None else int(m.group(0))
    digits = '0123456789abcdefghijklmnopqrstuvwxyz'[:r]
    m = _re.match(r'^[+-]?[{}]+'.format(digits), s, _re.IGNORECASE)
    return NaN if m is None else int(m.group(0), r)


_PARSEFLOAT_RGX = _re.compile(
    r'^[+-]?(Infinity|(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)')


def parseFloat(v=undefined):
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v
    s = to_string(v).strip()
    m = _PARSEFLOAT_RGX.match(s)
    if m is None:
        return NaN
    text = m.group(0)
    if text.lstrip('+-') == 'Infinity':
        return -Infinity if text.startswith('-') else Infinity
    return jsnum(float(text))


def isNaN(v=undefined):
    return _is_nan(to_number(v))


def isFinite(v=undefined):
    n = to_number(v)
    return not _is_nan(n) and n not in (Infinity, -Infinity)


def obj(pairs) -> dict:
    return {to_string(k): v for k, v in pairs}


Math = _Math()
JSON = _JSON()
String = _String()
Number = _Number()
Object = _Object()
Array = _Array()
RegExp = JsRegExp


class JsEnv:
    """Per-evaluation global environment: built-in namespaces plus any
    bindings declared by js_init_code (functions / consts)."""

    BUILTINS = {
        'Math': Math, 'JSON': JSON, 'String': String, 'Number': Number,
        'Object': Object, 'Array': Array, 'RegExp': RegExp,
        'parseInt': parseInt, 'parseFloat': parseFloat,
        'isNaN': isNaN, 'isFinite': isFinite,
        'NaN': NaN, 'Infinity': Infinity, 'undefined': undefined,
    }

    def __init__(self, user_bindings: dict | None = None):
        self.user = dict(user_bindings or {})

    def ref(self, name: str):
        if name in self.user:
            return self.user[name]
        if name in self.BUILTINS:
            return self.BUILTINS[name]
        raise JsReferenceError('{} is not defined'.format(name))

    def ref_safe(self, name: str):
        """typeof-style lookup: undeclared → undefined, no throw."""
        try:
            return self.ref(name)
        except JsReferenceError:
            return undefined


def like(text, pattern) -> bool:
    """JS-dialect like()/LIKE(): the reference implementation is
    `new RegExp(like_to_regex(pattern)).test(text)` (rbql-js/rbql.js:243)
    and RegExp.prototype.test ToString-coerces its ARGUMENT — so an int
    cell tests its decimal rendering and a null cell tests the string
    'null', where the Python dialect's re.match raises TypeError on
    both (matching rbql-py).  Caught by the differential sweep, seed
    20004: like(<int cell>, 'al%') errored here, returned false in V8.

    The PATTERN is NOT coerced (r14 ADVICE): like_to_regex runs
    `pattern.length` / `pattern.substring(...)` on the raw value
    (rbql-js/rbql.js:222-239), so V8 throws — null/undefined at the
    `.length` read, any other non-string at the first `.substring`
    call (Number/Boolean prototypes lack it)."""
    from ..functions.like import py_like
    if not isinstance(pattern, str):
        if pattern is None or pattern is undefined:
            raise JsTypeError("Cannot read properties of {} (reading 'length')".format(
                'null' if pattern is None else 'undefined'))
        raise JsTypeError('pattern.substring is not a function')
    return py_like(to_string(text), pattern)


LIKE = like
