"""ECMAScript *expression* parser (tokenizer + Pratt parser → tuple AST).

Covers the expression language RBQL queries use (reference surface:
rbql-js/rbql.js embeds user expressions verbatim into generated JS and
``eval``s them): literals (numeric, string, template incl. tagged
``String.raw``, regex, array, object), member/index access, calls,
arrow functions, spread, unary/binary/logical/conditional operators.
Statements are NOT parsed here — RBQL clause grammar is handled by the
shared parser; js_init_code declarations by jsinit.

AST is plain tuples, first element the node kind:
  ('num', value)                ('str', value)
  ('tpl', [str|node ...], raw)  ('regex', pattern, flags)
  ('name', ident)               ('member', obj, name)
  ('index', obj, expr)          ('call', callee, [args])
  ('unary', op, x)              ('bin', op, x, y)
  ('logic', '&&'|'||'|'??', x, y)
  ('cond', test, then, else)    ('arrow', [params], body)
  ('array', [items])            ('object', [(key, value)])
  ('spread', x)
"""

from __future__ import annotations

import re


class JsSyntaxError(Exception):
    """JS expression failed to parse.  Message texts intentionally mirror
    V8's (the reference surfaces raw eval() SyntaxErrors, e.g.
    'Unexpected identifier' — asserted by its unit corpus)."""


_PUNCT = [
    '...', '=>', '===', '!==', '**', '<<', '>>>', '>>', '<=', '>=', '==',
    '!=', '&&', '||', '??', '?.', '(', ')', '[', ']', '{', '}', ',', '.',
    '?', ':', ';', '+', '-', '*', '/', '%', '<', '>', '!', '~', '&', '|',
    '^', '=',
]

_NUM_RGX = re.compile(
    r'0[xX][0-9a-fA-F]+|0[oO][0-7]+|0[bB][01]+|'
    r'(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?')
_IDENT_RGX = re.compile(r'[A-Za-z_$][A-Za-z0-9_$]*')

_KEYWORD_VALUES = {'null': None, 'true': True, 'false': False}

# tokens after which a '/' starts a regex literal rather than division
_REGEX_ALLOWED_AFTER = {
    None, '(', '[', '{', ',', ';', ':', '?', '=>', '...', '+', '-', '*',
    '/', '%', '**', '<', '>', '<=', '>=', '==', '!=', '===', '!==', '&&',
    '||', '??', '!', '~', '&', '|', '^', '<<', '>>', '>>>', '=', 'return',
    'typeof', 'in', 'instanceof', 'new', 'void', 'delete',
}


class Token:
    __slots__ = ('kind', 'value', 'pos')

    def __init__(self, kind, value, pos):
        self.kind = kind      # 'num' 'str' 'tpl' 'regex' 'ident' 'punct' 'eof'
        self.value = value
        self.pos = pos

    def __repr__(self):
        return 'Token({}, {!r})'.format(self.kind, self.value)


def _string_escape(src: str, i: int) -> tuple[str, int]:
    """Decode one escape sequence starting at the backslash; returns
    (decoded_text, next_index)."""
    c = src[i + 1] if i + 1 < len(src) else ''
    simple = {'n': '\n', 't': '\t', 'r': '\r', 'b': '\b', 'f': '\f',
              'v': '\v', '0': '\0', '\n': ''}
    if c in simple:
        return simple[c], i + 2
    if c == 'x' and i + 3 < len(src):
        try:
            return chr(int(src[i + 2:i + 4], 16)), i + 4
        except ValueError:
            raise JsSyntaxError('Invalid hexadecimal escape sequence')
    if c == 'u':
        if i + 2 < len(src) and src[i + 2] == '{':
            end = src.find('}', i + 3)
            if end < 0:
                raise JsSyntaxError('Invalid Unicode escape sequence')
            return chr(int(src[i + 3:end], 16)), end + 1
        try:
            return chr(int(src[i + 2:i + 6], 16)), i + 6
        except ValueError:
            raise JsSyntaxError('Invalid Unicode escape sequence')
    # any other char escapes to itself (\' \" \` \\ \/ ...)
    return c, i + 2


def _scan_template(src: str, i: int):
    """Scan a template literal starting at the backtick.  Returns
    (parts, next_index) where parts alternate cooked-literal strings and
    RAW ${...} expression substrings (parsed later), plus the raw text
    of each literal chunk (for String.raw)."""
    cooked_parts: list = []
    raw_parts: list = []
    exprs: list = []
    i += 1
    cooked = []
    raw = []
    while i < len(src):
        c = src[i]
        if c == '`':
            cooked_parts.append(''.join(cooked))
            raw_parts.append(''.join(raw))
            return cooked_parts, raw_parts, exprs, i + 1
        if c == '\\':
            text, ni = _string_escape(src, i)
            cooked.append(text)
            raw.append(src[i:ni])
            i = ni
            continue
        if c == '$' and i + 1 < len(src) and src[i + 1] == '{':
            # find matching close brace (nesting-aware, strings skipped)
            depth = 1
            j = i + 2
            while j < len(src) and depth:
                cj = src[j]
                if cj in '\'"':
                    q = cj
                    j += 1
                    while j < len(src) and src[j] != q:
                        j += 2 if src[j] == '\\' else 1
                    j += 1
                    continue
                if cj == '{':
                    depth += 1
                elif cj == '}':
                    depth -= 1
                j += 1
            if depth:
                raise JsSyntaxError('Unterminated template literal')
            cooked_parts.append(''.join(cooked))
            raw_parts.append(''.join(raw))
            cooked, raw = [], []
            exprs.append(src[i + 2:j - 1])
            i = j
            continue
        cooked.append(c)
        raw.append(c)
        i += 1
    raise JsSyntaxError('Unterminated template literal')


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    n = len(src)
    prev: str | None = None   # previous significant token text (regex ctx)
    while i < n:
        c = src[i]
        if c in ' \t\r\n\f\v':
            i += 1
            continue
        if c in '\'"':
            q = c
            j = i + 1
            out = []
            while j < n and src[j] != q:
                if src[j] == '\\':
                    text, j = _string_escape(src, j)
                    out.append(text)
                else:
                    out.append(src[j])
                    j += 1
            if j >= n:
                raise JsSyntaxError('Invalid or unexpected token')
            tokens.append(Token('str', ''.join(out), i))
            i = j + 1
            prev = '<value>'
            continue
        if c == '`':
            cooked, raw, exprs, ni = _scan_template(src, i)
            tokens.append(Token('tpl', (cooked, raw, exprs), i))
            i = ni
            prev = '<value>'
            continue
        if c == '/' and prev in _REGEX_ALLOWED_AFTER:
            # regex literal
            j = i + 1
            in_class = False
            while j < n:
                cj = src[j]
                if cj == '\\':
                    j += 2
                    continue
                if cj == '[':
                    in_class = True
                elif cj == ']':
                    in_class = False
                elif cj == '/' and not in_class:
                    break
                elif cj == '\n':
                    raise JsSyntaxError('Invalid regular expression: missing /')
                j += 1
            if j >= n:
                raise JsSyntaxError('Invalid regular expression: missing /')
            pattern = src[i + 1:j]
            m = _IDENT_RGX.match(src, j + 1)
            flags = m.group(0) if m and m.start() == j + 1 else ''
            tokens.append(Token('regex', (pattern, flags), i))
            i = j + 1 + len(flags)
            prev = '<value>'
            continue
        m = _NUM_RGX.match(src, i)
        if m and (c.isdigit() or (c == '.' and i + 1 < n and src[i + 1].isdigit())):
            text = m.group(0)
            if text[:2].lower() in ('0x', '0o', '0b'):
                value = int(text, 0)
            elif '.' in text or 'e' in text or 'E' in text:
                value = float(text)
            else:
                value = int(text)
            tokens.append(Token('num', value, i))
            i = m.end()
            prev = '<value>'
            continue
        m = _IDENT_RGX.match(src, i)
        if m:
            tokens.append(Token('ident', m.group(0), i))
            i = m.end()
            prev = m.group(0) if m.group(0) in _REGEX_ALLOWED_AFTER else '<value>'
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                tokens.append(Token('punct', p, i))
                i += len(p)
                prev = p
                break
        else:
            raise JsSyntaxError('Invalid or unexpected token')
    tokens.append(Token('eof', None, n))
    return tokens


# binary operator precedence (higher binds tighter); && || ?? handled
# separately as 'logic' nodes, ?: as 'cond'
_BIN_PREC = {
    '|': 5, '^': 6, '&': 7,
    '==': 8, '!=': 8, '===': 8, '!==': 8,
    '<': 9, '>': 9, '<=': 9, '>=': 9, 'in': 9, 'instanceof': 9,
    '<<': 10, '>>': 10, '>>>': 10,
    '+': 11, '-': 11,
    '*': 12, '/': 12, '%': 12,
    '**': 13,
}


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.tokens = tokenize(src)
        self.pos = 0

    # -- token helpers ---------------------------------------------------
    def peek(self) -> Token:
        return self.tokens[self.pos]

    def next(self) -> Token:
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    def accept(self, punct: str) -> bool:
        t = self.peek()
        if t.kind == 'punct' and t.value == punct:
            self.pos += 1
            return True
        return False

    def expect(self, punct: str):
        if not self.accept(punct):
            self._unexpected(self.peek())

    def _unexpected(self, t: Token):
        if t.kind == 'ident':
            raise JsSyntaxError('Unexpected identifier')
        if t.kind == 'eof':
            raise JsSyntaxError('Unexpected end of input')
        if t.kind == 'num':
            raise JsSyntaxError('Unexpected number')
        if t.kind in ('str', 'tpl'):
            raise JsSyntaxError('Unexpected string')
        raise JsSyntaxError("Unexpected token '{}'".format(t.value))

    # -- grammar ---------------------------------------------------------
    def parse_expression(self):
        """Full expression, must consume all input."""
        node = self.assignment()
        t = self.peek()
        if t.kind != 'eof':
            self._unexpected(t)
        return node

    def assignment(self):
        # arrow functions: IDENT => ... | ( params ) => ...
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        return self.conditional()

    def _try_arrow(self):
        start = self.pos
        t = self.peek()
        params = None
        if t.kind == 'ident' and t.value not in _KEYWORD_VALUES:
            nxt = self.tokens[self.pos + 1]
            if nxt.kind == 'punct' and nxt.value == '=>':
                params = [t.value]
                self.pos += 2
        elif t.kind == 'punct' and t.value == '(':
            # lookahead: ( ident [, ident]* ) =>
            j = self.pos + 1
            names = []
            ok = True
            while True:
                tj = self.tokens[j]
                if tj.kind == 'punct' and tj.value == ')' and not names:
                    j += 1
                    break
                if tj.kind != 'ident':
                    ok = False
                    break
                names.append(tj.value)
                j += 1
                tj = self.tokens[j]
                if tj.kind == 'punct' and tj.value == ',':
                    j += 1
                    continue
                if tj.kind == 'punct' and tj.value == ')':
                    j += 1
                    break
                ok = False
                break
            if ok and self.tokens[j].kind == 'punct' and self.tokens[j].value == '=>':
                params = names
                self.pos = j + 1
        if params is None:
            self.pos = start
            return None
        if self.peek().kind == 'punct' and self.peek().value == '{':
            raise JsSyntaxError('Arrow function bodies with statement blocks'
                                ' are not supported in RBQL expressions')
        body = self.assignment()
        return ('arrow', params, body)

    def conditional(self):
        node = self.nullish()
        if self.accept('?'):
            then = self.assignment()
            self.expect(':')
            els = self.assignment()
            return ('cond', node, then, els)
        return node

    def nullish(self):
        node = self.logical_or()
        while self.accept('??'):
            node = ('logic', '??', node, self.logical_or())
        return node

    def logical_or(self):
        node = self.logical_and()
        while self.accept('||'):
            node = ('logic', '||', node, self.logical_and())
        return node

    def logical_and(self):
        node = self.binary(0)
        while self.accept('&&'):
            node = ('logic', '&&', node, self.binary(0))
        return node

    def binary(self, min_prec: int):
        node = self.unary()
        while True:
            t = self.peek()
            op = None
            if t.kind == 'punct' and t.value in _BIN_PREC:
                op = t.value
            elif t.kind == 'ident' and t.value in ('in', 'instanceof'):
                op = t.value
            if op is None or _BIN_PREC[op] < min_prec:
                return node
            self.pos += 1
            if op == '**':  # right-associative
                rhs = self.unary()
                t2 = self.peek()
                if t2.kind == 'punct' and t2.value == '**':
                    self.pos += 1
                    rhs = ('bin', '**', rhs, self.binary(_BIN_PREC['**']))
            else:
                rhs = self.binary(_BIN_PREC[op] + 1)
            node = ('bin', op, node, rhs)

    def unary(self):
        t = self.peek()
        if t.kind == 'punct' and t.value in ('!', '-', '+', '~'):
            self.pos += 1
            return ('unary', t.value, self.unary())
        if t.kind == 'ident' and t.value in ('typeof', 'void'):
            self.pos += 1
            return ('unary', t.value, self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t.kind == 'punct' and t.value == '.':
                self.pos += 1
                name_t = self.next()
                if name_t.kind != 'ident':
                    self._unexpected(name_t)
                node = ('member', node, name_t.value)
            elif t.kind == 'punct' and t.value == '?.':
                self.pos += 1
                name_t = self.next()
                if name_t.kind != 'ident':
                    self._unexpected(name_t)
                node = ('member', node, name_t.value)  # optional-chain ≈ member
            elif t.kind == 'punct' and t.value == '[':
                self.pos += 1
                idx = self.assignment()
                self.expect(']')
                node = ('index', node, idx)
            elif t.kind == 'punct' and t.value == '(':
                self.pos += 1
                args = []
                if not self.accept(')'):
                    while True:
                        if self.accept('...'):
                            args.append(('spread', self.assignment()))
                        else:
                            args.append(self.assignment())
                        if self.accept(','):
                            continue
                        self.expect(')')
                        break
                node = ('call', node, args)
            elif t.kind == 'tpl':
                # tagged template: TAG`...`
                self.pos += 1
                cooked, raw, exprs = t.value
                parts = _interleave(cooked, [Parser(e).parse_expression() for e in exprs])
                raw_parts = _interleave(raw, [Parser(e).parse_expression() for e in exprs])
                node = ('tagged_tpl', node, parts, raw_parts)
            else:
                return node

    def primary(self):
        t = self.next()
        if t.kind == 'num':
            return ('num', t.value)
        if t.kind == 'str':
            return ('str', t.value)
        if t.kind == 'regex':
            return ('regex', t.value[0], t.value[1])
        if t.kind == 'tpl':
            cooked, raw, exprs = t.value
            parts = _interleave(cooked, [Parser(e).parse_expression() for e in exprs])
            return ('tpl', parts, False)
        if t.kind == 'ident':
            if t.value in _KEYWORD_VALUES:
                return ('const', _KEYWORD_VALUES[t.value])
            if t.value == 'undefined':
                return ('const', 'undefined')
            if t.value == 'new':
                # new Expr(args) — parse and mark; transpiler handles
                callee = self.postfix()
                return ('new', callee)
            return ('name', t.value)
        if t.kind == 'punct':
            if t.value == '(':
                node = self.assignment()
                self.expect(')')
                return node
            if t.value == '[':
                items = []
                if not self.accept(']'):
                    while True:
                        if self.accept('...'):
                            items.append(('spread', self.assignment()))
                        else:
                            items.append(self.assignment())
                        if self.accept(','):
                            if self.accept(']'):
                                break
                            continue
                        self.expect(']')
                        break
                return ('array', items)
            if t.value == '{':
                pairs = []
                if not self.accept('}'):
                    while True:
                        kt = self.next()
                        if kt.kind == 'ident':
                            key = ('str', kt.value)
                        elif kt.kind == 'str':
                            key = ('str', kt.value)
                        elif kt.kind == 'num':
                            key = ('str', _num_key(kt.value))
                        elif kt.kind == 'punct' and kt.value == '[':
                            key = self.assignment()
                            self.expect(']')
                        else:
                            self._unexpected(kt)
                        if self.accept(':'):
                            value = self.assignment()
                        elif kt.kind == 'ident':
                            value = ('name', kt.value)  # shorthand {a1}
                        else:
                            self._unexpected(self.peek())
                        pairs.append((key, value))
                        if self.accept(','):
                            if self.accept('}'):
                                break
                            continue
                        self.expect('}')
                        break
                return ('object', pairs)
        self._unexpected(t)


def _interleave(literals: list[str], exprs: list):
    """['a','b','c'], [X, Y] → ['a', X, 'b', Y, 'c'] (template structure)."""
    out: list = []
    for i, lit in enumerate(literals):
        out.append(lit)
        if i < len(exprs):
            out.append(exprs[i])
    return out


def _num_key(v) -> str:
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def parse_js_expression(src: str):
    """Parse one JS expression → AST tuple.  Raises JsSyntaxError."""
    src = src.strip()
    if not src:
        raise JsSyntaxError('Unexpected end of input')
    return Parser(src).parse_expression()
