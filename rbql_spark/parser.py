"""Shallow query parser: RBQL dialect → :class:`ParsedStage` IR.

Grammar parity targets (behavior only, implementation is original):
  * clause keyword set & grouping  — rbql_engine.py:27-42
  * string-literal masking         — rbql_engine.py:1222-1238
  * clause location / separation   — rbql_engine.py:1240-1318
  * TOP / LIMIT                    — rbql_engine.py:1301-1304,1321-1327
  * WITH (modifier)                — rbql_engine.py:1264-1267
  * pipe stage splitting           — rbql_engine.py:1577-1580
  * select-list / AS / star forms  — rbql_engine.py:1148-1219
  * join expression grammar        — rbql_engine.py:991-1013
  * UPDATE assignment grammar      — rbql_engine.py:1178-1200

A query is ONE select/update statement whose expressions are arbitrary Python;
we split clauses textually (string literals masked first so keywords inside
strings stay inert), then split the select list / group-by key / order-by key
on *top-level* commas with a bracket-depth scanner (an improvement over the
reference's global regexes, same observable behavior on its test corpus).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .errors import RbqlParsingError

GROUP_BY = 'GROUP BY'
UPDATE = 'UPDATE'
SELECT = 'SELECT'
JOIN = 'JOIN'
INNER_JOIN = 'INNER JOIN'
LEFT_JOIN = 'LEFT JOIN'
LEFT_OUTER_JOIN = 'LEFT OUTER JOIN'
STRICT_LEFT_JOIN = 'STRICT LEFT JOIN'
ORDER_BY = 'ORDER BY'
WHERE = 'WHERE'
LIMIT = 'LIMIT'
EXCEPT = 'EXCEPT'
WITH = 'WITH'
FROM = 'FROM'

STATEMENT_GROUPS = [
    [STRICT_LEFT_JOIN, LEFT_OUTER_JOIN, LEFT_JOIN, INNER_JOIN, JOIN],
    [SELECT],
    [ORDER_BY],
    [WHERE],
    [UPDATE],
    [GROUP_BY],
    [LIMIT],
    [EXCEPT],
    [FROM],
]

STRING_LITERAL_MARKER = '___RBQL_STRING_LITERAL{}___'
_STRING_LITERALS_RGX = re.compile(
    r'''(\"\"\"|\'\'\'|\"|\')((?<!\\)(\\\\)*\\\1|.)*?\1'''
)
# JS masking adds template literals (backticks) and drops triple quotes
# (rbql-js/rbql.js:1349-1370 masks ' " ` with the same escape structure)
_JS_STRING_LITERALS_RGX = re.compile(
    r"""'(?:\\(?:\\\\)*'|[^'])*'|"(?:\\(?:\\\\)*"|[^"])*"|`(?:\\(?:\\\\)*`|[^`])*`"""
)


def separate_string_literals(expression: str, dialect: str = 'python') -> tuple[str, list[str]]:
    """Mask string literals with ``___RBQL_STRING_LITERALn___`` placeholders."""
    rgx = _JS_STRING_LITERALS_RGX if dialect == 'js' else _STRING_LITERALS_RGX
    literals: list[str] = []
    out: list[str] = []
    prev_end = 0
    for m in rgx.finditer(expression):
        out.append(expression[prev_end:m.start()])
        out.append(STRING_LITERAL_MARKER.format(len(literals)))
        literals.append(m.group(0))
        prev_end = m.end()
    out.append(expression[prev_end:])
    return ''.join(out).replace('\t', ' '), literals


def combine_string_literals(masked: str, literals: list[str]) -> str:
    for i, lit in enumerate(literals):
        masked = masked.replace(STRING_LITERAL_MARKER.format(i), lit)
    return masked


def cleanup_query(query_text: str, dialect: str = 'python') -> str:
    comment = '//' if dialect == 'js' else '#'
    lines = [ln.strip() for ln in query_text.split('\n')]
    lines = ['' if ln.startswith(comment) else ln for ln in lines]
    return ' '.join(ln for ln in lines if ln).rstrip(';')


def split_query_to_stages(masked_query: str) -> list[str]:
    """Split on ``|`` / ``|>`` pipe boundaries (each stage a full query)."""
    return re.split(r'\|[>]?[ ]*(?=(?:select|update)[ ])', masked_query, flags=re.IGNORECASE)


def remove_redundant_input_table_name(masked_query: str) -> str:
    masked_query = re.sub(' +from +a(?: +|$)', ' ', masked_query, flags=re.IGNORECASE).strip()
    masked_query = re.sub('^ *update +a +set ', 'update ', masked_query, flags=re.IGNORECASE).strip()
    return masked_query


def _locate_statements(statement_groups, expression: str):
    located = []
    for group in statement_groups:
        for statement in group:
            rgx = r'(?i)(?:^| ){}(?= )'.format(statement.replace(' ', ' *'))
            matches = list(re.finditer(rgx, expression))
            if not matches:
                continue
            if len(matches) > 1:
                raise RbqlParsingError('More than one "{}" statements found'.format(statement))
            m = matches[0]
            located.append((m.start(), m.end(), statement))
            break  # don't also match a sub-statement of the same group (INNER JOIN vs JOIN)
    return sorted(located)


def separate_actions(statement_groups, expression: str) -> dict[str, dict]:
    expression = expression.strip(' ')
    result: dict[str, dict] = {}
    mobj = re.match(r'^(.*)  *[Ww][Ii][Tt][Hh] *\(([a-z]{4,20})\) *$', expression)
    if mobj is not None:
        expression = mobj.group(1)
        result[WITH] = {'text': mobj.group(2)}
    located = _locate_statements(statement_groups, expression)
    for i, (stmt_start, span_start, statement) in enumerate(located):
        span_end = located[i + 1][0] if i + 1 < len(located) else len(expression)
        span = expression[span_start:span_end]
        params: dict = {}
        if statement in (STRICT_LEFT_JOIN, LEFT_OUTER_JOIN, LEFT_JOIN, INNER_JOIN, JOIN):
            params['join_subtype'] = statement
            statement = JOIN
        if statement == UPDATE:
            if stmt_start != 0:
                raise RbqlParsingError('UPDATE keyword must be at the beginning of the query')
            span = re.sub('(?i)^ *SET ', '', span)
        if statement == ORDER_BY:
            span = re.sub('(?i) ASC *$', '', span)
            new_span = re.sub('(?i) DESC *$', '', span)
            params['reverse'] = new_span != span
            span = new_span
        if statement == SELECT:
            if stmt_start != 0:
                raise RbqlParsingError('SELECT keyword must be at the beginning of the query')
            m = re.match('(?i)^ *TOP *([0-9]+) ', span)
            if m is not None:
                params['top'] = int(m.group(1))
                span = span[m.end():]
            m = re.match('(?i)^ *DISTINCT *(COUNT)? ', span)
            if m is not None:
                params['distinct'] = True
                if m.group(1) is not None:
                    params['distinct_count'] = True
                span = span[m.end():]
        params['text'] = span.strip()
        result[statement] = params
    if SELECT not in result and UPDATE not in result:
        raise RbqlParsingError('Query must contain either SELECT or UPDATE statement')
    if SELECT in result and UPDATE in result:
        raise RbqlParsingError('Query can not contain both SELECT and UPDATE statements')
    return result


def split_top_level(text: str, sep: str = ',') -> list[str]:
    """Split on separators not nested in ()/[]/{} (string literals pre-masked)."""
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(text):
        if ch in '([{':
            depth += 1
        elif ch in ')]}':
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


_AS_ALIAS_RGX = re.compile(r' +(AS|as) +([a-zA-Z][a-zA-Z0-9_]*) *$')


@dataclass
class SelectItem:
    """One entry of the select list (string literals still masked)."""
    text: str                    # expression text (masked), no alias
    alias: str | None = None     # `AS alias`
    star: str | None = None      # '*' | 'a.*' | 'b.*'


def parse_select_list(select_text: str) -> list[SelectItem]:
    if not select_text.strip():
        raise RbqlParsingError('"SELECT" expression is empty')
    items: list[SelectItem] = []
    for raw in split_top_level(select_text):
        part = raw.strip()
        if part in ('*', 'a.*', 'b.*'):
            items.append(SelectItem(text=part, star=part))
            continue
        alias = None
        m = _AS_ALIAS_RGX.search(part)
        if m is not None:
            alias = m.group(2)
            part = part[:m.start()].strip()
        if not part:
            raise RbqlParsingError('"SELECT" expression is empty')
        # COUNT(*) → COUNT(1) rewrite (rbql_engine.py:1144-1145)
        part = re.sub(r'^(COUNT|count|Count) *\( *\* *\)$', r'\1(1)', part)
        items.append(SelectItem(text=part, alias=alias))
    return items


def parse_join_expression(src: str, dialect: str = 'python') -> tuple[str, list[tuple[str, str]]]:
    src = src.strip()
    err = 'Invalid join syntax. Valid syntax: <JOIN> /path/to/B/table on a... == b... [and a... == b... [and ... ]]'
    # JS accepts '&&' between key pairs too (rbql-js/rbql.js:1165)
    and_rgx = '^ +(?:and|&&) +' if dialect == 'js' else '^ +and +'
    m = re.search(r'^([^ ]+) +on +', src, re.IGNORECASE)
    if m is None:
        raise RbqlParsingError(err)
    table_id = m.group(1)
    src = src[m.end():]
    pairs: list[tuple[str, str]] = []
    while True:
        m = re.search('^([^ =]+) *==? *([^ =]+)', src)
        if m is None:
            raise RbqlParsingError(err)
        pairs.append((m.group(1), m.group(2)))
        src = src[m.end():]
        if not src:
            break
        m = re.search(and_rgx, src, re.IGNORECASE)
        if m is None:
            raise RbqlParsingError(err)
        src = src[m.end():]
    return table_id, pairs


_UPDATE_ASSIGNMENT_RGX = re.compile(r'^ *(a[0-9\[.][.#a-zA-Z0-9\[\]_]*|a\["[^"]*"\]|a\[\'[^\']*\'\]) *=(?=[^=])')


def parse_update_expression(update_text: str) -> list[tuple[str, str]]:
    """Parse ``a1 = expr, a2 = expr`` → list of (target_var_text, expr_text).

    Top-level comma split first (reference uses a lookahead regex,
    rbql_engine.py:1178-1200 — same accepted language for its corpus since
    function args with ``aN =`` kwargs are not supported there either).
    """
    assignments: list[tuple[str, str]] = []
    for raw in split_top_level(update_text):
        m = _UPDATE_ASSIGNMENT_RGX.match(raw)
        if m is None:
            if not assignments:
                raise RbqlParsingError(
                    'Unable to parse "UPDATE" expression: the expression must start with assignment,'
                    ' but "{}" does not look like an assignable field name'.format(update_text.split('=')[0].strip())
                )
            # bare top-level comma inside the previous value expression
            # (e.g. an unparenthesized tuple) — glue it back
            var, expr = assignments[-1]
            assignments[-1] = (var, expr + ',' + raw)
            continue
        assignments.append((m.group(1).strip(), raw[m.end():].strip()))
    return assignments


@dataclass
class ParsedStage:
    """IR for one pipe stage (analog of the reference's RBQLContext,
    rbql_engine.py:76-103, but declarative: expression strings only)."""
    is_select: bool
    select_items: list[SelectItem] = field(default_factory=list)
    distinct: bool = False
    distinct_count: bool = False
    top_count: int | None = None
    except_vars: list[str] = field(default_factory=list)   # EXCEPT var names (unmasked)
    where_expr: str | None = None                          # unmasked python expr
    group_key_exprs: list[str] | None = None               # unmasked exprs
    sort_key_exprs: list[str] | None = None                # unmasked exprs
    sort_reverse: bool = False
    update_assignments: list[tuple[str, str]] = field(default_factory=list)  # (var, expr) unmasked
    join_subtype: str | None = None                        # INNER JOIN / LEFT JOIN / ...
    join_table_id: str | None = None
    join_var_pairs: list[tuple[str, str]] = field(default_factory=list)      # unmasked
    from_table_id: str | None = None
    with_modifier: str | None = None
    literals: list[str] = field(default_factory=list)
    masked_text: str = ''   # full stage text, masked (for variable discovery)

    def unmask(self, text: str) -> str:
        return combine_string_literals(text, self.literals)


def parse_stage(stage_masked: str, literals: list[str], has_context_table: bool,
                dialect: str = 'python') -> ParsedStage:
    statement_groups = [g[:] for g in STATEMENT_GROUPS]
    if has_context_table:
        stage_masked = remove_redundant_input_table_name(stage_masked)
        statement_groups.remove([FROM])
    actions = separate_actions(statement_groups, stage_masked)

    ps = ParsedStage(is_select=SELECT in actions, literals=literals, masked_text=stage_masked)
    ps.with_modifier = actions[WITH]['text'] if WITH in actions else None
    if FROM in actions:
        ps.from_table_id = combine_string_literals(actions[FROM]['text'], literals)
    elif not has_context_table:
        raise RbqlParsingError('Queries without context-based input table must contain "FROM" statement')

    if ORDER_BY in actions and UPDATE in actions:
        raise RbqlParsingError('"ORDER BY" is not allowed in "UPDATE" queries')

    if GROUP_BY in actions:
        if ORDER_BY in actions or UPDATE in actions:
            from .errors import INVALID_KEYWORD_IN_AGGREGATE_QUERY_ERROR
            raise RbqlParsingError(INVALID_KEYWORD_IN_AGGREGATE_QUERY_ERROR)
        ps.group_key_exprs = [
            combine_string_literals(p.strip(), literals)
            for p in split_top_level(actions[GROUP_BY]['text'])
        ]

    if JOIN in actions:
        ps.join_subtype = actions[JOIN]['join_subtype']
        table_id, pairs = parse_join_expression(actions[JOIN]['text'], dialect=dialect)
        ps.join_table_id = combine_string_literals(table_id, literals)
        ps.join_var_pairs = [
            (combine_string_literals(u, literals), combine_string_literals(v, literals))
            for u, v in pairs
        ]

    if WHERE in actions:
        where_text = actions[WHERE]['text']
        if re.search(r'[^><!=]=[^=]', where_text) is not None:
            raise RbqlParsingError(
                'Assignments "=" are not allowed in "WHERE" expressions. For equality test use "=="'
            )
        ps.where_expr = combine_string_literals(where_text, literals)

    if UPDATE in actions:
        ps.update_assignments = [
            (combine_string_literals(v, literals), combine_string_literals(e, literals))
            for v, e in parse_update_expression(actions[UPDATE]['text'])
        ]

    if SELECT in actions:
        if LIMIT in actions:
            try:
                ps.top_count = int(actions[LIMIT]['text'])
            except ValueError:
                raise RbqlParsingError('LIMIT keyword must be followed by an integer')
        else:
            ps.top_count = actions[SELECT].get('top')
        ps.distinct = bool(actions[SELECT].get('distinct'))
        ps.distinct_count = bool(actions[SELECT].get('distinct_count'))
        if EXCEPT in actions:
            if JOIN in actions:
                raise RbqlParsingError('EXCEPT and JOIN are not allowed in the same query')
            ps.except_vars = [
                combine_string_literals(v.strip(), literals)
                for v in actions[EXCEPT]['text'].split(',')
            ]
        else:
            ps.select_items = parse_select_list(actions[SELECT]['text'])

    if ORDER_BY in actions:
        ps.sort_key_exprs = [
            combine_string_literals(p.strip(), literals)
            for p in split_top_level(actions[ORDER_BY]['text'])
        ]
        ps.sort_reverse = actions[ORDER_BY]['reverse']
    return ps


def parse_query(query_text: str, has_context_table: bool = True,
                dialect: str = 'python') -> list[ParsedStage]:
    """Full front end: cleanup → mask literals → pipe-split → per-stage parse.

    ``dialect``: expression language of the query — 'python' (default) or
    'js'.  The RBQL clause grammar is dialect-shared; for 'js' every
    expression field of the resulting stages is transpiled to the Python
    expression surface (rbql_spark.jsdialect) so the rest of the engine is
    dialect-unaware.
    """
    cleaned = cleanup_query(query_text, dialect=dialect)
    masked, literals = separate_string_literals(cleaned, dialect=dialect)
    stages = split_query_to_stages(masked)
    # only the first stage may carry FROM; subsequent stages always have a context table
    parsed = [
        parse_stage(stage, literals, has_context_table if i == 0 else True,
                    dialect=dialect)
        for i, stage in enumerate(stages)
    ]
    if dialect == 'js':
        for ps in parsed:
            _adapt_stage_js(ps, cleaned)
    return parsed


def _js_transpile(src: str, full_query: str) -> str:
    """One JS expression → Python source; JS parse failures surface as
    SyntaxError with the offending expression embedded so
    exception_to_error_info applies the reference's HAVING/LIKE/FROM and
    'and'/'or' hints (rbql-js/rbql.js:986-1008 inspects the query text the
    same way)."""
    from .jsdialect import JsSyntaxError, js_expr_to_python
    try:
        return js_expr_to_python(src)
    except JsSyntaxError as e:
        raise SyntaxError('{}\nExpression: {}'.format(e, src)) from None


def _adapt_stage_js(ps: ParsedStage, full_query: str) -> None:
    """Transpile every expression field of a parsed stage in place.

    Variable-name surfaces (EXCEPT lists, JOIN key pairs, UPDATE targets)
    are dialect-shared and stay untouched; ``...expr`` select items map to
    the engine's ``*expr`` unpack form (reference: JS spread and Python
    star-unpack are the same RBQL feature)."""
    from .jsdialect import js_update_target_to_python
    if ps.where_expr is not None:
        ps.where_expr = _js_transpile(ps.where_expr, full_query)
    if ps.group_key_exprs is not None:
        ps.group_key_exprs = [_js_transpile(e, full_query) for e in ps.group_key_exprs]
    if ps.sort_key_exprs is not None:
        ps.sort_key_exprs = [_js_transpile(e, full_query) for e in ps.sort_key_exprs]
    ps.update_assignments = [
        (js_update_target_to_python(var), _js_transpile(expr, full_query))
        for var, expr in ps.update_assignments
    ]
    for item in ps.select_items:
        if item.star is not None:
            continue
        src = ps.unmask(item.text).strip()
        if src.startswith('...'):
            item.text = '*' + _js_transpile(src[3:], full_query)
        else:
            item.text = _js_transpile(src, full_query)
