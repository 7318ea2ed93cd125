"""Output-header computation from the select list.

Behavior parity with the reference's AST analysis + naming rules:
``ast_parse_select_expression_to_column_infos`` / ``column_info_from_node`` /
``select_output_header`` (rbql_engine.py:140-232,1411-1454):

  * bare ``a1``/``b2``      → source column name (or ``colN`` fallback)
  * ``a.name`` / ``a["x"]`` → that name
  * ``expr AS alias``       → alias
  * ``NR``/``NF``/other id  → the identifier text itself
  * anything else           → ``colN``
  * stars splice the source header(s)
  * headerless input: header is None unless an alias is used; star+alias
    without input header is an error
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass

from .errors import RbqlParsingError
from .parser import SelectItem


@dataclass
class ColumnInfo:
    table_name: str | None = None
    column_index: int | None = None
    column_name: str | None = None
    is_star: bool = False
    alias_name: str | None = None


def column_info_for_item(item: SelectItem, unmasked_text: str) -> ColumnInfo:
    if item.star:
        table = None if item.star == '*' else item.star[0]
        return ColumnInfo(table_name=table, is_star=True)
    if item.alias is not None:
        return ColumnInfo(alias_name=item.alias)
    try:
        root = ast.parse(unmasked_text.strip(), mode='eval').body
    except SyntaxError:
        return ColumnInfo()
    if isinstance(root, ast.Name):
        m = re.match(r'^([ab])([1-9][0-9]*)$', root.id)
        if m:
            return ColumnInfo(table_name=m.group(1), column_index=int(m.group(2)) - 1)
        return ColumnInfo(column_name=root.id)  # NR, NF, etc.
    if isinstance(root, ast.Attribute) and isinstance(root.value, ast.Name) and root.value.id in ('a', 'b'):
        return ColumnInfo(column_name=root.attr)
    if isinstance(root, ast.Subscript) and isinstance(root.value, ast.Name) and root.value.id in ('a', 'b'):
        sl = root.slice
        if isinstance(sl, ast.Constant):
            if isinstance(sl.value, str):
                return ColumnInfo(column_name=sl.value)
            if isinstance(sl.value, int):
                return ColumnInfo(table_name=root.value.id, column_index=sl.value - 1)
    return ColumnInfo()


def select_output_header(input_header: list[str] | None,
                         join_header: list[str] | None,
                         infos: list[ColumnInfo]) -> list[str] | None:
    query_has_star = any(ci.is_star for ci in infos)
    query_has_alias = any(ci.alias_name is not None for ci in infos)
    if input_header is None:
        if query_has_star and query_has_alias:
            raise RbqlParsingError(
                'Using both * (star) and AS alias in the same query is not allowed '
                'for input tables without header'
            )
        if not query_has_alias:
            return None
        input_header = []
        join_header = []
    if join_header is None:
        join_header = []
    out: list[str] = []
    for ci in infos:
        if ci.is_star:
            if ci.table_name is None:
                out += input_header + join_header
            elif ci.table_name == 'a':
                out += input_header
            else:
                out += join_header
        elif ci.column_name is not None:
            out.append(ci.column_name)
        elif ci.alias_name is not None:
            out.append(ci.alias_name)
        elif ci.column_index is not None:
            if ci.table_name == 'a' and ci.column_index < len(input_header):
                out.append(input_header[ci.column_index])
            elif ci.table_name == 'b' and ci.column_index < len(join_header):
                out.append(join_header[ci.column_index])
            else:
                out.append('col{}'.format(len(out) + 1))
        else:
            out.append('col{}'.format(len(out) + 1))
    return out
