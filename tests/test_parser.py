import pytest

from rbql_spark import parser
from rbql_spark.errors import RbqlParsingError


def parse_one(q, has_ctx=True):
    stages = parser.parse_query(q, has_context_table=has_ctx)
    assert len(stages) == 1
    return stages[0]


def test_string_literal_masking_roundtrip():
    masked, lits = parser.separate_string_literals("select a1, 'where x', \"order by\" where a2")
    assert 'where x' not in masked
    assert parser.combine_string_literals(masked, lits).startswith("select a1, 'where x'")


def test_basic_select_clauses():
    ps = parse_one("SELECT a1, a2 WHERE int(a1) > 5 ORDER BY a2 DESC LIMIT 10")
    assert ps.is_select
    assert [it.text for it in ps.select_items] == ['a1', 'a2']
    assert ps.where_expr == 'int(a1) > 5'
    assert ps.sort_key_exprs == ['a2']
    assert ps.sort_reverse is True
    assert ps.top_count == 10


def test_top_and_distinct():
    ps = parse_one("SELECT TOP 5 DISTINCT a1")
    assert ps.top_count == 5
    assert ps.distinct and not ps.distinct_count
    ps = parse_one("SELECT DISTINCT COUNT a1")
    assert ps.distinct_count


def test_keywords_inside_strings_inert():
    ps = parse_one("SELECT a1 WHERE a2 == 'where order by group by'")
    assert ps.where_expr == "a2 == 'where order by group by'"


def test_as_alias():
    ps = parse_one("SELECT a1 AS foo, a2 * 2 as bar")
    assert ps.select_items[0].alias == 'foo'
    assert ps.select_items[1].alias == 'bar'
    assert ps.select_items[1].text == 'a2 * 2'


def test_star_forms():
    ps = parse_one("SELECT *, a.*, b.*")
    assert [it.star for it in ps.select_items] == ['*', 'a.*', 'b.*']


def test_count_star_rewrite():
    ps = parse_one("SELECT COUNT(*)")
    assert ps.select_items[0].text == 'COUNT(1)'


def test_join_parse():
    ps = parse_one("SELECT a1 INNER JOIN /tmp/b.csv ON a1 == b2 AND a2 == b1")
    assert ps.join_subtype == parser.INNER_JOIN
    assert ps.join_table_id == '/tmp/b.csv'
    assert ps.join_var_pairs == [('a1', 'b2'), ('a2', 'b1')]


def test_strict_left_join_keyword():
    ps = parse_one("SELECT a1 STRICT LEFT JOIN b ON a1 == b1")
    assert ps.join_subtype == parser.STRICT_LEFT_JOIN


def test_update_parse():
    ps = parse_one("UPDATE SET a1 = a2 + 1, a2 = 'x' WHERE a3 == 'y'")
    assert not ps.is_select
    assert ps.update_assignments == [('a1', 'a2 + 1'), ('a2', "'x'")]
    assert ps.where_expr == "a3 == 'y'"


def test_update_must_lead():
    with pytest.raises(RbqlParsingError):
        parse_one("SELECT a1 UPDATE a2 = 1")


def test_where_single_equals_rejected():
    with pytest.raises(RbqlParsingError, match='Assignments'):
        parse_one("SELECT a1 WHERE a1 = 5")


def test_group_by():
    ps = parse_one("SELECT a2, COUNT(1) GROUP BY a2, a3")
    assert ps.group_key_exprs == ['a2', 'a3']


def test_order_by_in_aggregate_rejected():
    with pytest.raises(RbqlParsingError):
        parse_one("SELECT COUNT(1) GROUP BY a2 ORDER BY a1")


def test_except_parse():
    ps = parse_one("SELECT * EXCEPT a1, a3")
    assert ps.except_vars == ['a1', 'a3']


def test_pipe_stages():
    stages = parser.parse_query("SELECT a1, a2 | SELECT a1 WHERE a1 == 'x'")
    assert len(stages) == 2
    assert stages[1].where_expr == "a1 == 'x'"


def test_with_modifier():
    ps = parse_one("SELECT a1 WITH (noheader)")
    assert ps.with_modifier == 'noheader'


def test_from_required_without_context():
    with pytest.raises(RbqlParsingError):
        parse_one("SELECT a1", has_ctx=False)
    ps = parse_one("SELECT a1 FROM mytable", has_ctx=False)
    assert ps.from_table_id == 'mytable'


def test_from_a_stripped_with_context():
    ps = parse_one("SELECT a1 FROM a")
    assert ps.from_table_id is None


def test_select_and_update_both_rejected():
    with pytest.raises(RbqlParsingError):
        parse_one("")


def test_comments_stripped():
    ps = parse_one("# leading comment\nSELECT a1\n# trailing")
    assert [it.text for it in ps.select_items] == ['a1']


def test_multiple_statement_error():
    with pytest.raises(RbqlParsingError, match='More than one'):
        parse_one("SELECT a1 WHERE a1 WHERE a2")
