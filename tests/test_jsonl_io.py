import json
import os

from rbql_spark import query_dataframe
from rbql_spark.sources.jsonl import read_jsonl, read_jsonl_typed, write_jsonl


def _write(tmp_path, name, objs):
    p = os.path.join(str(tmp_path), name)
    with open(p, 'w') as f:
        for o in objs:
            f.write(json.dumps(o) + '\n')
    return p


PEOPLE = [
    {'name': 'alice', 'age': 30, 'occupation': 'dev'},
    {'name': 'bob', 'age': 25, 'occupation': 'ops'},
    {'name': 'carol', 'age': 41, 'occupation': 'dev'},
]


def test_jsonl_single_object_column(spark, tmp_path):
    p = _write(tmp_path, 'people.jsonl', PEOPLE)
    h = read_jsonl(spark, p)
    res = query_dataframe(spark, "SELECT a1['name'], a1['age'] WHERE a1['age'] > 26", h)
    rows = [list(r) for r in res.display_df(ordered=True).collect()]
    assert rows == [['alice', 30], ['carol', 41]]


def test_jsonl_nested_access(spark, tmp_path):
    objs = [{'name': 'x', 'address': {'city': 'Paris'}},
            {'name': 'y', 'address': {'city': 'Oslo'}}]
    p = _write(tmp_path, 'nested.jsonl', objs)
    h = read_jsonl(spark, p)
    res = query_dataframe(spark, "SELECT a1['name'], a1['address']['city']", h)
    rows = [list(r) for r in res.display_df(ordered=True).collect()]
    assert rows == [['x', 'Paris'], ['y', 'Oslo']]


def test_jsonl_typed_reader(spark, tmp_path):
    p = _write(tmp_path, 'people.jsonl', PEOPLE)
    h = read_jsonl_typed(spark, p)
    res = query_dataframe(spark, "SELECT a.name, a.age * 2 AS dbl WHERE a.occupation == 'dev'", h)
    rows = sorted(map(tuple, (list(r) for r in res.display_df().collect())))
    assert rows == [('alice', 60), ('carol', 82)]


def test_jsonl_writer_multi_column(spark, tmp_path):
    p = _write(tmp_path, 'people.jsonl', PEOPLE)
    out = os.path.join(str(tmp_path), 'out.jsonl')
    h = read_jsonl_typed(spark, p)
    res = query_dataframe(spark, 'SELECT a.name, a.age WHERE a.age < 28', h)
    write_jsonl(res, out)
    lines = [json.loads(ln) for ln in open(out)]
    assert lines == [{'name': 'bob', 'age': 25}]


def test_jsonl_writer_single_column_bare_value(spark, tmp_path):
    p = _write(tmp_path, 'people.jsonl', PEOPLE)
    out = os.path.join(str(tmp_path), 'out.jsonl')
    h = read_jsonl_typed(spark, p)
    res = query_dataframe(spark, "SELECT a.name ORDER BY a.name", h)
    write_jsonl(res, out)
    assert [json.loads(ln) for ln in open(out)] == ['alice', 'bob', 'carol']
