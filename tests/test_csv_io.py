import os

import pytest

from rbql_spark import query_csv
from rbql_spark.sources.csv import read_csv, split_quoted, write_csv


def _hrows(h, n):
    """First n data columns of a handle, in source order."""
    from rbql_spark.binding import NF_SRC_COL, ORDER_SRC_COL
    df = h.df
    if ORDER_SRC_COL in df.columns:
        df = df.orderBy(ORDER_SRC_COL)
    cols = [c for c in df.columns if c not in (ORDER_SRC_COL, NF_SRC_COL)][:n]
    return [[r[c] for c in cols] for r in df.select(*[df[c] for c in cols] + ([df[ORDER_SRC_COL]] if ORDER_SRC_COL in h.df.columns else [])).collect()]


def _write(tmp_path, name, content, encoding='utf-8'):
    p = os.path.join(str(tmp_path), name)
    with open(p, 'w', encoding=encoding, newline='') as f:
        f.write(content)
    return p


# ---- splitter unit tests (behavior parity with reference csv_utils) -------

def test_split_quoted_plain():
    assert split_quoted('a,b,c', ',') == (['a', 'b', 'c'], False)


def test_split_quoted_quotes():
    assert split_quoted('"a,x",b', ',') == (['a,x', 'b'], False)


def test_split_quoted_doubled_quotes():
    assert split_quoted('"say ""hi""",b', ',') == (['say "hi"', 'b'], False)


def test_split_quoted_defective():
    fields, warning = split_quoted('a"b,c', ',')
    assert warning is True
    assert fields == ['a"b', 'c']


def test_split_quoted_trailing_delim():
    assert split_quoted('a,b,', ',')[0] == ['a', 'b', '']


def test_split_quoted_external_spaces():
    assert split_quoted(' "a" ,b', ',') == (['a', 'b'], False)


# ---- read paths -----------------------------------------------------------

def test_read_simple_tsv(spark, tmp_path):
    p = _write(tmp_path, 't.tsv', 'a1\tb1\tc1\na2\tb2\tc2\n')
    h = read_csv(spark, p, delim='\t', policy='simple')
    rows = _hrows(h, 3)
    assert rows == [['a1', 'b1', 'c1'], ['a2', 'b2', 'c2']]


def test_read_with_headers(spark, tmp_path):
    p = _write(tmp_path, 't.csv', 'name,age\nalice,30\nbob,25\n')
    h = read_csv(spark, p, with_headers=True)
    assert h.header == ['name', 'age']
    assert sorted(tuple(r)[:2] for r in h.df.collect()) == [('alice', '30'), ('bob', '25')]


def test_read_quoted(spark, tmp_path):
    p = _write(tmp_path, 't.csv', 'x,"a,b",z\n"q""q",w,e\n')
    h = read_csv(spark, p, policy='quoted')
    rows = _hrows(h, 3)
    assert rows == [['x', 'a,b', 'z'], ['q"q', 'w', 'e']]


def test_read_quoted_rfc_multiline(spark, tmp_path):
    p = _write(tmp_path, 't.csv', 'a,"line1\nline2",c\nd,e,f\n')
    h = read_csv(spark, p, policy='quoted_rfc')
    rows = _hrows(h, 3)
    assert rows == [['a', 'line1\nline2', 'c'], ['d', 'e', 'f']]


def test_read_whitespace_policy(spark, tmp_path):
    p = _write(tmp_path, 't.txt', '  a   b  c\nd e    f\n')
    h = read_csv(spark, p, policy='whitespace')
    rows = _hrows(h, 3)
    assert rows == [['a', 'b', 'c'], ['d', 'e', 'f']]


def test_read_monocolumn(spark, tmp_path):
    p = _write(tmp_path, 't.txt', 'one line\nanother, line\n')
    h = read_csv(spark, p, policy='monocolumn')
    rows = _hrows(h, 1)
    assert rows == [['one line'], ['another, line']]


def test_read_multichar_separator(spark, tmp_path):
    p = _write(tmp_path, 't.txt', 'a~#~b~#~c\nd~#~e~#~f\n')
    h = read_csv(spark, p, delim='~#~', policy='simple')
    rows = _hrows(h, 3)
    assert rows == [['a', 'b', 'c'], ['d', 'e', 'f']]


def test_read_bom_stripped(spark, tmp_path):
    p = _write(tmp_path, 't.csv', '﻿x,y\n1,2\n')
    h = read_csv(spark, p, with_headers=True)
    assert h.header == ['x', 'y']


def test_read_comment_prefix(spark, tmp_path):
    p = _write(tmp_path, 't.csv', '#comment\na,b\n#another\nc,d\n')
    h = read_csv(spark, p, comment_prefix='#')
    rows = _hrows(h, 2)
    assert rows == [['a', 'b'], ['c', 'd']]


def test_read_latin1(spark, tmp_path):
    p = os.path.join(str(tmp_path), 'l1.csv')
    with open(p, 'wb') as f:
        f.write('caf\xe9,n\xf8\n1,2\n'.encode('latin-1'))
    h = read_csv(spark, p, encoding='latin-1', policy='simple')
    rows = _hrows(h, 2)
    assert rows == [['caf\xe9', 'n\xf8'], ['1', '2']]


def test_read_ragged_nf(spark, tmp_path):
    p = _write(tmp_path, 't.csv', 'a,b,c\nx,y\n')
    h = read_csv(spark, p, policy='simple')
    from rbql_spark import query_dataframe
    res = query_dataframe(spark, 'SELECT NF, a3', h)
    rows = [list(r) for r in res.display_df(ordered=True).collect()]
    assert rows == [[3, 'c'], [2, None]]


# ---- end-to-end query_csv -------------------------------------------------

def test_query_csv_end_to_end(spark, tmp_path):
    p = _write(tmp_path, 'movies.tsv',
               'Movie One\tUSA\t1999\nFilm Two\tFrance\t2005\nShow Three\tUSA\t2001\n')
    out = os.path.join(str(tmp_path), 'out.csv')
    res = query_csv(spark, "SELECT a1, int(a3) WHERE a2 == 'USA' ORDER BY int(a3) DESC",
                    p, output_path=out, delim='\t', policy='simple',
                    out_delim=',', out_policy='quoted')
    with open(out) as f:
        assert f.read() == 'Show Three,2001\nMovie One,1999\n'


def test_query_csv_with_headers_and_join(spark, tmp_path):
    _write(tmp_path, 'capitals.csv', 'country,capital\nusa,Washington\nfrance,Paris\n')
    p = _write(tmp_path, 'people.csv', 'name,country\nalice,usa\nbob,france\ncarol,usa\n')
    res = query_csv(spark,
                    'SELECT a.name, b.capital INNER JOIN capitals.csv ON a.country == b.country',
                    p, with_headers=True)
    rows = [list(r) for r in res.display_df(ordered=True).collect()]
    assert rows == [['alice', 'Washington'], ['bob', 'Paris'], ['carol', 'Washington']]


def test_write_csv_normalization(spark, tmp_path):
    p = _write(tmp_path, 't.csv', '5,x\n7,y\n')
    out = os.path.join(str(tmp_path), 'out.csv')
    res = query_csv(spark, "SELECT int(a1), None, a2.split('x')", p,
                    output_path=out, policy='simple')
    with open(out) as f:
        content = f.read()
    # ints stringified, None → '', list joined by |
    assert content == '5,,|\n7,,y\n'
