"""TYPE-STRICT differential fuzzing over the driver-resident surface
(r15 verdict #5): the three wrong-answer finds of round 15 — UPDATE
stringifying typed values, JS ``undefined`` erroring instead of null,
nullable-long collect degrading int→float — all hid behind ``==``
comparisons (2 == 2.0).  This suite re-runs randomized mixed-ingest
tables × UPDATE / SELECT-ternary / aggregate / JS-property-access
queries through BOTH engines and compares at the ``repr`` level: a cell
only matches when its runtime TYPE and value match the reference's.

Cases run in seeded blocks of 25 per pytest test (20 python blocks +
4 pandas blocks + 6 JS blocks ≈ 700 cases) so pytest overhead stays
amortized; every failure message carries the seed, query, and table.
"""

import json
import math
import os
import random
import shutil
import subprocess
import sys

import pytest

REF_PY = '/root/reference/rbql-py'
REF_JS = '/root/reference/rbql-js/rbql.js'
RUNNER = os.path.join(os.path.dirname(__file__), '..', 'tools', 'js_ref_runner.js')
NODE = shutil.which('node')

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_PY), reason='reference package not available')]

WORDS = ['alpha', 'beta', 'gamma', 'delta', 'omega']


# ---------------------------------------------------------------------------
# strict comparison: type AND value

def strict_cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if type(a) is not type(b):
        return False
    if isinstance(a, float):
        if math.isnan(a):
            return math.isnan(b)
        # type must match EXACTLY; float VALUES compare with a relative
        # tolerance (Spark's avg/var_pop use numerically different but
        # equivalent formulas than the reference's two-pass arithmetic)
        return a == b or abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0)
    if isinstance(a, (list, tuple)):
        return (len(a) == len(b)
                and all(strict_cell_eq(x, y) for x, y in zip(a, b)))
    return a == b


def strict_equal_tables(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb) or not all(
                strict_cell_eq(x, y) for x, y in zip(ra, rb)):
            return False
    return True


def fmt(rows):
    if rows is None:
        return 'None'
    return '[' + ', '.join(
        '[' + ', '.join('{!r}:{}'.format(v, type(v).__name__) for v in r) + ']'
        for r in rows) + ']'


# ---------------------------------------------------------------------------
# generators: mixed-ingest tables

def cell_value(rnd: random.Random, kinds: str):
    r = rnd.choice(kinds)
    if r == 'i':
        return rnd.randint(-30, 99)
    if r == 'f':
        return round(rnd.uniform(-9, 30), 2)
    if r == 's':
        return rnd.choice(WORDS)
    if r == 'd':  # numeric string
        return str(rnd.randint(-30, 99))
    if r == 'b':
        return rnd.random() < 0.5
    if r == 'B':  # bigint beyond double-exact range
        return rnd.choice([2 ** 53 + rnd.randint(1, 9), 2 ** 60,
                           -(2 ** 53) - rnd.randint(1, 9)])
    return None   # 'n'


def make_typed_table(rnd: random.Random):
    """a1 dense int (safe ORDER key), a2 a random kind-mix column,
    a3 strings, a4 a second mix column."""
    kinds2 = rnd.choice(['i', 'f', 's', 'd', 'if', 'is', 'fs', 'ifs',
                         'ib', 'ifn', 'isn', 'iB', 'in', 'fn', 'dn'])
    kinds4 = rnd.choice(['i', 'f', 'd', 'if', 'in', 'fn'])
    n = rnd.randint(2, 12)
    return [[i + 1, cell_value(rnd, kinds2), rnd.choice(WORDS),
             cell_value(rnd, kinds4)] for i in range(n)]


def make_update_query(rnd: random.Random) -> str:
    """Typed-constant and expression UPDATEs, with/without WHERE — the
    exact family round 15's probe caught (typed value into a
    differently-typed column must keep the real value per cell)."""
    const = rnd.choice(['99', '1.5', "'zz'", 'True', '0', '-7', '2.0',
                        'None if a1 > 2 else 8'])
    tgt = rnd.choice(['a2', 'a3', 'a4'])
    q = 'UPDATE {} = {}'.format(tgt, const)
    if rnd.random() < 0.7:
        q += ' WHERE ' + rnd.choice([
            'a1 % 2 == 0', 'a1 > {}'.format(rnd.randint(0, 8)),
            "a3 == '{}'".format(rnd.choice(WORDS)), 'a1 != 2'])
    return q


def make_select_query(rnd: random.Random) -> str:
    items = rnd.sample([
        'a1', 'a2', 'a4', 'None if NR == 1 else a1',
        'a1 if a1 % 2 else None', 'a2 if NR > 2 else None',
        'a1 * 2', 'a1 / 2', 'a1 if a1 > 3 else 2.5',
        "a2 if isinstance(a2, str) else 'num'",
        'type(a2).__name__', 'str(a2)', 'a2 == 5', "a2 == '5'",
        'NR', '[a1, a1 + 1]',
    ], k=rnd.randint(1, 3))
    q = 'SELECT '
    if rnd.random() < 0.15:
        q += 'DISTINCT '
    q += ', '.join(items)
    if rnd.random() < 0.5:
        q += ' WHERE ' + rnd.choice([
            'a1 > 1', 'a1 % 2 == 0', 'a2 is not None',
            "a3 != '{}'".format(rnd.choice(WORDS))])
    if rnd.random() < 0.4:
        q += ' ORDER BY a1'
        if rnd.random() < 0.5:
            q += ' DESC'
    return q


def make_agg_query(rnd: random.Random) -> str:
    col = rnd.choice(['a1', 'a2', 'a4'])
    aggs = rnd.sample(['COUNT(1)', 'MIN({0})', 'MAX({0})', 'SUM({0})',
                       'ANY_VALUE({0})', 'ARRAY_AGG({0})',
                       'AVG({0})', 'VARIANCE({0})', 'MEDIAN(a1)'],
                      k=rnd.randint(1, 2))
    aggs = [a.format(col) for a in aggs]
    if rnd.random() < 0.5:
        return 'SELECT a3, {} GROUP BY a3'.format(', '.join(aggs))
    return 'SELECT {}'.format(', '.join(aggs))


def make_query(rnd: random.Random) -> str:
    r = rnd.random()
    if r < 0.35:
        return make_update_query(rnd)
    if r < 0.8:
        return make_select_query(rnd)
    return make_agg_query(rnd)


# ---------------------------------------------------------------------------
# reference runners

def run_reference(query, table):
    sys.path.insert(0, REF_PY)
    try:
        import rbql
        out, warnings = [], []
        rbql.query_table(query, [list(r) for r in table], out, warnings)
        return out
    finally:
        sys.path.remove(REF_PY)


def run_reference_pandas(query, pdf):
    sys.path.insert(0, REF_PY)
    try:
        from rbql import rbql_pandas
        return rbql_pandas.query_dataframe(query, pdf)
    finally:
        sys.path.remove(REF_PY)


# ---------------------------------------------------------------------------
# python dialect × query_table, strict

def _one_case(spark, seed: int):
    from rbql_spark import query_table
    rnd = random.Random(seed)
    table = make_typed_table(rnd)
    query = make_query(rnd)
    ref_rows = ref_err = None
    try:
        ref_rows = run_reference(query, table)
    except Exception as e:
        ref_err = str(e)
    got = got_err = None
    try:
        got, _hdr = query_table(spark, query, [list(r) for r in table])
    except Exception as e:
        got_err = str(e)
    ctx = '\nseed {}: query: {}\n table: {}\n ref: {} / {!r}\n got: {} / {!r}'.format(
        seed, query, table, fmt(ref_rows), ref_err, fmt(got), got_err)
    if ref_err is not None:
        assert got_err is not None, 'reference raised, we succeeded' + ctx
        tail = ref_err.split('Details: ', 1)[-1]
        assert tail in got_err, 'error tail mismatch' + ctx
    else:
        assert got_err is None, 'we raised where reference succeeded' + ctx
        assert strict_equal_tables(got, ref_rows), \
            'type-strict divergence' + ctx


@pytest.mark.parametrize('block', range(20))
def test_type_strict_python_block(spark, block):
    for k in range(25):
        _one_case(spark, 300_000 + block * 25 + k)


# ---------------------------------------------------------------------------
# pandas sink, strict

def _pdf_cells(pdf):
    vals = pdf.astype(object).where(pdf.notnull(), None).values.tolist()
    out = []
    for row in vals:
        out.append([v.item() if hasattr(v, 'item') else v for v in row])
    return out


@pytest.mark.parametrize('block', range(4))
def test_type_strict_pandas_block(spark, block):
    import pandas as pd

    from rbql_spark.sources.pandas_bridge import query_pandas_dataframe
    for k in range(25):
        seed = 400_000 + block * 25 + k
        rnd = random.Random(seed)
        table = make_typed_table(rnd)
        query = make_query(rnd)
        pdf_in = pd.DataFrame([list(r) for r in table],
                              columns=['c1', 'c2', 'c3', 'c4'])
        ref_pdf = ref_err = None
        try:
            ref_pdf = run_reference_pandas(query, pdf_in.copy())
        except Exception as e:
            ref_err = str(e)
        got_pdf = got_err = None
        try:
            got_pdf = query_pandas_dataframe(spark, query, pdf_in.copy())
        except Exception as e:
            got_err = str(e)
        ctx = '\nseed {}: query: {}\n table: {}\n ref err: {!r}\n got err: {!r}'.format(
            seed, query, table, ref_err, got_err)
        if ref_err is not None:
            assert got_err is not None, 'reference raised, we succeeded' + ctx
            continue
        assert got_err is None, 'we raised where reference succeeded' + ctx
        ref_cells, got_cells = _pdf_cells(ref_pdf), _pdf_cells(got_pdf)
        assert strict_equal_tables(got_cells, ref_cells), \
            'pandas type-strict divergence' + ctx + \
            '\n ref: {}\n got: {}'.format(fmt(ref_cells), fmt(got_cells))


# ---------------------------------------------------------------------------
# JS dialect: property access / undefined shapes vs live rbql-js (node)

def make_js_table(rnd: random.Random):
    kinds = rnd.choice(['s', 'i', 'is', 'isn', 'sn', 'in'])
    n = rnd.randint(2, 10)
    return [[cell_value(rnd, kinds), rnd.choice(WORDS),
             rnd.randint(0, 9)] for _ in range(n)]


def make_js_query(rnd: random.Random) -> str:
    items = rnd.sample([
        'a1.foo', 'a1.length', 'a1.foo ?? "d"', 'typeof a1',
        'a1.length === undefined', 'a1.bar == null',
        'a2.missing', 'a2.length', '[a1.foo, a2.length]',
        'a1.foo === undefined ? 1 : 2', 'a1', 'NR',
        '({}).nope', 'undefined', '(a1 + "").length',
    ], k=rnd.randint(1, 3))
    q = 'SELECT ' + ', '.join(items)
    if rnd.random() < 0.4:
        q += ' WHERE ' + rnd.choice([
            'a3 > 2', 'a1 != null', 'a1.foo === undefined',
            'typeof a1 == "string"'])
    if rnd.random() < 0.3:
        q += ' ORDER BY a3'
    return q


def run_js_reference_batch(requests):
    proc = subprocess.run(
        [NODE, RUNNER], input=json.dumps(requests).encode(),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120)
    assert proc.returncode == 0, proc.stderr.decode()[:2000]
    return json.loads(proc.stdout.decode())


def js_norm(v):
    """JS has one number type: ints and floats with equal value compare
    equal; undefined (tagged on the wire) and null both land as null in
    the writer — normalize to None like rbql-js output does."""
    if isinstance(v, str) and v == '__undefined__':
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return '__NaN__'
        if math.isinf(v):
            return '__Inf__' if v > 0 else '__-Inf__'
        return ('f', v)
    if isinstance(v, int):
        return ('f', float(v))
    if isinstance(v, (list, tuple)):
        return [js_norm(x) for x in v]
    return v


def js_tables_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb) or any(
                js_norm(x) != js_norm(y) for x, y in zip(ra, rb)):
            return False
    return True


@pytest.mark.skipif(not (NODE and os.path.exists(REF_JS)),
                    reason='node / rbql-js not available')
@pytest.mark.parametrize('block', range(6))
def test_js_undefined_property_block(spark, block):
    from rbql_spark import query_table
    from rbql_spark.errors import exception_to_error_info
    rnd = random.Random(500_000 + block)
    requests, metas = [], []
    for _ in range(12):
        table = make_js_table(rnd)
        query = make_js_query(rnd)
        requests.append({'query': query, 'input_table': table})
        metas.append((query, table))
    refs = run_js_reference_batch(requests)
    for (query, table), ref in zip(metas, refs):
        try:
            rows, _hdr = query_table(spark, query, [list(r) for r in table],
                                     dialect='js')
            ours = {'ok': True, 'rows': rows}
        except Exception as e:
            _t, msg = exception_to_error_info(e)
            ours = {'ok': False, 'error_msg': msg}
        ctx = '\nquery: {}\ntable: {}\nref:  {}\nours: {}'.format(
            query, table, ref, ours)
        assert ours['ok'] == ref['ok'], 'outcome mismatch' + ctx
        if ref['ok']:
            assert js_tables_equal(ours['rows'], ref['rows']), \
                'table mismatch' + ctx
        else:
            # record-number parity when both carry one
            import re as _re
            rn = lambda m: (_re.search(r'At record (\d+)', m or '') or [None])
            mref = _re.search(r'At record (\d+)', ref['error_msg'] or '')
            mgot = _re.search(r'At record (\d+)', ours['error_msg'] or '')
            if mref and mgot:
                assert mgot.group(1) == mref.group(1), \
                    'error record mismatch' + ctx
