"""JS-dialect differential fuzzing: randomized queries over randomized
tables run through BOTH this engine (dialect='js') and the actual
reference JS implementation (rbql-js, loaded read-only from
/root/reference via a node subprocess, tools/js_ref_runner.js), outputs
compared value-by-value.

The node harness batches every query of a seed into one subprocess call;
NaN/Infinity/undefined are tagged strings on the wire (JSON can't carry
them) and normalized identically on both sides.
"""

import json
import math
import os
import random
import re
import shutil
import subprocess

import pytest

REF_JS = '/root/reference/rbql-js/rbql.js'
RUNNER = os.path.join(os.path.dirname(__file__), '..', 'tools', 'js_ref_runner.js')
NODE = shutil.which('node')

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (NODE and os.path.exists(REF_JS)), reason='node / rbql-js not available')]

WORDS = ['alpha', 'beta', 'gamma', 'delta', 'omega']


def make_table(rnd: random.Random):
    n = rnd.randint(1, 15)
    return [[str(rnd.randint(-30, 99)), rnd.choice(WORDS),
             rnd.choice(WORDS), str(rnd.randint(0, 5))] for _ in range(n)]


def make_typed_table(rnd: random.Random):
    """Typed cells (ints / floats / strings) — JS coercion edges."""
    n = rnd.randint(1, 12)
    return [[rnd.randint(-30, 99), rnd.choice(WORDS),
             rnd.choice([rnd.randint(0, 9), rnd.choice(WORDS)]),
             rnd.choice([0, 1, 2.5, 3])] for _ in range(n)]


_SELECT_ITEMS = [
    'a1', 'a2', 'a3', 'parseInt(a1) * 2', 'a2.length', 'NR',
    "a2 + '-' + a3", 'parseInt(a1) % 5', "parseInt(a1) > 0 ? 'c' : 'd'",
    '`${a2}_${a3}`', 'a2.toUpperCase()', 'a2.slice(1, 3)',
    'Math.max(parseInt(a1), parseInt(a4))', "a2.indexOf('a')",
    'Number(a4) + 0.5', "a2.split('a').length",
]

_WHERE_CLAUSES = [
    'parseInt(a1) > {n}', "a2 == '{w}'", "a2 === '{w}'",
    'parseInt(a1) % 2 == 0', "a2 != '{w}' && parseInt(a4) < 4",
    "a2.length > 4 || a3 == 'beta'", '/a.m/.test(a3)', 'a1 > {n}',
    "like(a3, '{p}%')", "a2.startsWith('{c}') || a3.endsWith('a')",
    "['alpha', 'beta'].indexOf(a2) != -1",
]


def make_query(rnd: random.Random) -> str:
    items = rnd.sample(_SELECT_ITEMS, k=rnd.randint(1, 4))
    q = 'SELECT '
    if rnd.random() < 0.2:
        q += 'DISTINCT '
    q += ', '.join(items)
    if rnd.random() < 0.65:
        w = rnd.choice(_WHERE_CLAUSES).format(
            n=rnd.randint(-10, 50), w=rnd.choice(WORDS),
            p=rnd.choice(WORDS)[:2], c=rnd.choice(WORDS)[0])
        q += ' WHERE ' + w
    if rnd.random() < 0.5:
        q += ' ORDER BY ' + rnd.choice(['a2', 'parseInt(a1)', 'a3, parseInt(a1)'])
        if rnd.random() < 0.5:
            q += ' DESC'
    if rnd.random() < 0.3:
        q += ' LIMIT {}'.format(rnd.randint(1, 8))
    return q


def make_agg_query(rnd: random.Random) -> str:
    aggs = rnd.sample(['COUNT(1)', 'SUM(a1)', 'MIN(a1)', 'MAX(a1)',
                       'AVG(a1)', 'MEDIAN(a1)', 'VARIANCE(a1)',
                       'MAX(parseInt(a1) + 5)', 'ANY_VALUE(a3)'],
                      k=rnd.randint(1, 3))
    return 'SELECT a2, {} GROUP BY a2'.format(', '.join(aggs))


def make_update_query(rnd: random.Random) -> str:
    return rnd.choice([
        'UPDATE a2 = a2 + " x", a1 = parseInt(a1) + 1 WHERE parseInt(a1) > {n}',
        'UPDATE a3 = a2.toUpperCase() WHERE a2.length > 4',
        'UPDATE a1 = 100 WHERE a1 > {n}',
    ]).format(n=rnd.randint(-10, 50))


def make_null_table(rnd: random.Random):
    """Typed cells with nulls sprinkled in — ECMAScript null coercion
    (ToNumber(null)=0 in relationals, null == only null/undefined, null
    member access throws) is where the native translation does the most
    work (jsdialect/native.py), so nulls get their own seed class."""
    n = rnd.randint(2, 12)

    def maybe(v):
        return None if rnd.random() < 0.25 else v
    return [[maybe(rnd.randint(-30, 99)), maybe(rnd.choice(WORDS)),
             rnd.choice(WORDS), maybe(rnd.randint(0, 5))] for _ in range(n)]


_NULL_WHERE = [
    'a1 > {n}', 'a1 < {n}', 'a1 >= 0', 'a1 == null', 'a1 != null',
    'a1 === null', "a2 == '{w}'", "a2 === '{w}'", 'a4 == 0',
    'a1 == a4', 'a1 > a4', "a2 == null || a1 > {n}",
    'a4 != null && a4 < 3',
    # mixed `+` result in predicate position: JS ToBoolean of the RUNTIME
    # value (number 0 is falsy even though it renders '0') — r14 ADVICE
    'a2 + a4', 'a2 + 1 + 1 > 2',
]


def make_null_query(rnd: random.Random) -> str:
    # the pool deliberately stresses every native.py value translation
    # over nullable cells: JS `+` picks concat-vs-numeric by RUNTIME
    # value (the seed-6005 bug class), ??/|| are value-returning,
    # template literals ToString(null)='null', Math coerces
    # ToNumber(null)=0, and a method on a null cell throws with the
    # record number both engines must agree on
    items = rnd.sample(['a1', 'a2', 'a3', 'a4', 'a1 == null', 'a1 > 10',
                        'a4 == 0', 'a1 + 1', "a2 + ''", 'NR',
                        'a1 === a4', 'a2 == a3',
                        'a2 + 1', 'a2 + a4', 'a2 + a2', 'a1 + a4',
                        # nested `+` over a mixed (strnum) inner result —
                        # the r14 ADVICE class: `a2 + 1 + 1` on a null a2
                        # is 2 in V8, not '11'; the strnum tag must force
                        # the outer consumer to the hosted runtime
                        'a2 + 1 + 1', 'a2 + a4 + 1', "a2 + 1 + 'x'",
                        "'<' + (a2 + 1)", '`${a2 + 1}`',
                        'a1 - a4', 'a1 * 2', '-a1', 'a1 % 3',
                        "a2 ?? 'x'", 'a4 ?? a1', "a2 || 'y'",
                        '`v=${a1}`', '`${a2}:${a4}`',
                        'Math.abs(a1)', 'Math.max(a1, a4)',
                        'a3.toUpperCase()', 'a2.toUpperCase()'], k=rnd.randint(1, 4))
    q = 'SELECT ' + ', '.join(items)
    if rnd.random() < 0.8:
        q += ' WHERE ' + rnd.choice(_NULL_WHERE).format(
            n=rnd.randint(-10, 50), w=rnd.choice(WORDS))
    if rnd.random() < 0.4:
        q += ' ORDER BY a3'
    return q


def make_join_table(rnd: random.Random):
    return [[rnd.choice(WORDS), str(rnd.randint(0, 9))]
            for _ in range(rnd.randint(1, 6))]


def make_join_query(rnd: random.Random) -> str:
    items = rnd.sample(['a1', 'a2', 'b1', 'b2', 'bNR',
                        'b2 == null ? "-" : b2'], k=rnd.randint(2, 4))
    sub = rnd.choice(['JOIN', 'INNER JOIN', 'LEFT JOIN'])
    q = 'SELECT {} {} B ON a2 == b1'.format(', '.join(items), sub)
    if rnd.random() < 0.5:
        q += ' WHERE parseInt(a1) > {}'.format(rnd.randint(-10, 50))
    return q


# --------------------------------------------------------------------------

def run_reference_batch(requests: list[dict]) -> list[dict]:
    proc = subprocess.run(
        [NODE, RUNNER], input=json.dumps(requests).encode(),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120)
    assert proc.returncode == 0, proc.stderr.decode()[:2000]
    return json.loads(proc.stdout.decode())


def loose(v):
    if isinstance(v, float):
        if math.isnan(v):
            return '__NaN__'
        if math.isinf(v):
            return '__Infinity__' if v > 0 else '__-Infinity__'
        return round(v, 6)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return round(float(v), 6)
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        return [loose(x) for x in v]
    from rbql_spark.jsdialect.runtime import JsUndefined
    if isinstance(v, JsUndefined):
        return '__undefined__'
    return v


def _cell_eq(la, lb) -> bool:
    if la == lb or str(la) == str(lb):
        return True
    # heterogeneous columns are stringified on our side (a Spark column
    # has ONE type) — same documented divergence and tolerance as
    # tests/test_reference_corpus.py::loose_eq
    if isinstance(la, str) != isinstance(lb, str):
        try:
            return float(str(la)) == float(str(lb))
        except (TypeError, ValueError):
            return False
    return False


def equal_tables(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if not _cell_eq(loose(va), loose(vb)):
                return False
    return True


def record_number(msg: str):
    m = re.search(r'At record (\d+)', msg or '')
    return int(m.group(1)) if m else None


def _run_seed(spark, seed: int, make_q, table_fn, with_join: bool = False):
    from rbql_spark import query_table
    from rbql_spark.errors import exception_to_error_info

    rnd = random.Random(seed)
    requests = []
    tables = []
    for _ in range(8):
        table = table_fn(rnd)
        join_table = make_join_table(rnd) if with_join else None
        query = make_q(rnd)
        requests.append({'query': query, 'input_table': table,
                         **({'join_table': join_table} if join_table else {})})
        tables.append((query, table, join_table))
    ref_results = run_reference_batch(requests)
    for (query, table, join_table), ref in zip(tables, ref_results):
        try:
            rows, _hdr = query_table(
                spark, query, [list(r) for r in table],
                join_table=[list(r) for r in join_table] if join_table else None,
                dialect='js')
            ours = {'ok': True, 'rows': rows}
        except Exception as e:
            _t, msg = exception_to_error_info(e)
            ours = {'ok': False, 'error_msg': msg}
        ctx = '\nquery: {}\ntable: {}\njoin: {}\nref:   {}\nours:  {}'.format(
            query, table, join_table, ref, ours)
        assert ours['ok'] == ref['ok'], 'outcome mismatch' + ctx
        if ref['ok']:
            assert equal_tables(ours['rows'], ref['rows']), 'table mismatch' + ctx
        else:
            rn_ref = record_number(ref['error_msg'])
            rn_ours = record_number(ours['error_msg'])
            if rn_ref is not None and rn_ours is not None:
                assert rn_ours == rn_ref, 'error record number mismatch' + ctx


@pytest.mark.parametrize('seed', range(10))
def test_js_differential_select(spark, seed):
    _run_seed(spark, 1000 + seed, make_query, make_table)


def make_query_typed(rnd: random.Random) -> str:
    """make_query over tables whose a3 column mixes ints and strings.

    r15: the former exclusions are GONE — the tagged-cell representation
    (mixedcell.py) carries each cell's runtime type, so a mixed ORDER BY
    key sorts with V8's own stable_compare outcome (engine._host_sort_
    mixed; CPython TimSort reproduces V8's) and a string-method call on
    a numeric cell throws exactly like V8 ((2).endsWith is not a
    function) with the right record number."""
    return make_query(rnd)


@pytest.mark.parametrize('seed', range(6))
def test_js_differential_typed(spark, seed):
    _run_seed(spark, 2000 + seed, make_query_typed, make_typed_table)


@pytest.mark.parametrize('seed', range(4))
def test_js_differential_agg(spark, seed):
    _run_seed(spark, 3000 + seed, make_agg_query, make_table)


@pytest.mark.parametrize('seed', range(4))
def test_js_differential_update(spark, seed):
    _run_seed(spark, 4000 + seed, make_update_query, make_table)


@pytest.mark.parametrize('seed', range(4))
def test_js_differential_join(spark, seed):
    _run_seed(spark, 5000 + seed, make_join_query, make_table, with_join=True)


@pytest.mark.parametrize('seed', range(10))
def test_js_differential_nulls(spark, seed):
    _run_seed(spark, 6000 + seed, make_null_query, make_null_table)
