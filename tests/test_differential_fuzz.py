"""Differential fuzzing: randomized queries over randomized tables run
through BOTH this engine and the actual reference implementation (imported
read-only from /root/reference), outputs compared value-by-value.

A bounded deterministic sample (seeded) — the strongest conformance check we
have beyond the golden corpora, because the reference itself is the oracle.
"""

import math
import os
import random
import sys

import pytest

REF_PY = '/root/reference/rbql-py'

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_PY), reason='reference package not available')]

WORDS = ['alpha', 'beta', 'gamma', 'delta', 'omega']


def make_table(rnd: random.Random):
    n = rnd.randint(1, 15)
    return [[str(rnd.randint(-30, 99)), rnd.choice(WORDS),
             rnd.choice(WORDS), str(rnd.randint(0, 5))] for _ in range(n)]


def make_query(rnd: random.Random) -> str:
    items = rnd.sample([
        'a1', 'a2', 'a3', 'int(a1) * 2', 'len(a2)', 'NR',
        "a2 + '-' + a3", 'int(a1) % 5', "'c' if int(a1) > 0 else 'd'",
    ], k=rnd.randint(1, 4))
    q = 'SELECT '
    if rnd.random() < 0.25:
        q += 'DISTINCT '
    q += ', '.join(items)
    if rnd.random() < 0.6:
        q += ' WHERE ' + rnd.choice([
            'int(a1) > {}'.format(rnd.randint(-10, 50)),
            "a2 == '{}'".format(rnd.choice(WORDS)),
            "like(a3, '{}%')".format(rnd.choice(WORDS)[:2]),
            'int(a1) % 2 == 0',
            "a2 != '{}' and int(a4) < 4".format(rnd.choice(WORDS)),
        ])
    if rnd.random() < 0.5:
        q += ' ORDER BY ' + rnd.choice(['a2', 'int(a1)', 'a3, int(a1)'])
        if rnd.random() < 0.5:
            q += ' DESC'
    if rnd.random() < 0.3:
        q += ' LIMIT {}'.format(rnd.randint(1, 8))
    return q


def make_agg_query(rnd: random.Random) -> str:
    aggs = rnd.sample(['COUNT(1)', 'SUM(a1)', 'MIN(a1)', 'MAX(a1)',
                       'AVG(a1)', 'MEDIAN(a1)', 'VARIANCE(a1)'],
                      k=rnd.randint(1, 3))
    return 'SELECT a2, {} GROUP BY a2'.format(', '.join(aggs))


def make_join_table(rnd: random.Random):
    n = rnd.randint(1, 6)
    # some keys match, some don't; occasional duplicate keys
    return [[rnd.choice(WORDS + ['nomatch']), str(rnd.randint(0, 9)),
             rnd.choice(WORDS)] for _ in range(n)]


def make_join_query(rnd: random.Random) -> str:
    how = rnd.choice(['JOIN', 'INNER JOIN', 'LEFT JOIN'])
    items = rnd.sample(['a1', 'a2', 'b1', 'b2', 'b3', 'bNR'], k=rnd.randint(2, 4))
    q = 'SELECT {} {} b ON a2 == b1'.format(', '.join(items), how)
    if rnd.random() < 0.5:
        q += " WHERE b2 != '3'" if how != 'LEFT JOIN' else ' WHERE int(a1) > 0'
    if rnd.random() < 0.4:
        q += ' ORDER BY a2, int(a1)'
    return q


def make_update_query(rnd: random.Random) -> str:
    return rnd.choice([
        "UPDATE a2 = a2 + '!' WHERE int(a1) > {}".format(rnd.randint(-5, 40)),
        "UPDATE a3 = a2, a4 = '9' WHERE a2 == '{}'".format(rnd.choice(WORDS)),
    ])


def run_reference(query, table, join_table=None):
    sys.path.insert(0, REF_PY)
    try:
        import rbql
        out, warnings = [], []
        rbql.query_table(query, [list(r) for r in table], out, warnings,
                         join_table=[list(r) for r in join_table] if join_table else None)
        return out
    finally:
        sys.path.remove(REF_PY)


def loose(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        if isinstance(v, float) and math.isnan(v):
            return 'nan'
        return round(float(v), 4)
    return v


def equal_tables(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if loose(x) != loose(y):
                return False
    return True


SEEDS = list(range(40))


@pytest.mark.parametrize('seed', SEEDS)
def test_differential_random_query(spark, seed):
    from rbql_spark import query_table
    rnd = random.Random(10_000 + seed)
    table = make_table(rnd)
    query = make_agg_query(rnd) if seed % 5 == 4 else make_query(rnd)

    expected = run_reference(query, table)
    got, _hdr = query_table(spark, query, [list(r) for r in table])
    assert equal_tables(got, expected), \
        'divergence for seed {}\n query: {}\n table: {}\n got:      {}\n reference: {}'.format(
            seed, query, table, got, expected)


def make_compound_query(rnd: random.Random) -> str:
    return rnd.choice([
        'SELECT DISTINCT COUNT a2',
        'SELECT DISTINCT COUNT a2, a3 WHERE int(a1) > 0',
        'SELECT * EXCEPT a1, a4',
        'SELECT TOP {} a2, a3 ORDER BY int(a1)'.format(rnd.randint(1, 6)),
        "SELECT a1, UNNEST(a2.split('a'))",
        "SELECT a2, int(a1) | SELECT a1 WHERE a2 > {}".format(rnd.randint(-5, 30)),
        "SELECT a2.upper(), a3[:2], a2[::-1] WHERE a2.startswith('{}')".format(
            rnd.choice(['a', 'b', 'g', 'd', 'o'])),
        "SELECT max(a1), min(a1) WHERE int(a4) < 5",
        "SELECT a3, ARRAY_AGG(a1) GROUP BY a3",
        "SELECT NR, NF, a1 WHERE NR % 2 == 1",
    ])


@pytest.mark.parametrize('seed', list(range(20)))
def test_differential_compound_query(spark, seed):
    from rbql_spark import query_table
    rnd = random.Random(55_000 + seed)
    table = make_table(rnd)
    query = make_compound_query(rnd)

    expected = run_reference(query, table)
    got, _hdr = query_table(spark, query, [list(r) for r in table])
    assert equal_tables(got, expected), \
        'divergence for seed {}\n query: {}\n table: {}\n got:      {}\n reference: {}'.format(
            seed, query, table, got, expected)


@pytest.mark.parametrize('seed', list(range(20)))
def test_differential_random_join_update(spark, seed):
    from rbql_spark import query_table
    rnd = random.Random(77_000 + seed)
    table = make_table(rnd)
    if seed % 3 == 2:
        query, join = make_update_query(rnd), None
    else:
        query, join = make_join_query(rnd), make_join_table(rnd)

    expected = run_reference(query, table, join)
    got, _hdr = query_table(spark, query, [list(r) for r in table],
                            join_table=[list(r) for r in join] if join else None)
    assert equal_tables(got, expected), \
        'divergence for seed {}\n query: {}\n table: {}\n join: {}\n got:      {}\n reference: {}'.format(
            seed, query, table, join, got, expected)


def make_null_table(rnd: random.Random):
    """Typed rows where the string columns carry real None cells — the
    round-12 parity surface (typed sources: 2D array / pandas / parquet).
    a1 stays a non-null int string so ORDER BY keys never hit Python's
    None-ordering TypeError."""
    n = rnd.randint(2, 15)
    def maybe_null(w):
        return None if rnd.random() < 0.3 else w
    return [[str(rnd.randint(-30, 99)), maybe_null(rnd.choice(WORDS)),
             maybe_null(rnd.choice(WORDS)), str(rnd.randint(0, 5))]
            for _ in range(n)]


def make_null_query(rnd: random.Random) -> str:
    """Queries over the VALUE-parity surface for null cells: rendering
    (str/f-string/format), equality, is-None tests, truthiness — the
    classes where native and the reference's real-Python evaluator must
    agree exactly (ordering/arith on None raise in Python and are
    documented out of the native contract)."""
    items = rnd.sample([
        'str(a2)', "f'{a2}!'", '"{}-{}".format(a2, a3)',
        "a2 == 'alpha'", "a3 != 'beta'", 'a2 is None', 'a3 is not None',
        "'y' if a2 == a3 else 'n'", 'a2', 'NR',
        "a2 in ['alpha', 'beta']", "a3 not in ['gamma']",
        "a2 in ['alpha', None]",
    ], k=rnd.randint(1, 4))
    q = 'SELECT '
    if rnd.random() < 0.25:
        q += 'DISTINCT '
    q += ', '.join(items)
    if rnd.random() < 0.6:
        q += ' WHERE ' + rnd.choice([
            "a2 == '{}'".format(rnd.choice(WORDS)),
            "a2 != '{}'".format(rnd.choice(WORDS)),
            'a2 is not None',
            'a3 is None',
            'a2 == a3',
            "a2 in ['alpha', 'beta', None]",
            "a3 not in ['gamma', 'delta']",
        ])
    if rnd.random() < 0.4:
        q += ' ORDER BY int(a1)'
        if rnd.random() < 0.5:
            q += ' DESC'
    return q


@pytest.mark.parametrize('seed', list(range(25)))
def test_differential_null_cells(spark, seed):
    from rbql_spark import query_table
    rnd = random.Random(77_000 + seed)
    table = make_null_table(rnd)
    query = make_null_query(rnd)
    expected = run_reference(query, table)
    got, _hdr = query_table(spark, query, [list(r) for r in table])
    assert equal_tables(got, expected), \
        'null-cell divergence for seed {}\n query: {}\n table: {}\n ' \
        'got:      {}\n reference: {}'.format(seed, query, table, got,
                                              expected)


def make_null_agg_query(rnd: random.Random) -> str:
    aggs = rnd.sample(['COUNT(1)', 'SUM(a1)', 'MIN(a1)', 'MAX(a1)',
                       'AVG(a1)', 'MEDIAN(a1)', 'VARIANCE(a1)',
                       'ANY_VALUE(a1)'], k=rnd.randint(1, 3))
    if rnd.random() < 0.5:
        return 'SELECT a2, {} GROUP BY a2'.format(', '.join(aggs))
    return 'SELECT {}'.format(', '.join(aggs))


@pytest.mark.parametrize('seed', list(range(20)))
def test_differential_null_aggregates(spark, seed):
    """Aggregates over tables with None cells: OUTCOME (value vs error)
    must match the reference exactly — including MIN/MAX's
    null-before-first-value accident and all-null groups — and values
    must match when both succeed.  Error TEXT is compared on the
    'NoneType' marker only (record numbers are partition-order
    best-effort)."""
    from rbql_spark import query_table
    rnd = random.Random(88_000 + seed)
    n = rnd.randint(1, 10)
    table = [[None if rnd.random() < 0.35 else rnd.randint(-9, 30),
              rnd.choice(['x', 'y'])] for _ in range(n)]
    query = make_null_agg_query(rnd)

    try:
        expected = ('ok', run_reference(query, table))
    except Exception as e:
        expected = ('err', str(e))
    try:
        rows, _hdr = query_table(spark, query, [list(r) for r in table])
        got = ('ok', rows)
    except Exception as e:
        got = ('err', str(e))
    assert got[0] == expected[0], \
        'outcome divergence for seed {}\n query: {}\n table: {}\n ' \
        'got: {}\n reference: {}'.format(seed, query, table, got, expected)
    if expected[0] == 'ok':
        assert equal_tables(got[1], expected[1]), \
            'value divergence for seed {}\n query: {}\n table: {}\n ' \
            'got: {}\n reference: {}'.format(seed, query, table,
                                             got[1], expected[1])
    else:
        assert 'NoneType' in got[1], (seed, query, got[1], expected[1])


def make_oow_query(rnd: random.Random) -> str:
    """Out-of-width field calls (safe_get None, round-13 native class):
    len()/int()/float()/str() over a field index past the table width,
    sometimes guarded by a WHERE that empties the table."""
    call = rnd.choice(['len(a9)', 'int(a9)', 'float(a9)', 'str(a9)',
                       'len(a7)', 'int(a7)'])
    q = 'SELECT NR, a1, {}'.format(call)
    r = rnd.random()
    if r < 0.3:
        q += " WHERE a2 == 'no-such-word'"   # empties → no evaluation
    elif r < 0.5:
        q += ' WHERE int(a1) > 1000'          # also empties
    return q


@pytest.mark.parametrize('seed', list(range(15)))
def test_differential_out_of_width_calls(spark, seed):
    """Outcome parity for calls over out-of-width (always-None) fields:
    both engines succeed with equal tables, or both raise with the same
    Details tail (record-number prefix compared only when the reference
    reports record 1 — this engine's non-dense approximation is exact
    there)."""
    from rbql_spark import query_table
    from rbql_spark.errors import RbqlError
    rnd = random.Random(91_000 + seed)
    table = make_table(rnd)
    query = make_oow_query(rnd)

    ref_err = ref_out = None
    try:
        ref_out = run_reference(query, table)
    except Exception as e:
        ref_err = str(e)
    got_err = got = None
    try:
        got, _hdr = query_table(spark, query, [list(r) for r in table])
    except (RbqlError, Exception) as e:
        got_err = str(e)

    if ref_err is None:
        assert got_err is None, \
            'seed {}: reference succeeded, we raised {!r}\n query: {}' \
            .format(seed, got_err, query)
        assert equal_tables(got, ref_out), \
            'seed {}: table divergence\n query: {}\n got: {}\n ref: {}' \
            .format(seed, query, got, ref_out)
    else:
        assert got_err is not None, \
            'seed {}: reference raised {!r}, we succeeded\n query: {}' \
            .format(seed, ref_err, query)
        tail = ref_err.split('Details: ', 1)[-1]
        assert tail in got_err, \
            'seed {}: error tail mismatch\n query: {}\n got: {!r}\n ' \
            'ref: {!r}'.format(seed, query, got_err, ref_err)
        # round 14: exact record-number parity — the surrogate marker +
        # first-failure probes recover the reference's first failing
        # INPUT record on multi-partition tables
        if ref_err.startswith('At record '):
            ref_prefix = ref_err.split(', Details:', 1)[0]
            assert got_err.startswith(ref_prefix + ','), \
                'seed {}: record prefix mismatch\n got: {!r}\n ref: {!r}' \
                .format(seed, got_err, ref_err)


_RECORD_CASES = [
    # (query, table builder) — every case raises in both engines; the
    # assertion is FULL message parity — exact 'At record N, Details:'
    # prefix AND the quoted offending value — on multi-partition inputs
    # (round 14: surrogate marker + first-failure probes recover the
    # reference's first failing INPUT record; round 15: the probes also
    # carry that row's own Details text, and guards fired inside a
    # pushed-down WHERE recover the prefix via the resolver's input-
    # stream branch)
    ('single-fail native', "SELECT int(a1) * 2",
     lambda: [[str(i), 'x'] if i != 43 else ['boom', 'x'] for i in range(1, 61)]),
    ('native + pushed WHERE', "SELECT int(a1) WHERE a2 == 'x'",
     lambda: [['boom' if i == 43 else str(i), 'x' if i % 2 else 'y']
              for i in range(1, 61)]),
    ('single-fail pyeval', "SELECT int(''.join(list(a1)))",
     lambda: [['boom' if i == 51 else str(i), 'x'] for i in range(1, 61)]),
    ('pyeval + pushed WHERE', "SELECT int(''.join(list(a1))) WHERE a2 == 'x'",
     lambda: [['boom' if i == 50 else str(i), 'x' if i % 3 else 'y']
              for i in range(1, 61)]),
    ('all-fail NoneType', "SELECT len(a2)",
     lambda: [[str(i)] for i in range(1, 31)]),
    ('two-fail first wins', "SELECT int(a1)",
     lambda: [['bad' if i in (11, 31) else str(i), 'x'] for i in range(1, 41)]),
    ('all-fail pyeval', "SELECT int(''.join(list(a2)))",
     lambda: [[str(i)] for i in range(1, 31)]),
    # r15: DIFFERENT offending values per failing row — the Details text
    # must quote the min-NR row's value, not whichever task lost the race
    ('two-fail distinct values native', "SELECT int(a1)",
     lambda: [['bad%d' % i if i in (11, 31) else str(i), 'x']
              for i in range(1, 41)]),
    ('two-fail distinct values pyeval', "SELECT int(''.join(list(a1)))",
     lambda: [['bad%d' % i if i in (7, 33) else str(i)] for i in range(1, 41)]),
    # r15: guard fired INSIDE the pushed-down WHERE (runs before NR
    # exists) — the error-path resolver recovers the exact input record
    ('guard in pushed WHERE', "SELECT a2 WHERE int(a1) > 5",
     lambda: [['boom' if i == 43 else str(i), 'x'] for i in range(1, 61)]),
    ('guard in pushed WHERE distinct values', "SELECT a2 WHERE int(a1) > 5",
     lambda: [['bad%d' % i if i in (13, 29) else str(i), 'x']
              for i in range(1, 61)]),
]


@pytest.mark.parametrize('label,query,mk', [(c[0], c[1], c[2]) for c in _RECORD_CASES])
def test_error_record_number_exact_parity(spark, label, query, mk):
    from rbql_spark import query_table
    table = mk()
    ref_err = None
    try:
        run_reference(query, table)
    except Exception as e:
        ref_err = str(e)
    assert ref_err is not None and ref_err.startswith('At record '), \
        '{}: reference did not raise a record error: {!r}'.format(label, ref_err)
    got_err = None
    try:
        query_table(spark, query, [list(r) for r in table])
    except Exception as e:
        got_err = str(e)
    assert got_err is not None, '{}: we succeeded where reference raised'.format(label)
    assert got_err == ref_err, \
        '{}: full message mismatch\n got: {!r}\n ref: {!r}'.format(
            label, got_err, ref_err)


# ---------------------------------------------------------------------------
# mixed-type columns (r14 verdict #1): the tagged-cell representation must
# reproduce the reference's per-cell dynamic semantics — these shapes were
# EXCLUDED from the generators before round 15
# ---------------------------------------------------------------------------

def make_mixed_table(rnd: random.Random):
    """a2 mixes ints / floats / strings (the tagged-cell column); a1 is a
    clean int for deterministic WHERE/ORDER shapes."""
    n = rnd.randint(2, 14)
    def cell():
        r = rnd.random()
        if r < 0.4:
            return rnd.randint(-9, 30)
        if r < 0.55:
            return round(rnd.uniform(-3, 9), 2)
        return rnd.choice(WORDS)
    return [[i + 1, cell(), rnd.choice(WORDS)] for i in range(n)]


def make_mixed_query(rnd: random.Random) -> str:
    items = rnd.sample([
        'a1', 'a2', 'a3', 'str(a2)', 'isinstance(a2, str)',
        'a2 if isinstance(a2, str) else "num"',
        'a2.upper()',                       # AttributeError on numeric cells
        'a2 == 5', "a2 == '5'", 'a2 == a3',
        'type(a2).__name__',
    ], k=rnd.randint(1, 3))
    q = 'SELECT '
    if rnd.random() < 0.2:
        q += 'DISTINCT '
    q += ', '.join(items)
    if rnd.random() < 0.5:
        q += ' WHERE ' + rnd.choice([
            'isinstance(a2, str)', 'not isinstance(a2, str)',
            'a2 == {}'.format(rnd.randint(-5, 20)),
            "a2 != '{}'".format(rnd.choice(WORDS)),
        ])
    if rnd.random() < 0.6:
        # the un-excluded shape: mixed ORDER BY — Python raises TypeError
        # unless the surviving keys are runtime-homogeneous
        q += ' ORDER BY a2'
        if rnd.random() < 0.4:
            q += ' DESC'
    return q


@pytest.mark.parametrize('seed', list(range(20)))
def test_differential_mixed_cells(spark, seed):
    from rbql_spark import query_table
    from rbql_spark.errors import RbqlError
    rnd = random.Random(88_000 + seed)
    table = make_mixed_table(rnd)
    query = make_mixed_query(rnd)
    ref_err = expected = None
    try:
        expected = run_reference(query, table)
    except Exception as e:
        ref_err = str(e)
    got = got_err = None
    try:
        got, _hdr = query_table(spark, query, [list(r) for r in table])
    except (RbqlError, Exception) as e:
        got_err = str(e)
    ctx = '\nseed {}: query: {}\n table: {}\n ref: {} / {!r}\n got: {} / {!r}' \
        .format(seed, query, table, expected, ref_err, got, got_err)
    if ref_err is not None:
        assert got_err is not None, 'reference raised, we succeeded' + ctx
        tail = ref_err.split('Details: ', 1)[-1]
        assert tail in got_err, 'error tail mismatch' + ctx
        if ref_err.startswith('At record '):
            assert got_err == ref_err, 'full message mismatch' + ctx
    else:
        assert got_err is None, 'we raised where reference succeeded' + ctx
        assert expected == got, 'value divergence' + ctx
