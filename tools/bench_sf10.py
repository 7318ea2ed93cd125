#!/usr/bin/env python3
"""sf10 decade audit (round-13 verdict #6): push the five WORST sf1
growth ratios one more decade and prove they stay sub-linear.

Usage:  python tools/bench_sf10.py        # writes BENCH_sf10.json at repo root

The subjects are the five highest sf1/sf0.1 ratios from BENCH_sf1.json —
all stateful streaming drains plus the sequential BPE trainer:

    streaming_asof                 7.57    streaming_classifier  6.28
    streaming_minhash_neardup      5.95    streaming_decontaminate_bloom 5.02
    bpe_vocab                      4.66

Each ran sub-linearly at 10x; the question this answers is whether the
NEXT 10x (sf1 → sf10, i.e. 100 replicas of sf0.1) bends upward — keyed
state (band index, seen-shingle counts, classifier vocab) growing with
the corpus is exactly where a second decade exposes super-linearity the
first one hides.

Replica construction is bench_sf1.build_replicas (letter-permutation
cipher per replica for documents, id-shifted events — see that module's
docstring for why this keeps pair counts and keyed-state growth honest
and linear).  Only documents+events are materialized: none of the five
subjects reads embeddings.  REPS defaults to 1 here (the sf10 drains run
minutes each; the sf1 side reuses min-of-2 like BENCH_sf1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_sf1 import (CPUS, SF1_DIR, build_replicas, build_sf1,
                             time_query)

SF10_DIR = os.environ.get('SPARK_GRAFT_SF10_DIR', '/tmp/rbql_sf10')

SUBJECTS = [
    'streaming_asof',
    'streaming_classifier',
    'streaming_minhash_neardup',
    'streaming_decontaminate_bloom',
    'bpe_vocab',
]


def _time_once(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format('noop').mode('overwrite').save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main() -> None:
    import __spark_entry__ as em
    from rbql_spark.session import build_session

    # the default 600s drain cap is sized for sf0.1/sf1 gates; at sf10 the
    # heaviest subject (streaming_minhash_neardup, ~55s at sf1) legitimately
    # needs ~10x that — the audit must MEASURE the drain, not abort it
    # (super-linearity is judged by the recorded ratio, not a wall cap)
    os.environ.setdefault('RBQL_STREAM_DRAIN_TIMEOUT', '2400')
    spark = build_session(app_name='rbql-spark-bench-sf10',
                          master='local[{}]'.format(CPUS),
                          shuffle_partitions=CPUS,
                          driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM', '48g'))
    spark.sparkContext.setLogLevel('ERROR')
    build_sf1(spark)
    build_replicas(spark, SF10_DIR, 100, tables=('documents', 'events'))

    qs = em.queries()
    results = {}
    for name in SUBJECTS:
        t1 = time_query(qs[name], spark, SF1_DIR)          # min-of-REPS
        t10 = _time_once(qs[name], spark, SF10_DIR)
        ratio = round(t10 / t1, 2) if t1 > 0 else None
        results[name] = {'sf1_sec': t1, 'sf10_sec': t10, 'ratio': ratio,
                         'super_linear': bool(ratio is not None and ratio > 10.0)}
        print('{}: sf1={}s sf10={}s ratio={}'.format(name, t1, t10, ratio),
              file=sys.stderr)

    artifact = {
        'metric': 'sf10_decade_audit',
        'unit': 'sec',
        'sf1_rows': {'documents': 50_000, 'events': 1_000_000},
        'sf10_rows': {'documents': 500_000, 'events': 10_000_000},
        'queries': results,
        'super_linear_queries': [n for n, r in results.items() if r['super_linear']],
    }
    print(json.dumps(artifact))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       'BENCH_sf10.json')
    with open(out, 'w') as fh:
        json.dump(artifact, fh, indent=1)
    spark.stop()


if __name__ == '__main__':
    main()
