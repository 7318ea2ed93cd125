#!/usr/bin/env python3
"""Round-16 per-gate measurement harness.

Times a named subset of queries() gates in ONE session with the bench's
exact methodology (noop sink — the width decision now lives in the engine
per r16 verdict #1 — clearCache between reps, round-robin rep interleaving) and optionally dumps
``explain('formatted')`` for each gate to plans/r17/<gate>_<tag>.txt.

Usage:
  python tools/r17_time.py [--reps N] [--sf DIR] [--plans TAG] gate [gate ...]
  python tools/r17_time.py --all            # every bench gate
Prints one JSON line {gate: min_sec, ...} plus medians to stderr.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--sf', default='/root/testdata/sf0.1')
    ap.add_argument('--plans', default=None,
                    help='dump explain(formatted) to plans/r17/<gate>_<TAG>.txt')
    ap.add_argument('--cpus', type=int,
                    default=int(os.environ.get('SPARK_GRAFT_CPUS', '32')))
    ap.add_argument('--all', action='store_true')
    ap.add_argument('gates', nargs='*')
    args = ap.parse_args()

    from rbql_spark.session import build_session
    spark = build_session(app_name='r17-time',
                          master='local[{}]'.format(args.cpus),
                          shuffle_partitions=args.cpus,
                          driver_memory='16g')
    spark.sparkContext.setLogLevel('ERROR')
    try:
        spark.conf.set('spark.ui.enabled', 'false')
    except Exception:
        pass

    import bench
    import __spark_entry__ as em
    qs = em.queries()
    gates = bench.BENCH_QUERIES if args.all else args.gates
    unknown = [g for g in gates if g not in qs and g not in bench.EXTRA_BENCH]
    if unknown:
        print('unknown gates: {}'.format(unknown), file=sys.stderr)
        sys.exit(2)

    # warmup (bench parity)
    from pyspark.sql import functions as F
    spark.range(1000).select(F.sum('id')).collect()
    em._t(spark, args.sf, 'lineitem').limit(10).count()

    samples = {g: [] for g in gates}

    def run_once(g):
        spark.sparkContext.setJobDescription('r17:{}'.format(g))
        t0 = time.perf_counter()
        if g in bench.EXTRA_BENCH:
            bench.EXTRA_BENCH[g](spark, args.sf)
        else:
            df = qs[g](spark, args.sf)
            df.write.format('noop').mode('overwrite').save()
        dt = time.perf_counter() - t0
        samples[g].append(round(dt, 3))
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    for _ in range(max(1, args.reps)):
        for g in gates:
            run_once(g)

    if args.plans:
        outdir = os.path.join(REPO, 'plans', 'r17')
        os.makedirs(outdir, exist_ok=True)
        for g in gates:
            if g in bench.EXTRA_BENCH:
                continue
            df = qs[g](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), 'formatted')
            with open(os.path.join(outdir, '{}_{}.txt'.format(g, args.plans)),
                      'w') as f:
                f.write(txt)
            spark.catalog.clearCache()

    mins = {g: (min(s) if s else -1.0) for g, s in samples.items()}
    meds = {g: (sorted(s)[len(s) // 2] if s else -1.0)
            for g, s in samples.items()}
    print(json.dumps({'min': mins, 'median': meds, 'sf': args.sf,
                      'reps': args.reps}, separators=(',', ':')),
          file=sys.stderr)
    print(json.dumps(mins, separators=(',', ':')))
    spark.stop()


if __name__ == '__main__':
    main()
