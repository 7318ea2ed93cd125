#!/usr/bin/env python3
"""Dump explain('formatted') for named gates to plans/r16/<gate>_<tag>.txt.

Usage: python tools/r16_plan.py --repo DIR --tag before|after [--sf DIR] gate...
The plans directory is always the MAIN repo's plans/r16 (so before-plans
generated from a pristine worktree land next to the after-plans).
"""
import argparse
import os
import sys

MAIN_REPO = '/root/repo'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--repo', default=MAIN_REPO)
    ap.add_argument('--tag', required=True)
    ap.add_argument('--sf', default='/root/testdata/sf0.1')
    ap.add_argument('gates', nargs='+')
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from rbql_spark.session import build_session
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        '__spark_entry__', os.path.join(args.repo, '__spark_entry__.py'))
    em = importlib.util.module_from_spec(spec)
    sys.modules['__spark_entry__'] = em
    spec.loader.exec_module(em)

    spark = build_session(app_name='r16-plan', master='local[32]',
                          shuffle_partitions=32, driver_memory='16g')
    spark.sparkContext.setLogLevel('ERROR')
    try:
        spark.conf.set('spark.ui.enabled', 'false')
    except Exception:
        pass
    qs = em.queries()
    outdir = os.path.join(MAIN_REPO, 'plans', 'r16')
    os.makedirs(outdir, exist_ok=True)
    for g in args.gates:
        df = qs[g](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), 'formatted')
        with open(os.path.join(outdir, '{}_{}.txt'.format(g, args.tag)),
                  'w') as f:
            f.write(txt)
        spark.catalog.clearCache()
        print('wrote', g, args.tag)
    spark.stop()


if __name__ == '__main__':
    main()
