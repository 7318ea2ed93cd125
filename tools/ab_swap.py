"""In-session interleaved A/B of the working tree vs HEAD for the dsir +
streaming-minhash uncommitted changes.

Loads the HEAD revision of rbql_spark/ops/dsir.py and
rbql_spark/streaming/documents.py (via `git show`) as sibling module
objects inside the live package, then alternates old/new per rep by
patching the public functions the gates import at call time.  One JVM,
interleaved reps -> immune to the box's burst contention.

Usage: python tools/ab_swap.py [reps]
"""
import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_head_module(relpath, modname, package):
    src = subprocess.check_output(['git', '-C', REPO, 'show',
                                   'HEAD:' + relpath]).decode()
    spec = importlib.util.spec_from_loader(modname, loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = package
    mod.__file__ = '<head:{}>'.format(relpath)
    sys.modules[modname] = mod
    exec(compile(src, mod.__file__, 'exec'), mod.__dict__)
    return mod


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from rbql_spark.session import build_session
    spark = build_session(app_name='ab-swap', master='local[32]',
                          shuffle_partitions=32, driver_memory='16g')
    spark.sparkContext.setLogLevel('ERROR')
    try:
        spark.conf.set('spark.ui.enabled', 'false')
    except Exception:
        pass

    import __spark_entry__ as em
    import rbql_spark.ops.dsir as dsir_new
    import rbql_spark.streaming.documents as docs_new
    dsir_old = load_head_module('rbql_spark/ops/dsir.py',
                                'rbql_spark.ops.dsir_head',
                                'rbql_spark.ops')
    docs_old = load_head_module('rbql_spark/streaming/documents.py',
                                'rbql_spark.streaming.documents_head',
                                'rbql_spark.streaming')

    qs = em.queries()
    sf = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    gates = ['dsir_weights', 'dsir_topk', 'domain_classify',
             'streaming_minhash_neardup', 'pipeline_training_data']

    from pyspark.sql import functions as F
    spark.range(1000).select(F.sum('id')).collect()
    em._t(spark, sf, 'lineitem').limit(10).count()

    def set_variant(which):
        dsrc = dsir_old if which == 'old' else dsir_new
        ssrc = docs_old if which == 'old' else docs_new
        for fn in ('dsir_log_weights', 'domain_classify'):
            setattr(dsir_new, fn, getattr(dsrc, fn))
        docs_new.stream_minhash_near_dups = ssrc.stream_minhash_near_dups

    out = {'old': {g: [] for g in gates}, 'new': {g: [] for g in gates}}
    for rep in range(reps):
        for which in ('old', 'new'):
            set_variant(which)
            for name in gates:
                spark.sparkContext.setJobDescription(
                    'ab-{}-{}'.format(which, name))
                t0 = time.time()
                qs[name](spark, sf).write.format('noop') \
                    .mode('overwrite').save()
                out[which][name].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(json.dumps({'rep': rep, 'old': {g: out['old'][g] for g in gates},
                          'new': {g: out['new'][g] for g in gates}}),
              file=sys.stderr, flush=True)
    set_variant('new')
    summary = {g: {'old_min': min(out['old'][g]), 'new_min': min(out['new'][g]),
                   'old': out['old'][g], 'new': out['new'][g]} for g in gates}
    print(json.dumps(summary))
    spark.stop()


if __name__ == '__main__':
    main()
