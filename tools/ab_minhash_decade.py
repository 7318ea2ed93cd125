"""Root-cause the sf10 decade audit's super-linear flag on
streaming_minhash_neardup (BENCH_sf10.json): is it the operator, or the
default HDFSBackedStateStoreProvider degrading at ~10M band-index keys?

The HDFS-backed store is a copy-on-write in-JVM version map with periodic
full-map snapshot maintenance — cost grows with TOTAL state size per
batch, which is exactly what a second decade of keyed state exposes.
RocksDBStateStoreProvider keeps state off-heap with incremental
changelogs; SCALING.md already prescribes it for long-running state, and
tests/test_streaming.py proves both providers produce identical results.
This tool measures the SAME gate at sf1 (min-of-2, both providers) and
sf10 (RocksDB; the HDFS sf10 point is BENCH_sf10.json's 1057.6s), and
re-times bpe_vocab at sf1 min-of-3 to settle its noisy denominator.

Requires the replica dirs built by tools/bench_sf10.py (cached under
/tmp/rbql_sf10) and tools/bench_sf1.py.

Usage: python tools/ab_minhash_decade.py   # prints one JSON line
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('RBQL_STREAM_DRAIN_TIMEOUT', '2400')

from tools.bench_sf1 import CPUS, SF1_DIR, build_sf1  # noqa: E402
from tools.bench_sf10 import SF10_DIR  # noqa: E402

PROVIDER_KEY = 'spark.sql.streaming.stateStore.providerClass'
HDFS = ('org.apache.spark.sql.execution.streaming.state.'
        'HDFSBackedStateStoreProvider')
ROCKS = ('org.apache.spark.sql.execution.streaming.state.'
         'RocksDBStateStoreProvider')


def _time_once(fn, spark, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).write.format('noop').mode('overwrite').save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main():
    import __spark_entry__ as em
    from rbql_spark.session import build_session

    spark = build_session(app_name='ab-minhash-decade',
                          master='local[{}]'.format(CPUS),
                          shuffle_partitions=CPUS,
                          driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM',
                                                       '48g'))
    spark.sparkContext.setLogLevel('ERROR')
    build_sf1(spark)
    qs = em.queries()
    minhash = qs['streaming_minhash_neardup']
    bpe = qs['bpe_vocab']

    out = {'metric': 'minhash_decade_ab', 'unit': 'sec',
           'hdfs_sf10_sec_from_audit': 1057.628}
    _time_once(minhash, spark, SF1_DIR)   # warm codegen + python workers

    for tag, provider in (('hdfs', HDFS), ('rocksdb', ROCKS)):
        spark.conf.set(PROVIDER_KEY, provider)
        reps = [_time_once(minhash, spark, SF1_DIR) for _ in range(2)]
        out['minhash_sf1_{}'.format(tag)] = min(reps)
        print('minhash sf1 {}: {}'.format(tag, sorted(reps)), file=sys.stderr)

    spark.conf.set(PROVIDER_KEY, ROCKS)
    out['minhash_sf10_rocksdb'] = _time_once(minhash, spark, SF10_DIR)
    print('minhash sf10 rocksdb: {}'.format(out['minhash_sf10_rocksdb']),
          file=sys.stderr)
    spark.conf.unset(PROVIDER_KEY)

    out['minhash_ratio_hdfs'] = round(
        out['hdfs_sf10_sec_from_audit'] / out['minhash_sf1_hdfs'], 2)
    out['minhash_ratio_rocksdb'] = round(
        out['minhash_sf10_rocksdb'] / out['minhash_sf1_rocksdb'], 2)

    reps = [_time_once(bpe, spark, SF1_DIR) for _ in range(3)]
    out['bpe_vocab_sf1'] = min(reps)
    print('bpe_vocab sf1: {}'.format(sorted(reps)), file=sys.stderr)
    out['bpe_vocab_sf10_from_audit'] = 142.868
    out['bpe_vocab_ratio'] = round(142.868 / out['bpe_vocab_sf1'], 2)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        'BENCH_sf10_ab.json')
    with open(path, 'w') as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == '__main__':
    main()
