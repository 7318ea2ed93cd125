"""Second probe for the sf10 decade audit's super-linear flags
(streaming_minhash_neardup 11.6x, bpe_vocab 12.9x per decade): the
provider A/B (tools/ab_minhash_decade.py) acquitted the state store
(RocksDB ratio 11.9 ~= HDFS 11.6), so test the other decade suspect —
the FIXED shuffle-partition count.  The bench pins
spark.sql.shuffle.partitions=32 (matching local[32]); at sf10 each task
therefore sorts/aggregates 10x the rows of the sf1 run, and once a
task's working set exceeds execution memory it spills, bending the
decade ratio upward even though the operator's total work is linear.
On a real cluster partitions scale with input (SCALING.md's sizing
rule), which is exactly what this probe simulates by raising the count
to 128 at the same data size.

Usage: python tools/ab_sf10_partitions.py   # prints one JSON line
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('RBQL_STREAM_DRAIN_TIMEOUT', '2400')

from tools.bench_sf1 import CPUS  # noqa: E402
from tools.bench_sf10 import SF10_DIR  # noqa: E402


def _time_once(fn, spark, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).write.format('noop').mode('overwrite').save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main():
    import __spark_entry__ as em
    from rbql_spark.session import build_session

    spark = build_session(app_name='ab-sf10-partitions',
                          master='local[{}]'.format(CPUS),
                          shuffle_partitions=128,
                          driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM',
                                                       '48g'))
    spark.sparkContext.setLogLevel('ERROR')
    qs = em.queries()
    out = {'metric': 'sf10_partition_probe', 'unit': 'sec',
           'shuffle_partitions': 128,
           'baseline_32_partitions': {'streaming_minhash_neardup': 1057.628,
                                      'bpe_vocab': 142.868}}
    for name in ('bpe_vocab', 'streaming_minhash_neardup'):
        dt = _time_once(qs[name], spark, SF10_DIR)
        out[name + '_sf10_128p'] = dt
        print('{} sf10 @128p: {}'.format(name, dt), file=sys.stderr)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        'BENCH_sf10_partitions.json')
    with open(path, 'w') as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == '__main__':
    main()
