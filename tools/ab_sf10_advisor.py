"""r14 verdict #6 done-criterion probe: rerun the two sf10 super-linear
gates WITHOUT manually pinning 128 shuffle partitions — the session uses
the bench default (shuffle_partitions = CPUS) and the ENGINE's own
size-adaptive machinery must land them ≤10× their sf1 times:

* streaming_minhash_neardup — the drain helper scopes the state-store
  partition count from the replay source's byte size
  (tuning.advise_shuffle_partitions; the gate passes expansion=140,
  calibrated against the r14 audit's proven-good 128-partition point);
* bpe_vocab — batch shuffles start at AQE initialPartitionNum (16× base)
  with a 64 MB advisory and coalesce to size (session.build_session).

Writes BENCH_sf10_advisor.json.  Compare against BENCH_sf10.json
(32-pinned baselines: minhash 1057.6 s ratio 11.5, bpe 142.9 s ratio
13.6) and BENCH_sf10_partitions.json (manual-128 targets: 853.2 / 101.6).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('RBQL_STREAM_DRAIN_TIMEOUT', '2400')

from tools.bench_sf1 import CPUS  # noqa: E402
from tools.bench_sf10 import SF10_DIR  # noqa: E402

SF1 = {'streaming_minhash_neardup': 92.002, 'bpe_vocab': 10.507}


def _time_once(fn, spark, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).write.format('noop').mode('overwrite').save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main():
    import __spark_entry__ as em
    from rbql_spark.session import build_session

    spark = build_session(app_name='ab-sf10-advisor',
                          master='local[{}]'.format(CPUS),
                          shuffle_partitions=CPUS,   # NOT pinned to 128
                          driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM',
                                                       '48g'))
    spark.sparkContext.setLogLevel('ERROR')
    qs = em.queries()
    out = {'metric': 'sf10_advisor_probe', 'unit': 'sec',
           'shuffle_partitions_session': CPUS,
           'manual_128_targets': {'streaming_minhash_neardup': 853.159,
                                  'bpe_vocab': 101.612}}
    import bench
    out['calibration'] = bench.calibrate(spark)
    for name in ('bpe_vocab', 'streaming_minhash_neardup'):
        dt = _time_once(qs[name], spark, SF10_DIR)
        out[name + '_sf10'] = dt
        out[name + '_decade_ratio'] = round(dt / SF1[name], 2)
        print('{} sf10 (advisor): {} s, ratio {}'.format(
            name, dt, out[name + '_decade_ratio']), file=sys.stderr)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        'BENCH_sf10_advisor.json')
    with open(path, 'w') as fh:
        json.dump(out, fh, indent=1)


if __name__ == '__main__':
    main()
