"""Quiet-box A/B of running_user_totals eviction cost (VERDICT r11 #1).

Runs the streaming_user_totals gate shape at $SPARK_GRAFT_SF_DIR
(default sf0.1) with state_retention='90 days' (r11 HEAD) vs None
(r10 behavior), interleaved reps in ONE process, and prints per-rep
seconds.  The only varying factor is the timeout mode.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rbql_spark.streaming.events import (  # noqa: E402
    read_event_stream, run_stream_to_memory, running_user_totals,
)


def run_once(spark, sf_dir, retention, tag):
    tmp = entry._stream_replay_dir(spark, sf_dir, 'tot',
                                   ['event_id % 2 = 0', 'event_id % 2 = 1'])
    stream = read_event_stream(spark, tmp, max_files_per_trigger=1)
    totals = running_user_totals(stream, state_retention=retention)
    qname = 'ab_tot_{}_{}'.format(tag, int(time.time() * 1000) % 100000)
    t0 = time.time()
    sq = run_stream_to_memory(totals, qname, output_mode='update')
    sq.stop()
    n = spark.table(qname).count()
    dt = time.time() - t0
    spark.catalog.dropTempView(qname)
    return dt, n


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master('local[{}]'.format(cpus))
             .config('spark.sql.shuffle.partitions', '32')
             .config('spark.driver.memory', '8g')
             .appName('ab_user_totals').getOrCreate())
    spark.sparkContext.setLogLevel('ERROR')
    # warm the replay dir + JVM once
    run_once(spark, sf_dir, None, 'warm')
    results = {'retention_90d': [], 'retention_none': []}
    for rep in range(3):
        dt, n = run_once(spark, sf_dir, '90 days', 'on')
        results['retention_90d'].append(round(dt, 2))
        print('rep', rep, 'retention=90d ', round(dt, 2), 's rows', n, flush=True)
        dt, n = run_once(spark, sf_dir, None, 'off')
        results['retention_none'].append(round(dt, 2))
        print('rep', rep, 'retention=None', round(dt, 2), 's rows', n, flush=True)
    print('SUMMARY', results)
    spark.stop()


if __name__ == '__main__':
    main()
