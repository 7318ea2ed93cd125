#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}

Each query runs REPS times (default 3) to a no-op sink (full pipeline
executes, nothing is collected to the driver); sub-second queries get
extra reps (min-of-5) because local[32] single-run numbers carry ±0.4s
scheduler/GC noise that polluted earlier round-over-round comparisons.
`queries` reports the per-query min (the comparable number); the median
rides alongside in `queries_median` as the noise gauge.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
REPS = int(os.environ.get('SPARK_GRAFT_BENCH_REPS', '3'))

# Headline set: RBQL-engine queries + scale-path pipeline operators
BENCH_QUERIES = [
    'rbql_select_where',
    'rbql_select_top_order',
    'rbql_group_agg',
    'rbql_group_expr_key',
    'rbql_inner_join',
    'rbql_multikey_join',
    'rbql_pipe_chain',
    'window_running_sum',
    'window_tumbling',
    'having_groups',
    'dedup_exact',
    'dedup_minhash_lsh',
    'sim_topk_bruteforce',
    'text_token_stats',
    'text_quality_score',
    'text_fingerprint',
    'multimodal_features',
    # round 3 additions (pipeline superset)
    'dedup_clusters',
    'pack_sequences',
    'sample_stratified',
    'text_redact_pii',
    # round 6 additions (quality filters / line dedup / mixture / PQ)
    'text_repetition',
    'dedup_lines',
    'sample_temperature',
    'sim_ann_pq',
    'chunk_documents',
    'text_quality_filter',
    'text_lm_score',
    'profile_table',
    # round 7 additions (composed pipeline)
    'pipeline_training_data',
]


def main() -> None:
    from rbql_spark.session import build_session

    spark = build_session(
        app_name='rbql-spark-bench',
        master='local[{}]'.format(CPUS),
        shuffle_partitions=CPUS,
        driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g'),
    )
    spark.sparkContext.setLogLevel('ERROR')
    try:
        spark.conf.set('spark.ui.enabled', 'false')
    except Exception:
        pass

    import __spark_entry__ as entrymod
    queries = entrymod.queries()

    # warmup: JVM/codegen/python-worker/parquet-footer one-time costs
    from pyspark.sql import functions as F
    spark.range(1000).select(F.sum('id')).collect()
    entrymod._t(spark, SF_DIR, 'lineitem').limit(10).count()

    sf = SF_DIR.rstrip('/').rsplit('sf', 1)[-1]
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        reps: list[float] = []
        failed = False
        # sub-second queries are jitter-dominated: extend to min-of-5
        while len(reps) < max(1, REPS) or (min(reps) < 1.0 and len(reps) < 5):
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                df.write.format('noop').mode('overwrite').save()
                reps.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # keep benching; a failed query reports -1
                failed = True
                print('BENCH ERROR {}: {}'.format(name, e), file=sys.stderr)
                break
        if failed or not reps:
            timings[name] = -1.0
            medians[name] = -1.0
        else:
            reps.sort()
            timings[name] = reps[0]
            medians[name] = reps[len(reps) // 2]

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(json.dumps({
        'metric': 'rbql_spark bench: headline queries end-to-end (noop sink)',
        'value': total,
        'unit': 'sec',
        'queries': timings,
        'queries_median': medians,
        'sf': float(sf) if sf.replace('.', '').isdigit() else sf,
    }))
    spark.stop()


if __name__ == '__main__':
    main()
