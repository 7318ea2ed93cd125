#!/usr/bin/env python3
"""Dump REAL streaming micro-batch physical plans (r16 verdict #8).

The r16 plans/ dumps for streaming gates captured only the drain-output
read plan (LocalTableScan of the sink); this drives each stateful gate
end-to-end and snapshots StreamingQuery.explain(extended) plus the
per-batch durationMs breakdown via events.DRAIN_INSPECT_HOOK — the only
window where the live micro-batch plan is readable.

Usage: python tools/r17_stream_plans.py [gate ...]   (default: stateful set)
Writes plans/r17/<gate>_microbatch.txt.
"""
import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATES = ['streaming_user_totals', 'streaming_minhash_neardup',
         'streaming_decontaminate', 'streaming_decontaminate_bloom',
         'streaming_exact_dedup', 'streaming_windowed_counts',
         'streaming_session_counts']


def main():
    gates = sys.argv[1:] or GATES
    from rbql_spark.session import build_session
    spark = build_session(app_name='r17-stream-plans', master='local[32]',
                          shuffle_partitions=32, driver_memory='16g')
    spark.sparkContext.setLogLevel('ERROR')
    import __spark_entry__ as em
    import rbql_spark.streaming.events as ev
    qs = em.queries()
    outdir = os.path.join(REPO, 'plans', 'r17')
    os.makedirs(outdir, exist_ok=True)
    captured = {}

    def hook(qname, q):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain(True)
        lines = [buf.getvalue(), '\n== recentProgress durationMs ==\n']
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            lines.append('batch {} rows {} {}\n'.format(
                d.get('batchId'), d.get('numInputRows'),
                d.get('durationMs')))
        captured['txt'] = ''.join(lines)

    ev.DRAIN_INSPECT_HOOK = hook
    try:
        for g in gates:
            captured.clear()
            df = qs[g](spark, '/root/testdata/sf0.1')
            df.write.format('noop').mode('overwrite').save()
            path = os.path.join(outdir, '{}_microbatch.txt'.format(g))
            with open(path, 'w') as f:
                f.write(captured.get('txt', '(no drain hooked)'))
            print('wrote', path)
            spark.catalog.clearCache()
    finally:
        ev.DRAIN_INSPECT_HOOK = None
    spark.stop()


if __name__ == '__main__':
    main()
