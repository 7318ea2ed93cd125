"""Same-methodology A/B timer: times named gates against a repo path.

Usage: python tools/ab_gates.py <repo_path> <reps> gate [gate ...]
Prints one JSON line {'repo':..., 'times': {gate: min_sec}, 'calibration':...}.
"""
import importlib.util
import json
import os
import sys
import time

repo = sys.argv[1]
reps_n = int(sys.argv[2])
gates = sys.argv[3:]
sys.path.insert(0, repo)
from rbql_spark.session import build_session  # noqa: E402

spec = importlib.util.spec_from_file_location(
    '__spark_entry__', os.path.join(repo, '__spark_entry__.py'))
em = importlib.util.module_from_spec(spec)
sys.modules['__spark_entry__'] = em
spec.loader.exec_module(em)

spark = build_session(app_name='ab-gates', master='local[32]',
                      shuffle_partitions=32, driver_memory='16g')
spark.sparkContext.setLogLevel('ERROR')
try:
    spark.conf.set('spark.ui.enabled', 'false')
except Exception:
    pass
qs = em.queries()
sf = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')

# warmup (bench parity)
from pyspark.sql import functions as F  # noqa: E402
spark.range(1000).select(F.sum('id')).collect()
em._t(spark, sf, 'lineitem').limit(10).count()

raw = {g: [] for g in gates}
for _ in range(reps_n):
    for name in gates:
        spark.sparkContext.setJobDescription('ab:' + name)
        t0 = time.time()
        qs[name](spark, sf).write.format('noop').mode('overwrite').save()
        raw[name].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
out = {g: min(v) for g, v in raw.items()}
try:
    import bench
    cal = bench.calibrate(spark)
except Exception:
    cal = None
print(json.dumps({'repo': repo, 'times': out, 'raw': raw,
                  'calibration': cal}))
spark.stop()
