import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from rbql_spark.session import build_session
sys.path.insert(0, repo)  # __spark_entry__ at repo root
import importlib.util
spec = importlib.util.spec_from_file_location('__spark_entry__', os.path.join(repo, '__spark_entry__.py'))
em = importlib.util.module_from_spec(spec)
sys.modules['__spark_entry__'] = em
spec.loader.exec_module(em)
spark = build_session(app_name='ab-r13-head', master='local[32]', shuffle_partitions=32)
spark.sparkContext.setLogLevel('ERROR')
qs = em.queries()
SUB = ['streaming_minhash_neardup', 'text_repetition', 'rbql_multikey_join',
       'rbql_pipe_chain', 'sim_ann_pq', 'window_running_sum']
out = {}
sf = '/root/testdata/sf0.1'
for name in SUB:
    reps = []
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, sf).write.format('noop').mode('overwrite').save()
        reps.append(round(time.time()-t0, 3))
        spark.catalog.clearCache()
    out[name] = min(reps)
# machine fingerprint rides in every A/B record so cross-box comparisons
# can normalize by it (bench.calibrate; same-box A/B needs none)
try:
    import bench
    cal = bench.calibrate(spark)
except Exception:
    cal = None
print(json.dumps({'repo': repo, 'times': out, 'calibration': cal}))
spark.stop()
