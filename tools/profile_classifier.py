"""Phase-level timing of the quality_classifier gate (guide §1): feature
cache build, per-round gradient jobs, corpus scoring.

Usage: python tools/profile_classifier.py [sf_dir]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from rbql_spark.session import build_session
    spark = build_session(app_name='clf-profile', master='local[32]',
                          shuffle_partitions=32, driver_memory='16g')
    spark.sparkContext.setLogLevel('ERROR')
    try:
        spark.conf.set('spark.ui.enabled', 'false')
    except Exception:
        pass
    spark.range(1000).select(F.sum('id')).collect()

    from rbql_spark.ops.classifier import (_features, _weights_df,
                                           classifier_score)

    docs = spark.read.parquet(os.path.join(sf, 'documents.parquet'))
    labeled = docs.withColumn('label',
                              (F.col('lang') == 'en').cast('int'))
    dim, ngram_max, seed, n_iter, lr = 256, 2, 42, 2, 1.0

    for trial in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        feats = _features(labeled, 'text', 'doc_id', dim, ngram_max, seed,
                          label=F.col('label'))
        from rbql_spark.tuning import (advise_shuffle_partitions,
                                       input_scan_bytes)
        n_parts = advise_shuffle_partitions(spark,
                                            input_scan_bytes(labeled),
                                            expansion=2.0)
        feats = feats.repartition(n_parts, 'doc_id') \
                     .persist(StorageLevel.MEMORY_AND_DISK)
        n_feat_rows = feats.count()
        t1 = time.time()
        print('[%d] feature build+persist: %.3f s (%d rows, %d parts)'
              % (trial, t1 - t0, n_feat_rows, n_parts), flush=True)

        from rbql_spark.ops.classifier import _round6_np as r6
        n_docs = 0
        w = [0.0] * (dim + 1)
        for it in range(n_iter):
            ta = time.time()
            wdf = _weights_df(spark, w)
            docg = (feats.join(F.broadcast(wdf), 'bucket')
                         .groupBy('doc_id')
                         .agg(F.first('y').alias('y'),
                              F.round(F.sum(F.col('__w') * F.col('x')), 6)
                               .alias('__z'))
                         .select('doc_id',
                                 (F.lit(1.0) / (F.lit(1.0)
                                                + F.exp(-F.col('__z')))
                                  - F.col('y')).alias('__g')))
            grad = (feats.join(docg, 'doc_id')
                         .groupBy('bucket')
                         .agg(F.sum(F.col('__g') * F.col('x'))
                               .alias('__grad'),
                              F.count(F.lit(1)).alias('__cnt'))
                         .collect())
            if not n_docs:
                n_docs = sum(int(r['__cnt']) for r in grad
                             if int(r['bucket']) == dim)
            gd = {int(r['bucket']): float(r['__grad']) for r in grad}
            w = [float(r6(w[j] - lr * (gd.get(j, 0.0) / float(n_docs))))
                 for j in range(dim + 1)]
            print('[%d] round %d: %.3f s' % (trial, it, time.time() - ta),
                  flush=True)
        feats.unpersist()
        t2 = time.time()
        scored = classifier_score(docs, w, dim_check=dim)
        scored.write.format('noop').mode('overwrite').save()
        print('[%d] scoring pass: %.3f s' % (trial, time.time() - t2),
              flush=True)
        print('[%d] total: %.3f s' % (trial, time.time() - t0), flush=True)
    spark.stop()


if __name__ == '__main__':
    main()
