"""Quiet-box A/B of the streaming classifier scorer (VERDICT r12 #1).

BENCH_r12 showed streaming_classifier 2.42 s -> 3.39 s (1.40x),
coincident with the round-12 canonical-summation rework of
_score_inline (ops/classifier.py): the r11 per-occurrence scalar fold
became a sorted run-length fold with 3-field STRUCT state.

Interleaved reps in ONE process of three inline scorers over the exact
streaming_classifier gate drain (2-file replay, max_files_per_trigger=1,
append to memory sink):

  head — the r12 struct-state run-length fold (bit-canonical)
  r11  — the pre-rework per-occurrence fold (NOT canonical; the perf
         reference point only)
  flat — candidate: same canonical term sequence (w_b*(c_b/n) ascending
         buckets, intercept last, floor6) but built from run-START
         indices with scalar-state folds/transforms only

Usage: python tools/ab_classifier.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rbql_spark.ops.dsir import _bucket, _hashed_grams  # noqa: E402
from rbql_spark.ops.dedup import let_once  # noqa: E402
from rbql_spark.ops.classifier import _floor6, _score_inline  # noqa: E402
from rbql_spark.streaming.documents import read_document_stream  # noqa: E402
from rbql_spark.streaming.events import run_stream_to_memory  # noqa: E402

NGRAM_MAX = 2
SEED = 42


def _finish(base):
    return base.select('doc_id', 'n_features', 'logit',
                       _floor6(F.lit(1.0) / (F.lit(1.0)
                                             + F.exp(-F.col('logit'))))
                        .alias('prob'))


def score_r11(corpus, weights):
    dim = len(weights) - 1
    wlit = F.array(*[F.lit(float(w)) for w in weights[:dim]])
    intercept = float(weights[dim])

    def score(ga):
        n = F.size(ga)
        s = F.aggregate(
            ga, F.lit(0.0),
            lambda acc, g: acc + F.element_at(
                wlit, (_bucket(g, dim, SEED) + 1).cast('int')))
        logit = F.when(n > 0,
                       F.round(s / n.cast('double') + F.lit(intercept), 6))
        return F.struct(n.cast('long').alias('n_features'),
                        logit.alias('logit'))

    packed = let_once(_hashed_grams(F.col('text'), NGRAM_MAX), score)
    base = (corpus.select(F.col('doc_id'), packed.alias('__p'))
                  .select('doc_id',
                          F.col('__p.n_features').alias('n_features'),
                          F.col('__p.logit').alias('logit'))
                  .where(F.col('n_features') > 0))
    return _finish(base)


def score_flat(corpus, weights):
    dim = len(weights) - 1
    wlit = F.array(*[F.lit(float(w)) for w in weights[:dim]])
    intercept = float(weights[dim])

    def score(ga):
        n = F.size(ga)
        nd = n.cast('double')
        # bs and starts MUST be lambda-bound (let_once): Catalyst has no
        # CSE inside HOF lambdas, so a bare `bs` referenced in the filter
        # body would re-sort the whole array per element (quadratic)
        def with_bs(bs):
            idx = F.sequence(F.lit(0), n - 1)
            run_starts = F.filter(
                idx, lambda i: (i == 0)
                | (F.element_at(bs, i + 1) != F.element_at(bs, i)))

            def with_starts(starts):
                k = F.size(starts)
                terms = F.transform(
                    starts,
                    lambda s, j: F.element_at(wlit,
                                              F.element_at(bs, s + 1) + 1)
                    * ((F.when(j == k - 1, n)
                         .otherwise(F.element_at(starts, j + 2)) - s)
                       .cast('double') / nd))
                return F.aggregate(terms, F.lit(0.0),
                                   lambda acc, t: acc + t) \
                    + F.lit(intercept)

            return let_once(run_starts, with_starts)

        folded = let_once(
            F.array_sort(F.transform(
                ga, lambda g: _bucket(g, dim, SEED).cast('int'))), with_bs)
        logit = F.when(n > 0, _floor6(folded))
        return F.struct(n.cast('long').alias('n_features'),
                        logit.alias('logit'))

    packed = let_once(_hashed_grams(F.col('text'), NGRAM_MAX), score)
    base = (corpus.select(F.col('doc_id'), packed.alias('__p'))
                  .select('doc_id',
                          F.col('__p.n_features').alias('n_features'),
                          F.col('__p.logit').alias('logit'))
                  .where(F.col('n_features') > 0))
    return _finish(base)


def score_head(corpus, weights):
    return _score_inline(corpus, list(weights), 'text', 'doc_id',
                         NGRAM_MAX, SEED, len(weights) - 1)


VARIANTS = {'head': score_head, 'r11': score_r11, 'flat': score_flat}


def run_once(spark, sf_dir, weights, variant, tag):
    tmp = entry._stream_replay_dir(spark, sf_dir, 'clf',
                                   ['doc_id % 2 = 0', 'doc_id % 2 = 1'],
                                   table='documents')
    stream = read_document_stream(spark, tmp, max_files_per_trigger=1)
    scored = VARIANTS[variant](stream, weights)
    qname = 'ab_clf_{}_{}'.format(tag, int(time.time() * 1000) % 100000)
    t0 = time.time()
    sq = run_stream_to_memory(scored, qname, output_mode='append')
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
             .config('spark.ui.enabled', 'false')
             .config('spark.driver.memory', '8g')
             .appName('ab_classifier').getOrCreate())
    spark.sparkContext.setLogLevel('ERROR')
    w = entry._trained_classifier_weights(spark, sf_dir)

    # batch equivalence first: head and flat must be BIT-identical
    # (repartition: the single-file scan would otherwise run the whole
    # interpreted-HOF projection on one task)
    docs = entry._t(spark, sf_dir, 'documents').repartition(32)
    a = score_head(docs, w).withColumnRenamed('logit', 'l1') \
                           .withColumnRenamed('prob', 'p1') \
                           .withColumnRenamed('n_features', 'n1')
    b = score_flat(docs, w).withColumnRenamed('logit', 'l2') \
                           .withColumnRenamed('prob', 'p2') \
                           .withColumnRenamed('n_features', 'n2')
    j = a.join(b, 'doc_id', 'full')
    bad = j.where((F.col('l1') != F.col('l2')) | (F.col('p1') != F.col('p2'))
                  | (F.col('n1') != F.col('n2'))
                  | F.col('l1').isNull() | F.col('l2').isNull()).count()
    print('flat-vs-head bit mismatches:', bad, flush=True)

    run_once(spark, sf_dir, w, 'head', 'warm')  # warm replay dir + JVM
    variants_env = os.environ.get('AB_CLF_VARIANTS', 'head,r11,flat').split(',')
    results = {k: [] for k in variants_env}
    for rep in range(int(os.environ.get('AB_CLF_REPS', '3'))):
        for variant in variants_env:
            dt, n = run_once(spark, sf_dir, w, variant, variant)
            results[variant].append(round(dt, 2))
            print('rep', rep, variant.ljust(4), round(dt, 2), 's rows', n,
                  flush=True)
    print('SUMMARY', {k: (min(v), sorted(v)) for k, v in results.items()})
    spark.stop()


if __name__ == '__main__':
    main()
