"""End-to-end composition: the full training-data pipeline a user of this
repo would actually run — filter → dedup → decontaminate → split →
chunk/pack → shard — chained on real parquet data, proving the
operators' column contracts line up and every stage stays lazy until the
final actions."""

import os

import pytest
from pyspark.sql import functions as F


def test_full_training_pipeline_composes(spark, sf_dir):
    from rbql_spark.ops.dedup import (
        decontaminate, keep_canonical, minhash_dedup_pairs,
    )
    from rbql_spark.ops.export import shard_manifest, verify_shards
    from rbql_spark.ops.sampling import chunk_documents, split_corpus
    from rbql_spark.ops.textstats import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    n0 = docs.count()

    # 1. heuristic quality filtering (keep survivors only)
    qf = quality_filter(docs, min_words=10, mean_word_len_range=(2, 12),
                        min_stopword_ratio=0.0)
    kept = docs.join(qf.where('keep').select('doc_id'), 'doc_id')
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. near-dup dedup: pairs → clusters → one representative each
    pairs = minhash_dedup_pairs(kept, 'text', 'doc_id', threshold=0.5,
                                eager=True)
    deduped = keep_canonical(kept, pairs)
    n2 = deduped.count()
    assert n2 <= n1
    if pairs.count() > 0:
        assert n2 < n1  # found dups -> something was removed

    # 3. benchmark decontamination (drop flagged training docs)
    bench = docs.filter(F.col('doc_id') % 97 == 0).select('doc_id', 'text')
    flagged = decontaminate(deduped, bench, min_overlap=2) \
        .select('doc_id').distinct()
    clean = deduped.join(flagged, 'doc_id', 'left_anti')
    n3 = clean.count()
    assert n3 <= n2

    # 4. deterministic split, then chunk only the train split
    split = split_corpus(clean)
    train = split.where("split = 'train'")
    chunks = chunk_documents(train, chunk_size=64, overlap=8)
    assert chunks.count() >= train.count()  # every non-empty doc chunks

    # 5. sharded export manifest over the final training set
    manifest = shard_manifest(train.drop('split'), n_shards=4)
    rows = manifest.collect()
    assert sum(r['n_rows'] for r in rows) == train.count()
    assert verify_shards(train.drop('split'), manifest, n_shards=4)

    # the pipeline never lost an unfiltered doc: every stage only removes
    assert n0 >= n1 >= n2 >= n3 > 0


def _count_corpus_scans(df, needle: str) -> int:
    """Executed FileScans of `needle` in df's physical plan, counting each
    distinct cached (persisted) subtree ONCE — an InMemoryRelation's build
    runs a single time no matter how many InMemoryTableScans read it."""
    def rec(node, counted):
        name = node.getClass().getName()
        if 'AdaptiveSparkPlan' in name:
            return rec(node.initialPlan(), counted)
        if 'InMemoryTableScan' in name:
            key = node.relation().cacheBuilder().hashCode()
            if key in counted:
                return 0
            counted.add(key)
            return rec(node.relation().cachedPlan(), counted)
        n = 0
        if 'FileSourceScan' in name and needle in node.toString():
            n += 1
        ch = node.children()
        for i in range(ch.size()):
            n += rec(ch.apply(i), counted)
        return n
    return rec(df._jdf.queryExecution().executedPlan(), set())


def test_training_pipeline_scan_bound(spark, sf_dir):
    """The composed pipeline must NOT re-scan the raw corpus per stage: with
    stage materialization (survivors + canonical persisted) and the quality
    filter deciding in-scan (output='rows'), the executed plan reads
    documents.parquet at most twice — survivor-cache build + the
    corpus-derived benchmark slice.  Round 7 shipped 5 scans; at 100 TB
    each extra scan is a full-corpus I/O pass."""
    import re

    import __spark_entry__ as entrymod
    df = entrymod.queries()['pipeline_training_data'](spark, sf_dir)
    try:
        assert _count_corpus_scans(df, 'documents') <= 2
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no pair-space blowups, no Python stages anywhere in the chain
        assert 'CartesianProduct' not in plan
        assert 'MapInPandas' not in plan and 'BatchEvalPython' not in plan
        # bounded shuffle count (distinct by plan_id — cached subtrees
        # print their exchanges once per reference): r7 executed 10,
        # stage materialization brought it to 7 (2 small-scan spreads,
        # 2 CC-iteration, 2 dedup join-backs, 1 packing bucket)
        ids = {m.group(1) for m in re.finditer(
            r'Exchange (?:hash|range|RoundRobin|Single)\w*[^\n]*plan_id=(\d+)',
            plan)}
        assert len(ids) <= 8, sorted(ids)
        # and the result is still real work, not an empty survivor set
        assert df.count() > 0
    finally:
        spark.catalog.clearCache()


def test_training_pipeline_module_matches_inline_composition(spark, sf_dir):
    """training_data_pipeline(materialize=True/False) both reproduce the
    hand-composed stage chain row-for-row."""
    from rbql_spark.ops.pipeline import training_data_pipeline
    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    bench = docs.filter(F.col('doc_id') % 50 == 0).select('doc_id', 'text')
    kw = dict(
        quality_kwargs=dict(min_words=20, min_stopword_ratio=0.05,
                            allowed_langs=['de', 'en', 'es', 'fr']),
        minhash_kwargs=dict(threshold=0.5, hash_fn='md5'),
        decontaminate_kwargs=dict(shingle_k=3, min_overlap=2),
        pack_kwargs=dict(max_tokens=256, target_docs_per_bucket=64))
    try:
        a = sorted(map(tuple, training_data_pipeline(
            docs, bench, materialize=True, **kw).collect()))
        b = sorted(map(tuple, training_data_pipeline(
            docs, bench, materialize=False, **kw).collect()))
        assert a == b and len(a) > 0
    finally:
        spark.catalog.clearCache()


def test_training_pipeline_export_tail(spark, sf_dir, tmp_path):
    """export_path switches the pipeline tail to a sharded verified write:
    the returned manifest covers exactly the clean train split, and the
    written shards re-verify against it."""
    from rbql_spark.ops.export import verify_shards
    from rbql_spark.ops.pipeline import training_data_pipeline
    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    out = str(tmp_path / 'shards')
    try:
        manifest = training_data_pipeline(
            docs, None,
            quality_kwargs=dict(min_words=20, min_stopword_ratio=0.05),
            minhash_kwargs=dict(threshold=0.5, hash_fn='md5'),
            export_path=out, export_shards=4)
        rows = manifest.collect()
        written = spark.read.parquet(out)
        assert sum(r['n_rows'] for r in rows) == written.count() > 0
        assert verify_shards(written.drop('shard'), manifest, n_shards=4)
    finally:
        spark.catalog.clearCache()


def test_training_pipeline_empty_and_fully_filtered_corpus(spark, tmp_path):
    """100 TB jobs hit empty slices: an empty corpus — or one the quality
    filter rejects entirely — flows through every stage to an empty
    result, no crash; checkpoint_dir passthrough exercises the reliable
    CC-state path."""
    from rbql_spark.ops.pipeline import training_data_pipeline
    schema = 'doc_id long, text string, lang string, source string, n_chars long'
    empty = spark.createDataFrame([], schema)
    try:
        assert training_data_pipeline(
            empty, None, minhash_kwargs=dict(threshold=0.5, hash_fn='md5'),
            checkpoint_dir=str(tmp_path / 'cc')).count() == 0
        rejected = spark.createDataFrame(
            [(1, 'x', 'en', 's', 1), (2, 'y y', 'en', 's', 3)], schema)
        assert training_data_pipeline(
            rejected, None, quality_kwargs=dict(min_words=50),
            minhash_kwargs=dict(threshold=0.5, hash_fn='md5')).count() == 0
    finally:
        spark.catalog.clearCache()


def test_training_pipeline_null_text_and_lang_parity(spark, tmp_path):
    """Pipeline-level NULL robustness: plant documents with NULL text and
    NULL lang into the corpus and assert END-TO-END row parity with the
    gate's own DuckDB replay (round 7 fixed NULL handling per-stage; this
    pins the composition)."""
    import duckdb

    import __spark_entry__ as entrymod

    testdata = os.environ.get('SPARK_GRAFT_TESTDATA', '/root/testdata')
    base = spark.read.parquet(
        os.path.join(testdata, 'sf0.001', 'documents.parquet'))
    planted = spark.createDataFrame(
        [(900001, None, None, 'planted', 0),
         (900002, 'too short', None, 'planted', 9),
         (900003, None, 'en', 'planted', 0)],
        'doc_id long, text string, lang string, source string, n_chars long')
    docs_dir = str(tmp_path / 'docs')
    base.unionByName(planted).coalesce(1).write.parquet(
        os.path.join(docs_dir, 'documents.parquet'))

    try:
        got = sorted(map(tuple, entrymod.queries()['pipeline_training_data'](
            spark, docs_dir).collect()))
    finally:
        spark.catalog.clearCache()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM parquet_scan('{}')".format(
            os.path.join(docs_dir, 'documents.parquet', '*.parquet')))
    want = sorted(map(tuple, con.execute(
        entrymod.oracle_sql()['pipeline_training_data']).fetchall()))
    assert len(got) > 0
    assert got == want


def test_pipeline_stage_metrics_match_standalone_counts(spark, sf_dir):
    # with_metrics returns the survivor funnel from the persisted stage
    # frames; each stage's rows_in/rows_out must chain and must equal
    # the counts the standalone operators produce at the same config
    from rbql_spark.ops.dedup import keep_canonical, minhash_dedup_pairs
    from rbql_spark.ops.pipeline import training_data_pipeline
    from rbql_spark.ops.textstats import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    bench = docs.filter(F.col('doc_id') % 50 == 0).select('doc_id', 'text')
    cfg = dict(
        quality_kwargs=dict(min_words=20, min_stopword_ratio=0.05,
                            allowed_langs=['de', 'en', 'es', 'fr']),
        minhash_kwargs=dict(threshold=0.5, hash_fn='md5'),
        decontaminate_kwargs=dict(shingle_k=3, min_overlap=2),
        pack_kwargs=dict(max_tokens=256, target_docs_per_bucket=64))
    result, metrics = training_data_pipeline(docs, bench, with_metrics=True,
                                             **cfg)
    spark.catalog.clearCache()

    stages = [m['stage'] for m in metrics]
    assert stages == ['quality_filter', 'dedup_keep_canonical',
                      'decontaminate', 'split_train']
    # the funnel chains and only removes
    for prev, cur in zip(metrics, metrics[1:]):
        assert cur['rows_in'] == prev['rows_out']
        assert cur['rows_out'] <= cur['rows_in']
    assert metrics[0]['rows_in'] == docs.count()

    # standalone replays of the first two stages at the same config
    kept = quality_filter(docs, output='rows', **cfg['quality_kwargs'])
    assert metrics[0]['rows_out'] == kept.count()
    pairs = minhash_dedup_pairs(kept, 'text', 'doc_id',
                                **cfg['minhash_kwargs'])
    assert metrics[1]['rows_out'] == keep_canonical(kept, pairs).count()

    # the returned packing frame covers exactly the split survivors
    assert result.select('doc_id').distinct().count() \
        == metrics[-1]['rows_out']
    spark.catalog.clearCache()


def test_pipeline_metrics_require_materialize(spark, sf_dir):
    import pytest

    from rbql_spark.ops.pipeline import training_data_pipeline
    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    with pytest.raises(ValueError, match='materialize'):
        training_data_pipeline(docs, None, with_metrics=True,
                               materialize=False)


def test_pipeline_dsir_stage(spark, sf_dir):
    """round-11: dsir_target cuts the canonical frame to n_select docs
    before decontamination, equal to the manual composition."""
    from pyspark.sql import functions as F
    from rbql_spark.ops.dedup import keep_canonical, minhash_dedup_pairs
    from rbql_spark.ops.dsir import dsir_sample
    from rbql_spark.ops.pipeline import training_data_pipeline
    from rbql_spark.ops.textstats import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    target = docs.where(F.col('doc_id') % 7 == 0)
    cfg = dict(
        quality_kwargs={'min_words': 5, 'min_stopword_ratio': 0.0},
        minhash_kwargs={'threshold': 0.5},
        dsir_kwargs={'n_select': 40, 'dim': 512},
        split_kwargs={'splits': [('train', 1.0)]},
    )
    result, metrics = training_data_pipeline(
        docs, None, dsir_target=target, with_metrics=True, **cfg)
    stages = [m['stage'] for m in metrics]
    assert stages == ['quality_filter', 'dedup_keep_canonical',
                      'dsir_select', 'split_train']
    assert metrics[2]['rows_out'] == 40

    kept = quality_filter(docs, output='rows', **cfg['quality_kwargs'])
    pairs = minhash_dedup_pairs(kept, 'text', 'doc_id',
                                **cfg['minhash_kwargs'])
    canon = keep_canonical(kept, pairs)
    sel = dsir_sample(canon, target, **cfg['dsir_kwargs'])
    want = {r['doc_id'] for r in sel.collect()}
    got = {r['doc_id'] for r in result.select('doc_id').distinct().collect()}
    assert got == want

    with pytest.raises(ValueError, match='n_select'):
        training_data_pipeline(docs, None, dsir_target=target,
                               dsir_kwargs={'dim': 512})
    spark.catalog.clearCache()


def test_pipeline_classifier_stage(spark, sf_dir):
    """round-11: classifier_weights filters the quality survivors by
    model score before dedup, equal to the manual composition."""
    from pyspark.sql import functions as F
    from rbql_spark.ops.classifier import classifier_score, classifier_train
    from rbql_spark.ops.pipeline import training_data_pipeline
    from rbql_spark.ops.textstats import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    labeled = docs.withColumn(
        'label', F.when(F.col('lang') == 'en', 1).otherwise(0))
    w = classifier_train(labeled, dim=128, n_iter=2)
    qk = {'min_words': 5, 'min_stopword_ratio': 0.0}
    # median prob as the threshold so the stage genuinely splits the corpus
    kept = quality_filter(docs, output='rows', **qk)
    probs = sorted(r['prob'] for r in classifier_score(kept, w).collect())
    thr = probs[len(probs) // 2]
    cfg = dict(quality_kwargs=qk, classifier_weights=w,
               classifier_threshold=thr,
               minhash_kwargs={'threshold': 0.5},
               split_kwargs={'splits': [('train', 1.0)]})
    result, metrics = training_data_pipeline(
        docs, None, with_metrics=True, **cfg)
    stages = [m['stage'] for m in metrics]
    assert stages == ['quality_filter', 'classifier_filter',
                      'dedup_keep_canonical', 'split_train']
    assert 0 < metrics[1]['rows_out'] < metrics[1]['rows_in']

    keep_ids = {r['doc_id'] for r in classifier_score(kept, w)
                .where(F.col('prob') >= thr).collect()}
    got = {r['doc_id'] for r in result.select('doc_id').distinct().collect()}
    assert got <= keep_ids and got
    spark.catalog.clearCache()


def test_pipeline_embedding_curation_stage(spark, sf_dir):
    """round-11: the optional embedding-space stage (SemDeDup →
    prototype_prune between surface dedup and decontamination) equals the
    manual composition, and its funnel rows land in metrics."""
    from pyspark.sql import functions as F
    from rbql_spark.ops.cluster import prototype_prune
    from rbql_spark.ops.dedup import keep_canonical, minhash_dedup_pairs
    from rbql_spark.ops.pipeline import training_data_pipeline
    from rbql_spark.ops.similarity import semantic_dedup
    from rbql_spark.ops.textstats import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    emb = spark.read.parquet(os.path.join(sf_dir, 'embeddings.parquet')) \
               .select(F.col('vec_id').alias('doc_id'), 'embedding')
    cfg = dict(
        quality_kwargs={'min_words': 5, 'min_stopword_ratio': 0.0},
        minhash_kwargs={'threshold': 0.5},
        semantic_kwargs={'threshold': 0.9, 'dim': 64},
        prototype_kwargs={'k': 4, 'keep_frac': 0.8, 'n_iter': 1},
        split_kwargs={'splits': [('train', 1.0)]},
    )
    result, metrics = training_data_pipeline(
        docs, None, embeddings=emb, with_metrics=True, **cfg)
    stages = [m['stage'] for m in metrics]
    assert stages == ['quality_filter', 'dedup_keep_canonical',
                      'semantic_dedup', 'prototype_prune', 'split_train']
    for prev, cur in zip(metrics, metrics[1:]):
        assert cur['rows_in'] == prev['rows_out']
        assert cur['rows_out'] <= cur['rows_in']

    # manual composition at identical config
    kept = quality_filter(docs, output='rows', **cfg['quality_kwargs'])
    pairs = minhash_dedup_pairs(kept, 'text', 'doc_id',
                                **cfg['minhash_kwargs'])
    canon = keep_canonical(kept, pairs)
    e = emb.join(canon.select('doc_id'), 'doc_id', 'left_semi')
    sem = semantic_dedup(e, id_col='doc_id', vec_col='embedding',
                         **cfg['semantic_kwargs'])
    assert metrics[2]['rows_out'] == \
        canon.join(sem.select('doc_id'), 'doc_id', 'left_semi').count()
    pruned = prototype_prune(sem, id_col='doc_id', vec_col='embedding',
                             **cfg['prototype_kwargs'])
    want = {r['doc_id'] for r in pruned.collect()} & \
           {r['doc_id'] for r in canon.collect()}
    assert metrics[3]['rows_out'] == len(want)
    got = {r['doc_id'] for r in result.select('doc_id').distinct().collect()}
    assert got == want
    spark.catalog.clearCache()


def test_pipeline_curation_stage_persisted_without_metrics(spark, sf_dir):
    """round-11 review fix: the embedding-curation stage must persist
    under materialize=True even WITHOUT with_metrics — otherwise the
    semantic_dedup subtree recomputes inside decontamination's
    double-read and the ≤2-corpus-scan contract breaks."""
    from rbql_spark.ops.pipeline import training_data_pipeline

    docs = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    emb = spark.read.parquet(os.path.join(sf_dir, 'embeddings.parquet')) \
               .select(F.col('vec_id').alias('doc_id'), 'embedding')
    bench = docs.where(F.col('doc_id') % 50 == 0).select('doc_id', 'text')
    res = training_data_pipeline(
        docs, bench, embeddings=emb,
        quality_kwargs={'min_words': 5, 'min_stopword_ratio': 0.0},
        minhash_kwargs={'threshold': 0.5},
        semantic_kwargs={'threshold': 0.9, 'dim': 64},
        split_kwargs={'splits': [('train', 1.0)]})
    assert _count_corpus_scans(res, 'embeddings') <= 1
    assert _count_corpus_scans(res, 'documents') <= 2
    assert res.count() > 0
    spark.catalog.clearCache()


def test_pipeline_line_curation_stages(spark, sf_dir):
    """round-12: the C4 line-clean and Gopher line-shape passes compose in
    front of the heuristic filter as fused projections — results equal
    the manual composition and the curation front stays ONE raw-corpus
    scan."""
    from pyspark.sql import functions as F

    from rbql_spark.ops.pipeline import training_data_pipeline
    from rbql_spark.ops.textstats import (
        c4_line_filter, gopher_quality_filter, quality_filter,
    )

    raw = spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))
    # give the single-line word soup some line structure so the passes
    # genuinely filter (deterministic, same transform on both sides)
    docs = raw.select('doc_id', 'lang', 'source',
                      F.regexp_replace('text', ' (table|row) ', '.\n')
                       .alias('text'))
    c4k = {'min_words_per_line': 3, 'min_kept_lines': 1}
    gk = {'min_required_words': 1, 'max_bullet_line_ratio': 1.0}
    qk = {'min_words': 3, 'min_stopword_ratio': 0.0}
    result = training_data_pipeline(
        docs, None, quality_kwargs=qk, c4_kwargs=c4k, gopher_kwargs=gk,
        minhash_kwargs={'threshold': 0.5},
        split_kwargs={'splits': [('train', 1.0)]})
    got = {r['doc_id'] for r in result.select('doc_id').distinct().collect()}

    manual = c4_line_filter(docs, output='rows', **c4k)
    manual = gopher_quality_filter(manual, output='rows', **gk)
    manual = quality_filter(manual, output='rows', **qk)
    manual_ids = {r['doc_id'] for r in manual.select('doc_id').collect()}
    assert got and got <= manual_ids
    # the stacked curation front must not add raw-corpus scans: the
    # whole pipeline still reads the source the documented <=2 times
    # (survivor build + packing tail over the persisted frames)
    result2 = training_data_pipeline(
        docs, None, quality_kwargs=qk, c4_kwargs=c4k, gopher_kwargs=gk,
        minhash_kwargs={'threshold': 0.5},
        split_kwargs={'splits': [('train', 1.0)]})
    assert _count_corpus_scans(result2, 'documents') <= 2
    spark.catalog.clearCache()
