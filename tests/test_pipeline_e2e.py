"""End-to-end composition: the full training-data pipeline a user of this
repo would actually run — filter → dedup → decontaminate → split →
chunk/pack → shard — chained on real parquet data, proving the
operators' column contracts line up and every stage stays lazy until the
final actions."""

import os

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
