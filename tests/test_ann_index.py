"""Materialized ANN index: the stored cell-partitioned IVF-PQ index must
be a pure cache of the in-plan operator — row-identical search results —
and searches must prune to the probed cell partitions."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope='module')
def emb_q(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, 'embeddings.parquet'))
    q = emb.filter(F.col('vec_id') < 3) \
           .select(F.col('vec_id').alias('query_id'), 'embedding')
    return emb, q


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stored_search_equals_inplan(spark, tmp_path, emb_q):
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, search_ivf_pq_index,
    )
    from rbql_spark.ops.similarity import ivf_pq_ann_topk
    emb, q = emb_q
    path = str(tmp_path / 'idx')
    build_ivf_pq_index(emb, path, n_cells=16, m=8, ks=16)
    got = search_ivf_pq_index(spark, path, q, k=5, n_probe=4)
    want = ivf_pq_ann_topk(emb, q, k=5, n_cells=16, n_probe=4)
    assert _rows(got) == _rows(want) and len(_rows(got)) == 15


def test_stored_search_partition_pruning(spark, tmp_path, emb_q):
    # the scan must carry the probed cells as PartitionFilters — only
    # those directories are read (n_probe/n_cells of the index bytes)
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, search_ivf_pq_index,
    )
    emb, q = emb_q
    path = str(tmp_path / 'idx')
    build_ivf_pq_index(emb, path, n_cells=16, m=8, ks=16)
    res = search_ivf_pq_index(spark, path, q, k=5, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the filter is a literal IN-list over the probed cells (e.g.
    # `cell#N IN (0,5,7,...)`), so only those directories are listed/read
    seg = plan.split('PartitionFilters')[1][:300]
    assert ' IN (' in seg, seg
    in_list = seg.split(' IN (')[1].split(')')[0]
    assert 0 < len(in_list.split(',')) <= 3 * 2  # <= queries x n_probe


def test_stored_search_residual_and_multiassign(spark, tmp_path, emb_q):
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, search_ivf_pq_index,
    )
    from rbql_spark.ops.similarity import ivf_pq_ann_topk
    emb, q = emb_q
    p1 = str(tmp_path / 'idx_res')
    build_ivf_pq_index(emb, p1, n_cells=16, m=8, ks=16, residual=True)
    got = search_ivf_pq_index(spark, p1, q, k=5, n_probe=4)
    want = ivf_pq_ann_topk(emb, q, k=5, n_cells=16, n_probe=4,
                           residual=True)
    assert _rows(got) == _rows(want)

    p2 = str(tmp_path / 'idx_ma')
    build_ivf_pq_index(emb, p2, n_cells=16, m=8, ks=16, n_assign=2)
    got2 = search_ivf_pq_index(spark, p2, q, k=5, n_probe=4)
    want2 = ivf_pq_ann_topk(emb, q, k=5, n_cells=16, n_probe=4, n_assign=2)
    assert _rows(got2) == _rows(want2)


def test_stored_search_pure_pq_index(spark, tmp_path, emb_q):
    # store_floats=False: a FAISS-style codes-only index — ranking stays
    # in ADC order, ids still come back k-per-query
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, search_ivf_pq_index,
    )
    emb, q = emb_q
    path = str(tmp_path / 'idx_pq')
    build_ivf_pq_index(emb, path, n_cells=16, m=8, ks=16,
                       store_floats=False)
    # the index stores only ids + m code columns (+ the cell partition)
    files = spark.read.parquet(path)
    assert set(files.columns) == {'vec_id', 'cell'} | {
        '__c{}'.format(j) for j in range(8)}
    res = search_ivf_pq_index(spark, path, q, k=5, n_probe=4).collect()
    assert len(res) == 15
    assert {r['query_id'] for r in res} == {0, 1, 2}


def test_append_grows_index_with_frozen_model(spark, tmp_path, emb_q):
    # appended rows must carry EXACTLY the codes the build kernel would
    # produce under the stored model, and a search after append equals a
    # search over a one-shot union index with the same (frozen) model
    from rbql_spark.ops.ann_index import (
        append_to_ivf_pq_index, build_ivf_pq_index, search_ivf_pq_index,
    )
    emb, q = emb_q
    half_a = emb.filter(F.col('vec_id') % 2 == 0)
    half_b = emb.filter(F.col('vec_id') % 2 == 1)

    grown = str(tmp_path / 'idx_grown')
    build_ivf_pq_index(half_a, grown, n_cells=8, m=8, ks=16)
    n = append_to_ivf_pq_index(half_b, grown)
    assert n == half_b.count()

    # one-shot union index under the SAME model: encode the union with
    # the grown index's stored meta and compare code rows
    import json as _json
    import os as _os
    from rbql_spark.ops.ann_index import _META_FILE, _encode_with_meta
    with open(_os.path.join(grown, _META_FILE)) as fh:
        meta = _json.load(fh)
    want_rows = sorted(map(tuple, _encode_with_meta(emb, meta)
                           .drop(meta['vec_col']).collect()))
    got_rows = sorted(map(tuple, spark.read.parquet(grown)
                          .select('vec_id',
                                  *['__c{}'.format(j) for j in range(8)],
                                  'cell').collect()))
    assert got_rows == want_rows

    # (got_rows == want_rows above already proves the index holds exactly
    # the union's encoding); a query's exact self-match ranks first
    res = search_ivf_pq_index(spark, grown, q, k=5, n_probe=4).collect()
    top = {r['query_id']: r['vec_id'] for r in res if r['rank'] == 1}
    assert top == {0: 0, 1: 1, 2: 2}


def test_index_stats_balance(spark, tmp_path, emb_q):
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, ivf_pq_index_stats,
    )
    emb, _ = emb_q
    path = str(tmp_path / 'idx_stats')
    build_ivf_pq_index(emb, path, n_cells=8, m=8, ks=16)
    rows = ivf_pq_index_stats(spark, path).collect()
    assert sum(r['n_rows'] for r in rows) == emb.count()
    assert abs(sum(r['pct'] for r in rows) - 100.0) < 0.5
    # balance_ratio is normalized to the mean: the average over observed
    # cells is 1 by construction
    import statistics
    assert abs(statistics.mean(r['balance_ratio'] for r in rows) - 1.0) < 0.05
    # sorted hot-first
    assert [r['n_rows'] for r in rows] == sorted(
        (r['n_rows'] for r in rows), reverse=True)


def test_stream_append_ingest(spark, tmp_path, emb_q):
    # streaming embedding ingest: two micro-batch files appended under the
    # frozen model == the one-shot union encoding (same kernel, same meta)
    from rbql_spark.ops.ann_index import (
        _META_FILE, _encode_with_meta, build_ivf_pq_index,
        stream_append_to_ivf_pq_index,
    )
    import json as _json

    emb, _ = emb_q
    half_a = emb.filter(F.col('vec_id') % 2 == 0)
    half_b = emb.filter(F.col('vec_id') % 2 == 1)
    path = str(tmp_path / 'idx_stream')
    build_ivf_pq_index(half_a, path, n_cells=8, m=8, ks=16)

    stream_dir = str(tmp_path / 'incoming')
    half_b.filter(F.col('vec_id') % 4 == 1).coalesce(1) \
          .write.mode('overwrite').parquet(stream_dir)
    half_b.filter(F.col('vec_id') % 4 == 3).coalesce(1) \
          .write.mode('append').parquet(stream_dir)
    stream = (spark.readStream
              .schema(spark.read.parquet(stream_dir).schema)
              .option('maxFilesPerTrigger', 1)
              .parquet(stream_dir))
    q = stream_append_to_ivf_pq_index(
        stream, path, checkpoint_dir=str(tmp_path / 'ckpt'))
    q.awaitTermination(120)
    q.stop()

    with open(os.path.join(path, _META_FILE)) as fh:
        meta = _json.load(fh)
    want = sorted(map(tuple, _encode_with_meta(emb, meta)
                      .drop(meta['vec_col']).collect()))
    got = sorted(map(tuple, spark.read.parquet(path)
                     .select('vec_id', *['__c{}'.format(j) for j in range(8)],
                             'cell').collect()))
    assert got == want


def test_search_scorers_agree(spark, tmp_path, emb_q):
    # scorer='arrow' (literal-free kernels) and scorer='native' (pure
    # expressions) must be row-identical, incl. residual indexes
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, search_ivf_pq_index,
    )
    emb, q = emb_q
    for kwargs, name in [(dict(), 'plain'), (dict(residual=True), 'res'),
                         (dict(n_assign=2), 'ma')]:
        path = str(tmp_path / ('idx_sc_' + name))
        build_ivf_pq_index(emb, path, n_cells=16, m=8, ks=16, **kwargs)
        a = search_ivf_pq_index(spark, path, q, k=5, n_probe=4,
                                scorer='arrow')
        b = search_ivf_pq_index(spark, path, q, k=5, n_probe=4,
                                scorer='native')
        assert _rows(a) == _rows(b), name


def test_delete_tombstones_then_compact(spark, tmp_path, emb_q):
    # lifecycle: delete is immediately visible to search (tombstone
    # anti-join), idempotent, and compaction rewrites ONLY the affected
    # cell partitions while leaving results identical
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, compact_ivf_pq_index, delete_from_ivf_pq_index,
        search_ivf_pq_index,
    )
    from rbql_spark.ops.similarity import ivf_pq_ann_topk
    emb, q = emb_q
    path = str(tmp_path / 'idx_del')
    build_ivf_pq_index(emb, path, n_cells=16, m=8, ks=16)

    victims = emb.filter(F.col('vec_id') % 5 == 4).select('vec_id')
    n = delete_from_ivf_pq_index(spark, path, victims)
    assert n == victims.count()
    # double delete is idempotent at search time
    delete_from_ivf_pq_index(spark, path, victims)

    survivors = emb.filter(F.col('vec_id') % 5 != 4)
    want = ivf_pq_ann_topk(survivors, q, k=5, n_cells=16, n_probe=4)
    # frozen model vs survivor-trained model differ: compare via the
    # surviving-id invariant + both scorers instead
    got = search_ivf_pq_index(spark, path, q, k=5, n_probe=4)
    got_rows = _rows(got)
    assert len(got_rows) == 15
    dead = {r['vec_id'] for r in victims.collect()}
    assert not any(r[1] in dead for r in got_rows)
    assert _rows(search_ivf_pq_index(spark, path, q, k=5, n_probe=4,
                                     scorer='native')) == got_rows

    # compaction: physical rows drop, untouched cells keep their files
    import glob
    pre_files = {c: sorted(glob.glob(os.path.join(path, c, '*.parquet')))
                 for c in os.listdir(path) if c.startswith('cell=')}
    report = compact_ivf_pq_index(spark, path)
    assert report['rows_removed'] == victims.count()
    post = spark.read.parquet(path)
    assert post.join(victims, 'vec_id').count() == 0
    for c in (set(pre_files) -
              {'cell={}'.format(x) for x in report['cells_rewritten']}):
        assert sorted(glob.glob(os.path.join(path, c, '*.parquet'))) \
            == pre_files[c]
    # search results unchanged by compaction, and tombstones are gone
    assert _rows(search_ivf_pq_index(spark, path, q, k=5, n_probe=4)) \
        == got_rows
    assert not os.path.isdir(os.path.join(path, '_rbql_tombstones'))
    # second compaction is a no-op
    assert compact_ivf_pq_index(spark, path) == {
        'rows_removed': 0, 'cells_rewritten': []}
    del want  # frozen-model semantics documented above


def test_rebuild_if_imbalanced(spark, tmp_path, emb_q):
    from rbql_spark.ops.ann_index import (
        append_to_ivf_pq_index, build_ivf_pq_index, ivf_pq_index_stats,
        rebuild_if_imbalanced, search_ivf_pq_index,
    )
    emb, q = emb_q
    path = str(tmp_path / 'idx_rb')
    build_ivf_pq_index(emb, path, n_cells=8, m=8, ks=16)
    # balanced index: below threshold, no rebuild
    r = rebuild_if_imbalanced(spark, path, threshold=4.0)
    assert r['rebuilt'] is False and r['max_balance_ratio'] < 4.0

    # force a hot cell: append many near-copies of one vector (all land
    # in its cell under the frozen model)
    # 26 copies x 4 appends = ~100 extra rows in one cell of a
    # 500-row / 8-cell index (mean ~75 after) -> ratio > 2
    one = emb.filter(F.col('vec_id') == 0).select('vec_id', 'embedding')
    clones = one
    for i in range(1, 26):
        clones = clones.unionByName(
            one.select((F.col('vec_id') + 10000 * i).alias('vec_id'),
                       'embedding'))
    for _ in range(4):
        append_to_ivf_pq_index(clones, path)
    worst_before = ivf_pq_index_stats(spark, path) \
        .agg(F.max('balance_ratio').alias('m')).collect()[0]['m']
    r2 = rebuild_if_imbalanced(spark, path, threshold=1.5)
    assert r2['rebuilt'] is True
    assert r2['max_balance_ratio'] == pytest.approx(float(worst_before))
    # the retrained model spreads the hot mass: skew strictly improves
    worst_after = ivf_pq_index_stats(spark, path) \
        .agg(F.max('balance_ratio').alias('m')).collect()[0]['m']
    assert worst_after < float(worst_before)
    # index still serves correct-shape results after the rebuild
    res = search_ivf_pq_index(spark, path, q, k=5, n_probe=4).collect()
    assert len(res) == 15 and {r['query_id'] for r in res} == {0, 1, 2}


def test_pure_pq_rebuild_contract(spark, tmp_path, emb_q):
    # store_floats=False indexes cannot re-encode: the rebuild contract
    # is an explicit error pointing at the source corpus
    from rbql_spark.ops.ann_index import (
        append_to_ivf_pq_index, build_ivf_pq_index, rebuild_if_imbalanced,
    )
    emb, _ = emb_q
    path = str(tmp_path / 'idx_pp')
    build_ivf_pq_index(emb, path, n_cells=8, m=8, ks=16,
                       store_floats=False)
    one = emb.filter(F.col('vec_id') == 0).select('vec_id', 'embedding')
    clones = one
    for i in range(1, 26):
        clones = clones.unionByName(
            one.select((F.col('vec_id') + 10000 * i).alias('vec_id'),
                       'embedding'))
    for _ in range(4):
        append_to_ivf_pq_index(clones, path)
    with pytest.raises(ValueError, match='store_floats=False'):
        rebuild_if_imbalanced(spark, path, threshold=1.2)


def test_compact_fully_tombstoned_cell_not_resurrected(spark, tmp_path,
                                                       emb_q):
    # round-9 review regression: dynamic partition overwrite writes no
    # rows for a cell whose vectors were ALL deleted, so its files used
    # to survive compaction while the tombstones were cleared —
    # resurrecting every deleted vector
    from rbql_spark.ops.ann_index import (
        build_ivf_pq_index, compact_ivf_pq_index, delete_from_ivf_pq_index,
    )
    emb, _ = emb_q
    path = str(tmp_path / 'idx_cellkill')
    build_ivf_pq_index(emb, path, n_cells=8, m=8, ks=16)
    idx = spark.read.parquet(path)
    cell = int(idx.select('cell').first()['cell'])
    victim_ids = [r['vec_id'] for r in
                  idx.where(F.col('cell') == cell)
                     .select('vec_id').distinct().collect()]
    assert victim_ids
    victims = spark.createDataFrame([(v,) for v in victim_ids],
                                    'vec_id long')
    delete_from_ivf_pq_index(spark, path, victims)
    report = compact_ivf_pq_index(spark, path)
    assert report['rows_removed'] == len(victim_ids)
    post = spark.read.parquet(path)
    assert post.where(F.col('cell') == cell).count() == 0
    assert post.join(victims, 'vec_id').count() == 0
    assert not os.path.isdir(os.path.join(path, 'cell={}'.format(cell)))


def test_concurrent_compaction_lock(spark, tmp_path, emb_q):
    # two compactors racing the tombstone-clear swap: the second must
    # abort LOUDLY (ConcurrentCompactionError) before reading any state,
    # the winner's lock is released on every exit path, and a post-race
    # compaction still applies the tombstones correctly
    from rbql_spark.ops.ann_index import (
        ConcurrentCompactionError, _COMPACT_LOCK, build_ivf_pq_index,
        compact_ivf_pq_index, delete_from_ivf_pq_index,
    )
    emb, _ = emb_q
    path = str(tmp_path / 'idx_lock')
    build_ivf_pq_index(emb, path, n_cells=8, m=8, ks=16)
    victims = emb.filter(F.col('vec_id') % 7 == 3).select('vec_id')
    n_victims = victims.count()
    delete_from_ivf_pq_index(spark, path, victims)

    # simulate compactor A holding the lock (deterministic stand-in for
    # a true race: the loser's behavior is identical whichever thread
    # wins the O_EXCL create)
    lock = os.path.join(path, _COMPACT_LOCK)
    with open(lock, 'w') as fh:
        fh.write('pid=99999 host=other at=test')
    with pytest.raises(ConcurrentCompactionError) as exc:
        compact_ivf_pq_index(spark, path)
    assert _COMPACT_LOCK in str(exc.value)
    # the loser must not have touched the index: tombstones intact
    assert os.path.isdir(os.path.join(path, '_rbql_tombstones'))
    os.remove(lock)

    # with the lock released, compaction proceeds and releases its own
    # lock afterwards (no debris blocking the next run)
    report = compact_ivf_pq_index(spark, path)
    assert report['rows_removed'] == n_victims
    assert not os.path.exists(lock)
    assert spark.read.parquet(path).join(victims, 'vec_id').count() == 0
    # and the no-op follow-up also acquires/releases cleanly
    assert compact_ivf_pq_index(spark, path) == {
        'rows_removed': 0, 'cells_rewritten': []}
    assert not os.path.exists(lock)
