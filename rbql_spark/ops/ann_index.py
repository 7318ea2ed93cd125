"""Materialized ANN index: build an IVF-PQ index ONCE as cell-partitioned
parquet, then serve top-k queries against the stored index.

The in-plan operators (ops.similarity.ivf_pq_ann_topk & co.) derive the
index — cells, codes — inside every query's plan because the test corpus
is small.  A 100 TB deployment builds the index once and amortizes it
across queries; this module is that deployment shape, Spark-first:

  * the index is parquet PARTITIONED BY the coarse cell id, so a search
    reads ONLY its probed cells via partition pruning (the plan shows
    `PartitionFilters: [cell IN (...)]` — asserted in
    tests/test_plans.py).  With n_probe=4 of n_cells=1024, a query scans
    ~0.4% of the index bytes.
  * PQ codes are the stored scan payload (m uint8-sized ints per vector
    instead of dim floats); `store_floats=True` (default) additionally
    stores the raw embedding per row so the exact rescore reads floats
    from the SAME pruned partitions — no second full-corpus source.
  * the quantization model (coarse centroids + per-subspace codebooks +
    parameters) rides in a JSON sidecar; search loads it and rebuilds
    the exact scoring expressions, so `search_ivf_pq_index` returns
    row-identical results to `ivf_pq_ann_topk` at the same parameters
    (the equality test/gate) — the stored index is a cache, never a
    semantic fork.

Filesystem contract: maintenance paths (compaction staging, dead-cell
directory removal, tombstone clearing, meta sidecars) use driver-side
os/shutil operations — index `path`s must live on a filesystem the
DRIVER sees POSIX-style (local disk, NFS, or a FUSE mount of an object
store).  A bare s3a://-style URI would read/build fine through Spark
but leave staging/tombstone debris unmanaged; use a mounted path
instead.

Reference scope note: the reference engine (rbql_engine.py) has no ANN
surface; this is part of the deliberate large-scale superset.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rbql_spark.ops.similarity import (
    _cell_exprs,
    _pq_code_exprs,
    _pq_codebooks,
    _pq_codebooks_kmeans,
    _pq_codes_arrow,
    _train_centroids,
    cosine,
)

__all__ = ['build_ivf_pq_index', 'append_to_ivf_pq_index',
           'stream_append_to_ivf_pq_index', 'search_ivf_pq_index',
           'ivf_pq_index_stats', 'delete_from_ivf_pq_index',
           'compact_ivf_pq_index', 'rebuild_if_imbalanced']

_META_FILE = '_rbql_index_meta.json'
_TOMBSTONE_DIR = '_rbql_tombstones'

# bump when the stored layout or encoding semantics change, so cached
# index directories keyed on (data, version) are rebuilt rather than
# served stale
INDEX_FORMAT_VERSION = 1


def build_ivf_pq_index(corpus: DataFrame, path: str,
                       n_cells: int = 16, m: int = 8, ks: int = 16,
                       id_col: str = 'vec_id', vec_col: str = 'embedding',
                       seed: int = 42, quantizer: str = 'hash',
                       residual: bool = False, n_assign: int = 1,
                       store_floats: bool = True) -> dict:
    """Train the quantization model and write the cell-partitioned index.

    Layout: `path/cell=N/part-*.parquet` with columns (vec_id,
    __c0..__c{m-1}[, embedding]), plus `path/_rbql_index_meta.json`
    holding centroids/codebooks/params.  n_assign > 1 stores each vector
    under its n_assign nearest cells (index-side multiprobe — index
    storage ×n_assign, scan bytes per probe unchanged).  Returns the
    meta dict.

    One corpus scan: the fused Arrow kernel computes cells + codes
    (+ residual codes when residual=True) in a single pass; the write
    shuffles on nothing (partitionBy splits files inside the scan
    tasks' output).
    """
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    c = corpus.select(F.col(id_col).alias('vec_id'),
                      as_double(F.col(vec_col)).alias('__cv'))
    centroids = _train_centroids(c, n_cells, seed, quantizer)
    trainer = {'hash': _pq_codebooks, 'kmeans': _pq_codebooks_kmeans}[quantizer]
    books = trainer(c, m, ks, seed,
                    residual_centroids=centroids if residual else None)
    meta = {
        'kind': 'ivf_pq', 'n_cells': n_cells, 'm': m, 'ks': ks,
        'seed': seed, 'quantizer': quantizer, 'residual': residual,
        'n_assign': n_assign, 'store_floats': store_floats,
        'id_col': id_col, 'vec_col': vec_col,
        'centroids': centroids, 'books': books,
    }
    _encode_with_meta(corpus, meta).write.mode('overwrite') \
        .partitionBy('cell').parquet(path)
    with open(os.path.join(path, _META_FILE), 'w') as fh:
        json.dump(meta, fh)
    return meta


def _encode_with_meta(vectors: DataFrame, meta: dict) -> DataFrame:
    """Encode vectors with a STORED quantization model (no re-training):
    the same fused kernel pass as the build, frozen centroids/books."""
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    id_col, vec_col = meta['id_col'], meta['vec_col']
    c = vectors.select(F.col(id_col).alias('vec_id'),
                       as_double(F.col(vec_col)).alias('__cv'),
                       F.col(vec_col).alias('__raw'))
    coded = _pq_codes_arrow(c.select('vec_id', '__cv'), meta['books'],
                            centroids=meta['centroids'],
                            n_assign=max(1, meta['n_assign']),
                            residual=meta['residual'])
    cols = ['vec_id'] + ['__c{}'.format(j) for j in range(meta['m'])] + ['cell']
    if meta['store_floats']:
        coded = coded.join(c.select('vec_id', '__raw'), 'vec_id') \
                     .withColumnRenamed('__raw', vec_col)
        cols.append(vec_col)
    return coded.select(*cols)


def append_to_ivf_pq_index(vectors: DataFrame, path: str) -> int:
    """Incremental index growth: encode a NEW batch of vectors with the
    index's stored (frozen) quantization model and append it into the
    cell partitions — the ingest path of a deployed ANN index, where the
    model is trained once and new embeddings stream in.

    The appended rows carry exactly the codes the original build would
    have produced for them (same kernel, same frozen centroids/books —
    asserted in tests), so a search after N appends equals a search over
    an index built in one shot from the union WITH THE SAME MODEL.  Note
    the model does NOT retrain: as the corpus distribution drifts, recall
    decays the way any frozen IVF-PQ index's does — rebuild to re-center
    (FAISS semantics).  Caller is responsible for id uniqueness across
    appends (duplicate ids are two index entries, like any append-only
    store).  Returns the number of index rows appended.
    """
    from pyspark.storagelevel import StorageLevel

    with open(os.path.join(path, _META_FILE)) as fh:
        meta = json.load(fh)
    # persist around write+count: without it the count() re-executes the
    # whole encode (scan + kernel + store_floats join) a second time
    from rbql_spark.tuning import apply_plan_width
    coded = apply_plan_width(_encode_with_meta(vectors, meta)).persist(
        StorageLevel.MEMORY_AND_DISK)
    try:
        coded.write.mode('append').partitionBy('cell').parquet(path)
        return coded.count()
    finally:
        coded.unpersist()


def ivf_pq_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell occupancy report: (cell, n_rows, pct, balance_ratio) with
    balance_ratio = n_rows / mean-rows-per-cell.  The operational gauge
    for a deployed index: a hot cell (ratio ≫ 1, e.g. after appends under
    a drifted distribution) concentrates search I/O exactly the way a
    skewed join key concentrates a shuffle — the signal to rebuild with
    more cells or re-trained centroids (`rebuild_if_imbalanced` consumes
    exactly this report).  Counts are PHYSICAL rows: tombstoned-but-
    uncompacted rows are included, matching the scan bytes a search
    actually pays — run compact_ivf_pq_index first for live-row stats.
    One aggregation over the index (cells prune nothing here: stats read
    everything by design)."""
    idx = spark.read.parquet(path)
    counts = idx.groupBy('cell').agg(F.count(F.lit(1)).alias('n_rows'))
    tot = Window.partitionBy()
    return (counts
            .select('cell', 'n_rows',
                    F.round(F.col('n_rows') * 100.0
                            / F.sum('n_rows').over(tot), 2).alias('pct'),
                    F.round(F.col('n_rows')
                            / F.avg('n_rows').over(tot), 3)
                     .alias('balance_ratio'))
            .orderBy(F.col('n_rows').desc()))


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    """The index's live tombstone set (vec_id rows), or None if empty."""
    tdir = os.path.join(path, _TOMBSTONE_DIR)
    if not os.path.isdir(tdir) or not any(
            f.endswith('.parquet') or f == '_SUCCESS'
            for f in os.listdir(tdir)):
        return None
    return spark.read.parquet(tdir).select('vec_id').dropDuplicates()


def delete_from_ivf_pq_index(spark: SparkSession, path: str,
                             ids) -> int:
    """Logical deletion: record the given vec_ids as TOMBSTONES next to
    the index (`path/_rbql_tombstones/`, plain parquet).  Search
    anti-joins the tombstone set after partition pruning, so deleted
    vectors stop appearing immediately without rewriting any index
    partition — the right trade for frequent small deletes on a 100 TB
    index, where a physical rewrite per delete would dominate.

    `ids` is a DataFrame with a vec_id column (preferred — stays
    distributed) or a Python list of ids.  Deleting an id that is not in
    the index is a no-op at search time; deleting twice is idempotent
    (the tombstone set is deduplicated on read).  The physical rows are
    reclaimed by `compact_ivf_pq_index`; until then, index stats and
    scan bytes still include the dead rows — the documented cost of the
    tombstone contract.  Returns the number of tombstone ids written.
    """
    if not isinstance(ids, DataFrame):
        ids = [(i,) for i in ids]
        if not ids:
            return 0
        idx_sample = spark.read.parquet(path).select('vec_id').limit(1)
        vid_type = dict(idx_sample.dtypes)['vec_id']
        ids = spark.createDataFrame(ids, 'vec_id {}'.format(vid_type))
    from pyspark.storagelevel import StorageLevel

    # persist around write+count: without it the count re-executes the
    # ids plan after the write, so a non-deterministic ids frame could
    # report a different number than was actually written (and the
    # upstream job runs twice either way)
    tomb = ids.select('vec_id').dropDuplicates() \
              .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = tomb.count()
        tomb.write.mode('append').parquet(os.path.join(path, _TOMBSTONE_DIR))
    finally:
        tomb.unpersist()
    return n


_COMPACT_LOCK = '_rbql_compact.lock'


class ConcurrentCompactionError(RuntimeError):
    """Another compaction holds the index's compaction lock."""


class _compaction_lock:
    """Exclusive per-index compaction lock (O_CREAT|O_EXCL on a lock file
    inside the index dir — atomic on POSIX filesystems, which is the
    module's filesystem contract).

    The per-run staging suffix already stops two concurrent compactions
    from corrupting each other's staged survivors, but they still raced
    on the final meta swap: both would dynamic-overwrite cell partitions
    and clear the tombstone dir, and last-wins silently dropped the other
    run's tombstone application.  With the lock, the loser aborts LOUDLY
    (ConcurrentCompactionError) before reading any state.  The lock file
    records pid/host/time for the operator; it is removed on every exit
    path short of a hard kill — after a kill -9 mid-compaction, delete
    `<index>/_rbql_compact.lock` manually once no compactor is running.
    """

    def __init__(self, path: str):
        self.lock_path = os.path.join(path, _COMPACT_LOCK)

    def __enter__(self):
        import socket
        import time as _time
        try:
            fd = os.open(self.lock_path,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(self.lock_path) as fh:
                    holder = fh.read().strip()
            except OSError:
                holder = '<unreadable>'
            raise ConcurrentCompactionError(
                'another compaction holds {} ({}); wait for it, or delete '
                'the lock file if its process crashed'.format(
                    self.lock_path, holder))
        with os.fdopen(fd, 'w') as fh:
            fh.write('pid={} host={} at={}'.format(
                os.getpid(), socket.gethostname(),
                _time.strftime('%Y-%m-%dT%H:%M:%S')))
        return self

    def __exit__(self, *exc):
        try:
            os.remove(self.lock_path)
        except OSError:
            pass
        return False


def compact_ivf_pq_index(spark: SparkSession, path: str) -> dict:
    """Physically apply the tombstone set: rewrite ONLY the cell
    partitions that contain tombstoned rows (dynamic partition
    overwrite), then clear the tombstones.  Untouched cells keep their
    files byte-for-byte — at scale a compaction touches n_affected /
    n_cells of the index, not all of it.

    Returns {'rows_removed': n, 'cells_rewritten': [...]}.  No-op (and
    empty report) when there are no tombstones.  Exclusive per index:
    a second concurrent compaction raises ConcurrentCompactionError
    instead of racing this one on the tombstone-clear swap.
    """
    import shutil

    with _compaction_lock(path):
        return _compact_locked(spark, path, shutil)


def _compact_locked(spark: SparkSession, path: str, shutil) -> dict:
    tomb = _tombstones(spark, path)
    if tomb is None:
        return {'rows_removed': 0, 'cells_rewritten': []}
    idx = spark.read.parquet(path)
    # one scan bounded to matching rows: which cells hold dead rows?
    dead = (idx.join(F.broadcast(tomb), 'vec_id')
               .groupBy('cell').agg(F.count(F.lit(1)).alias('__n'))
               .collect())
    cells = sorted(int(r['cell']) for r in dead)
    removed = int(sum(r['__n'] for r in dead))
    if cells:
        # stage survivors to a sibling dir BEFORE overwriting the source
        # (the __rebuild_src pattern).  A cached frame is not enough:
        # executor loss evicts both memory and disk cache, and the
        # lineage recompute would re-read the partially-replaced source
        # mid-write.  The parquet staging write severs lineage entirely.
        # per-run staging suffix: with a FIXED sibling path, two
        # concurrent compactions of the same index would overwrite each
        # other's staged survivors mid-run — silent data corruption
        # instead of a write conflict.  (Concurrent compaction remains
        # unsupported; the token turns the silent case back into a loud
        # one and keeps crash debris distinguishable per run.)
        import uuid
        tmp = '{}__compact_src_{}'.format(path.rstrip('/'),
                                          uuid.uuid4().hex[:12])
        try:
            (idx.where(F.col('cell').isin(cells))
                .join(F.broadcast(tomb), 'vec_id', 'left_anti')
                .select(*[c for c in idx.columns])
                .write.mode('overwrite').parquet(tmp))
            survivors = spark.read.parquet(tmp)
            with _partition_overwrite_dynamic(spark):
                (survivors.write.mode('overwrite').partitionBy('cell')
                          .parquet(path))
            # dynamic overwrite only replaces partitions PRESENT in the
            # written frame: a cell whose rows were ALL tombstoned has
            # zero survivors, its files would outlive the write, and
            # clearing the tombstones below would resurrect the deleted
            # vectors — remove such cell directories explicitly
            live_cells = {int(r['cell']) for r in
                          survivors.select('cell').distinct().collect()}
            for dead_cell in set(cells) - live_cells:
                shutil.rmtree(
                    os.path.join(path, 'cell={}'.format(dead_cell)),
                    ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(path, _TOMBSTONE_DIR), ignore_errors=True)
    return {'rows_removed': removed, 'cells_rewritten': cells}


class _partition_overwrite_dynamic:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic: overwrite
    replaces only the partitions present in the written frame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        conf = self.spark.conf
        self.prev = conf.get('spark.sql.sources.partitionOverwriteMode',
                             'static')
        conf.set('spark.sql.sources.partitionOverwriteMode', 'dynamic')

    def __exit__(self, *exc):
        self.spark.conf.set('spark.sql.sources.partitionOverwriteMode',
                            self.prev)
        return False


def rebuild_if_imbalanced(spark: SparkSession, path: str,
                          threshold: float = 4.0) -> dict:
    """Consume `ivf_pq_index_stats`: when the hottest cell exceeds
    `threshold` × the mean cell occupancy (the hot-cell signal appends
    under a drifted distribution produce), RETRAIN the quantization model
    on the current live vectors and rebuild the index in place — the
    documented answer to "an index you can only grow".

    Requires `store_floats=True` at build time (the raw embeddings are
    re-read from the index itself; a pure-PQ index cannot re-encode and
    raises with that contract spelled out).  Compaction runs first so the
    balance reading and the retraining corpus exclude tombstoned rows.
    Returns {'rebuilt': bool, 'max_balance_ratio': x, 'threshold': t}.
    """
    with open(os.path.join(path, _META_FILE)) as fh:
        meta = json.load(fh)
    compact_ivf_pq_index(spark, path)
    stats = ivf_pq_index_stats(spark, path)
    worst = stats.agg(F.max('balance_ratio').alias('m')).collect()[0]['m']
    worst = float(worst if worst is not None else 0.0)
    if worst <= threshold:
        return {'rebuilt': False, 'max_balance_ratio': worst,
                'threshold': threshold}
    if not meta['store_floats']:
        raise ValueError(
            'rebuild_if_imbalanced needs the raw embeddings, but this '
            'index was built with store_floats=False (pure-PQ codes '
            'cannot be re-encoded under a new model). Rebuild contract '
            'for pure-PQ indexes: re-run build_ivf_pq_index from the '
            'source corpus.')
    vec_col = meta['vec_col']
    live = (spark.read.parquet(path)
                 .select(F.col('vec_id').alias(meta['id_col']),
                         F.col(vec_col))
                 .dropDuplicates([meta['id_col']]))  # n_assign copies
    # materialize the retraining corpus OUTSIDE the index dir before the
    # overwrite destroys its own input
    tmp = path.rstrip('/') + '__rebuild_src'
    live.write.mode('overwrite').parquet(tmp)
    try:
        src = spark.read.parquet(tmp)
        build_ivf_pq_index(
            src, path, n_cells=meta['n_cells'], m=meta['m'],
            ks=meta['ks'], id_col=meta['id_col'], vec_col=vec_col,
            seed=meta['seed'], quantizer=meta['quantizer'],
            residual=meta['residual'], n_assign=meta['n_assign'],
            store_floats=True)
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return {'rebuilt': True, 'max_balance_ratio': worst,
            'threshold': threshold}


def stream_append_to_ivf_pq_index(vectors: DataFrame, path: str,
                                  checkpoint_dir: str,
                                  query_name: str = 'rbql_ann_ingest'):
    """Streaming embedding ingest into a deployed index: each micro-batch
    encodes under the stored frozen model and appends into the cell
    partitions — `append_to_ivf_pq_index` as a `foreachBatch` sink, so
    searches see new vectors one trigger after they arrive.

    `checkpoint_dir` is the streaming checkpoint (offsets) — batch
    replays after a crash re-encode deterministically, but the parquet
    append itself is at-least-once across crash/retry windows, like any
    foreachBatch file append: deduplicate by id downstream, or compact
    periodically, if exactly-once index rows matter.  Returns the
    StreamingQuery (caller awaits/stops).
    """
    with open(os.path.join(path, _META_FILE)) as fh:
        meta = json.load(fh)

    def sink(batch_df, batch_id):
        _encode_with_meta(batch_df, meta).write.mode('append') \
            .partitionBy('cell').parquet(path)

    return (vectors.writeStream
            .foreachBatch(sink)
            .option('checkpointLocation', checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start())


def search_ivf_pq_index(spark: SparkSession, path: str, queries: DataFrame,
                        k: int = 10, n_probe: int = 4,
                        rescore_factor: int = 4,
                        query_id_col: str = 'query_id',
                        scorer: str = 'arrow') -> DataFrame:
    """Top-k cosine search against a stored index → (query_id, vec_id,
    cosine_sim, rank), row-identical to ivf_pq_ann_topk at the build's
    parameters (equality-tested).

    The probed cell ids are computed from the (broadcast-sized) query
    set and collected into an IN-list literal, so the parquet source
    prunes to the probed partitions before any I/O — the scan's
    PartitionFilters carry the cell list.  ADC scoring and the exact
    rescore both read from those pruned partitions only.

    scorer='arrow' (default) probes and ADC-scores through numpy kernels
    with the model shipped as task data, so NO centroid/codebook literal
    reaches the plan.  This is a per-QUERY-call latency lever, not just
    a plan-size one: inline literals cost seconds of Catalyst
    analysis/codegen on EVERY fresh search plan (measured ~4s at
    n_cells=16 × dim=64 × m=8 × ks=16), which an amortized index exists
    to avoid; the arrow path analyzes in milliseconds.  scorer='native'
    keeps the pure-expression plan (zero Python stages).

    Rescore precision: with store_floats the shortlist rescores against
    the stored raw floats (exact); without, ranking stays in ADC order
    (pure-PQ index, FAISS-style) and `cosine_sim` is the PQ similarity.
    """
    with open(os.path.join(path, _META_FILE)) as fh:
        meta = json.load(fh)
    m, centroids, books = meta['m'], meta['centroids'], meta['books']
    vec_col = meta['vec_col']
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    q = queries.select(F.col(query_id_col).alias('query_id'),
                       as_double(F.col(vec_col)).alias('__qv'))

    if scorer == 'arrow':
        return _search_arrow(spark, path, q, meta, k=k, n_probe=n_probe,
                             rescore_factor=rescore_factor)

    _, _probe_cells = _cell_exprs(centroids, n_probe)
    probed = q.select('query_id',
                      F.explode(_probe_cells(F.col('__qv'))).alias('cell'),
                      F.col('__qv'),
                      (F.aggregate(F.transform(F.col('__qv'), lambda x: x * x),
                                   F.lit(0.0), lambda a, v: a + v))
                      .alias('__qn2'))
    cells = sorted({r['cell'] for r in
                    probed.select('cell').distinct().collect()})

    # literal IN-list → PartitionFilters on the cell directory column:
    # only the probed partitions are listed/read
    idx = spark.read.parquet(path).where(F.col('cell').isin(cells))
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # logically-deleted vectors (bounded between compactions) drop
        # out right after the pruned scan
        idx = idx.join(F.broadcast(tomb), 'vec_id', 'left_anti')

    _code, _recon = _pq_code_exprs(books)
    recon = _recon([F.col('__c{}'.format(j)) for j in range(m)])
    if meta['residual']:
        cent_lit = F.array(*[F.array(*[F.lit(float(x)) for x in cv])
                             for cv in centroids])
        recon = F.zip_with(F.element_at(cent_lit, F.col('cell') + 1), recon,
                           lambda x, y: x + y)
    decoded = (idx.select('vec_id', 'cell', recon.alias('__rv'),
                          *([vec_col] if meta['store_floats'] else []))
                  .select('vec_id', 'cell', '__rv',
                          (F.aggregate(F.transform(F.col('__rv'),
                                                   lambda x: x * x),
                                       F.lit(0.0), lambda a, v: a + v))
                          .alias('__rn2'),
                          *([vec_col] if meta['store_floats'] else [])))

    pair_sim = F.when(
        (F.col('__rn2') > 0) & (F.col('__qn2') > 0),
        F.round(F.aggregate(F.zip_with(F.col('__rv'), F.col('__qv'),
                                       lambda x, y: x * y),
                            F.lit(0.0), lambda a, v: a + v)
                / (F.sqrt(F.col('__rn2')) * F.sqrt(F.col('__qn2'))), 6)
    ).otherwise(F.lit(-1.0))
    scored = (decoded.join(F.broadcast(probed), 'cell')
                     .select('query_id', 'vec_id',
                             pair_sim.alias('pq_sim'),
                             *([vec_col] if meta['store_floats'] else [])))
    if meta['n_assign'] > 1:
        # residual copies carry per-cell codes → per-copy pq_sims; reduce
        # deterministically with max() (see ivf_pq_ann_topk).  The stored
        # floats are identical across copies, so first() is value-stable.
        scored = (scored.groupBy('query_id', 'vec_id')
                        .agg(F.max('pq_sim').alias('pq_sim'),
                             *([F.first(vec_col).alias(vec_col)]
                               if meta['store_floats'] else [])))

    # the pruned-cell candidate set is a corpus fraction per query —
    # rank via the salted two-phase topk_per_group, never one partition
    # per query (the final rescore window stays over the bounded
    # shortlist)
    from .skew import topk_per_group
    _order = [F.col('pq_sim').desc(), F.col('vec_id').asc()]
    if not meta['store_floats']:
        return (topk_per_group(scored, int(k), ['query_id'], _order,
                               salt_key=F.col('vec_id'))
                .select('query_id', 'vec_id',
                        F.col('pq_sim').alias('cosine_sim'), 'rank')
                .orderBy('query_id', 'rank'))

    shortlist = (topk_per_group(scored, int(k * rescore_factor),
                                ['query_id'], _order,
                                salt_key=F.col('vec_id'), rank_name='rq')
                 .select('query_id', 'vec_id',
                         as_double(F.col(vec_col)).alias('__cv')))
    rescored = (shortlist.join(F.broadcast(q), 'query_id')
                .select('query_id', 'vec_id',
                        F.round(cosine(F.col('__cv'), F.col('__qv')), 6)
                         .alias('cosine_sim')))
    w = Window.partitionBy('query_id').orderBy(F.col('cosine_sim').desc(),
                                               F.col('vec_id').asc())
    return (rescored.withColumn('rank', F.row_number().over(w))
                    .filter(F.col('rank') <= k)
                    .select('query_id', 'vec_id', 'cosine_sim', 'rank')
                    .orderBy('query_id', 'rank'))


def _search_arrow(spark: SparkSession, path: str, q: DataFrame, meta: dict,
                  k: int, n_probe: int, rescore_factor: int) -> DataFrame:
    """Literal-free search path: probe cells via numpy on the collected
    query set (broadcast-sized by contract), ADC-score the pruned index
    partitions in ONE mapInPandas kernel (codes → codebook gather →
    matmul vs the query matrix, masked to each query's probe set), then
    the usual shortlist window + float rescore.  Same rounding/tie rules
    as the native path — row-identical (tested)."""
    import numpy as np

    from rbql_spark.ops.similarity import _round6_np

    m, books = meta['m'], meta['books']
    centroids = meta['centroids']
    vec_col = meta['vec_col']
    qrows = q.collect()
    if not qrows:
        schema = 'query_id string, vec_id string, cosine_sim double, rank int'
        return spark.createDataFrame([], schema)
    qids = [r['query_id'] for r in qrows]
    Q = np.asarray([[float(x) for x in r['__qv']] for r in qrows])
    C = np.asarray(centroids, dtype=np.float64)
    ccn = np.sqrt(np.einsum('ij,ij->i', C, C))
    denom = np.outer(np.sqrt(np.einsum('ij,ij->i', Q, Q)), ccn)
    with np.errstate(divide='ignore', invalid='ignore'):
        sims = _round6_np((Q @ C.T) / denom)
    sims = np.where(denom > 0, sims, -1.0)
    probe_sets = np.argsort(-sims, axis=1, kind='stable')[:, :n_probe]
    cells = sorted({int(c) for row in probe_sets for c in row})

    idx = spark.read.parquet(path).where(F.col('cell').isin(cells))
    tomb = _tombstones(spark, path)
    if tomb is not None:
        idx = idx.join(F.broadcast(tomb), 'vec_id', 'left_anti')
    code_cols = ['__c{}'.format(j) for j in range(m)]
    payload = idx.select('vec_id', 'cell', *code_cols)
    vid_type = dict(payload.dtypes)['vec_id']
    qid_type = dict(q.dtypes)['query_id']
    cb = [np.asarray(b, dtype=np.float64) for b in books]
    qn = np.sqrt(np.einsum('ij,ij->i', Q, Q))
    residual = bool(meta['residual'])
    psets = [np.asarray(row) for row in probe_sets]
    out_schema = 'query_id {}, vec_id {}, pq_sim double'.format(
        qid_type, vid_type)

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.stack([pdf[c].to_numpy() for c in code_cols], axis=1)
            R = np.concatenate([cb[j][codes[:, j]] for j in range(m)], axis=1)
            bcells = pdf['cell'].to_numpy()
            if residual:
                R = R + C[bcells]
            rn = np.sqrt(np.einsum('ij,ij->i', R, R))
            vids = pdf['vec_id'].to_numpy()
            qi_out, vi_out, s_out = [], [], []
            for qi in range(len(qids)):
                mask = np.isin(bcells, psets[qi])
                if not mask.any():
                    continue
                dn = rn[mask] * qn[qi]
                with np.errstate(divide='ignore', invalid='ignore'):
                    s = _round6_np((R[mask] @ Q[qi]) / dn)
                s = np.where(dn > 0, s, -1.0)
                qi_out.append(np.full(int(mask.sum()), qids[qi]))
                vi_out.append(vids[mask])
                s_out.append(s)
            if qi_out:
                yield pd.DataFrame({'query_id': np.concatenate(qi_out),
                                    'vec_id': np.concatenate(vi_out),
                                    'pq_sim': np.concatenate(s_out)})

    scored = payload.mapInPandas(score, schema=out_schema)
    if meta['n_assign'] > 1:
        # deterministic reduction over cell copies (residual codes are
        # per-cell — see ivf_pq_ann_topk)
        scored = (scored.groupBy('query_id', 'vec_id')
                        .agg(F.max('pq_sim').alias('pq_sim')))
    # candidate-set rank via topk_per_group (see search_ivf_pq_index)
    from .skew import topk_per_group
    _order = [F.col('pq_sim').desc(), F.col('vec_id').asc()]
    if not meta['store_floats']:
        return (topk_per_group(scored, int(k), ['query_id'], _order,
                               salt_key=F.col('vec_id'))
                .select('query_id', 'vec_id',
                        F.col('pq_sim').alias('cosine_sim'), 'rank')
                .orderBy('query_id', 'rank'))
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    shortlist = (topk_per_group(scored, int(k * rescore_factor),
                                ['query_id'], _order,
                                salt_key=F.col('vec_id'), rank_name='rq')
                 .select('query_id', 'vec_id'))
    floats = idx.select('vec_id', as_double(F.col(vec_col)).alias('__cv'))
    if meta['n_assign'] > 1:
        # multi-assigned vectors appear once per cell copy — one float
        # row per vec_id for the rescore
        floats = floats.dropDuplicates(['vec_id'])
    rescored = (floats.join(F.broadcast(shortlist), 'vec_id')
                .join(F.broadcast(q), 'query_id')
                .select('query_id', 'vec_id',
                        F.round(cosine(F.col('__cv'), F.col('__qv')), 6)
                         .alias('cosine_sim')))
    w = Window.partitionBy('query_id').orderBy(F.col('cosine_sim').desc(),
                                               F.col('vec_id').asc())
    return (rescored.withColumn('rank', F.row_number().over(w))
                    .filter(F.col('rank') <= k)
                    .select('query_id', 'vec_id', 'cosine_sim', 'rank')
                    .orderBy('query_id', 'rank'))
