"""Deterministic sharded export (superset op, SURVEY §2.8): the
"materialize the training set" step — content-hash shard assignment, a
value-checkable per-shard manifest, and the parquet writer that lays the
shards out on disk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD31 = (1 << 31)


def _h32(col: Column) -> Column:
    """32-bit md5-derived hash (first 8 hex chars) — engine-portable."""
    return F.conv(F.substring(F.md5(F.encode(col, 'utf-8')), 1, 8),
                  16, 10).cast('long')


def shard_assign(df: DataFrame, n_shards: int,
                 key_col: str = 'doc_id') -> DataFrame:
    """Add a `shard` column: md5(key) mod n_shards — a pure function of
    the data, so the same corpus always shards identically regardless of
    cluster size or partitioning (unlike hash-partition file layout,
    which follows the physical plan)."""
    return df.withColumn(
        'shard', _h32(F.col(key_col).cast('string')) % int(n_shards))


def shard_manifest(df: DataFrame, n_shards: int,
                   key_col: str = 'doc_id',
                   content_cols: list[str] | None = None) -> DataFrame:
    """Per-shard manifest: (shard, n_rows, content_checksum) where the
    checksum is the mod-2^31 sum of each row's md5-32 digest over
    key + content columns — order-independent, so it verifies a shard's
    CONTENT no matter how the rows were written or later re-read, and
    any engine can recompute it (the DuckDB oracle does).

    Scale shape: one scan, one partial+final aggregation on the (tiny)
    shard key; the digest sum is exact integer math.
    """
    cols = content_cols if content_cols is not None else \
        [c for c in df.columns if c != key_col]
    payload = F.concat_ws(
        ':', F.col(key_col).cast('string'),
        *[F.coalesce(F.col(c).cast('string'), F.lit('')) for c in cols])
    return (shard_assign(df, n_shards, key_col)
            .select('shard', _h32(payload).alias('__d'))
            .groupBy('shard')
            .agg(F.count(F.lit(1)).alias('n_rows'),
                 (F.sum('__d') % _MOD31).cast('long').alias('content_checksum'))
            .orderBy('shard'))


def write_sharded(df: DataFrame, path: str, n_shards: int,
                  key_col: str = 'doc_id',
                  content_cols: list[str] | None = None) -> DataFrame:
    """Write the corpus as parquet partitioned by content-hash shard
    (path/shard=N/...) and return the manifest for the written data.
    Readers prune to single shards via partition pruning on `shard`; the
    returned manifest lets any downstream verify each shard's content
    survived the copy (recompute shard_manifest over the re-read data
    and compare)."""
    assigned = shard_assign(df, n_shards, key_col)
    assigned.write.mode('overwrite').partitionBy('shard').parquet(path)
    back = assigned.sparkSession.read.parquet(path)
    return shard_manifest(back.drop('shard'), n_shards, key_col, content_cols)


def write_webdataset(df: DataFrame, path: str, n_shards: int,
                     key_col: str = 'doc_id', text_col: str = 'text',
                     meta_cols: list[str] | None = None,
                     binary_col: str | None = None) -> DataFrame:
    """Write the corpus as WebDataset-style tar shards (the public
    webdataset convention: one `.tar` per shard, each sample a group of
    `{key}.{ext}` members — `.txt` for the text, `.json` for metadata,
    `.bin` for an optional binary payload) and return the per-shard
    manifest (shard, n_samples, tar_bytes).

    Scale shape: content-hash shard assignment (shard_assign — a pure
    function of the key, layout-independent), ONE shuffle
    (repartition(n_shards, shard) puts every row of a shard in exactly
    one task) + an in-partition sort by (shard, key), then a streaming
    Arrow pass that appends each batch to the current shard's tar —
    worker memory is one Arrow batch + one open file handle, never a
    shard.  Tar bytes are DETERMINISTIC (USTAR, mtime=0, uid/gid=0,
    sorted members), so reruns are byte-identical and task retries
    converge on the same file.

    `path` must be writable by every executor and the driver (local or
    fused filesystem — the ops/ann_index.py contract); shard count sizes
    the tars: aim for 100 MB–1 GB per shard at corpus scale.  Null text/
    metadata serialize as empty strings.  Empty shards write no tar and
    emit no manifest row.
    """
    import glob as _glob
    import os

    meta_cols = list(meta_cols or [])
    cols = [key_col, text_col] + meta_cols + \
        ([binary_col] if binary_col else [])
    assigned = (shard_assign(df.select(*cols), n_shards, key_col)
                .withColumn('__k', F.col(key_col).cast('string'))
                .repartition(n_shards, 'shard')
                .sortWithinPartitions('shard', '__k'))

    os.makedirs(path, exist_ok=True)
    for old in _glob.glob(os.path.join(path, 'shard-*.tar')):
        os.remove(old)

    def _write(batches):
        import io
        import json
        import tarfile

        import pandas as pd

        cur = {'shard': None, 'tar': None, 'fh': None, 'n': 0}

        def _close():
            if cur['tar'] is not None:
                cur['tar'].close()
                cur['fh'].close()
                size = os.path.getsize(cur['path'])
                row = pd.DataFrame([{'shard': int(cur['shard']),
                                     'n_samples': int(cur['n']),
                                     'tar_bytes': int(size)}])
                cur['tar'] = None
                return row
            return None

        def _add(tar, name, payload: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ''
            info.mode = 0o644
            tar.addfile(info, io.BytesIO(payload))

        for pdf in batches:
            for _, r in pdf.iterrows():
                sh = int(r['shard'])
                if sh != cur['shard']:
                    done = _close()
                    if done is not None:
                        yield done
                    p = os.path.join(path, 'shard-{:05d}.tar'.format(sh))
                    cur.update(shard=sh, path=p, n=0,
                               fh=open(p, 'wb'))
                    cur['tar'] = tarfile.open(
                        fileobj=cur['fh'], mode='w',
                        format=tarfile.USTAR_FORMAT)
                key = str(r['__k'])
                text = r[text_col]
                _add(cur['tar'], key + '.txt',
                     ('' if text is None else str(text)).encode('utf-8'))
                if meta_cols:
                    meta = {m: (None if pd.isna(r[m]) else
                                (r[m].item() if hasattr(r[m], 'item')
                                 else r[m]))
                            for m in meta_cols}
                    _add(cur['tar'], key + '.json',
                         json.dumps(meta, sort_keys=True,
                                    default=str).encode('utf-8'))
                if binary_col is not None and r[binary_col] is not None:
                    _add(cur['tar'], key + '.bin', bytes(r[binary_col]))
                cur['n'] += 1
        done = _close()
        if done is not None:
            yield done

    manifest = assigned.mapInPandas(
        _write, schema='shard int, n_samples long, tar_bytes long')
    # materialize the write; n_shards rows come back — bounded
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(
        rows, 'shard int, n_samples long, tar_bytes long')


def read_webdataset(spark, path: str, key_col: str = 'doc_id',
                    text_col: str = 'text',
                    with_meta: bool = False,
                    with_binary: bool = False) -> DataFrame:
    """Read WebDataset tar shards written by write_webdataset back into
    (key, text[, meta_json][, bin]) rows — the loader side of the
    convention, one Spark task per tar (binaryFile source), members
    regrouped by sample key in a streaming untar.

    Each task holds one whole tar in memory (the binaryFile contract —
    same as real webdataset loaders that stream a shard per worker), so
    shard size must fit executor memory; write_webdataset's n_shards
    sizing note applies.
    """
    import os

    bins = (spark.read.format('binaryFile')
            .load(os.path.join(path, 'shard-*.tar'))
            .select('content'))

    fields = ['{} string'.format(key_col), '{} string'.format(text_col)]
    if with_meta:
        fields.append('meta_json string')
    if with_binary:
        fields.append('bin binary')
    schema = ', '.join(fields)

    def _extract(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            for content in pdf['content']:
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        base, ext = m.name.rsplit('.', 1)
                        if base not in samples:
                            samples[base] = {}
                            order.append(base)
                        samples[base][ext] = tf.extractfile(m).read()
                out = []
                for base in order:
                    s = samples[base]
                    row = {key_col: base,
                           text_col: s.get('txt', b'').decode('utf-8')}
                    if with_meta:
                        row['meta_json'] = (
                            s['json'].decode('utf-8') if 'json' in s
                            else None)
                    if with_binary:
                        row['bin'] = s.get('bin')
                    out.append(row)
                if out:
                    yield pd.DataFrame(out)

    return bins.mapInPandas(_extract, schema=schema)


def verify_shards(df: DataFrame, manifest: DataFrame, n_shards: int,
                  key_col: str = 'doc_id',
                  content_cols: list[str] | None = None) -> bool:
    """True iff the corpus' recomputed manifest equals `manifest`
    (driver-side compare of n_shards rows — bounded)."""
    got = {tuple(r) for r in
           shard_manifest(df, n_shards, key_col, content_cols).collect()}
    want = {tuple(r) for r in manifest.collect()}
    return got == want
