"""Similarity search over embedding columns (array<float>).

Superset operators (SURVEY §2.8) designed scale-first:

  * cosine_topk_bruteforce — exact top-k: broadcast the (small) query set,
    score every corpus vector with native array expressions
    (zip_with + aggregate → JVM, no Python), rank per query with a
    hash-partitioned window.  The corpus side streams — O(corpus × queries)
    compute but no corpus shuffle.
  * lsh_ann_topk — random-hyperplane LSH: bucket corpus and queries by sign
    bits, join on bucket (optionally multi-probe), exact-rescore candidates.
    The scale path: corpus scored once per matching bucket instead of per
    query.
  * embedding_near_dup_pairs — near-duplicate vectors via bucketed cosine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 10,
                           id_col: str = 'vec_id', vec_col: str = 'embedding',
                           query_id_col: str = 'query_id') -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding).  Result: (query_id, vec_id, cosine_sim)
    with rank ≤ k, deterministic tie-break on vec_id.
    """
    as_double = lambda c: F.transform(c, lambda x: x.cast('double'))  # noqa: E731
    c = corpus.select(F.col(id_col).alias('vec_id'), as_double(F.col(vec_col)).alias('__cv'))
    q = queries.select(F.col(query_id_col).alias('query_id'), as_double(F.col(vec_col)).alias('__qv'))
    scored = (c.join(F.broadcast(q))
               .select('query_id', 'vec_id',
                       F.round(cosine(F.col('__cv'), F.col('__qv')), 6).alias('cosine_sim')))
    # rank on the ROUNDED similarity (+ vec_id) so rankings are reproducible
    # across engines/float orders
    w = Window.partitionBy('query_id').orderBy(F.col('cosine_sim').desc(), F.col('vec_id').asc())
    return (scored.withColumn('rank', F.row_number().over(w))
                  .filter(F.col('rank') <= k)
                  .select('query_id', 'vec_id', 'cosine_sim', 'rank')
                  .orderBy('query_id', 'rank'))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes — native array math."""
    bucket = F.lit(0).cast('long')
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1).cast('long')).otherwise(F.lit(0).cast('long'))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 dim: int = 32, n_planes: int = 8, n_tables: int = 4,
                 id_col: str = 'vec_id', vec_col: str = 'embedding',
                 query_id_col: str = 'query_id', seed: int = 42) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact rescore.

    Each of n_tables hash tables buckets vectors by n_planes sign bits; a
    query's candidates are corpus vectors sharing its bucket in ANY table.
    Shuffle pattern: corpus explodes ×n_tables, hash join on (table, bucket).

    ALL n_tables bucket ids are computed in ONE projection per side
    (explode over an array of (table, bucket) structs) — Spark does not
    reuse FileScans across union branches, so the per-table-branch shape
    would read the corpus n_tables times (n_tables full scans of a 100 TB
    embeddings table).  One scan, same rows, same result.
    """
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    c = corpus.select(F.col(id_col).alias('vec_id'), as_double(F.col(vec_col)).alias('__cv'))
    q = queries.select(F.col(query_id_col).alias('query_id'), as_double(F.col(vec_col)).alias('__qv'))
    table_planes = [_hyperplanes(dim, n_planes, seed=seed + 1000 * t)
                    for t in range(n_tables)]

    def _table_buckets(vec: Column) -> Column:
        return F.explode(F.array(*[
            F.struct(F.lit(t).alias('table'),
                     _bucket_expr(vec, planes).alias('bucket'))
            for t, planes in enumerate(table_planes)]))

    cb = (c.select('vec_id', '__cv', _table_buckets(F.col('__cv')).alias('tb'))
           .select('vec_id', '__cv', 'tb.table', 'tb.bucket'))
    qb = (q.select('query_id', '__qv', _table_buckets(F.col('__qv')).alias('tb'))
           .select('query_id', '__qv', 'tb.table', 'tb.bucket'))
    cand = (cb.join(F.broadcast(qb), on=['table', 'bucket'])
              .select('query_id', 'vec_id', '__cv', '__qv')
              .dropDuplicates(['query_id', 'vec_id']))
    # rank on the ROUNDED similarity (+ vec_id) so rankings are reproducible
    # across engines/float orders — same policy as cosine_topk_bruteforce
    w = Window.partitionBy('query_id').orderBy(F.col('cosine_sim').desc(), F.col('vec_id').asc())
    return (cand.select('query_id', 'vec_id',
                        F.round(cosine(F.col('__cv'), F.col('__qv')), 6).alias('cosine_sim'))
                .withColumn('rank', F.row_number().over(w))
                .filter(F.col('rank') <= k)
                .select('query_id', 'vec_id', 'cosine_sim', 'rank')
                .orderBy('query_id', 'rank'))


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 n_cells: int = 16, n_probe: int = 4,
                 id_col: str = 'vec_id', vec_col: str = 'embedding',
                 query_id_col: str = 'query_id', seed: int = 42,
                 quantizer: str = 'hash') -> DataFrame:
    """IVF-flat ANN: partition the corpus into coarse cells around centroid
    vectors; each query probes only its n_probe nearest cells and
    exact-rescores those candidates.

    quantizer='hash' (default) picks centroids by content hash — the
    n_cells corpus vectors with the smallest md5(vec_id:seed): centroid
    quality affects only recall, never correctness, and hash selection
    keeps the pipeline a pure function of the data that the DuckDB
    differential oracle replays value-for-value.  quantizer='kmeans'
    trains a seeded Spark ML k-means coarse quantizer instead — better
    cell balance and recall, but k-means cluster centers are not
    bit-replayable in another engine, so use it where recall matters more
    than a differential oracle.  Assignment/probe/rescore are identical
    for both.

    Scale shape: centroids ride inline in the expressions (n_cells × dim
    literals — broadcast by the plan itself); cell assignment is a single
    native projection over the corpus (argmax via array_max over
    (sim, -cell) structs — no join, no shuffle); candidates come from one
    corpus ⋈ broadcast(probed queries) hash join on the cell id, touching
    ~n_probe/n_cells of the corpus per query.  Ranking windows partition by
    query_id.  Similarities are rounded to 6 places BEFORE any comparison
    so argmax/probe/rank order is reproducible across engines.
    """
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    c = corpus.select(F.col(id_col).alias('vec_id'), as_double(F.col(vec_col)).alias('__cv'))
    q = queries.select(F.col(query_id_col).alias('query_id'), as_double(F.col(vec_col)).alias('__qv'))
    if quantizer == 'kmeans':
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
        train = c.select(array_to_vector(F.col('__cv')).alias('features'))
        model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
        centroids = [[float(x) for x in ctr] for ctr in model.clusterCenters()]
    elif quantizer == 'hash':
        cent_rows = (c.select(
                        '__cv',
                        F.md5(F.concat(F.col('vec_id').cast('string'),
                                       F.lit(':{}'.format(seed)))).alias('__h'),
                        'vec_id')
                     .orderBy('__h', 'vec_id')
                     .limit(n_cells)
                     .collect())
        centroids = [[float(x) for x in r['__cv']] for r in cent_rows]
    else:
        raise ValueError("quantizer must be 'hash' or 'kmeans'")

    def _sim(vec: Column, cv: list[float]) -> Column:
        return F.round(cosine(vec, F.array(*[F.lit(x) for x in cv])), 6)

    def _argmax_cell(vec: Column) -> Column:
        # array_max over (sim, -cell): ties on sim resolve to the larger
        # -cell, i.e. the LOWEST cell index — mirrored by the oracle's
        # ORDER BY sim DESC, cell ASC
        arr = F.array(*[F.struct(_sim(vec, cv).alias('s'),
                                 F.lit(-i).alias('ni'))
                        for i, cv in enumerate(centroids)])
        return -F.array_max(arr)['ni']

    def _probe_cells(vec: Column) -> Column:
        # ascending sort of (-sim, cell) = sim DESC, cell ASC; negation
        # applied AFTER rounding so both engines order identical values
        arr = F.array(*[F.struct((-_sim(vec, cv)).alias('ns'),
                                 F.lit(i).alias('cell'))
                        for i, cv in enumerate(centroids)])
        return F.transform(F.slice(F.array_sort(arr), 1, n_probe),
                           lambda s: s['cell'])

    assigned = c.select('vec_id', '__cv', _argmax_cell(F.col('__cv')).alias('cell'))
    probed = q.select('query_id', '__qv',
                      F.explode(_probe_cells(F.col('__qv'))).alias('cell'))
    # a corpus vector lives in exactly one cell and a query probes distinct
    # cells, so candidates are already unique per (query, vec)
    cand = assigned.join(F.broadcast(probed), 'cell')
    w = Window.partitionBy('query_id').orderBy(F.col('cosine_sim').desc(), F.col('vec_id').asc())
    return (cand.select('query_id', 'vec_id',
                        F.round(cosine(F.col('__cv'), F.col('__qv')), 6).alias('cosine_sim'))
                .withColumn('rank', F.row_number().over(w))
                .filter(F.col('rank') <= k)
                .select('query_id', 'vec_id', 'cosine_sim', 'rank')
                .orderBy('query_id', 'rank'))


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.95,
                             dim: int = 32, n_planes: int = 12,
                             id_col: str = 'vec_id', vec_col: str = 'embedding',
                             seed: int = 42) -> DataFrame:
    """Near-duplicate embedding pairs: LSH bucket self-join + exact cosine."""
    planes = _hyperplanes(dim, n_planes, seed)
    as_double = lambda col: F.transform(col, lambda x: x.cast('double'))  # noqa: E731
    c = corpus.select(F.col(id_col).alias('vec_id'), as_double(F.col(vec_col)).alias('__v'),
                      _bucket_expr(as_double(F.col(vec_col)), planes).alias('bucket'))
    l, r = c.alias('l'), c.alias('r')
    cand = (l.join(r, (F.col('l.bucket') == F.col('r.bucket'))
                   & (F.col('l.vec_id') < F.col('r.vec_id')))
             .select(F.col('l.vec_id').alias('vec_a'), F.col('r.vec_id').alias('vec_b'),
                     cosine(F.col('l.__v'), F.col('r.__v')).alias('cosine_sim')))
    return (cand.filter(F.col('cosine_sim') >= threshold)
                .select('vec_a', 'vec_b', F.round('cosine_sim', 6).alias('cosine_sim'))
                .orderBy('vec_a', 'vec_b'))
