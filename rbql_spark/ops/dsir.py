"""Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a target corpus.

The published recipe, re-expressed as Spark aggregations:

1. featurize every document as a bag of hashed n-grams (unigrams +
   bigrams folded into `dim` buckets — the paper's 10k-bucket hashing);
2. fit two bag-of-words models over the buckets: one on the target
   corpus, one on the raw corpus (add-`smoothing` Laplace estimates);
3. per raw document, the log importance weight is the sum over its
   n-gram occurrences of log p_target(bucket) − log p_raw(bucket);
4. sample without replacement with probability ∝ weight via the Gumbel
   top-k trick: g_i = log w_i + Gumbel(0,1), keep the n largest g_i.

Scale shape: the bucket models are `dim`-row tables (a fixed parameter,
like IVF's n_cells) built by one aggregation per corpus, then BROADCAST
into the scoring join — the raw corpus never shuffles to be scored; its
exploded n-gram stream maps through the broadcast model and collapses
in one partial/final sum per doc_id.  All hashing is native Catalyst
md5 arithmetic, and the Gumbel noise is an md5-derived uniform keyed on
doc_id — the whole pipeline is a pure function of the data, replayed
value-for-value by the DuckDB differential oracle.  Like lm_score, the
accumulated float-order error of summing per-gram logs sits far below
the 1e-6 rounding grid both engines emit.

Reference parity note: the reference engine (mechatroner/RBQL) has no
data-selection surface; this module is part of the LLM-training-data
superset, mirroring the conventions of ops/textstats.py (lm_score) and
ops/dedup.py (decontaminate).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import let_once, spread_partitions, tokens

__all__ = ['dsir_log_weights', 'dsir_sample', 'domain_classify']


def _hashed_grams(col: Column, ngram_max: int = 2) -> Column:
    """Array of n-gram strings (1..ngram_max words, space-joined), one
    entry per OCCURRENCE — DSIR features are counts, not sets, so no
    array_distinct here (unlike the dedup shingles)."""
    def grams(ta: Column) -> Column:
        n = F.size(ta)

        def kgram(k):
            # closure factory, NOT `lambda i, k=k`: pyspark would read the
            # defaulted param as the (element, index) two-arg lambda form
            return lambda i: F.concat_ws(' ', F.slice(ta, i + 1, k))

        parts = [ta]
        for k in range(2, int(ngram_max) + 1):
            idx = F.sequence(F.lit(0), n - k)
            parts.append(F.when(n >= k, F.transform(idx, kgram(k)))
                          .otherwise(F.array().cast('array<string>')))
        return F.concat(*parts) if len(parts) > 1 else parts[0]
    return let_once(tokens(col), grams)


def _bucket(gram: Column, dim: int, seed: int) -> Column:
    """md5-derived feature bucket in [0, dim) — the hashing trick, same
    first-8-hex-chars construction as word_shingles_md5 so any engine
    with md5() replays it."""
    h = F.md5(F.concat(gram, F.lit(':dsir:{}'.format(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast('long') % F.lit(int(dim))


def _bucket_counts(df: DataFrame, text_col: str, dim: int, ngram_max: int,
                   seed: int, name: str) -> DataFrame:
    """(bucket, <name>) occurrence counts — ONE scan + one partial/final
    aggregation collapsing to ≤ dim rows."""
    g = (spread_partitions(df)
         .select(F.explode(_hashed_grams(F.col(text_col), ngram_max))
                 .alias('__g'))
         .select(_bucket(F.col('__g'), dim, seed).alias('bucket')))
    return g.groupBy('bucket').agg(F.count(F.lit(1)).alias(name))


def dsir_log_weights(raw: DataFrame, target: DataFrame,
                     text_col: str = 'text', id_col: str = 'doc_id',
                     dim: int = 4096, ngram_max: int = 2,
                     seed: int = 42, smoothing: float = 1.0) -> DataFrame:
    """Score every raw document with its DSIR log importance weight →
    (doc_id, n_features, log_weight), log_weight rounded to 6.

    `dim` bounds BOTH model tables at dim rows regardless of corpus
    size, which is what makes them broadcastable at any scale (the
    paper uses 10k buckets); `smoothing` is the Laplace constant of the
    two bucket models.  Documents whose text yields no tokens have no
    features and emit no row (the lm_score bigram convention).

    Cost: one scan of `target`, ONE tokenize+hash pass of `raw` — the
    raw model fit and the per-doc scoring both consume the persisted
    slim (doc_id, bucket) gram stream (16 bytes/occurrence) instead of
    each re-running the regex tokenizer and the per-gram md5 (r17: the
    gram pass is the dominant cost; paying it twice was ~45% of the
    gate).  The cache entry backs the lazily-returned frame, so it
    outlives the call like any cached lineage (the minhash_dedup_pairs
    contract) — clear via spark.catalog.clearCache() in long-lived
    sessions.  Output is UNORDERED (pair/score producers never pay a
    display sort); dsir_sample ranks it.
    """
    from pyspark.storagelevel import StorageLevel

    ct = _bucket_counts(target, text_col, dim, ngram_max, seed, '__ct')
    gstream = (spread_partitions(raw)
               .select(F.col(id_col).alias('doc_id'),
                       F.explode(_hashed_grams(F.col(text_col), ngram_max))
                       .alias('__g'))
               .select('doc_id', _bucket(F.col('__g'), dim, seed)
                       .alias('bucket'))
               .persist(StorageLevel.MEMORY_AND_DISK))
    cr = gstream.groupBy('bucket').agg(F.count(F.lit(1)).alias('__cr'))
    # dense dim-row model: every bucket present so unseen buckets smooth
    # instead of dropping out of the scoring join
    buckets = (raw.sparkSession.range(0, int(dim))
                  .select(F.col('id').alias('bucket')))
    a = F.lit(float(smoothing))
    # corpus totals as unpartitioned window sums over the dim-row joined
    # table (r17): the old crossJoin(broadcast(ct.agg ⋈ cr.agg)) subtrees
    # re-ran each corpus' tokenize+hash scan a second time just to total
    # counts the dim-row model table already holds — same integers, one
    # single-partition exchange of ≤ dim rows
    from pyspark.sql import Window
    _all = Window.partitionBy(F.lit(1))
    model = (buckets.join(ct, 'bucket', 'left').join(cr, 'bucket', 'left')
             .withColumn('__tt', F.sum('__ct').over(_all))
             .withColumn('__tr', F.sum('__cr').over(_all))
             .select('bucket',
                     (F.log((F.coalesce(F.col('__ct'), F.lit(0)) + a)
                            / (F.coalesce(F.col('__tt'), F.lit(0))
                               + a * int(dim)))
                      - F.log((F.coalesce(F.col('__cr'), F.lit(0)) + a)
                              / (F.coalesce(F.col('__tr'), F.lit(0))
                                 + a * int(dim))))
                     .alias('__lr')))
    # the total coalesces matter: an all-tokenless corpus sums to NULL,
    # which would NULL every weight — coalescing to 0 degrades to the
    # uniform smoothed model instead (domain_classify does the same)
    scored = gstream.join(F.broadcast(model), 'bucket')
    return (scored.groupBy('doc_id')
                  .agg(F.count(F.lit(1)).cast('long').alias('n_features'),
                       F.round(F.sum('__lr'), 6).alias('log_weight')))


def _gumbel(key: Column, seed: int) -> Column:
    """Deterministic standard-Gumbel noise keyed on the doc id: an
    md5-derived 48-bit uniform u ∈ (0,1), g = −ln(−ln u).  Stateless
    and engine-replayable, like sampling._hash_unit."""
    h = F.md5(F.concat(key.cast('string'), F.lit(':gumbel:{}'.format(seed))))
    u = ((F.conv(F.substring(h, 1, 12), 16, 10).cast('double') + 1.0)
         / float((1 << 48) + 2))
    return -F.log(-F.log(u))


def dsir_sample(raw: DataFrame, target: DataFrame, n_select: int,
                text_col: str = 'text', id_col: str = 'doc_id',
                dim: int = 4096, ngram_max: int = 2, seed: int = 42,
                smoothing: float = 1.0, exact_max_n: int = 1_000_000,
                weights: DataFrame | None = None) -> DataFrame:
    """Gumbel-top-k DSIR selection: the n_select raw documents sampled
    without replacement with probability ∝ exp(log_weight) →
    (doc_id, log_weight, gumbel_score).

    Ranking compares the ROUNDED scores (ties broken by doc_id) so both
    engines order identically even when two documents land on the same
    1e-6 grid cell.

    Scale shape: n_select ≤ exact_max_n runs TakeOrderedAndProject —
    no full range shuffle, but the driver holds n_select rows.  Larger
    selections switch to a threshold plan: the slim score triple is
    persisted and counted (ONE eager measuring job at call time; the
    percentile aggregation rides the returned lazy plan and re-reads
    the cache, not the corpus).  The cache entry backs the
    lazily-returned frame, so it outlives the call like any cached
    lineage — use the exact path or unpersist via
    spark.catalog.clearCache() in long-lived sessions.
    approx_percentile picks the cutoff score and a
    filter keeps ≈n_select rows with NO global sort — the 100 TB path,
    where "give me the best 10%" never needs an exact rank.

    `weights`: pass a precomputed dsir_log_weights frame to skip the
    scoring scans (e.g. score once, sample at several sizes).
    """
    w = weights if weights is not None else dsir_log_weights(
        raw, target, text_col=text_col, id_col=id_col, dim=dim,
        ngram_max=ngram_max, seed=seed, smoothing=smoothing)
    scored = w.select('doc_id', 'log_weight',
                      F.round(F.col('log_weight')
                              + _gumbel(F.col('doc_id'), seed), 6)
                       .alias('gumbel_score'))
    if int(n_select) <= int(exact_max_n):
        return (scored.orderBy(F.col('gumbel_score').desc(),
                               F.col('doc_id').asc())
                      .limit(int(n_select)))
    # threshold plan: persist the slim triple once (it feeds the count,
    # the percentile aggregation, and the final filter), pick the cutoff
    # at the (1 − n/total) quantile, keep everything above it
    from pyspark.storagelevel import StorageLevel

    from rbql_spark.tuning import apply_plan_width

    # the count + percentile jobs run EAGERLY here: size their shuffle
    # now or a sub-advisory corpus pays the 16x-initial map overhead
    scored = apply_plan_width(scored).persist(StorageLevel.MEMORY_AND_DISK)
    total = scored.count()
    q = max(0.0, 1.0 - float(n_select) / max(total, 1))
    cut = scored.agg(F.percentile_approx('gumbel_score', F.lit(q), 10_000)
                     .alias('__cut'))
    return (scored.crossJoin(F.broadcast(cut))
                  .where(F.col('gumbel_score') >= F.col('__cut'))
                  .drop('__cut'))


def domain_classify(raw: DataFrame, domains: dict, text_col: str = 'text',
                    id_col: str = 'doc_id', dim: int = 4096,
                    ngram_max: int = 2, seed: int = 42,
                    smoothing: float = 1.0) -> DataFrame:
    """Naive-Bayes domain tagging over the DSIR feature space: score
    every raw document under an add-one hashed-n-gram model fit on each
    exemplar corpus in `domains` (an ordered {name: DataFrame} dict) →
    (doc_id, domain_pred, n_features, score_<name>…), scores = mean log
    probability rounded to 6, ties broken by domain declaration order.

    The curation use: tag a web crawl against exemplar corpora
    ("books", "code", "forums"), then feed the tags to
    stratified/temperature sampling or mix_corpora for domain-balanced
    training recipes.  Same structure as textstats.language_id
    (per-class score columns + greatest/CASE argmax), with learned
    hashed-n-gram models in place of stopword lists.

    Scale shape: one aggregation per exemplar corpus builds its dim-row
    bucket model; the models join into ONE wide dim-row table (bucket,
    logp_0…logp_{n-1}) that BROADCASTS into the raw corpus' exploded
    gram stream — a 1:1 join (no ×n_domains row fan-out), then a single
    per-doc partial/final sum per domain column.  The raw corpus never
    shuffles to be scored; documents with no tokens emit no row.
    """
    if not domains:
        raise ValueError('domains must be a non-empty {name: DataFrame}')
    names = list(domains)
    buckets = (raw.sparkSession.range(0, int(dim))
                  .select(F.col('id').alias('bucket')))
    a = float(smoothing)
    # per-domain totals as unpartitioned window sums (the dsir_log_weights
    # rationale): the crossJoin(broadcast(cnt.agg)) subtree re-tokenized
    # each exemplar corpus a second time for a number the dim-row count
    # table already contains
    from pyspark.sql import Window
    _all = Window.partitionBy(F.lit(1))
    wide = buckets
    for i, name in enumerate(names):
        cnt = _bucket_counts(domains[name], text_col, dim, ngram_max, seed,
                             '__c{}'.format(i))
        wide = (wide.join(cnt, 'bucket', 'left')
                    .withColumn('__t{}'.format(i),
                                F.sum('__c{}'.format(i)).over(_all))
                    .withColumn('__lp{}'.format(i), F.log(
                        (F.coalesce(F.col('__c{}'.format(i)), F.lit(0)) + a)
                        / (F.coalesce(F.col('__t{}'.format(i)), F.lit(0))
                           + a * int(dim))))
                    .drop('__c{}'.format(i), '__t{}'.format(i)))
    scored = (spread_partitions(raw)
              .select(F.col(id_col).alias('doc_id'),
                      F.explode(_hashed_grams(F.col(text_col), ngram_max))
                      .alias('__g'))
              .select('doc_id',
                      _bucket(F.col('__g'), dim, seed).alias('bucket'))
              .join(F.broadcast(wide), 'bucket'))
    aggs = [F.count(F.lit(1)).cast('long').alias('n_features')]
    for i, name in enumerate(names):
        aggs.append(F.round(F.sum('__lp{}'.format(i)) / F.count(F.lit(1)), 6)
                    .alias('score_{}'.format(name)))
    per_doc = scored.groupBy('doc_id').agg(*aggs)
    best = F.greatest(*[F.col('score_{}'.format(n)) for n in names]) \
        if len(names) > 1 else F.col('score_{}'.format(names[0]))
    pred = None
    for name in reversed(names):
        hit = F.col('score_{}'.format(name)) == best
        pred = F.when(hit, F.lit(name)) if pred is None \
            else F.when(hit, F.lit(name)).otherwise(pred)
    # the when-chain is built in REVERSE so the FIRST declared domain
    # wins ties (each earlier domain's branch overwrites later ones)
    return per_doc.select('doc_id', pred.alias('domain_pred'), 'n_features',
                          *['score_{}'.format(n) for n in names])
