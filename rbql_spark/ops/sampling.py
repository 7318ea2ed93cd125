"""Deterministic sampling + sequence packing for training-data pipelines
(superset ops, SURVEY §2.8; no reference analog).

Both operators are content-keyed and seeded so any engine can replay them
bit-for-bit (the DuckDB differential oracle does):

  * hash_sample            — Bernoulli sample: keep iff md5(key, seed) maps
                             below the fraction.  No RNG state, no
                             partition-order dependence — the sample is a
                             pure function of the data, which is what a
                             reproducible training pipeline needs.
  * stratified_hash_sample — per-stratum fractions with the same rule.
  * sample_k_per_group     — EXACTLY k rows per group (smallest key
                             hashes), skew-safe two-phase salted rank.
  * chunk_documents        — overlapping fixed-token-window chunking (the
                             RAG / context-window prep primitive).
  * pack_sequences         — greedy token-budget packing (the LLM-training
                             "sequence packing" step): docs are bucketed by
                             id hash, each bucket packs its docs in id order
                             into bins of at most max_tokens.  Bucketing
                             makes packing embarrassingly parallel AND
                             deterministic — bin assignment is independent
                             of physical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 32)


def _hash_unit(key: Column, seed: int, op: str = '') -> Column:
    """md5-based uniform [0, 1) value from a key column (engine-portable).

    `op` salts the hash per OPERATOR: samplers and split_corpus hash the
    same key with the same default seed, and without a per-op salt the
    split becomes a deterministic function of sampling survival — any
    stratum sampled at rate < 0.9 would yield only 'train' rows and zero
    val/test documents.  The salt makes the two decisions independent
    while keeping each one rerun-stable and engine-replayable.
    """
    salt = ':{}:{}'.format(op, seed) if op else ':{}'.format(seed)
    h32 = F.conv(F.substring(F.md5(F.concat(key.cast('string'),
                                            F.lit(salt))), 1, 8),
                 16, 10).cast('long')
    return h32 / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, fraction: float, key_col: str = 'doc_id',
                seed: int = 42) -> DataFrame:
    """Keep rows whose hashed key falls under `fraction` — deterministic,
    rerun-stable, join-consistent (the same key always samples the same
    way, so downstream tables sampled on the same key stay aligned)."""
    return df.filter(_hash_unit(F.col(key_col), seed) < F.lit(float(fraction)))


def stratified_hash_sample(df: DataFrame, fractions: dict, strata_col: str,
                           key_col: str = 'doc_id', seed: int = 42,
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep low-resource languages at 100%)."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.filter(_hash_unit(F.col(key_col), seed) < frac)


def sample_k_per_group(df: DataFrame, k: int, group_col: str,
                       key_col: str = 'doc_id', seed: int = 42,
                       salt_buckets: int = 32,
                       broadcast_picks: bool | None = None,
                       broadcast_max_rows: int = 5_000_000,
                       on_null_key: str = 'drop') -> DataFrame:
    """EXACTLY the k rows per group with the smallest deterministic key
    hash (a fixed-size per-stratum sample: "take 10k docs per language",
    where the fraction-based samplers can't hit an exact count) → the
    input columns plus `sample_rank` (1..k within the group, ordered by
    hash unit ASC, key ASC).  Groups smaller than k are kept whole.

    Content-keyed like hash_sample: the picked set is a pure function of
    the data — rerun-stable and engine-replayable (the DuckDB oracle is
    a plain per-group row_number on the same md5 unit).  `key_col` must
    uniquely identify rows (the hash_sample contract): duplicate keys
    would make the (unit, key) rank order non-total and the join-back
    fan out.  The join-back matches on (group, key), so a pick never
    attaches outside its own group.  NULL-keyed rows are never sampled
    (they cannot round-trip the key join; see the inline note); pass
    on_null_key='error' to raise at the first NULL key instead of
    silently dropping.

    Scale shape — skew-safe exact rank without a per-group single task:
    a naive row_number over PARTITION BY group serializes each group
    into one task (a 5-group 100 TB corpus would rank on 5 cores).
    Instead the slim (group, key, unit) triple ranks in two phases:
    phase 1 within (group, salt) — salt_buckets× the parallelism, keep
    rank ≤ k per salt bucket (a superset of the true top-k, since every
    true top-k row is also top-k inside its own bucket); phase 2 ranks
    only the ≤ salt_buckets×k survivors per group.  Both windows order
    by (unit, key) so the result is EXACT — the salt never reaches the
    output.  The payload joins back on the key: broadcast_picks=None
    (default) persists the ≤ n_groups×k pick set, counts it (one eager
    measuring job, cache retained by the returned lazy frame — the
    dedup_lines contract), and broadcasts only under
    broadcast_max_rows; pass False to force the shuffle join when
    n_groups×k is corpus-scale.
    """
    if int(k) < 1:
        raise ValueError('sample_k_per_group: k must be >= 1')
    if int(salt_buckets) < 1:
        raise ValueError('sample_k_per_group: salt_buckets must be >= 1')
    if on_null_key not in ('drop', 'error'):
        raise ValueError("sample_k_per_group: on_null_key must be 'drop' "
                         "or 'error', got {!r}".format(on_null_key))
    # reserved temp names, checked: a bare '__k'/'__g' would silently
    # drop same-named USER columns from the output at the end
    kc, gc, uc = '__rbql_kpg_k', '__rbql_kpg_g', '__rbql_kpg_u'
    clash = {kc, gc, uc} & set(df.columns)
    if clash:
        raise ValueError('sample_k_per_group: reserved column name(s) '
                         'present in input: {}'.format(sorted(clash)))
    from .skew import topk_per_group
    # NULL sample keys are excluded up front: a NULL key hashes to a
    # NULL unit, which sorts FIRST under Spark (NULLS FIRST) — it would
    # occupy a top-k slot and then never join back (NULL == NULL is
    # NULL), silently shrinking its group to k-1 rows; DuckDB's default
    # NULLS LAST would additionally diverge.  The contract is therefore:
    # NULL-keyed rows are never sampled.
    # on_null_key='error' (round-12 advisory: the silent-drop contract
    # can surprise callers whose keys are unexpectedly nullable): raise
    # at the first NULL key instead — a zero-extra-job guard evaluated
    # during the rank scan itself.
    key_in = F.col(key_col)
    if on_null_key == 'error':
        key_in = F.when(
            key_in.isNull(),
            F.raise_error(F.concat(
                F.lit('sample_k_per_group: NULL {} with '
                      'on_null_key=error (group '.format(key_col)),
                F.coalesce(F.col(group_col).cast('string'), F.lit('NULL')),
                F.lit(')')))).otherwise(key_in)
    slim = df.where(key_in.isNotNull()) \
             .select(F.col(group_col).alias(gc),
                     key_in.alias(kc)) \
             .withColumn(uc, _hash_unit(F.col(kc), seed, op='kpg'))
    # the salt is engine-side only: any partition of a group's rows
    # preserves exactness, so it never needs oracle replay
    picks = topk_per_group(
        slim, int(k), [gc], [F.col(uc).asc(), F.col(kc).asc()],
        salt_key=F.col(kc), salt_buckets=int(salt_buckets),
        rank_name='sample_rank').select(gc, kc, 'sample_rank')
    if broadcast_picks is None:
        from pyspark.storagelevel import StorageLevel

        from rbql_spark.tuning import apply_plan_width

        # the measuring count runs EAGERLY: size its shuffle now (r17)
        picks = apply_plan_width(picks).persist(StorageLevel.MEMORY_AND_DISK)
        broadcast_picks = picks.count() <= int(broadcast_max_rows)
    joined = df.join(F.broadcast(picks) if broadcast_picks else picks,
                     (df[key_col] == picks[kc])
                     & df[group_col].eqNullSafe(picks[gc]))
    return joined.drop(kc, gc)


def temperature_sample(df: DataFrame, strata_col: str, alpha: float = 0.5,
                       key_col: str = 'doc_id', seed: int = 42,
                       weight_col: str | None = None) -> DataFrame:
    """Temperature-reweighted mixture sampling (the multilingual /
    multi-source training standard): target mixture weights w_g ∝ c_g^alpha
    flatten the source distribution (alpha=1 keeps natural proportions,
    alpha→0 approaches uniform).  Realized as per-stratum keep rates
    r_g = (c_g / c_min)^(alpha−1), scaled so the SMALLEST stratum is kept
    whole — downsampling the head, never replicating the tail.

    Everything is a pure function of the per-stratum counts plus the
    deterministic md5 key hash, so the sample is rerun-stable and
    engine-replayable (the DuckDB oracle recomputes the same rates).
    Rates are rounded to 6 places before the threshold compare so both
    engines agree despite libm pow() last-ulp differences.

    weight_col: when set, stratum sizes c_g are SUMS of this column (e.g.
    a token count) instead of document counts — mixture temperature is
    conventionally defined over token mass, and a stratum of few huge
    documents should down-weight like the large stratum it is.

    Scale shape: one partial+final count on the stratum key (tiny result),
    broadcast back onto the corpus, then a stateless filter — the corpus
    itself is never shuffled.
    """
    from pyspark.sql import Window
    size = (F.sum(F.col(weight_col)) if weight_col
            else F.count(F.lit(1)))
    counts = df.groupBy(F.col(strata_col).alias('__g')) \
               .agg(size.alias('__cnt'))
    # c_min via an (empty-frame) window over the tiny counts result — an
    # agg-and-join-back would rescan the corpus for the second aggregate
    rates = counts.select(
        F.col('__g'),
        F.round(F.pow(F.col('__cnt') / F.min('__cnt').over(Window.partitionBy()),
                      F.lit(float(alpha) - 1.0)), 6).alias('__rate'))
    # null-safe join: the groupBy computes a rate for the NULL stratum,
    # so NULL-stratum rows must reach the filter too (plain == would
    # silently drop them)
    return (df.join(F.broadcast(rates), df[strata_col].eqNullSafe(F.col('__g')))
              .where(_hash_unit(F.col(key_col), seed) < F.col('__rate'))
              .drop('__g', '__rate'))


def split_corpus(df: DataFrame, splits: list[tuple[str, float]] | None = None,
                 key_col: str = 'doc_id', seed: int = 42) -> DataFrame:
    """Deterministic train/val/test assignment: each row gains a `split`
    column chosen by its md5 key hash against the cumulative split
    fractions (given order; the last split absorbs rounding slack).
    Same _hash_unit contract as hash_sample — rerun-stable,
    join-consistent across tables keyed the same way, engine-replayable —
    but salted with op='split' so composing a sampler with split_corpus
    (the documented pipeline shape) keeps the two decisions independent.
    Pure stateless projection: no shuffle, no count pass.
    """
    splits = splits or [('train', 0.9), ('val', 0.05), ('test', 0.05)]
    u = _hash_unit(F.col(key_col), seed, op='split')
    expr = F.lit(splits[-1][0])
    acc = 0.0
    bounds = []
    for name, frac in splits[:-1]:
        acc += float(frac)
        bounds.append((name, acc))
    for name, bound in reversed(bounds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn('split', expr)


def chunk_documents(df: DataFrame, chunk_size: int = 256, overlap: int = 32,
                    id_col: str = 'doc_id', text_col: str = 'text') -> DataFrame:
    """Overlapping token-window chunking: split each document's token
    stream into windows of chunk_size tokens starting every
    (chunk_size − overlap) tokens → (doc_id, chunk_idx, chunk_text,
    n_chunk_tokens).  Chunks are emitted until the document is covered —
    the last chunk is the first one reaching the final token (it may be
    short, but is never fully contained in its predecessor); empty
    documents emit nothing.

    Scale shape: a row-multiplying native projection INSIDE the scan
    tasks (tokenize → windowed slices → posexplode) — no shuffle, no
    Python stage; expansion is bounded by ~chunk_size/(chunk_size−overlap)
    ×.  The token rule is the shared tokens() (letters+digits runs), so
    chunk boundaries are engine-replayable (the DuckDB oracle slices the
    same token lists).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError('need 0 <= overlap < chunk_size')
    step = chunk_size - overlap
    from .dedup import tokens
    # staged projection: the token array is referenced by every chunk —
    # a multi-use alias keeps the tokenizer evaluated once per row
    staged = df.select(F.col(id_col).alias('doc_id'),
                       tokens(F.col(text_col)).alias('__toks'))
    toks = F.col('__toks')
    n = F.size(toks)
    # last start = the first one whose window reaches the final token
    last = F.lit(step) * F.ceil(F.greatest(n - chunk_size, F.lit(0)) / F.lit(step))
    starts = F.sequence(F.lit(0).cast('long'), last, F.lit(step).cast('long'))
    chunks = F.when(n > 0, F.transform(
        starts, lambda s: F.struct(
            F.concat_ws(' ', F.slice(toks, s + 1, chunk_size)).alias('text'),
            F.least(F.lit(chunk_size), n - s).cast('long').alias('n'))
    )).otherwise(F.array().cast('array<struct<text:string,n:long>>'))
    return (staged.select('doc_id', F.posexplode(chunks).alias('chunk_idx', '__c'))
                  .select('doc_id', F.col('chunk_idx').cast('long').alias('chunk_idx'),
                          F.col('__c')['text'].alias('chunk_text'),
                          F.col('__c')['n'].alias('n_chunk_tokens')))


def pack_sequences(df: DataFrame, max_tokens: int, n_buckets: int | None = None,
                   id_col: str = 'doc_id', text_col: str = 'text',
                   target_docs_per_bucket: int = 4096,
                   count_col: str | None = None) -> DataFrame:
    """Greedy sequence packing: (doc_id, n_tokens, bucket, bin_id, bin_seq).

    Docs are assigned to buckets by id modulo, and each bucket packs its
    docs in ascending id order: a doc joins the current bin unless it would
    push the bin past max_tokens, in which case a new bin starts.  Docs
    longer than max_tokens get a bin of their own.

    The bucket count scales with the corpus: when `n_buckets` is not given
    it is ceil(count / target_docs_per_bucket), so parallelism grows with
    the data and per-task memory stays ~target_docs_per_bucket rows no
    matter the corpus size (a fixed bucket count would mean corpus/N rows
    per task — ~3 TB per task at 100 TB).  The derivation is a pure
    function of the row count, so it is replayable by any engine (the
    DuckDB oracle embeds the same ceil(count/target) expression).

    Scale shape: one count job, one hash shuffle on the bucket key, then a
    per-bucket Arrow-batched greedy scan (applyInPandas).  Determinism
    comes from the bucket-then-sort contract, NOT from physical
    partitioning, so the result is stable across cluster sizes — and
    replayable in SQL (the DuckDB oracle runs the same greedy scan as a
    recursive CTE).
    """
    from .dedup import tokens
    if n_buckets is None:
        n_docs = df.count()
        n_buckets = max(1, -(-n_docs // int(target_docs_per_bucket)))
    # count_col packs by a PRECOMPUTED length (e.g. encode_bpe_ids'
    # n_tokens — the real tokenizer's counts, which is what a training
    # bin budget means) instead of re-tokenizing text
    length = (F.col(count_col).cast('long') if count_col is not None
              else F.size(tokens(F.col(text_col))).cast('long'))
    src = df.select(F.col(id_col).alias('doc_id'),
                    length.alias('n_tokens'),
                    (F.col(id_col) % n_buckets).cast('long').alias('bucket'))
    cap = int(max_tokens)

    def pack(pdf):
        import pandas as pd
        pdf = pdf.sort_values('doc_id').reset_index(drop=True)
        bins, seqs = [], []
        bin_id, acc, seq = -1, None, 0
        for tok in pdf['n_tokens']:
            t = int(tok)
            if acc is None or acc + t > cap:
                bin_id += 1
                acc = t
                seq = 0
            else:
                acc += t
                seq += 1
            bins.append(bin_id)
            seqs.append(seq)
        pdf['bin_id'] = pd.Series(bins, dtype='int64')
        pdf['bin_seq'] = pd.Series(seqs, dtype='int64')
        return pdf

    return (src.groupBy('bucket')
               .applyInPandas(pack, schema='doc_id long, n_tokens long, bucket long, '
                                           'bin_id long, bin_seq long'))


def shuffle_corpus(df: DataFrame, key_col: str = 'doc_id',
                   seed: int = 42, n_buckets: int = 4096) -> DataFrame:
    """Deterministic global shuffle: order rows by md5(key:shuffle:seed)
    — the pre-training randomization step ("shuffle the corpus before
    packing/sharding"), as a pure function of the data.

    A seeded RNG shuffle (orderBy(rand(seed))) depends on partitioning
    and task scheduling; this is content-keyed, so the permutation is
    rerun-stable, cluster-size-invariant, and replayable by the DuckDB
    differential oracle.  The returned frame carries `shuffle_pos`
    (0-based dense long position) so downstream sharding can range-split
    it.

    Scale shape: a global Window.orderBy would pull the ENTIRE corpus
    into one task (Spark's no-partition window), so positions are
    composed from a content-derived bucket instead: bucket =
    floor(unit × n_buckets) is monotone in the sort unit (the md5 unit
    is uniform on [0,1), so buckets are balanced by construction), rows
    rank WITHIN their bucket in parallel, and each bucket's global
    offset is the cumulative count of the buckets before it — an
    aggregation of n_buckets rows, broadcast back.  Two corpus passes
    (count + rank), no single-task stage over corpus rows; positions are
    long (offset + 32-bit within-bucket rank ⇒ ~2^43 rows at the
    default n_buckets).  Ties are broken by the key itself, so the
    order is total even across md5-32 collisions.
    """
    from pyspark.sql import Window
    u = _hash_unit(F.col(key_col), seed, op='shuffle')
    keyed = df.withColumn('__u', u).withColumn(
        '__bkt', F.floor(F.col('__u') * n_buckets).cast('int'))
    counts = keyed.groupBy('__bkt').agg(F.count(F.lit(1)).alias('__n'))
    # cumulative offsets over n_buckets rows — a bounded, tiny window
    woff = (Window.orderBy('__bkt')
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        '__bkt',
        F.coalesce(F.sum('__n').over(woff), F.lit(0))
         .cast('long').alias('__off'))
    wrank = (Window.partitionBy('__bkt')
             .orderBy(F.col('__u').asc(), F.col(key_col).asc()))
    return (keyed.withColumn('__rnk', F.row_number().over(wrank))
                 .join(F.broadcast(offsets), '__bkt')
                 .withColumn('shuffle_pos',
                             (F.col('__off') + F.col('__rnk') - 1)
                             .cast('long'))
                 .drop('__u', '__bkt', '__rnk', '__off'))


def mix_corpora(sources: list, weights: list[float],
                key_col: str = 'doc_id', seed: int = 42,
                source_col: str = 'mix_source', by: str = 'rows',
                token_col: str | None = None,
                text_col: str = 'text') -> DataFrame:
    """Weighted corpus mixture: deterministically downsample N sources so
    their EXPECTED proportions match `weights`, then union — the
    "data mixture" step of a training recipe (e.g. 60% web, 30% code,
    10% books).

    by='rows' (default) balances document counts; by='tokens' balances
    TOKEN mass — what an LLM training recipe actually budgets (a books
    source with 100× longer documents should contribute 100× fewer of
    them per mixture point).  Token mass per source is one sum over
    `token_col` if given, else the whitespace token count of `text_col`
    computed in-scan; document-level Bernoulli keeps are unbiased w.r.t.
    length, so the EXPECTED token share matches the target weights.

    The largest weight-to-size ratio anchors at keep-rate 1.0 (no source
    is ever upsampled — repetition is the epochs schedule's job, not the
    mixer's); every other source keeps the hash-sampled fraction that
    brings its share to the target ratio.  Sampling is per-source
    content-hash Bernoulli (`_hash_unit` with an op salt including the
    source index), so the mixture is rerun-stable and engine-replayable;
    `source_col` tags provenance.  Sizes come from one count (or token
    sum) per source — driver-side scalars, the only non-lazy step.

    Scale shape: N stateless filtered scans + unionAll, no shuffle (the
    token-mass measuring jobs are one partial/final agg per source).
    """
    if len(sources) != len(weights) or not sources:
        raise ValueError('need equally many sources and weights (>0)')
    if any(w <= 0 for w in weights):
        raise ValueError('weights must be positive')
    if by == 'rows':
        sizes = [df.count() for df in sources]
    elif by == 'tokens':
        ntok = (F.col(token_col).cast('double') if token_col is not None
                else F.size(F.filter(F.split(F.coalesce(F.col(text_col),
                                                        F.lit('')),
                                             r'\s+', -1),
                                     lambda x: x != '')).cast('double'))
        sizes = [df.agg(F.sum(ntok)).first()[0] or 0 for df in sources]
        if any(n == 0 for n in sizes):
            raise ValueError('mix_corpora(by=\'tokens\') sources must have '
                             'non-zero token mass (a source may have rows '
                             'whose texts are all empty)')
    else:
        raise ValueError("by must be 'rows' or 'tokens'")
    if any(n == 0 for n in sizes):
        raise ValueError('mix_corpora sources must be non-empty')
    # anchor: the source whose target share is largest relative to its
    # size keeps everything; others downsample to match proportions
    ratios = [w / n for w, n in zip(weights, sizes)]
    anchor = max(ratios)
    parts = []
    for i, (df, r) in enumerate(zip(sources, ratios)):
        keep = r / anchor
        tagged = df.withColumn(source_col, F.lit(i))
        if keep >= 1.0:
            parts.append(tagged)
        else:
            u = _hash_unit(F.col(key_col), seed, op='mix{}'.format(i))
            parts.append(tagged.filter(u < F.lit(float(keep))))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def epoch_repeat(df: DataFrame, epochs: float, key_col: str = 'doc_id',
                 seed: int = 42, epoch_col: str = 'epoch') -> DataFrame:
    """Fractional-epoch repetition schedule: replicate the corpus
    `epochs` times (e.g. 2.4 → every document twice, plus a
    deterministic 40% hash sample as the partial third pass), tagging
    each copy with `epoch_col` — the repetition half of a training
    recipe, which mix_corpora deliberately does NOT do (it only ever
    downsamples; see its docstring).

    The partial epoch is a content-hash Bernoulli cut (`_hash_unit`
    with an ':epoch<k>' op salt, decorrelated from the samplers and the
    splitter), so which documents repeat an extra time is rerun-stable
    and engine-replayable, and downstream per-epoch shuffles
    (shuffle_corpus keyed on (key, epoch)) reorder each pass
    independently.

    Scale shape: ceil(epochs) stateless filtered scans + unionAll — no
    shuffle, no driver-side data.  At 100 TB the copies are virtual
    until an action consumes them (a writer materializes one epoch at a
    time); epochs < 1 degenerates to hash_sample with an epoch tag.
    """
    if epochs <= 0:
        raise ValueError('epochs must be positive')
    full = int(epochs)
    frac = float(epochs) - full
    parts = [df.withColumn(epoch_col, F.lit(e)) for e in range(full)]
    if frac > 0:
        u = _hash_unit(F.col(key_col), seed, op='epoch{}'.format(full))
        parts.append(df.filter(u < F.lit(frac))
                       .withColumn(epoch_col, F.lit(full)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def materialize_bins(packed: DataFrame, docs: DataFrame,
                     id_col: str = 'doc_id', payload_col: str = 'text',
                     sep: str = '\n\n') -> DataFrame:
    """Turn a pack_sequences assignment into actual training rows — one
    row PER BIN with the member payloads concatenated in bin_seq order →
    (bucket, bin_id, n_docs, n_tokens, bin_payload).  A string
    payload_col (document text) joins with `sep` (the EOD separator); an
    array payload_col (encode_bpe_ids' token_ids) flattens into one id
    sequence — the final materialization step of text → tokens → ids →
    packed bins.

    Scale shape: one hash join of the slim pack assignment against the
    payloads on doc_id, then ONE aggregation keyed (bucket, bin_id); a
    bin's member payloads are bounded by max_tokens, so per-group state
    is budget-bounded regardless of corpus size.  Order inside the bin
    comes from array_sort over (bin_seq, payload) structs — the
    ARRAY_AGG input-order machinery, deterministic under any
    partitioning.
    """
    from pyspark.sql import types as T
    pay_type = docs.schema[payload_col].dataType
    j = packed.select(F.col(id_col).alias('__id'), 'n_tokens',
                      'bucket', 'bin_id', 'bin_seq') \
              .join(docs.select(F.col(id_col).alias('__id'),
                                F.col(payload_col).alias('__p')), '__id')
    per = (j.groupBy('bucket', 'bin_id')
            .agg(F.count(F.lit(1)).cast('long').alias('n_docs'),
                 F.sum('n_tokens').cast('long').alias('n_tokens'),
                 F.array_sort(F.collect_list(
                     F.struct(F.col('bin_seq').alias('s'),
                              F.col('__p').alias('p')))).alias('__m')))
    ordered = F.transform(F.col('__m'), lambda m: m['p'])
    if isinstance(pay_type, T.ArrayType):
        payload = F.flatten(ordered)
    else:
        payload = F.array_join(ordered, sep)
    return per.select('bucket', 'bin_id', 'n_docs', 'n_tokens',
                      payload.alias('bin_payload'))
