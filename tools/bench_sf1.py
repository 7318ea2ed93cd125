#!/usr/bin/env python3
"""sf1 scale validation: run the dedup/similarity/pipeline subset at 10x
sf0.1 and record per-query sf0.1 vs sf1 times + growth ratios.

Usage:  python tools/bench_sf1.py          # writes BENCH_sf1.json at repo root

The sf1 dataset is materialized once under $SPARK_GRAFT_SF1_DIR (default
/tmp/rbql_sf1) as 10 deterministic replicas of the sf0.1 tables:

  * documents: replica i applies a seeded LETTER-PERMUTATION cipher
    (independent lowercase and uppercase permutations + digit rotation).
    The cipher is bijective on the token alphabet, so within a replica
    token equality — and therefore exact-dup groups, shingle sets, and
    Jaccard similarities — is preserved exactly; hash-derived structure
    (simhash Hamming distances) is re-drawn per replica — and since
    fingerprints correlate through shared token hashes, per-replica
    borderline-pair counts vary WIDELY around the original (2x-10x
    swings measured on sf0.01 controls).  What stays exact is zero
    cross-replica contamination, so totals remain linear in replica
    count.  Across replicas nearly every letter changes differently, so
    texts share almost no tokens and pair counts scale LINEARLY with
    data.  (Replicating text verbatim — or perturbing too weakly —
    instead creates cross-replica near-dup cliques and a quadratic pair
    explosion that tests output size, not throughput: an earlier
    vowel-rotation variant of this tool had exactly that bug, because
    the corpus contains no uppercase vowels.  A shared per-replica tag
    token is equally wrong: it correlates every fingerprint in the
    replica.)
  * embeddings: replica 0 is the original; replicas 1-9 mix each vector
    with seeded noise at 1.5x the vector norm (cosine to the source
    ~0.55, crossing the 0.8 near-dup threshold only at a ~4-sigma tail)
    so clone cliques don't blow up the bucket self-join quadratically.

A query is flagged super-linear if sf1_time > 10x sf0.1_time measured in
the same session (both min-of-REPS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
SF1_DIR = os.environ.get('SPARK_GRAFT_SF1_DIR', '/tmp/rbql_sf1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
REPS = int(os.environ.get('SPARK_GRAFT_BENCH_REPS', '2'))
N_REPLICAS = 10

SUBSET = [
    'rbql_js_filter_order',
    'dedup_exact',
    'dedup_minhash_lsh',
    'dedup_simhash',
    'dedup_ngram_jaccard',
    'dedup_clusters',
    'pack_sequences',
    'sample_stratified',
    'text_redact_pii',
    'text_token_stats',
    'text_quality_score',
    'text_fingerprint',
    'multimodal_features',
    'multimodal_audio_features',
    'multimodal_frame_sample',
    'multimodal_resize',
    'sim_topk_bruteforce',
    'sim_ann_lsh',
    'sim_ann_ivf',
    'sim_ann_ivf_int8',
    'sim_embedding_neardup',
    'decontaminate_ngram',
    'text_repetition',
    'dedup_lines',
    'sample_temperature',
    'sim_ann_pq',
    'chunk_documents',
    'bpe_train',
    'text_quality_filter',
    'text_lm_score',
    'text_lm_score_bigram',
    'sample_split',
    'export_manifest',
    'dedup_incremental',
    'sim_ann_lsh_multiprobe',
    'sim_ann_ivf_pq',
    # the composed training-data pipeline: the most workload-representative
    # query — quality filter + minhash/CC dedup + decontaminate + split +
    # pack, end to end
    'pipeline_training_data',
    # round 8 additions
    'sample_shuffle',
    'sample_mix',
    'text_embed_hashing',
    'sim_ann_index_search',
    # round 9 additions: the streaming gates (stateful stream ops — band
    # index, seen-key state — are exactly where 10x data can go
    # super-linear) plus the churned-index search
    'streaming_exact_dedup',
    'streaming_minhash_neardup',
    'streaming_quality_filter',
    'streaming_windowed_counts',
    'streaming_user_totals',
    'sim_ann_index_churn',
    # round 9 late additions: session-window merge state and the
    # stream-static enrichment, plus the batch time-keyed joins
    'streaming_session_counts',
    'streaming_asof',
    'join_asof',
    'join_interval',
    'dedup_spans',
    # round 11 additions: embedding curation, importance resampling, the
    # bloom decontamination scale path, and the new sampling schedules
    'sim_semantic_dedup',
    'sim_kmeans_cluster',
    'sim_prototype_prune',
    'dsir_weights',
    'dsir_topk',
    'domain_classify',
    'decontaminate_bloom',
    'sample_mix_tokens',
    'sample_epochs',
    'streaming_decontaminate_bloom',
    # round 11 late additions: the trained quality classifier (full
    # 2-round GD per run) and hybrid BM25+embedding RRF retrieval
    'quality_classifier',
    'retrieval_hybrid_rrf',
    'sample_k_per_group',
    'streaming_classifier',
    'text_bm25_batch',
    'text_readability',
    # round 12 additions: the line-level curation passes (fused
    # per-document projections — the lined-view HOF filter is where a
    # 10x corpus would expose interpreted-lambda cost growth)
    'text_c4_line_filter',
    'text_gopher_filter',
    'streaming_c4_filter',
    'bpe_encode_ids',
    'pack_materialize',
    'contamination_report',
    # round 13 additions (verdict #8): the remaining tokenizer-tail gate
    # plus uncovered documents/events gates so every recent operator has
    # a measured 10x ratio
    'bpe_vocab',
    'text_bm25',
    'pivot_event_counts',
    'dedup_keep_canonical',
    'sample_hash',
]

_LOWER = 'abcdefghijklmnopqrstuvwxyz'
_UPPER = _LOWER.upper()
_DIGITS = '0123456789'
_ID_STEP = 10_000_000


def _cipher(i: int) -> tuple[str, str]:
    """Seeded substitution cipher for replica i: permuted lowercase +
    uppercase alphabets and rotated digits.  Bijective on the token
    alphabet → within-replica similarity structure is isomorphic to the
    original; distinct permutations per replica → cross-replica texts
    share almost no tokens."""
    import random as _random
    rnd = _random.Random(774_001 + i)
    lo = list(_LOWER)
    up = list(_UPPER)
    rnd.shuffle(lo)
    rnd.shuffle(up)
    k = i % 10
    digits = _DIGITS[k:] + _DIGITS[:k]
    return (_LOWER + _UPPER + _DIGITS, ''.join(lo) + ''.join(up) + digits)


def build_sf1(spark) -> None:
    build_replicas(spark, SF1_DIR, N_REPLICAS, marker='_DONE_v2')


def build_replicas(spark, out_dir: str, n_replicas: int,
                   tables=('documents', 'events', 'embeddings'),
                   marker: str | None = None) -> None:
    """Materialize n_replicas cipher/shift replicas of the sf0.1 tables
    into out_dir (see the module docstring for why the cipher keeps
    ratios honest).  Shared by the sf1 (10x) run and the sf10 decade
    audit (tools/bench_sf10.py)."""
    import shutil

    from pyspark.sql import functions as F

    # v2: adds the replicated events table (streaming gates) — a v1 dir
    # (marker '_DONE') predates it and is rebuilt from scratch
    if marker is None:
        marker = '_DONE_r{}_{}'.format(n_replicas, '_'.join(sorted(tables)))
    if os.path.exists(os.path.join(out_dir, marker)):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(os.path.join(SF01_DIR, 'documents.parquet'))
    doc_parts = []
    for i in range(n_replicas):
        if i == 0:
            doc_parts.append(docs)
            continue
        src_al, dst_al = _cipher(i)
        # no shared replica-tag token: a token common to every doc of a
        # replica adds identical simhash votes corpus-wide, correlating
        # fingerprints and inflating within-replica near-dup counts
        txt = F.translate('text', src_al, dst_al)
        doc_parts.append(docs.select(
            (F.col('doc_id') + i * _ID_STEP).alias('doc_id'),
            txt.alias('text'), 'lang', 'source', 'n_chars'))
    if 'documents' in tables:
        out = doc_parts[0]
        for p in doc_parts[1:]:
            out = out.unionAll(p)
        out.repartition(CPUS).write.mode('overwrite') \
           .parquet(os.path.join(out_dir, 'documents.parquet'))

    # events: replica i shifts event_id AND user_id so ids stay unique
    # and the stateful-stream key count (users) grows linearly — the
    # honest scale-up for keyed state (replicating user_ids verbatim
    # would 10x the rows per key but keep state size flat).  ts/value
    # are unchanged: the event-time span — and so watermark behavior —
    # is that of the original workload, just 10x denser.
    ev = spark.read.parquet(os.path.join(SF01_DIR, 'events.parquet'))
    ev_parts = []
    for i in range(n_replicas):
        ev_parts.append(ev.select(
            (F.col('event_id') + i * _ID_STEP).alias('event_id'), 'ts',
            (F.col('user_id') + i * _ID_STEP).alias('user_id'),
            'event_type', 'value', 'props'))
    if 'events' in tables:
        out = ev_parts[0]
        for p in ev_parts[1:]:
            out = out.unionAll(p)
        out.repartition(CPUS).write.mode('overwrite') \
           .parquet(os.path.join(out_dir, 'events.parquet'))

    emb = spark.read.parquet(os.path.join(SF01_DIR, 'embeddings.parquet'))

    def perturb(i):
        def fn(batches):
            import numpy as np
            import pandas as pd
            for pdf in batches:
                vecs = []
                for vid, e in zip(pdf['vec_id'], pdf['embedding']):
                    v = np.asarray(e, dtype=np.float64)
                    rng = np.random.default_rng(1_000_003 * i + int(vid))
                    g = rng.standard_normal(v.shape)
                    g *= 1.5 * np.linalg.norm(v) / (np.linalg.norm(g) + 1e-12)
                    w = v + g
                    vecs.append((w / (np.linalg.norm(w) + 1e-12)).astype('float32'))
                yield pd.DataFrame({
                    'vec_id': pdf['vec_id'] + i * _ID_STEP,
                    'embedding': pd.Series(vecs, index=pdf.index, dtype='object'),
                    'label': pdf['label']})
        return fn

    if 'embeddings' in tables:
        emb_parts = [emb]
        schema = 'vec_id long, embedding array<float>, label int'
        for i in range(1, n_replicas):
            emb_parts.append(emb.mapInPandas(perturb(i), schema=schema))
        out = emb_parts[0]
        for p in emb_parts[1:]:
            out = out.unionAll(p)
        out.repartition(CPUS).write.mode('overwrite') \
           .parquet(os.path.join(out_dir, 'embeddings.parquet'))

    with open(os.path.join(out_dir, marker), 'w') as f:
        f.write('ok\n')


def time_query(fn, spark, sf_dir: str) -> float:
    best = None
    for _ in range(REPS):
        t0 = time.time()
        fn(spark, sf_dir).write.format('noop').mode('overwrite').save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        # gates that persist stage frames (pipeline_training_data) must not
        # accumulate cache across reps — each rep re-materializes honestly
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    import __spark_entry__ as em
    from rbql_spark.session import build_session

    spark = build_session(app_name='rbql-spark-bench-sf1',
                          master='local[{}]'.format(CPUS),
                          shuffle_partitions=CPUS,
                          driver_memory=os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g'))
    spark.sparkContext.setLogLevel('ERROR')
    build_sf1(spark)

    qs = em.queries()
    results = {}
    for name in SUBSET:
        t01 = time_query(qs[name], spark, SF01_DIR)
        t1 = time_query(qs[name], spark, SF1_DIR)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        results[name] = {'sf0.1_sec': t01, 'sf1_sec': t1, 'ratio': ratio,
                         'super_linear': bool(ratio is not None and ratio > 10.0)}
        print('{}: sf0.1={}s sf1={}s ratio={}'.format(name, t01, t1, ratio),
              file=sys.stderr)

    # honest-ratio caveat: the sf1 replicas are letter-permutation
    # ciphered, so pipeline_training_data's language-allowlist +
    # stopword-ratio quality rules drop them near-totally — its survivor
    # set (and thus all post-filter stages) barely grows at sf1.  The
    # pipeline ratio therefore validates the top-of-funnel scan+filter
    # scaling; downstream dedup/CC scaling is validated by their
    # standalone rows (dedup_minhash_lsh, dedup_clusters), which run on
    # the full corpus without the language gate.
    if 'pipeline_training_data' in results:
        results['pipeline_training_data']['note'] = (
            'ciphered sf1 replicas fail the language/stopword quality '
            'rules, so post-filter stage input barely grows; ratio '
            'reflects scan+filter scaling — see dedup_* rows for '
            'downstream-stage scaling')

    artifact = {
        'metric': 'sf1_scale_validation',
        'unit': 'sec',
        'sf0.1_rows': {'documents': 5000, 'embeddings': 2000,
                       'events': 100000},
        'sf1_rows': {'documents': 50000, 'embeddings': 20000,
                     'events': 1000000},
        'reps': REPS,
        'queries': results,
        'super_linear_queries': [n for n, r in results.items() if r['super_linear']],
    }
    print(json.dumps(artifact))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       'BENCH_sf1.json')
    with open(out, 'w') as fh:
        json.dump(artifact, fh, indent=1)
    spark.stop()


if __name__ == '__main__':
    main()
