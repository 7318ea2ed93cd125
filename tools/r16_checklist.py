#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r16.md per-gate checklist table from the round's
baseline and final bench records."""
import json
import sys

base = json.load(open(sys.argv[1]))['queries']
fin = json.load(open(sys.argv[2]))['queries']

# gate -> (action label, note)
TOUCHED = {
    'quality_classifier': 'optimized',
    'streaming_classifier': 'optimized (train fix; batch unspread by A/B)',
    'bpe_encode_ids': 'optimized',
    'streaming_minhash_neardup': 'optimized',
    'streaming_windowed_counts': 'optimized (state width)',
    'streaming_user_totals': 'optimized',
    'streaming_exact_dedup': 'optimized (state width)',
    'streaming_session_counts': 'optimized (state width)',
    'streaming_decontaminate': 'optimized (spread)',
    'streaming_decontaminate_bloom': 'optimized (spread + state width)',
    'streaming_quality_filter': 'optimized (spread)',
    'streaming_asof': 'examined (stateless; width-neutral)',
    'sim_kmeans_cluster': 'optimized',
    'sim_prototype_prune': 'optimized (via kmeans)',
    'sim_kmeans_recall': 'examined (MLlib quantizer cached; left alone)',
    'dedup_clusters': 'optimized',
    'pipeline_training_data': 'optimized (via CC/classifier/minhash)',
}
EXAMINED = {
    'dsir_weights', 'dsir_topk', 'domain_classify', 'retrieval_hybrid_rrf',
    'text_bm25_batch', 'text_lm_score', 'text_gopher_filter', 'dedup_lines',
    'dedup_spans', 'contamination_report', 'sim_semantic_dedup',
    'dedup_minhash_lsh', 'multimodal_features', 'multimodal_audio_features',
    'dedup_incremental', 'text_bm25', 'decontaminate_bloom',
    'sample_k_per_group',
}

rows = []
for k in fin:
    b, f = base.get(k, -1), fin[k]
    if k in TOUCHED:
        act = TOUCHED[k]
    elif k in EXAMINED:
        act = 'examined, left alone'
    else:
        act = 'unchanged (already at floor)'
    rows.append((k, b, f, act))
rows.sort(key=lambda r: -(r[1] if r[1] > 0 else 0))
print('| gate | r16 baseline s | r16 final s | disposition |')
print('|---|---|---|---|')
for k, b, f, act in rows:
    print('| {} | {:.2f} | {:.2f} | {} |'.format(k, b, f, act))
tot_b = sum(v for v in base.values() if v > 0)
tot_f = sum(v for v in fin.values() if v > 0)
print()
print('total: {:.1f} -> {:.1f} s ({:+.0%})'.format(
    tot_b, tot_f, (tot_f - tot_b) / tot_b))
