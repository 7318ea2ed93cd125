"""BPE tokenizer training (superset op, SURVEY §2.8): learn byte-pair
merge rules from a corpus — the vocabulary-induction step of an LLM data
pipeline, downstream of top_ngrams' seed counts.

Word-level BPE (the standard formulation): the corpus collapses to its
distinct-word vocabulary with frequencies ONCE (the only corpus-scale
job); every merge round then runs over the (distributed, but
vocabulary-sized) symbol table — count adjacent symbol pairs weighted by
word frequency, pick the most frequent pair (ties: left ASC, right ASC),
merge it everywhere left-to-right non-overlapping.  All symbol math is
deterministic string/array expressions, so the DuckDB differential
oracle replays every round — the learned merge table is value-checked,
not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import let_once, tokens

# symbol separator inside the encoded symbol string; tokens() yields
# letter/digit runs only, so '/' can never occur inside a symbol
_SEP = '/'


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over the vocabulary, weighted by
    word frequency.  One explode + one partial+final sum."""
    def pairs(s):
        n = F.size(s)
        idx = F.sequence(F.lit(0), n - 2)
        return F.when(n >= 2, F.transform(
            idx, lambda i: F.struct(F.element_at(s, i + 1).alias('left_sym'),
                                    F.element_at(s, i + 2).alias('right_sym'))
        )).otherwise(F.array().cast(
            'array<struct<left_sym:string,right_sym:string>>'))

    return (vocab.select(F.explode(let_once(F.split('syms', _SEP), pairs))
                         .alias('p'), 'wcount')
                 .groupBy('p.left_sym', 'p.right_sym')
                 .agg(F.sum('wcount').alias('pair_count')))


def _apply_merge(left: str, right: str):
    """Column builder: merge every adjacent (left, right) symbol pair in
    the encoded symbol string, left-to-right non-overlapping — a fold
    seeded with the first symbol (mirroring DuckDB's list_reduce, which
    has no separate init) whose accumulator is the rebuilt string; the
    pair matches only on exact symbol boundaries (acc == left, or acc
    ending in SEP+left)."""
    def fold(s):
        return F.aggregate(
            F.slice(s, 2, F.size(s) - 1), F.element_at(s, 1),
            lambda acc, x: F.when(
                ((acc == F.lit(left)) | acc.endswith(_SEP + left))
                & (x == F.lit(right)),
                F.concat(acc, x)
            ).otherwise(F.concat(acc, F.lit(_SEP), x)))

    return let_once(F.split('syms', _SEP), fold)


def train_bpe(df: DataFrame, text_col: str = 'text', id_col: str = 'doc_id',
              n_merges: int = 8) -> DataFrame:
    """Learn n_merges BPE merge rules → (rank, left_sym, right_sym,
    merged, pair_count), rank 1 = first/most-frequent merge.  Stops early
    if the vocabulary runs out of adjacent pairs.

    Scale shape: ONE corpus-scale aggregation (distinct words +
    frequencies); each round is two vocabulary-sized jobs — a pair-count
    aggregation whose argmax is a 1-row TakeOrdered to the driver
    (inherent to sequential BPE: round r+1's counts depend on round r's
    merge), and a stateless merge projection.  The vocabulary stays a
    distributed DataFrame throughout (web-scale corpora have
    billion-entry vocabularies); per-round localCheckpoints keep the
    plan flat and stop the corpus aggregation from re-running every
    round.  The driver holds only the n_merges learned rules.

    Checkpoint lifecycle: each round's localCheckpoint supersedes the
    previous one; superseded checkpoint blocks are freed by Spark's
    ContextCleaner once the rebound `vocab` reference drops them (no
    explicit unpersist API exists for localCheckpoint state) — a
    long-lived session running many trainings reclaims them at GC, not
    instantly.
    """
    spark = df.sparkSession
    words = df.select(F.explode(tokens(F.col(text_col))).alias('word'))
    vocab = (words.groupBy('word').agg(F.count(F.lit(1)).alias('wcount'))
                  .select(F.concat_ws(_SEP, F.split('word', '')).alias('syms'),
                          'wcount')
                  .localCheckpoint())
    merges: list[tuple] = []
    for r in range(int(n_merges)):
        best = (_pair_counts(vocab)
                .orderBy(F.col('pair_count').desc(),
                         F.col('left_sym').asc(), F.col('right_sym').asc())
                .limit(1).collect())
        if not best:
            break
        left, right, cnt = best[0]['left_sym'], best[0]['right_sym'], best[0]['pair_count']
        merges.append((r + 1, left, right, left + right, int(cnt)))
        vocab = vocab.select(_apply_merge(left, right).alias('syms'),
                             'wcount').localCheckpoint()
    return spark.createDataFrame(
        merges,
        'rank long, left_sym string, right_sym string, '
        'merged string, pair_count long')


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """Tokenize documents with a learned merge list (rank order) →
    (doc_id, bpe_tokens array<string>, n_bpe_tokens).  A pure projection
    — each document's words fold through the merges inside the scan
    tasks, no shuffle."""
    def encode(ta):
        word_syms = F.transform(
            ta, lambda w: F.concat_ws(_SEP, F.split(w, '')))
        merged = word_syms
        def make_fold(left, right):
            # closure factory: pyspark infers higher-order arity from the
            # lambda signature, so the pair can't ride along as default args
            def fold_one(sym_str):
                def fold(s):
                    return F.aggregate(
                        F.slice(s, 2, F.size(s) - 1), F.element_at(s, 1),
                        lambda acc, x: F.when(
                            ((acc == F.lit(left)) | acc.endswith(_SEP + left))
                            & (x == F.lit(right)),
                            F.concat(acc, x)
                        ).otherwise(F.concat(acc, F.lit(_SEP), x)))
                return let_once(F.split(sym_str, _SEP), fold)
            return fold_one

        for left, right in merges:
            merged = F.transform(merged, make_fold(left, right))
        return F.flatten(F.transform(merged, lambda m: F.split(m, _SEP)))

    out = df.select(F.col(id_col).alias('doc_id'),
                    let_once(tokens(F.col(text_col)), encode).alias('bpe_tokens'))
    return out.select('doc_id', 'bpe_tokens',
                      F.size('bpe_tokens').cast('long').alias('n_bpe_tokens'))
