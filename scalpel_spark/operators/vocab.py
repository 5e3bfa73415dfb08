"""Distributed BPE vocabulary learning over a crawl corpus.

Byte-Pair Encoding merge learning (Sennrich, Haddow & Birch, ACL 2016
§3.2) is the vocabulary step between corpus curation and tokenization.
The classic algorithm operates on the WORD-FREQUENCY table, not the raw
corpus: the corpus-sized work is exactly one distributed word count; the
merge loop then iterates over the bounded vocabulary, which is a
driver-side structure by design — the same shape as the IVF centroid
build in `operators/similarity.py` (distribute the corpus pass, keep the
small model state local). At 100 TB the word count is one partial-agg
shuffle; the vocabulary is capped with the range-partition straddle
top-k, so no task and no driver list ever exceeds ``max_vocab_words``.

Determinism: merges tie-break on (pair count DESC, left ASC, right ASC);
the vocabulary cap tie-breaks on (count DESC, word ASC). Given the same
corpus, the merge sequence is bit-stable across any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import tokens

__all__ = ['bpe_encode_words', 'bpe_merges', 'bpe_token_stats', 'word_counts']

END = '</w>'  # end-of-word sentinel, per the original BPE formulation


def word_counts(docs: DataFrame, max_vocab_words: int = 65536,
                text_col: str = 'text') -> DataFrame:
    """(word, n) — the corpus word-frequency table, capped to the
    ``max_vocab_words`` most frequent words (count DESC, word ASC) via
    the range-partition straddle top-k (`scheduling.topk_by_score`), so
    the cap never funnels the vocabulary through one task."""
    from scalpel_spark.operators.scheduling import topk_by_score

    wc = (
        docs.select(F.explode(tokens(F.col(text_col))).alias('word'))
        .filter(F.length('word') > 0)
        .groupBy('word').agg(F.count('*').alias('n'))
    ).persist()
    try:
        kept, _ = topk_by_score(wc, max_vocab_words, score_col='n',
                                tiebreak='word')
        out = kept.select('word', F.col('n').cast('long').alias('n'))
        out = out.localCheckpoint()
    finally:
        wc.unpersist()
    return out


def bpe_merges(docs: DataFrame, n_merges: int = 32,
               max_vocab_words: int = 65536,
               text_col: str = 'text') -> 'DataFrame':
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns a DataFrame (rank, left, right, pair_count): at merge
    ``rank`` (1-based) the adjacent symbol pair (left, right) had the
    highest corpus frequency ``pair_count`` and was fused. Words are
    decomposed into characters plus the ``</w>`` terminator; pair counts
    are weighted by word frequency.

    The merge loop runs on the driver over the capped word-frequency
    table (the vocabulary is small BY CONSTRUCTION — the distributed
    part is the corpus word count; see module docstring). Stops early
    when no pair occurs twice.
    """
    rows = word_counts(docs, max_vocab_words, text_col).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r['word']) + (END,)
        vocab[sym] = vocab.get(sym, 0) + r['n']

    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        fused = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab

    spark = SparkSession.getActiveSession() or docs.sparkSession
    return spark.createDataFrame(
        merges, 'rank int, left string, right string, pair_count long')


def _apply_merge(arr, left: str, right: str):
    """One BPE merge applied to a symbol array as a LEFT FOLD: append
    each symbol unless (previous, current) == (left, right), in which
    case the previous symbol is replaced by the fused pair. The fold IS
    leftmost-greedy non-overlapping replacement — the reference apply
    loop's semantics — because after a fuse the fused symbol (never equal
    to ``left``: left+right == left would need right = '') cannot
    immediately re-merge at the same rank.

    Pure JVM higher-order function over the array; ``F.get`` (0-indexed,
    NULL out of bounds) keeps the empty-accumulator probe safe under
    ANSI mode, and ``F.lit`` carries the symbols so no SQL-string
    escaping can corrupt quote/backslash merges."""
    fused = left + right
    return F.aggregate(
        arr,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(fused))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]],
                     word_col: str = 'word') -> DataFrame:
    """Encode each distinct word with a learned merge list (rank order):
    (word, tokens array<string>, n_tokens).

    The merge list is bounded model state (the same shape the learner
    returns), so the encode plan is a CHAIN of ``len(merges)`` array
    folds — one whole-stage-codegen expression per word, no Python on
    any row. Callers should pass DISTINCT words: Zipf makes the distinct
    table orders of magnitude smaller than the corpus, so each word is
    encoded exactly once and joined back (see :func:`bpe_token_stats`).
    """
    sym = F.concat(F.split(F.col(word_col), '(?!$)'), F.array(F.lit(END)))
    for left, right in merges:
        sym = _apply_merge(sym, left, right)
    return words.select(
        word_col,
        sym.alias('tokens'),
    ).withColumn('n_tokens', F.size('tokens'))


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = 'text',
                    id_col: str = 'doc_id') -> DataFrame:
    """Per-document BPE tokenization statistics under a learned merge
    list: (doc_id, n_words, n_tokens, n_symbols, compression_ppm).

    ``n_symbols`` is the unmerged baseline (chars + the </w> terminator
    per word); ``compression_ppm = n_tokens * 10^6 div n_symbols`` in
    DECIMAL integral division (engine-portable — the repo convention).

    Plan shape for 100 TB: corpus explode -> DISTINCT words (vocabulary-
    sized) -> encode each once -> join the per-word token count back to
    the exploded corpus -> per-doc SUM. The join's build side is the
    distinct-word table; the encode chain never touches the corpus-sized
    side, and nothing collects to the driver.
    """
    w = (
        docs.select(F.col(id_col).alias('doc_id'),
                    F.explode(tokens(F.col(text_col))).alias('word'))
        .filter(F.length('word') > 0)
    )
    encoded = bpe_encode_words(w.select('word').distinct(), merges)
    per_word = encoded.select(
        'word', 'n_tokens',
        (F.length('word') + F.lit(1)).alias('n_symbols'),
    )
    return (
        w.join(per_word, 'word')
        .groupBy('doc_id')
        .agg(
            F.count('*').cast('long').alias('n_words'),
            F.sum('n_tokens').cast('long').alias('n_tokens'),
            F.sum('n_symbols').cast('long').alias('n_symbols'),
        )
        .withColumn(
            'compression_ppm',
            F.expr('cast(cast(n_tokens as decimal(28,0)) * 1000000'
                   ' div cast(n_symbols as decimal(19,0)) as bigint)'),
        )
    )
