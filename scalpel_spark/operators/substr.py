"""Duplicated-substring detection and masking — the ExactSubstr pass
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") re-expressed Spark-first.

Document- and line-level dedup miss the third duplication mode: long
token runs repeated *inside* otherwise-distinct documents (licence
boilerplate, quoted passages, templated paragraphs). The reference
method builds a corpus-wide suffix array — inherently single-machine.
The distributed equivalent used here is fixed-width window hashing:

1. slide a ``window_tokens``-token window over every document (map-side
   ``arrays_zip`` shingling — O(tokens) per row, one interpreted-lambda
   pass, see ``texthash.word_shingles``);
2. hash each window to 60 bits and count occurrences corpus-wide — ONE
   hash-shuffle groupBy moving (hash, count) pairs, never window text;
3. join the duplicated hashes (count ≥ ``min_count``) back to their
   positions — the duplicated-hash side is tiny relative to the corpus
   (boilerplate is rare per-position even when frequent per-document),
   so AQE broadcasts it;
4. merge overlapping windows per document into maximal duplicated runs
   with a gaps-and-islands pass — a per-document window function, fully
   parallel across documents;
5. strike the covered tokens map-side (higher-order ``filter`` against
   the per-doc island list — islands per doc are few, the lambda is
   O(tokens × islands) JVM work, no shuffle).

Every duplicated run of length ≥ ``window_tokens`` is covered exactly:
a run of L ≥ w duplicated tokens contributes L − w + 1 duplicated
windows whose union is the full run. Runs shorter than ``window_tokens``
are invisible by design — the same resolution limit as the reference's
min-match-length (they use 50 BPE tokens; default here is 50 words).

Scale shape at 100 TB: the exploded (doc_id, pos, hash) frame is the
method's inherent cost — ~24 bytes × total-token-count through one
exchange, the Spark-native analogue of the suffix-array build. No
Python anywhere; the hash arithmetic is the engine-portable ``hash60``
(md5-derived) so the DuckDB oracle reproduces every value bit-for-bit
(production swaps in xxhash64 behind the same helper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60, tokens, word_shingles


def dup_window_positions(docs: DataFrame, window_tokens: int = 50,
                         min_count: int = 2) -> DataFrame:
    """(doc_id, pos, end) for every window whose hash occurs at least
    ``min_count`` times corpus-wide. ``pos`` is the 0-based token offset,
    ``end`` = pos + window_tokens (exclusive). Within-document repeats
    count toward ``min_count`` — a doc that repeats its own boilerplate
    is still duplicated text (reference behaviour: the suffix array sees
    the corpus as one string).
    """
    toks = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    wins = toks.select(
        'doc_id',
        F.posexplode(word_shingles(F.col('toks'), window_tokens))
        .alias('pos', 'win'),
    ).select('doc_id', 'pos', hash60(F.col('win')).alias('h'))
    dup_h = (wins.groupBy('h').agg(F.count(F.lit(1)).alias('cnt'))
             .filter(F.col('cnt') >= min_count).select('h'))
    return wins.join(dup_h, 'h').select(
        'doc_id', 'pos', (F.col('pos') + window_tokens).alias('end'))


def dup_islands(positions: DataFrame) -> DataFrame:
    """Merge overlapping duplicated windows into maximal runs
    (gaps-and-islands): a window starts a new island iff its start is at
    or past the running max end of everything before it in the document.
    Returns (doc_id, start, end) — disjoint, so per-doc coverage is
    simply Σ(end − start). One per-document window function; parallel
    across documents.
    """
    w = Window.partitionBy('doc_id').orderBy('pos')
    prev_max = F.max('end').over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = positions.withColumn(
        'new_isl',
        F.when(F.col('pos') >= F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0))
    with_id = flagged.withColumn(
        'isl',
        F.sum('new_isl').over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_id.groupBy('doc_id', 'isl')
            .agg(F.min('pos').alias('start'), F.max('end').alias('end'))
            .drop('isl'))


def strike_dup_substrings(docs: DataFrame, window_tokens: int = 50,
                          min_count: int = 2) -> DataFrame:
    """The full ExactSubstr pass: per document, the fraction of tokens
    covered by corpus-duplicated runs (integer parts-per-million — exact,
    engine-portable) and the text with those runs struck.

    Returns (doc_id, n_tokens, dup_tokens, dup_ppm, clean_text). Docs
    with no duplicated run pass through with dup_tokens = 0 and
    clean_text = text. The strike is map-side: the per-doc island list is
    collected per document (islands are few — they are maximal runs, not
    windows) and a higher-order filter keeps the uncovered tokens.
    """
    islands = (dup_islands(
        dup_window_positions(docs, window_tokens, min_count))
        .groupBy('doc_id')
        .agg(F.collect_list(F.struct('start', 'end')).alias('islands'),
             F.sum(F.col('end') - F.col('start')).alias('dup_tokens')))
    base = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    joined = base.join(islands, 'doc_id', 'left').select(
        'doc_id', 'toks',
        F.coalesce('islands', F.array().cast(
            'array<struct<start:int,end:int>>')).alias('islands'),
        F.coalesce('dup_tokens', F.lit(0)).cast('long').alias('dup_tokens'),
    )
    kept = F.filter(
        # (token, 0-based position) pairs, then drop those inside any island
        F.transform(F.col('toks'), lambda t, i: F.struct(
            t.alias('t'), i.alias('i'))),
        lambda s: ~F.exists(
            F.col('islands'),
            lambda iv: (s['i'] >= iv['start']) & (s['i'] < iv['end'])),
    )
    return joined.select(
        'doc_id',
        F.size('toks').cast('long').alias('n_tokens'),
        'dup_tokens',
        F.expr('(dup_tokens * 1000000) div size(toks)').alias('dup_ppm'),
        F.array_join(F.transform(kept, lambda s: s['t']), ' ')
        .alias('clean_text'),
    )


def ngram_novelty(docs: DataFrame, window_tokens: int = 8,
                  min_count: int = 2) -> DataFrame:
    """Per-document novelty / memorization-risk score: the fraction of a
    document's ``window_tokens``-gram windows that are corpus-duplicated
    (occur ≥ ``min_count`` times corpus-wide, within-doc repeats
    included — the suffix-array view of :func:`dup_window_positions`).

    Where :func:`strike_dup_substrings` REWRITES text, this only SCORES
    it — the ranking signal for "which documents are mostly boilerplate
    / likely to be memorized verbatim" (Lee et al. 2022 §5 correlate
    duplication with memorization) that a curation mix can threshold or
    sample against without touching the text.

    Same plan skeleton as the strike pass (one window-hash shuffle, dup
    set joined back, per-doc agg); novelty is exact integer ppm:
    ``(n_windows − n_dup) * 1e6 div n_windows``. Documents shorter than
    ``window_tokens`` have no windows and score novelty 1e6 (nothing
    measurable is duplicated).

    Returns (doc_id, n_windows, n_dup_windows, novelty_ppm).
    """
    toks = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    wins = toks.select(
        'doc_id',
        F.explode_outer(word_shingles(F.col('toks'), window_tokens))
        .alias('win'),
    ).select('doc_id', hash60(F.col('win')).alias('h'))
    dup_h = (wins.filter(F.col('h').isNotNull())
             .groupBy('h').agg(F.count(F.lit(1)).alias('cnt'))
             .filter(F.col('cnt') >= min_count).select('h', F.lit(1).alias('_d')))
    scored = wins.join(dup_h, 'h', 'left').groupBy('doc_id').agg(
        F.count(F.col('h')).cast('long').alias('n_windows'),
        F.sum(F.coalesce(F.col('_d'), F.lit(0))).cast('long')
        .alias('n_dup_windows'),
    )
    return scored.withColumn(
        'novelty_ppm',
        F.when(F.col('n_windows') > 0,
               F.expr('(n_windows - n_dup_windows) * 1000000L'
                      ' div n_windows'))
        .otherwise(F.lit(1_000_000).cast('long')),
    )
