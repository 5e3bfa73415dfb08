"""Line-level curation operators: corpus-wide line deduplication and
per-line boilerplate/quality filtering (the CCNet / RefinedWeb passes that
run BEFORE document-level dedup in a training-data pipeline).

Web pages share enormous amounts of per-line boilerplate — navigation,
cookie banners, footers — that document-level dedup can't see because the
surrounding content differs. The standard fix (CCNet; RefinedWeb §G)
deduplicates at line granularity: a line occurring in many documents is
boilerplate and is struck from every document; per-line quality rules
(too short, numeric-only, bullet) strike what frequency can't.

All pure JVM column algebra (no Python UDFs):

* line splitting is MAP-SIDE — an array-slice `transform` over the token
  array, no shuffle;
* line frequency is one hash-shuffle groupBy over 60-bit line hashes
  (~8 bytes/line through the exchange, not the line text);
* reassembly is one groupBy(doc_id) with an array_sort over (line_no,
  line) structs — per-doc line counts are bounded, so the collected array
  is small even when the corpus isn't.

At 10^10 documents the heavy-line set (lines in ≥ min_docs docs) is tiny
relative to the corpus — AQE will broadcast it in the anti-join; nothing
here carries document text through a shuffle except the final per-doc
regroup, which is unavoidable for reassembly and keyed on doc_id (the
natural partitioning of every adjacent pipeline stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60, tokens

# engine-portable (Java regex == RE2 here) boilerplate-line patterns
NUMERIC_LINE_RE = '^[0-9 .,%]+$'
BULLET_LINE_RE = '^[-*•]'


def split_token_lines(docs: DataFrame, line_tokens: int = 8) -> DataFrame:
    """Deterministic map-side line splitter for corpora stored as
    single-line token text (the synthetic `documents` table): regroup the
    whitespace tokens into fixed windows of ``line_tokens``.

    Real crawled text already has newlines — use :func:`split_lines` there.
    Returns (doc_id, line_no, line); zero shuffles.
    """
    # materialize the token array in its own projection first: there is no
    # common-subexpression elimination inside higher-order-function
    # lambdas, so slicing the raw split(text) expression would re-tokenize
    # the document once per line (the measured 7x trap documented at
    # texthash.word_shingles)
    with_toks = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    n_lines = F.ceil(F.size('toks') / F.lit(line_tokens)).cast('int')
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(
            F.slice('toks', i * line_tokens + 1, line_tokens), ' '
        ),
    )
    return with_toks.select('doc_id', F.posexplode(lines).alias('line_no', 'line'))


def split_lines(docs: DataFrame, delimiter: str = '\n') -> DataFrame:
    """Split document text on a literal delimiter into (doc_id, line_no,
    line). Map-side; the production splitter for real crawled text.
    The delimiter is regex-escaped — F.split takes a Java regex, so an
    unescaped '.' or '|' would silently split on every character."""
    import re

    parts = F.split(F.col('text'), F.lit(re.escape(delimiter)), -1)
    return docs.select('doc_id', F.posexplode(parts).alias('line_no', 'line'))


def _reassemble(kept_struct: Column) -> Column:
    """array_join over the line field of an array_sort'ed (line_no, line)
    struct list — the shared per-doc text rebuild."""
    return F.array_join(
        F.transform(F.array_sort(kept_struct), lambda s: s['line']), '\n'
    )


def line_dedup(
    docs: DataFrame, line_tokens: int = 8, min_docs: int = 2
) -> DataFrame:
    """Corpus-wide line deduplication: any line whose 60-bit hash occurs
    in ≥ ``min_docs`` DISTINCT documents is boilerplate — strike it from
    every document (including the first; CCNet keeps no canonical copy of
    a boilerplate line).

    Returns (doc_id, clean_text, n_lines, n_lines_removed) — one row per
    input document, ``clean_text = ''`` when every line was struck.

    Scale shape: the heavy-set groupBy shuffles 8-byte hashes (partial agg
    collapses per-partition repeats map-side); the membership join is a
    broadcast under AQE because the heavy set is the distinct boilerplate
    vocabulary, not the corpus; the only wide pass over text is the final
    groupBy(doc_id) reassembly.
    """
    lines = split_token_lines(docs, line_tokens).withColumn(
        'line_hash', hash60(F.col('line'))
    )
    heavy = (
        lines.groupBy('line_hash')
        .agg(F.count_distinct('doc_id').alias('n_docs'))
        .filter(F.col('n_docs') >= min_docs)
        .select('line_hash', F.lit(True).alias('is_heavy'))
    )
    marked = lines.join(heavy, 'line_hash', 'left')
    kept = F.when(
        F.col('is_heavy').isNull(), F.struct('line_no', 'line')
    )  # no otherwise -> NULL, and collect_list drops NULLs
    return marked.groupBy('doc_id').agg(
        _reassemble(F.collect_list(kept)).alias('clean_text'),
        F.count('*').alias('n_lines'),
        F.sum(F.when(F.col('is_heavy'), 1).otherwise(0))
        .cast('long')
        .alias('n_lines_removed'),
    )


def line_quality_flags(
    docs: DataFrame, line_tokens: int = 8, min_line_tokens: int = 3
) -> DataFrame:
    """Per-line boilerplate flags (the RefinedWeb/Gopher line rules kept
    engine-portable): too-short lines, numeric-only lines, bullet lines.

    Returns (doc_id, line_no, line, flag_short, flag_numeric, flag_bullet,
    keep) — entirely map-side after the splitter; zero shuffles.
    """
    lines = split_token_lines(docs, line_tokens)
    n_toks = F.size(tokens(F.col('line')))
    flag_short = n_toks < min_line_tokens
    flag_numeric = F.col('line').rlike(NUMERIC_LINE_RE)
    flag_bullet = F.col('line').rlike(BULLET_LINE_RE)
    return lines.select(
        'doc_id',
        'line_no',
        'line',
        flag_short.alias('flag_short'),
        flag_numeric.alias('flag_numeric'),
        flag_bullet.alias('flag_bullet'),
        (~(flag_short | flag_numeric | flag_bullet)).alias('keep'),
    )


def line_quality_filter(
    docs: DataFrame, line_tokens: int = 8, min_line_tokens: int = 3
) -> DataFrame:
    """Apply :func:`line_quality_flags` and rebuild per-document text from
    the kept lines. Returns (doc_id, clean_text, n_lines, n_lines_removed);
    one groupBy(doc_id) — the reassembly shuffle — and nothing else."""
    flags = line_quality_flags(docs, line_tokens, min_line_tokens)
    kept = F.when(F.col('keep'), F.struct('line_no', 'line'))
    return flags.groupBy('doc_id').agg(
        _reassemble(F.collect_list(kept)).alias('clean_text'),
        F.count('*').alias('n_lines'),
        F.sum(F.when(~F.col('keep'), 1).otherwise(0))
        .cast('long')
        .alias('n_lines_removed'),
    )
