"""C4-style page/line cleaning rules (Raffel et al. 2020, §2.2 of the
T5 paper; the same battery FineWeb/RefinedWeb re-use with tuned
thresholds).

These are the rules the C4 pipeline applies to Common Crawl text BEFORE
any dedup pass — they complement :mod:`lineops` (corpus-frequency line
dedup) and :mod:`textops.quality_scores` (document-level ratio features):

line level
  * keep only lines terminated by sentence punctuation (``. ! ? "``),
  * drop lines shorter than ``min_line_words`` words,
  * drop lines mentioning javascript,
  * drop cookie/policy boilerplate lines ("terms of use", "privacy
    policy", "cookie policy", "uses cookies");
page level
  * drop pages containing "lorem ipsum" (template placeholder residue),
  * drop pages containing a curly brace (leaked source code),
  * drop pages with fewer than ``min_kept_lines`` surviving lines
    (C4 uses 3 sentences).

Everything is JVM column algebra: the line split is the map-side
token-window ``transform`` from :func:`lineops.split_token_lines`, the
flags are regexp/`size` expressions, and the only shuffle is the per-doc
reassembly groupBy — the identical plan family (and cost) as
``lineops.line_quality_filter``, so the pass composes with line dedup
at no extra corpus scan. At 10^10 docs nothing but (doc_id, line) rows
move, and the doc-flag join is doc_id-keyed on both sides (AQE merges
the exchanges with the reassembly's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.operators.lineops import split_token_lines

# Java regex == RE2-compatible (no lookaround): engine-portable
TERMINAL_RE = '[.!?"]$'
POLICY_RE = '(terms of use|privacy policy|cookie policy|uses cookies)'
LOREM_RE = 'lorem ipsum'


def c4_line_flags(lines: DataFrame, min_line_words: int = 5) -> DataFrame:
    """Per-line C4 rule flags over ``(doc_id, line_no, line)`` rows.

    Adds ``ends_terminal``, ``too_short``, ``has_javascript``,
    ``is_policy`` and the verdict ``line_keep`` (terminal AND none of the
    strikes) — all map-side.
    """
    low = F.lower(F.col('line'))
    return (
        lines
        .withColumn('ends_terminal', F.col('line').rlike(TERMINAL_RE))
        .withColumn('too_short',
                    F.size(F.split(F.col('line'), ' ')) < min_line_words)
        .withColumn('has_javascript', low.contains('javascript'))
        .withColumn('is_policy', low.rlike(POLICY_RE))
        .withColumn(
            'line_keep',
            F.col('ends_terminal') & ~F.col('too_short')
            & ~F.col('has_javascript') & ~F.col('is_policy'),
        )
    )


def c4_filter(
    docs: DataFrame,
    line_tokens: int = 8,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The full C4 battery: line rules + page rules, one verdict row per
    input document.

    Returns ``(doc_id, clean_text, n_lines, n_lines_kept, has_lorem,
    has_brace, doc_keep)`` where ``clean_text`` is the newline-join of
    surviving lines in order and ``doc_keep`` is the page verdict
    (no lorem-ipsum, no brace, ≥ ``min_kept_lines`` surviving lines).
    """
    flagged = c4_line_flags(
        split_token_lines(docs, line_tokens=line_tokens),
        min_line_words=min_line_words,
    )
    per_doc = flagged.groupBy('doc_id').agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col('line_keep'),
                       F.struct('line_no', 'line'))
            )
        ).alias('_kept'),
        F.count(F.lit(1)).alias('n_lines'),
        F.sum(F.col('line_keep').cast('long')).alias('n_lines_kept'),
    ).withColumn(
        'clean_text',
        F.array_join(F.transform('_kept', lambda s: s['line']), '\n'),
    ).drop('_kept')

    low_text = F.lower(F.col('text'))
    doc_flags = docs.select(
        'doc_id',
        low_text.contains(LOREM_RE).alias('has_lorem'),
        F.col('text').contains('{').alias('has_brace'),
    )
    return (
        per_doc.join(doc_flags, 'doc_id')
        .withColumn(
            'doc_keep',
            ~F.col('has_lorem') & ~F.col('has_brace')
            & (F.col('n_lines_kept') >= min_kept_lines),
        )
        .select('doc_id', 'clean_text', 'n_lines', 'n_lines_kept',
                'has_lorem', 'has_brace', 'doc_keep')
    )
