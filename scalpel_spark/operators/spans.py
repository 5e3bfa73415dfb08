"""Span-sequence integrity operators over interleaved text+media documents.

The north rule requires "per-row span-sequence equality (kind, text,
media_ref, order) on every emitted document" versus the reference crawl
(reference emit path: ``any_io/static_spider.py:143`` hands the parsed
page to ``parse``; our engine carries the spans array through
unchanged).  At test scale that invariant is checked row-by-row in
pytest; at 10^10 documents a row comparison is a job, not an assert.
This module makes the invariant itself a scalable operator:

* :func:`span_signature_col` — one 60-bit fingerprint per document over
  the ORDERED span sequence ``(kind, text, media_ref, offset)``.  Pure
  JVM column algebra (``transform`` + ``array_join`` + md5, whole-stage
  codegen) evaluated map-side: no shuffle, no Python, and the md5-derived
  :func:`~scalpel_spark.functions.texthash.hash60` form is bit-identical
  in DuckDB so the driver's oracle gate can pin it.
* :func:`span_stats` — per-document span composition (text/link/media
  counts, text volume).  Map-side projection; aggregate what you need on
  top of it.
* :func:`span_parity` — the distributed equality check between two
  document sets (e.g. emitted docs vs the source corpus, or two engine
  versions): each side is reduced map-side to a slim ``(doc_id,
  signature)`` projection, then ONE full-outer shuffle join on
  ``doc_id`` classifies every document as ``match`` / ``mismatch`` /
  ``left_only`` / ``right_only``.  At 10^10 rows the shuffle carries
  ~8 bytes of signature + the key per row per side — this is the plan
  you'd want for a 100 TB parity audit, and Catalyst prunes the spans
  read down to the signature expression's inputs.

Separators use ASCII unit/record separators (``\\x1f`` / ``\\x1e``) so
span text containing ``|`` or commas cannot alias two different
sequences onto one canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60

_FIELD_SEP = '\x1f'  # between (kind, text, media_ref, offset)
_SPAN_SEP = '\x1e'   # between spans
_NULL_MARK = '\x00N'  # distinguishes NULL from empty string


def _canon_field(col: Column) -> Column:
    return F.coalesce(col, F.lit(_NULL_MARK))


def span_canonical_col(spans: Column | None = None) -> Column:
    """Canonical string of the ordered span sequence.

    ``transform`` preserves array order, so document order (the reference
    emits spans in parse order) is part of the canonical form; two
    documents with the same spans in different order get different
    strings.  NULL text/media_ref is marked distinctly from ``''``.
    """
    spans = F.col('spans') if spans is None else spans
    return F.array_join(
        F.transform(
            spans,
            lambda s: F.concat_ws(
                _FIELD_SEP,
                _canon_field(s['kind']),
                _canon_field(s['text']),
                _canon_field(s['media_ref']),
                _canon_field(s['offset'].cast('string')),
            ),
        ),
        _SPAN_SEP,
    )


def span_signature_col(spans: Column | None = None) -> Column:
    """60-bit BIGINT fingerprint of the ordered span sequence.

    md5-derived (:func:`hash60`) so a DuckDB oracle can pin the exact
    values; production deployments can swap ``F.xxhash64`` over the same
    canonical string for a faster JVM hash with identical semantics.
    """
    return hash60(span_canonical_col(spans))


def with_span_signature(docs: DataFrame, out: str = 'span_sig') -> DataFrame:
    return docs.withColumn(out, span_signature_col())


def span_stats(docs: DataFrame) -> DataFrame:
    """Per-document span composition: counts by kind and total text volume.

    Map-side only (``filter``/``aggregate`` over the array — no explode,
    no shuffle): at 10^10 docs this is a projection, and any rollup on
    top of it is one aggregation shuffle.
    """
    spans = F.col('spans')

    def count_kind(kind: str) -> Column:
        return F.size(F.filter(spans, lambda s: s['kind'] == F.lit(kind)))

    text_chars = F.aggregate(
        F.filter(spans, lambda s: s['kind'] == F.lit('text')),
        F.lit(0).cast('long'),
        lambda acc, s: acc + F.coalesce(F.length(s['text']).cast('long'), F.lit(0)),
    )
    return docs.select(
        'doc_id',
        F.size(spans).cast('long').alias('n_spans'),
        count_kind('text').cast('long').alias('n_text'),
        count_kind('link').cast('long').alias('n_link'),
        count_kind('media').cast('long').alias('n_media'),
        text_chars.alias('text_chars'),
    )


def span_parity(left: DataFrame, right: DataFrame, id_col: str = 'doc_id') -> DataFrame:
    """Distributed span-sequence equality between two document sets.

    Returns one row per document id present on either side with
    ``status`` in {'match', 'mismatch', 'left_only', 'right_only'}.
    Both inputs are projected map-side to ``(id, signature)`` before the
    single full-outer equi-join, so the only shuffle moves 16 bytes/row;
    a 100 TB spans payload never crosses the wire.
    """
    lsig = left.select(F.col(id_col), span_signature_col().alias('_lsig'))
    rsig = right.select(F.col(id_col), span_signature_col().alias('_rsig'))
    joined = lsig.join(rsig, on=id_col, how='full_outer')
    status = (
        F.when(F.col('_lsig').isNull(), F.lit('right_only'))
        .when(F.col('_rsig').isNull(), F.lit('left_only'))
        .when(F.col('_lsig') == F.col('_rsig'), F.lit('match'))
        .otherwise(F.lit('mismatch'))
    )
    return joined.select(F.col(id_col), status.alias('status'))


def span_parity_summary(left: DataFrame, right: DataFrame, id_col: str = 'doc_id') -> DataFrame:
    """Aggregate of :func:`span_parity` — the 4-row audit verdict."""
    return (
        span_parity(left, right, id_col)
        .groupBy('status')
        .agg(F.count('*').alias('n_docs'))
    )
