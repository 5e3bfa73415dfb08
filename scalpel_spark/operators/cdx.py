"""CDX-style capture index over crawl results — the web-archive lookup
layout (Heritrix/OpenWayback/Common Crawl CDX(J)).

A crawl's at-rest output is queried by URL and by content digest: "what
captures exist for this URL prefix", "which captures are revisits of
content already archived". The CDX answer is one index row per capture,
keyed by SURT urlkey so one sorted layout serves both prefix lookups and
per-domain scans, with digest-based REVISIT records (a capture whose
payload digest was already archived stores a pointer at the original
capture instead of a second payload — WARC `revisit` record semantics).

Scale shape:

* one row per emitted document, all capture fields map-side
  (``surt_key_col`` string algebra + ``span_signature_col`` fingerprint);
* revisit classification is ONE window shuffle on ``digest``
  (row_number over (wave, urlkey, url) — first capture is the original,
  deterministically, no driver state);
* ``write_cdx`` range-partitions on (urlkey, wave) — the archive's
  sorted at-rest order — so a prefix lookup prunes to one partition
  range, and ``cdx_lookup``'s ``startswith`` filter pushes down to the
  parquet scan (StringStartsWith in PushedFilters).

The digest is the span-sequence fingerprint (operators/spans) — the
north-rule invariant key — so "same digest" is exactly "same emitted
(kind, text, media_ref, order) sequence".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.urls import surt_key_col
from scalpel_spark.operators.spans import span_signature_col


def cdx_index(docs: DataFrame, url_col: str = 'doc_id',
              wave_col: str = 'wave') -> DataFrame:
    """One capture row per document: (urlkey, url, wave, digest, n_spans,
    content_chars, revisit, original_wave).

    ``revisit`` marks captures whose digest already appeared in an
    earlier capture (ordered by (wave, urlkey, url) — wave first, so an
    earlier crawl always owns the original; urlkey/url break within-wave
    ties deterministically). ``original_wave`` is the wave holding the
    archived payload this capture points at (its own wave for originals).
    """
    url = F.col(url_col)
    base = docs.select(
        surt_key_col(url).alias('urlkey'),
        url.alias('url'),
        F.col(wave_col).cast('int').alias('wave'),
        span_signature_col(F.col('spans')).alias('digest'),
        F.size('spans').cast('long').alias('n_spans'),
        # TEXT spans only (same filter as spans.span_stats): link spans
        # store the outlink URL in their text field, and media spans may
        # carry captions — neither is archived payload size
        F.aggregate(
            F.filter(F.col('spans'), lambda s: s['kind'] == F.lit('text')),
            F.lit(0).cast('long'),
            lambda acc, s: acc
            + F.coalesce(F.length(s['text']).cast('long'), F.lit(0)),
        ).alias('content_chars'),
    )
    w = Window.partitionBy('digest').orderBy('wave', 'urlkey', 'url')
    return (
        base.withColumn('_rn', F.row_number().over(w))
        .withColumn('original_wave', F.first('wave').over(w))
        .withColumn('revisit', F.col('_rn') > 1)
        .drop('_rn')
    )


def write_cdx(cdx: DataFrame, path: str, num_files: int = 8) -> None:
    """Persist the index in archive order: range-partitioned on
    (urlkey, wave) and sorted within each file, so file N holds one
    contiguous SURT range — a prefix lookup reads one file range, and a
    full-domain scan is a sequential read. Same layout discipline as the
    SURT-sorted frontier (plans/storage.write_surt_sorted)."""
    (cdx.repartitionByRange(num_files, 'urlkey', 'wave')
     .sortWithinPartitions('urlkey', 'wave')
     .write.mode('overwrite').parquet(path))


def cdx_lookup(cdx: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a domain: ``'org,example,'``; a
    host: ``'org,example,www)'``; a subtree: ``'org,example,www)/docs'``),
    in archive order. ``startswith`` compiles to StringStartsWith and
    reaches the parquet scan's PushedFilters over a ``write_cdx`` layout —
    the lookup prunes, it does not scan."""
    return (cdx.filter(F.col('urlkey').startswith(surt_prefix))
            .orderBy('urlkey', 'wave'))
