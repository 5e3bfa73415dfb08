"""Streaming curation: the incremental twin of ``curation.curate``'s
quality-gate + exact-dedup stages, for document streams that arrive as
the crawl emits them (instead of re-running the batch pipeline over the
whole corpus per day).

Stage mapping vs the batch pipeline:

* quality gate      → identical map-side expression, per micro-batch
* exact dedup       → ``dropDuplicatesWithinWatermark`` keyed on the
  normalized-text 60-bit fingerprint — state is the recent-seen
  fingerprint set and IS evicted once the watermark passes (the same
  honestly-bounded-state argument as
  ``frontier_stream.dedup_discovered``); the durable full fingerprint
  set lives in the committed corpus, reconciled by a periodic batch
  anti-join exactly like the URL seen table
* near-dup / clustering → NOT streamable (pair joins need the corpus);
  runs as the periodic batch stage over accumulated survivors

Everything before the dedup state op is per-row column algebra — no
shuffles in the micro-batch beyond the state-store exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60, pround
from scalpel_spark.operators.textops import norm_col, quality_feature_cols

DOC_EVENT_SCHEMA = 'doc_id LONG, text STRING, ts TIMESTAMP'


def curate_stream(stream: DataFrame, quality_threshold: float = 0.45,
                  watermark: str = '1 hour') -> DataFrame:
    """Quality-gate then fingerprint-dedup a document stream.

    Returns the kept documents as (doc_id, ts, fingerprint, score) —
    first sighting of each normalized fingerprint wins; low-quality docs
    never reach the dedup state store (gate first = smaller state).
    """
    feats = quality_feature_cols(F.col('text'))
    scored = stream.select(
        'doc_id', 'ts',
        hash60(norm_col(F.col('text'))).alias('fingerprint'),
        pround(feats['score'], 4).alias('score'),
    ).filter(F.col('score') >= quality_threshold)
    return (
        scored.withWatermark('ts', watermark)
        .dropDuplicatesWithinWatermark(['fingerprint'])
    )
