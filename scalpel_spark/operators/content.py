"""Main-content extraction over interleaved span documents: media-caption
alignment, link-run boilerplate classification, and cross-page host
template detection/stripping.

The reference hands the raw parsed page to user callbacks and stops
(``core/response.py:77-116`` exposes the DOM, ``core/spider.py:92`` hands
items to processors); a production crawl that feeds an LLM-data pipeline
has to decide *which spans are content* before dedup/quality ever run —
nav bars, footers, and related-links blocks otherwise dominate MinHash
signatures and token budgets. These operators make that decision over the
engine's span model (``kind``, ``text``, ``media_ref``, ``offset`` — the
north-rule invariant order) in pure JVM column algebra.

Scale shape at 100 TB:

* :func:`media_captions` / :func:`classify_spans` — ONE shuffle, by
  ``doc_id``, carrying slim projected span rows (pos, kind, clipped
  text); every window is per-document, and documents are bounded, so no
  key is skewed. Nothing re-reads the spans array twice.
* :func:`host_templates` — explode → distinct(host, fp, doc) →
  groupBy(host, fp): two partial-agg shuffles whose key space is
  host x distinct-span, far smaller than the corpus.
* :func:`strip_templates` — the detected template fingerprints are
  collected to ≤ ``max_fps_per_host`` rows per host and broadcast; the
  strip itself is a map-side ``F.filter`` over the spans array. No
  shuffle touches the documents at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.urls import host_col

__all__ = [
    'classify_spans',
    'extract_main_content',
    'host_templates',
    'media_captions',
    'span_fingerprint',
    'strip_templates',
]


def _exploded(docs: DataFrame, id_col: str, clip: int) -> DataFrame:
    """Slim per-span rows: (doc_id, pos, kind, text, media_ref).

    ``pos`` is the array position — the north-rule span order (array
    order, tie-broken by ``offset`` upstream). ``text`` is clipped to
    ``clip`` chars so the doc_id shuffle moves bounded rows even when a
    span holds a full article.
    """
    return docs.select(
        F.col(id_col).alias('doc_id'),
        F.posexplode('spans').alias('pos', 's'),
    ).select(
        'doc_id', 'pos',
        F.col('s.kind').alias('kind'),
        F.substring(F.col('s.text'), 1, clip).alias('text'),
        F.col('s.media_ref').alias('media_ref'),
    )


def media_captions(docs: DataFrame, id_col: str = 'doc_id',
                   max_gap: int = 3, clip: int = 200) -> DataFrame:
    """Caption candidates for every media span: the nearest text span by
    span order, looking both directions, ties to the preceding side (the
    caption-under-image convention is handled by the symmetric ``gap``
    column — callers preferring following text flip the tie themselves).

    Returns (doc_id, pos, media_ref, caption, caption_side, gap) — one
    row per media span; ``caption`` is NULL when no text span lies within
    ``max_gap`` positions. ``caption_side`` ∈ {'prev', 'next', NULL}.

    Plan: one doc_id shuffle; two running-window lookups (last preceding
    / first following text span) over slim rows, then a media-only
    filter. Per-document windows never skew: a document is bounded.
    """
    ex = _exploded(docs, id_col, clip)
    w = Window.partitionBy('doc_id').orderBy('pos')
    txt = F.when(F.col('kind') == 'text',
                 F.struct(F.col('pos').alias('tpos'), F.col('text').alias('ttext')))
    prev_t = F.last(txt, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    next_t = F.first(txt, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing))
    cand = (
        ex.withColumn('_p', prev_t).withColumn('_n', next_t)
        .filter(F.col('kind') == 'media')
    )
    prev_gap = F.col('pos') - F.col('_p.tpos')
    next_gap = F.col('_n.tpos') - F.col('pos')
    use_prev = F.col('_p').isNotNull() & (
        F.col('_n').isNull() | (prev_gap <= next_gap))
    side = (
        F.when(use_prev & (prev_gap <= max_gap), F.lit('prev'))
        .when((~use_prev) & (next_gap <= max_gap), F.lit('next'))
    )
    return cand.select(
        'doc_id',
        F.col('pos').cast('int').alias('pos'),
        'media_ref',
        F.when(side == 'prev', F.col('_p.ttext'))
         .when(side == 'next', F.col('_n.ttext')).alias('caption'),
        side.alias('caption_side'),
        F.when(side == 'prev', prev_gap)
         .when(side == 'next', next_gap).cast('int').alias('gap'),
    )


def classify_spans(docs: DataFrame, id_col: str = 'doc_id',
                   min_link_run: int = 3, min_text_chars: int = 25,
                   clip: int = 1000) -> DataFrame:
    """Per-span content/boilerplate labels via link-run density — the
    block-level link-density heuristic (Boilerpipe / Arc90 readability
    family) restated over span runs instead of DOM blocks.

    Rules, in order:

    1. a maximal run of ≥ ``min_link_run`` consecutive ``link`` spans is
       a navigation block → every span in it is ``boiler`` ('nav_run');
    2. a ``text`` span shorter than ``min_text_chars`` whose neighbours
       on BOTH sides are links is furniture caught between nav items →
       ``boiler`` ('short_between_links');
    3. everything else — text, media, and isolated links — is
       ``content`` (isolated links are in-prose citations).

    Returns (doc_id, pos, kind, label, reason). The run detection is the
    gaps-and-islands identity (row_number − per-kind row_number is
    constant within a maximal same-kind run) — one doc_id shuffle, three
    per-document windows, no self-joins.
    """
    ex = _exploded(docs, id_col, clip)
    w = Window.partitionBy('doc_id').orderBy('pos')
    ex = (
        ex.withColumn('_rn', F.row_number().over(w))
        .withColumn('_rk', F.row_number().over(
            Window.partitionBy('doc_id', 'kind').orderBy('pos')))
        .withColumn('_island', F.col('_rn') - F.col('_rk'))
    )
    run_len = F.count('*').over(
        Window.partitionBy('doc_id', 'kind', '_island'))
    ex = ex.withColumn('_run', run_len)
    prev_kind = F.lag('kind').over(w)
    next_kind = F.lead('kind').over(w)
    nav = (F.col('kind') == 'link') & (F.col('_run') >= min_link_run)
    short_between = (
        (F.col('kind') == 'text')
        & (F.length(F.coalesce(F.col('text'), F.lit(''))) < min_text_chars)
        & (prev_kind == 'link') & (next_kind == 'link')
    )
    reason = (
        F.when(nav, F.lit('nav_run'))
        .when(short_between, F.lit('short_between_links'))
    )
    return ex.select(
        'doc_id', F.col('pos').cast('int').alias('pos'), 'kind',
        F.when(reason.isNotNull(), F.lit('boiler'))
         .otherwise(F.lit('content')).alias('label'),
        reason.alias('reason'),
    )


def extract_main_content(docs: DataFrame, id_col: str = 'doc_id',
                         min_link_run: int = 3, min_text_chars: int = 25,
                         clip: int = 1000) -> DataFrame:
    """Document-level rollup of :func:`classify_spans`: the cleaned text
    (content-labelled ``text`` spans concatenated in span order) plus
    span-economy counters.

    Returns (doc_id, main_text, n_content, n_boiler, content_chars).
    One extra shuffle over :func:`classify_spans` (the per-doc regroup);
    text is re-clipped to ``clip`` chars per span before the concat so
    the grouped rows stay bounded.
    """
    labelled = classify_spans(docs, id_col, min_link_run, min_text_chars, clip)
    kept_text = F.when(
        (F.col('label') == 'content') & (F.col('kind') == 'text'),
        F.struct('pos', 'text'))
    ex = _exploded(docs, id_col, clip).select('doc_id', 'pos', 'text').join(
        labelled.select('doc_id', 'pos', 'kind', 'label'), ['doc_id', 'pos'])
    return (
        ex.groupBy('doc_id')
        .agg(
            F.array_sort(F.collect_list(kept_text)).alias('_kept'),
            F.sum(F.when(F.col('label') == 'content', 1).otherwise(0))
             .cast('long').alias('n_content'),
            F.sum(F.when(F.col('label') == 'boiler', 1).otherwise(0))
             .cast('long').alias('n_boiler'),
        )
        .select(
            'doc_id',
            F.array_join(F.transform('_kept', lambda s: s['text']), ' ')
             .alias('main_text'),
            'n_content', 'n_boiler',
            F.aggregate('_kept', F.lit(0).cast('long'),
                        lambda acc, s: acc + F.length(s['text']))
             .alias('content_chars'),
        )
    )


def span_fingerprint(kind, text, media_ref) -> F.Column:
    """Order-free identity of one span: xxhash64 over (kind, text,
    media_ref) with NULL sentinels — two spans with the same fingerprint
    render identically wherever they appear.
    """
    return F.xxhash64(
        kind,
        F.coalesce(text, F.lit('\x00')),
        F.coalesce(media_ref, F.lit('\x00')),
    )


def host_templates(docs: DataFrame, id_col: str = 'doc_id',
                   min_pages: int = 4, min_share_pct: int = 60) -> DataFrame:
    """Cross-page template spans per host: a span (by fingerprint) that
    renders identically on ≥ ``min_share_pct`` % of a host's pages (and
    the host has ≥ ``min_pages`` pages) is sitewide furniture — the
    header/footer/nav the same CMS template stamps on every page. This
    is the cross-document complement of :func:`classify_spans`' local
    link-run rule, the CCNet/RefinedWeb observation applied at span
    granularity instead of line granularity.

    Returns (host, fp, kind, sample_text, n_docs, host_docs, share_pct).

    Plan: explode → per-(host, fp, doc) distinct collapse → ONE
    groupBy(host, fp) with max-sample carry; host page counts ride a
    broadcast-sized side agg. No URL×URL or doc×doc pair is ever formed.
    """
    host = host_col(F.col(id_col))
    per_doc = (
        docs.select(host.alias('host'), F.col(id_col).alias('doc_id'),
                    F.explode('spans').alias('s'))
        .select(
            'host', 'doc_id',
            span_fingerprint(F.col('s.kind'), F.col('s.text'),
                             F.col('s.media_ref')).alias('fp'),
            F.col('s.kind').alias('kind'),
            F.substring(F.coalesce(F.col('s.text'), F.col('s.media_ref')),
                        1, 80).alias('sample_text'),
        )
        .groupBy('host', 'fp', 'doc_id')
        .agg(F.max('kind').alias('kind'), F.max('sample_text').alias('sample_text'))
    )
    counts = per_doc.groupBy('host', 'fp').agg(
        F.count('*').alias('n_docs'),
        F.max('kind').alias('kind'),
        F.max('sample_text').alias('sample_text'),
    )
    host_docs = docs.groupBy(host.alias('host')).agg(
        F.count('*').alias('host_docs'))
    out = counts.join(F.broadcast(host_docs), 'host')
    share = (F.col('n_docs') * 100) / F.col('host_docs')
    return (
        out.filter((F.col('host_docs') >= min_pages)
                   & (share >= min_share_pct))
        .select('host', 'fp', 'kind', 'sample_text',
                F.col('n_docs').cast('long').alias('n_docs'),
                F.col('host_docs').cast('long').alias('host_docs'),
                share.cast('long').alias('share_pct'))
    )


def strip_templates(docs: DataFrame, templates: DataFrame,
                    id_col: str = 'doc_id',
                    max_fps_per_host: int = 256) -> DataFrame:
    """Remove detected template spans from every document, preserving the
    span-sequence order of the survivors (the north-rule invariant holds
    on what remains).

    ``templates`` is :func:`host_templates` output (or any (host, fp)
    frame). Per host the fingerprints are collected into ONE array row —
    capped at ``max_fps_per_host`` by (n_docs DESC, fp) when the column
    is present, so a pathological host cannot bloat the broadcast — then
    broadcast-joined and applied as a map-side ``F.filter`` over the
    spans array. The documents themselves never shuffle.

    Returns the input frame with ``spans`` filtered and an
    ``n_stripped`` count per document.
    """
    t = templates.select('host', 'fp', *(
        [F.col('n_docs')] if 'n_docs' in templates.columns else []))
    if 'n_docs' in templates.columns:
        w = Window.partitionBy('host').orderBy(F.col('n_docs').desc(), 'fp')
        t = (t.withColumn('_r', F.row_number().over(w))
             .filter(F.col('_r') <= max_fps_per_host))
    fps = t.groupBy('host').agg(F.collect_set('fp').alias('_tpl_fps'))
    host = host_col(F.col(id_col))
    joined = docs.withColumn('_host', host).join(
        F.broadcast(fps), F.col('_host') == F.col('host'), 'left').drop('host')
    tpl = F.coalesce(F.col('_tpl_fps'), F.array().cast('array<bigint>'))
    keep = F.filter(
        'spans',
        lambda s: ~F.array_contains(
            tpl, span_fingerprint(s['kind'], s['text'], s['media_ref'])))
    return (
        joined
        .withColumn('n_stripped',
                    (F.size('spans') - F.size(keep)).cast('long'))
        .withColumn('spans', keep)
        .drop('_host', '_tpl_fps')
    )


def caption_pairs(docs: DataFrame, id_col: str = 'doc_id',
                  max_gap: int = 3, min_caption_chars: int = 4,
                  clip: int = 200) -> DataFrame:
    """(media_ref, caption) training pairs — the CLIP-style dataset a
    multimodal pipeline extracts from interleaved documents: every media
    span's aligned caption from :func:`media_captions`, deduplicated per
    media_ref keeping the best caption (longest, ties to the
    lexicographically greatest string — fully deterministic).

    Returns (media_ref, caption, caption_side, gap, n_occurrences) —
    one row per distinct media asset; ``n_occurrences`` counts how many
    placements produced a usable caption. One extra groupBy(media_ref)
    over :func:`media_captions`' output; the winner is taken with a
    max_by-equivalent struct-max so no window task ever holds a hot
    asset's full placement list.
    """
    cap = (
        media_captions(docs, id_col, max_gap, clip)
        .filter(F.col('caption').isNotNull()
                & (F.length('caption') >= min_caption_chars))
    )
    best = F.struct(
        F.length('caption').alias('_len'),
        F.col('caption').alias('_cap'),
        F.col('caption_side').alias('_side'),
        F.col('gap').alias('_gap'),
    )
    return (
        cap.groupBy('media_ref')
        .agg(F.max(best).alias('_b'),
             F.count('*').alias('n_occurrences'))
        .select('media_ref',
                F.col('_b._cap').alias('caption'),
                F.col('_b._side').alias('caption_side'),
                F.col('_b._gap').alias('gap'),
                F.col('n_occurrences').cast('long').alias('n_occurrences'))
    )


def pack_interleaved(docs: DataFrame, seq_tokens: int, media_tokens: int = 64,
                     id_col: str = 'doc_id', n_buckets: int = 64) -> DataFrame:
    """Media-aware concat-and-chunk packing of interleaved documents:
    the GPT-style sequence layout of `curation.pack_sequences`, with each
    document costed as

        n_text_tokens  (whitespace tokens over its text spans)
      + n_media_spans · ``media_tokens``   (the fixed vision-token budget
        an interleaved consumer spends per media placement)

    Returns (doc_id, n_tokens, n_text_tokens, n_media_spans, cum_before,
    seq_id, offset, spans_boundary). The per-doc costing is pure
    map-side array algebra (no explode); the global layout reuses the
    bucket-decomposed prefix sum — no single-task sort at any scale.
    """
    from scalpel_spark.operators.curation import packed_layout

    text_tokens = F.aggregate(
        F.filter('spans', lambda s: s['kind'] == 'text'),
        F.lit(0).cast('long'),
        lambda acc, s: acc + F.size(F.split(F.coalesce(s['text'], F.lit('')),
                                            ' ')))
    n_media = F.size(F.filter('spans', lambda s: s['kind'] == 'media'))
    costed = docs.select(
        F.col(id_col).alias('doc_id'),
        text_tokens.alias('n_text_tokens'),
        n_media.cast('long').alias('n_media_spans'),
    ).withColumn(
        'n_tokens',
        F.col('n_text_tokens') + F.col('n_media_spans') * media_tokens)
    return packed_layout(costed, seq_tokens, n_buckets,
                         carry=['n_text_tokens', 'n_media_spans'])
