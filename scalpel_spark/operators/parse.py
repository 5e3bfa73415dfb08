"""Parse stage: outlink extraction + item emission — pure column algebra.

The reference's parse is user Python invoked per response
(``any_io/static_spider.py:143``); here the corpus rows already carry spans,
so "parse" is declarative: filter/posexplode over the spans array. Document
order (the reference iterates the selector list in DOM order,
``tests/any_io/test_static_spider.py:336-344``) is the array order, so
``posexplode`` over the *link-filtered* subarray yields the link's ordinal
among links directly — no window, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINK_RULES = ('all', 'second_contains_page')


def _links_array(spans: Column) -> Column:
    return F.filter(spans, lambda s: s['kind'] == F.lit('link'))


def extract_outlinks(docs: DataFrame, link_rule: str = 'all') -> DataFrame:
    """docs must carry (url, priority, spans). Returns
    (parent_url, parent_priority, pos, raw_link) in document order.

    link_rule='second_contains_page' reproduces the reference integration
    parse ``//a[2][contains(@href, "page")]``
    (tests/any_io/test_static_spider.py:344-347).
    """
    exploded = docs.select(
        F.col('url').alias('parent_url'),
        F.col('priority').alias('parent_priority'),
        F.posexplode(_links_array(F.col('spans'))).alias('pos', 'span'),
    ).select('parent_url', 'parent_priority', 'pos', F.col('span.text').alias('raw_link'))
    if link_rule == 'all':
        return exploded
    if link_rule == 'second_contains_page':
        return exploded.filter((F.col('pos') == 1) & F.col('raw_link').contains('page'))
    raise ValueError(f'unknown link_rule: {link_rule}')


def extract_items(docs: DataFrame) -> DataFrame:
    """(quote, author) pairs from consecutive kind='text' spans in array
    order — the span-model equivalent of the reference's blockquote
    p/footer zip (tests/any_io/test_static_spider.py:336-343).

    Returns (doc_id, quote, author, item_seq).
    """
    texts = F.filter(F.col('spans'), lambda s: s['kind'] == F.lit('text'))
    # guard: F.sequence(0, -1) yields a DESCENDING [0, -1] (not empty!), so
    # a doc with <2 text spans would probe element_at(texts, 0) and throw —
    # emit no pairs instead
    n_pairs = F.floor(F.size(texts) / 2).cast('int')
    pairs = F.transform(
        F.when(n_pairs > 0, F.sequence(F.lit(0), n_pairs - 1)).otherwise(
            F.array().cast('array<int>')),
        lambda k: F.struct(
            F.element_at(texts, k * 2 + 1)['text'].alias('quote'),
            F.element_at(texts, k * 2 + 2)['text'].alias('author'),
            k.cast('int').alias('item_seq'),
        ),
    )
    return (
        docs.select(F.col('url').alias('doc_id'), F.explode(pairs).alias('p'))
        .select('doc_id', 'p.quote', 'p.author', 'p.item_seq')
    )


def link_context(docs: DataFrame) -> DataFrame:
    """Anchor-context extraction: for every link span, the text of the
    NEAREST PRECEDING ``kind='text'`` span in document order — the span
    model's stand-in for anchor text (the reference's parse callbacks see
    the DOM and could read ``//a/text()``; interleaved span corpora carry
    the href in the link span itself, so context comes from the
    surrounding prose). Classic IR signal: anchor/context terms describe
    the TARGET page (Brin & Page 1998 §2.2), feeding ranking and
    training-data labeling.

    Pure array-local column algebra — zero shuffle, no UDF: per document,
    the 1-based positions of link spans are filtered out of a
    ``sequence(1, size)`` (guarded: ``sequence(0, -1)`` DESCENDS, so empty
    span arrays emit nothing), and each link's context is the last text
    span in the ``slice`` before it (``F.get`` returns NULL at index -1,
    so a link with no preceding prose gets context NULL, never a throw
    under ANSI mode).

    docs must carry (url, spans). Returns one row per link span:
    (url, pos, span_idx, raw_link, context) where pos is the link ordinal
    among links (matching extract_outlinks) and span_idx the 0-based
    position in the spans array.
    """
    spans = F.col('spans')
    link_idxs = F.when(
        F.size(spans) > 0,
        F.filter(F.sequence(F.lit(1), F.size(spans)),
                 lambda i: F.element_at(spans, i)['kind'] == F.lit('link')),
    ).otherwise(F.array().cast('array<int>'))
    rows = F.transform(
        link_idxs,
        lambda i: F.struct(
            (i - 1).cast('int').alias('span_idx'),
            F.element_at(spans, i)['text'].alias('raw_link'),
            _last_text(F.slice(spans, F.lit(1), i - 1)).alias('context'),
        ),
    )
    return (
        docs.select('url', F.posexplode(rows).alias('pos', 'l'))
        .select('url', F.col('pos').cast('int').alias('pos'),
                'l.span_idx', 'l.raw_link', 'l.context')
    )


def _last_text(preceding: Column) -> Column:
    texts = F.filter(preceding, lambda s: s['kind'] == F.lit('text'))
    return F.get(texts, F.size(texts) - 1)['text']


def anchor_text_profile(links: DataFrame) -> DataFrame:
    """Per-target anchor profile over ``link_context`` output: how many
    references point at each raw link target, from how many distinct
    source documents, and the lexicographic min/max of the non-null
    contexts (a bounded summary — collecting every context string per
    target would make hub targets into multi-MB rows at web scale).

    One hash-shuffle groupBy on the target; all aggregates map-side
    combinable. Returns (raw_link, n_refs, n_docs, first_context,
    last_context).
    """
    return links.groupBy('raw_link').agg(
        F.count('*').alias('n_refs'),
        F.countDistinct('url').alias('n_docs'),
        F.min('context').alias('first_context'),
        F.max('context').alias('last_context'),
    )
