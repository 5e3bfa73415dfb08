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
