"""CrawlConfig.respect_meta_robots — X-Robots-Tag page-level indexing
control wired into the engine (operators/directives.py): noindex pages
emit no items but keep docs/seen/links; nofollow pages keep their items
but their outlinks never reach the frontier or the host-rank lineage."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA


def _doc(u, spans):
    return {'doc_id': u, 'spans': spans, 'http_status': 200,
            'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}


def _spans(*parts):
    # text spans come in (quote, author) pairs for extract_items
    out = []
    for i, (kind, val) in enumerate(parts):
        out.append({'kind': kind, 'text': val, 'media_ref': None,
                    'offset': i})
    return out


def _chain_corpus(spark, tags):
    """p1 -> p2 -> p3 link chain, one (quote, author) item per page;
    ``tags`` maps page url -> robots_tag (None when absent)."""
    docs = [
        _doc('http://a.com/p1',
             _spans(('text', 'q1'), ('text', 'a1'),
                    ('link', 'http://a.com/p2'))),
        _doc('http://a.com/p2',
             _spans(('text', 'q2'), ('text', 'a2'),
                    ('link', 'http://a.com/p3'))),
        _doc('http://a.com/p3', _spans(('text', 'q3'), ('text', 'a3'))),
    ]
    df = spark.createDataFrame(docs, CORPUS_SCHEMA)
    tag = None
    for url, t in tags.items():
        cond = F.col('doc_id') == url
        tag = F.when(cond, F.lit(t)) if tag is None else tag.when(cond, F.lit(t))
    tag = F.lit(None).cast('string') if tag is None else tag.otherwise(F.lit(None))
    return df.withColumn('robots_tag', tag)


def _run(spark, corpus, **cfg_kwargs):
    cfg = CrawlConfig(max_waves=5, **cfg_kwargs)
    store = SnapshotStore(tempfile.mkdtemp(prefix='metarobots-'))
    return CrawlEngine(spark, corpus, config=cfg, store=store).run(
        ['http://a.com/p1'])


def test_nofollow_blocks_outlinks_but_keeps_items(spark):
    corpus = _chain_corpus(spark, {'http://a.com/p2': 'nofollow'})
    res = _run(spark, corpus, respect_meta_robots=True)
    reachable = {r['url'] for r in
                 res.seen.filter("status='reachable'").collect()}
    # p2's endorsement of p3 is void -> p3 never discovered
    assert reachable == {'http://a.com/p1', 'http://a.com/p2'}
    items = {r['quote'] for r in res.items.collect()}
    assert items == {'q1', 'q2'}   # nofollow page's CONTENT stays
    # lineage excludes the nofollow page's citations entirely
    assert res.links.filter(F.col('src_host') == 'a.com').count() == 1


def test_noindex_withholds_items_but_links_count(spark):
    corpus = _chain_corpus(spark, {'http://a.com/p1': 'noindex'})
    res = _run(spark, corpus, respect_meta_robots=True)
    reachable = {r['url'] for r in
                 res.seen.filter("status='reachable'").collect()}
    assert reachable == {'http://a.com/p1', 'http://a.com/p2',
                         'http://a.com/p3'}   # crawl unaffected
    items = {r['quote'] for r in res.items.collect()}
    assert items == {'q2', 'q3'}   # p1's content withheld
    docs = {r['doc_id'] for r in res.docs.collect()}
    assert 'http://a.com/p1' in docs   # the fetch record stays complete


def test_none_directive_implies_both(spark):
    corpus = _chain_corpus(spark, {'http://a.com/p2': 'none'})
    res = _run(spark, corpus, respect_meta_robots=True)
    reachable = {r['url'] for r in
                 res.seen.filter("status='reachable'").collect()}
    assert reachable == {'http://a.com/p1', 'http://a.com/p2'}
    items = {r['quote'] for r in res.items.collect()}
    assert items == {'q1'}   # p2 contributes neither items nor links


def test_default_off_ignores_tags_and_requires_column(spark):
    corpus = _chain_corpus(spark, {'http://a.com/p1': 'none',
                                   'http://a.com/p2': 'none'})
    res = _run(spark, corpus)   # knob off: tags invisible
    assert res.seen.filter("status='reachable'").count() == 3
    assert {r['quote'] for r in res.items.collect()} == {'q1', 'q2', 'q3'}
    # knob on without the column is a config error, caught at init
    bare = corpus.drop('robots_tag')
    with pytest.raises(ValueError, match='robots_tag'):
        _run(spark, bare, respect_meta_robots=True)
