"""S5 selenium render mode — divergent DOM documents (VERDICT r4 #6).

Reference semantics: SeleniumSpider subclasses the WHOLE static crawl
loop (any_io/selenium_spider.py:17-21) — frontier, dedup, robots,
politeness identical — and differs only in what the fetch produced: the
browser-rendered DOM (core/selenium.py:14-39), plus a file:// quirk
(`_handle_url` hard-errors the file scheme → unreachable,
any_io/selenium_spider.py:70-73, where StaticSpider reads the file,
any_io/static_spider.py:116-127).

Engine mapping: CrawlConfig(render_mode='dom') emits
coalesce(dom_spans, spans) per document and marks file:// rows
unreachable; render_mode='static' (default) is bit-identical to the
pre-knob engine. Links are extracted from the RENDERED spans, so a
JS-injected link span is followed in dom mode only — the SPA case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import (
    CORPUS_SCHEMA,
    golden_site,
    with_dom_variants,
)

SEEDS = ['http://quotes.com']


def _crawl(spark, corpus, **cfg_kw):
    cfg = CrawlConfig(link_rule='second_contains_page', **cfg_kw)
    return CrawlEngine(spark, corpus, config=cfg).run(SEEDS)


def test_static_mode_ignores_dom_variants(spark):
    """render_mode='static' on a dom_spans-bearing corpus matches the
    plain corpus crawl exactly — the knob is inert by default."""
    plain = golden_site(spark, 'http')
    variant = with_dom_variants(plain, dom_mod=2, seed=2)
    a = _crawl(spark, plain)
    b = _crawl(spark, variant, render_mode='static')
    assert a.fetch_sequence() == b.fetch_sequence()
    sizes = lambda r: sorted(  # noqa: E731
        (x['doc_id'], len(x['spans'])) for x in r.docs.collect())
    assert sizes(a) == sizes(b)


def test_dom_mode_diverges_document_not_frontier(spark):
    """dom mode: SAME frontier (urls, waves, priorities), DIFFERENT
    document on the JS-modified pages only."""
    corpus = with_dom_variants(golden_site(spark, 'http'), dom_mod=2, seed=2)
    a = _crawl(spark, corpus, render_mode='static')
    b = _crawl(spark, corpus, render_mode='dom')
    # frontier identity: the selenium spider shares the whole loop
    key = lambda r: sorted(  # noqa: E731
        (x['url'], x['status'], x['wave'], x['priority'])
        for x in r.seen.collect())
    assert key(a) == key(b)
    assert a.fetch_sequence() == b.fetch_sequence()
    # document divergence: js span exactly on the dom-rendered pages
    js = {r['doc_id']: r['n'] for r in b.docs.select(
        'doc_id',
        F.size(F.filter('spans', lambda s: F.coalesce(s['text'], F.lit(''))
                        .startswith('js-rendered:'))).alias('n')).collect()}
    modes = {r['doc_id']: r['render']
             for r in corpus.select('doc_id', 'render').collect()}
    assert any(v == 'dom' for v in modes.values())
    assert any(v == 'static' for v in modes.values())
    for doc, mode in modes.items():
        assert js[doc] == (1 if mode == 'dom' else 0)
    # static mode never sees a js span
    n_static_js = a.docs.filter(F.exists(
        'spans', lambda s: F.coalesce(s['text'], F.lit(''))
        .startswith('js-rendered:'))).count()
    assert n_static_js == 0


def test_dom_mode_follows_js_injected_link(spark):
    """A link only the rendered DOM contains (SPA navigation) is crawled
    in dom mode and invisible to the static spider."""
    host = 'http://spa.example.com'
    link = lambda t, o: {'kind': 'link', 'text': t,  # noqa: E731
                         'media_ref': None, 'offset': o}
    text = lambda t, o: {'kind': 'text', 'text': t,  # noqa: E731
                         'media_ref': None, 'offset': o}
    rows = [
        {'doc_id': f'{host}/', 'spans': [text('shell', 0)],
         'http_status': 200, 'scheme': 'http', 'readable': None,
         'fetch_ms': 1.0,
         'dom_spans': [text('shell', 0), text('js-rendered:/', 1),
                       link(f'{host}/app', 2)]},
        {'doc_id': f'{host}/app', 'spans': [text('app page', 0)],
         'http_status': 200, 'scheme': 'http', 'readable': None,
         'fetch_ms': 1.0, 'dom_spans': None},
    ]
    # StructType.add mutates in place — copy so CORPUS_SCHEMA stays 6-field
    from pyspark.sql import types as T
    schema = T.StructType(list(CORPUS_SCHEMA.fields) + [
        T.StructField('dom_spans', CORPUS_SCHEMA['spans'].dataType)])
    corpus = spark.createDataFrame(rows, schema)

    static = CrawlEngine(spark, corpus, config=CrawlConfig()).run([f'{host}/'])
    dom = CrawlEngine(
        spark, corpus, config=CrawlConfig(render_mode='dom')).run([f'{host}/'])
    assert sorted(r['url'] for r in static.seen.collect()) == [f'{host}/']
    assert sorted(r['url'] for r in dom.seen.collect()) == [
        f'{host}/', f'{host}/app']
    assert {r['url']: r['status'] for r in dom.seen.collect()} == {
        f'{host}/': 'reachable', f'{host}/app': 'reachable'}


def test_dom_mode_file_scheme_unreachable(spark):
    """Reference: the selenium spider cannot open file:// URLs
    (any_io/selenium_spider.py:70-73) — static reads them fine."""
    url = 'file://local.example.com/doc.txt'
    rows = [{'doc_id': url,
             'spans': [{'kind': 'text', 'text': 'file body',
                        'media_ref': None, 'offset': 0}],
             'http_status': 0, 'scheme': 'file', 'readable': True,
             'fetch_ms': 1.0}]
    corpus = spark.createDataFrame(rows, CORPUS_SCHEMA)
    a = CrawlEngine(spark, corpus, config=CrawlConfig()).run([url])
    b = CrawlEngine(
        spark, corpus, config=CrawlConfig(render_mode='dom')).run([url])
    assert {r['url']: r['status'] for r in a.seen.collect()} == {
        url: 'reachable'}
    assert {r['url']: r['status'] for r in b.seen.collect()} == {
        url: 'unreachable'}


def test_render_mode_validation():
    with pytest.raises(ValueError, match='render_mode'):
        CrawlConfig(render_mode='headless')
