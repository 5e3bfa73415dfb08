"""Engine API surface: distributed seed ingestion (run_frontier) and
response-middleware composition (F6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import golden_site, synthetic_corpus


def test_run_frontier_matches_run(spark):
    """Distributed DataFrame seeds produce the same crawl as the list API."""
    corpus = synthetic_corpus(spark, n_pages=60, n_hosts=4, seed=42)
    seeds = sorted(r['doc_id'] for r in corpus.limit(4).collect())

    res_list = CrawlEngine(spark, corpus, config=CrawlConfig()).run(seeds)
    seeds_df = spark.createDataFrame(list(enumerate(seeds)), 'priority long, url string')
    res_df = CrawlEngine(spark, corpus, config=CrawlConfig()).run_frontier(
        seeds_df.select('url', 'priority')
    )
    assert res_df.fetch_sequence() == res_list.fetch_sequence()
    a = res_list.statistics()
    b = res_df.statistics()
    assert (a.reachable_urls, a.unreachable_urls, a.followed_urls) == \
        (b.reachable_urls, b.unreachable_urls, b.followed_urls)


def test_run_frontier_invalid_error(spark):
    corpus = golden_site(spark, 'http')
    seeds = spark.createDataFrame(
        [('http://quotes.com', 0), ('ftp://nope', 1)], 'url string, priority long'
    )
    engine = CrawlEngine(spark, corpus, config=CrawlConfig())
    with pytest.raises(ValueError, match=r"does not have a scheme"):
        engine.run_frontier(seeds)


def test_run_frontier_invalid_skip(spark):
    corpus = golden_site(spark, 'http')
    seeds = spark.createDataFrame(
        [('http://quotes.com', 0), ('ftp://nope', 1), ('http://', 2)],
        'url string, priority long',
    )
    engine = CrawlEngine(
        spark, corpus, config=CrawlConfig(link_rule='second_contains_page')
    )
    res = engine.run_frontier(seeds, on_invalid='skip')
    stats = res.statistics()
    assert stats.reachable_urls == {
        'http://quotes.com', 'http://quotes.com/page2.html', 'http://quotes.com/page3.html'
    }


def test_response_middleware_composition(spark):
    """Middlewares wrap the fetch stage; last registered runs outermost
    (any_io/static_spider.py:62-68 order)."""
    calls = []

    def tag(name):
        def mw(fetch):
            def wrapped(df):
                calls.append(name)
                return fetch(df).withColumn('status', F.col('status'))
            return wrapped
        return mw

    def force_unreachable_page3(fetch):
        def wrapped(df):
            out = fetch(df)
            return out.withColumn(
                'status',
                F.when(F.col('url').contains('page3'), 'unreachable').otherwise(F.col('status')),
            )
        return wrapped

    corpus = golden_site(spark, 'http')
    cfg = CrawlConfig(
        link_rule='second_contains_page',
        response_middlewares=(tag('inner'), force_unreachable_page3, tag('outer')),
    )
    res = CrawlEngine(spark, corpus, config=cfg).run(['http://quotes.com'])
    stats = res.statistics()
    assert 'http://quotes.com/page3.html' in stats.unreachable_urls
    assert stats.request_counter == 2  # page3 never parsed
    # composition order: outer wraps middle wraps inner → outer called first
    assert calls[:2] == ['outer', 'inner']


def test_crawl_is_deterministic_across_runs(spark):
    """Two independent runs with the same seed list, corpus, and politeness
    budget produce the identical dispatch sequence — the determinism the
    north rule requires of the (wave, priority) order."""
    corpus = synthetic_corpus(spark, n_pages=80, n_hosts=5, seed=42, hot_hosts=1)
    seeds = sorted(r['doc_id'] for r in corpus.limit(3).collect())
    cfg = CrawlConfig(max_dispatch_per_host_per_wave=6, hot_host_threshold=8)
    a = CrawlEngine(spark, corpus, config=cfg).run(seeds)
    b = CrawlEngine(spark, corpus, config=cfg).run(seeds)
    assert a.fetch_sequence() == b.fetch_sequence()
    assert a.dispatch_rows() == b.dispatch_rows()


def test_render_mode_passthrough(spark):
    """S5: a render-mode column on the corpus leaves crawl semantics
    untouched and is preserved on emitted documents."""
    from scalpel_spark.sources.corpus import with_render_modes

    plain = synthetic_corpus(spark, n_pages=60, n_hosts=4, seed=42)
    rendered = with_render_modes(plain)
    seeds = sorted(r['doc_id'] for r in plain.limit(3).collect())
    a = CrawlEngine(spark, plain, config=CrawlConfig()).run(seeds)
    b = CrawlEngine(spark, rendered, config=CrawlConfig()).run(seeds)
    assert a.fetch_sequence() == b.fetch_sequence()
    docs = b.docs
    assert 'render' in docs.columns
    modes = {r['render'] for r in docs.select('render').distinct().collect()}
    assert modes <= {'static', 'dom'} and 'static' in modes
