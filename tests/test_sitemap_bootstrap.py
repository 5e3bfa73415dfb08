"""CrawlConfig.follow_sitemaps — robots Sitemap: directives expand the
seed list at run start (index pages resolved, publication order = crawl
order, non-http locs dropped)."""

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA


INDEX = """<?xml version="1.0"?><sitemapindex>
<sitemap><loc> http://s.com/sm1.xml </loc></sitemap>
</sitemapindex>"""
SM1 = """<?xml version="1.0"?><urlset>
<url><loc><![CDATA[http://s.com/d1]]></loc><lastmod>2026-01-01</lastmod></url>
<url><loc>http://s.com/d2</loc></url>
<url><loc>ftp://s.com/skip-me</loc></url>
</urlset>"""


def _fixture(spark):
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u in ('http://s.com/home', 'http://s.com/d1', 'http://s.com/d2')
    ], CORPUS_SCHEMA)
    robots = spark.createDataFrame(
        [('s.com', 200, 'User-agent: *\nAllow: /\nSitemap: http://s.com/index.xml')],
        ROBOTS_SCHEMA)
    pages = spark.createDataFrame(
        [('http://s.com/index.xml', INDEX), ('http://s.com/sm1.xml', SM1)],
        'url string, body string')
    return corpus, robots, pages


def test_sitemap_bootstrap_expands_seeds(spark):
    corpus, robots, pages = _fixture(spark)
    cfg = CrawlConfig(follow_sitemaps=True, max_waves=1)
    res = CrawlEngine(spark, corpus, robots, cfg, sitemap_pages=pages).run(
        ['http://s.com/home'])
    seen = {r['url']: (r['wave'], r['priority'], r['status'])
            for r in res.seen.collect()}
    # explicit seed first (priority 0), then sitemap docs in publication
    # order; the ftp loc never enters the frontier
    assert seen == {
        'http://s.com/home': (0, 0, 'reachable'),
        'http://s.com/d1': (0, 1, 'reachable'),
        'http://s.com/d2': (0, 2, 'reachable'),
    }


def test_sitemap_bootstrap_requires_tables(spark):
    corpus, robots, pages = _fixture(spark)
    with pytest.raises(ValueError):
        CrawlEngine(spark, corpus, robots,
                    CrawlConfig(follow_sitemaps=True))
    with pytest.raises(ValueError):
        CrawlEngine(spark, corpus, None,
                    CrawlConfig(follow_sitemaps=True, follow_robots_txt=False),
                    sitemap_pages=pages)


def test_sitemap_hop_limit(spark):
    """sitemap_index_hops=0 fetches only the directive page itself: the
    index's children are never resolved, so no documents are found."""
    corpus, robots, pages = _fixture(spark)
    cfg = CrawlConfig(follow_sitemaps=True, sitemap_index_hops=0, max_waves=1)
    res = CrawlEngine(spark, corpus, robots, cfg, sitemap_pages=pages).run(
        ['http://s.com/home'])
    assert {r['url'] for r in res.seen.collect()} == {'http://s.com/home'}


def test_sitemap_locs_take_canonical_identity(spark):
    """Under canonicalize_urls, sitemap <loc> values go through the SAME
    frontier canonicalization as seeds and followed links — a loc that
    differs from a seed only by tracking params must collapse to one
    fetch, not two."""
    corpus, robots, _ = _fixture(spark)
    sm = """<?xml version="1.0"?><urlset>
<url><loc>http://s.com/d1?utm_source=feed</loc></url>
<url><loc>http://s.com/d2</loc></url>
</urlset>"""
    pages = spark.createDataFrame(
        [('http://s.com/index.xml', INDEX), ('http://s.com/sm1.xml', sm)],
        'url string, body string')
    cfg = CrawlConfig(follow_sitemaps=True, canonicalize_urls=True, max_waves=1)
    res = CrawlEngine(spark, corpus, robots, cfg, sitemap_pages=pages).run(
        ['http://s.com/d1'])
    urls = sorted(r['url'] for r in res.seen.collect())
    # the utm variant collapsed onto the seed's canonical identity
    assert urls == ['http://s.com/d1', 'http://s.com/d2']
