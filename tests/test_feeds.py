"""RSS/Atom feed ingestion (operators/feeds.py)."""

from __future__ import annotations

from scalpel_spark.operators import feeds

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>News</title><link>http://site.test/</link>
<item><title>A</title><link> http://site.test/a </link>
<pubDate>Mon, 17 Aug 2026 09:00:00 GMT</pubDate>
<guid isPermaLink="false">tag:a1</guid></item>
<item><title>B</title><link><![CDATA[http://site.test/b]]></link></item>
<item><title>no link, dropped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>Blog</title><link href="http://blog.test/"/>
<entry><title>X</title><link rel="alternate" href="http://blog.test/x"/>
<updated>2026-08-17T09:00:00Z</updated><id>urn:x1</id></entry>
<entry><title>Y</title><link href="http://blog.test/y"/></entry>
</feed>"""


def _pages(spark):
    return spark.createDataFrame(
        [('http://site.test/rss.xml', RSS), ('http://blog.test/atom.xml', ATOM)],
        'url string, body string')


def test_feed_entries_both_formats(spark):
    rows = {(r['feed_url'], r['pos']): r
            for r in feeds.feed_entries(_pages(spark)).collect()}
    a = rows[('http://site.test/rss.xml', 0)]
    assert (a['link'], a['guid'], a['is_atom']) == (
        'http://site.test/a', 'tag:a1', False)
    assert a['published'].startswith('Mon, 17 Aug 2026')
    b = rows[('http://site.test/rss.xml', 1)]
    assert (b['link'], b['published'], b['guid']) == ('http://site.test/b', '', '')
    x = rows[('http://blog.test/atom.xml', 0)]
    assert (x['link'], x['guid'], x['is_atom']) == (
        'http://blog.test/x', 'urn:x1', True)
    assert x['published'] == '2026-08-17T09:00:00Z'
    # the link-less RSS item dropped; y has no updated/id
    assert len(rows) == 4
    assert rows[('http://blog.test/atom.xml', 1)]['guid'] == ''


def test_feed_seeds_dedup(spark):
    pages = spark.createDataFrame(
        [('http://a.test/f1', RSS), ('http://a.test/f2', RSS)],
        'url string, body string')
    seeds = {r['url'] for r in
             feeds.feed_seeds(feeds.feed_entries(pages)).collect()}
    assert seeds == {'http://site.test/a', 'http://site.test/b'}


def test_fresh_entries_guid_keyed(spark):
    entries = feeds.feed_entries(_pages(spark))
    seen = spark.createDataFrame([('tag:a1',), ('urn:x1',)], 'guid string')
    fresh = feeds.fresh_entries(entries, seen).collect()
    # guid-less entries pass through; both guid'd entries were seen
    assert sorted(r['link'] for r in fresh) == [
        'http://blog.test/y', 'http://site.test/b']


def test_feed_entries_plan_stays_jvm(spark):
    plan = feeds.feed_entries(_pages(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan and 'Exchange' not in plan


# ---------------------------------------------------------------------------
# CrawlConfig.follow_feeds — engine bootstrap
# ---------------------------------------------------------------------------

RSS_BOOT = """<rss><channel>
<item><link>http://n.com/a1</link><guid>g1</guid></item>
<item><link><![CDATA[http://n.com/a2]]></link></item>
<item><link>ftp://n.com/skip</link></item>
</channel></rss>"""
ATOM_BOOT = """<feed>
<entry><link href="http://n.com/b1"/></entry>
<entry><link href="http://n.com/a1"/></entry>
</feed>"""


def _boot_fixture(spark):
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    corpus = spark.createDataFrame([
        {'doc_id': f'http://n.com/{p}',
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for p in ('home', 'a1', 'a2', 'b1')
    ], CORPUS_SCHEMA)
    pages = spark.createDataFrame(
        [('http://n.com/rss.xml', RSS_BOOT), ('http://n.com/atom.xml', ATOM_BOOT)],
        'url string, body string')
    return corpus, pages


def test_feed_bootstrap_expands_seeds(spark):
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine

    corpus, pages = _boot_fixture(spark)
    cfg = CrawlConfig(follow_feeds=True, max_waves=1)
    res = CrawlEngine(spark, corpus, config=cfg, feed_pages=pages).run(
        ['http://n.com/home'])
    seen = {r['url']: (r['wave'], r['priority'], r['status'])
            for r in res.seen.collect()}
    # explicit seed first; then entries in (feed_url, pos) order with
    # first-appearance dedup (a1's atom duplicate loses to nothing — its
    # min appearance is atom pos 1); the ftp link never enters
    assert seen == {
        'http://n.com/home': (0, 0, 'reachable'),
        'http://n.com/b1': (0, 1, 'reachable'),
        'http://n.com/a1': (0, 2, 'reachable'),
        'http://n.com/a2': (0, 3, 'reachable'),
    }


def test_follow_feeds_requires_table(spark):
    import pytest

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine

    corpus, _ = _boot_fixture(spark)
    with pytest.raises(ValueError, match='feed_pages'):
        CrawlEngine(spark, corpus, config=CrawlConfig(follow_feeds=True))


def test_feed_links_take_canonical_identity(spark):
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine

    corpus, _ = _boot_fixture(spark)
    pages = spark.createDataFrame(
        [('http://n.com/rss.xml',
          '<rss><channel><item><link>http://n.com/a1?utm_source=feed</link>'
          '</item></channel></rss>')],
        'url string, body string')
    cfg = CrawlConfig(follow_feeds=True, canonicalize_urls=True, max_waves=1)
    res = CrawlEngine(spark, corpus, config=cfg, feed_pages=pages).run(
        ['http://n.com/a1'])
    # the utm variant collapsed onto the seed's canonical identity
    assert [r['url'] for r in res.seen.collect()] == ['http://n.com/a1']


def test_rss_mentioning_feed_substring_stays_rss(spark):
    # FeedBurner-style RSS carries '<feedburner:origLink>' inside items —
    # format detection keys on the ROOT element, not a substring
    rss = ('<rss version="2.0"><channel>'
           '<item><link>http://fb.test/a</link>'
           '<feedburner:origLink>http://orig.test/a</feedburner:origLink>'
           '</item></channel></rss>')
    pages = spark.createDataFrame([('http://fb.test/rss', rss)],
                                  'url string, body string')
    rows = feeds.feed_entries(pages).collect()
    assert [(r['link'], r['is_atom']) for r in rows] == [
        ('http://fb.test/a', False)]


def test_atom_rel_alternate_beats_self_edit(spark):
    # Blogger/AtomPub order: self/edit/replies before alternate — the
    # article URL is the rel="alternate" (or rel-less) link
    atom = ('<feed><entry>'
            '<link rel="self" href="http://api.test/self"/>'
            '<link rel="edit" href="http://api.test/edit"/>'
            '<link rel="alternate" href="http://blog.test/article"/>'
            '</entry><entry>'
            '<link rel="replies" href="http://api.test/comments"/>'
            '<link href="http://blog.test/relless"/>'
            '</entry></feed>')
    pages = spark.createDataFrame([('http://blog.test/atom', atom)],
                                  'url string, body string')
    rows = {r['pos']: r['link'] for r in feeds.feed_entries(pages).collect()}
    assert rows == {0: 'http://blog.test/article', 1: 'http://blog.test/relless'}


def test_fresh_entries_null_guid_passes_through(spark):
    entries = spark.createDataFrame(
        [('f', 0, 'http://x.test/a', '', None, False),
         ('f', 1, 'http://x.test/b', '', 'g1', False)],
        'feed_url string, pos long, link string, published string, '
        'guid string, is_atom boolean')
    seen = spark.createDataFrame([('g1',)], 'guid string')
    fresh = [r['link'] for r in feeds.fresh_entries(entries, seen).collect()]
    assert fresh == ['http://x.test/a']  # null guid passes, g1 deduped
