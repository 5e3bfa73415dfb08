"""Sitemap ingestion: XML entry parsing, robots Sitemap: directives,
frontier seed extraction."""

from pyspark.sql import functions as F

from scalpel_spark.operators import sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example.com/p1 </loc>
    <lastmod>2026-01-02</lastmod>
  </url>
  <url><loc><![CDATA[https://a.example.com/p2?x=1&amp;y=2]]></loc></url>
  <url><lastmod>2026-01-03</lastmod></url>
  <url><loc>https://a.example.com/p3</loc>
       <lastmod> 2026-01-04 </lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap>
    <loc>https://a.example.com/sitemap-2.xml</loc>
    <lastmod>2026-02-01</lastmod>
  </sitemap>
</sitemapindex>
"""


def _pages(spark):
    return spark.createDataFrame(
        [('https://a.example.com/sitemap.xml', URLSET),
         ('https://a.example.com/sitemap_index.xml', INDEX)],
        'url string, body string',
    )


def test_sitemap_entries_parse(spark):
    rows = sorted(
        sitemap.sitemap_entries(_pages(spark)).collect(),
        key=lambda r: (r['sitemap_url'], r['pos']),
    )
    urlset = [r for r in rows if not r['is_index']]
    index = [r for r in rows if r['is_index']]
    # block 3 (loc-less) is dropped but keeps its pos gap
    assert [(r['pos'], r['loc'], r['lastmod']) for r in urlset] == [
        (0, 'https://a.example.com/p1', '2026-01-02'),
        (1, 'https://a.example.com/p2?x=1&amp;y=2', ''),
        (3, 'https://a.example.com/p3', '2026-01-04'),
    ]
    assert [(r['pos'], r['loc'], r['lastmod']) for r in index] == [
        (0, 'https://a.example.com/sitemap-1.xml', ''),
        (1, 'https://a.example.com/sitemap-2.xml', '2026-02-01'),
    ]


def test_sitemap_seeds_excludes_index_pages(spark):
    seeds = sorted(
        r['url'] for r in sitemap.sitemap_seeds(
            sitemap.sitemap_entries(_pages(spark))).collect()
    )
    assert seeds == [
        'https://a.example.com/p1',
        'https://a.example.com/p2?x=1&amp;y=2',
        'https://a.example.com/p3',
    ]


def test_robots_sitemap_directives(spark):
    robots = spark.createDataFrame(
        [('h0.example.com',
          'User-agent: *\nDisallow: /private\n'
          'Sitemap: https://h0.example.com/sitemap.xml\n'
          'sitemap: https://h0.example.com/sitemap-news.xml\n'),
         ('h1.example.com', 'User-agent: *\nAllow: /\n'),
         ('h2.example.com', 'SITEMAP:   https://h2.example.com/s.xml')],
        'host string, rules string',
    )
    rows = sorted(
        (r['host'], r['pos'], r['sitemap_url'])
        for r in sitemap.robots_sitemap_urls(robots).collect()
    )
    assert rows == [
        ('h0.example.com', 0, 'https://h0.example.com/sitemap.xml'),
        ('h0.example.com', 1, 'https://h0.example.com/sitemap-news.xml'),
        ('h2.example.com', 0, 'https://h2.example.com/s.xml'),
    ]


def test_sitemap_entries_plan_is_map_side(spark):
    plan = sitemap.sitemap_entries(_pages(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'Exchange' not in plan  # pure narrow pass, no shuffle


def test_sitemap_delta_actions(spark):
    """new / refetch / skip / unknown classification; duplicate locs
    collapse to max lastmod; instant equality is skip (not after);
    date-only lastmod = end-of-day (conservative refetch)."""
    from scalpel_spark.operators.sitemap import sitemap_delta

    entries = spark.createDataFrame([
        ('https://a/new', '2026-01-10'),
        ('https://a/changed', '2026-01-20'),
        ('https://a/same', '2026-01-15T10:00:00'),   # == capture instant
        ('https://a/sameday', '2026-01-15'),         # date-only: end of day
        ('https://a/old', '2026-01-01'),
        ('https://a/nolastmod', ''),
        ('https://a/garbage', 'soon(tm)'),           # unparseable
        # duplicate loc across sitemaps: max lastmod wins -> refetch
        ('https://a/dup', '2026-01-01'),
        ('https://a/dup', '2026-01-30'),
        # the lexicographic-compare trap: -07:00 lastmod is a LATER
        # instant than the Z capture despite sorting before it
        ('https://a/offset', '2026-08-19T02:00:00-07:00'),
    ], 'loc string, lastmod string')
    captures = spark.createDataFrame([
        ('https://a/changed', '2026-01-15T10:00:00'),
        ('https://a/same', '2026-01-15T10:00:00'),
        ('https://a/sameday', '2026-01-15T10:00:00'),
        ('https://a/old', '2026-01-15T10:00:00'),
        ('https://a/nolastmod', '2026-01-15T10:00:00'),
        ('https://a/garbage', '2026-01-15T10:00:00'),
        ('https://a/dup', '2026-01-15T10:00:00'),
        ('https://a/offset', '2026-08-19T05:00:00Z'),
    ], 'url string, last_capture string')
    out = {r['loc']: r for r in sitemap_delta(entries, captures).collect()}
    assert len(out) == 9
    assert out['https://a/new']['action'] == 'new'
    assert out['https://a/new']['last_capture'] == ''
    assert out['https://a/changed']['action'] == 'refetch'
    assert out['https://a/same']['action'] == 'skip'
    assert out['https://a/sameday']['action'] == 'refetch'
    assert out['https://a/old']['action'] == 'skip'
    assert out['https://a/nolastmod']['action'] == 'unknown'
    assert out['https://a/garbage']['action'] == 'unknown'
    assert out['https://a/dup']['action'] == 'refetch'
    assert out['https://a/dup']['lastmod'] == '2026-01-30'
    assert out['https://a/offset']['action'] == 'refetch'
