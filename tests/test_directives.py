"""X-Robots-Tag / meta-robots directive parsing and application."""

from __future__ import annotations

from scalpel_spark.operators import directives as dx


def test_robots_directives_token_semantics(spark):
    """Token-boundary matching: case-insensitive, 'none' implies both,
    'noindex' inside free text (unavailable_after) must not match,
    NULL/''/'all' mean unrestricted."""
    pages = spark.createDataFrame([
        ('u0', None),
        ('u1', ''),
        ('u2', 'all'),
        ('u3', 'noindex'),
        ('u4', 'NOFOLLOW'),
        ('u5', 'none'),
        ('u6', 'noindex, nofollow'),
        ('u7', ' noarchive ,noindex'),
        ('u8', 'unavailable_after: 25 Jun 2027 noindex-ish'),
        ('u9', 'unavailable_after: 25 Jun 2027, noindex'),
        ('u10', 'nonego'),   # substring must not match 'none'
    ], 'url string, robots_tag string')
    out = {r['url']: (r['noindex'], r['nofollow'], r['noarchive'])
           for r in dx.robots_directives(pages).collect()}
    assert out['u0'] == (False, False, False)
    assert out['u1'] == (False, False, False)
    assert out['u2'] == (False, False, False)
    assert out['u3'] == (True, False, False)
    assert out['u4'] == (False, True, False)
    assert out['u5'] == (True, True, False)
    assert out['u6'] == (True, True, False)
    assert out['u7'] == (True, False, True)
    assert out['u8'] == (False, False, False)
    assert out['u9'] == (True, False, False)
    assert out['u10'] == (False, False, False)


def test_drop_noindex_and_nofollow_links(spark):
    pages = spark.createDataFrame([
        ('p1', 'noindex'), ('p2', 'nofollow'), ('p3', None),
    ], 'url string, robots_tag string')
    d = dx.robots_directives(pages)
    items = spark.createDataFrame(
        [('p1', 'q1'), ('p2', 'q2'), ('p3', 'q3')],
        'doc_id string, quote string')
    kept_items = {r['doc_id'] for r in dx.drop_noindex(items, d).collect()}
    assert kept_items == {'p2', 'p3'}   # noindex page's content withheld
    links = spark.createDataFrame(
        [('p1', 'l1'), ('p2', 'l2'), ('p3', 'l3')],
        'parent_url string, raw_link string')
    kept_links = {r['raw_link']
                  for r in dx.drop_nofollow_links(links, d).collect()}
    assert kept_links == {'l1', 'l3'}   # nofollow page's links dropped
