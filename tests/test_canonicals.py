"""rel=canonical folding (`operators/canonicals.py`)."""

from __future__ import annotations

from scalpel_spark.operators import canonicals

PAGES = 'url STRING, canonical STRING'
URLS = 'url STRING'


def _fold(spark, pages, urls=None, **kw):
    pdf = spark.createDataFrame(pages, PAGES)
    udf_ = spark.createDataFrame(
        urls if urls is not None else [(p[0],) for p in pages], URLS)
    return {r['url']: r for r in
            canonicals.fold_canonicals(udf_, pdf, **kw).collect()}


def test_one_hop_fold(spark):
    out = _fold(spark, [
        ('http://a/page?v=2', 'http://a/page'),
        ('http://a/page', None),
    ])
    r = out['http://a/page?v=2']
    assert (r['canonical_status'], r['canonical_url'], r['hops']) == \
        ('folded', 'http://a/page', 1)
    assert out['http://a/page']['canonical_status'] == 'self'


def test_chain_resolves_transitively(spark):
    out = _fold(spark, [
        ('http://a/1', 'http://a/2'),
        ('http://a/2', 'http://a/3'),
        ('http://a/3', ''),
    ])
    r = out['http://a/1']
    assert (r['canonical_status'], r['canonical_url'], r['hops']) == \
        ('folded', 'http://a/3', 2)


def test_loop_is_unresolved(spark):
    out = _fold(spark, [
        ('http://a/x', 'http://a/y'),
        ('http://a/y', 'http://a/x'),
    ], max_hops=4)
    assert all(r['canonical_status'] == 'unresolved'
               and r['hops'] == 4 for r in out.values())


def test_cross_host_dropped_by_default(spark):
    pages = [('http://evil/p', 'http://victim/p'),
             ('http://victim/p', None)]
    out = _fold(spark, pages)
    assert out['http://evil/p']['canonical_status'] == 'self'
    # ... but honored when explicitly trusted
    out = _fold(spark, pages, same_host_only=False)
    r = out['http://evil/p']
    assert (r['canonical_status'], r['canonical_url']) == \
        ('folded', 'http://victim/p')


def test_self_and_empty_declarations_are_identity(spark):
    out = _fold(spark, [
        ('http://a/p', 'http://a/p'),
        ('http://a/q', ''),
        ('http://a/r', None),
    ])
    assert all(r['canonical_status'] == 'self' and r['hops'] == 0
               for r in out.values())


def test_urls_without_page_rows_pass_through(spark):
    # a frontier URL we never fetched: no declaration, stays itself
    out = _fold(spark, [('http://a/p', 'http://a/q')],
                urls=[('http://a/p',), ('http://a/new',)])
    assert out['http://a/new']['canonical_status'] == 'self'
    assert out['http://a/p']['canonical_url'] == 'http://a/q'
