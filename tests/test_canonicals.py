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


# engine wiring: CrawlEngine(canonical_map=...)


def _run_engine(spark, seeds, cmap):
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import golden_site

    cfg = CrawlConfig(link_rule='second_contains_page', max_waves=1)
    store = SnapshotStore(tempfile.mkdtemp(prefix='canon-engine-'))
    return CrawlEngine(spark, golden_site(spark, 'http'), config=cfg,
                       canonical_map=cmap, store=store).run(seeds)


def test_engine_canonical_map_collapses_alias_seed(spark):
    cmap = spark.createDataFrame(
        [('http://quotes.com/print/home', 'http://quotes.com')],
        'src STRING, dst STRING')
    res = _run_engine(
        spark, ['http://quotes.com', 'http://quotes.com/print/home'], cmap)
    rows = {r['url']: r for r in res.seen.collect()}
    assert 'http://quotes.com/print/home' not in rows
    assert rows['http://quotes.com']['status'] == 'reachable'


def test_engine_without_map_keeps_alias_unreachable(spark):
    res = _run_engine(
        spark, ['http://quotes.com', 'http://quotes.com/print/home'], None)
    rows = {r['url']: r for r in res.seen.collect()}
    assert rows['http://quotes.com/print/home']['status'] == 'unreachable'
    assert rows['http://quotes.com']['status'] == 'reachable'


def test_engine_map_is_fixed_point_on_unmapped_urls(spark):
    # a map whose srcs never occur must not change the crawl at all
    cmap = spark.createDataFrame(
        [('http://elsewhere.com/x', 'http://elsewhere.com')],
        'src STRING, dst STRING')
    res = _run_engine(spark, ['http://quotes.com'], cmap)
    rows = {r['url']: r for r in res.seen.collect()}
    assert rows['http://quotes.com']['status'] == 'reachable'
