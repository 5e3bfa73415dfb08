"""fetch_mode='mapinpandas' — the live-deployment fetch stage
(sources/fetcher.fetch_frontier wired into engine step 5, VERDICT r3 #6)
must reproduce the corpus-join crawl bit-for-bit on the golden site, pace
per-host dispatch from the recorded robots delay, accept an injected
batch fetcher (the production contract, any_io/static_spider.py:62-74),
and refuse to silently driver-collect a big corpus for the parity fake.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources import corpus as corpus_mod


def _seen_rows(result):
    return sorted(
        (r['url'], r['status'], r['wave'], r['priority'])
        for r in result.seen.collect()
    )


@pytest.fixture(scope='module', params=['http', 'file'])
def golden_pair(request, spark):
    style = request.param
    rows = corpus_mod.golden_site_rows(style)
    corpus_df = spark.createDataFrame(rows, corpus_mod.CORPUS_SCHEMA)
    seed = rows[0]['doc_id']
    results = {}
    for mode in ('corpus_join', 'mapinpandas'):
        cfg = CrawlConfig(link_rule='second_contains_page', fetch_mode=mode)
        results[mode] = CrawlEngine(spark, corpus_df, config=cfg).run([seed])
    return style, results


def test_golden_crawl_identical_across_fetch_modes(golden_pair):
    _, results = golden_pair
    assert _seen_rows(results['mapinpandas']) == _seen_rows(results['corpus_join'])
    assert (results['mapinpandas'].fetch_sequence()
            == results['corpus_join'].fetch_sequence())


def test_statistics_identical_across_fetch_modes(golden_pair):
    _, results = golden_pair
    a = sorted(map(tuple, results['corpus_join'].statistics_agg().collect()))
    b = sorted(map(tuple, results['mapinpandas'].statistics_agg().collect()))
    assert a == b


def test_items_identical_across_fetch_modes(golden_pair):
    _, results = golden_pair
    cols = ['doc_id', 'wave', 'item_seq', 'author', 'quote']
    a = sorted(map(tuple, results['corpus_join'].items.select(*cols).collect()))
    b = sorted(map(tuple, results['mapinpandas'].items.select(*cols).collect()))
    assert a == b


def test_injected_fetch_fn_drives_reachability(spark):
    """The production contract: an injected batch fetcher's statuses —
    not the corpus http_status — decide reachability for http rows."""
    rows = corpus_mod.golden_site_rows('http')
    corpus_df = spark.createDataFrame(rows, corpus_mod.CORPUS_SCHEMA)
    seed = rows[0]['doc_id']

    def deny_page2(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            'status': [503 if 'page2' in u else 200 for u in batch['url']],
            'body': list(batch['url']),
            'fetch_ms': [1.0] * len(batch),
        })

    cfg = CrawlConfig(link_rule='second_contains_page',
                      fetch_mode='mapinpandas', fetch_fn=deny_page2)
    result = CrawlEngine(spark, corpus_df, config=cfg).run([seed])
    by_url = {r['url']: r['status'] for r in result.seen.collect()}
    assert by_url[seed] == 'reachable'
    assert by_url[f'{seed}/page2.html'] == 'unreachable'
    # page3 is only discoverable through page2's links, so the crawl
    # stops there — the transport verdict propagated into the frontier
    assert f'{seed}/page3.html' not in by_url


def test_failing_fetch_fn_quarantines_to_unreachable(spark):
    """A batch whose fetch_fn raises quarantines to transport status -1
    (sources/fetcher.py run_batches) → 'unreachable', never a task kill."""
    rows = corpus_mod.golden_site_rows('http')
    corpus_df = spark.createDataFrame(rows, corpus_mod.CORPUS_SCHEMA)
    seed = rows[0]['doc_id']

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        raise RuntimeError('connection pool down')

    cfg = CrawlConfig(fetch_mode='mapinpandas', fetch_fn=explode, max_waves=1)
    result = CrawlEngine(spark, corpus_df, config=cfg).run([seed])
    assert [r['status'] for r in result.seen.collect()] == ['unreachable']


def test_corpus_fake_guard_refuses_big_corpus(spark):
    """The corpus-backed fake driver-collects the corpus — parity-test
    scale only; a big corpus without an injected fetch_fn must raise
    instead of silently collecting 10^10 rows."""
    from scalpel_spark.plans import engine as engine_mod

    big = spark.range(0, engine_mod._FAKE_FETCH_LIMIT + 10).select(
        F.concat(F.lit('http://h.test/p'), F.col('id')).alias('doc_id'),
        F.array().cast(corpus_mod.CORPUS_SCHEMA['spans'].dataType).alias('spans'),
        F.lit(200).alias('http_status'),
        F.lit('http').alias('scheme'),
        F.lit(True).alias('readable'),
        F.lit(1.0).alias('fetch_ms'),
    )
    cfg = CrawlConfig(fetch_mode='mapinpandas', max_waves=1)
    eng = CrawlEngine(spark, big, config=cfg)
    with pytest.raises(ValueError, match='corpus-backed fake'):
        eng.run(['http://h.test/p0'])


def test_file_scheme_bypasses_http_fetcher(spark):
    """file:// rows never enter the mapInPandas HTTP stage — a fetch_fn
    that would 404 everything it sees must not affect the file read."""
    rows = corpus_mod.golden_site_rows('file')
    corpus_df = spark.createDataFrame(rows, corpus_mod.CORPUS_SCHEMA)
    seed = rows[0]['doc_id']

    def all_404(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            'status': [404] * len(batch),
            'body': [''] * len(batch),
            'fetch_ms': [1.0] * len(batch),
        })

    cfg = CrawlConfig(link_rule='second_contains_page',
                      fetch_mode='mapinpandas', fetch_fn=all_404)
    result = CrawlEngine(spark, corpus_df, config=cfg).run([seed])
    assert all(r['status'] == 'reachable' for r in result.seen.collect())


def test_fetch_mode_validation():
    with pytest.raises(ValueError, match='fetch_mode'):
        CrawlConfig(fetch_mode='telnet')
