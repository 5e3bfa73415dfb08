"""Golden 3-page crawl parity — the reference's integration suite
(tests/any_io/test_static_spider.py:332-401) as DataFrame assertions.

Expected values are the reference's own goldens: reachable == {seed, page2,
page3}, followed == {page2, page3}, request_counter == 3, unreachable and
robots_excluded empty, exactly 3 Albert Einstein quotes in the items table,
and the crawl order seed → page2 → page3.
"""

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.sources import corpus as corpus_mod


@pytest.fixture(scope='module', params=['http', 'file'])
def golden(request, spark):
    style = request.param
    rows = corpus_mod.golden_site_rows(style)
    corpus_df = spark.createDataFrame(rows, corpus_mod.CORPUS_SCHEMA)
    seed = rows[0]['doc_id']
    config = CrawlConfig(link_rule='second_contains_page')
    engine = CrawlEngine(spark, corpus_df, config=config)
    result = engine.run([seed])
    sim = CrawlSimulator({r['doc_id']: r for r in rows}, link_selector='second_contains_page')
    expected = sim.run([seed])
    return style, rows, result, expected


def test_reachable_and_followed_sets(golden):
    style, rows, result, expected = golden
    stats = result.statistics()
    all_pages = {r['doc_id'] for r in rows}
    assert stats.reachable_urls == all_pages == expected.reachable
    assert stats.followed_urls == all_pages - {rows[0]['doc_id']} == expected.followed
    assert stats.unreachable_urls == set() == expected.unreachable
    assert stats.robots_excluded_urls == set() == expected.robots_excluded


def test_request_counter_and_fetch_time(golden):
    _, rows, result, expected = golden
    stats = result.statistics()
    assert stats.request_counter == 3 == expected.request_counter
    # fetch_ms per page = 1.0, 2.0, 3.0 → avg 2.0 (core/spider.py:144 semantics)
    assert stats.average_fetch_time == pytest.approx(2.0)
    assert stats.average_fetch_time == pytest.approx(expected.average_fetch_time)


def test_crawl_order_parity(golden):
    """The engine's (wave, priority) order equals the reference FIFO
    queue.get() sequence (SURVEY.md §3.4)."""
    _, _, result, expected = golden
    assert result.fetch_sequence() == expected.fetch_seq


def test_items_golden(golden):
    _, _, result, expected = golden
    items = result.items.orderBy('wave', 'doc_id', 'item_seq').collect()
    assert len(items) == 6 == len(expected.items)
    albert = [r for r in items if r['author'] == 'Albert Einstein']
    assert len(albert) == 3  # tests/any_io/test_static_spider.py:353-358
    got = {(r['doc_id'], r['quote'], r['author'], r['item_seq']) for r in items}
    exp = {(i['doc_id'], i['quote'], i['author'], i['item_seq']) for i in expected.items}
    assert got == exp


def test_span_sequence_invariant(golden):
    """Every emitted document preserves (kind, text, media_ref, order) vs
    the corpus row — the input_hint per-row invariant."""
    _, rows, result, _ = golden
    emitted = {r['doc_id']: r['spans'] for r in result.docs.collect()}
    assert set(emitted) == {r['doc_id'] for r in rows}
    for row in rows:
        got = [(s['kind'], s['text'], s['media_ref'], s['offset']) for s in emitted[row['doc_id']]]
        exp = [(s['kind'], s['text'], s['media_ref'], s['offset']) for s in row['spans']]
        assert got == exp, f'span sequence mismatch for {row["doc_id"]}'


def test_file_url_collapse(golden):
    """file:///website/page1.html follows collapse to file:/website/...
    (tests/any_io/test_static_spider.py:366-369)."""
    style, rows, result, _ = golden
    if style != 'file':
        pytest.skip('file-style corpus only')
    stats = result.statistics()
    assert 'file:/website/page2.html' in stats.followed_urls
    assert 'file:/website/page3.html' in stats.followed_urls


def test_lineage_metrics_present(golden):
    _, _, result, _ = golden
    metrics = result.metrics.collect()
    stages = {r['stage'] for r in metrics}
    assert 'schedule_dedup' in stages
    assert 'scheduled_rows' in stages  # per-partition lineage rows
    assert all(r['ms'] >= 0 for r in metrics)
