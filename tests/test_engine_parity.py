"""Engine ↔ simulator parity on the synthetic corpus WITH robots — the
wave engine must reproduce the reference FIFO semantics (SURVEY.md §3.4)
on a graph far bigger than the 3-page golden site: seen-set by status,
followed set, crawl order, items, and statistics all equal the pure-Python
reference simulator (the executable spec of any_io/static_spider.py)."""

from __future__ import annotations

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots, synthetic_robots_rows

N_PAGES, N_HOSTS = 120, 8


@pytest.fixture(scope='module')
def parity(spark):
    corpus_df = synthetic_corpus(spark, n_pages=N_PAGES, n_hosts=N_HOSTS, seed=42).persist()
    robots_df = synthetic_robots(spark, n_hosts=N_HOSTS)
    rows = [r.asDict(recursive=True) for r in corpus_df.collect()]
    corpus = {r['doc_id']: r for r in rows}
    robots = {r['host']: r for r in synthetic_robots_rows(N_HOSTS)}
    seeds = sorted(corpus)[:6]

    engine = CrawlEngine(
        spark, corpus_df, robots=robots_df,
        config=CrawlConfig(follow_robots_txt=True, link_rule='all'),
    )
    result = engine.run(seeds)
    sim = CrawlSimulator(corpus, robots, follow_robots_txt=True, link_selector='all',
                         user_agent=CrawlConfig().user_agent)
    expected = sim.run(seeds)
    return result, expected


def test_seen_sets_by_status(parity):
    result, expected = parity
    stats = result.statistics()
    assert stats.reachable_urls == expected.reachable
    assert stats.unreachable_urls == expected.unreachable
    assert stats.robots_excluded_urls == expected.robots_excluded
    assert stats.followed_urls == expected.followed


def test_crawl_order(parity):
    result, expected = parity
    assert result.fetch_sequence() == expected.fetch_seq


def test_statistics(parity):
    result, expected = parity
    stats = result.statistics()
    assert stats.request_counter == expected.request_counter
    assert stats.average_fetch_time == pytest.approx(expected.average_fetch_time)


def test_items(parity):
    result, expected = parity
    got = {(r['doc_id'], r['quote'], r['author'], r['item_seq']) for r in result.items.collect()}
    exp = {(i['doc_id'], i['quote'], i['author'], i['item_seq']) for i in expected.items}
    assert got == exp


def test_no_url_dispatched_twice(parity):
    result, _ = parity
    seen = result.seen
    assert seen.count() == seen.select('url').distinct().count()


def test_span_sequence_invariant_synthetic(parity):
    """input_hint per-row invariant at synthetic scale: emitted docs carry
    the corpus spans verbatim (kind, text, media_ref, order)."""
    result, expected = parity
    emitted = {r['doc_id']: r['spans'] for r in result.docs.collect()}
    exp_docs = {d['doc_id']: d['spans'] for d in expected.emitted_docs}
    assert set(emitted) == set(exp_docs)
    for doc_id, spans in exp_docs.items():
        got = [(s['kind'], s['text'], s['media_ref'], s['offset']) for s in emitted[doc_id]]
        exp = [(s['kind'], s['text'], s['media_ref'], s['offset']) for s in spans]
        assert got == exp
