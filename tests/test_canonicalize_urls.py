"""ADVICE r2: `canonicalize_for_frontier` must actually feed the engine's
seen key when enabled — `CrawlConfig.canonicalize_urls` rewrites every
seed and discovered link to its frontier-canonical form before
hashing/seen-keying, so tracking-param variants collapse into ONE
frontier/seen entry (and the canonical form is what gets fetched).
Default stays off for reference parity (literal-URL dedup,
any_io/response.py:22-24)."""

import tempfile

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots


@pytest.fixture(scope='module')
def small_world(spark):
    corpus = synthetic_corpus(spark, n_pages=40, n_hosts=4, seed=7)
    robots = synthetic_robots(spark, n_hosts=4)
    seed_url = corpus.orderBy('doc_id').limit(1).collect()[0]['doc_id']
    return corpus, robots, seed_url


def _run(spark, corpus, robots, seeds, **cfg_kwargs):
    cfg = CrawlConfig(max_waves=1, **cfg_kwargs)
    store = SnapshotStore(tempfile.mkdtemp())
    return CrawlEngine(spark, corpus, robots, cfg, store).run(seeds)


def test_flag_on_collapses_tracking_variants(spark, small_world):
    corpus, robots, seed_url = small_world
    variant = seed_url + '?utm_source=news&fbclid=xyz'
    res = _run(spark, corpus, robots, [seed_url, variant], canonicalize_urls=True)
    rows = res.seen.collect()
    # one frontier identity: the canonical URL, fetched successfully
    assert [r['url'] for r in rows] == [seed_url]
    assert rows[0]['status'] == 'reachable'
    # first-enqueue-wins: the clean seed's priority (0) survives the merge
    assert rows[0]['priority'] == 0


def test_flag_off_keeps_literal_urls(spark, small_world):
    corpus, robots, seed_url = small_world
    variant = seed_url + '?utm_source=news&fbclid=xyz'
    res = _run(spark, corpus, robots, [seed_url, variant])
    by_url = {r['url']: r['status'] for r in res.seen.collect()}
    # reference parity: two distinct seen entries; the variant misses the
    # corpus (no such doc_id) and lands unreachable
    assert by_url == {seed_url: 'reachable', variant: 'unreachable'}


def test_flag_on_canonicalizes_discovered_links(spark, small_world):
    corpus, robots, seed_url = small_world
    # two waves so follow-links go through the same canonicalization; the
    # synthetic corpus links are already canonical (no query strings) so
    # flag on/off must agree on the crawl frontier — a fixed-point check
    # that canonicalization never mangles clean URLs mid-crawl
    cfg_on = CrawlConfig(max_waves=2, canonicalize_urls=True)
    cfg_off = CrawlConfig(max_waves=2)
    on = CrawlEngine(spark, corpus, robots, cfg_on,
                     SnapshotStore(tempfile.mkdtemp())).run([seed_url])
    off = CrawlEngine(spark, corpus, robots, cfg_off,
                      SnapshotStore(tempfile.mkdtemp())).run([seed_url])
    rows_on = sorted((r['url'], r['wave'], r['priority'], r['status'])
                     for r in on.seen.collect())
    rows_off = sorted((r['url'], r['wave'], r['priority'], r['status'])
                      for r in off.seen.collect())
    assert rows_on == rows_off and len(rows_on) > 1
