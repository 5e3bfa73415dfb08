"""Recrawl windows (VERDICT r1 #8): forget() + the cuckoo seen-filter —
the delete-capable membership structure the north star names, wired into
the engine end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import golden_site

PAGE2 = 'http://quotes.com/page2.html'
ALL3 = {'http://quotes.com', PAGE2, 'http://quotes.com/page3.html'}


def _engine(spark, tmp_path, **cfg_kwargs):
    cfg = CrawlConfig(link_rule='second_contains_page', **cfg_kwargs)
    store = SnapshotStore(str(tmp_path / 'store'))
    return CrawlEngine(spark, golden_site(spark, 'http'), config=cfg, store=store)


@pytest.mark.parametrize('seen_filter', ['bloom', 'cuckoo'])
def test_golden_crawl_identical_under_both_filters(spark, tmp_path, seen_filter):
    engine = _engine(spark, tmp_path / seen_filter, seen_filter=seen_filter)
    res = engine.run(['http://quotes.com'])
    assert res.fetch_sequence() == ['http://quotes.com', PAGE2, 'http://quotes.com/page3.html']
    assert res.statistics().reachable_urls == ALL3


def test_forget_then_refetch_deterministically(spark, tmp_path):
    engine = _engine(spark, tmp_path, seen_filter='cuckoo')
    res1 = engine.run(['http://quotes.com'])
    assert res1.statistics().reachable_urls == ALL3

    engine.forget([PAGE2])
    # seen and followed no longer contain the forgotten URL
    seen_urls = {r['url'] for r in engine._state('seen_delta', 'url string').select('url').collect()}
    assert seen_urls == ALL3 - {PAGE2}
    followed = {r['url'] for r in engine._state('followed_delta', 'url string').collect()}
    assert PAGE2 not in followed

    # recrawl: page2 is re-fetched; its neighbors stay deduped as seen
    res2 = engine.run([PAGE2])
    assert res2.seen.filter(f"url = '{PAGE2}' and status = 'reachable'").count() >= 1
    # final state: all three reachable again, exactly once each
    final = res2.seen.filter("status = 'reachable'")
    assert {r['url'] for r in final.collect()} == ALL3
    assert final.count() == 3
    # page1/page3 were NOT re-fetched (their original wave rows survive,
    # no new rows) — deterministic dedup across the forget boundary
    assert res2.seen.filter("url = 'http://quotes.com'").count() == 1
    # docs and items were compacted too: the recrawled page's doc appears
    # exactly once (no stale pre-forget copy), 2 items per page
    assert res2.docs.filter(f"doc_id = '{PAGE2}'").count() == 1
    assert res2.docs.count() == 3
    assert res2.items.count() == 6


def test_forget_without_cuckoo_still_compacts(spark, tmp_path):
    engine = _engine(spark, tmp_path, seen_filter='bloom')
    engine.run(['http://quotes.com'])
    engine.forget([PAGE2])
    res2 = engine.run([PAGE2])
    assert {r['url'] for r in res2.seen.filter("status='reachable'").collect()} == ALL3
    assert res2.seen.count() == 3


def _url_hashes(spark, urls) -> np.ndarray:
    from pyspark.sql import functions as F

    from scalpel_spark.functions.urls import url_hash_col

    df = spark.createDataFrame([(u,) for u in urls], 'url string')
    rows = df.select(url_hash_col(F.col('url')).alias('h')).collect()
    return np.array([r['h'] for r in rows], dtype=np.int64)


def test_cuckoo_sidecar_persists_and_reloads(spark, tmp_path):
    engine = _engine(spark, tmp_path, seen_filter='cuckoo')
    engine.run(['http://quotes.com'])
    # fresh engine over the same store: sidecar reloads, URLs read as seen
    engine2 = _engine(spark, tmp_path, seen_filter='cuckoo')
    assert engine2._cuckoo.contains(_url_hashes(spark, sorted(ALL3))).all()
    # forget deletes from the sidecar
    engine2.forget([PAGE2])
    assert not engine2._cuckoo.contains(_url_hashes(spark, [PAGE2])).any()


def test_saturated_cuckoo_falls_back_to_exact(spark, tmp_path):
    # a saturated filter can hold false negatives, so the engine must stop
    # trusting it and still produce the exact crawl via the fallback path
    engine = _engine(spark, tmp_path, seen_filter='cuckoo')
    engine._cuckoo_saturated = True
    res = engine.run(['http://quotes.com'])
    assert res.statistics().reachable_urls == ALL3
    assert res.seen.count() == 3


def test_cuckoo_rebuilds_from_bloom_written_store(spark, tmp_path):
    """A store written under seen_filter='bloom' has no sidecar; opening it
    in cuckoo mode rebuilds the filter from the seen hashes once, and
    forget()/recrawl work from there."""
    bloom_engine = _engine(spark, tmp_path, seen_filter='bloom')
    bloom_engine.run(['http://quotes.com'])

    cuckoo_engine = _engine(spark, tmp_path, seen_filter='cuckoo')  # same store
    assert cuckoo_engine._cuckoo.contains(_url_hashes(spark, sorted(ALL3))).all()
    cuckoo_engine.forget([PAGE2])
    res = cuckoo_engine.run([PAGE2])
    assert {r['url'] for r in res.seen.filter("status='reachable'").collect()} == ALL3
    assert res.seen.count() == 3
