"""CrawlConfig.content_dedup: one items emission per unique span-sequence
fingerprint (Heritrix-style digest dedup), across and within waves, with
forget() keeping the signature set consistent."""

from __future__ import annotations

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA

HOST = 'mirror.test'


def _spans(text):
    return [{'kind': 'text', 'text': text, 'media_ref': None, 'offset': 0},
            {'kind': 'text', 'text': f'{text}-author', 'media_ref': None, 'offset': 1}]


def _corpus(spark, pages):
    """pages: list of (path, content_key). Same content_key => identical spans."""
    rows = [
        {'doc_id': f'http://{HOST}{path}', 'spans': _spans(key),
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0}
        for path, key in pages
    ]
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


def _run(spark, corpus, seeds, store=None, **cfg):
    eng = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=2, **cfg),
                      store=store)
    return eng, eng.run(seeds)


def test_within_wave_duplicates_emit_once(spark):
    corpus = _corpus(spark, [('/a', 'same'), ('/b', 'same'), ('/c', 'other')])
    seeds = [f'http://{HOST}{p}' for p in ('/a', '/b', '/c')]
    _, res = _run(spark, corpus, seeds, content_dedup=True)
    # all three fetched and recorded
    assert res.seen.filter("status='reachable'").count() == 3
    assert res.docs.count() == 3
    # items only from the FIRST-discovered duplicate (/a) and /c
    emitters = {r['doc_id'] for r in res.items.select('doc_id').distinct().collect()}
    assert emitters == {f'http://{HOST}/a', f'http://{HOST}/c'}


def test_without_flag_everything_emits(spark):
    corpus = _corpus(spark, [('/a', 'same'), ('/b', 'same')])
    seeds = [f'http://{HOST}/a', f'http://{HOST}/b']
    _, res = _run(spark, corpus, seeds, content_dedup=False)
    emitters = {r['doc_id'] for r in res.items.select('doc_id').distinct().collect()}
    assert emitters == {f'http://{HOST}/a', f'http://{HOST}/b'}


def test_cross_wave_duplicate_suppressed(spark, tmp_path):
    corpus = _corpus(spark, [('/a', 'same'), ('/b', 'same')])
    store = SnapshotStore(str(tmp_path / 'store'))
    eng, res1 = _run(spark, corpus, [f'http://{HOST}/a'], store=store,
                     content_dedup=True)
    assert {r['doc_id'] for r in res1.items.select('doc_id').collect()} \
        == {f'http://{HOST}/a'}
    # second run on the same store fetches /b — same content, no new items
    res2 = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=2, content_dedup=True),
                       store=store).run([f'http://{HOST}/b'])
    assert res2.seen.filter("status='reachable'").count() == 2
    assert {r['doc_id'] for r in res2.items.select('doc_id').distinct().collect()} \
        == {f'http://{HOST}/a'}


def test_forget_releases_signature_only_when_last_holder(spark, tmp_path):
    corpus = _corpus(spark, [('/a', 'same'), ('/b', 'same'), ('/c', 'solo')])
    seeds = [f'http://{HOST}{p}' for p in ('/a', '/b', '/c')]
    store = SnapshotStore(str(tmp_path / 'store'))
    eng, res = _run(spark, corpus, seeds, store=store, content_dedup=True)

    # forget /a (a duplicate-content holder): /b still holds the signature,
    # so recrawling /a emits NOTHING new
    eng.forget([f'http://{HOST}/a'])
    res2 = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=2, content_dedup=True),
                       store=store).run([f'http://{HOST}/a'])
    emitters = {r['doc_id'] for r in res2.items.select('doc_id').distinct().collect()}
    assert emitters == {f'http://{HOST}/c'}  # /a's original items were compacted away

    # forget /c (the ONLY holder of 'solo'): the signature is released and
    # a recrawl emits items again
    eng2 = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=2, content_dedup=True),
                       store=store)
    eng2.forget([f'http://{HOST}/c'])
    res3 = eng2.run([f'http://{HOST}/c'])
    emitters = {r['doc_id'] for r in res3.items.select('doc_id').distinct().collect()}
    assert f'http://{HOST}/c' in emitters


def _raising_processor(items):
    raise RuntimeError('processor exploded')


def test_quarantined_wave_releases_signatures(spark, tmp_path):
    """A wave whose items were quarantined emitted NOTHING, so its
    content signatures must not enter content_seen_delta — otherwise a
    later duplicate would be suppressed without any items row ever
    existing."""
    from scalpel_spark.plans.storage import SnapshotStore

    store = SnapshotStore(str(tmp_path / 'store'))
    corpus = _corpus(spark, [('/a', 'same'), ('/b', 'same')])
    eng1 = CrawlEngine(
        spark, corpus,
        config=CrawlConfig(max_waves=1, content_dedup=True,
                           ignore_errors=True,
                           item_processors=(_raising_processor,)),
        store=store)
    res1 = eng1.run([f'http://{HOST}/a'])
    assert res1.items.count() == 0
    assert res1.items_quarantine.count() > 0

    # a later run fetching IDENTICAL content on a mirror URL still emits
    eng2 = CrawlEngine(spark, corpus,
                       config=CrawlConfig(max_waves=1, content_dedup=True),
                       store=store)
    res2 = eng2.run([f'http://{HOST}/b'])
    emitters = {r['doc_id'] for r in res2.items.select('doc_id').distinct().collect()}
    assert f'http://{HOST}/b' in emitters
