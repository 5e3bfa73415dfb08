"""CrawlConfig.max_retries — fetch-retry re-enqueue semantics.

Beyond reference: the reference performs exactly one attempt per dequeued
URL (any_io/static_spider.py's worker fetches once and records the
result). With max_retries > 0 the engine re-enqueues an unreachable fetch
into the next wave's frontier at its original priority, withholding it
from seen until the budget is exhausted or a retry succeeds.
"""

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import CORPUS_SCHEMA


def _corpus(spark, rows):
    return spark.createDataFrame(
        [
            {
                'doc_id': u,
                'spans': [{'kind': 'text', 'text': body, 'media_ref': None, 'offset': 0}],
                'http_status': status,
                'scheme': 'http',
                'readable': None,
                'fetch_ms': 1.0,
            }
            for u, body, status in rows
        ],
        CORPUS_SCHEMA,
    )


HOST = 'retry.example.com'
OK = f'http://{HOST}/ok'
FLAKY = f'http://{HOST}/flaky'
DEAD = f'http://{HOST}/dead'


def _flaky_until(url: str, wave: int):
    """Response middleware: `url` is unreachable while the wave column is
    below `wave` — a deterministic stand-in for a transient 5xx."""

    def middleware(fetch):
        def wrapped(df):
            out = fetch(df)
            return out.withColumn(
                'status',
                F.when((F.col('url') == url) & (F.col('wave') < wave), F.lit('unreachable'))
                .otherwise(F.col('status')),
            )

        return wrapped

    return middleware


def test_retry_then_success_and_exhaustion(spark, tmp_path):
    corpus = _corpus(spark, [(OK, 'fine', 200), (FLAKY, 'late', 200), (DEAD, 'gone', 500)])
    cfg = CrawlConfig(max_retries=2, max_waves=6,
                      response_middlewares=(_flaky_until(FLAKY, 2),),
                      checkpoint_dir=str(tmp_path / 'store'))
    res = CrawlEngine(spark, corpus, config=cfg).run([OK, FLAKY, DEAD])
    seen = {r['url']: (r['status'], r['wave']) for r in res.seen.collect()}
    # OK succeeds first try; FLAKY fails waves 0-1, succeeds on its second
    # retry at wave 2; DEAD burns both retries and finalizes at wave 2.
    assert seen == {
        OK: ('reachable', 0),
        FLAKY: ('reachable', 2),
        DEAD: ('unreachable', 2),
    }
    attempts = {(r['url_hash'], r['attempt'], r['wave']) for r in res.retries.collect()}
    # 2 urls x 2 retry waves = 4 lineage rows, attempts 1 then 2
    assert len(attempts) == 4
    assert sorted(a for _, a, _ in attempts) == [1, 1, 2, 2]
    retried = {r['stage'] for r in res.metrics.collect()}
    assert 'retry_requeued' in retried


def test_retry_off_is_reference_parity(spark):
    corpus = _corpus(spark, [(OK, 'fine', 200), (DEAD, 'gone', 500)])
    res = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=3)).run([OK, DEAD])
    seen = {r['url']: (r['status'], r['wave']) for r in res.seen.collect()}
    assert seen == {OK: ('reachable', 0), DEAD: ('unreachable', 0)}
    assert res.retries is None


def test_retry_budget_survives_resume(spark, tmp_path):
    """Attempt counts persist in retry_delta: a resumed run continues the
    budget rather than restarting it."""
    store = str(tmp_path / 'store')
    corpus = _corpus(spark, [(DEAD, 'gone', 500)])
    cfg = CrawlConfig(max_retries=3, max_waves=2, checkpoint_dir=store)
    engine = CrawlEngine(spark, corpus, config=cfg)
    first = engine.run([DEAD])
    # 2 waves ran, consuming attempts 1 and 2; nothing finalized in seen yet
    assert first.seen.count() == 0
    assert sorted((r['attempt'], r['wave']) for r in first.retries.collect()) == [(1, 0), (2, 1)]
    cfg2 = CrawlConfig(max_retries=3, max_waves=10, checkpoint_dir=store)
    engine2 = CrawlEngine(spark, corpus, config=cfg2)
    res = engine2.resume()
    seen = {r['url']: (r['status'], r['wave']) for r in res.seen.collect()}
    assert seen == {DEAD: ('unreachable', 3)}
    attempts = sorted((r['attempt'], r['wave']) for r in res.retries.collect())
    assert attempts == [(1, 0), (2, 1), (3, 2)]


def test_forget_resets_retry_budget(spark, tmp_path):
    store = str(tmp_path / 'store')
    corpus = _corpus(spark, [(DEAD, 'gone', 500)])
    cfg = CrawlConfig(max_retries=1, max_waves=4, checkpoint_dir=store)
    engine = CrawlEngine(spark, corpus, config=cfg)
    res = engine.run([DEAD])
    assert res.retries.count() == 1
    engine.forget([DEAD])
    # after forget, the retry lineage for DEAD is compacted away — the
    # next crawl of DEAD starts with a fresh attempt budget
    assert engine._state('retry_delta', 'url_hash long, attempt int, wave int').count() == 0


def test_max_retries_validation():
    with pytest.raises(ValueError):
        CrawlConfig(max_retries=-1)
