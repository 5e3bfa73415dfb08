"""Green-backend handle-time robots divergence (VERDICT r3 #7): the
gevent worker sleeps request_delay after EVERY dequeue and only then
_handle_url runs the robots check (green/static_spider.py:189-199 +
107-115), so a denied URL consumes a dispatch slot; the anyio worker
checks at schedule time and `continue`s without sleeping
(any_io/static_spider.py:177-187), so a denied URL is free. Under a
per-wave dispatch budget the two modes therefore diverge on WHICH WAVE
each exclusion lands in — pinned here engine-vs-expected and
engine-vs-simulator.
"""

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

HOST = 'd.test'
SEEDS = [f'http://{HOST}/p{i}.html' for i in range(5)]


def _corpus(spark):
    return spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': True, 'fetch_ms': 1.0}
        for u in SEEDS
    ], CORPUS_SCHEMA)


def _robots(spark, rules='User-agent: *\nDisallow: /'):
    return spark.createDataFrame(
        [{'host': HOST, 'fetch_status': 200, 'rules': rules}], ROBOTS_SCHEMA)


def _engine_rows(spark, mode, **cfg_kw):
    cfg = CrawlConfig(follow_robots_txt=True, politeness_mode=mode,
                      max_waves=6, **cfg_kw)
    res = CrawlEngine(spark, _corpus(spark), _robots(spark), cfg).run(SEEDS)
    return sorted((r['url'], r['status'], r['wave'])
                  for r in res.seen.collect())


def test_denied_urls_consume_slots_only_in_green(spark):
    """Deny-all host, budget 2/wave: anyio excludes all five seeds at
    schedule time in wave 0 (free); green pays one slot per denial, so
    exclusions spread over waves 0,0,1,1,2."""
    anyio = _engine_rows(spark, 'anyio', max_dispatch_per_host_per_wave=2)
    green = _engine_rows(spark, 'green', max_dispatch_per_host_per_wave=2)
    assert anyio == [(u, 'robots_excluded', 0) for u in sorted(SEEDS)]
    assert green == [
        ('http://d.test/p0.html', 'robots_excluded', 0),
        ('http://d.test/p1.html', 'robots_excluded', 0),
        ('http://d.test/p2.html', 'robots_excluded', 1),
        ('http://d.test/p3.html', 'robots_excluded', 1),
        ('http://d.test/p4.html', 'robots_excluded', 2),
    ]


def test_simulator_parity_both_modes(spark):
    """run_waves mirrors the engine's slot semantics in BOTH modes on
    the deny-all budget scenario — the executable spec stays the spec."""
    corpus_rows = {u: {'doc_id': u, 'spans': [
        {'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
        'http_status': 200, 'scheme': 'http', 'readable': True,
        'fetch_ms': 1.0} for u in SEEDS}
    robots_rows = {HOST: {'host': HOST, 'fetch_status': 200,
                          'rules': 'User-agent: *\nDisallow: /'}}
    for mode in ('anyio', 'green'):
        sim = CrawlSimulator(corpus_rows, robots_rows,
                             follow_robots_txt=True, politeness_mode=mode)
        sim_res = sim.run_waves(SEEDS, max_dispatch_per_host_per_wave=2,
                                max_waves=6)
        sim_rows = sorted((r['url'], r['status'], r['wave'])
                          for r in sim_res.dispatch_rows)
        assert sim_rows == _engine_rows(
            spark, mode, max_dispatch_per_host_per_wave=2), mode


def test_rfc9309_denied_urls_displace_allowed_in_green(spark):
    """Per-URL matcher, budget 1/wave, seeds p0..p4 with p1/p2 denied:
    anyio dispatches allowed rows back-to-back (denials free); green
    burns waves 1 and 2 on the denials, pushing p3/p4 two waves out."""
    rules = 'User-agent: *\nDisallow: /p1.html\nDisallow: /p2.html'
    cfg_kw = dict(max_dispatch_per_host_per_wave=1, robots_matcher='rfc9309')

    def rows(mode):
        cfg = CrawlConfig(follow_robots_txt=True, politeness_mode=mode,
                          max_waves=8, **cfg_kw)
        res = CrawlEngine(spark, _corpus(spark), _robots(spark, rules),
                          cfg).run(SEEDS)
        return {r['url']: (r['status'], r['wave'])
                for r in res.seen.collect()}

    anyio, green = rows('anyio'), rows('green')
    # verdicts identical in both modes
    assert {u: s for u, (s, _) in anyio.items()} == \
           {u: s for u, (s, _) in green.items()}
    assert anyio['http://d.test/p1.html'][0] == 'robots_excluded'
    assert anyio['http://d.test/p2.html'][0] == 'robots_excluded'
    # anyio: denials land wave 0 (schedule time), allowed p0,p3,p4 take
    # one slot per wave -> waves 0,1,2
    assert anyio['http://d.test/p1.html'][1] == 0
    assert anyio['http://d.test/p2.html'][1] == 0
    assert anyio['http://d.test/p0.html'][1] == 0
    assert anyio['http://d.test/p3.html'][1] == 1
    assert anyio['http://d.test/p4.html'][1] == 2
    # green: every row pays a slot in FIFO order -> p_i lands wave i
    for i in range(5):
        assert green[f'http://d.test/p{i}.html'][1] == i, green
