"""VERDICT r2 #8 — green-backend handle-time fidelity.

The gevent backend reads file:// URLs in `_handle_url` BEFORE its robots
check (which lives in the http else-branch only, green/static_spider.py:
126-140), so a denied host's file URLs are still fetched. The anyio
worker instead consults the robots delay-mapping for every dequeued URL
(any_io/static_spider.py:181-184) — host-keyed schedule-time exclusion
that catches file://host/path URLs too. Engine and simulator must agree
with each other in BOTH modes, and the two modes must diverge on exactly
the file URL under deny-all robots."""

from __future__ import annotations

import tempfile

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

HOST = 'denied.example.com'
HTTP_URL = f'http://{HOST}/a.html'
FILE_URL = f'file://{HOST}/b.txt'

CORPUS_ROWS = [
    {'doc_id': HTTP_URL, 'spans': [{'kind': 'text', 'text': 'alpha', 'media_ref': None, 'offset': 0}],
     'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0},
    {'doc_id': FILE_URL, 'spans': [{'kind': 'text', 'text': 'beta', 'media_ref': None, 'offset': 0}],
     'http_status': 0, 'scheme': 'file', 'readable': True, 'fetch_ms': 3.0},
]
ROBOTS_ROWS = [{'host': HOST, 'fetch_status': 200, 'rules': 'User-agent: *\nDisallow: /'}]


def _engine_statuses(spark, mode):
    corpus = spark.createDataFrame(CORPUS_ROWS, CORPUS_SCHEMA)
    robots = spark.createDataFrame(ROBOTS_ROWS, ROBOTS_SCHEMA)
    cfg = CrawlConfig(follow_robots_txt=True, politeness_mode=mode, max_waves=2)
    res = CrawlEngine(spark, corpus, robots, cfg, SnapshotStore(tempfile.mkdtemp())).run(
        [HTTP_URL, FILE_URL])
    return {r['url']: r['status'] for r in res.seen.collect()}


def _sim_statuses(mode, waves):
    corpus = {r['doc_id']: r for r in CORPUS_ROWS}
    robots = {r['host']: r for r in ROBOTS_ROWS}
    sim = CrawlSimulator(corpus, robots, follow_robots_txt=True,
                         user_agent=CrawlConfig().user_agent, politeness_mode=mode)
    res = sim.run_waves([HTTP_URL, FILE_URL]) if waves else sim.run([HTTP_URL, FILE_URL])
    out = {}
    for url in (HTTP_URL, FILE_URL):
        if url in res.reachable:
            out[url] = 'reachable'
        elif url in res.unreachable:
            out[url] = 'unreachable'
        elif url in res.robots_excluded:
            out[url] = 'robots_excluded'
    return out


@pytest.mark.parametrize('mode, expected', [
    ('anyio', {HTTP_URL: 'robots_excluded', FILE_URL: 'robots_excluded'}),
    ('green', {HTTP_URL: 'robots_excluded', FILE_URL: 'reachable'}),
])
def test_engine_and_both_simulators_agree(spark, mode, expected):
    assert _engine_statuses(spark, mode) == expected
    assert _sim_statuses(mode, waves=False) == expected
    assert _sim_statuses(mode, waves=True) == expected


def test_modes_diverge_only_on_the_file_url():
    anyio = _sim_statuses('anyio', waves=False)
    green = _sim_statuses('green', waves=False)
    assert anyio[HTTP_URL] == green[HTTP_URL] == 'robots_excluded'
    assert (anyio[FILE_URL], green[FILE_URL]) == ('robots_excluded', 'reachable')
