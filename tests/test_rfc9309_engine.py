"""CrawlConfig.robots_matcher: stdlib (reference parity — the FIRST URL
decides the whole host, any_io/robots.py:82-91) vs rfc9309 (per-URL
wildcard matching via operators/robots9309)."""

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

HOST = 'site.test'


def _corpus(spark, paths):
    rows = [
        {'doc_id': f'http://{HOST}{p}',
         'spans': [{'kind': 'text', 'text': f'body{i}', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0}
        for i, p in enumerate(paths)
    ]
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


def _robots(spark, rules, status=200):
    return spark.createDataFrame(
        [{'host': HOST, 'fetch_status': status, 'rules': rules}], ROBOTS_SCHEMA)


def _statuses(spark, corpus, robots, seeds, matcher):
    cfg = CrawlConfig(follow_robots_txt=True, robots_matcher=matcher, max_waves=2)
    res = CrawlEngine(spark, corpus, robots, cfg).run(seeds)
    return {r['url'].replace(f'http://{HOST}', ''): r['status']
            for r in res.seen.collect()}


PATHS = ['/private/a', '/public/b', '/private/sub/c', '/docs.pdf']
RULES = 'User-agent: *\nDisallow: /private/\nDisallow: /*.pdf$'


def test_stdlib_first_url_decides_whole_host(spark):
    corpus = _corpus(spark, PATHS)
    seeds = [f'http://{HOST}{p}' for p in PATHS]  # first = /private/a -> denied
    got = _statuses(spark, corpus, _robots(spark, RULES), seeds, 'stdlib')
    assert got == {p: 'robots_excluded' for p in PATHS}
    # first URL allowed -> the WHOLE host is allowed, even /private/
    # (and stdlib has no wildcard support, so /docs.pdf is allowed too)
    seeds2 = [f'http://{HOST}/public/b'] + [f'http://{HOST}{p}' for p in PATHS[:1]]
    got2 = _statuses(spark, _corpus(spark, ['/public/b', '/private/a']),
                     _robots(spark, RULES), seeds2, 'stdlib')
    assert got2 == {'/public/b': 'reachable', '/private/a': 'reachable'}


def test_rfc9309_decides_per_url(spark):
    corpus = _corpus(spark, PATHS)
    seeds = [f'http://{HOST}{p}' for p in PATHS]
    got = _statuses(spark, corpus, _robots(spark, RULES), seeds, 'rfc9309')
    assert got == {
        '/private/a': 'robots_excluded',
        '/public/b': 'reachable',
        '/private/sub/c': 'robots_excluded',
        '/docs.pdf': 'robots_excluded',   # wildcard $ rule works per URL
    }


def test_rfc9309_status_policy_still_excludes_whole_host(spark):
    corpus = _corpus(spark, PATHS)
    seeds = [f'http://{HOST}{p}' for p in PATHS]
    got = _statuses(spark, corpus, _robots(spark, RULES, status=403), seeds, 'rfc9309')
    assert got == {p: 'robots_excluded' for p in PATHS}


def test_rfc9309_allow_override_wins(spark):
    rules = 'User-agent: *\nDisallow: /private/\nAllow: /private/pub*'
    paths = ['/private/a', '/private/pub/x']
    corpus = _corpus(spark, paths)
    seeds = [f'http://{HOST}{p}' for p in paths]
    got = _statuses(spark, corpus, _robots(spark, rules), seeds, 'rfc9309')
    assert got == {'/private/a': 'robots_excluded', '/private/pub/x': 'reachable'}


def test_config_rejects_unknown_matcher():
    with pytest.raises(ValueError):
        CrawlConfig(robots_matcher='googlebot')
