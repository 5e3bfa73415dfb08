"""Round-2 engine hardening: aggregate statistics, distributed host_state,
ignore_errors quarantine, politeness_mode backend parity, dotted-path
config callables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig, load_from_env, load_from_yaml, resolve_callable
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.sources.corpus import golden_site, golden_site_rows


def _golden_engine(spark, **cfg_kwargs):
    cfg = CrawlConfig(link_rule='second_contains_page', **cfg_kwargs)
    return CrawlEngine(spark, golden_site(spark, 'http'), config=cfg)


# ---------------------------------------------------------------------------
# statistics_agg (production path, VERDICT r1 #2)
# ---------------------------------------------------------------------------


def test_statistics_agg_matches_set_statistics(spark):
    res = _golden_engine(spark).run(['http://quotes.com'])
    rows = {r['status']: r for r in res.statistics_agg().collect()}
    stats = res.statistics()
    assert rows['reachable']['n_urls'] == len(stats.reachable_urls) == 3
    assert rows['reachable']['total_fetch_ms'] == 6.0
    assert rows['reachable']['avg_fetch_ms'] == stats.average_fetch_time == 2.0
    assert 'unreachable' not in rows  # golden crawl has none


# ---------------------------------------------------------------------------
# distributed host_state (VERDICT r1 #1): no driver collect, state is a
# committed parquet table that accumulates only NEW hosts per wave
# ---------------------------------------------------------------------------


def test_host_state_beyond_broadcast_limit_matches(spark):
    """broadcast_host_limit=0 forces the AQE shuffle-join path for the
    robots join (the 10^8-host regime) — results must equal the
    broadcast-hinted default."""
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(spark, n_pages=120, n_hosts=10, seed=5)
    robots = synthetic_robots(spark, n_hosts=10)
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(6)]
    base = CrawlConfig(follow_robots_txt=True, max_waves=2)
    a = CrawlEngine(spark, corpus, robots=robots, config=base).run(seeds)
    b = CrawlEngine(spark, corpus, robots=robots,
                    config=CrawlConfig(follow_robots_txt=True, max_waves=2,
                                       broadcast_host_limit=0)).run(seeds)
    assert a.dispatch_rows() == b.dispatch_rows()


def test_host_state_committed_and_accumulates(spark):
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    n_hosts = 50
    corpus = synthetic_corpus(spark, n_pages=300, n_hosts=n_hosts, seed=3)
    robots = synthetic_robots(spark, n_hosts=n_hosts)
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=3,
                      max_dispatch_per_host_per_wave=5)
    engine = CrawlEngine(spark, corpus, robots=robots, config=cfg)
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(10)]
    engine.run(seeds)
    hs = engine.store.load_current(spark, 'host_state')
    assert hs is not None
    n = hs.count()
    # every dispatched host exactly once (decision cached forever —
    # any_io/robots.py:79-95), across all waves
    assert hs.select('host').distinct().count() == n
    assert n >= 10  # at least the seed hosts


# ---------------------------------------------------------------------------
# ignore_errors (VERDICT r1 #7)
# ---------------------------------------------------------------------------


def _raising_processor(items):
    raise RuntimeError('processor exploded at composition')


def _runtime_failing_processor(items):
    # plan composes fine, every evaluated row raises — the data-dependent
    # failure mode (reference parse-callback exception)
    return items.withColumn('boom', F.raise_error(F.lit('row-level failure')))


def test_ignore_errors_false_raises(spark):
    engine = _golden_engine(spark, item_processors=(_raising_processor,))
    with pytest.raises(RuntimeError, match='processor exploded'):
        engine.run(['http://quotes.com'])


def test_ignore_errors_true_quarantines_and_completes(spark):
    engine = _golden_engine(spark, item_processors=(_raising_processor,),
                            ignore_errors=True)
    res = engine.run(['http://quotes.com'])
    # crawl completed: all three pages fetched despite the broken processor
    assert len(res.fetch_sequence()) == 3
    q = res.items_quarantine
    assert q is not None
    qrows = q.collect()
    assert len(qrows) == 6  # 2 quote items per page, all quarantined raw
    assert all('processor exploded' in r['error'] for r in qrows)
    assert res.items.count() == 0  # nothing reached the items table


def test_ignore_errors_true_catches_runtime_failures(spark):
    engine = _golden_engine(spark, item_processors=(_runtime_failing_processor,),
                            ignore_errors=True)
    res = engine.run(['http://quotes.com'])
    assert len(res.fetch_sequence()) == 3
    assert res.items_quarantine.count() == 6
    assert res.items.count() == 0


def test_ignore_errors_skips_broken_middleware(spark):
    def broken_middleware(fetch):
        raise RuntimeError('middleware exploded')

    engine = _golden_engine(spark, response_middlewares=(broken_middleware,),
                            ignore_errors=True)
    res = engine.run(['http://quotes.com'])
    assert len(res.fetch_sequence()) == 3  # bare fetch proceeded


# ---------------------------------------------------------------------------
# politeness_mode (SURVEY §3.2 committed design, VERDICT r1 #6)
# ---------------------------------------------------------------------------

_MODE_ROBOTS = [
    {'host': 'crawldelay.com', 'fetch_status': 200,
     'rules': 'User-agent: *\nCrawl-delay: 7\n'},
    {'host': 'reqrate.com', 'fetch_status': 200,
     'rules': 'User-agent: *\nRequest-rate: 2/5\n'},
    {'host': 'plain.com', 'fetch_status': 200,
     'rules': 'User-agent: *\nDisallow:\n'},
    {'host': 'denied.com', 'fetch_status': 200,
     'rules': 'User-agent: *\nDisallow: /\n'},
]


def _mode_corpus_rows():
    rows = []
    for host in ('crawldelay.com', 'reqrate.com', 'plain.com', 'denied.com'):
        rows.append({
            'doc_id': f'http://{host}/index.html',
            'spans': [{'kind': 'text', 'text': 'hello', 'media_ref': None, 'offset': 0},
                      {'kind': 'text', 'text': 'world', 'media_ref': None, 'offset': 1}],
            'http_status': 200, 'scheme': 'http', 'readable': True, 'fetch_ms': 1.0,
        })
    return rows


@pytest.mark.parametrize('mode', ['anyio', 'green'])
def test_politeness_mode_engine_matches_simulator(spark, mode):
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

    corpus_rows = _mode_corpus_rows()
    corpus = spark.createDataFrame(corpus_rows, CORPUS_SCHEMA)
    robots = spark.createDataFrame(_MODE_ROBOTS, ROBOTS_SCHEMA)
    seeds = [r['doc_id'] for r in corpus_rows]
    cfg = CrawlConfig(follow_robots_txt=True, min_request_delay=3,
                      max_request_delay=3, politeness_mode=mode)
    engine = CrawlEngine(spark, corpus, robots=robots, config=cfg)
    res = engine.run(seeds)

    sim = CrawlSimulator(
        {r['doc_id']: r for r in corpus_rows},
        {r['host']: r for r in _MODE_ROBOTS},
        follow_robots_txt=True, request_delay=3.0, politeness_mode=mode,
    )
    sim_res = sim.run(seeds)

    # crawl SETS identical across modes and engines (exclusion unaffected)
    stats = res.statistics()
    assert stats.reachable_urls == sim_res.reachable
    assert stats.robots_excluded_urls == sim_res.robots_excluded

    # per-host delays: engine host_state == simulator host cache
    hs = {r['host']: r['delay'] for r in
          engine.store.load_current(spark, 'host_state').collect()}
    sim_hs = {h: d for h, (_, d) in sim._host_state.items()}
    assert hs == sim_hs
    if mode == 'anyio':
        assert hs['crawldelay.com'] == 7.0      # robots crawl-delay honored
        assert hs['reqrate.com'] == 2.5         # 5s / 2 requests
    else:
        assert hs['crawldelay.com'] == 3.0      # config delay, robots ignored
        assert hs['reqrate.com'] == 3.0
    assert hs['plain.com'] == 3.0
    assert hs['denied.com'] == -1.0             # -1 sentinel in BOTH modes


# ---------------------------------------------------------------------------
# dotted-path config callables (VERDICT r1 #10)
# ---------------------------------------------------------------------------


def test_resolve_callable_forms():
    fn = resolve_callable('tests.callables_fixture:drop_einstein')
    assert callable(fn)
    assert resolve_callable('tests.callables_fixture.drop_einstein') is fn
    assert resolve_callable(fn) is fn
    with pytest.raises(ValueError):
        resolve_callable('justaname')
    with pytest.raises(TypeError):
        resolve_callable('tests.callables_fixture.NOT_CALLABLE')
    with pytest.raises(ModuleNotFoundError):
        resolve_callable('no.such.module:fn')


def test_yaml_dotted_path_processors_run_in_crawl(spark, tmp_path):
    cfg_file = tmp_path / 'scalpel.yml'
    cfg_file.write_text(
        'scalpel:\n'
        '  link_rule: second_contains_page\n'
        '  item_processors:\n'
        '    - tests.callables_fixture.drop_einstein\n'
        '    - tests.callables_fixture:tag_items\n'
        '  response_middlewares:\n'
        '    - tests.callables_fixture.passthrough_middleware\n'
    )
    cfg = load_from_yaml(str(cfg_file))
    assert len(cfg.item_processors) == 2 and len(cfg.response_middlewares) == 1
    res = CrawlEngine(spark, golden_site(spark, 'http'), config=cfg).run(['http://quotes.com'])
    items = res.items.collect()
    # golden site has 6 quote items, 3 by Einstein — processor dropped them
    golden_authors = [s['text'] for row in golden_site_rows('http')
                      for s in row['spans'] if s['kind'] == 'text'][1::2]
    n_einstein = sum(1 for a in golden_authors if a == 'Albert Einstein')
    assert len(items) == 6 - n_einstein
    assert all(r['author'] != 'Albert Einstein' and r['tagged'] for r in items)


def test_env_dotted_path_processors():
    cfg = load_from_env({
        'SCALPEL_ITEM_PROCESSORS':
            'tests.callables_fixture.drop_einstein, tests.callables_fixture:tag_items',
        'SCALPEL_IGNORE_ERRORS': 'true',
    })
    assert len(cfg.item_processors) == 2
    assert cfg.ignore_errors is True


def _runtime_failing_middleware(fetch):
    # composes fine; the returned plan raises per-row at EVALUATION —
    # the advisor's data-dependent middleware failure mode
    def wrapped(df):
        out = fetch(df)
        return out.withColumn(
            'status',
            F.when(F.length('url') >= 0, F.raise_error(F.lit('mw row-level failure')))
            .otherwise(F.col('status')),
        )
    return wrapped


def test_ignore_errors_middleware_runtime_failure_falls_back(spark):
    """ADVICE r2: a middleware whose plan fails at evaluation (not at
    composition) must be skipped under ignore_errors=True — the bare fetch
    proceeds and the crawl completes."""
    engine = _golden_engine(spark, response_middlewares=(_runtime_failing_middleware,),
                            ignore_errors=True)
    res = engine.run(['http://quotes.com'])
    assert len(res.fetch_sequence()) == 3
    mw_errors = res.metrics.filter(F.col('stage') == 'middleware_error').count()
    assert mw_errors >= 1


def test_middleware_runtime_failure_raises_without_ignore_errors(spark):
    engine = _golden_engine(spark, response_middlewares=(_runtime_failing_middleware,))
    with pytest.raises(Exception, match='mw row-level failure'):
        engine.run(['http://quotes.com'])
