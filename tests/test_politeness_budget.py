"""Delay-derived politeness budget (SURVEY §2.9 T2/W1; round-2 verdict #1).

The reference paces dispatches by the per-host robots crawl-delay
(``any_io/static_spider.py:180,187`` via ``any_io/robots.py:79-95``,
pinned by ``tests/any_io/test_static_spider.py:265-282``). The wave engine
expresses that pacing as a per-host per-wave budget:

    budget(host) = least(max_dispatch_per_host_per_wave,
                         max(1, floor(wave_duration / delay(host))))

where delay(host) follows the crawl-delay → request-rate → config-default
precedence. ``politeness_mode='green'`` records the config delay instead
(the gevent backend's explicit TODO, green/static_spider.py:192-199), so a
green crawl keeps the config-delay budget.

Parity oracle: ``CrawlSimulator.run_waves`` — the pure-Python executable
spec of the engine's wave loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.simulator import CrawlSimulator
from scalpel_spark.sources.corpus import (synthetic_corpus, synthetic_robots,
                                          synthetic_robots_rows)

N_PAGES, N_HOSTS = 150, 12

# synthetic_robots policy by host index m = h % 12 (sources/corpus.py):
# m=4 → Crawl-delay: 2  → delay 2.0;  m=5 → Request-rate: 2/5 → delay 2.5;
# m=3 → Disallow: / (excluded); m=0/2 → deny-all; m=8..11 → allow, delay 0.


def _pure_sim(politeness_mode: str = 'anyio', request_delay: float = 0.0,
              n_pages: int = 0) -> CrawlSimulator:
    """Spark-free simulator over a hand-rolled corpus: every URL of every
    host exists and links nowhere (budget arithmetic in isolation)."""
    corpus = {
        f'http://h{h}.example.com/p{p}.html': {
            'spans': [], 'http_status': 200, 'readable': True, 'fetch_ms': 1.0,
        }
        for h in range(N_HOSTS)
        for p in range(10)
    }
    robots = {r['host']: r for r in synthetic_robots_rows(N_HOSTS)}
    return CrawlSimulator(corpus, robots, follow_robots_txt=True,
                          user_agent=CrawlConfig().user_agent,
                          request_delay=request_delay,
                          politeness_mode=politeness_mode)


def _seeds(per_host: int = 10) -> list[str]:
    return [f'http://h{h}.example.com/p{p}.html'
            for h in range(N_HOSTS) for p in range(per_host)]


def _per_host_wave_counts(rows) -> dict[tuple[str, int], int]:
    out: dict[tuple[str, int], int] = {}
    for r in rows:
        if r['status'] == 'robots_excluded':
            continue
        host = r['url'].split('/')[2]
        out[(host, r['wave'])] = out.get((host, r['wave']), 0) + 1
    return out


def test_sim_delay_budget_arithmetic():
    """Crawl-delay 2 @ wave_duration 10 → 5/wave; Request-rate 2/5 → 4/wave;
    delay-0 hosts bounded only by max_dispatch."""
    sim = _pure_sim()
    res = sim.run_waves(_seeds(), max_dispatch_per_host_per_wave=8,
                        wave_duration=10.0, max_waves=1)
    counts = _per_host_wave_counts(res.dispatch_rows)
    assert counts[('h4.example.com', 0)] == 5   # floor(10 / 2)
    assert counts[('h5.example.com', 0)] == 4   # floor(10 / 2.5)
    assert counts[('h8.example.com', 0)] == 8   # delay 0 → max_dispatch
    assert ('h3.example.com', 0) not in counts  # Disallow: / → excluded


def test_sim_budget_floor_is_one():
    """delay > wave_duration still dispatches 1/wave — slow hosts progress."""
    sim = _pure_sim()
    sim.robots['h4.example.com'] = {'host': 'h4.example.com', 'fetch_status': 200,
                                    'rules': 'User-agent: *\nCrawl-delay: 30\n'}
    res = sim.run_waves(_seeds(), wave_duration=10.0, max_waves=3)
    counts = _per_host_wave_counts(res.dispatch_rows)
    assert counts[('h4.example.com', 0)] == 1
    assert counts[('h4.example.com', 1)] == 1
    assert counts[('h4.example.com', 2)] == 1


def test_sim_green_mode_keeps_config_delay_budget():
    """green mode records the config delay (robots delay NOT honored,
    green/static_spider.py:192-199) → crawl-delay host paces like any other."""
    res = _pure_sim('green').run_waves(_seeds(), wave_duration=10.0, max_waves=1)
    counts = _per_host_wave_counts(res.dispatch_rows)
    assert counts[('h4.example.com', 0)] == 10  # delay 0 → unbounded
    # nonzero config delay paces EVERY allowed host uniformly
    res2 = _pure_sim('green', request_delay=5.0).run_waves(
        _seeds(), wave_duration=10.0, max_waves=1)
    counts2 = _per_host_wave_counts(res2.dispatch_rows)
    assert counts2[('h4.example.com', 0)] == 2  # floor(10 / 5)
    assert counts2[('h8.example.com', 0)] == 2


def test_wave_sim_without_budget_matches_fifo_sets():
    """Unbudgeted wave mode reaches the same seen sets as the FIFO spec
    (BFS completeness — order differs, sets cannot)."""
    corpus = _pure_sim().corpus
    robots = {r['host']: r for r in synthetic_robots_rows(N_HOSTS)}
    seeds = _seeds(3)
    kwargs = dict(follow_robots_txt=True, user_agent=CrawlConfig().user_agent)
    fifo = CrawlSimulator(corpus, robots, **kwargs).run(seeds)
    waves = CrawlSimulator(corpus, robots, **kwargs).run_waves(seeds)
    assert waves.reachable == fifo.reachable
    assert waves.unreachable == fifo.unreachable
    assert waves.robots_excluded == fifo.robots_excluded


@pytest.mark.parametrize('mode', ['anyio', 'green'])
def test_engine_matches_wave_sim_with_budget(spark, mode):
    """Engine ↔ wave-sim parity under the delay-derived budget, both
    politeness modes: identical (url, wave, status, priority) rows."""
    corpus_df = synthetic_corpus(spark, n_pages=N_PAGES, n_hosts=N_HOSTS, seed=11).persist()
    robots_df = synthetic_robots(spark, n_hosts=N_HOSTS)
    corpus = {r['doc_id']: r.asDict(recursive=True) for r in corpus_df.collect()}
    robots = {r['host']: r for r in synthetic_robots_rows(N_HOSTS)}
    seeds = _seeds(5) + sorted(corpus)[:10]
    # dedupe seeds while keeping first-occurrence order (engine validates
    # but does not dedupe the driver-side seed list; sim mirrors)
    seeds = list(dict.fromkeys(seeds))

    cfg = CrawlConfig(follow_robots_txt=True, politeness_mode=mode,
                      wave_duration=10.0, max_dispatch_per_host_per_wave=8,
                      max_waves=5)
    result = CrawlEngine(spark, corpus_df, robots=robots_df, config=cfg).run(seeds)
    sim = CrawlSimulator(corpus, robots, follow_robots_txt=True,
                         user_agent=cfg.user_agent,
                         request_delay=cfg.request_delay, politeness_mode=mode)
    expected = sim.run_waves(seeds, max_dispatch_per_host_per_wave=8,
                             wave_duration=10.0, max_waves=5)
    assert result.dispatch_rows() == expected.dispatch_rows
    corpus_df.unpersist()


def test_engine_crawl_delay_host_fewer_dispatches(spark):
    """The verdict's 'done' bar: a Crawl-delay host provably gets fewer
    dispatches per wave than a delay-0 host in the SAME engine run."""
    corpus_df = synthetic_corpus(spark, n_pages=N_PAGES, n_hosts=N_HOSTS, seed=11)
    robots_df = synthetic_robots(spark, n_hosts=N_HOSTS)
    cfg = CrawlConfig(follow_robots_txt=True, wave_duration=10.0,
                      max_dispatch_per_host_per_wave=8, max_waves=2)
    result = CrawlEngine(spark, corpus_df, robots=robots_df, config=cfg).run(_seeds(10))
    counts = _per_host_wave_counts(result.dispatch_rows())
    assert counts[('h4.example.com', 0)] == 5      # Crawl-delay: 2
    assert counts[('h5.example.com', 0)] == 4      # Request-rate: 2/5
    assert counts[('h8.example.com', 0)] == 8      # delay 0 → max_dispatch
    # the deferred overflow drains in wave 1 (5 remaining of 10 seeds)
    assert counts[('h4.example.com', 1)] == 5


def test_frontier_priority_reorders_dispatch_within_budget(spark):
    """Opt-in priority-queue frontier: a score expression reorders which
    URLs win the per-host budget slots; default None keeps FIFO parity."""
    corpus_df = synthetic_corpus(spark, n_pages=N_PAGES, n_hosts=N_HOSTS, seed=11)
    seeds = [f'http://h8.example.com/p{p}.html' for p in range(3)]
    score = ("CASE WHEN url LIKE '%/p2.html' THEN 100 "
             "WHEN url LIKE '%/p1.html' THEN 50 ELSE 0 END")

    def waves_of(cfg):
        result = CrawlEngine(spark, corpus_df, config=cfg).run(seeds)
        rows = result.seen.filter(F.col('url').isin(seeds)).select('url', 'wave').collect()
        return {r['url']: r['wave'] for r in rows}

    prio = waves_of(CrawlConfig(max_dispatch_per_host_per_wave=1, max_waves=3,
                                frontier_priority=score))
    assert prio[seeds[2]] == 0 and prio[seeds[1]] == 1 and prio[seeds[0]] == 2
    fifo = waves_of(CrawlConfig(max_dispatch_per_host_per_wave=1, max_waves=3))
    assert fifo[seeds[0]] == 0 and fifo[seeds[1]] == 1 and fifo[seeds[2]] == 2


def test_engine_domain_scope_shares_budget_across_subdomains(spark):
    """politeness_scope='domain': every h*.example.com subdomain shares ONE
    registered-domain budget window, so a wave dispatches max_dispatch URLs
    across the WHOLE domain; 'host' scope (default) gives each subdomain its
    own window. Robots stays host-keyed in both scopes."""
    corpus_df = synthetic_corpus(spark, n_pages=60, n_hosts=6, seed=11)
    seeds = [f'http://h{h}.example.com/p{p}.html' for h in range(6) for p in range(3)]

    def wave0_total(cfg):
        result = CrawlEngine(spark, corpus_df, config=cfg).run(seeds)
        counts = _per_host_wave_counts(result.dispatch_rows())
        return sum(n for (host, wave), n in counts.items() if wave == 0)

    assert wave0_total(CrawlConfig(max_dispatch_per_host_per_wave=3,
                                   max_waves=1)) == 18  # 3 x 6 subdomains
    assert wave0_total(CrawlConfig(max_dispatch_per_host_per_wave=3, max_waves=1,
                                   politeness_scope='domain')) == 3

    # deferred seeds drain deterministically: 18 seeds at 3/wave = 6 waves
    full = CrawlEngine(
        spark, corpus_df,
        config=CrawlConfig(max_dispatch_per_host_per_wave=3, max_waves=6,
                           politeness_scope='domain')).run(seeds)
    counts = _per_host_wave_counts(full.dispatch_rows())
    per_wave = {}
    for (host, wave), n in counts.items():
        per_wave[wave] = per_wave.get(wave, 0) + n
    assert {w: n for w, n in per_wave.items() if w < 6} == {w: 3 for w in range(6)}


def test_config_rejects_unknown_politeness_scope():
    with pytest.raises(ValueError):
        CrawlConfig(politeness_scope='tld')


def test_engine_ip_scope_shares_budget_across_vhosts(spark):
    """politeness_scope='ip' (Heritrix-style server politeness): hosts
    resolving to one address share ONE budget window; hosts missing from
    the host_ips map fall back to their own host identity."""
    corpus_df = synthetic_corpus(spark, n_pages=60, n_hosts=6, seed=13)
    # h0/h1/h2 are vhosts on 10.0.0.1; h3 has its own box; h4/h5 unmapped
    host_ips = spark.createDataFrame(
        [(f'h{h}.example.com', '10.0.0.1') for h in range(3)]
        + [('h3.example.com', '10.0.0.2')],
        'host string, ip string')
    seeds = [f'http://h{h}.example.com/p{p}.html' for h in range(6) for p in range(2)]

    def wave0_counts(scope):
        cfg = CrawlConfig(max_dispatch_per_host_per_wave=2, max_waves=1,
                          politeness_scope=scope)
        ips = host_ips if scope == 'ip' else None
        res = CrawlEngine(spark, corpus_df, config=cfg, host_ips=ips).run(seeds)
        return _per_host_wave_counts(res.dispatch_rows())

    # host scope: every host fills its own budget → 6 hosts x 2 = 12
    assert sum(wave0_counts('host').values()) == 12
    # ip scope: {h0,h1,h2} share one window (2), h3 own window (2),
    # h4/h5 unmapped → own host windows (2 each) → 2 + 2 + 2 + 2 = 8
    by_host = wave0_counts('ip')
    assert sum(by_host.values()) == 8
    shared = sum(n for (h, _), n in by_host.items() if h in
                 {'h0.example.com', 'h1.example.com', 'h2.example.com'})
    assert shared == 2
    # FIFO within the shared window: the two lowest-priority seeds win —
    # seeds enumerate h0/p0, h0/p1 first
    assert by_host.get(('h0.example.com', 0)) == 2


def test_engine_ip_scope_requires_map(spark):
    corpus_df = synthetic_corpus(spark, n_pages=10, n_hosts=2, seed=13)
    with pytest.raises(ValueError):
        CrawlEngine(spark, corpus_df,
                    config=CrawlConfig(politeness_scope='ip'))
