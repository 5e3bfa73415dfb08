"""Global per-wave fetch-capacity cap (CrawlConfig.max_dispatch_per_wave,
engine step 4b): FIFO across hosts, exact at the straddle bucket,
composes with the per-host budget."""

from __future__ import annotations

import pytest

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.sources.corpus import synthetic_corpus


def _waves(res):
    out = {}
    for r in res.dispatch_rows():
        if r['status'] == 'robots_excluded':
            continue
        out[r['url']] = r['wave']
    return out


def test_global_cap_fifo_across_waves(spark):
    corpus = synthetic_corpus(spark, n_pages=40, n_hosts=1, seed=7)
    seeds = [f'http://h0.example.com/p{p}.html' for p in range(10)]
    cfg = CrawlConfig(max_dispatch_per_wave=4, max_waves=3)
    res = CrawlEngine(spark, corpus, config=cfg).run(seeds)
    waves = _waves(res)
    # strict FIFO: seed k dispatches in wave k // 4
    for k, s in enumerate(seeds):
        assert waves[s] == k // 4, (k, s, waves[s])


def test_global_cap_composes_with_per_host_budget(spark):
    corpus = synthetic_corpus(spark, n_pages=40, n_hosts=2, seed=7)
    # interleave hosts: priorities 0..5 alternate h0,h1
    seeds = [f'http://h{k % 2}.example.com/p{k // 2}.html' for k in range(6)]
    cfg = CrawlConfig(max_dispatch_per_wave=3,
                      max_dispatch_per_host_per_wave=2, max_waves=4)
    res = CrawlEngine(spark, corpus, config=cfg).run(seeds)
    waves = _waves(res)
    # wave 0: per-host cap keeps 0,1,2,3 (2 per host); global cap 3 then
    # keeps the 3 lowest priorities 0,1,2 and defers 3 (plus 4,5 already
    # deferred by the host budget)
    assert [waves[s] for s in seeds[:3]] == [0, 0, 0]
    assert waves[seeds[3]] >= 1
    # everything (seeds + followed links) drains within max_waves, and the
    # global cap held in EVERY wave
    assert all(w <= 3 for w in waves.values())
    per_wave = {}
    for w in waves.values():
        per_wave[w] = per_wave.get(w, 0) + 1
    assert all(n <= 3 for n in per_wave.values()), per_wave


def test_cap_larger_than_wave_is_noop(spark):
    corpus = synthetic_corpus(spark, n_pages=40, n_hosts=1, seed=7)
    seeds = [f'http://h0.example.com/p{p}.html' for p in range(5)]
    res = CrawlEngine(spark, corpus,
                      config=CrawlConfig(max_dispatch_per_wave=100, max_waves=1)
                      ).run(seeds)
    assert sorted(_waves(res).values()) == [0] * 5


def test_config_rejects_nonpositive_cap():
    with pytest.raises(ValueError):
        CrawlConfig(max_dispatch_per_wave=0)
