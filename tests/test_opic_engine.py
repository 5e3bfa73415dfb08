"""frontier_priority='opic' — within-run adaptive crawl ordering from
the engine's incremental OPIC state (graphrank.opic_init/opic_update
wired into the wave loop)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.operators import graphrank
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA


def _doc(u, spans):
    return {'doc_id': u, 'spans': spans, 'http_status': 200,
            'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}


def _text(t):
    return {'kind': 'text', 'text': t, 'media_ref': None, 'offset': 0}


def _link(u):
    return {'kind': 'link', 'text': u, 'media_ref': None, 'offset': 0}


def _hub_corpus(spark):
    """a.com/root cites c.com FIRST (so FIFO would dispatch c.com/x
    first) but cites b.com TWICE — OPIC routes twice the cash to b."""
    return spark.createDataFrame([
        _doc('http://a.com/root',
             [_text('hub'), _link('http://c.com/x'),
              _link('http://b.com/x'), _link('http://b.com/x')]),
        _doc('http://b.com/x', [_text('b')]),
        _doc('http://c.com/x', [_text('c')]),
    ], CORPUS_SCHEMA)


def _run(spark, corpus, **cfg_kwargs):
    cfg = CrawlConfig(max_waves=3, max_dispatch_per_wave=1, **cfg_kwargs)
    store = SnapshotStore(tempfile.mkdtemp(prefix='opic-'))
    res = CrawlEngine(spark, corpus, config=cfg, store=store).run(
        ['http://a.com/root'])
    return res, store


def test_opic_priority_beats_fifo_discovery_order(spark):
    res, _ = _run(spark, _hub_corpus(spark), frontier_priority='opic')
    got = sorted((r['url'], r['wave']) for r in
                 res.seen.filter("status = 'reachable'").collect())
    assert got == [('http://a.com/root', 0),
                   ('http://b.com/x', 1),      # twice-cited host wins
                   ('http://c.com/x', 2)]


def test_fifo_counterfactual_dispatches_discovery_order(spark):
    res, _ = _run(spark, _hub_corpus(spark))  # no priority: FIFO cap
    got = sorted((r['url'], r['wave']) for r in
                 res.seen.filter("status = 'reachable'").collect())
    assert got == [('http://a.com/root', 0),
                   ('http://b.com/x', 2),
                   ('http://c.com/x', 1)]      # discovered first -> wave 1


def test_opic_state_matches_manual_replay(spark):
    res, store = _run(spark, _hub_corpus(spark), frontier_priority='opic')
    links = res.links
    seen = res.seen
    state = None
    for wave in sorted(r['wave'] for r in
                       seen.select('wave').distinct().collect()):
        edges = (links.filter((F.col('wave') == wave)
                              & (F.col('src_host') != F.col('dst_host')))
                 .select(F.col('src_host').alias('src'),
                         F.col('dst_host').alias('dst'), 'n_links'))
        fetched = (seen.filter((F.col('wave') == wave)
                               & (F.col('status') != 'robots_excluded'))
                   .select(F.parse_url('url', F.lit('HOST')).alias('host'))
                   .distinct())
        if state is None:
            state = graphrank.opic_init(
                fetched.unionByName(
                    edges.select(F.col('dst').alias('host'))).distinct())
        state = graphrank.opic_update(state, edges, fetched,
                                      weight='n_links')
    expected = sorted(tuple(r) for r in state.collect())
    committed = sorted(tuple(r) for r in store.load_current(
        spark, 'opic_state').select('host', 'cash_ppb', 'hist_ppb').collect())
    assert committed == expected
    # the fetched hub banked its cash: history is positive
    hist = dict((h, v) for h, _, v in committed)
    assert hist['a.com'] > 0
