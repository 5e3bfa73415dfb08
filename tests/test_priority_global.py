"""Score-aware global cap (priority-queue dequeue across hosts),
injectable per-host budget tables, and host_rank-informed recrawl."""

from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.operators.scheduling import topk_by_score
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA


def _corpus(spark, rows):
    return spark.createDataFrame([
        {'doc_id': u, 'spans': spans, 'http_status': 200, 'scheme': 'http',
         'readable': None, 'fetch_ms': 1.0}
        for u, spans in rows
    ], CORPUS_SCHEMA)


def _text(t):
    return {'kind': 'text', 'text': t, 'media_ref': None, 'offset': 0}


def _link(u):
    return {'kind': 'link', 'text': u, 'media_ref': None, 'offset': 0}


def test_topk_by_score_exact_with_ties(spark):
    # 40 rows, scores 0..9 repeated (ties broken by unique priority),
    # tiny target partition size to force many range partitions
    rows = [(i, i % 10) for i in range(40)]
    df = spark.createDataFrame(rows, 'priority long, _score long').persist()
    kept, overflow = topk_by_score(df, 7, target_partition_rows=4)
    got = sorted((r['_score'], r['priority']) for r in kept.collect())
    # top-7 by (score desc, priority asc): score 9 → priorities 9,19,29,39;
    # score 8 → priorities 8,18,28
    assert got == [(8, 8), (8, 18), (8, 28), (9, 9), (9, 19), (9, 29), (9, 39)]
    assert overflow.count() == 33
    # under-cap input returns everything
    kept_all, over_none = topk_by_score(df, 100, target_partition_rows=4)
    assert kept_all.count() == 40 and over_none.count() == 0


def test_global_cap_is_score_ordered_across_hosts(spark):
    """With frontier_priority set, max_dispatch_per_wave dequeues the
    globally highest-scored URLs first — across hosts — instead of FIFO."""
    urls = ['http://a.com/1', 'http://b.com/22', 'http://c.com/333']
    corpus = _corpus(spark, [(u, [_text('x')]) for u in urls])
    cfg = CrawlConfig(max_dispatch_per_wave=1, max_waves=3,
                      frontier_priority='length(url)')
    res = CrawlEngine(spark, corpus, config=cfg).run(urls)
    seen = {r['url']: r['wave'] for r in res.seen.collect()}
    # longest URL wins wave 0, then next — inverse of FIFO seed order
    assert seen == {'http://c.com/333': 0, 'http://b.com/22': 1, 'http://a.com/1': 2}


def test_host_budget_table_least_combines(spark):
    """CrawlEngine(host_budgets=...): a (host, budget) table caps mapped
    hosts per wave; unmapped hosts are unbounded-by-table."""
    urls = [f'http://a.com/p{i}' for i in range(3)] + \
           [f'http://b.com/p{i}' for i in range(3)]
    corpus = _corpus(spark, [(u, [_text('x')]) for u in urls])
    budgets = spark.createDataFrame([('a.com', 1)], 'host string, budget int')
    cfg = CrawlConfig(max_waves=4)
    res = CrawlEngine(spark, corpus, config=cfg, host_budgets=budgets).run(urls)
    per = {(r['url'].split('/')[2], r['wave']) for r in res.seen.collect()}
    # a.com paced 1/wave over 3 waves; b.com (unmapped) all in wave 0
    assert ('a.com', 0) in per and ('a.com', 1) in per and ('a.com', 2) in per
    assert {w for h, w in per if h == 'b.com'} == {0}
    # combined with the uniform knob, the smaller budget wins
    cfg2 = CrawlConfig(max_waves=4, max_dispatch_per_host_per_wave=2)
    budgets2 = spark.createDataFrame([('a.com', 5), ('b.com', 1)],
                                     'host string, budget int')
    res2 = CrawlEngine(spark, corpus, config=cfg2, host_budgets=budgets2).run(urls)
    waves = {}
    for r in res2.seen.collect():
        h = r['url'].split('/')[2]
        waves.setdefault((h, r['wave']), 0)
        waves[(h, r['wave'])] += 1
    # a.com: min(5, 2) = 2/wave → waves 0,1; b.com: min(1, 2) = 1/wave → 0,1,2
    assert waves[('a.com', 0)] == 2 and waves[('a.com', 1)] == 1
    assert waves[('b.com', 0)] == 1 and waves[('b.com', 1)] == 1 and waves[('b.com', 2)] == 1


def test_host_rank_informs_recrawl_priority(spark, tmp_path):
    """frontier_priority='host_rank': run 1 builds link lineage (host a
    cites host b three times); run 2 on the same store dispatches the
    cited host's URL first under a global cap of 1 — FIFO would have
    picked the earlier seed."""
    store = SnapshotStore(str(tmp_path / 'store'))
    corpus1 = _corpus(spark, [
        ('http://a.com/root',
         [_text('hub'), _link('http://b.com/x'), _link('http://b.com/y'),
          _link('http://b.com/z')]),
    ])
    CrawlEngine(spark, corpus1, config=CrawlConfig(max_waves=1), store=store).run(
        ['http://a.com/root'])

    corpus2 = _corpus(spark, [('http://a.com/new', [_text('na')]),
                              ('http://b.com/new', [_text('nb')])])
    cfg = CrawlConfig(max_waves=2, max_dispatch_per_wave=1,
                      frontier_priority='host_rank')
    engine2 = CrawlEngine(spark, corpus2, config=cfg, store=store)
    res = engine2.run(['http://a.com/new', 'http://b.com/new'])
    seen = {r['url']: r['wave'] for r in res.seen.collect()
            if r['url'].endswith('/new')}
    # b is cited, a only cites → rank(b) > rank(a) → b dispatches first
    assert seen == {'http://b.com/new': 0, 'http://a.com/new': 1}


def test_fifo_unchanged_without_priority(spark):
    """Default path (frontier_priority=None) still FIFO under the global
    cap — the dense-priority histogram branch."""
    urls = ['http://a.com/1', 'http://b.com/22', 'http://c.com/333']
    corpus = _corpus(spark, [(u, [_text('x')]) for u in urls])
    cfg = CrawlConfig(max_dispatch_per_wave=1, max_waves=3)
    res = CrawlEngine(spark, corpus, config=cfg).run(urls)
    seen = {r['url']: r['wave'] for r in res.seen.collect()}
    assert seen == {'http://a.com/1': 0, 'http://b.com/22': 1, 'http://c.com/333': 2}


def test_frontier_ranks_survive_per_wave_cache_clear(spark, tmp_path):
    """host_rank is 'computed ONCE per run': the rank DataFrame is
    localCheckpoint-backed (Scan ExistingRDD), so the per-wave
    spark.catalog.clearCache() cannot unpersist it and force the whole
    lineage scan + PageRank to re-run lazily every wave."""
    store = SnapshotStore(str(tmp_path / 'store'))
    corpus1 = _corpus(spark, [
        ('http://a.com/root', [_text('hub'), _link('http://b.com/x')]),
    ])
    CrawlEngine(spark, corpus1, config=CrawlConfig(max_waves=1), store=store).run(
        ['http://a.com/root'])

    corpus2 = _corpus(spark, [('http://a.com/new', [_text('na')])])
    eng = CrawlEngine(spark, corpus2,
                      config=CrawlConfig(max_waves=1, max_dispatch_per_wave=1,
                                         frontier_priority='host_rank'),
                      store=store)
    ranks = eng._frontier_ranks()
    assert ranks is not None
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    assert 'LogicalRDD' in plan  # lineage truncated at the checkpoint
    spark.catalog.clearCache()
    assert eng._frontier_ranks().count() == ranks.count()


def test_score_aging_prevents_starvation(spark):
    """score_aging_per_wave: a low-scored URL deferred behind a STREAM of
    fresh high-scored arrivals (a link chain discovers one new a.com page
    per wave) gains score each waited wave and eventually outbids them;
    without aging it dispatches dead last. Aging is measured from each
    row's own enqueue wave, so fresh arrivals start at age 0."""
    score = "CASE WHEN host = 'a.com' THEN 10.0 ELSE 1.0 END"
    corpus = _corpus(spark, [
        ('http://a.com/1', [_text('p'), _link('http://a.com/2')]),
        ('http://a.com/2', [_text('p'), _link('http://a.com/3')]),
        ('http://a.com/3', [_text('p')]),
        ('http://b.com/x', [_text('p')]),
    ])
    seeds = ['http://a.com/1', 'http://b.com/x']

    def run(aging):
        cfg = CrawlConfig(max_dispatch_per_wave=1, max_waves=6,
                          frontier_priority=score,
                          score_aging_per_wave=aging)
        res = CrawlEngine(spark, corpus, config=cfg).run(seeds)
        return {r['url']: r['wave'] for r in res.seen.collect()}

    # no aging: every freshly discovered a.com page (score 10) beats the
    # waiting b (score 1) — b starves until the chain runs dry
    assert run(0.0) == {'http://a.com/1': 0, 'http://a.com/2': 1,
                        'http://a.com/3': 2, 'http://b.com/x': 3}
    # aging 5/wave: at wave 2 b has waited 2 waves -> 1 + 10 = 11 > 10,
    # outbidding the fresh (age-0) a.com/3
    assert run(5.0) == {'http://a.com/1': 0, 'http://a.com/2': 1,
                        'http://b.com/x': 2, 'http://a.com/3': 3}
