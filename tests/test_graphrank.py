"""Integer PageRank over host edge lists (crawl-prioritization signal)."""

from __future__ import annotations

from scalpel_spark.operators import graphrank

EDGE_SCHEMA = 'src LONG, dst LONG'


def test_host_rank_one_iteration_hand_computed(spark):
    # A<->B plus C->A; N=3, rank0 = 333333333 each, teleport = 50000000
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 0)], EDGE_SCHEMA)
    out = {r['host']: r['rank_ppb'] for r in
           graphrank.host_rank(edges, iters=1).collect()}
    # in(0) = r(1) + r(2) = 666666666 -> 50000000 + 85*666666666 div 100
    assert out[0] == 50_000_000 + (85 * 666_666_666) // 100
    assert out[1] == 50_000_000 + (85 * 333_333_333) // 100
    assert out[2] == 50_000_000  # dangling-in: nothing links to C


def test_host_rank_ordering_stable_over_iterations(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 0)], EDGE_SCHEMA)
    out = {r['host']: r['rank_ppb'] for r in
           graphrank.host_rank(edges, iters=3).collect()}
    assert out[0] > out[1] > out[2]


def test_host_rank_duplicate_edges_double_authority(spark):
    # two parallel edges 0->1 vs one edge 0->2: outdeg(0)=3, so host 1
    # receives twice host 2's share
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], EDGE_SCHEMA)
    out = {r['host']: r['rank_ppb'] for r in
           graphrank.host_rank(edges, iters=1).collect()}
    share = 333_333_333 // 3
    assert out[1] == 50_000_000 + (85 * 2 * share) // 100
    assert out[2] == 50_000_000 + (85 * share) // 100


def test_host_rank_mass_conserved_within_flooring(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], EDGE_SCHEMA)  # 5-cycle
    out = graphrank.host_rank(edges, iters=4).collect()
    total = sum(r['rank_ppb'] for r in out)
    # cycle: no dangling loss; only integer flooring (< 100 ppb/host/iter)
    assert abs(total - 1_000_000_000) < 5 * 4 * 100
    # symmetric cycle -> identical ranks
    assert len({r['rank_ppb'] for r in out}) == 1


def test_host_rank_plan_stays_jvm(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], EDGE_SCHEMA)
    plan = graphrank.host_rank(edges, iters=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan


def test_host_rank_weighted_equals_replayed_edges(spark):
    weighted = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
        'src LONG, dst LONG, n_links LONG')
    replayed = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], EDGE_SCHEMA)
    a = sorted(tuple(r) for r in graphrank.host_rank(
        weighted, iters=2, weight='n_links').collect())
    b = sorted(tuple(r) for r in graphrank.host_rank(replayed, iters=2).collect())
    assert a == b


def test_engine_links_lineage_and_host_ranks(spark, tmp_path):
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=60, n_hosts=5, seed=11)
    cfg = CrawlConfig(follow_robots_txt=False, max_waves=3)
    res = CrawlEngine(spark, corpus, config=cfg,
                      store=SnapshotStore(str(tmp_path))).run(
        [r['doc_id'] for r in corpus.limit(3).collect()])
    links = res.links
    assert links is not None and links.count() > 0
    assert set(links.columns) == {'src_host', 'dst_host', 'n_links', 'wave'}
    # lineage records self-citations (intra-host links are real data) ...
    assert links.filter('src_host = dst_host').count() > 0
    ranks = res.host_ranks(iters=2)
    rows = ranks.collect()
    assert rows and all(r['rank_ppb'] > 0 for r in rows)
    # ranks sum to ~1 (ppb), short only by flooring + dangling loss
    assert sum(r['rank_ppb'] for r in rows) <= 1_000_000_000


# ---------------------------------------------------------------------------
# trust_rank (TrustRank — teleport restricted to a trusted seed set)
# ---------------------------------------------------------------------------


def _trusted(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], 'host LONG')


def test_trust_rank_one_iteration_hand_computed(spark):
    # 0 trusted; 0->1, 1->2 chain plus spam island 3<->4
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3)], EDGE_SCHEMA)
    out = {r['host']: r['trust_ppb'] for r in
           graphrank.trust_rank(edges, _trusted(spark, [0]), iters=1).collect()}
    # T=1: trust0(0)=10^9, others 0; teleport(0) = 150000000
    assert out[0] == 150_000_000
    assert out[1] == (85 * 1_000_000_000) // 100
    assert out[2] == 0          # two hops away, one iteration
    assert out[3] == 0 and out[4] == 0  # spam island: no path from trust


def test_trust_rank_spam_island_stays_zero(spark):
    # however many internal links the island has, no trust ever arrives
    island = [(i, j) for i in (10, 11, 12) for j in (10, 11, 12) if i != j]
    edges = spark.createDataFrame([(0, 1), (1, 0)] + island, EDGE_SCHEMA)
    out = {r['host']: r['trust_ppb'] for r in
           graphrank.trust_rank(edges, _trusted(spark, [0]), iters=4).collect()}
    assert out[10] == out[11] == out[12] == 0
    assert out[0] > 0 and out[1] > 0
    # contrast: host_rank gives the island plenty of authority
    pr = {r['host']: r['rank_ppb'] for r in
          graphrank.host_rank(edges, iters=4).collect()}
    assert pr[10] > 0


def test_trust_rank_trusted_host_outside_graph_seeds_mass(spark):
    # trusted host 9 has no edges: it still holds teleport mass, and T=2
    # halves host 0's seed
    edges = spark.createDataFrame([(0, 1)], EDGE_SCHEMA)
    out = {r['host']: r['trust_ppb'] for r in
           graphrank.trust_rank(edges, _trusted(spark, [0, 9]), iters=1).collect()}
    assert out[9] == 150_000_000 // 2
    assert out[1] == (85 * (1_000_000_000 // 2)) // 100


def test_trust_rank_weighted_equals_replayed_edges(spark):
    weighted = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 1)], 'src LONG, dst LONG, w LONG')
    replayed = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], EDGE_SCHEMA)
    t = _trusted(spark, [0])
    a = {r['host']: r['trust_ppb'] for r in
         graphrank.trust_rank(weighted, t, iters=2, weight='w').collect()}
    b = {r['host']: r['trust_ppb'] for r in
         graphrank.trust_rank(replayed, t, iters=2).collect()}
    assert a == b


def test_trust_rank_plan_stays_jvm(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], EDGE_SCHEMA)
    plan = graphrank.trust_rank(edges, _trusted(spark, [0]), iters=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan
