"""CrawlEngine.refresh_robots — robots-decision TTL/expiry."""

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA


def _corpus(spark):
    return spark.createDataFrame([
        {'doc_id': f'http://h.com/{p}',
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for p in ('a', 'b', 'c')
    ], CORPUS_SCHEMA)


def _robots(spark, rules):
    return spark.createDataFrame([('h.com', 200, rules)], ROBOTS_SCHEMA)


DENY = 'User-agent: *\nDisallow: /'
ALLOW = 'User-agent: *\nAllow: /'


def test_refresh_robots_reevaluates_host(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / 'store'))
    corpus = _corpus(spark)
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=1)

    # run 1 under deny-all: the host's decision is recorded as excluded
    res1 = CrawlEngine(spark, corpus, _robots(spark, DENY), cfg, store).run(
        ['http://h.com/a'])
    assert {r['status'] for r in res1.seen.collect()} == {'robots_excluded'}

    # run 2 with an UPDATED robots table but the stale cached decision:
    # the host_state verdict sticks (cache semantics)
    res2 = CrawlEngine(spark, corpus, _robots(spark, ALLOW), cfg, store).run(
        ['http://h.com/b'])
    assert {r['status'] for r in res2.seen.filter("url like '%/b'").collect()} \
        == {'robots_excluded'}

    # run 3 after refresh_robots(): the decision re-evaluates → allowed
    engine3 = CrawlEngine(spark, corpus, _robots(spark, ALLOW), cfg, store)
    engine3.refresh_robots()
    res3 = engine3.run(['http://h.com/c'])
    assert {r['status'] for r in res3.seen.filter("url like '%/c'").collect()} \
        == {'reachable'}


def test_refresh_robots_selective_and_resume_safe(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / 'store'))
    corpus = _corpus(spark)
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=1)
    engine = CrawlEngine(spark, corpus, _robots(spark, DENY), cfg, store)
    engine.run(['http://h.com/a'])
    # refreshing an unrelated host keeps h.com's cached decision
    engine.refresh_robots(hosts=['other.com'])
    kept = store.load_current(spark, 'host_state')
    assert kept.count() == 1
    # frontier carried forward: resume still works after a refresh commit
    engine.refresh_robots()
    assert store.load_current(spark, 'host_state').count() == 0
    snap = store.current()
    assert 'frontier' in snap['tables']


def test_refresh_robots_on_empty_store_is_noop(spark, tmp_path):
    engine = CrawlEngine(spark, _corpus(spark), _robots(spark, DENY),
                         CrawlConfig(follow_robots_txt=True),
                         SnapshotStore(str(tmp_path / 's')))
    engine.refresh_robots()  # no committed snapshot: must not raise
