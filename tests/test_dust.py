"""DUST rule mining and application (`operators/dust.py`)."""

from __future__ import annotations

from scalpel_spark.operators import dust

SCHEMA = 'url STRING, sig STRING'


def _evidence(spark):
    """Per r: A=?id&sess, B=?id (same sig as A — sess is noise),
    C=?sess (different sig — id is load-bearing)."""
    rows = []
    for r in range(4):
        base = f'https://a.example.com/p{r % 2}'
        sig = f's-{r % 2}-{r % 3}'
        rows.append((f'{base}?id={r % 3}&sess=z{r}', sig))
        rows.append((f'{base}?id={r % 3}', sig))
        rows.append((f'{base}?sess=z{r}', f'other-{r}'))
    return spark.createDataFrame(rows, SCHEMA)


def test_mine_finds_ignorable_param_only(spark):
    rules = dust.mine_param_rules(_evidence(spark), min_support=2).collect()
    assert [(r['host'], r['param'], r['support']) for r in rules] == [
        ('a.example.com', 'sess', 4)]


def test_mine_one_counterexample_kills_rule(spark):
    df = _evidence(spark).union(spark.createDataFrame(
        [('https://a.example.com/p0?id=9&sess=zz', 'x1'),
         ('https://a.example.com/p0?id=9', 'DIFFERENT')], SCHEMA))
    assert dust.mine_param_rules(df, min_support=2).count() == 0


def test_mine_min_support(spark):
    assert dust.mine_param_rules(_evidence(spark), min_support=5).count() == 0
    assert dust.mine_param_rules(_evidence(spark), min_support=4).count() == 1


def test_mine_rules_are_per_host(spark):
    other = spark.createDataFrame(
        [('https://b.example.com/q?id=1&sess=s1', 'bs'),
         ('https://b.example.com/q?id=1', 'bs')], SCHEMA)
    rules = dust.mine_param_rules(_evidence(spark).union(other),
                                  min_support=1)
    got = {(r['host'], r['param']) for r in rules.collect()}
    assert got == {('a.example.com', 'sess'), ('b.example.com', 'sess')}


def test_strip_rewrites_only_ruled_hosts_and_keeps_order(spark):
    rules = spark.createDataFrame(
        [('a.example.com', 'sess', 4)], 'host STRING, param STRING, support LONG')
    frontier = spark.createDataFrame([
        ('https://a.example.com/p?x=1&sess=9&y=2',),
        ('https://a.example.com/p?sess=9',),
        ('https://a.example.com/plain',),
        ('https://c.example.com/p?sess=9',),
    ], 'url STRING')
    out = [r['url'] for r in dust.strip_params(frontier, rules).collect()]
    assert sorted(out) == sorted([
        'https://a.example.com/p?x=1&y=2',   # survivors keep order
        'https://a.example.com/p',           # query emptied entirely
        'https://a.example.com/plain',       # no query: byte-identical
        'https://c.example.com/p?sess=9',    # no rule for this host
    ])


def test_strip_out_col_and_plan_jvm(spark):
    rules = spark.createDataFrame(
        [('a.example.com', 'sess', 2)], 'host STRING, param STRING, support LONG')
    frontier = spark.createDataFrame(
        [('https://a.example.com/p?sess=1&k=v',)], 'url STRING')
    out = dust.strip_params(frontier, rules, out_col='canon')
    row = out.collect()[0]
    assert row['url'].endswith('sess=1&k=v') and row['canon'].endswith('p?k=v')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan
    mine_plan = dust.mine_param_rules(_evidence(spark))._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in mine_plan


# ---------------------------------------------------------------------------
# engine wiring: CrawlEngine(dust_rules=...)
# ---------------------------------------------------------------------------


def _engine_world(spark):
    import tempfile

    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(spark, n_pages=40, n_hosts=4, seed=7)
    robots = synthetic_robots(spark, n_hosts=4)
    seed_url = corpus.orderBy('doc_id').limit(1).collect()[0]['doc_id']
    return corpus, robots, seed_url, SnapshotStore(tempfile.mkdtemp())


def test_engine_dust_rules_collapse_alias_seed(spark):
    import tempfile

    from pyspark.sql import functions as F
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore

    corpus, robots, seed_url, store = _engine_world(spark)
    host = spark.createDataFrame([(seed_url,)], 'url STRING').select(
        F.parse_url('url', F.lit('HOST')).alias('h')).collect()[0]['h']
    rules = spark.createDataFrame([(host, 'sess', 3)],
                                  'host STRING, param STRING, support LONG')
    variant = seed_url + '?sess=abc123'
    res = CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=1),
                      store, dust_rules=rules).run([seed_url, variant])
    rows = res.seen.collect()
    assert [r['url'] for r in rows] == [seed_url]
    assert rows[0]['status'] == 'reachable' and rows[0]['priority'] == 0
    # without rules the alias stays literal and lands unreachable
    res2 = CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=1),
                       SnapshotStore(tempfile.mkdtemp())).run(
        [seed_url, variant])
    assert {r['url']: r['status'] for r in res2.seen.collect()} == {
        seed_url: 'reachable', variant: 'unreachable'}


def test_engine_dust_rules_fixed_point_on_clean_urls(spark):
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore

    corpus, robots, seed_url, store = _engine_world(spark)
    # rules for a host that never appears: a 2-wave crawl (links flow
    # through the same rewrite point) must be byte-identical to no-rules
    rules = spark.createDataFrame([('nosuch.example.com', 'sess', 9)],
                                  'host STRING, param STRING, support LONG')
    with_rules = CrawlEngine(
        spark, corpus, robots, CrawlConfig(max_waves=2), store,
        dust_rules=rules).run([seed_url])
    without = CrawlEngine(
        spark, corpus, robots, CrawlConfig(max_waves=2),
        SnapshotStore(tempfile.mkdtemp())).run([seed_url])
    a = sorted((r['url'], r['wave'], r['priority'], r['status'])
               for r in with_rules.seen.collect())
    b = sorted((r['url'], r['wave'], r['priority'], r['status'])
               for r in without.seen.collect())
    assert a == b and len(a) > 1
