"""C4/RefinedWeb-style URL quality rules ahead of the frontier."""

from __future__ import annotations

from scalpel_spark.operators import urlfilter


def _f(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], 'url STRING')


def test_each_rule_fires_independently(spark):
    urls = [
        'http://good.example.com/a/b',                       # clean
        'http://bad.example.com/page',                       # blocked host
        'http://x.example.com/' + 'a' * 300,                 # too long
        'http://x.example.com/' + 'd/' * 9 + 'leaf',         # too deep
        'http://x.example.com/p?a=1&b=2&c=3&d=4&e=5',        # query heavy
        'http://x.example.com/best-casino-bonus',            # spam word
    ]
    bl = spark.createDataFrame([('bad.example.com',)], 'host STRING')
    rows = {r['url']: r for r in
            urlfilter.url_quality_flags(_f(spark, urls), bl).collect()}
    assert rows[urls[0]]['keep'] is True
    assert rows[urls[1]]['flag_blocked'] and not rows[urls[1]]['keep']
    assert rows[urls[2]]['flag_long'] and not rows[urls[2]]['keep']
    assert rows[urls[3]]['flag_deep'] and not rows[urls[3]]['keep']
    assert rows[urls[4]]['flag_query_heavy'] and not rows[urls[4]]['keep']
    assert rows[urls[5]]['flag_spam'] and not rows[urls[5]]['keep']


def test_query_slashes_do_not_count_as_depth(spark):
    rows = urlfilter.url_quality_flags(
        _f(spark, ['http://x.example.com/p?next=/a/b/c/d/e/f/g/h/i'])
    ).collect()
    assert rows[0]['flag_deep'] is False
    assert rows[0]['flag_query_heavy'] is False  # 1 param


def test_param_boundaries(spark):
    rows = {r['url']: r for r in urlfilter.url_quality_flags(
        _f(spark, ['http://x.example.com/p?a=1&b=2&c=3&d=4',
                   'http://x.example.com/p'])).collect()}
    assert rows['http://x.example.com/p?a=1&b=2&c=3&d=4']['flag_query_heavy'] is False
    assert rows['http://x.example.com/p']['flag_query_heavy'] is False


def test_filter_frontier_preserves_columns_and_drops(spark):
    fr = spark.createDataFrame(
        [('http://good.example.com/a', 7), ('http://bad.example.com/b', 8)],
        'url STRING, priority LONG')
    bl = spark.createDataFrame([('bad.example.com',)], 'host STRING')
    out = urlfilter.filter_frontier(fr, bl).collect()
    assert [tuple(r) for r in out] == [('http://good.example.com/a', 7)]


def test_no_blocklist_means_nothing_blocked(spark):
    rows = urlfilter.url_quality_flags(
        _f(spark, ['http://any.example.com/x'])).collect()
    assert rows[0]['flag_blocked'] is False and rows[0]['keep'] is True


def test_plan_stays_jvm_and_broadcasts_blocklist(spark):
    fr = _f(spark, ['http://x.example.com/a'])
    bl = spark.createDataFrame([('bad.example.com',)], 'host STRING')
    plan = urlfilter.url_quality_flags(fr, bl)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan
    assert 'BroadcastHashJoin' in plan


def test_engine_url_rules_drop_blocklisted_host(spark, tmp_path):
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=60, n_hosts=4, seed=21)
    # seeds all live on h0; h1 is only reachable through cross-host links,
    # so blocking it exercises the rule on DISCOVERED urls, not just seeds
    seeds = [r['doc_id'] for r in corpus.orderBy('doc_id').limit(6).collect()]
    base = CrawlConfig(follow_robots_txt=False, max_waves=3)
    res_plain = CrawlEngine(spark, corpus, config=base,
                            store=SnapshotStore(str(tmp_path / 'a'))).run(seeds)
    blocked = 'h1.example.com'
    # the unfiltered crawl DOES reach the blocked host, so the rule matters
    assert any(blocked in r['url'] for r in res_plain.seen.collect())
    cfg = CrawlConfig(follow_robots_txt=False, max_waves=3, url_rules=True,
                      blocklist_hosts=(blocked,))
    res = CrawlEngine(spark, corpus, config=cfg,
                      store=SnapshotStore(str(tmp_path / 'b'))).run(seeds)
    urls = [r['url'] for r in res.seen.collect()]
    assert urls and not any(blocked in u for u in urls)


def test_config_blocklist_coercion():
    from scalpel_spark.config import _coerce

    assert _coerce('blocklist_hosts', 'a.com, b.com') == ('a.com', 'b.com')
    assert _coerce('blocklist_hosts', ['a.com']) == ('a.com',)
    assert _coerce('url_rules', 'true') is True


def test_question_mark_in_param_value_does_not_reset_count(spark):
    rows = urlfilter.url_quality_flags(
        _f(spark, ['http://x.example.com/p?a=1&b=2&c=3&d=4&e=5&next=?y'])
    ).collect()
    assert rows[0]['flag_query_heavy'] is True


def test_blocklist_matches_despite_case_and_port(spark):
    bl = spark.createDataFrame([('Tracker.example.com',)], 'host STRING')
    rows = {r['url']: r for r in urlfilter.url_quality_flags(
        _f(spark, ['http://TRACKER.example.com/x',
                   'http://tracker.example.com:8080/x']), bl).collect()}
    assert all(r['flag_blocked'] for r in rows.values())


def test_host_col_passthrough_uses_engine_identity(spark):
    fr = spark.createDataFrame(
        [('http://ignored.example.com/x', 'blocked.example.com')],
        'url STRING, host STRING')
    bl = spark.createDataFrame([('blocked.example.com',)], 'host STRING')
    rows = urlfilter.url_quality_flags(fr, bl, host_col='host').collect()
    assert rows[0]['flag_blocked'] is True


# --------------------------------------------------------------------------
# trap_scores: crawler-trap URL-shape signals
# --------------------------------------------------------------------------


def _traps(spark, urls, **kw):
    return {r['url']: r.asDict()
            for r in urlfilter.trap_scores(_f(spark, urls), **kw).collect()}


def test_trap_repeated_segments(spark):
    out = _traps(spark, ['http://x.example.com/a/b/a/b/a',
                         'http://x.example.com/a/b/c'])
    loop = out['http://x.example.com/a/b/a/b/a']
    assert loop['seg_repeat'] == 3 and loop['flag_trap'] is True
    clean = out['http://x.example.com/a/b/c']
    assert clean['seg_repeat'] == 1 and clean['flag_trap'] is False


def test_trap_digit_mill_path(spark):
    out = _traps(spark, ['http://x.example.com/sess/1234567890123456'])
    r = next(iter(out.values()))
    assert r['digit_ppm'] > 400_000 and r['flag_trap'] is True


def test_trap_depth_and_params(spark):
    deep = 'http://x.example.com/' + '/'.join(f's{i}' for i in range(9))
    faceted = 'http://x.example.com/p?a=1&b=2&c=3&d=4&e=5'
    out = _traps(spark, [deep, faceted])
    assert out[deep]['depth'] == 9 and out[deep]['flag_trap'] is True
    assert out[faceted]['n_params'] == 5 and out[faceted]['flag_trap'] is True


def test_trap_no_path_is_clean(spark):
    out = _traps(spark, ['http://x.example.com'])
    r = next(iter(out.values()))
    assert r == {'url': 'http://x.example.com', 'seg_repeat': 0, 'depth': 0,
                 'digit_ppm': 0, 'n_params': 0, 'flag_trap': False}


def test_trap_query_digits_do_not_count(spark):
    # digits live only in the query string -> path digit share is 0
    out = _traps(spark, ['http://x.example.com/page?id=99999999999999'])
    assert next(iter(out.values()))['digit_ppm'] == 0


def test_trap_thresholds_are_tunable(spark):
    url = 'http://x.example.com/a/b/a'
    assert _traps(spark, [url])[url]['flag_trap'] is False
    assert _traps(spark, [url], max_repeat=1)[url]['flag_trap'] is True


def test_trap_plan_stays_jvm(spark):
    plan = urlfilter.trap_scores(
        _f(spark, ['http://x.example.com/a'])
    )._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan


def test_query_slash_does_not_fake_a_path(spark):
    # a no-path URL whose query contains '/' or digits must not be
    # mistaken for a deep/digit-mill path (the '?' strips BEFORE the
    # first-'/' search, in both engines)
    from scalpel_spark.operators.urlfilter import trap_scores

    rows = {r['url']: r for r in trap_scores(_f(spark, [
        'http://h.test?d=1/23456789',   # path is '', not '/23456789'
        'http://h.test/p?a=b/c',        # path is '/p', not '/p?a=b'
    ])).collect()}
    none = rows['http://h.test?d=1/23456789']
    assert (none['depth'], none['digit_ppm'], none['flag_trap']) == (0, 0, False)
    assert rows['http://h.test/p?a=b/c']['depth'] == 1


def test_query_does_not_leak_into_blocklist_host(spark):
    # 'http://h.test?x=1' is host 'h.test' — the blocklist must hit it
    bl = spark.createDataFrame([('h.test',)], 'host STRING')
    rows = {r['url']: r for r in urlfilter.url_quality_flags(
        _f(spark, ['http://h.test?x=1', 'http://ok.test/a']), bl).collect()}
    assert rows['http://h.test?x=1']['flag_blocked'] is True
    assert rows['http://ok.test/a']['flag_blocked'] is False


def test_homograph_flags(spark):
    from scalpel_spark.operators.urlfilter import homograph_flags

    urls = [
        ('https://paypal.com/a', False, False),
        ('https://pаypal.com/a', False, True),      # Cyrillic а
        ('https://αlpha.example.gr/', False, True),  # Greek α
        ('https://xn--e1awd7f.test/x', True, False),      # pure punycode
        ('https://дом.test/', False, False),  # all-Cyrillic: no mix
        ('https://sub.xn--p1ai.host:8080/q?x=1', True, False),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in urls], 'url STRING')
    out = {r['url']: r for r in homograph_flags(df).collect()}
    for u, puny, mixed in urls:
        assert out[u]['has_punycode'] == puny, u
        assert out[u]['mixed_script'] == mixed, u
        assert out[u]['suspicious'] == mixed, u


def test_path_prefix_stats(spark):
    from scalpel_spark.operators.urlfilter import path_prefix_stats

    urls = [
        'https://a.test/product/shoes/red?page=2',
        'https://a.test/product/shoes/blue',
        'https://a.test/product/hats',
        'https://a.test/search/q',
        'https://a.test/',              # no segments -> no prefixes
        'https://b.test/only',
    ]
    df = spark.createDataFrame([(u,) for u in urls], 'url STRING')
    got = {(r['host'], r['depth'], r['prefix']): r['n_urls']
           for r in path_prefix_stats(df, max_depth=2).collect()}
    assert got[('a.test', 1, '/product')] == 3
    assert got[('a.test', 2, '/product/shoes')] == 2
    assert got[('a.test', 2, '/product/hats')] == 1
    assert got[('a.test', 1, '/search')] == 1
    assert got[('b.test', 1, '/only')] == 1
    # depth capped at max_depth; the root-only URL contributes nothing
    assert all(d <= 2 for _, d, _ in got)
    assert not any(h == 'a.test' and p == '/' for h, _, p in got)
