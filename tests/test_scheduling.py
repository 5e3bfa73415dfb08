"""Budget planning (largest remainder) and recrawl selection."""

from __future__ import annotations

from scalpel_spark.operators import scheduling

RANK_SCHEMA = 'host STRING, rank_ppb LONG'


def test_plan_host_budgets_sums_exactly_and_ranks_win(spark):
    ranks = spark.createDataFrame(
        [('a', 500), ('b', 300), ('c', 200)], RANK_SCHEMA)
    out = {r['host']: r['budget'] for r in
           scheduling.plan_host_budgets(ranks, 10).collect()}
    assert sum(out.values()) == 10
    assert out == {'a': 5, 'b': 3, 'c': 2}


def test_plan_host_budgets_largest_remainder_tiebreak(spark):
    # budget 10 over equal thirds: base 3 each, 1 leftover -> equal
    # remainders, tie broken by host ASC
    ranks = spark.createDataFrame(
        [('x', 100), ('y', 100), ('z', 100)], RANK_SCHEMA)
    out = {r['host']: r['budget'] for r in
           scheduling.plan_host_budgets(ranks, 10).collect()}
    assert sum(out.values()) == 10
    assert out == {'x': 4, 'y': 3, 'z': 3}


def test_plan_host_budgets_zero_rank_host_gets_zero_before_leftovers(spark):
    ranks = spark.createDataFrame([('a', 1000), ('b', 0)], RANK_SCHEMA)
    out = {r['host']: r['budget'] for r in
           scheduling.plan_host_budgets(ranks, 7).collect()}
    assert out == {'a': 7, 'b': 0}


def test_select_recrawl_age_times_rank_order(spark):
    seen = spark.createDataFrame(
        [('http://a/1', 'a', 'reachable', 0),
         ('http://a/2', 'a', 'reachable', 2),
         ('http://b/1', 'b', 'reachable', 0),
         ('http://a/3', 'a', 'unreachable', 0),   # wrong status
         ('http://a/4', 'a', 'reachable', 3)],    # too young
        'url STRING, host STRING, status STRING, wave LONG')
    ranks = spark.createDataFrame([('a', 100), ('b', 900)], RANK_SCHEMA)
    out = scheduling.select_recrawl(seen, ranks, current_wave=3,
                                    min_age=1, limit=10).collect()
    urls = [r['url'] for r in out]
    # b/1: age 3 * 900 = 2700; a/1: 3*100=300; a/2: 1*100=100
    assert urls == ['http://b/1', 'http://a/1', 'http://a/2']
    assert [r['score'] for r in out] == [2700, 300, 100]


def test_select_recrawl_unranked_host_scores_zero(spark):
    seen = spark.createDataFrame(
        [('http://new/1', 'new', 'reachable', 0)],
        'url STRING, host STRING, status STRING, wave LONG')
    ranks = spark.createDataFrame([], RANK_SCHEMA)
    out = scheduling.select_recrawl(seen, ranks, current_wave=2).collect()
    assert [(r['url'], r['score']) for r in out] == [('http://new/1', 0)]


def test_scheduling_plans_stay_jvm(spark):
    ranks = spark.createDataFrame([('a', 1)], RANK_SCHEMA)
    plan = scheduling.plan_host_budgets(ranks, 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan


def test_plan_host_budgets_budget_smaller_than_host_count(spark):
    ranks = spark.createDataFrame(
        [('a', 100), ('b', 100), ('c', 100), ('d', 100)], RANK_SCHEMA)
    out = {r['host']: r['budget'] for r in
           scheduling.plan_host_budgets(ranks, 2).collect()}
    assert sum(out.values()) == 2
    # equal remainders -> host ASC gets the slots
    assert out == {'a': 1, 'b': 1, 'c': 0, 'd': 0}


# --------------------------------------------------------------------------
# adaptive_backoff: error-rate-driven budget scaling
# --------------------------------------------------------------------------

FETCH_SCHEMA = 'host STRING, http_status INT'


def _backoff(spark, rows, **kw):
    kw.setdefault('base_budget', 100)
    df = scheduling.adaptive_backoff(
        spark.createDataFrame(rows, FETCH_SCHEMA), **kw)
    return {r['host']: r.asDict() for r in df.collect()}


def test_backoff_healthy_host_keeps_full_budget(spark):
    out = _backoff(spark, [('a', 200)] * 5 + [('a', 404)])
    assert out['a']['penalty_ppm'] == 0 and out['a']['budget'] == 100


def test_backoff_all_throttled_floors_at_min(spark):
    out = _backoff(spark, [('a', 429)] * 4, min_budget=3)
    assert out['a']['penalty_ppm'] == 1_000_000
    assert out['a']['budget'] == 3


def test_backoff_server_errors_weigh_half_of_throttles(spark):
    out = _backoff(spark, [('t', 429), ('t', 200),
                           ('e', 500), ('e', 200)])
    assert out['t']['penalty_ppm'] == 500_000   # 2*1e6 / (2*2)
    assert out['e']['penalty_ppm'] == 250_000   # 1*1e6 / (2*2)
    assert out['t']['budget'] == 50 and out['e']['budget'] == 75


def test_backoff_4xx_other_than_429_is_not_penalized(spark):
    out = _backoff(spark, [('a', 404), ('a', 403), ('a', 410)])
    assert out['a']['penalty_ppm'] == 0


def test_backoff_plan_stays_jvm(spark):
    df = scheduling.adaptive_backoff(
        spark.createDataFrame([('a', 200)], FETCH_SCHEMA), base_budget=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan


# --------------------------------------------------------------------------
# change_rates: content churn -> revisit interval
# --------------------------------------------------------------------------

HIST_SCHEMA = 'url STRING, host STRING, wave INT, content_hash LONG'


def _rates(spark, rows, **kw):
    df = scheduling.change_rates(
        spark.createDataFrame(rows, HIST_SCHEMA), **kw)
    return {r['host']: r.asDict() for r in df.collect()}


def test_change_rates_static_host_gets_max_interval(spark):
    out = _rates(spark, [('u1', 'a', w, 7) for w in range(4)])
    a = out['a']
    assert a['n_intervals'] == 3 and a['n_changes'] == 0
    assert a['change_ppm'] == 0 and a['revisit_waves'] == 16


def test_change_rates_churning_host_gets_wave1(spark):
    out = _rates(spark, [('u1', 'a', w, w) for w in range(4)])
    a = out['a']
    assert a['n_changes'] == 3 and a['change_ppm'] == 1_000_000
    assert a['revisit_waves'] == 1


def test_change_rates_mean_waves_per_change(spark):
    # changes on 2 of 6 intervals -> revisit every 3 waves
    hashes = [1, 1, 1, 2, 2, 2, 3]
    out = _rates(spark, [('u1', 'a', w, h) for w, h in enumerate(hashes)])
    assert out['a']['revisit_waves'] == 3
    assert out['a']['change_ppm'] == 2 * 1_000_000 // 6


def test_change_rates_single_observation_is_static(spark):
    out = _rates(spark, [('u1', 'a', 0, 5)])
    assert out['a'] == {'host': 'a', 'n_urls': 1, 'n_intervals': 0,
                        'n_changes': 0, 'change_ppm': 0, 'revisit_waves': 16}


def test_change_rates_aggregates_across_urls(spark):
    rows = ([('u1', 'a', w, w) for w in range(3)]        # 2 changes / 2
            + [('u2', 'a', w, 9) for w in range(3)])     # 0 changes / 2
    out = _rates(spark, rows, max_interval=8)
    a = out['a']
    assert a['n_urls'] == 2 and a['n_intervals'] == 4 and a['n_changes'] == 2
    assert a['revisit_waves'] == 2


def test_change_rates_plan_stays_jvm(spark):
    df = scheduling.change_rates(
        spark.createDataFrame([('u', 'a', 0, 1)], HIST_SCHEMA))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan


# ---------------------------------------------------------------------------
# crawler_shards (rendezvous-hash crawler assignment)
# ---------------------------------------------------------------------------


def _hostdf(spark, n):
    from pyspark.sql import functions as F
    return spark.range(n).select(
        F.concat(F.lit('host-'), F.col('id').cast('string')).alias('host'))


def test_crawler_shards_total_and_deterministic(spark):
    hosts = _hostdf(spark, 200)
    a = {r['host']: r['shard'] for r in
         scheduling.crawler_shards(hosts, 8).collect()}
    b = {r['host']: r['shard'] for r in
         scheduling.crawler_shards(hosts, 8).collect()}
    assert len(a) == 200 and a == b
    assert all(0 <= s < 8 for s in a.values())


def test_crawler_shards_balanced(spark):
    counts = {}
    for r in scheduling.crawler_shards(_hostdf(spark, 2000), 8).collect():
        counts[r['shard']] = counts.get(r['shard'], 0) + 1
    assert len(counts) == 8
    # binomial(2000, 1/8): mean 250, sd ~14.8 — 6 sigma bounds
    assert all(160 <= c <= 340 for c in counts.values()), counts


def test_crawler_shards_growth_moves_hosts_only_to_new_shard(spark):
    hosts = _hostdf(spark, 2000)
    k8 = {r['host']: r['shard'] for r in
          scheduling.crawler_shards(hosts, 8).collect()}
    k9 = {r['host']: r['shard'] for r in
          scheduling.crawler_shards(hosts, 9).collect()}
    moved = [h for h in k8 if k8[h] != k9[h]]
    # rendezvous invariant (exact): a host only ever moves TO the shard
    # that did not exist before
    assert all(k9[h] == 8 for h in moved)
    # expected churn 1/9 ~ 222 of 2000; allow 6 sigma (~±90)
    assert 130 <= len(moved) <= 320, len(moved)


def test_crawler_shards_salt_redeals(spark):
    hosts = _hostdf(spark, 300)
    a = {r['host']: r['shard'] for r in
         scheduling.crawler_shards(hosts, 8).collect()}
    b = {r['host']: r['shard'] for r in
         scheduling.crawler_shards(hosts, 8, salt='gen2').collect()}
    assert any(a[h] != b[h] for h in a)


def test_crawler_shards_plan_stays_jvm(spark):
    plan = scheduling.crawler_shards(_hostdf(spark, 4), 3)._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan


CAP_HIST_SCHEMA = ('url STRING, host STRING, wave INT, content_hash STRING, '
               'etag STRING, last_modified STRING')


def test_conditional_fetch_plan_validator_precedence(spark):
    """ETag wins over Last-Modified (RFC 9110 13.1.3); the LAST capture's
    validators decide — a stale ETag from an earlier capture must not
    leak forward; '' counts as absent."""
    hist = spark.createDataFrame([
        # u1: last capture has both -> conditional_etag
        ('u1', 'h1', 0, 'A', None, None),
        ('u1', 'h1', 1, 'A', 'e1', 'Mon'),
        # u2: last capture only Last-Modified -> conditional_ims
        ('u2', 'h1', 0, 'B', 'e0', None),
        ('u2', 'h1', 1, 'B', None, 'Tue'),
        # u3: never any validator -> full
        ('u3', 'h1', 0, 'C', None, None),
        # u4: empty-string validators are absent -> full
        ('u4', 'h1', 0, 'D', '', ''),
    ], CAP_HIST_SCHEMA)
    out = {r['url']: r for r in
           scheduling.conditional_fetch_plan(hist).collect()}
    assert out['u1']['fetch_mode'] == 'conditional_etag'
    assert out['u1']['etag'] == 'e1'
    assert out['u2']['fetch_mode'] == 'conditional_ims'
    assert out['u2']['etag'] is None      # stale e0 must not leak forward
    assert out['u2']['last_modified'] == 'Tue'
    assert out['u3']['fetch_mode'] == 'full'
    assert out['u4']['fetch_mode'] == 'full'
    assert out['u1']['last_wave'] == 1


def test_conditional_fetch_plan_expected_304_rate(spark):
    """Per-host Laplace-smoothed unchanged rate over consecutive pairs:
    h1 has 3 pairs / 2 unchanged -> (2+1)/(3+2); a single-capture host
    has 0 pairs -> 1/2 exactly."""
    hist = spark.createDataFrame([
        ('u1', 'h1', 0, 'A', None, None),
        ('u1', 'h1', 1, 'A', None, None),   # unchanged
        ('u1', 'h1', 2, 'B', None, None),   # changed
        ('u2', 'h1', 0, 'X', None, None),
        ('u2', 'h1', 1, 'X', None, None),   # unchanged
        ('u3', 'h2', 0, 'Z', None, None),   # no pairs on h2
    ], CAP_HIST_SCHEMA)
    out = {r['url']: r for r in
           scheduling.conditional_fetch_plan(hist).collect()}
    assert out['u1']['host_pairs'] == 3
    assert out['u1']['host_unchanged'] == 2
    assert out['u1']['expected_304_ppm'] == (3 * 1_000_000) // 5
    assert out['u2']['expected_304_ppm'] == out['u1']['expected_304_ppm']
    assert out['u3']['host_pairs'] == 0
    assert out['u3']['expected_304_ppm'] == 500_000


def test_retry_after_backoff(spark):
    """Only 429/503 rows with a header are directives; numeric seconds
    parse exactly, HTTP-dates fall back to default_secs, longest hold
    wins, ceil-division to waves, directive-free hosts resume next
    wave."""
    fetches = spark.createDataFrame([
        ('h1', 429, '120'),          # 120s -> ceil(120000/60000)=2 waves
        ('h1', 503, '30'),           # shorter, loses the max
        ('h1', 200, '999'),          # 200 never a directive
        ('h2', 503, 'Fri, 01 Jan 2027 00:00:00 GMT'),  # date -> default
        ('h3', 429, None),           # no header -> not a directive
        ('h3', 429, ''),             # empty -> not a directive
        ('h4', 200, None),
    ], 'host string, http_status int, retry_after string')
    out = {r['host']: r for r in scheduling.retry_after_backoff(
        fetches, wave_duration_ms=60_000, current_wave=5,
        default_secs=90).collect()}
    assert out['h1']['n_directives'] == 2
    assert out['h1']['hold_secs'] == 120
    assert out['h1']['resume_wave'] == 5 + 1 + 2
    assert out['h2']['hold_secs'] == 90           # date form -> default
    assert out['h2']['resume_wave'] == 5 + 1 + 2  # ceil(90/60) = 2
    assert out['h3']['n_directives'] == 0
    assert out['h3']['resume_wave'] == 6
    assert out['h4']['resume_wave'] == 6


def test_latency_budget_scales_with_response_time(spark):
    """delay = factor x mean fetch time; slow hosts get small budgets,
    fast hosts are clamped by max_budget, floor at min_budget."""
    fetches = spark.createDataFrame([
        ('fast', 10.0), ('fast', 20.0),    # mean 15ms -> delay 30ms
        ('fast', None),                    # untimed row must not dilute
        ('slow', 5000.0),                  # delay 10s -> 6 slots per 60s
        ('glacial', 50_000.0),             # delay 100s > wave -> min floor
        ('zero', 0.0),                     # delay 0 -> max cap
        ('untimed', None),                 # no timed fetch -> absent
    ], 'host string, fetch_ms double')
    out = {r['host']: r for r in scheduling.latency_budget(
        fetches, wave_duration_ms=60_000, delay_factor_ppm=2_000_000,
        min_budget=1, max_budget=10_000).collect()}
    assert 'untimed' not in out
    assert out['fast']['n_fetches'] == 2
    assert out['fast']['mean_fetch_us'] == 15_000
    assert out['fast']['delay_us'] == 30_000
    assert out['fast']['budget'] == 60_000_000 // 30_000   # 2000
    assert out['slow']['budget'] == 6                      # 60s / 10s
    assert out['glacial']['budget'] == 1                   # min floor
    assert out['zero']['delay_us'] == 0
    assert out['zero']['budget'] == 10_000                 # capped
    # without a cap, a zero-delay host gets the whole wave in slots;
    # an hour-long wave must not overflow the int32 literal range
    nocap = {r['host']: r['budget'] for r in scheduling.latency_budget(
        fetches, wave_duration_ms=3_600_000).collect()}
    assert nocap['zero'] == 3_600_000_000
    assert nocap['slow'] == 360


def test_latency_budget_quantile_tail_beats_mean(spark):
    from scalpel_spark.operators.scheduling import (
        latency_budget,
        latency_budget_quantile,
    )

    # bimodal host: 18 fast (1 ms) + 2 slow (1000 ms) fetches — rank
    # ceil(.95*20)=19 lands in the slow mode
    rows = [('h0', 1.0)] * 18 + [('h0', 1000.0)] * 2
    # steady host: always 50 ms
    rows += [('h1', 50.0)] * 20
    fetches = spark.createDataFrame(rows, 'host STRING, fetch_ms DOUBLE')
    mean = {r['host']: r for r in latency_budget(
        fetches, wave_duration_ms=60_000).collect()}
    p95 = {r['host']: r for r in latency_budget_quantile(
        fetches, wave_duration_ms=60_000, p_ppm=950_000).collect()}
    # p95 of the bimodal host is the slow mode; mean is diluted
    assert p95['h0']['p_fetch_us'] == 1_000_000
    assert mean['h0']['mean_fetch_us'] < 200_000  # diluted ~10x
    # so the tail-aware budget is far smaller (more polite) on h0
    assert p95['h0']['budget'] < mean['h0']['budget']
    # steady host: p95 == mean -> identical budgets
    assert p95['h1']['budget'] == mean['h1']['budget']


def test_latency_budget_quantile_clamps_and_nulls(spark):
    from scalpel_spark.operators.scheduling import latency_budget_quantile

    fetches = spark.createDataFrame(
        [('a', 0.001), ('a', 0.001), ('b', None)],
        'host STRING, fetch_ms DOUBLE')
    out = {r['host']: r for r in latency_budget_quantile(
        fetches, wave_duration_ms=60_000, max_budget=100).collect()}
    assert out['a']['budget'] == 100      # max clamp
    assert 'b' not in out                 # untimed host drops out
