"""Crawl capacity planning: turn authority signals into next-crawl
budgets and recrawl picks.

Two deterministic, integer-exact operators close the loop that
``graphrank.host_rank`` opens:

* :func:`plan_host_budgets` — divide a global fetch budget across hosts
  proportionally to rank with the largest-remainder method, so the
  allocations are integers that sum EXACTLY to the budget (no float
  shares, no lost slots) and are reproducible on any engine/partitioning.
* :func:`select_recrawl` — pick the URLs worth re-fetching: staleness
  (waves since fetch) weighted by host authority, top-N overall. The
  output feeds ``CrawlEngine.forget()`` which clears them from the seen
  set for the next run.

Scale shape: both operate on host- or URL-metadata-sized frames (never
document payloads). The budget planner is host-cardinality (one tiny
window over hosts); the recrawl selector's global top-N is a TakeOrdered
(per-partition top-N then merge — no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_host_budgets(ranks: DataFrame, total_budget: int) -> DataFrame:
    """Largest-remainder proportional allocation of ``total_budget`` fetch
    slots over (host, rank_ppb) rows: base = floor(budget × rank / Σrank),
    then the leftover slots (budget − Σbase) go one each to the largest
    remainders (ties → host ASC). Integer arithmetic throughout; the
    allocations always sum to exactly ``total_budget``.

    Returns (host, rank_ppb, budget).
    """
    tot = ranks.agg(F.sum('rank_ppb').alias('tot'))
    based = ranks.crossJoin(F.broadcast(tot)).select(
        'host', 'rank_ppb',
        F.expr(f'({total_budget} * rank_ppb) div tot').alias('base'),
        F.expr(f'({total_budget} * rank_ppb) % tot').alias('rem'),
    )
    leftover = based.agg(
        (F.lit(total_budget) - F.sum('base')).alias('leftover'))
    w = Window.orderBy(F.col('rem').desc(), F.col('host').asc())
    return (
        based.withColumn('rn', F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            'host', 'rank_ppb',
            (F.col('base') + F.when(F.col('rn') <= F.col('leftover'), 1)
             .otherwise(0)).cast('long').alias('budget'),
        )
    )


def select_recrawl(seen: DataFrame, ranks: DataFrame, current_wave: int,
                   min_age: int = 1, limit: int = 1000) -> DataFrame:
    """The top-``limit`` URLs to re-fetch next run: reachable URLs at
    least ``min_age`` waves old, scored age × host rank (stale pages on
    authoritative hosts first), deterministic ties (score DESC, url ASC).

    ``seen`` needs (url, host, status, wave); ``ranks`` is host_rank
    output. Hosts absent from the rank table score rank 0 — still
    eligible, recrawled last. Returns (url, host, age, score).
    """
    aged = (
        seen.filter(F.col('status') == 'reachable')
        .withColumn('age', F.lit(current_wave) - F.col('wave'))
        .filter(F.col('age') >= min_age)
        .join(ranks, 'host', 'left')
        .select(
            'url', 'host', 'age',
            (F.col('age') * F.coalesce('rank_ppb', F.lit(0)))
            .cast('long').alias('score'),
        )
    )
    return aged.orderBy(F.col('score').desc(), F.col('url').asc()).limit(limit)


def adaptive_backoff(fetches: DataFrame, base_budget: int,
                     min_budget: int = 1,
                     throttle_weight: int = 2) -> DataFrame:
    """Error-rate-driven per-host budget scaling — the feedback half of
    politeness that robots.txt can't express: a host answering 429/5xx is
    telling the crawler its current budget is too high, regardless of
    what its crawl-delay says.

    ``fetches`` is one row per fetch outcome with (host, http_status).
    Per host, the penalty is the weighted failure share in ppm

        penalty_ppm = min(1e6, (throttle_weight*n_429 + n_5xx) * 1e6
                                 div (throttle_weight * n_total))

    so an all-429 host hits the full penalty and an all-5xx host hits
    1/throttle_weight of it (throttling is an explicit back-off demand;
    server errors may be unrelated). The next budget is

        budget = greatest(min_budget, base_budget*(1e6-penalty) div 1e6)

    Integer arithmetic throughout — reproducible on any engine and
    partitioning. One hash-shuffle groupBy over (host) carrying three
    counters; compose with :func:`plan_host_budgets` by using its
    allocation as ``base_budget`` per host (join + same formula).

    Returns (host, n_total, n_throttled, n_server_err, penalty_ppm,
    budget).
    """
    st = F.col('http_status')
    agg = fetches.groupBy('host').agg(
        F.count(F.lit(1)).alias('n_total'),
        F.sum(F.when(st == 429, 1).otherwise(0)).alias('n_throttled'),
        F.sum(F.when((st >= 500) & (st <= 599), 1).otherwise(0))
        .alias('n_server_err'),
    )
    penalty = F.least(
        F.lit(1_000_000),
        F.expr(f'(({throttle_weight} * n_throttled + n_server_err) * 1000000)'
               f' div ({throttle_weight} * n_total)'),
    ).alias('penalty_ppm')
    return agg.select(
        'host', 'n_total', 'n_throttled', 'n_server_err', penalty,
    ).withColumn(
        'budget',
        F.greatest(
            F.lit(min_budget).cast('long'),
            F.expr(f'({base_budget} * (1000000 - penalty_ppm)) div 1000000')),
    )


def change_rates(history: DataFrame, max_interval: int = 16) -> DataFrame:
    """Per-host content-churn estimate and revisit interval — the signal
    that turns blind recrawling into incremental crawling. A news host
    whose pages change every visit deserves wave-1 revisits; a static
    archive deserves ``max_interval``.

    ``history`` is the observation log across recrawls: one row per
    (url, host, wave, content_hash) fetch, where content_hash is any
    stable per-document fingerprint (the engine's
    ``spans.span_signature_col`` — the north-rule span-sequence identity —
    is the natural choice). Per URL, consecutive observations (wave
    order) whose hashes differ count as changes; per host

        change_ppm    = 1e6 * n_changes div n_intervals
        revisit_waves = max_interval                   if no change seen
                        clamp(1, max_interval,
                              n_intervals div n_changes)  otherwise

    i.e. the observed mean waves-per-change, integer-exact. One per-URL
    lag window (parallel across URLs) + one groupBy(host); nothing
    carries document payloads. Compose with :func:`select_recrawl` by
    filtering to URLs whose age ≥ their host's ``revisit_waves``.

    Returns (host, n_urls, n_intervals, n_changes, change_ppm,
    revisit_waves).
    """
    w = Window.partitionBy('url').orderBy('wave')
    prev = F.lag('content_hash').over(w)
    obs = history.select(
        'url', 'host', 'wave', 'content_hash',
        F.when(prev.isNull(), None)
        .when(F.col('content_hash') != prev, 1).otherwise(0)
        .alias('changed'),
    )
    agg = obs.groupBy('host').agg(
        F.countDistinct('url').alias('n_urls'),
        F.count('changed').cast('long').alias('n_intervals'),
        F.coalesce(F.sum('changed'), F.lit(0)).cast('long')
        .alias('n_changes'),
    )
    change_ppm = F.when(
        F.col('n_intervals') > 0,
        F.expr('(n_changes * 1000000) div n_intervals')
    ).otherwise(F.lit(0)).cast('long')
    revisit = F.when(
        F.col('n_changes') == 0, F.lit(max_interval)
    ).otherwise(
        F.least(F.lit(max_interval),
                F.greatest(F.lit(1), F.expr('n_intervals div n_changes')))
    ).cast('long')
    return agg.select('host', 'n_urls', 'n_intervals', 'n_changes',
                      change_ppm.alias('change_ppm'),
                      revisit.alias('revisit_waves'))


def topk_by_score(df: DataFrame, k: int, score_col: str = '_score',
                  tiebreak: str = 'priority',
                  target_partition_rows: int = 1 << 16) -> tuple[DataFrame, DataFrame]:
    """Exact global top-``k`` rows by (``score_col`` DESC, ``tiebreak``
    ASC) WITHOUT a global sort or a driver-side ``limit()`` — the
    priority-queue dequeue of the engine's score-aware global cap.

    The dense-priority bucket histogram (engine step 4b) needs a dense
    key; scores are arbitrary user expressions, so this uses the
    distributed-selection generalization: ``repartitionByRange`` on the
    order key (Spark samples the key distribution — no full sort, data
    moves once), per-range-partition counts to the driver (one row per
    partition, P = ceil(n / target_partition_rows)), every partition
    wholly under the threshold keeps/defers in bulk, and ONLY the single
    straddling partition ranks its ~target_partition_rows rows in one
    bounded window. Exactness does not depend on where Spark draws the
    range boundaries — only the straddle partition's internal order
    matters, and that is ranked exactly.

    ``df`` must already be persisted (spark_partition_id must be stable
    across the two passes). ``tiebreak`` must be globally unique (the
    engine's dense priorities) for a total order. Returns
    (kept, overflow) with the helper columns intact.
    """
    n = df.count()
    if n <= k:
        return df, df.limit(0)
    p = max(8, (n + target_partition_rows - 1) // target_partition_rows)
    parted = df.repartitionByRange(p, F.desc(score_col), F.asc(tiebreak)).persist()
    counts = {r['pid']: r['cnt'] for r in parted.groupBy(
        F.spark_partition_id().alias('pid')).agg(F.count('*').alias('cnt')).collect()}
    run = 0
    straddle = max(counts)  # fallback: k lands in the last partition
    base = 0
    for pid in sorted(counts):
        if run + counts[pid] > k:
            straddle, base = pid, run
            break
        run += counts[pid]
    pid_col = F.spark_partition_id()
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc(score_col), F.asc(tiebreak))
    ranked = (parted.filter(pid_col == straddle)
              .withColumn('_grank', F.row_number().over(w)))
    kept = parted.filter(pid_col < straddle).unionByName(
        ranked.filter(F.col('_grank') <= k - base).drop('_grank'))
    overflow = parted.filter(pid_col > straddle).unionByName(
        ranked.filter(F.col('_grank') > k - base).drop('_grank'))
    return kept, overflow


def crawler_shards(hosts: DataFrame, n_shards: int, host_col: str = 'host',
                   salt: str = '') -> DataFrame:
    """Assign every host to one of ``n_shards`` crawler instances by
    rendezvous (highest-random-weight) hashing — the UbiCrawler
    assignment function (Boldi et al., Softw. Pract. Exper. 2004 §4):
    ``shard(h) = argmax_s hash(h, s)``.

    Properties the tests pin, both exact rather than statistical:

    * **balance** — each shard receives ~|hosts|/K in expectation (the
      per-host winner is an independent uniform draw over shards);
    * **minimal, one-directional churn** — growing K→K+1 can only move
      a host TO the new shard (its old per-shard scores are unchanged,
      so the argmax only changes if the NEW shard wins), and in
      expectation exactly 1/(K+1) of hosts move. No remap table, no
      coordination: any worker recomputes any host's owner locally.

    The per-(host, shard) score is the portable 60-bit md5 hash
    (``texthash.hash60``) of ``host#shard#salt`` — ties are broken
    toward the higher shard id deterministically, and a DuckDB oracle
    reproduces the assignment byte for byte. ``salt`` re-deals the whole
    assignment (a new crawl generation) without changing K.

    Scale shape: explode K candidate rows per host (K = crawler count,
    single digits to hundreds), one partial-agg ``max(struct)`` groupBy
    on the host axis. Returns (host, shard).
    """
    from scalpel_spark.functions.texthash import hash60

    h = hosts.select(F.col(host_col).alias('host'))
    cand = h.select(
        'host',
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias('shard'),
    )
    score = hash60(F.concat_ws('#', F.col('host'),
                               F.col('shard').cast('string'), F.lit(salt)))
    return (
        cand.select('host', F.struct(score.alias('s'),
                                     F.col('shard')).alias('sc'))
        .groupBy('host').agg(F.max('sc').alias('m'))
        .select('host', F.col('m.shard').alias('shard'))
    )


def conditional_fetch_plan(history: DataFrame) -> DataFrame:
    """Plan the next revisit of each URL as a conditional or full fetch —
    the HTTP cache-validator loop (RFC 9110 §13) the reference never
    reaches because it refetches everything unconditionally
    (``any_io/static_spider.py`` ``_fetch``): a revisit that sends
    ``If-None-Match``/``If-Modified-Since`` costs a 304 with no payload
    when the page is unchanged, which at web scale is most fetches.

    ``history`` is the capture log: one row per (url, host, wave,
    content_hash, etag, last_modified) fetch, validators nullable (and
    ``''`` treated as absent — an empty ETag is not a validator). Per
    URL the LAST capture (max wave) decides the mode, with the RFC 9110
    §13.1.3 precedence — a server that gave an ETag gets
    ``If-None-Match``, not both:

        conditional_etag   last capture has an ETag
        conditional_ims    no ETag but a Last-Modified
        full               no validator ever sent

    The payoff estimate is per host (per-URL histories are short):
    across consecutive same-URL capture pairs, the fraction whose
    content_hash held, Laplace-smoothed so one-capture hosts predict
    50/50 instead of 0/0 —

        expected_304_ppm = 1e6 * (n_unchanged + 1) div (n_pairs + 2)

    integer-exact, reproducible on any partitioning. Scale shape: one
    per-URL lag window (parallel across URLs) + one max_by groupBy(url)
    + one groupBy(host) whose host-sized result joins back broadcast —
    document payloads never move.

    Returns (url, host, last_wave, fetch_mode, etag, last_modified,
    host_pairs, host_unchanged, expected_304_ppm).
    """
    w = Window.partitionBy('url').orderBy('wave')
    prev = F.lag('content_hash').over(w)
    obs = history.select(
        'url', 'host', 'wave',
        F.nullif(F.col('etag'), F.lit('')).alias('etag'),
        F.nullif(F.col('last_modified'), F.lit('')).alias('last_modified'),
        F.when(prev.isNull(), None)
        .when(F.col('content_hash') == prev, 1).otherwise(0)
        .alias('unchanged'),
    )
    # last capture per URL: row_number over the SAME (url, wave) sort the
    # lag window uses — one shuffle serves both. Not max_by: the last
    # capture's validator may be NULL and must stay NULL (max_by-style
    # aggregates skip nulls, which would leak a stale ETag forward).
    wl = Window.partitionBy('url').orderBy(F.desc('wave'))
    last = (obs.withColumn('_rn', F.row_number().over(wl))
            .filter(F.col('_rn') == 1)
            .select('url', 'host', F.col('wave').cast('long').alias('last_wave'),
                    'etag', 'last_modified'))
    rates = obs.groupBy('host').agg(
        F.count('unchanged').cast('long').alias('host_pairs'),
        F.coalesce(F.sum('unchanged'), F.lit(0)).cast('long')
        .alias('host_unchanged'),
    ).withColumn(
        'expected_304_ppm',
        F.expr('((host_unchanged + 1) * 1000000) div (host_pairs + 2)')
        .cast('long'))
    mode = (
        F.when(F.col('etag').isNotNull(), 'conditional_etag')
        .when(F.col('last_modified').isNotNull(), 'conditional_ims')
        .otherwise('full'))
    # no broadcast hint: host cardinality is unbounded at web scale, and
    # AQE already broadcasts when the rates aggregate is actually small
    # (same policy as the engine's host_state join)
    return (last.join(rates, 'host')
            .select('url', 'host', 'last_wave', mode.alias('fetch_mode'),
                    'etag', 'last_modified', 'host_pairs',
                    'host_unchanged', 'expected_304_ppm'))


def retry_after_backoff(fetches: DataFrame, wave_duration_ms: int,
                        current_wave: int,
                        default_secs: int = 60) -> DataFrame:
    """Honor explicit ``Retry-After`` directives (RFC 9110 §10.2.3) —
    the server-side half of back-off that :func:`adaptive_backoff`'s
    error-rate heuristic can't see: a 429/503 carrying ``Retry-After``
    is not a trend to be estimated, it is an instruction with a number
    in it, and ignoring it is how crawlers get IP-banned.

    ``fetches`` is one row per fetch outcome with (host, http_status,
    retry_after) — the raw header value, NULL/'' when absent. Only
    429/503 rows with a header count as directives. Delta-seconds
    values parse exactly; HTTP-date values (the header's other form)
    fall back to ``default_secs`` — converting a date needs "now",
    which belongs at fetch time (the fetcher logs delta-seconds), not
    in a deterministic batch plan. Per host the LONGEST hold wins, and
    the host re-enters the frontier at

        resume_wave = current_wave + 1 + ceil(hold_secs*1000
                                              / wave_duration_ms)

    (a host with no directive resumes next wave). Integer arithmetic
    throughout; one hash-shuffle groupBy(host) carrying two counters.
    Compose by anti-joining the frontier against hosts whose
    resume_wave > next wave.

    Returns (host, n_directives, hold_secs, resume_wave).
    """
    st = F.col('http_status')
    ra = F.col('retry_after')
    is_directive = ((st == 429) | (st == 503)) & ra.isNotNull() & (ra != '')
    secs = F.when(
        is_directive,
        F.when(ra.rlike('^[0-9]{1,9}$'), ra.cast('long'))
        .otherwise(F.lit(default_secs).cast('long')))
    agg = fetches.groupBy('host').agg(
        F.sum(F.when(is_directive, 1).otherwise(0)).cast('long')
        .alias('n_directives'),
        F.coalesce(F.max(secs), F.lit(0)).cast('long').alias('hold_secs'),
    )
    resume = (F.lit(current_wave + 1)
              + F.expr(f'(hold_secs * 1000 + {wave_duration_ms} - 1) '
                       f'div {wave_duration_ms}')).cast('long')
    return agg.select('host', 'n_directives', 'hold_secs',
                      resume.alias('resume_wave'))


def latency_budget(fetches: DataFrame, wave_duration_ms: int,
                   delay_factor_ppm: int = 2_000_000,
                   min_budget: int = 1,
                   max_budget: int | None = None) -> DataFrame:
    """Latency-aware politeness (Heritrix's ``delay-factor``): the pause
    between a host's dispatches scales with the server's OWN measured
    response time — a 5 s server asked again 100 ms later is being
    DDoSed by a polite-on-paper crawler, and robots.txt can't say so.
    With the default factor 2.0 (2e6 ppm, Heritrix's default) a host
    answering in ``t`` gets ``2t`` of quiet between requests.

        mean_us  = sum(floor(fetch_ms*1000)) div n        (integer µs)
        delay_us = (delay_factor_ppm * mean_us) div 1e6
        budget   = clamp(min_budget, max_budget,
                         wave_duration_ms*1000 div max(1, delay_us))

    Integer arithmetic end to end (per-row µs floors, ppm factor), so
    budgets reproduce on any engine/partitioning. One partial-agg
    groupBy(host) carrying two counters. The output's (host, budget)
    feeds ``CrawlEngine(host_budgets=...)`` directly — effective budget
    there is least(uniform knob, robots-delay-derived, table) — closing
    the observe → adapt → dispatch loop for latency the way
    :func:`adaptive_backoff` closes it for errors and
    :func:`retry_after_backoff` for explicit server instructions.

    Rows with NULL fetch_ms (a timeout logged without timing) are
    excluded up front — counting them against count(*) would dilute the
    mean and RAISE the budget, the opposite of polite; a host with no
    timed fetch at all drops out of the output and keeps whatever
    default budget policy applies.

    Returns (host, n_fetches, mean_fetch_us, delay_us, budget).
    """
    wave_us = wave_duration_ms * 1000  # compute in Python: an inline
    # `{ms} * 1000` SQL literal is INT*INT and overflows past ~35 min
    us = F.floor(F.col('fetch_ms') * 1000).cast('long')
    agg = (fetches.filter(F.col('fetch_ms').isNotNull())
           .groupBy('host').agg(
               F.count(F.lit(1)).cast('long').alias('n_fetches'),
               F.sum(us).cast('long').alias('_sum_us'),
           ))
    mean_us = F.expr('_sum_us div n_fetches')
    out = agg.select(
        'host', 'n_fetches', mean_us.alias('mean_fetch_us'),
    ).withColumn(
        'delay_us', F.expr(f'({delay_factor_ppm}L * mean_fetch_us) div 1000000')
    )
    budget = F.greatest(
        F.lit(min_budget).cast('long'),
        F.expr(f'{wave_us}L div greatest(1L, delay_us)'))
    if max_budget is not None:
        budget = F.least(budget, F.lit(max_budget).cast('long'))
    return out.withColumn('budget', budget)


def latency_budget_quantile(fetches: DataFrame, wave_duration_ms: int,
                            p_ppm: int = 950_000,
                            delay_factor_ppm: int = 2_000_000,
                            min_budget: int = 1,
                            max_budget: int | None = None) -> DataFrame:
    """Tail-aware :func:`latency_budget`: pace each host by its exact
    p95 (``p_ppm``) response time instead of the mean. A bimodal server
    — fast cache hits, occasional slow misses — averages fast, but it is
    the tail that signals saturation; Heritrix operators commonly raise
    delay-factor for exactly this case, and an exact quantile makes the
    resulting budget reproducible (``percentile_approx`` would not be).

    Same integer contract as the mean variant (per-row floor to µs,
    ppm factor, integral division); the quantile comes from
    ``quantiles.exact_quantiles`` (type-1, bucket-decomposed — no
    per-host sort task). Returns
    ``(host, n_fetches, p_fetch_us, delay_us, budget)``.
    """
    from scalpel_spark.operators.quantiles import exact_quantiles

    wave_us = wave_duration_ms * 1000
    us_df = (
        fetches.filter(F.col('fetch_ms').isNotNull())
        .select('host', F.floor(F.col('fetch_ms') * 1000)
                .cast('long').alias('_us'))
    )
    q = exact_quantiles(us_df, '_us', ['host'], probs_ppm=(p_ppm,))
    out = q.select(
        'host', F.col('n_rows').alias('n_fetches'),
        F.col('q_value').alias('p_fetch_us'),
    ).withColumn(
        'delay_us', F.expr(f'({delay_factor_ppm}L * p_fetch_us) div 1000000')
    )
    budget = F.greatest(
        F.lit(min_budget).cast('long'),
        F.expr(f'{wave_us}L div greatest(1L, delay_us)'))
    if max_budget is not None:
        budget = F.least(budget, F.lit(max_budget).cast('long'))
    return out.withColumn('budget', budget)
