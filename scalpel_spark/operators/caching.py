"""HTTP cache freshness (RFC 9111) as revisit planning — the third leg
of the recrawl stack: :mod:`scheduling` plans by observed change rate,
``conditional_fetch_plan`` by validators (ETag/Last-Modified), and this
module by what the server *declared* about freshness, which is the only
signal available before any second visit.

Per capture, the freshness lifetime follows the RFC 9111 §4.2.1
precedence, all exact integer microseconds:

1. ``Cache-Control: no-store`` / ``no-cache`` → zero lifetime (always
   revalidate; no-store additionally means "do not reuse the body");
2. ``Cache-Control: max-age=N`` → N seconds;
3. ``Expires`` − ``Date``;
4. the §4.2.2 heuristic: 10 % of (``Date`` − ``Last-Modified``);
5. nothing declared → zero (conservative: revalidate).

Negative lifetimes clamp to zero (an ``Expires`` in the past is the
canonical "don't cache" idiom). Everything is map-side column algebra —
one regexp per directive, no UDFs, no shuffle; the output feeds the
wave scheduler the same way ``sitemap_delta``'s refetch classes do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_AGE_RE = r'(?i)max-age\s*=\s*(\d+)'
_NO_CACHE_RE = r'(?i)no-cache'
_NO_STORE_RE = r'(?i)no-store'
HEURISTIC_PPM = 100_000  # 10% of Date - Last-Modified (RFC 9111 §4.2.2)


def cache_freshness(captures: DataFrame, now_us: int) -> DataFrame:
    """Classify captures by declared freshness at instant ``now_us``.

    Input columns: ``url``, ``fetched_us`` (capture instant), and the
    nullable header columns ``cache_control STRING``, ``date_us``,
    ``expires_us``, ``last_modified_us`` (integer µs). Returns one row
    per capture: ``(url, lifetime_us, fresh_until_us, no_store,
    decision)`` with decision ∈ ``fresh`` (skip this wave) /
    ``revalidate`` (conditional fetch) — a no-store capture always
    revalidates and must not serve its stored body.
    """
    cc = F.coalesce(F.col('cache_control'), F.lit(''))
    no_store = cc.rlike(_NO_STORE_RE)
    no_cache = cc.rlike(_NO_CACHE_RE)
    max_age_s = F.regexp_extract(cc, _MAX_AGE_RE, 1)
    has_max_age = max_age_s != ''

    expires_life = F.col('expires_us') - F.col('date_us')
    heuristic_life = F.expr(
        f'(date_us - last_modified_us) * {HEURISTIC_PPM}L div 1000000')

    lifetime = (
        F.when(no_store | no_cache, F.lit(0).cast('long'))
        .when(has_max_age, (max_age_s.cast('long') * 1_000_000))
        .when(F.col('expires_us').isNotNull() & F.col('date_us').isNotNull(),
              expires_life)
        .when(F.col('date_us').isNotNull()
              & F.col('last_modified_us').isNotNull(), heuristic_life)
        .otherwise(F.lit(0).cast('long'))
    )
    lifetime = F.greatest(F.lit(0).cast('long'), lifetime.cast('long'))
    fresh_until = F.col('fetched_us') + lifetime
    return captures.select(
        'url',
        lifetime.alias('lifetime_us'),
        fresh_until.alias('fresh_until_us'),
        no_store.alias('no_store'),
        F.when(fresh_until > F.lit(now_us).cast('long'), F.lit('fresh'))
        .otherwise(F.lit('revalidate')).alias('decision'),
    )
