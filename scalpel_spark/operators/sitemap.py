"""Sitemap ingestion: parse sitemap.xml / sitemap-index bodies into
frontier-ready URL rows, and lift ``Sitemap:`` directives out of
robots.txt — the standard way a production crawler bootstraps its
frontier beyond hand-fed seeds.

The reference (lewoudar/scalpel) takes seed URLs only
(``any_io/static_spider.py`` ``urls`` config); sitemap discovery is the
engine-side extension that makes the seed list self-expanding. Everything
here is pure JVM regexp column algebra (whole-stage codegen, no Python
UDFs) and map-side only — parsing N sitemap pages is one narrow pass, no
shuffle. Patterns are RE2-compatible (lazy quantifiers + ``(?s)`` only)
so the DuckDB oracle recomputes every extraction byte-identically.

At 100 TB scale sitemap pages are a vanishing fraction of the corpus;
the cost that matters is the dedup against the seen set, which reuses the
same anti-join / bloom-prefilter plan family as the link frontier
(``operators/seen.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One <url>…</url> (urlset) or <sitemap>…</sitemap> (sitemapindex) block.
# (?s) so blocks may span lines; lazy body so adjacent blocks don't merge.
BLOCK_PATTERN = r'(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>'
# Inside a block: the loc value (may be CDATA-wrapped, stripped after),
# and an optional lastmod.
LOC_PATTERN = r'(?s)<loc>\s*(.*?)\s*</loc>'
LASTMOD_PATTERN = r'<lastmod>\s*([^<]*?)\s*</lastmod>'
CDATA_PATTERN = r'^<!\[CDATA\[|\]\]>$'
# robots.txt directive (case-insensitive key per the sitemaps protocol)
ROBOTS_SITEMAP_PATTERN = r'(?i)(?:^|\n)\s*sitemap:\s*(\S+)'


def sitemap_entries(pages: DataFrame, url_col: str = 'url',
                    body_col: str = 'body') -> DataFrame:
    """Parse sitemap XML bodies into one row per ``<loc>`` entry.

    Input: (url_col, body_col) — the fetched sitemap pages.
    Output: (sitemap_url, pos, loc, lastmod, is_index) where ``pos`` is
    the 0-based appearance order inside its page (crawl priority follows
    publication order), ``lastmod`` is '' when absent, and ``is_index``
    marks ``<sitemapindex>`` pages whose locs are further sitemaps to
    fetch, not documents.

    Tolerates real-world sitemap mess: multi-line blocks, whitespace
    around values, CDATA-wrapped locs, missing lastmod. Blocks without a
    loc are dropped (the spec requires one).
    """
    blocks = F.regexp_extract_all(body_col, F.lit(BLOCK_PATTERN), 1)
    b = pages.select(
        F.col(url_col).alias('sitemap_url'),
        F.col(body_col).contains('<sitemapindex').alias('is_index'),
        F.posexplode(blocks).alias('pos', 'block'),
    )
    loc_raw = F.regexp_extract('block', LOC_PATTERN, 1)
    return (
        b.select(
            'sitemap_url',
            F.col('pos').cast('long').alias('pos'),
            F.regexp_replace(F.trim(loc_raw), CDATA_PATTERN, '').alias('loc'),
            F.regexp_extract('block', LASTMOD_PATTERN, 1).alias('lastmod'),
            'is_index',
        )
        .filter(F.col('loc') != '')
    )


def sitemap_seeds(entries: DataFrame) -> DataFrame:
    """Frontier-ready seed URLs from parsed entries: document locs only
    (index pages point at more sitemaps, not documents), deduplicated.
    One distinct shuffle over the (tiny) sitemap-entry set; feed the
    result into ``CrawlEngine.run`` / ``run_frontier`` which applies the
    real seen-set dedup and politeness."""
    return (
        entries.filter(~F.col('is_index'))
        .select(F.col('loc').alias('url'))
        .distinct()
    )


def robots_sitemap_urls(robots: DataFrame, host_col: str = 'host',
                        rules_col: str = 'rules') -> DataFrame:
    """Extract ``Sitemap:`` directives from raw robots.txt rules — the
    discovery hop that turns a host list into sitemap fetch candidates.
    Case-insensitive key, one row per directive, per-host appearance
    order preserved in ``pos``. Map-side only."""
    urls = F.regexp_extract_all(rules_col, F.lit(ROBOTS_SITEMAP_PATTERN), 1)
    return robots.select(
        F.col(host_col).alias('host'),
        F.posexplode(urls).alias('pos', 'sitemap_url'),
    ).select('host', F.col('pos').cast('long').alias('pos'), 'sitemap_url')


def sitemap_delta(entries: DataFrame, captures: DataFrame,
                  loc_col: str = 'loc', lastmod_col: str = 'lastmod',
                  url_col: str = 'url',
                  capture_col: str = 'last_capture') -> DataFrame:
    """Sitemap-driven incremental recrawl: classify each sitemap loc
    against the capture history so the next wave fetches only what the
    site itself says changed — the loop ``<lastmod>`` exists for, and
    the companion of :func:`~scalpel_spark.operators.scheduling.
    conditional_fetch_plan` (validators decide HOW to refetch; lastmod
    decides WHETHER).

        new      never captured
        refetch  lastmod parses and is after the last capture
        skip     lastmod parses and is not after it
        unknown  captured but no lastmod, or a lastmod/capture that
                 does not parse as a timestamp — fall back to
                 change_rates / conditional fetch

    Timestamps compare as INSTANTS (``try_cast`` to timestamp), not
    strings: W3C datetimes carry ±hh:mm offsets and mixed granularity
    in the wild, and a lexicographic compare mis-orders both (an
    '02:00-07:00' lastmod IS after an '05:00Z' capture). A date-only
    lastmod means "changed sometime that day" and is treated as END of
    day (T23:59:59), so it beats any same-day capture — conservative
    toward refetching; captures should carry full precision. Offsetless
    values parse in the session timezone on both sides, so their
    relative order is timezone-invariant.

    ``captures`` must be unique per URL (the seen table is); duplicate
    locs across sitemaps collapse to their max lastmod first (any
    sitemap claiming newer content wins; max over W3C strings of mixed
    offsets is heuristic — same-host sitemaps share a format in
    practice) — one sitemap-sized groupBy, then one equi-join against
    the capture table (entries are the small side at corpus scale; AQE
    broadcasts).

    Returns (loc, lastmod, last_capture, action), lastmod/last_capture
    '' when absent.
    """
    e = entries.groupBy(F.col(loc_col).alias('loc')).agg(
        F.max(F.coalesce(F.col(lastmod_col), F.lit(''))).alias('lastmod'))
    c = captures.select(F.col(url_col).alias('loc'),
                        F.col(capture_col).alias('last_capture'))
    j = e.join(c, 'loc', 'left')
    lm = F.col('lastmod')
    lm_ts = (F.when(lm.rlike(r'^\d{4}-\d{2}-\d{2}$'),
                    F.concat(lm, F.lit('T23:59:59')))
             .otherwise(lm)).try_cast('timestamp')
    cap_ts = F.col('last_capture').try_cast('timestamp')
    action = (
        F.when(F.col('last_capture').isNull(), 'new')
        .when(lm == '', 'unknown')
        .when(lm_ts.isNull() | cap_ts.isNull(), 'unknown')
        .when(lm_ts > cap_ts, 'refetch')
        .otherwise('skip'))
    return j.select(
        'loc', 'lastmod',
        F.coalesce('last_capture', F.lit('')).alias('last_capture'),
        action.alias('action'))
