"""RSS/Atom feed ingestion — the news-crawl counterpart to sitemap
discovery.

Sitemaps enumerate a site's whole URL space; feeds announce what's NEW.
A freshness-oriented crawler (news, blogs, releases) polls feed pages and
seeds the frontier from their entries, so recency arrives without
re-scanning the site. The reference (lewoudar/scalpel) takes literal seed
URLs only; this is the engine-side extension, same contract as
``operators/sitemap``: an injectable (url, body) page table in, frontier-
ready URL rows out.

Everything is map-side JVM regexp column algebra (no Python, no shuffle —
parsing N feed pages is one narrow pass); patterns are RE2-compatible
(lazy quantifiers + ``(?s)``/``(?i)`` only) so a DuckDB oracle recomputes
every extraction byte-identically. Both formats are handled in one pass:
format choice is a per-row ``when`` over extractions that both run
map-side, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RSS 2.0: one <item>…</item> per entry; Atom: one <entry>…</entry>.
RSS_BLOCK = r'(?s)<item>(.*?)</item>'
ATOM_BLOCK = r'(?s)<entry>(.*?)</entry>'
# RSS link is element text (possibly CDATA); Atom links are href attrs —
# whole tags are extracted first, then filtered by rel (no lookahead, so
# the pattern stays RE2-compatible for the DuckDB twin).
RSS_LINK = r'(?s)<link>\s*(.*?)\s*</link>'
ATOM_LINK_TAG = r'(?s)(<link[^>]*>)'
ATOM_HREF = r'href="([^"]*)"'
ATOM_REL_ALTERNATE = r'rel="alternate"'
RSS_DATE = r'(?s)<pubDate>\s*(.*?)\s*</pubDate>'
ATOM_DATE = r'(?s)<updated>\s*(.*?)\s*</updated>'
GUID = r'(?s)<(?:guid|id)[^>]*>\s*(.*?)\s*</(?:guid|id)>'
CDATA = r'^<!\[CDATA\[|\]\]>$'


def feed_entries(pages: DataFrame, url_col: str = 'url',
                 body_col: str = 'body') -> DataFrame:
    """Parse RSS/Atom bodies into one row per entry.

    Input: (url_col, body_col) — fetched feed pages. Output:
    (feed_url, pos, link, published, guid, is_atom) where ``pos`` is the
    0-based appearance order inside its feed (publication order is crawl
    priority, newest-first in real feeds), ``published`` is the raw
    pubDate/updated text ('' when absent — feeds disagree on date
    formats, so normalization is the caller's policy), and ``guid`` is
    the feed's own entry identity ('' when absent) for revisit dedup
    independent of the link URL. Entries without a link are dropped.
    """
    # format = whichever ROOT element opens first — a substring test
    # would misclassify an RSS feed whose item content mentions '<feed'
    # (e.g. <feedburner:origLink>) and silently parse zero entries
    atom_pos = F.instr(F.col(body_col), '<feed')
    rss_pos = F.instr(F.col(body_col), '<rss')
    is_atom = (atom_pos > 0) & ((rss_pos == 0) | (atom_pos < rss_pos))
    blocks = F.when(
        is_atom, F.regexp_extract_all(body_col, F.lit(ATOM_BLOCK), 1)
    ).otherwise(F.regexp_extract_all(body_col, F.lit(RSS_BLOCK), 1))
    b = pages.select(
        F.col(url_col).alias('feed_url'),
        is_atom.alias('is_atom'),
        F.posexplode(blocks).alias('pos', 'block'),
    )
    rss_link = F.regexp_replace(
        F.trim(F.regexp_extract('block', RSS_LINK, 1)), CDATA, '')
    # Atom entries carry several <link> tags (self/edit/replies/...);
    # the article URL is rel="alternate" — or a rel-less tag, which the
    # Atom spec defaults to alternate. Take the FIRST such tag.
    alt_tags = F.filter(
        F.regexp_extract_all('block', F.lit(ATOM_LINK_TAG), 1),
        lambda t: F.regexp_like(t, F.lit(ATOM_REL_ALTERNATE))
        | ~t.contains(' rel='),
    )
    atom_link = F.regexp_extract(
        F.coalesce(F.element_at(alt_tags, 1), F.lit('')), ATOM_HREF, 1)
    link = F.when(F.col('is_atom'), atom_link).otherwise(rss_link)
    published = F.when(
        F.col('is_atom'), F.regexp_extract('block', ATOM_DATE, 1)
    ).otherwise(F.regexp_extract('block', RSS_DATE, 1))
    return (
        b.select(
            'feed_url',
            F.col('pos').cast('long').alias('pos'),
            link.alias('link'),
            published.alias('published'),
            F.regexp_extract('block', GUID, 1).alias('guid'),
            'is_atom',
        )
        .filter(F.col('link') != '')
    )


def feed_seeds(entries: DataFrame) -> DataFrame:
    """Frontier-ready URLs from parsed entries, deduplicated on the link.
    One distinct shuffle over the (tiny) entry set; feed into
    ``CrawlEngine.run`` / ``run_frontier`` for real seen-set dedup,
    robots, and politeness — a feed URL is a *candidate*, not a verdict."""
    return entries.select(F.col('link').alias('url')).distinct()


def fresh_entries(entries: DataFrame, seen_guids: DataFrame) -> DataFrame:
    """Entries whose ``guid`` has not been polled before — the incremental
    feed-poll step. GUID-keyed (not link-keyed): feeds routinely rewrite
    link URLs (tracking params, CDN swaps) while keeping the entry id
    stable, so guid dedup survives what link dedup would double-fetch.
    Entries without a guid — empty OR null — pass through (no identity
    to dedup on; a bare `!= ''` would silently drop null-guid rows from
    both branches). One anti-join, same plan family as the URL seen set."""
    g = F.coalesce(F.col('guid'), F.lit(''))
    withg = entries.filter(g != '')
    nog = entries.filter(g == '')
    return withg.join(
        seen_guids.select('guid').distinct(), 'guid', 'left_anti'
    ).unionByName(nog)
