"""Page-level robots directives (X-Robots-Tag / meta robots) — the
indexing-control layer that robots.txt does not cover.

robots.txt (``operators/robots.py``, ``operators/robots9309.py``) gates
FETCHING. Once a page is fetched, the server can still forbid indexing
or link-following through the ``X-Robots-Tag`` response header or an
equivalent ``<meta name="robots">`` element (Google/Bing robots-meta
spec; the values are identical in both carriers): ``noindex`` (exclude
from the index/items sink but links still count), ``nofollow`` (index
it, but do not schedule its outlinks), ``none`` (both), ``noarchive``
(index, but store no cached copy — for us: no payload in the CDX
archive). The reference (lewoudar/scalpel) never inspects these — it
has no index — but any crawl feeding a corpus or an index must.

Everything is token-boundary regex column algebra, RE2-compatible so a
DuckDB oracle recomputes the flags byte-identically — ``noindex``
inside ``unavailable_after: ...`` free text cannot false-match. The
appliers are anti-joins against the flagged-URL set, the same plan
family as the seen-set dedup: directive URLs are a small fraction of
the corpus, so AQE broadcasts the flag side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one directive as a comma-separated token; tolerant of spaces; (?i) case-
# insensitive per spec ("NOINDEX" and "noindex" are the same directive)
_TOKEN = r'(?i)(?:^|,)\s*{}\s*(?:,|$)'


def _has(tag: Column, token: str) -> Column:
    return tag.rlike(_TOKEN.format(token))


def noindex_col(tag: Column) -> Column:
    """True when the directive string forbids indexing (``noindex`` or
    ``none``). Per-row column algebra — when the tag rides the corpus
    row (the engine's case) no join is needed at all."""
    t = F.coalesce(tag, F.lit(''))
    return _has(t, 'noindex') | _has(t, 'none')


def nofollow_col(tag: Column) -> Column:
    """True when the directive string forbids following links
    (``nofollow`` or ``none``)."""
    t = F.coalesce(tag, F.lit(''))
    return _has(t, 'nofollow') | _has(t, 'none')


def noarchive_col(tag: Column) -> Column:
    """True when the directive string forbids archiving a copy."""
    return _has(F.coalesce(tag, F.lit('')), 'noarchive')


def robots_directives(pages: DataFrame, url_col: str = 'url',
                      tag_col: str = 'robots_tag') -> DataFrame:
    """Parse directive strings into per-URL boolean flags.

    ``none`` implies noindex AND nofollow; ``all`` (the default the
    spec names) grants everything, flags all false; a NULL or empty
    tag means no restrictions. Returns (url, noindex, nofollow,
    noarchive).
    """
    tag = F.col(tag_col)
    return pages.select(
        F.col(url_col).alias('url'),
        noindex_col(tag).alias('noindex'),
        nofollow_col(tag).alias('nofollow'),
        noarchive_col(tag).alias('noarchive'),
    )


def drop_noindex(items: DataFrame, directives: DataFrame,
                 url_col: str = 'doc_id') -> DataFrame:
    """Exclude items emitted by noindex pages from the sink — the page
    was fetched and its links followed; only its CONTENT is withheld."""
    banned = directives.filter('noindex').select(
        F.col('url').alias(url_col))
    return items.join(banned, url_col, 'left_anti')


def drop_nofollow_links(outlinks: DataFrame, directives: DataFrame,
                        parent_col: str = 'parent_url') -> DataFrame:
    """Exclude outlinks discovered on nofollow pages from the frontier —
    the page itself stays indexed; its endorsements do not count."""
    banned = directives.filter('nofollow').select(
        F.col('url').alias(parent_col))
    return outlinks.join(banned, parent_col, 'left_anti')
