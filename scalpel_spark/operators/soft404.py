"""Soft-404 detection: find pages that return HTTP 200 but are really
error pages ("sic transit gloria telae", Bar-Yossef, Broder, Kumar &
Tomkins, WWW 2004). Soft 404s poison a crawl twice: they waste fetch
budget on dead branches, and — worse for a training-data pipeline —
they inject thousands of near-identical "page not found" documents
into the corpus under distinct URLs, defeating URL-level dedup.

The original method is active: probe each host with a random URL that
cannot exist and fingerprint the response — that fingerprint is the
host's error template. A batch engine can't probe, so this is the
passive analog over an already-fetched corpus:

1. **Template learning** (per host): normalize each 200-status body
   (lowercase, collapse whitespace) and fingerprint it. A fingerprint
   that appears under at least ``min_paths`` DISTINCT URLs on the same
   host AND whose body carries error phrasing is that host's learned
   soft-404 template — real content repeated across paths (site
   chrome aside) almost never phrases itself as an error.
2. **Flagging**: every 200-status page whose (host, fingerprint)
   matches a learned template is a soft 404. Pages with error phrasing
   but a unique body (e.g. an article ABOUT 404 pages) are NOT
   flagged — repetition across paths is what separates a template
   from content, exactly the insight of the probe method.

Scale shape (all JVM column algebra, reference parity n/a — the
reference never classifies responses beyond the status code,
``any_io/static_spider.py``): one normalize+hash projection (map-side),
one groupBy(host, sig) with a distinct-URL count (single shuffle on a
key that cannot be hot — a host serving 10^6 copies of one template
still contributes ONE group row), one template→page equi-join where
the template side is tiny (learned templates, not pages) and
broadcastable. No all-pairs anything; survives 100× by construction.

Blind spots, documented: a host whose error page varies per-URL
(echoes the requested path into the body) never forms a repeated
fingerprint — the probe method catches those via edit-distance
clustering, which is a different (quadratic-per-host) trade; and
hosts with fewer than ``min_paths`` soft 404s in the corpus stay
under the learning threshold until more of the host is crawled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lowercase error phrasing that marks a body as error-shaped. Kept
# deliberately simple (alternation of literal phrases) so the same
# pattern string is portable to any POSIX-ish regex engine.
ERROR_PHRASES = (
    'page not found|page was not found|file not found|error 404'
    '|404 not found|does not exist|no longer available'
    '|页面不存在|introuvable'
)


def normalized_sig(text: Column) -> Column:
    """Template fingerprint of a body: md5 hex of the lowercased,
    whitespace-collapsed, trimmed text. md5 (not xxhash64) so oracle
    engines reproduce it bit-for-bit; swap for
    ``functions.texthash.xxh64_col`` off the oracle path if the 128-bit
    string width ever shows up in a shuffle profile."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), '\\s+', ' ')))


def has_error_phrase(text: Column) -> Column:
    """True when the lowercased body contains any known error phrasing."""
    return F.lower(text).rlike(ERROR_PHRASES)


def soft404_templates(corpus: DataFrame, min_paths: int = 3,
                      url_col: str = 'url', host_col: str = 'host',
                      status_col: str = 'status',
                      text_col: str = 'text') -> DataFrame:
    """Learn per-host soft-404 templates: (host, sig, template_paths)
    for every normalized-body fingerprint that appears under at least
    ``min_paths`` distinct 200-status URLs on the host with error
    phrasing in the body."""
    pages = (
        corpus
        .filter(F.col(status_col) == 200)
        .select(F.col(host_col).alias('host'),
                F.col(url_col).alias('url'),
                normalized_sig(F.col(text_col)).alias('sig'),
                has_error_phrase(F.col(text_col)).alias('err'))
    )
    return (
        pages
        .filter(F.col('err'))
        .groupBy('host', 'sig')
        .agg(F.countDistinct('url').alias('template_paths'))
        .filter(F.col('template_paths') >= min_paths)
    )


def soft404_flags(corpus: DataFrame, min_paths: int = 3,
                  url_col: str = 'url', host_col: str = 'host',
                  status_col: str = 'status',
                  text_col: str = 'text') -> DataFrame:
    """Flag every 200-status page matching a learned template for its
    host. Returns (url, host, status, sig, template_paths, is_soft404)
    for ALL corpus rows — non-200 rows carry is_soft404 = false and a
    null template count, so the output is a drop-in annotated corpus.

    The template side of the join is the learned-template table —
    bounded by (hosts × distinct error templates), orders of magnitude
    smaller than the corpus — so Spark broadcast-hashes it under AQE
    without a hint at any realistic scale.
    """
    templates = soft404_templates(
        corpus, min_paths=min_paths, url_col=url_col, host_col=host_col,
        status_col=status_col, text_col=text_col)
    annotated = corpus.select(
        F.col(url_col).alias('url'), F.col(host_col).alias('host'),
        F.col(status_col).alias('status'),
        normalized_sig(F.col(text_col)).alias('sig'))
    return (
        annotated
        .join(templates, ['host', 'sig'], 'left')
        .withColumn('is_soft404',
                    (F.col('status') == 200)
                    & F.col('template_paths').isNotNull())
        .select('url', 'host', 'status', 'sig', 'template_paths',
                'is_soft404')
    )
