"""Vectorized (Arrow-batched) pandas UDFs over the URL algebra kernel.

These are the only places URL string logic runs on executors; everything is
batch-vectorized over pandas Series (never row-at-a-time Python UDFs).
String parsing itself is per-element inside the batch — unavoidable for URL
grammar — but amortized over Arrow batches of 64k rows, matching the
north-star "vectorized pandas/Arrow UDFs for canonicalization" requirement.

Host extraction and hashing stay fully JVM-side (``F.parse_url`` /
``F.xxhash64``) — see ``host_col`` / ``url_hash_col``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import urlkit


@pandas_udf(StringType())
def absolutize_udf(base: pd.Series, url: pd.Series) -> pd.Series:
    """Reference ``core/response.py:103-116`` semantics, vectorized."""
    absolutize = urlkit.absolutize
    return pd.Series(
        [absolutize(b, u) if u is not None and b is not None else None for b, u in zip(base, url)],
        dtype='object',
    )


@pandas_udf(StringType())
def canonical_frontier_udf(url: pd.Series) -> pd.Series:
    """Vectorized :func:`urlkit.canonicalize_for_frontier` (tracking-param
    strip + param sort + fragment drop) — the seen-set key normalizer."""
    canon = urlkit.canonicalize_for_frontier
    return pd.Series([canon(u) if u is not None else None for u in url], dtype='object')


@pandas_udf(StringType())
def validate_url_udf(url: pd.Series) -> pd.Series:
    """Returns the reference's error message per URL, or null when valid
    (``core/spider.py:15-53``)."""
    validate = urlkit.validate_url
    return pd.Series([validate(u) if u is not None else 'url is null' for u in url], dtype='object')


@pandas_udf(StringType())
def encode_iri_udf(url: pd.Series) -> pd.Series:
    """IRI → URI encoding (``core/spider.py:32``)."""
    enc = urlkit.encode_iri
    return pd.Series([enc(u) if u is not None else None for u in url], dtype='object')


@pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    """Python-side host extraction (httpx semantics); prefer ``host_col``
    (JVM) in hot paths — this exists for parity tests of the kernel."""
    host = urlkit.host_of
    return pd.Series([host(u) if u is not None else None for u in url], dtype='object')


def host_col(url: Column) -> Column:
    """JVM-side host extraction used in the hot path: lowercased
    ``F.parse_url(url, 'HOST')``. file:// URLs yield null hosts — the
    engine routes those around the robots/politeness stages just like the
    reference's file branch (``any_io/static_spider.py:116-127``)."""
    return F.lower(F.parse_url(url, F.lit('HOST')))


def url_hash_col(url: Column) -> Column:
    """64-bit JVM-side hash for the seen set / joins (``F.xxhash64``)."""
    return F.xxhash64(url)


def scheme_col(url: Column) -> Column:
    """Scheme of the URL, JVM-side: text before the first ':'."""
    return F.lower(F.substring_index(url, ':', 1))


# Common two-label public suffixes (a pragmatic subset of the Mozilla
# Public Suffix List — en.wikipedia.org/wiki/Public_Suffix_List). A full
# PSL deployment swaps this tuple for the published list; the column
# algebra below is unchanged (the list is a literal array, so Catalyst
# ships it once in the plan, not per row). Sorted for determinism.
MULTI_LABEL_SUFFIXES = tuple(sorted({
    'ac.jp', 'ac.uk', 'co.id', 'co.in', 'co.jp', 'co.kr', 'co.nz',
    'co.th', 'co.uk', 'co.za', 'com.ar', 'com.au', 'com.bd', 'com.br',
    'com.cn', 'com.eg', 'com.hk', 'com.mx', 'com.my', 'com.ng',
    'com.ph', 'com.pk', 'com.sa', 'com.sg', 'com.tr', 'com.tw',
    'com.vn', 'edu.au', 'go.jp', 'gov.au', 'gov.br', 'gov.cn',
    'gov.uk', 'me.uk', 'ne.jp', 'net.au', 'net.br', 'net.cn',
    'net.in', 'net.nz', 'net.uk', 'or.jp', 'or.kr', 'org.au',
    'org.br', 'org.cn', 'org.in', 'org.nz', 'org.uk', 'org.za',
    'sch.uk',
}))


def registered_domain_col(host: Column) -> Column:
    """Registered domain (pay-level domain) of a host, JVM-side:
    ``news.bbc.co.uk`` → ``bbc.co.uk``, ``www.example.com`` →
    ``example.com``. Hosts with ≤2 labels (or null) pass through.

    Politeness at PLD granularity is how production crawlers avoid
    hammering one site through thousands of subdomains (the reference is
    host-granular because it crawls one site at a time —
    ``any_io/robots.py:44-56`` keys its cache by host); the engine
    exposes this via ``CrawlConfig.politeness_scope='domain'``.

    Pure whole-stage-codegen column algebra: one ``split``, two
    ``element_at`` probes, one literal-array membership scan (~50
    entries). DuckDB twin: ``string_split`` + ``list_contains`` over the
    same literal list.
    """
    labels = F.split(host, r'\.')
    n = F.size(labels)
    last2 = F.concat_ws('.', F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        '.', F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1))
    is_multi = F.array_contains(
        F.array(*[F.lit(s) for s in MULTI_LABEL_SUFFIXES]), last2)
    return (
        F.when(host.isNull() | (n <= 2), host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def surt_host_col(host: Column) -> Column:
    """SURT-ordered host key (``www.example.org`` → ``org,example,www``)
    — the classic web-archive sort key (Heritrix/Common Crawl SURT):
    range-partitioning or sorting the frontier on it co-locates every
    host of a registered domain in contiguous key space, so per-domain
    politeness grouping and prefix scans touch one partition range
    instead of shuffling. ``reverse(split(host)) |> array_join(',')`` —
    map-side, codegen."""
    return F.array_join(F.reverse(F.split(host, r'\.')), ',')


def surt_key_col(url: Column) -> Column:
    """Full SURT key of a URL: ``surt_host(host) || ')' || path`` (query
    dropped — frontier locality, not identity; the seen key remains the
    canonicalized full URL). Sorting the frontier by this key is the
    at-rest layout for 10^10 URLs: same-domain URLs are contiguous, so
    the per-host politeness window becomes a near-local operation."""
    raw = F.coalesce(F.parse_url(url, F.lit('PATH')), F.lit(''))
    path = F.when(raw == '', F.lit('/')).otherwise(raw)
    return F.concat(surt_host_col(host_col(url)), F.lit(')'), path)
