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
