"""rel=canonical folding: collapse URLs into their page-declared
canonical targets.

Pages declare a preferred URL via ``<link rel="canonical" href=...>``
(RFC 6596); honoring it is the third big URL-identity signal at crawl
scale, after redirect chains (``operators/redirects``) and learned
parameter aliases (``operators/dust``). The reference never parses the
hint (its span model stops at links, ``any_io/static_spider.py``) — at
web scale ignoring it re-crawls and re-stores every paginated /
tracking-variant page that a site already told us is a duplicate.

Semantics follow the conservative search-engine reading of RFC 6596:

* a declaration is a HINT edge ``url → canonical``; self-declarations
  (the overwhelmingly common case) and empty/missing hrefs are
  identities, not edges;
* cross-host declarations are dropped by default
  (``same_host_only=True``) — a page claiming a canonical on another
  host is the classic hijack vector, honored only when the operator is
  explicitly told to trust it;
* declarations CHAIN (A claims B, B claims C) and can loop (A ⇄ B);
  chains resolve like redirect chains, loops and over-deep chains come
  back ``unresolved`` so the caller keeps the original URL rather than
  folding into an unstable target.

Scale shape: edge extraction is one map-side projection + filter; the
chain walk reuses ``redirects.lifted_map`` — binary-lifted composition,
⌈log₂ h⌉ edge-set self-joins instead of h frontier shuffles (see that
module's docstring for the full argument). Canonical chains are shallow
in practice (hop 1 dominates), so ``max_hops`` defaults low.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.operators import redirects


def canonical_edges(pages: DataFrame, url_col: str = 'url',
                    canonical_col: str = 'canonical',
                    same_host_only: bool = True) -> DataFrame:
    """Extract honored hint edges ``(src, dst)`` from page-declared
    canonicals: non-null, non-empty, not self, and (by default)
    same-host. One distinct per (src) is NOT enforced — a page carries
    at most one canonical link by construction of the parse."""
    e = (
        pages
        .select(F.col(url_col).alias('src'),
                F.col(canonical_col).alias('dst'))
        .filter(F.col('dst').isNotNull() & (F.col('dst') != '')
                & (F.col('dst') != F.col('src')))
    )
    if same_host_only:
        e = e.filter(F.parse_url('src', F.lit('HOST'))
                     == F.parse_url('dst', F.lit('HOST')))
    return e


def fold_canonicals(urls_df: DataFrame, pages: DataFrame,
                    max_hops: int = 4, url_col: str = 'url',
                    canonical_col: str = 'canonical',
                    same_host_only: bool = True) -> DataFrame:
    """Adds ``canonical_url``, ``hops``, ``canonical_status`` to
    ``urls_df``:

    * ``self``       — no honored declaration (0 hops), URL is its own
      canonical;
    * ``folded``     — the chain landed on a stable target within
      ``max_hops``;
    * ``unresolved`` — loop or over-deep chain; ``canonical_url`` is
      where the walk stopped, callers should keep the original URL.
    """
    edges = canonical_edges(pages, url_col=url_col,
                            canonical_col=canonical_col,
                            same_host_only=same_host_only)
    out = redirects.resolve_redirects(urls_df, edges, max_hops=max_hops,
                                      url_col=url_col)
    status = F.col('redirect_status')
    mapped = (F.when(status == 'direct', F.lit('self'))
              .when(status == 'resolved', F.lit('folded'))
              .otherwise(F.lit('unresolved')))
    return (
        out
        .withColumnRenamed('final_url', 'canonical_url')
        .withColumn('canonical_status', mapped)
        .drop('redirect_status')
    )
