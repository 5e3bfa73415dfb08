"""Redirect-chain resolution — binary-lifted, loop-safe, O(log h) joins.

Beyond the reference: the reference delegates redirects to httpx's
defaults and records only the landing page; a large-scale crawl sees ~1/3
of frontier URLs answer 3xx, and the frontier must know each URL's FINAL
location to dedup correctly (the canonical URL of ``http://x/old`` is
wherever its chain lands), to cap hop counts, and to quarantine loops.

The naive plan — ``max_hops`` sequential ``frontier ⋈ edges`` joins — is
h full shuffles of the frontier. This module **binary-lifts** the
redirect map instead: ``m₁`` is the one-hop partial function
``src → (dst, 1)``; doubling composes ``m₂ₖ = mₖ ∘ mₖ`` (one self-join of
the EDGE set, not the frontier), and the exact ``max_hops`` walk is the
composition of the powers of two in its binary representation — so
``max_hops=6`` runs the chain through ``m₄ ∘ m₂`` and lands on EXACTLY
``min(chain_length, 6)`` hops. Total cost: ⌈log₂ h⌉ edge-set self-joins
plus one frontier join, instead of h frontier shuffles. Loops never
terminate early (every loop node keeps an outgoing edge), so a chain
still standing on a redirecting node after ``max_hops`` hops is exactly
the ``unresolved`` (loop or too-deep) class — no per-path state, no
driver iteration, loop-safe by construction.

Partial-function composition handles early termination for free: a chain
that reaches a terminal node in ``a`` hops finds no ``m_b`` entry for its
landing node and keeps ``(dst, a)`` through every later composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compose(a: DataFrame, b: DataFrame) -> DataFrame:
    """Walk ``a`` then continue with ``b``: src → (b(dst_a) ?? dst_a)."""
    bb = b.select(F.col('src').alias('_bsrc'), F.col('dst').alias('_bdst'),
                  F.col('hops').alias('_bhops'))
    return (
        a.join(bb, a['dst'] == bb['_bsrc'], 'left')
        .select(
            'src',
            F.coalesce('_bdst', 'dst').alias('dst'),
            (F.col('hops') + F.coalesce('_bhops', F.lit(0))).alias('hops'),
        )
    )


def lifted_map(edges: DataFrame, max_hops: int) -> DataFrame:
    """The exact ``max_hops``-bounded walk ``src → (landing, hops)`` for
    every redirecting URL, via binary lifting. ``edges`` is
    ``(src, dst)`` — one row per URL that redirects."""
    if max_hops < 1:
        raise ValueError('max_hops must be >= 1')
    m1 = edges.select('src', 'dst', F.lit(1).cast('int').alias('hops'))
    acc = None
    power = m1
    k = 1
    while k <= max_hops:
        if max_hops & k:
            acc = power if acc is None else _compose(acc, power)
        k <<= 1
        if k <= max_hops:
            # materialize each doubled power ONCE (lineage truncation, as
            # in clustering.duplicate_clusters): without this the logical
            # plan inlines every power twice per level and the join tree
            # grows 2^⌈log h⌉ ≈ h — exactly the recomputation binary
            # lifting exists to avoid.
            power = _compose(power, power).localCheckpoint()
    return acc


def resolve_redirects(
    urls_df: DataFrame,
    edges: DataFrame,
    max_hops: int = 8,
    url_col: str = 'url',
) -> DataFrame:
    """Adds ``final_url``, ``hops``, ``redirect_status`` to ``urls_df``.

    * ``direct``     — the URL never redirects (0 hops);
    * ``resolved``   — the chain landed on a terminal URL within
      ``max_hops`` hops;
    * ``unresolved`` — after exactly ``max_hops`` hops the chain is still
      on a redirecting URL: a loop or a too-deep chain (a crawler treats
      both as fetch failures, mirroring browsers' redirect caps).
    """
    walked = lifted_map(edges, max_hops)
    out = urls_df.join(walked, urls_df[url_col] == walked['src'], 'left').drop('src')
    final_url = F.coalesce('dst', F.col(url_col))
    # does the landing node itself still redirect?
    heads = edges.select(F.col('src').alias('_head')).distinct()
    out = (
        out.select(
            urls_df['*'],
            final_url.alias('final_url'),
            F.coalesce('hops', F.lit(0)).alias('hops'),
        )
        .join(heads, F.col('final_url') == F.col('_head'), 'left')
        .withColumn(
            'redirect_status',
            F.when(F.col('_head').isNotNull(), F.lit('unresolved'))
            .when(F.col('hops') == 0, F.lit('direct'))
            .otherwise(F.lit('resolved')),
        )
        .drop('_head')
    )
    return out
