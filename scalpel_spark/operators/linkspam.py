"""Host-level link-spam features over the crawl's observed link graph.

The rank family (`operators/graphrank.py`) scores global authority; spam
detection additionally needs LOCAL structural features — the signatures
surveyed in Becchetti et al., "Link analysis for Web spam detection"
(TWEB 2008): reciprocity (link exchanges), self-citation, counterparty
fan-out vs link volume. The engine computes them host-level (the graph
the crawl actually records in ``links_delta``: src_host, dst_host,
n_links), so the feature table is host-pair-bounded, never URL×URL.

Scale shape: one groupBy per direction over the host-pair edge list plus
ONE self-equi-join on the reversed pair key for reciprocity — the join
key (dst, src) is as selective as the edge list itself. All quotients
are DECIMAL integral div ppm (engine-exact, DuckDB ``//`` twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['link_spam_features']


def link_spam_features(edges: DataFrame,
                       weight: str | None = None) -> DataFrame:
    """Per-host structural spam features from (src, dst[, weight]) edges.

    Returns one row per host appearing on either side:

    * ``out_hosts`` / ``in_hosts`` — distinct counterparties (self-loops
      count on both sides, as a counterparty of itself);
    * ``out_links`` / ``in_links`` — link volume (weight sums);
    * ``reciprocal_ppm`` — of the host's distinct out-neighbours
      (self excluded), the ppm fraction that link back: the
      link-exchange signature;
    * ``self_ppm`` — ppm of out-link volume that is self-citation.

    Multi-edges collapse to the pair level first (SUM weight), so the
    reciprocity join runs on distinct pairs.
    """
    w = F.col(weight).cast('long') if weight else F.lit(1).cast('long')
    pairs = (
        edges.select('src', 'dst', w.alias('w'))
        .groupBy('src', 'dst').agg(F.sum('w').alias('w'))
    )
    back = pairs.select(F.col('dst').alias('src'), F.col('src').alias('dst'))
    recip = (
        pairs.filter(F.col('src') != F.col('dst'))
        .join(back, ['src', 'dst'], 'left_semi')
        .groupBy('src').agg(F.count('*').alias('n_recip'))
    )
    outs = pairs.groupBy('src').agg(
        F.count('*').alias('out_hosts'),
        F.sum('w').alias('out_links'),
        F.sum(F.when(F.col('src') == F.col('dst'), F.col('w'))
              .otherwise(0)).alias('self_links'),
        F.sum(F.when(F.col('src') != F.col('dst'), 1)
              .otherwise(0)).alias('out_nonself'),
    )
    ins = pairs.groupBy('dst').agg(
        F.count('*').alias('in_hosts'),
        F.sum('w').alias('in_links'),
    )
    hosts = (
        pairs.select(F.col('src').alias('host'))
        .unionByName(pairs.select(F.col('dst').alias('host')))
        .distinct()
    )
    j = (
        hosts.join(outs.withColumnRenamed('src', 'host'), 'host', 'left')
        .join(ins.withColumnRenamed('dst', 'host'), 'host', 'left')
        .join(recip.withColumnRenamed('src', 'host'), 'host', 'left')
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast('long')  # noqa: E731
    recip_ppm = ('CAST(CAST(COALESCE(n_recip, 0) AS DECIMAL(28,0)) * 1000000'
                 ' div CAST(out_nonself AS DECIMAL(19,0)) AS BIGINT)')
    self_ppm = ('CAST(CAST(COALESCE(self_links, 0) AS DECIMAL(28,0)) * 1000000'
                ' div CAST(out_links AS DECIMAL(19,0)) AS BIGINT)')
    return j.select(
        'host',
        z('out_hosts').alias('out_hosts'), z('in_hosts').alias('in_hosts'),
        z('out_links').alias('out_links'), z('in_links').alias('in_links'),
        F.when(z('out_nonself') == 0, F.lit(0).cast('long'))
         .otherwise(F.expr(recip_ppm)).alias('reciprocal_ppm'),
        F.when(z('out_links') == 0, F.lit(0).cast('long'))
         .otherwise(F.expr(self_ppm)).alias('self_ppm'),
    )
