"""Host-graph PageRank for crawl prioritization.

A web-scale crawler orders its frontier by host authority: hosts that many
other hosts link to get fetched first (the classic crawl-ordering result —
Cho, Garcia-Molina & Page 1998). The engine's priority-queue dispatch
window (``CrawlConfig.frontier_policy='priority'``) consumes any numeric
priority; this operator produces one from the observed link graph.

Arithmetic is INTEGER parts-per-billion end to end — ``rank/outdeg`` and
the damping multiply use integer ``div``, so every iteration is exactly
reproducible on any engine and any partitioning (no float-sum ordering
ambiguity; the DuckDB oracle unrolls the same iterations). Mass lost to
integer flooring and to dangling hosts (no out-links) is NOT redistributed
— rankings, not probabilities, are the product here.

Scale shape per iteration (all JVM column algebra):

* ``edges ⋈ rank`` on src — rank has HOST cardinality (10^7-10^8 at
  web scale, vs 10^10 URLs), so AQE broadcasts it; the edge list itself
  is scanned in place, never re-partitioned between iterations;
* one partial-agg groupBy(dst) producing the next host-sized rank frame.

Iterations are a fixed small constant (crawl ordering needs the coarse
head, not convergence); lineage stays shallow — callers checkpoint if
they push ``iters`` past ~10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # rank unit: parts-per-billion of total authority


def _iterate(edges: DataFrame, nodes: DataFrame, aux_row: DataFrame,
             init, teleport, iters: int, damping_pct: int,
             out: str) -> DataFrame:
    """Shared fixed-iteration kernel for rank-style propagation:

    r_0(h)   = init(h)
    r_i+1(h) = teleport(h) + (d * Σ_{src→h} (r_i(src) div outdeg(src)) * w) div 100

    ``nodes`` is (host [, marker cols]) — the init/teleport Column
    expressions may reference the markers and the one-row broadcast
    ``aux_row``'s column; ``edges`` is (src, dst, w). host_rank and
    trust_rank differ ONLY in those expressions, so the integer
    arithmetic lives in exactly one place.
    """
    keep = nodes.columns
    outdeg = edges.groupBy('src').agg(F.sum('w').alias('outdeg'))
    rank = nodes.crossJoin(F.broadcast(aux_row)).select(
        *keep, init.cast('long').alias(out))
    for _ in range(iters):
        contrib = (
            edges.join(rank.select(F.col('host').alias('src'), out), 'src')
            .join(outdeg, 'src')
            .select('dst', F.expr(f'({out} div outdeg) * w').alias('c'))
        )
        incoming = contrib.groupBy('dst').agg(F.sum('c').alias('in_sum'))
        rank = (
            nodes.join(incoming.withColumnRenamed('dst', 'host'), 'host', 'left')
            .crossJoin(F.broadcast(aux_row))
            .select(
                *keep,
                (
                    teleport
                    + F.expr(
                        f'({damping_pct} * coalesce(in_sum, 0)) div 100'
                    )
                ).cast('long').alias(out),
            )
        )
    return rank


def host_rank(edges: DataFrame, iters: int = 3, damping_pct: int = 85,
              weight: str | None = None) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) host edge list.

    rank_0(h)   = SCALE div N
    rank_i+1(h) = (SCALE*(100-d) div 100) div N
                  + (d * Σ_{src→h} (rank_i(src) div outdeg(src))) div 100

    Returns (host, rank_ppb) for every host appearing as src or dst,
    deterministically — duplicate edges count twice (a host linking twice
    sends twice the authority), matching the oracle. ``weight`` names an
    edge-multiplicity column (the host-aggregated lineage the engine
    persists): outdeg = Σ weights and each edge contributes
    ``(rank div outdeg) * weight`` — bit-identical to replaying the edge
    ``weight`` times, without exploding the aggregated table.
    """
    w = F.col(weight).cast('long') if weight else F.lit(1).cast('long')
    edges = edges.select('src', 'dst', w.alias('w'))
    nodes = (
        edges.select(F.col('src').alias('host'))
        .unionByName(edges.select(F.col('dst').alias('host')))
        .distinct()
    )
    n_row = nodes.agg(F.count('*').alias('n'))
    # numerators precomputed in Python — SCALE * pct would constant-fold
    # as 32-bit and overflow under ANSI
    return _iterate(
        edges, nodes, n_row,
        init=F.expr(f'{SCALE} div n'),
        teleport=F.expr(f'{SCALE * (100 - damping_pct) // 100} div n'),
        iters=iters, damping_pct=damping_pct, out='rank_ppb')


def trust_rank(edges: DataFrame, trusted: DataFrame, iters: int = 3,
               damping_pct: int = 85, weight: str | None = None) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004 §4):
    PageRank with teleportation restricted to a TRUSTED seed set, the
    standard link-spam demotion signal — trust flows out from vetted
    hosts along links, so a spam farm that only cites itself (or is only
    cited by other spam) accumulates ~zero trust no matter how large its
    internal link mass is. The frontier consumes it exactly like
    ``host_rank`` (a numeric priority); the two combined (high rank, low
    trust) flag the classic spam signature.

    trust_0(h)   = SCALE div T                        if h ∈ trusted else 0
    trust_i+1(h) = [h ∈ trusted] * (SCALE*(100-d) div 100) div T
                   + (d * Σ_{src→h} (trust_i(src) div outdeg(src)) * w) div 100

    Same integer-ppb arithmetic and per-iteration scale shape as
    ``host_rank`` (the shared ``_iterate`` kernel — host-sized trust
    frame broadcast against the in-place edge list, one partial-agg
    groupBy per iteration). ``trusted`` is a one-column (host)
    DataFrame; hosts in it but absent from the graph still seed teleport
    mass. Returns (host, trust_ppb) for every host in the graph or the
    trusted set.
    """
    w = F.col(weight).cast('long') if weight else F.lit(1).cast('long')
    edges = edges.select('src', 'dst', w.alias('w'))
    tdf = trusted.select(F.col(trusted.columns[0]).alias('host')).distinct()
    nodes = (
        edges.select(F.col('src').alias('host'))
        .unionByName(edges.select(F.col('dst').alias('host')))
        .unionByName(tdf)
        .distinct()
        .join(tdf.withColumn('_t', F.lit(True)), 'host', 'left')
        .select('host', F.coalesce('_t', F.lit(False)).alias('trusted'))
    )
    t_row = tdf.agg(F.count('*').alias('t'))
    rank = _iterate(
        edges, nodes, t_row,
        init=F.when(F.col('trusted'), F.expr(f'{SCALE} div t'))
        .otherwise(F.lit(0)),
        teleport=F.when(
            F.col('trusted'),
            F.expr(f'{SCALE * (100 - damping_pct) // 100} div t')
        ).otherwise(F.lit(0)),
        iters=iters, damping_pct=damping_pct, out='trust_ppb')
    return rank.select('host', 'trust_ppb')
