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


def _nodes_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col('src').alias('host'))
        .unionByName(edges.select(F.col('dst').alias('host')))
        .distinct()
    )


def _l1_normalized(scores: DataFrame, col: str) -> DataFrame:
    """Exact integer L1 normalization: (score · SCALE) div total.

    The multiply runs in DECIMAL so a long-sized raw score times SCALE
    cannot overflow (≤10^27 < 10^38), and the integral ``div`` operator
    returns the exact truncated quotient — DuckDB's
    ``(raw::HUGEINT * SCALE) // total`` reproduces it bit for bit.
    NOT ``FLOOR`` of a true division: under Spark's default
    ``allowPrecisionLoss`` the DECIMAL(38,0)/DECIMAL(19,0) quotient is
    adjusted to DECIMAL(38,6) and rounded HALF_UP at 1e-6 before FLOOR,
    so any fractional part ≥ 1 − 5e-7 floored UP (e.g.
    floor(1·SCALE/(SCALE+1)) → 1, exact answer 0) and two
    normalizations per hits() iteration could silently diverge from the
    oracle. Long sums are associative, so the result is identical on
    any partitioning. After this pass scores sum to (SCALE - n, SCALE],
    keeping the next half-step's weighted in-sums inside 64 bits
    (score ≤ SCALE ⇒ Σ score·w ≤ SCALE · Σw, safe to ~9·10^9 weighted
    edges)."""
    tot = scores.agg(F.greatest(
        F.lit(1).cast('long'), F.sum(col)).alias('_t'))
    scaled = (f'CAST(CAST({col} AS DECIMAL(28,0))'
              f' * CAST({SCALE} AS DECIMAL(10,0))'
              f' div CAST(_t AS DECIMAL(19,0)) AS BIGINT)')
    return scores.crossJoin(F.broadcast(tot)).select(
        'host', F.expr(scaled).alias(col))


def hits(edges: DataFrame, iters: int = 3,
         weight: str | None = None) -> DataFrame:
    """Fixed-iteration integer HITS (Kleinberg, JACM 1999) over a
    (src, dst[, weight]) host edge list: mutually-reinforcing hub and
    authority scores — the crawl-frontier complement to ``host_rank``
    (a high-hub host is a directory/index page whose outlinks are worth
    scheduling; a high-authority host is worth recrawling).

    hub_0(h)    = SCALE
    auth_i(h)   = norm(Σ_{src→h} hub_i-1(src) · w)
    hub_i(h)    = norm(Σ_{h→dst} auth_i(dst) · w)

    where ``norm`` is the integer L1 normalization of
    ``_l1_normalized`` — no floats anywhere, so every iteration is
    bit-reproducible and the DuckDB oracle unrolls the same arithmetic.
    Duplicate edges count twice (``weight`` aggregates multiplicity,
    matching ``host_rank``). Returns (host, auth_ppb, hub_ppb) for every
    host appearing as src or dst.

    Scale shape per half-step (all JVM column algebra): one
    edges ⋈ score join — the score frame has HOST cardinality so AQE
    broadcasts it while the edge list never moves — one partial-agg
    groupBy, and one scalar agg for the normalizer."""
    w = F.col(weight).cast('long') if weight else F.lit(1).cast('long')
    edges = edges.select('src', 'dst', w.alias('w'))
    nodes = _nodes_of(edges)
    hub = nodes.select('host', F.lit(SCALE).cast('long').alias('hub_ppb'))
    auth = None
    for _ in range(iters):
        a_raw = (
            edges.join(hub.select(F.col('host').alias('src'), 'hub_ppb'),
                       'src')
            .select('dst', F.expr('hub_ppb * w').alias('c'))
            .groupBy('dst').agg(F.sum('c').alias('s'))
        )
        auth = _l1_normalized(
            nodes.join(a_raw.withColumnRenamed('dst', 'host'), 'host', 'left')
            .select('host', F.coalesce('s', F.lit(0)).cast('long')
                    .alias('auth_ppb')),
            'auth_ppb')
        h_raw = (
            edges.join(auth.select(F.col('host').alias('dst'), 'auth_ppb'),
                       'dst')
            .select('src', F.expr('auth_ppb * w').alias('c'))
            .groupBy('src').agg(F.sum('c').alias('s'))
        )
        hub = _l1_normalized(
            nodes.join(h_raw.withColumnRenamed('src', 'host'), 'host', 'left')
            .select('host', F.coalesce('s', F.lit(0)).cast('long')
                    .alias('hub_ppb')),
            'hub_ppb')
    return auth.join(hub, 'host').select('host', 'auth_ppb', 'hub_ppb')


def opic_init(hosts: DataFrame) -> DataFrame:
    """OPIC state for a fresh crawl (Abiteboul, Preda & Cobena, WWW
    2003): every known host starts with an equal share of SCALE cash and
    zero history. ``hosts`` is any one-column host frame; returns
    (host, cash_ppb, hist_ppb)."""
    h = hosts.select(F.col(hosts.columns[0]).alias('host')).distinct()
    n_row = h.agg(F.count('*').alias('n'))
    return h.crossJoin(F.broadcast(n_row)).select(
        'host',
        F.expr(f'{SCALE} div n').cast('long').alias('cash_ppb'),
        F.lit(0).cast('long').alias('hist_ppb'))


def opic_update(state: DataFrame, edges: DataFrame, fetched: DataFrame,
                weight: str | None = None) -> DataFrame:
    """One OPIC wave: each FETCHED host banks its cash into history and
    distributes it along its out-edges; fetched hosts with no out-links
    are dangling — their cash goes to the virtual page, which
    redistributes it uniformly over all result hosts (``pot div n``
    each, flooring remainder retired, as with all integer mass here).

    On-line Page Importance Computation is the crawl-native alternative
    to recomputing PageRank per wave: importance ≈ ``hist + cash``
    accumulates INCREMENTALLY — one update per wave touching only the
    wave's edges — and Abiteboul et al. §3 show the history converges to
    the same fixpoint. The engine's ``frontier_priority='host_rank'``
    recomputes from full lineage; this operator is the O(wave) twin for
    continuous crawls where lineage grows without bound.

    new_cash(h) = [h unfetched]·cash(h) + Σ_{fetched src→h} (cash(src)
                  div outdeg_w(src)) · w + pot div n
    new_hist(h) = hist(h) + [h fetched]·cash(h)

    Hosts discovered this wave (edge dst not yet in ``state``) enter
    with what they receive — exactly OPIC's new-page rule. Integer
    ppb end to end; bit-reproducible on any partitioning. Scale shape:
    fetched/state frames are host-sized (broadcastable), the wave's
    edge list is scanned once, one groupBy(dst), one scalar pot agg.

    Returns (host, cash_ppb, hist_ppb)."""
    w = F.col(weight).cast('long') if weight else F.lit(1).cast('long')
    edges = edges.select('src', 'dst', w.alias('w'))
    fdf = fetched.select(
        F.col(fetched.columns[0]).alias('host')).distinct()
    st = state.select('host', 'cash_ppb', 'hist_ppb')
    nodes = (
        st.select('host')
        .unionByName(edges.select(F.col('dst').alias('host')))
        .unionByName(fdf)
        .distinct()
    )
    n_row = nodes.agg(F.count('*').alias('n'))
    fstate = (
        st.join(fdf, 'host')  # fetched hosts' current cash
        .select(F.col('host').alias('src'), 'cash_ppb')
    )
    outdeg = edges.groupBy('src').agg(F.sum('w').alias('outdeg'))
    spenders = fstate.join(outdeg, 'src', 'left')
    contrib = (
        edges.join(spenders.filter(F.col('outdeg').isNotNull()), 'src')
        .select('dst', F.expr('(cash_ppb div outdeg) * w').alias('c'))
        .groupBy('dst').agg(F.sum('c').alias('in_sum'))
    )
    pot_row = (
        spenders.filter(F.col('outdeg').isNull())
        .agg(F.coalesce(F.sum('cash_ppb'), F.lit(0)).alias('pot'))
    )
    return (
        nodes
        .join(st, 'host', 'left')
        .join(fdf.withColumn('_f', F.lit(True)), 'host', 'left')
        .join(contrib.withColumnRenamed('dst', 'host'), 'host', 'left')
        .crossJoin(F.broadcast(pot_row))
        .crossJoin(F.broadcast(n_row))
        .select(
            'host',
            (
                F.when(F.col('_f').isNull(),
                       F.coalesce('cash_ppb', F.lit(0))).otherwise(0)
                + F.coalesce('in_sum', F.lit(0))
                + F.expr('pot div n')
            ).cast('long').alias('cash_ppb'),
            (
                F.coalesce('hist_ppb', F.lit(0))
                + F.when(F.col('_f').isNotNull(),
                         F.coalesce('cash_ppb', F.lit(0))).otherwise(0)
            ).cast('long').alias('hist_ppb'),
        )
    )


def anti_trust_rank(edges: DataFrame, spam: DataFrame, iters: int = 3,
                    damping_pct: int = 85,
                    weight: str | None = None) -> DataFrame:
    """Anti-TrustRank (Krishnan & Raj, AIRWeb 2006): TrustRank run on the
    REVERSED link graph seeded with KNOWN-SPAM hosts — spam mass flows
    backwards along in-links, so a host that links into the spam
    neighbourhood (the link-seller / link-farm participant signature)
    accumulates spam score even when nothing links to it. The complement
    of :func:`trust_rank`: trust demotes what vetted hosts don't reach;
    anti-trust promotes-for-demotion what reaches known spam.

    Exactly :func:`trust_rank` over (dst, src) edges — same integer-ppb
    arithmetic, same per-iteration shape. Returns (host, spam_ppb).
    """
    cols = ['src', 'dst'] + ([weight] if weight else [])
    rev = edges.select(F.col('dst').alias('src'), F.col('src').alias('dst'),
                       *([F.col(weight)] if weight else []))
    out = trust_rank(rev.select(*cols), spam, iters=iters,
                     damping_pct=damping_pct, weight=weight)
    return out.select('host', F.col('trust_ppb').alias('spam_ppb'))


def spam_mass(rank: DataFrame, trust: DataFrame) -> DataFrame:
    """Relative spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen,
    VLDB 2006 "Link spam detection based on mass estimation"): the
    fraction of a host's PageRank NOT accounted for by its trusted-core
    rank, ``mass_ppm = ((rank − trust) · 10^6) div rank`` clamped to
    [0, 10^6]. High rank + low trust = the classic spam-farm signature;
    the pair (rank_ppb, mass_ppm) is what the frontier's
    priority/quarantine policies consume.

    ``rank`` is :func:`host_rank` output, ``trust`` is
    :func:`trust_rank` output (ppb scales cancel in the quotient — both
    are L1-normalized to SCALE). One equi-join on host; integral div
    keeps it engine-exact. Hosts with zero rank report mass 0.
    """
    j = rank.join(trust, 'host', 'left').select(
        'host', 'rank_ppb',
        F.coalesce('trust_ppb', F.lit(0)).cast('long').alias('trust_ppb'))
    raw = ('CAST(CAST(rank_ppb - LEAST(trust_ppb, rank_ppb) AS DECIMAL(28,0))'
           ' * 1000000 div CAST(rank_ppb AS DECIMAL(19,0)) AS BIGINT)')
    return j.select(
        'host', 'rank_ppb', 'trust_ppb',
        F.when(F.col('rank_ppb') <= 0, F.lit(0).cast('long'))
         .otherwise(F.expr(raw)).alias('mass_ppm'))
