"""Mergeable sketches for web-scale corpus statistics: HyperLogLog
cardinality and Count-Min frequency.

Why sketches at all: at 10^10 URLs / 100 TB of documents, "how many
distinct URLs per host" and "how often does this token occur" are the
two statistics every scheduling / quality decision reads, and both are
exact-answerable only via a full shuffle of the key column. The sketch
versions are one narrow pass + a tiny bounded state that MERGES
(register-wise max for HLL, counter-wise sum for CMS) — so shards,
waves, and incremental crawls combine without ever re-reading history.
That merge property is the entire point: it is what `treeAggregate`
over 1000 executors, or a per-snapshot sidecar union, needs.

Reference parity note: the reference spider keeps exact in-memory sets
(`scalpel` is single-process); these operators are the scale
replacement the SURVEY's §2.7/§4 extensions call for, alongside the
sharded bloom/cuckoo seen-set in ``operators/seen.py``.

Engine portability (the repo-wide contract, see ``functions/texthash``):
every step is integer column algebra derived from md5 (``hash60``), so
the DuckDB oracle reproduces the sketch BIT-FOR-BIT — including the
estimator, which uses DECIMAL integral division and the exact
fixed-point ``log2_milli`` instead of floating ln/log2 (not
bit-reproducible across engines). Estimates are reported in
milli-units (BIGINT) for the same reason.

At 100 TB: the register/counter build is one groupBy over a slim
(bucket, rho) / (row, col) projection — partial aggregation (map-side
max/sum) does almost all the work before the exchange, and the reduced
state is m rows (HLL) or d*w rows (CMS) TOTAL (per group), independent
of input size. Nothing here is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import (
    MERSENNE31,
    hash60,
    hash60_sql,
    minhash_affine_constants,
)

# ---------------------------------------------------------------- HLL ---

HLL_HASH_BITS = 60  # hash60 yields a uniform 60-bit integer


def xxhash60(col) -> Column:
    """Production 60-bit hash: the JVM ``xxhash64`` shifted unsigned to a
    nonnegative 60-bit range — drop-in for ``hash60`` in every sketch
    (same bit budget, ~no md5 cost) when DuckDB oracle parity is not
    needed. The md5 path stays the default for the same reason as
    texthash: the correctness gate recomputes the sketch bit-for-bit."""
    return F.shiftrightunsigned(F.xxhash64(col), 4)


def hll_alpha_ppm(m: int) -> int:
    """The HLL bias-correction constant alpha_m, floored to integer ppm —
    computed once in Python (a deterministic literal shared by the Spark
    plan and the DuckDB oracle), per Flajolet et al. 2007 §4."""
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return int(alpha * 1_000_000)


def hll_registers(df: DataFrame, col: str, p: int = 8,
                  group_cols: list[str] | None = None,
                  hash_fn=hash60) -> DataFrame:
    """The HLL register table for the values of ``col``: one row per
    (group, bucket) with the max rank ``rho``.

    bucket = hash60(v) mod m  (m = 2^p registers)
    w      = hash60(v) div m  (the remaining 60-p bits)
    rho    = leading zeros of w in (60-p) bits, + 1
           = (60-p) - bitlength(w) + 1, with w=0 -> 60-p+1

    bitlength via ``length(bin(w))`` — exact and identical in Spark and
    DuckDB. One groupBy with map-side partial MAX; output is at most
    m rows per group no matter the input size. Register tables from
    different shards/waves merge by the same groupBy-MAX — the property
    a 1000-executor treeAggregate or an incremental crawl relies on.
    """
    m = 1 << p
    h = hash_fn(F.col(col))
    bucket = F.pmod(h, F.lit(m)).cast('int')
    # h div 2^p via shiftright: h is a positive 60-bit value, and a
    # double-based division would lose bits past 2^53
    w = F.shiftright(h, p)
    wbits = HLL_HASH_BITS - p
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.conv(w, 10, 2)) + 1
    ).cast('int')
    keys = list(group_cols or [])
    return (
        df.select(*keys, bucket.alias('bucket'), rho.alias('rho'))
        .groupBy(*keys, 'bucket')
        .agg(F.max('rho').alias('rho'))
    )


def hll_estimate(registers: DataFrame, p: int = 8,
                 group_cols: list[str] | None = None) -> DataFrame:
    """The HLL cardinality estimate (milli-units, BIGINT) from a register
    table — raw estimator + the small-range linear-counting correction,
    all in exact integer / DECIMAL-integral-div arithmetic.

    raw:  E = alpha_m * m^2 / sum_j 2^(-rho_j)
          scaled by 2^(60-p+1): S = sum over PRESENT buckets of
          2^(SHIFT - rho_j) + (m - n_present) * 2^SHIFT  (absent => rho 0)
          E_milli = (alpha_ppm * m^2 * 2^SHIFT) div (S * 1000)
          (alpha_ppm carries the 10^6 scale; net factor 1000)
    small range (E <= 2.5m, zero registers V > 0): linear counting
          E = m * ln(m / V).  V only takes integer values 1..m, so the
          LC values are a PRECOMPUTED m-entry milli table embedded as
          the same literal in the Spark plan and the DuckDB oracle —
          exact (the fixed-point log2's octave interpolation error,
          fine for DSIR weights, is 30x too coarse here because LC
          differences ln(m)-ln(V) are tiny when V ~ m).

    DECIMAL(38) keeps the 10^29-magnitude numerator exact; ``div`` is
    the integral operator (FLOOR of a true DECIMAL division rounds
    HALF_UP under allowPrecisionLoss — the graphrank lesson). The
    estimate is deterministic and identical in DuckDB; standard HLL
    error (~1.04/sqrt(m), +-6.5% at p=8) applies vs the TRUE count.
    """
    m = 1 << p
    shift = HLL_HASH_BITS - p + 1
    alpha_ppm = hll_alpha_ppm(m)
    keys = list(group_cols or [])
    gb = registers.groupBy(*keys) if keys else registers.groupBy()
    agg = gb.agg(
        F.sum(F.expr(f'cast(power(2, {shift} - rho) as bigint)')).alias('s_present'),
        F.count('*').alias('n_present'),
    )
    s_total = (F.col('s_present')
               + (F.lit(m) - F.col('n_present')) * F.lit(1 << shift))
    raw = F.expr(
        f'cast(cast({alpha_ppm} as decimal(28,0)) * {m} * {m}'
        f' * cast({1 << shift} as decimal(19,0))'
        f' div (cast(_s as decimal(28,0)) * 1000) as bigint)'
    )
    v_zero = F.lit(m) - F.col('n_present')  # absent bucket <=> rho never set
    lc = F.expr(
        f'element_at(array({_lc_table_sql(m)}), cast(_v as int))'
    )
    est = (
        agg.withColumn('s_present', F.coalesce('s_present', F.lit(0)))
        .withColumn('_s', s_total.cast('long'))
        .withColumn('_v', v_zero.cast('long'))
        .withColumn('_raw', raw)
        .withColumn(
            'estimate_milli',
            F.when((F.col('_raw') <= F.lit(2500 * m)) & (F.col('_v') > 0), lc)
            .otherwise(F.col('_raw')),
        )
    )
    return est.select(*keys, 'estimate_milli',
                      F.col('n_present').cast('long').alias('n_registers'))


def hll_cardinality(df: DataFrame, col: str, p: int = 8,
                    group_cols: list[str] | None = None,
                    hash_fn=hash60) -> DataFrame:
    """registers -> estimate in one call: per-group distinct-count
    estimate of ``col`` in milli-units, one slim shuffle total."""
    return hll_estimate(hll_registers(df, col, p, group_cols, hash_fn),
                        p, group_cols)


def _lc_table_sql(m: int) -> str:
    """The m-entry linear-counting milli table (index V = number of zero
    registers, 1-based): round(m * ln(m/V) * 1000). Computed ONCE in
    Python and embedded verbatim in both engines' plans, so both sides
    are bit-identical by construction (no runtime ln anywhere)."""
    import math
    return ', '.join(
        str(int(m * math.log(m / v) * 1000 + 0.5)) for v in range(1, m + 1)
    )


def hll_registers_sql(value_expr: str, from_sql: str, p: int = 8,
                      group_exprs: list[str] | None = None) -> str:
    """DuckDB twin of :func:`hll_registers` (a CTE body)."""
    m = 1 << p
    wbits = HLL_HASH_BITS - p
    h = hash60_sql(value_expr)
    keys = list(group_exprs or [])
    sel_keys = ''.join(f'{k}, ' for k in keys)
    gb_keys = ''.join(f'{k}, ' for k in keys)
    return f"""
SELECT {gb_keys}bucket, MAX(rho) AS rho FROM (
  SELECT {sel_keys}
         CAST(h % {m} AS INTEGER) AS bucket,
         CAST(CASE WHEN h // {m} = 0 THEN {wbits + 1}
              ELSE {wbits} - length(bin(h // {m})) + 1 END AS INTEGER) AS rho
  FROM (SELECT {sel_keys}{h} AS h FROM {from_sql})
) GROUP BY {gb_keys}bucket"""


def hll_estimate_sql(registers_cte: str, p: int = 8,
                     group_exprs: list[str] | None = None) -> str:
    """DuckDB twin of :func:`hll_estimate` over a register CTE name."""
    m = 1 << p
    shift = HLL_HASH_BITS - p + 1
    alpha_ppm = hll_alpha_ppm(m)
    keys = list(group_exprs or [])
    gb = ('GROUP BY ' + ', '.join(keys)) if keys else ''
    sel_keys = ''.join(f'{k}, ' for k in keys)
    return f"""
SELECT {sel_keys}
       CAST(CASE WHEN raw <= {2500 * m} AND v > 0
            THEN ([{_lc_table_sql(m)}])[CAST(v AS INTEGER)]
            ELSE raw END AS BIGINT) AS estimate_milli,
       CAST(n_present AS BIGINT) AS n_registers
FROM (
  SELECT {sel_keys}n_present,
         ({m} - n_present) AS v,
         CAST(CAST({alpha_ppm} AS HUGEINT) * {m} * {m} * {1 << shift}
              // (CAST(s_present + ({m} - n_present) * CAST({1 << shift} AS BIGINT) AS HUGEINT) * 1000)
              AS BIGINT) AS raw
  FROM (
    SELECT {sel_keys}
           COALESCE(SUM(CAST(power(2, {shift} - rho) AS BIGINT)), 0) AS s_present,
           COUNT(*) AS n_present
    FROM {registers_cte} {gb}
  )
)"""


# ---------------------------------------------------------------- CMS ---


def _cms_cells(tok_hash: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` counter columns for one token hash — the affine
    family from texthash (one base hash, d cheap affine maps)."""
    consts = minhash_affine_constants(depth)
    base = F.pmod(tok_hash, F.lit(MERSENNE31))
    return F.array(*[
        F.pmod(F.pmod(base * F.lit(a) + F.lit(b), F.lit(MERSENNE31)),
               F.lit(width)).cast('int')
        for a, b in consts
    ])


def cms_counters(docs: DataFrame, text_col: str = 'text',
                 depth: int = 4, width: int = 512,
                 hash_fn=hash60) -> DataFrame:
    """The Count-Min counter table over whitespace tokens of ``text_col``:
    (row, col, cnt) with at most depth*width rows TOTAL.

    One explode to (token) -> depth (row, col) cells per token via
    posexplode over the affine cell array -> ONE groupBy(row, col) SUM
    with map-side partials. Counter tables from shards/batches merge by
    the same SUM — the mergeability that makes this a one-pass global
    frequency structure at 100 TB (the exact equivalent is a full
    token shuffle whose reduced side is vocabulary-sized, not d*w)."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), ' ')).alias('tok')
    ).filter(F.col('tok') != '')
    cells = toks.select(
        F.posexplode(_cms_cells(hash_fn(F.col('tok')), depth, width))
        .alias('row', 'col')
    )
    return (
        cells.groupBy('row', 'col')
        .agg(F.count('*').cast('long').alias('cnt'))
    )


def cms_estimate(counters: DataFrame, words: DataFrame,
                 word_col: str = 'word', depth: int = 4,
                 width: int = 512, hash_fn=hash60) -> DataFrame:
    """Point-estimate each word's frequency from the counter table:
    est = MIN over the d cells the word maps to. Always >= the true
    count (Cormode & Muthukrishnan 2005). The d-cell lookup is a
    broadcast-sized equi-join on (row, col) — the counter table is
    d*w rows, always the broadcast side."""
    probes = words.select(
        word_col,
        F.posexplode(_cms_cells(hash_fn(F.col(word_col)), depth, width))
        .alias('row', 'col'),
    )
    return (
        probes.join(F.broadcast(counters), ['row', 'col'], 'left')
        .groupBy(word_col)
        .agg(F.min(F.coalesce(F.col('cnt'), F.lit(0))).alias('cms_count'))
    )


def cms_heavy_hitters(docs: DataFrame, text_col: str = 'text',
                      top_n: int = 20, depth: int = 4,
                      width: int = 512) -> DataFrame:
    """Exact-vs-sketch audit for the corpus' top-N tokens: exact count
    (the full token shuffle), the CMS estimate from the d*w counter
    table, and the overestimate in ppm. The exact pass exists to PIN the
    sketch's guarantee (cms >= exact, tight for heavy keys); production
    keeps only the counter table. Ties broken by token for determinism."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), ' ')).alias('word')
    ).filter(F.col('word') != '')
    exact = toks.groupBy('word').agg(F.count('*').cast('long').alias('exact_count'))
    top = (exact.orderBy(F.col('exact_count').desc(), F.col('word')).limit(top_n))
    counters = cms_counters(docs, text_col, depth, width)
    est = cms_estimate(counters, top.select('word'), 'word', depth, width)
    return (
        top.join(est, 'word')
        .select(
            'word', 'exact_count', 'cms_count',
            F.expr('cast(cast((cms_count - exact_count) as decimal(28,0)) * 1000000'
                   ' div cast(exact_count as decimal(19,0)) as bigint)')
            .alias('overestimate_ppm'),
        )
    )


def cms_cells_sql(tok_expr: str, depth: int, width: int) -> list[str]:
    """DuckDB twins of :func:`_cms_cells` — one column expr per row."""
    consts = minhash_affine_constants(depth)
    base = f'({hash60_sql(tok_expr)} % {MERSENNE31})'
    return [
        f'CAST((({base} * {a} + {b}) % {MERSENNE31}) % {width} AS INTEGER)'
        for a, b in consts
    ]


# ---------------------------------------------------------------- KMV ---
#
# K-minimum-values ("theta") sketch: keep the k smallest distinct hash
# values of a set. Unlike HLL, KMV supports set ALGEBRA — union (merge +
# re-trim) and intersection (Jaccard over the merged minima) — which is
# what crawl-overlap questions need ("how many URLs do these two crawls
# share?") without ever joining URL x URL. Beyer et al., SIGMOD 2007.


def kmv_sketch(df: DataFrame, col: str, k: int = 256,
               hash_fn=hash60) -> DataFrame:
    """The k smallest DISTINCT hash60 values of ``col`` — one slim
    distinct + TakeOrdered (O(n log k) per partition, no global sort
    task holds more than k rows). Output: (h) rows, at most k."""
    return (
        df.select(hash_fn(F.col(col)).alias('h'))
        .distinct()
        .orderBy('h')
        .limit(k)
    )


def kmv_estimate_milli(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-cardinality estimate from a KMV sketch, milli-units:
    (k-1) * 2^60 div h_k where h_k is the k-th smallest value (the
    standard unbiased KMV estimator). If the set has fewer than k
    distinct values the sketch IS the set and the exact count is
    returned. DECIMAL integral division throughout."""
    agg = sketch.groupBy().agg(F.max('h').alias('h_k'),
                               F.count('*').alias('n'))
    est = F.expr(
        f'cast(cast({k - 1} as decimal(28,0)) * {1 << 60} * 1000'
        f' div cast(h_k as decimal(19,0)) as bigint)'
    )
    return agg.select(
        F.when(F.col('n') < k, F.col('n') * 1000)
        .otherwise(est).cast('long').alias('estimate_milli'),
        F.col('n').cast('long').alias('n_values'),
    )


def kmv_overlap(a: DataFrame, b: DataFrame, col: str = 'url',
                k: int = 256) -> DataFrame:
    """Jaccard / intersection estimate between two sets from their KMV
    sketches: merge the two k-minima sets, keep the k smallest of the
    union (= the union's sketch — the KMV merge law), and count how many
    of those appear in BOTH inputs. jaccard_ppm = matches * 10^6 div k;
    intersection_milli = jaccard * union_estimate. One row out.

    Plan shape: two TakeOrdereds + joins over <= 3k rows — after the two
    distinct passes nothing corpus-sized moves, which is the point at
    10^10 URLs per crawl snapshot."""
    sa = kmv_sketch(a, col, k).withColumn('in_a', F.lit(1))
    sb = kmv_sketch(b, col, k).withColumn('in_b', F.lit(1))
    merged = (
        sa.select('h').unionAll(sb.select('h'))
        .distinct().orderBy('h').limit(k)
    )
    joined = (
        merged.join(sa, 'h', 'left').join(sb, 'h', 'left')
        .select('h', F.coalesce('in_a', F.lit(0)).alias('in_a'),
                F.coalesce('in_b', F.lit(0)).alias('in_b'))
    )
    agg = joined.groupBy().agg(
        F.count('*').alias('n_merged'),
        F.sum(F.expr('in_a * in_b')).alias('n_both'),
        F.max('h').alias('h_k'),
    )
    union_est = F.expr(
        f'cast(case when n_merged < {k} then n_merged * 1000 else '
        f'cast(cast({k - 1} as decimal(28,0)) * {1 << 60} * 1000'
        f' div cast(h_k as decimal(19,0)) as bigint) end as bigint)'
    )
    return agg.select(
        F.expr(f'cast(cast(n_both as decimal(28,0)) * 1000000'
               f' div cast(n_merged as decimal(19,0)) as bigint)')
        .alias('jaccard_ppm'),
        union_est.alias('union_est_milli'),
    ).select(
        'jaccard_ppm', 'union_est_milli',
        F.expr('cast(cast(jaccard_ppm as decimal(28,0)) * union_est_milli'
               ' div 1000000 as bigint)').alias('intersection_est_milli'),
    )


def kmv_sketch_sql(value_expr: str, from_sql: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_sketch` (a CTE body)."""
    return (f'SELECT DISTINCT {hash60_sql(value_expr)} AS h FROM {from_sql} '
            f'ORDER BY h LIMIT {k}')


def kmv_overlap_sql(a_cte: str, b_cte: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_overlap` over two sketch CTE names."""
    return f"""
SELECT jaccard_ppm, union_est_milli,
       CAST(CAST(jaccard_ppm AS HUGEINT) * union_est_milli // 1000000
            AS BIGINT) AS intersection_est_milli
FROM (
  SELECT CAST(CAST(n_both AS HUGEINT) * 1000000 // n_merged AS BIGINT) AS jaccard_ppm,
         CAST(CASE WHEN n_merged < {k} THEN n_merged * 1000
              ELSE CAST(CAST({k - 1} AS HUGEINT) * {1 << 60} * 1000 // h_k AS BIGINT)
              END AS BIGINT) AS union_est_milli
  FROM (
    SELECT COUNT(*) AS n_merged,
           SUM(CASE WHEN ina.h IS NOT NULL AND inb.h IS NOT NULL
               THEN 1 ELSE 0 END) AS n_both,
           MAX(m.h) AS h_k
    FROM (SELECT h FROM (SELECT h FROM {a_cte} UNION SELECT h FROM {b_cte})
          ORDER BY h LIMIT {k}) m
    LEFT JOIN {a_cte} ina ON m.h = ina.h
    LEFT JOIN {b_cte} inb ON m.h = inb.h
  )
)"""


def kmv_sketch_grouped(df: DataFrame, col: str, group_col: str,
                       k: int = 256, hash_fn=hash60) -> DataFrame:
    """Per-group KMV sketches: (group, h) — the k smallest distinct
    hashes WITHIN each group, via one distinct + one PARTITIONED window
    (rank over (group) ORDER BY h, kept <= k; every window task holds
    one group's distinct hashes, never the corpus)."""
    from pyspark.sql import Window
    return (
        df.select(F.col(group_col).alias('grp'),
                  hash_fn(F.col(col)).alias('h'))
        .distinct()
        .withColumn('_r', F.row_number().over(
            Window.partitionBy('grp').orderBy('h')))
        .filter(F.col('_r') <= k)
        .select('grp', 'h')
    )


def kmv_overlap_matrix(df: DataFrame, col: str, group_col: str,
                       k: int = 256, hash_fn=hash60) -> DataFrame:
    """Pairwise Jaccard estimates between every pair of groups from
    their KMV sketches — "which sources share content", the cross-source
    contamination matrix, in O(G^2 * k) bounded rows (G = #groups; the
    corpus is touched exactly once, by the grouped sketch build).

    For each unordered pair (a < b): merge the two k-minima sets, rank
    the union, keep the k smallest, count members present in both
    sketches. Returns (grp_a, grp_b, n_merged, n_both, jaccard_ppm).
    """
    from pyspark.sql import Window
    sk = kmv_sketch_grouped(df, col, group_col, k, hash_fn)
    pairs = (
        sk.select(F.col('grp').alias('grp_a')).distinct()
        .join(sk.select(F.col('grp').alias('grp_b')).distinct())
        .filter(F.col('grp_a') < F.col('grp_b'))
    )
    a = sk.select(F.col('grp').alias('grp_a'), 'h',
                  F.lit(1).alias('in_a'))
    b = sk.select(F.col('grp').alias('grp_b'), 'h',
                  F.lit(1).alias('in_b'))
    # union of the two sketches per pair, with membership flags: join
    # each sketch row onto every pair the group participates in, then
    # merge duplicate h per pair
    ua = pairs.join(a, 'grp_a').select('grp_a', 'grp_b', 'h', 'in_a',
                                       F.lit(0).alias('in_b'))
    ub = pairs.join(b, 'grp_b').select('grp_a', 'grp_b', 'h',
                                       F.lit(0).alias('in_a'), 'in_b')
    merged = (
        ua.unionByName(ub)
        .groupBy('grp_a', 'grp_b', 'h')
        .agg(F.max('in_a').alias('in_a'), F.max('in_b').alias('in_b'))
        .withColumn('_r', F.row_number().over(
            Window.partitionBy('grp_a', 'grp_b').orderBy('h')))
        .filter(F.col('_r') <= k)
    )
    return (
        merged.groupBy('grp_a', 'grp_b')
        .agg(F.count('*').alias('n_merged'),
             F.sum(F.expr('in_a * in_b')).cast('long').alias('n_both'))
        .withColumn(
            'jaccard_ppm',
            F.expr('cast(cast(n_both as decimal(28,0)) * 1000000'
                   ' div cast(n_merged as decimal(19,0)) as bigint)'))
    )


def kmv_matrix_sql(value_expr: str, from_sql: str, group_expr: str,
                   k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_overlap_matrix` (full recompute)."""
    h = hash60_sql(value_expr)
    return f"""
WITH sk AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS r
    FROM (SELECT DISTINCT {group_expr} AS grp, {h} AS h FROM {from_sql}))
  WHERE r <= {k}),
pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
  WHERE a.grp < b.grp),
u AS (
  SELECT grp_a, grp_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
    SELECT p.grp_a, p.grp_b, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.grp = p.grp_a
    UNION ALL
    SELECT p.grp_a, p.grp_b, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.grp = p.grp_b)
  GROUP BY grp_a, grp_b, h),
m AS (
  SELECT * FROM (
    SELECT u.*, row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS r
    FROM u)
  WHERE r <= {k})
SELECT grp_a, grp_b, COUNT(*) AS n_merged,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
       CAST(CAST(SUM(in_a * in_b) AS HUGEINT) * 1000000 // COUNT(*)
            AS BIGINT) AS jaccard_ppm
FROM m GROUP BY grp_a, grp_b"""
