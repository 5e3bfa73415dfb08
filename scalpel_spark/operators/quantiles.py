"""Exact distributed quantiles — no global sort, no approximation.

The reference engine records per-fetch timings and derives only a mean
(`core/spider.py:144`); a crawl operator at scale needs tail latencies
(p95/p99 per host feed the politeness budget, SLO alerts, and the
latency-aware scheduler in ``operators/scheduling.latency_budget``).
Spark's built-in ``percentile_approx`` is a sketch — fine for dashboards,
unusable when the number must be reproducible (oracle checks, pinned
SLO thresholds, selection gates that feed dedup decisions).

This module computes **exact type-1 (inverse-CDF) quantiles** with a plan
that survives 10^10 rows:

1. ``groupBy(group, value).count()`` — ONE hash shuffle; everything after
   operates on distinct ``(group, value)`` rows (bounded by the value
   domain, not the row count).
2. Per-group ``(min, max, n)`` — a partial aggregate, one row per group,
   broadcast back.
3. The cumulative count is decomposed over **value-range buckets**
   (``floor((v - min) / span * n_buckets)``): per-(group, bucket) windows
   run in parallel and a groups×n_buckets cross-bucket offset aggregate
   stitches them — no single per-group window task, the same
   decomposition as ``curation.pack_sequences``. Bucketing is monotone in
   ``v`` (IEEE multiply/divide by positive constants preserves order), so
   the result is provably independent of ``n_buckets``.
4. A row answers probability ``p`` iff its cumulative range straddles the
   target rank ``ceil(p_ppm * n / 1e6)`` — evaluated map-side as an array
   ``filter`` over the probability literals, so only hit rows (≤ one per
   (group, p)) survive into the final projection.

Probabilities are **integer parts-per-million** end to end: the target
rank is ``(p_ppm * n + 999999) div 1_000_000`` in 64-bit integers — no
float rank math, bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_PROBS_PPM = (500_000, 900_000, 950_000, 990_000)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs_ppm: Sequence[int] = DEFAULT_PROBS_PPM,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact per-group type-1 quantiles of ``value_col``.

    Returns one row per (group, probability):
    ``(*group_cols, p_ppm LONG, q_value, n_rows LONG)`` where ``q_value``
    is the smallest value whose cumulative count reaches
    ``ceil(p_ppm * n / 1e6)`` (so ``p_ppm=1_000_000`` is the max,
    ``p_ppm -> 0`` approaches the min). NULL values are excluded from
    both the ranks and the totals.
    """
    probs = sorted(set(int(p) for p in probs_ppm))
    if not probs or probs[0] < 1 or probs[-1] > 1_000_000:
        raise ValueError(f'probs_ppm must be within [1, 1_000_000], got {probs_ppm}')
    groups = list(group_cols)
    v = F.col(value_col)

    counts = (
        df.filter(v.isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.count(F.lit(1)).alias('cnt'))
    )
    span = counts.groupBy(*groups).agg(
        F.min(value_col).alias('_vmin'),
        F.max(value_col).alias('_vmax'),
        F.sum('cnt').alias('n_rows'),
    )
    base = counts.join(F.broadcast(span), groups)

    # monotone value-range bucketing; degenerate span (all-equal) -> bucket 0
    width = (F.col('_vmax') - F.col('_vmin')).cast('double')
    raw = F.floor((v - F.col('_vmin')).cast('double') * n_buckets / width)
    base = base.withColumn(
        'bucket',
        F.when(width > 0, F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)))
        .otherwise(F.lit(0)).cast('long'),
    )

    w_in = (
        Window.partitionBy(*groups, 'bucket').orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn('cum_in', F.sum('cnt').over(w_in))

    w_b = (
        Window.partitionBy(*groups).orderBy('bucket')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_before = (
        base.groupBy(*groups, 'bucket').agg(F.sum('cnt').alias('bucket_cnt'))
        .withColumn('bucket_before',
                    F.coalesce(F.sum('bucket_cnt').over(w_b), F.lit(0)))
        .select(*groups, 'bucket', 'bucket_before')
    )
    base = base.join(F.broadcast(bucket_before), [*groups, 'bucket'])
    cum = F.col('bucket_before') + F.col('cum_in')
    cum_before = cum - F.col('cnt')

    # map-side: which target ranks does this row's (cum_before, cum] cover?
    probs_arr = F.array(*[F.lit(p).cast('long') for p in probs])

    def rank_of(p):
        # exact 64-bit ceil-div inside the HOF lambda (F.expr cannot see
        # the lambda variable, and a bare `/` is double division — at
        # p*n > 2^53 the float rounds and the rank can be off by one):
        # subtract the remainder first, so the numerator is an exact
        # multiple of 1e6 (exact as a double up to ~5.7e17, i.e. n up to
        # ~5.7e11 rows) and the division is exact.
        x = p * F.col('n_rows') + 999_999
        return ((x - x % 1_000_000) / 1_000_000).cast('long')
    hits = F.filter(
        probs_arr, lambda p: (rank_of(p) > cum_before) & (rank_of(p) <= cum)
    )
    return (
        base.withColumn('p_ppm', F.explode(hits))
        .select(*groups, 'p_ppm', v.alias('q_value'), 'n_rows')
    )


def quantile_gate(
    docs: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    low_ppm: int = 50_000,
    high_ppm: int = 950_000,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group outlier gate: keep rows whose ``value_col`` lies within
    the group's exact [low_ppm, high_ppm] quantile band.

    The training-data use: drop documents whose length is in a language's
    extreme tails (truncation artifacts on the left, concatenation/spam
    artifacts on the right) with a *reproducible* threshold — the gate is
    a broadcast join of the per-group band (one row per group) onto the
    corpus, so the corpus itself is touched map-side only.

    Returns ``(*group_cols, <id/other cols...>, q_low, q_high, keep)``.
    """
    if not (1 <= low_ppm < high_ppm <= 1_000_000):
        raise ValueError(f'need 1 <= low_ppm < high_ppm <= 1e6, got {low_ppm}, {high_ppm}')
    groups = list(group_cols)
    q = exact_quantiles(docs, value_col, groups,
                        probs_ppm=(low_ppm, high_ppm), n_buckets=n_buckets)
    band = q.groupBy(*groups).agg(
        F.max(F.when(F.col('p_ppm') == low_ppm, F.col('q_value'))).alias('q_low'),
        F.max(F.when(F.col('p_ppm') == high_ppm, F.col('q_value'))).alias('q_high'),
    )
    v = F.col(value_col)
    return (
        docs.join(F.broadcast(band), groups, 'left')
        .withColumn(
            'keep',
            F.coalesce(
                v.isNotNull() & (v >= F.col('q_low')) & (v <= F.col('q_high')),
                F.lit(False),
            ),
        )
    )
