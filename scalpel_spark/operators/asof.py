"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key — the temporal lookup Spark has no builtin
for (SPARK-22947 never merged) and a crawl/curation store needs
constantly: which robots.txt snapshot governed this fetch, which capture
was live when this link was discovered, which host-rank table applied at
schedule time, which session a late event lands in.

The naive formulations both die at scale: a theta join
(``l.key = r.key AND r.ts <= l.t`` + max) explodes to left×right per key,
and a single ``Window.partitionBy(key)`` over the unioned sides puts a
hot key's entire history in one task. This implementation keeps the
union-and-carry-forward idea but decomposes every window by TIME-RANGE
BUCKET (the same discipline as ``quantiles``/``pack_sequences``):

1. tag and union both sides, bucket by ``range_bin(ts)`` (global min/max
   from one tiny aggregate — monotone, so bucket order == time order);
2. per ``(key, bucket)`` window (bounded span, never a key's whole
   history): running ``max`` of the right-row struct over
   ``(ts, side)`` order, right-before-left at equal ts ⇒ inclusive
   ``ts <= t`` semantics within the bucket;
3. cross-bucket fallback: per-(key, bucket) right bests carry forward
   through a second window ordered ``(bucket, side)`` with LEFT markers
   first — a left row in bucket b sees exactly the right bests of
   buckets < b; this frame holds at most one row per (key, bucket,
   side), metadata-scale relative to the inputs;
4. match = the struct-greater of (2) and (3); struct comparison is
   lexicographic on (ts, tiebreak...), so the result is deterministic.

Input contract: none on the right side — duplicate ``(key, ts)`` right
rows resolve DETERMINISTICALLY to the struct-greatest payload with no
extra work: both the within-bucket running ``max`` and the per-(key,
bucket) best aggregate range over every tied row, and struct comparison
is total, so whichever row the window happens to order first, the max is
the same. (An explicit pre-dedupe aggregate was measured at +45% on the
sf0.1 bench and removed — the windows already guarantee the property.)
Oracle note: DuckDB's native ``ASOF JOIN`` picks an ARBITRARY row on
ties, so the oracle SQL — not the operator — carries a ``GROUP BY (key,
ts) -> max(payload)`` pre-dedupe to pin the same tie-break; with that,
DuckDB remains a fully independent reference implementation of the
identical semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scalpel_spark.operators.layout import range_bin


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``matched_ts`` and the
    requested ``right_cols`` from the latest right row with
    ``right.{right_ts} <= left.{left_ts}`` and equal ``on`` key (NULLs
    when no prior right row exists).
    """
    rcols = list(right_cols)
    lcols = left.columns
    payload = F.struct(
        F.col(right_ts).alias('_mts'),
        *[F.col(c).alias(c) for c in rcols],
    )
    # ties on (key, ts) need no pre-dedupe: every window/aggregate below
    # takes max over ALL tied rows, so the struct-greatest payload wins
    # deterministically either way (see module docstring)
    r = right.select(
        F.col(on).alias('_k'), F.col(right_ts).alias('_ts'),
        payload.alias('_r'), F.lit(1).alias('_side'),
    )
    l = left.select(
        F.col(on).alias('_k'), F.col(left_ts).alias('_ts'),
        F.lit(None).cast(r.schema['_r'].dataType).alias('_r'),
        F.lit(2).alias('_side'), *lcols,
    )
    u = l.unionByName(r, allowMissingColumns=True)

    mm = u.agg(F.min('_ts').alias('_tmin'), F.max('_ts').alias('_tmax'))
    bits = max(1, (n_buckets - 1).bit_length())
    u = u.join(F.broadcast(mm)).withColumn(
        '_b', range_bin(F.col('_ts'), F.col('_tmin'), F.col('_tmax'), bits)
    ).drop('_tmin', '_tmax')

    # (2) within-bucket carry-forward: right (side 1) before left (side 2)
    # at equal ts makes the match inclusive
    w_in = (
        Window.partitionBy('_k', '_b').orderBy('_ts', '_side')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn('_in_best', F.max('_r').over(w_in))

    # (3) cross-bucket fallback: per-(key, bucket) right bests, carried to
    # left markers of LATER buckets (left side 0 sorts before right 1 at
    # the same bucket, so a bucket's own rights are excluded)
    rb = (
        u.filter(F.col('_side') == 1)
        .groupBy('_k', '_b').agg(F.max('_r').alias('_bb'))
        .select('_k', '_b', '_bb', F.lit(1).alias('_s'))
    )
    lb = (
        u.filter(F.col('_side') == 2)
        .select('_k', '_b').distinct()
        .select('_k', '_b', F.lit(None).cast(rb.schema['_bb'].dataType)
                .alias('_bb'), F.lit(0).alias('_s'))
    )
    w_carry = (
        Window.partitionBy('_k').orderBy('_b', '_s')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        rb.unionByName(lb)
        .withColumn('_carry', F.max('_bb').over(w_carry))
        .filter(F.col('_s') == 0)
        .select('_k', '_b', '_carry')
    )

    best = F.when(
        F.col('_in_best').isNull(), F.col('_carry')
    ).when(
        F.col('_carry').isNull(), F.col('_in_best')
    ).when(
        F.col('_in_best') >= F.col('_carry'), F.col('_in_best')
    ).otherwise(F.col('_carry'))

    return (
        u.filter(F.col('_side') == 2)
        .join(carry, ['_k', '_b'], 'left')
        .withColumn('_best', best)
        .select(
            *lcols,
            F.col('_best._mts').alias('matched_ts'),
            *[F.col(f'_best.{c}').alias(f'r_{c}') for c in rcols],
        )
    )


def asof_next_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Forward as-of join: the EARLIEST right row with
    ``right.{right_ts} >= left.{left_ts}`` per key — "which capture
    superseded this one", "the first fetch after the robots change".

    Implemented by axis negation over :func:`asof_join` (min over
    ``ts >= t`` == max over ``-ts <= -t``), so every scale property —
    bucket decomposition, bounded windows, determinism — is inherited
    rather than re-proven. Ties among equal timestamps resolve by the
    struct-greatest payload, same as the backward join.
    """
    nl = left.withColumn('_fwd_t', -F.col(left_ts))
    nr = right.select(
        F.col(on), (-F.col(right_ts)).alias('_fwd_ts'),
        *[F.col(c) for c in right_cols],
    )
    out = asof_join(nl, nr, on=on, left_ts='_fwd_t', right_ts='_fwd_ts',
                    right_cols=list(right_cols), n_buckets=n_buckets)
    return (
        out.withColumn('matched_ts', -F.col('matched_ts'))
        .drop('_fwd_t')
    )
