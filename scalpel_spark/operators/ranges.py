"""Interval (range) join: match points to the intervals containing them
— the lookup behind IP→ASN attribution (politeness by network owner, not
just by host — one operator can front thousands of vhosts on one /24),
port/latency band classification, and time-window tagging. Spark's only
native answer is a broadcast-nested-loop theta join (`p BETWEEN lo AND
hi`), which is quadratic the moment the interval side outgrows a
broadcast.

The decomposition (the standard "grid file" trick, expressed as
DataFrame algebra):

1. pick a bucket width ``w`` (default: the mean interval span, one tiny
   exact-integer aggregate) — buckets are ranges of the point domain;
2. split intervals by how many buckets they overlap:
   * **narrow** (≤ ``wide_buckets``): explode into one row per
     overlapped bucket — an equi-join key. Total explode volume is
     Σ span/w ≈ interval count when w tracks the span distribution;
   * **wide** (> ``wide_buckets``): by a counting argument there can
     only be few of them per covered region (their total span is
     bounded by the domain), so they go to a broadcast theta join;
3. points join narrow intervals on ``bucket`` (hash equi-join, shuffles
   only the two keyed sides) with an exact containment filter, union
   the broadcast wide matches.

Result = inner join: one row per (point, containing interval), exact,
order-free. The oracle is the plain SQL theta join — DuckDB evaluates
it directly at test scale, independently of the decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int | None = None,
    wide_buckets: int = 64,
    eager_probe: bool = True,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo_col <= point_col <= hi_col`` (integer domains; empty intervals
    ``lo > hi`` match nothing). Returns all point columns + all interval
    columns. ``bucket_width=None`` derives the width from the mean
    interval span (exact integer arithmetic, deterministic).

    EAGER EVALUATION NOTE (unusual for a DataFrame-returning combinator):
    two small Spark jobs can run AT CALL TIME, both against the
    interval side only — (a) the width-derivation aggregate when
    ``bucket_width is None``, and (b) a ``limit(1)`` probe for wide
    intervals so the common no-wide case plans a pure equi-join with no
    union/broadcast branch. Pass an explicit ``bucket_width`` to skip
    (a); pass ``eager_probe=False`` to skip (b) (the plan then always
    carries both branches — correct either way, just a wider plan).
    When any eager job runs, the filtered interval frame is persisted
    FOR THE DURATION OF THE CALL so the width aggregate and the wide
    probe share one materialization instead of re-running the interval
    lineage per job (ADVICE r4, ranges.py:82); it is unpersisted before
    returning, so the returned plan is pure recomputable lineage — no
    storage stays pinned across calls, and executor loss after the call
    cannot strand it (persist-not-localCheckpoint is deliberate: a
    localCheckpointed plan is non-recomputable and its blocks outlive
    the call). Intervals are the dimension side (ASN tables, latency
    bands) — materializing them briefly is metadata-scale next to the
    point side.
    """
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col))
    eager = bucket_width is None or eager_probe
    if eager:
        iv = iv.persist()
    if bucket_width is None:
        mm = iv.agg(
            F.greatest(
                F.lit(1),
                (F.sum(F.col(hi_col) - F.col(lo_col) + 1)
                 / F.count(F.lit(1))).cast('long'),
            ).alias('_w')
        ).collect()
        bucket_width = int(mm[0]['_w']) if mm and mm[0]['_w'] else 1
    w = int(bucket_width)
    if w < 1:
        raise ValueError(f'bucket_width must be >= 1, got {bucket_width}')

    lo_b = F.floor(F.col(lo_col) / w).cast('long')
    hi_b = F.floor(F.col(hi_col) / w).cast('long')
    n_b = hi_b - lo_b + 1
    narrow = (
        iv.filter(n_b <= wide_buckets)
        .withColumn('_bucket', F.explode(F.sequence(lo_b, hi_b)))
    )
    wide = iv.filter(n_b > wide_buckets)

    p = points.withColumn(
        '_bucket', F.floor(F.col(point_col) / w).cast('long'))
    contained = (F.col(point_col) >= F.col(lo_col)) & \
                (F.col(point_col) <= F.col(hi_col))
    narrow_hits = p.join(narrow, '_bucket').filter(contained).drop('_bucket')
    # the wide branch is a broadcast theta join; probe first (one tiny
    # job against the persisted interval side) so the common no-wide
    # case plans a pure equi-join
    no_wide = eager_probe and wide.limit(1).isEmpty()
    if eager:
        # call-scoped cache only: the returned plan recomputes lineage
        iv.unpersist(blocking=False)
    if no_wide:
        return narrow_hits
    return narrow_hits.unionByName(points.join(F.broadcast(wide), contained))
