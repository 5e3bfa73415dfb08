"""Interval join: brute-force parity, narrow/wide split, width
invariance, overlap multiplicity, empty intervals."""

from __future__ import annotations

import random


def _brute(points, intervals):
    return sorted(
        (p, lo, hi, tag)
        for p in points
        for lo, hi, tag in intervals
        if lo <= p <= hi
    )


def test_interval_join_matches_bruteforce_any_width(spark):
    from scalpel_spark.operators.ranges import interval_join

    rng = random.Random(9)
    points = [rng.randint(0, 500) for _ in range(150)]
    intervals = []
    for i in range(40):
        lo = rng.randint(0, 480)
        intervals.append((lo, lo + rng.randint(0, 30), f'iv{i}'))
    intervals.append((0, 500, 'whole'))  # a wide interval covering all
    want = _brute(points, intervals)

    pdf = spark.createDataFrame([(p,) for p in points], 'p LONG')
    idf = spark.createDataFrame(intervals, 'lo LONG, hi LONG, tag STRING')
    for width in (None, 1, 7, 100):
        got = sorted(
            (r['p'], r['lo'], r['hi'], r['tag'])
            for r in interval_join(pdf, idf, 'p', 'lo', 'hi',
                                   bucket_width=width,
                                   wide_buckets=8).collect()
        )
        assert got == want, width


def test_empty_and_degenerate_intervals(spark):
    from scalpel_spark.operators.ranges import interval_join

    pdf = spark.createDataFrame([(5,), (6,)], 'p LONG')
    idf = spark.createDataFrame(
        [(5, 5, 'pt'), (7, 3, 'empty')], 'lo LONG, hi LONG, tag STRING')
    got = [(r['p'], r['tag']) for r in
           interval_join(pdf, idf, 'p', 'lo', 'hi').collect()]
    assert got == [(5, 'pt')]  # point interval matches; inverted never


def test_point_matches_multiple_overlapping_intervals(spark):
    from scalpel_spark.operators.ranges import interval_join

    pdf = spark.createDataFrame([(10,)], 'p LONG')
    idf = spark.createDataFrame(
        [(0, 20, 'a'), (5, 15, 'b'), (11, 12, 'c')],
        'lo LONG, hi LONG, tag STRING')
    got = sorted(r['tag'] for r in
                 interval_join(pdf, idf, 'p', 'lo', 'hi',
                               bucket_width=4).collect())
    assert got == ['a', 'b']


def test_eager_probe_opt_out_same_result(spark):
    """ADVICE r4 ranges.py:82: eager_probe=False must skip the call-time
    wide probe (plan carries both branches) yet return identical rows —
    including when wide intervals exist."""
    from scalpel_spark.operators.ranges import interval_join

    pdf = spark.createDataFrame([(i,) for i in range(0, 200, 7)], 'p LONG')
    idf = spark.createDataFrame(
        [(0, 500, 'wide'), (10, 14, 'a'), (100, 120, 'b')],
        'lo LONG, hi LONG, tag STRING')
    kw = dict(point_col='p', lo_col='lo', hi_col='hi', bucket_width=8,
              wide_buckets=4)
    eager = sorted((r['p'], r['tag']) for r in
                   interval_join(pdf, idf, **kw).collect())
    lazy = sorted((r['p'], r['tag']) for r in
                  interval_join(pdf, idf, eager_probe=False, **kw).collect())
    assert eager == lazy and len(eager) > 20
