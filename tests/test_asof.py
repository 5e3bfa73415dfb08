"""As-of join: brute-force parity, inclusive-ts semantics, bucket-count
invariance, and no-prior-match nulls."""

from __future__ import annotations

import random


def _brute(left, right, key_i=0, ts_i=1):
    out = {}
    for lrow in left:
        cands = [r for r in right if r[0] == lrow[0] and r[1] <= lrow[1]]
        out[(lrow[0], lrow[1])] = max(cands, key=lambda r: r[1]) if cands else None
    return out


def test_asof_matches_bruteforce_across_bucket_counts(spark):
    from scalpel_spark.operators.asof import asof_join

    rng = random.Random(5)
    left = [(f'h{rng.randint(0, 4)}', rng.randint(0, 1000)) for _ in range(120)]
    right = list({(f'h{rng.randint(0, 5)}', rng.randint(0, 1000))
                  for _ in range(90)})
    right = [(k, t, t * 10 + hash(k) % 7) for k, t in right]
    want = _brute(left, right)

    ldf = spark.createDataFrame(left, 'host STRING, t LONG')
    rdf = spark.createDataFrame(right, 'host STRING, ts LONG, val LONG')
    for nb in (1, 4, 64):
        got = asof_join(ldf, rdf, on='host', left_ts='t', right_ts='ts',
                        right_cols=['val'], n_buckets=nb).collect()
        assert len(got) == len(left)
        for r in got:
            w = want[(r['host'], r['t'])]
            if w is None:
                assert r['matched_ts'] is None and r['r_val'] is None, r
            else:
                assert r['matched_ts'] == w[1] and r['r_val'] == w[2], (r, w)


def test_asof_equal_ts_is_inclusive_and_no_prior_is_null(spark):
    from scalpel_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [('a', 10), ('a', 5), ('b', 3)], 'host STRING, t LONG')
    rdf = spark.createDataFrame(
        [('a', 10, 1), ('a', 7, 2), ('b', 4, 3)], 'host STRING, ts LONG, val LONG')
    got = {(r['host'], r['t']): (r['matched_ts'], r['r_val'])
           for r in asof_join(ldf, rdf, on='host', left_ts='t',
                              right_ts='ts', right_cols=['val']).collect()}
    assert got[('a', 10)] == (10, 1)      # equal ts matches
    assert got[('a', 5)] == (None, None)  # nothing at or before 5
    assert got[('b', 3)] == (None, None)  # right exists only later


def test_asof_left_rows_and_columns_preserved(spark):
    from scalpel_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [('a', 10, 'x'), ('a', 10, 'y')], 'host STRING, t LONG, tag STRING')
    rdf = spark.createDataFrame([('a', 1, 9)], 'host STRING, ts LONG, val LONG')
    got = asof_join(ldf, rdf, on='host', left_ts='t', right_ts='ts',
                    right_cols=['val']).collect()
    assert sorted(r['tag'] for r in got) == ['x', 'y']  # duplicates kept
    assert all(r['r_val'] == 9 for r in got)


def test_asof_next_join_forward_semantics(spark):
    from scalpel_spark.operators.asof import asof_next_join

    ldf = spark.createDataFrame(
        [('a', 10), ('a', 4), ('b', 99)], 'host STRING, t LONG')
    rdf = spark.createDataFrame(
        [('a', 10, 1), ('a', 7, 2), ('a', 20, 3), ('b', 4, 9)],
        'host STRING, ts LONG, val LONG')
    got = {(r['host'], r['t']): (r['matched_ts'], r['r_val'])
           for r in asof_next_join(ldf, rdf, on='host', left_ts='t',
                                   right_ts='ts',
                                   right_cols=['val']).collect()}
    assert got[('a', 10)] == (10, 1)       # equal ts matches (inclusive)
    assert got[('a', 4)] == (7, 2)         # earliest at-or-after
    assert got[('b', 99)] == (None, None)  # nothing later


def test_asof_next_matches_bruteforce(spark):
    import random

    from scalpel_spark.operators.asof import asof_next_join

    rng = random.Random(13)
    left = [(f'h{rng.randint(0, 3)}', rng.randint(0, 300)) for _ in range(80)]
    right = [(k, t, t * 3 + 1) for k, t in
             {(f'h{rng.randint(0, 3)}', rng.randint(0, 300))
              for _ in range(60)}]
    want = {}
    for k, t in left:
        cands = [r for r in right if r[0] == k and r[1] >= t]
        want[(k, t)] = min(cands, key=lambda r: r[1]) if cands else None
    ldf = spark.createDataFrame(left, 'host STRING, t LONG')
    rdf = spark.createDataFrame(right, 'host STRING, ts LONG, val LONG')
    got = asof_next_join(ldf, rdf, on='host', left_ts='t', right_ts='ts',
                         right_cols=['val'], n_buckets=8).collect()
    for r in got:
        w = want[(r['host'], r['t'])]
        if w is None:
            assert r['matched_ts'] is None and r['r_val'] is None
        else:
            assert (r['matched_ts'], r['r_val']) == (w[1], w[2])


def test_asof_right_side_ties_dedupe_deterministically(spark):
    """ADVICE r4 asof.py:29: duplicate (key, ts) right rows must not
    make the match depend on implementation tie-breaking — the operator
    dedupes to the struct-greatest payload internally, so the result is
    a pure function of the input sets (matches the GROUP BY max() the
    DuckDB ASOF oracle now applies)."""
    from scalpel_spark.operators.asof import asof_join, asof_next_join

    ldf = spark.createDataFrame([('k', 10)], 'host STRING, t LONG')
    rdf = spark.createDataFrame(
        [('k', 5, 'aaa'), ('k', 5, 'zzz'), ('k', 5, 'mmm')],
        'host STRING, ts LONG, val STRING')
    for _ in range(3):  # stable across repeated plans
        (row,) = asof_join(ldf, rdf, on='host', left_ts='t', right_ts='ts',
                           right_cols=['val']).collect()
        assert (row['matched_ts'], row['r_val']) == (5, 'zzz')
    (row,) = asof_next_join(
        spark.createDataFrame([('k', 3)], 'host STRING, t LONG'),
        rdf, on='host', left_ts='t', right_ts='ts',
        right_cols=['val']).collect()
    assert (row['matched_ts'], row['r_val']) == (5, 'zzz')
