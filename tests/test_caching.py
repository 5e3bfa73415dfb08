"""RFC 9111 freshness precedence ladder and decision boundaries."""

from __future__ import annotations

from scalpel_spark.operators.caching import cache_freshness

SCHEMA = ('url STRING, fetched_us LONG, cache_control STRING, '
          'date_us LONG, expires_us LONG, last_modified_us LONG')

S = 1_000_000  # one second in µs


def _run(spark, rows, now_us):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r['url']: r for r in cache_freshness(df, now_us).collect()}


def test_precedence_ladder(spark):
    t0 = 1000 * S
    rows = [
        # no-store wins over everything
        ('a', t0, 'no-store, max-age=600', t0, t0 + 900 * S, t0 - 100 * S),
        # no-cache zeroes lifetime too
        ('b', t0, 'public, no-cache', t0, t0 + 900 * S, None),
        # max-age beats Expires
        ('c', t0, 'max-age=300', t0, t0 + 900 * S, None),
        # Expires - Date
        ('d', t0, 'public', t0, t0 + 900 * S, None),
        # heuristic: 10% of Date - Last-Modified (1000 s -> 100 s)
        ('e', t0, None, t0, None, t0 - 1000 * S),
        # nothing declared -> 0
        ('f', t0, None, None, None, None),
    ]
    out = _run(spark, rows, now_us=t0 + 1)
    assert out['a']['lifetime_us'] == 0 and out['a']['no_store']
    assert out['b']['lifetime_us'] == 0 and not out['b']['no_store']
    assert out['c']['lifetime_us'] == 300 * S
    assert out['d']['lifetime_us'] == 900 * S
    assert out['e']['lifetime_us'] == 100 * S
    assert out['f']['lifetime_us'] == 0
    assert out['c']['decision'] == 'fresh'
    assert out['a']['decision'] == 'revalidate'
    assert out['f']['decision'] == 'revalidate'


def test_past_expires_clamps_to_zero_and_boundary_is_strict(spark):
    t0 = 1000 * S
    rows = [
        ('past', t0, None, t0, t0 - 600 * S, None),    # Expires in the past
        ('edge', t0, 'max-age=10', None, None, None),  # fresh_until == now
    ]
    out = _run(spark, rows, now_us=t0 + 10 * S)
    assert out['past']['lifetime_us'] == 0
    # fresh_until == now -> NOT fresh (strict >)
    assert out['edge']['fresh_until_us'] == t0 + 10 * S
    assert out['edge']['decision'] == 'revalidate'
    out2 = _run(spark, rows, now_us=t0 + 10 * S - 1)
    assert out2['edge']['decision'] == 'fresh'
