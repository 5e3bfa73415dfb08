"""Redirect-chain resolution (operators/redirects.py): binary-lifted
walks, exact hop counts at non-power-of-two caps, loop safety."""

import pytest

from scalpel_spark.operators.redirects import lifted_map, resolve_redirects


def _chain_edges(spark, n):
    """u0 <- u1 <- ... <- u{n}: ui redirects to u{i-1}; u0 terminal."""
    return spark.createDataFrame(
        [(f'u{i}', f'u{i - 1}') for i in range(1, n + 1)], 'src string, dst string')


def _resolve(spark, edges, urls, max_hops):
    udf_ = spark.createDataFrame([(u,) for u in urls], 'url string')
    return {
        r['url']: (r['final_url'], r['hops'], r['redirect_status'])
        for r in resolve_redirects(udf_, edges, max_hops=max_hops).collect()
    }


def test_chain_resolves_with_exact_hops(spark):
    got = _resolve(spark, _chain_edges(spark, 5), ['u0', 'u1', 'u3', 'u5'], 8)
    assert got == {
        'u0': ('u0', 0, 'direct'),
        'u1': ('u0', 1, 'resolved'),
        'u3': ('u0', 3, 'resolved'),
        'u5': ('u0', 5, 'resolved'),
    }


@pytest.mark.parametrize('max_hops', [1, 2, 3, 6, 7])
def test_non_power_of_two_cap_is_exact(spark, max_hops):
    """A 12-long chain under cap h must stop at EXACTLY min(12, h) hops —
    the binary decomposition may not overshoot or undershoot."""
    got = _resolve(spark, _chain_edges(spark, 12), ['u12'], max_hops)
    final, hops, status = got['u12']
    assert hops == max_hops
    assert final == f'u{12 - max_hops}'
    assert status == ('resolved' if max_hops >= 12 else 'unresolved')


def test_cap_at_or_past_chain_length_resolves(spark):
    got = _resolve(spark, _chain_edges(spark, 12), ['u12'], 12)
    assert got['u12'] == ('u0', 12, 'resolved')
    got = _resolve(spark, _chain_edges(spark, 12), ['u12'], 15)
    assert got['u12'] == ('u0', 12, 'resolved')


def test_self_loop_and_two_cycle_are_unresolved(spark):
    edges = spark.createDataFrame(
        [('a', 'a'), ('b', 'c'), ('c', 'b'), ('d', 'b')], 'src string, dst string')
    got = _resolve(spark, edges, ['a', 'b', 'd', 'x'], 4)
    assert got['a'] == ('a', 4, 'unresolved')
    assert got['b'][1:] == (4, 'unresolved')
    assert got['b'][0] == 'b'   # even number of hops around a 2-cycle
    assert got['d'][0] == 'c'   # d -> b -> c -> b -> c
    assert got['d'][1:] == (4, 'unresolved')
    assert got['x'] == ('x', 0, 'direct')


def test_chain_into_loop(spark):
    """A tail that enters a cycle never resolves regardless of cap."""
    edges = spark.createDataFrame(
        [('t', 'p'), ('p', 'q'), ('q', 'p')], 'src string, dst string')
    for cap in (3, 8):
        got = _resolve(spark, edges, ['t'], cap)
        assert got['t'][2] == 'unresolved'
        assert got['t'][1] == cap


def test_lifted_map_join_count_is_logarithmic(spark):
    """The physical plan must contain O(log h) joins, not O(h): cap 31
    (= 11111b) needs 4 doublings + 4 compositions = 8 joins, far below 31."""
    edges = _chain_edges(spark, 3)
    plan = lifted_map(edges, 31)._jdf.queryExecution().optimizedPlan().toString()
    n_joins = plan.count('Join ')
    assert n_joins <= 10, f'{n_joins} joins for cap 31'


def test_rejects_bad_cap(spark):
    with pytest.raises(ValueError):
        lifted_map(_chain_edges(spark, 1), 0)
