"""Exact distributed quantiles: type-1 semantics vs a pure-Python oracle,
bucket-count invariance, tie/degenerate handling, and the outlier gate."""

from __future__ import annotations

import math

import pytest

from scalpel_spark.operators import quantiles


def _py_quantile(values, p_ppm):
    """The spec: smallest value whose cumulative count reaches
    ceil(p_ppm * n / 1e6)."""
    vs = sorted(values)
    rank = -(-p_ppm * len(vs) // 1_000_000)  # ceil without floats
    return vs[rank - 1]


def _df(spark, rows):
    return spark.createDataFrame(rows, 'g STRING, v DOUBLE')


def test_matches_python_oracle(spark):
    import random

    rng = random.Random(7)
    rows = [('a', float(rng.randint(0, 50))) for _ in range(300)]
    rows += [('b', rng.uniform(-5, 5)) for _ in range(173)]
    probs = (1, 250_000, 500_000, 750_000, 999_999, 1_000_000)
    got = {
        (r['g'], r['p_ppm']): r['q_value']
        for r in quantiles.exact_quantiles(
            _df(spark, rows), 'v', ['g'], probs_ppm=probs).collect()
    }
    by_g = {'a': [v for g, v in rows if g == 'a'],
            'b': [v for g, v in rows if g == 'b']}
    assert len(got) == 2 * len(probs)
    for g, vals in by_g.items():
        for p in probs:
            assert got[(g, p)] == _py_quantile(vals, p), (g, p)


def test_bucket_count_invariance(spark):
    import random

    rng = random.Random(11)
    rows = [('x', float(rng.randint(0, 9))) for _ in range(500)]  # heavy ties
    outs = [
        sorted(
            (r['g'], r['p_ppm'], r['q_value'], r['n_rows'])
            for r in quantiles.exact_quantiles(
                _df(spark, rows), 'v', ['g'], n_buckets=nb).collect()
        )
        for nb in (1, 4, 64, 256)
    ]
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_degenerate_all_equal_and_nulls(spark):
    rows = [('g', 3.0)] * 8 + [('g', None)] * 3
    out = quantiles.exact_quantiles(
        _df(spark, rows), 'v', ['g'], probs_ppm=(500_000, 1_000_000)).collect()
    assert {(r['p_ppm'], r['q_value'], r['n_rows']) for r in out} == {
        (500_000, 3.0, 8), (1_000_000, 3.0, 8)}


def test_exact_is_exact_where_approx_is_not(spark):
    # median of 1..1001 is exactly 501; the sketch has rank error, the
    # exact operator must not.
    rows = [('g', float(i)) for i in range(1, 1002)]
    out = quantiles.exact_quantiles(
        _df(spark, rows), 'v', ['g'], probs_ppm=(500_000,)).collect()
    assert out[0]['q_value'] == 501.0


def test_invalid_probs_raise(spark):
    with pytest.raises(ValueError):
        quantiles.exact_quantiles(_df(spark, [('g', 1.0)]), 'v', ['g'],
                                  probs_ppm=(0,))
    with pytest.raises(ValueError):
        quantiles.exact_quantiles(_df(spark, [('g', 1.0)]), 'v', ['g'],
                                  probs_ppm=(1_000_001,))


def test_quantile_gate_bands_per_group(spark):
    rows = [('en', float(i)) for i in range(1, 101)]  # 1..100
    rows += [('fr', float(i)) for i in range(1, 11)]  # 1..10
    docs = spark.createDataFrame(
        [(f'{g}-{v}', g, v) for g, v in rows], 'doc_id STRING, lang STRING, v DOUBLE')
    out = quantiles.quantile_gate(docs, 'v', ['lang'],
                                  low_ppm=100_000, high_ppm=900_000)
    rows_out = {r['doc_id']: r for r in out.collect()}
    # en: p10 = ceil(0.1*100)=rank 10 -> 10.0 ; p90 -> rank 90 -> 90.0
    assert rows_out['en-55.0']['keep']
    assert not rows_out['en-5.0']['keep']
    assert not rows_out['en-95.0']['keep']
    assert rows_out['en-10.0']['keep'] and rows_out['en-90.0']['keep']
    # fr band computed independently: rank 1 -> 1.0, rank 9 -> 9.0
    assert rows_out['fr-9.0']['keep'] and not rows_out['fr-10.0']['keep']
    # gate is metadata-preserving: one row per input doc
    assert out.count() == docs.count()


def test_matches_spec_with_math_ceil(spark):
    # cross-check the integer ceil against math.ceil on awkward n/p pairs
    rows = [('g', float(i)) for i in range(7)]  # n = 7
    for p in (142_857, 142_858, 857_142, 857_143):
        out = quantiles.exact_quantiles(
            _df(spark, rows), 'v', ['g'], probs_ppm=(p,)).collect()
        rank = math.ceil(p * 7 / 1_000_000)
        assert out[0]['q_value'] == float(rank - 1)
