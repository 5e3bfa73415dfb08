"""DSIR importance weighting and rank selection
(`scalpel_spark/operators/selection.py`) + the exact integer log2
fixed-point it is built on.
"""

import math

from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import log2_milli_expr
from scalpel_spark.operators.selection import dsir_select, dsir_weights


def _df(spark, rows):
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_log2_milli_exact_and_bounded(spark):
    vals = [1, 2, 3, 7, 8, 1000, 4095, 4096, 123456789, 2 ** 40 + 12345]
    df = spark.createDataFrame([(v,) for v in vals], 'v long')
    got = {r['v']: r['l'] for r in df.select(
        'v', F.expr(log2_milli_expr('v')).alias('l')).collect()}
    for v in vals:
        assert abs(got[v] / 1000 - math.log2(v)) < 0.0861, (v, got[v])
    # exact on powers of two
    assert got[8] == 3000 and got[4096] == 12000 and got[1] == 0


def test_dsir_weights_favor_target_like_docs(spark):
    target = _df(spark, [(100, 'spark shuffle join spark shuffle join')])
    corpus = _df(spark, [
        (0, 'spark shuffle join spark shuffle join'),   # = target
        (1, 'cat dog fish cat dog fish'),               # disjoint
    ])
    w = {r['doc_id']: r['dsir_milli']
         for r in dsir_weights(corpus, target, n_buckets=64).collect()}
    assert w[0] > w[1]


def test_dsir_weights_deterministic_and_feature_counts(spark):
    corpus = _df(spark, [(i, f'tok{i} alpha beta gamma') for i in range(20)])
    target = _df(spark, [(99, 'alpha beta gamma alpha')])
    a = sorted(tuple(r) for r in dsir_weights(corpus, target).collect())
    b = sorted(tuple(r) for r in dsir_weights(corpus, target).collect())
    assert a == b
    # every doc has 3 bigrams
    assert all(r[1] == 3 for r in a)


def test_dsir_short_docs_emit_no_features(spark):
    corpus = _df(spark, [(0, 'single'), (1, 'two tokens here')])
    target = _df(spark, [(9, 'two tokens')])
    out = dsir_weights(corpus, target).collect()
    assert sorted(r['doc_id'] for r in out) == [1]


def test_dsir_select_keeps_top_fraction_with_tiebreak(spark):
    # 10 docs: 5 target-like, 5 junk → keep_fraction=0.5 keeps the 5 alike
    alike = [(i, 'spark shuffle join window agg') for i in range(5)]
    junk = [(10 + i, f'zzz{i} yyy{i} xxx{i} www{i} vvv{i}') for i in range(5)]
    corpus = _df(spark, alike + junk)
    # target must carry real evidence: with a 1-doc target the add-one
    # smoothing legitimately dominates lambda and rare junk outranks it
    target = _df(spark, [(90 + i, 'spark shuffle join window agg')
                         for i in range(10)])
    kept = sorted(r['doc_id'] for r in
                  dsir_select(corpus, target, 0.5, n_buckets=256).collect())
    assert kept == [0, 1, 2, 3, 4]


def test_dsir_select_fraction_floor(spark):
    corpus = _df(spark, [(i, f'alpha beta w{i}') for i in range(7)])
    target = _df(spark, [(9, 'alpha beta')])
    assert dsir_select(corpus, target, 0.5).count() == 3  # floor(7*0.5)


# ---------------------------------------------------------------------------
# source_drift_matrix: exact-integer Jeffreys divergence between sources
# ---------------------------------------------------------------------------


def _drift_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, 'en', s, len(t)) for i, (s, t) in enumerate(rows)],
        'doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG')


def test_drift_zero_for_identical_distributions(spark):
    from scalpel_spark.operators.selection import source_drift_matrix

    text = 'spark table scan join filter group'
    docs = _drift_docs(spark, [('a', text), ('b', text)] * 3)
    out = source_drift_matrix(docs, n_buckets=64).collect()
    assert len(out) == 1
    assert out[0]['src_a'] == 'a' and out[0]['src_b'] == 'b'
    assert out[0]['jeffreys_pico'] == 0


def test_drift_detects_shifted_source_and_is_nonnegative(spark):
    from scalpel_spark.operators.selection import source_drift_matrix

    same = 'the quick brown fox jumps over the lazy dog again and again'
    spam = 'buy cheap pills now buy cheap pills now buy cheap pills now'
    docs = _drift_docs(spark, [('a', same)] * 4 + [('b', same)] * 4
                       + [('c', spam)] * 4)
    got = {(r['src_a'], r['src_b']): r['jeffreys_pico']
           for r in source_drift_matrix(docs, n_buckets=64).collect()}
    assert set(got) == {('a', 'b'), ('a', 'c'), ('b', 'c')}
    assert got[('a', 'b')] == 0
    assert got[('a', 'c')] > 0 and got[('b', 'c')] > 0
    assert got[('a', 'c')] == got[('b', 'c')]  # same content -> same drift
    assert all(v >= 0 for v in got.values())


def test_drift_smoothing_sees_total_size_difference(spark):
    from scalpel_spark.operators.selection import source_drift_matrix

    # same shape, very different totals: smoothing mass differs, so the
    # drift is small but nonzero — and must not crash on empty buckets
    text = 'alpha beta gamma delta'
    docs = _drift_docs(spark, [('a', text)] * 1 + [('b', text)] * 8)
    out = source_drift_matrix(docs, n_buckets=32).collect()
    assert len(out) == 1 and out[0]['jeffreys_pico'] >= 0
