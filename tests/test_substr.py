"""ExactSubstr-style duplicated-run detection (operators/substr.py).

Reference method: Lee et al. 2022 §4.1 (suffix-array ExactSubstr); this
is the fixed-width window-hash re-expression. The invariant under test:
every duplicated run of length >= window_tokens is covered exactly, runs
shorter than the window are invisible, and the strike preserves every
uncovered token in order.
"""

import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators import substr

W = 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, 'doc_id long, text string')


def _out(spark, rows, **kw):
    kw.setdefault('window_tokens', W)
    df = substr.strike_dup_substrings(_docs(spark, rows), **kw)
    return {r['doc_id']: r.asDict() for r in df.collect()}


def test_cross_doc_run_struck_from_both(spark):
    run = ' '.join(f't{i}' for i in range(10))
    out = _out(spark, [(0, run + ' x1 y1 z1'), (1, 'p q ' + run + ' r s')])
    assert out[0]['dup_tokens'] == 10 and out[0]['clean_text'] == 'x1 y1 z1'
    assert out[1]['dup_tokens'] == 10 and out[1]['clean_text'] == 'p q r s'
    assert out[0]['dup_ppm'] == 10 * 1_000_000 // 13


def test_within_doc_repeat_counts_as_duplicated(spark):
    run = ' '.join(f'm{i}' for i in range(W))
    out = _out(spark, [(0, f'{run} mid {run}')])
    # both copies struck, the unique bridge token survives
    assert out[0]['dup_tokens'] == 2 * W
    assert out[0]['clean_text'] == 'mid'


def test_runs_shorter_than_window_are_invisible(spark):
    short = 'a b c d e f g'  # 7 tokens < W
    out = _out(spark, [(0, short + ' u1 u2'), (1, short + ' v1 v2')])
    assert out[0]['dup_tokens'] == 0 and out[1]['dup_tokens'] == 0
    assert out[0]['clean_text'] == short + ' u1 u2'


def test_doc_shorter_than_window_passes_through(spark):
    out = _out(spark, [(0, 'tiny doc'), (1, 'tiny doc')])
    assert out[0] == {'doc_id': 0, 'n_tokens': 2, 'dup_tokens': 0,
                      'dup_ppm': 0, 'clean_text': 'tiny doc'}


def test_overlapping_windows_merge_to_one_island(spark):
    # a 12-token shared run = 5 overlapping windows -> ONE island of 12,
    # not 5*W double-counted tokens
    run = ' '.join(f'r{i}' for i in range(12))
    out = _out(spark, [(0, run), (1, 'x ' + run)])
    assert out[0]['dup_tokens'] == 12
    assert out[0]['clean_text'] == ''
    assert out[1]['clean_text'] == 'x'


def test_disjoint_runs_sum_independently(spark):
    a = ' '.join(f'a{i}' for i in range(W))
    b = ' '.join(f'b{i}' for i in range(W))
    out = _out(spark, [(0, f'{a} gap1 gap2 {b}'), (1, a), (2, b)])
    assert out[0]['dup_tokens'] == 2 * W
    assert out[0]['clean_text'] == 'gap1 gap2'


def test_min_count_three_requires_three_occurrences(spark):
    run = ' '.join(f'c{i}' for i in range(W))
    rows = [(0, run + ' s0'), (1, run + ' s1')]
    assert _out(spark, rows, min_count=3)[0]['dup_tokens'] == 0
    rows.append((2, run + ' s2'))
    out3 = _out(spark, rows, min_count=3)
    assert all(out3[d]['dup_tokens'] == W for d in (0, 1, 2))


def test_positions_and_islands_shapes(spark):
    run = ' '.join(f'd{i}' for i in range(W + 1))  # 2 windows, 1 island
    docs = _docs(spark, [(0, run), (1, run)])
    pos = substr.dup_window_positions(docs, window_tokens=W).collect()
    assert sorted((r['doc_id'], r['pos'], r['end']) for r in pos) == [
        (0, 0, 8), (0, 1, 9), (1, 0, 8), (1, 1, 9)]
    isl = substr.dup_islands(
        substr.dup_window_positions(docs, window_tokens=W)).collect()
    assert sorted((r['doc_id'], r['start'], r['end']) for r in isl) == [
        (0, 0, 9), (1, 0, 9)]


def test_plan_stays_jvm(spark):
    docs = _docs(spark, [(0, 'a b'), (1, 'c d')])
    plan = substr.strike_dup_substrings(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan


# ---------------------------------------------------------------------------
# ngram_novelty: memorization-risk scoring
# ---------------------------------------------------------------------------


def test_ngram_novelty_scores(spark):
    from scalpel_spark.operators.substr import ngram_novelty

    boiler = 'b1 b2 b3 b4 b5 b6 b7 b8'           # one shared 8-gram
    docs = spark.createDataFrame(
        [
            (0, boiler + ' u1 u2 u3 u4'),        # shares the boiler window
            (1, boiler + ' v1 v2 v3 v4'),        # shares it too
            (2, 'w1 w2 w3 w4 w5 w6 w7 w8 w9'),   # fully novel, 2 windows
            (3, 'short doc'),                    # no windows at all
        ],
        'doc_id LONG, text STRING',
    )
    out = {r['doc_id']: r for r in
           ngram_novelty(docs, window_tokens=8, min_count=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    # docs 0/1: 5 windows each, exactly the first (pure-boiler) window is
    # shared between them
    assert out[0]['n_windows'] == 5 and out[0]['n_dup_windows'] == 1
    assert out[0]['novelty_ppm'] == 4 * 1_000_000 // 5
    assert out[1]['n_dup_windows'] == 1
    assert out[2]['n_dup_windows'] == 0
    assert out[2]['novelty_ppm'] == 1_000_000
    assert out[3]['n_windows'] == 0 and out[3]['novelty_ppm'] == 1_000_000


def test_ngram_novelty_within_doc_repeat_counts(spark):
    from scalpel_spark.operators.substr import ngram_novelty

    rep = ' '.join(['r'] * 16)  # 16 identical tokens: every 8-gram equal
    docs = spark.createDataFrame([(0, rep)], 'doc_id LONG, text STRING')
    out = ngram_novelty(docs, window_tokens=8, min_count=2).collect()[0]
    assert out['n_windows'] == 9 and out['n_dup_windows'] == 9
    assert out['novelty_ppm'] == 0
