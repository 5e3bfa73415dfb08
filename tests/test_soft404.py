"""Soft-404 detection (`operators/soft404.py`)."""

from __future__ import annotations

from scalpel_spark.operators import soft404

SCHEMA = 'url STRING, host STRING, status INT, text STRING'

ERR = 'Sorry, this page was not found.'


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r['url']: r for r in soft404.soft404_flags(df, **kw).collect()}


def test_template_learned_and_flagged(spark):
    rows = (
        [(f'http://h/a{i}', 'h', 200, ERR) for i in range(3)]
        + [('http://h/real', 'h', 200, 'Genuine article text.')]
    )
    out = _flags(spark, rows, min_paths=3)
    assert len(out) == 4
    for i in range(3):
        r = out[f'http://h/a{i}']
        assert r['is_soft404'] and r['template_paths'] == 3
    real = out['http://h/real']
    assert not real['is_soft404'] and real['template_paths'] is None


def test_below_min_paths_not_flagged(spark):
    rows = [(f'http://h/a{i}', 'h', 200, ERR) for i in range(2)]
    out = _flags(spark, rows, min_paths=3)
    assert not any(r['is_soft404'] for r in out.values())


def test_real_404_status_never_flagged(spark):
    # same body, but an honest 404: excluded from learning AND flagging
    rows = (
        [(f'http://h/a{i}', 'h', 200, ERR) for i in range(3)]
        + [('http://h/gone', 'h', 404, ERR)]
    )
    out = _flags(spark, rows, min_paths=3)
    gone = out['http://h/gone']
    # annotated with the learned template, but not a soft 404
    assert not gone['is_soft404'] and gone['template_paths'] == 3


def test_unique_error_article_not_flagged(spark):
    # a page ABOUT 404s: error phrasing, but no cross-path repetition
    rows = (
        [(f'http://h/u{i}', 'h', 200, f'error 404 essay number {i}')
         for i in range(5)]
    )
    out = _flags(spark, rows, min_paths=3)
    assert not any(r['is_soft404'] for r in out.values())


def test_repeated_benign_template_not_flagged(spark):
    # site chrome repeated across paths, but no error phrasing
    rows = [(f'http://h/p{i}', 'h', 200, 'Welcome to our homepage')
            for i in range(5)]
    out = _flags(spark, rows, min_paths=3)
    assert not any(r['is_soft404'] for r in out.values())


def test_templates_are_per_host(spark):
    # two copies on each of two hosts: neither host reaches min_paths,
    # even though the fingerprint appears 4 times globally
    rows = ([(f'http://a/x{i}', 'a', 200, ERR) for i in range(2)]
            + [(f'http://b/x{i}', 'b', 200, ERR) for i in range(2)])
    out = _flags(spark, rows, min_paths=3)
    assert not any(r['is_soft404'] for r in out.values())


def test_normalization_unifies_spellings(spark):
    # double space / lowercase / UPPERCASE collapse to one fingerprint
    rows = [
        ('http://h/a', 'h', 200, 'Sorry,  this page was not found.'),
        ('http://h/b', 'h', 200, 'sorry, this page was not found.'),
        ('http://h/c', 'h', 200, 'SORRY, THIS PAGE WAS NOT FOUND.'),
    ]
    out = _flags(spark, rows, min_paths=3)
    assert all(r['is_soft404'] for r in out.values())
    assert len({r['sig'] for r in out.values()}) == 1
