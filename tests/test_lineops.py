"""Line-level curation operators: token-window splitting, corpus-wide
line dedup (CCNet-style boilerplate removal), per-line quality rules."""

from __future__ import annotations

import pytest

from scalpel_spark.operators import lineops

DOC_SCHEMA = 'doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG'


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, 'en', 's', len(t)) for i, t in rows], DOC_SCHEMA
    )


def test_split_token_lines_windows_and_order(spark):
    docs = _docs(spark, [(0, 'a b c d e f g h i j')])  # 10 toks -> 8 + 2
    rows = sorted(
        lineops.split_token_lines(docs, line_tokens=8).collect(),
        key=lambda r: r['line_no'],
    )
    assert [r['line'] for r in rows] == ['a b c d e f g h', 'i j']
    assert [r['line_no'] for r in rows] == [0, 1]


def test_split_token_lines_exact_multiple(spark):
    docs = _docs(spark, [(0, 'a b c d')])
    rows = lineops.split_token_lines(docs, line_tokens=2).collect()
    assert sorted(r['line'] for r in rows) == ['a b', 'c d']


def test_split_lines_delimiter(spark):
    docs = _docs(spark, [(0, 'first line\nsecond line\n')])
    rows = sorted(
        lineops.split_lines(docs).collect(), key=lambda r: r['line_no']
    )
    # trailing delimiter yields a trailing empty line (limit=-1 split)
    assert [r['line'] for r in rows] == ['first line', 'second line', '']


def test_line_dedup_strikes_shared_lines(spark):
    # 'nav bar' is shared boilerplate across docs 0 and 1; unique tails stay
    docs = _docs(
        spark,
        [
            (0, 'nav bar unique zero'),
            (1, 'nav bar other one'),
            (2, 'fully unique content here'),
        ],
    )
    out = {
        r['doc_id']: r
        for r in lineops.line_dedup(docs, line_tokens=2, min_docs=2).collect()
    }
    assert out[0]['clean_text'] == 'unique zero'
    assert out[0]['n_lines'] == 2 and out[0]['n_lines_removed'] == 1
    assert out[1]['clean_text'] == 'other one'
    assert out[2]['clean_text'] == 'fully unique\ncontent here'
    assert out[2]['n_lines_removed'] == 0


def test_line_dedup_all_removed_keeps_doc(spark):
    docs = _docs(spark, [(0, 'same same'), (1, 'same same')])
    out = {
        r['doc_id']: r
        for r in lineops.line_dedup(docs, line_tokens=2, min_docs=2).collect()
    }
    assert out[0]['clean_text'] == '' and out[0]['n_lines_removed'] == 1
    assert set(out) == {0, 1}


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # 'rep tok' occurs twice INSIDE doc 0 only -> 1 distinct doc -> kept
    docs = _docs(spark, [(0, 'rep tok rep tok'), (1, 'something else')])
    out = {
        r['doc_id']: r
        for r in lineops.line_dedup(docs, line_tokens=2, min_docs=2).collect()
    }
    assert out[0]['n_lines_removed'] == 0
    assert out[0]['clean_text'] == 'rep tok\nrep tok'


def test_line_quality_flags(spark):
    docs = _docs(spark, [(0, 'good line of text'), (1, '1 2 3 4'), (2, 'x y')])
    flags = {
        (r['doc_id'], r['line_no']): r
        for r in lineops.line_quality_flags(docs, line_tokens=4).collect()
    }
    assert flags[(0, 0)]['keep'] is True
    assert flags[(1, 0)]['flag_numeric'] is True and flags[(1, 0)]['keep'] is False
    assert flags[(2, 0)]['flag_short'] is True and flags[(2, 0)]['keep'] is False


def test_line_quality_filter_bullet_and_rebuild(spark):
    docs = _docs(spark, [(0, '- bullet nav junk real content stays here')])
    out = lineops.line_quality_filter(docs, line_tokens=4).collect()
    assert out[0]['clean_text'] == 'real content stays here'
    assert out[0]['n_lines'] == 2 and out[0]['n_lines_removed'] == 1


@pytest.mark.parametrize('op', [lineops.line_dedup, lineops.line_quality_filter])
def test_lineops_plans_stay_jvm(spark, op):
    docs = _docs(spark, [(0, 'a b c d e f g h i j')])
    plan = op(docs)._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan


def test_split_lines_regex_metachar_delimiter_is_literal(spark):
    docs = _docs(spark, [(0, 'a|b|c')])
    rows = sorted(lineops.split_lines(docs, delimiter='|').collect(),
                  key=lambda r: r['line_no'])
    assert [r['line'] for r in rows] == ['a', 'b', 'c']
    docs2 = _docs(spark, [(0, 'x.y')])
    rows2 = sorted(lineops.split_lines(docs2, delimiter='.').collect(),
                   key=lambda r: r['line_no'])
    assert [r['line'] for r in rows2] == ['x', 'y']


def test_line_dedup_min_docs_one_strikes_everything(spark):
    docs = _docs(spark, [(0, 'solo text line')])
    out = lineops.line_dedup(docs, line_tokens=8, min_docs=1).collect()
    assert out[0]['clean_text'] == '' and out[0]['n_lines_removed'] == 1
