"""C4 cleaning battery: line rules, page rules, reassembly order."""

from __future__ import annotations

from scalpel_spark.operators import c4rules

DOC_SCHEMA = 'doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG'


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, 'en', 's', len(t)) for i, t in rows], DOC_SCHEMA
    )


def test_line_rules(spark):
    lines = spark.createDataFrame(
        [
            (0, 0, 'a good long sentence right here.'),
            (0, 1, 'no terminal punctuation on this line'),
            (0, 2, 'short one.'),
            (0, 3, 'enable javascript to view this content.'),
            (0, 4, 'please read our privacy policy today.'),
            (0, 5, 'he said "quoted endings also count fine"'),
        ],
        'doc_id LONG, line_no LONG, line STRING',
    )
    got = {r['line_no']: r for r in c4rules.c4_line_flags(lines).collect()}
    assert got[0]['line_keep']
    assert not got[1]['line_keep'] and not got[1]['ends_terminal']
    assert not got[2]['line_keep'] and got[2]['too_short']
    assert not got[3]['line_keep'] and got[3]['has_javascript']
    assert not got[4]['line_keep'] and got[4]['is_policy']
    assert got[5]['line_keep'] and got[5]['ends_terminal']


def test_c4_filter_page_rules_and_reassembly(spark):
    # 8-token lines; terminal '.' on tokens 8 and 16 makes two clean lines
    good = 'w1 w2 w3 w4 w5 w6 w7 end. x1 x2 x3 x4 x5 x6 x7 stop. tail toks'
    docs = _docs(spark, [
        (0, good),
        (1, good + ' lorem ipsum'),
        (2, good.replace('end.', '{nd.')),
        (3, 'no terminal lines here at all ever written'),
    ])
    out = {r['doc_id']: r for r in
           c4rules.c4_filter(docs, min_kept_lines=2).collect()}
    assert out[0]['doc_keep']
    assert out[0]['n_lines_kept'] == 2
    assert out[0]['clean_text'] == (
        'w1 w2 w3 w4 w5 w6 w7 end.\nx1 x2 x3 x4 x5 x6 x7 stop.')
    assert not out[1]['doc_keep'] and out[1]['has_lorem']
    assert not out[2]['doc_keep'] and out[2]['has_brace']
    assert not out[3]['doc_keep'] and out[3]['n_lines_kept'] == 0
    # one verdict row per input doc, no drops
    assert set(out) == {0, 1, 2, 3}


def test_min_kept_lines_threshold(spark):
    one_line = 'w1 w2 w3 w4 w5 w6 w7 end.'
    docs = _docs(spark, [(0, one_line)])
    strict = c4rules.c4_filter(docs, min_kept_lines=2).collect()[0]
    lax = c4rules.c4_filter(docs, min_kept_lines=1).collect()[0]
    assert not strict['doc_keep'] and lax['doc_keep']
