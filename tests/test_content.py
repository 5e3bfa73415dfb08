"""Span-level content extraction: media captions, link-run boilerplate,
host template detection/stripping (operators/content.py).

Fixtures are handcrafted span documents so every rule boundary is pinned
exactly: caption tie-to-prev, max_gap cutoff, nav-run length threshold,
short-text-between-links, template share threshold, and strip order
preservation (the north-rule span-sequence invariant on survivors).
"""

from pyspark.sql import functions as F

from scalpel_spark.operators import content as C
from scalpel_spark.sources.corpus import CORPUS_SCHEMA


def _doc(doc_id, spans):
    rows = []
    for i, (kind, text, media_ref) in enumerate(spans):
        rows.append({'kind': kind, 'text': text, 'media_ref': media_ref,
                     'offset': i})
    return {'doc_id': doc_id, 'spans': rows, 'http_status': 200,
            'scheme': 'http', 'readable': True, 'fetch_ms': 1.0}


def _docs(spark, rows):
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


T = lambda s: ('text', s, None)          # noqa: E731
L = lambda s: ('link', s, None)          # noqa: E731
M = lambda r: ('media', None, r)         # noqa: E731


# ---------------------------------------------------------------------------
# media_captions
# ---------------------------------------------------------------------------


def test_caption_prefers_nearer_and_ties_to_prev(spark):
    docs = _docs(spark, [
        # media at pos 2: prev text at 1 (gap 1), next text at 3 (gap 1) → tie → prev
        _doc('http://a.com/tie', [T('before'), T('prev'), M('m1'), T('next')]),
        # media at pos 1: prev text gap 1, next text gap 2 → prev
        _doc('http://a.com/prev', [T('p'), M('m2'), L('x'), T('n')]),
        # media at pos 0: no prev, next text at 2 (gap 2) → next
        _doc('http://a.com/next', [M('m3'), L('x'), T('n')]),
    ])
    got = {r['media_ref']: (r['caption'], r['caption_side'], r['gap'])
           for r in C.media_captions(docs).collect()}
    assert got['m1'] == ('prev', 'prev', 1)
    assert got['m2'] == ('p', 'prev', 1)
    assert got['m3'] == ('n', 'next', 2)


def test_caption_null_beyond_max_gap(spark):
    docs = _docs(spark, [
        _doc('http://a.com/far', [T('far'), L('x'), L('y'), L('z'), M('m')]),
    ])
    row = C.media_captions(docs, max_gap=3).collect()[0]
    assert row['caption'] is None and row['caption_side'] is None
    row = C.media_captions(docs, max_gap=4).collect()[0]
    assert row['caption'] == 'far' and row['caption_side'] == 'prev'


def test_caption_one_row_per_media_span(spark):
    docs = _docs(spark, [
        _doc('http://a.com/two', [T('t'), M('m1'), M('m2'), T('u')]),
        _doc('http://a.com/none', [T('only'), L('x')]),
    ])
    out = C.media_captions(docs).collect()
    assert sorted(r['media_ref'] for r in out) == ['m1', 'm2']


# ---------------------------------------------------------------------------
# classify_spans / extract_main_content
# ---------------------------------------------------------------------------


def test_nav_run_threshold_is_exact(spark):
    docs = _docs(spark, [
        _doc('http://a.com/nav3', [T('body text long enough here'),
                                   L('a'), L('b'), L('c')]),
        _doc('http://a.com/nav2', [T('body text long enough here'),
                                   L('a'), L('b')]),
    ])
    lab = C.classify_spans(docs, min_link_run=3)
    by_doc = {(r['doc_id'], r['pos']): r['label'] for r in lab.collect()}
    assert by_doc[('http://a.com/nav3', 1)] == 'boiler'
    assert by_doc[('http://a.com/nav3', 3)] == 'boiler'
    # run of 2 < threshold → links stay content
    assert by_doc[('http://a.com/nav2', 1)] == 'content'
    assert by_doc[('http://a.com/nav2', 2)] == 'content'


def test_nav_runs_split_by_interleaved_text(spark):
    # two runs of 2 separated by a text span: neither reaches min_link_run=3
    docs = _docs(spark, [
        _doc('http://a.com/split', [L('a'), L('b'),
                                    T('a real paragraph of content'),
                                    L('c'), L('d')]),
    ])
    lab = C.classify_spans(docs, min_link_run=3).collect()
    assert all(r['label'] == 'content' for r in lab)


def test_short_text_between_links_is_boiler(spark):
    docs = _docs(spark, [
        _doc('http://a.com/mid', [L('a'), T('|'), L('b'),
                                  T('a real paragraph of content here')]),
    ])
    lab = {r['pos']: (r['label'], r['reason'])
           for r in C.classify_spans(docs, min_link_run=5).collect()}
    assert lab[1] == ('boiler', 'short_between_links')
    assert lab[3] == ('content', None)


def test_extract_main_content_concats_in_span_order(spark):
    docs = _docs(spark, [
        _doc('http://a.com/d', [T('first paragraph of the article'),
                                M('img'), T('second paragraph of the piece'),
                                L('a'), L('b'), L('c')]),
    ])
    row = C.extract_main_content(docs, min_link_run=3).collect()[0]
    assert row['main_text'] == ('first paragraph of the article '
                                'second paragraph of the piece')
    assert row['n_boiler'] == 3
    assert row['n_content'] == 3
    assert row['content_chars'] == len('first paragraph of the article') + \
        len('second paragraph of the piece')


# ---------------------------------------------------------------------------
# host_templates / strip_templates
# ---------------------------------------------------------------------------


def _site(host, n_pages, nav=True):
    rows = []
    for p in range(n_pages):
        spans = []
        if nav:
            spans += [L('/home'), L('/about')]
        spans += [T(f'unique body of page {p} on {host}')]
        if nav:
            spans += [T('(c) 2026 SiteCorp')]
        rows.append(_doc(f'http://{host}/p{p}.html', spans))
    return rows


def test_host_templates_finds_sitewide_spans_only(spark):
    docs = _docs(spark, _site('tpl.com', 6) + _site('clean.com', 6, nav=False))
    tpl = C.host_templates(docs, min_pages=4, min_share_pct=90).collect()
    hosts = {r['host'] for r in tpl}
    assert hosts == {'tpl.com'}
    samples = sorted(r['sample_text'] for r in tpl)
    assert samples == ['(c) 2026 SiteCorp', '/about', '/home']
    assert all(r['n_docs'] == 6 and r['host_docs'] == 6
               and r['share_pct'] == 100 for r in tpl)


def test_host_templates_respects_min_pages(spark):
    docs = _docs(spark, _site('small.com', 3))
    assert C.host_templates(docs, min_pages=4, min_share_pct=50).count() == 0


def test_strip_templates_preserves_survivor_order(spark):
    docs = _docs(spark, _site('tpl.com', 6))
    tpl = C.host_templates(docs, min_pages=4, min_share_pct=90)
    out = C.strip_templates(docs, tpl).orderBy('doc_id')
    rows = out.collect()
    assert all(r['n_stripped'] == 3 for r in rows)
    for r in rows:
        assert len(r['spans']) == 1
        assert r['spans'][0]['text'].startswith('unique body of page')
    # survivors keep the original schema + relative order
    assert out.columns == ['doc_id', 'spans', 'http_status', 'scheme',
                           'readable', 'fetch_ms', 'n_stripped']


def test_strip_templates_leaves_other_hosts_untouched(spark):
    docs = _docs(spark, _site('tpl.com', 6) + _site('clean.com', 6, nav=False))
    tpl = C.host_templates(docs, min_pages=4, min_share_pct=90)
    out = C.strip_templates(docs, tpl)
    clean = out.filter(F.col('doc_id').startswith('http://clean.com'))
    assert clean.agg(F.sum('n_stripped')).first()[0] == 0


def test_strip_templates_caps_fps_per_host(spark):
    # 300 'template' spans on one host; the cap keeps the broadcast bounded
    rows = []
    for p in range(5):
        spans = [L(f'/nav{i}') for i in range(300)] + [T(f'body {p} unique')]
        rows.append(_doc(f'http://big.com/p{p}.html', spans))
    docs = _docs(spark, rows)
    tpl = C.host_templates(docs, min_pages=4, min_share_pct=90)
    out = C.strip_templates(docs, tpl, max_fps_per_host=50)
    assert out.agg(F.max('n_stripped')).first()[0] == 50
