"""link_context / anchor_text_profile — anchor-context extraction."""

from pyspark.sql import functions as F

from scalpel_spark.operators.parse import (anchor_text_profile, extract_outlinks,
                                           link_context)
from scalpel_spark.sources.corpus import CORPUS_SCHEMA, golden_site


def _docs(spark):
    def span(kind, text=None, ref=None, off=0):
        return {'kind': kind, 'text': text, 'media_ref': ref, 'offset': off}

    rows = [
        {'doc_id': 'd1',
         'spans': [span('text', 'intro'), span('link', '/a'), span('text', 'mid'),
                   span('link', '/b'), span('media', None, 'img://x'), span('link', '/c')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'd2',
         'spans': [span('link', '/a'), span('text', 'tail')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'd3', 'spans': [],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'd4', 'spans': [span('text', 'prose only')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
    ]
    return spark.createDataFrame(rows, CORPUS_SCHEMA).withColumnRenamed('doc_id', 'url')


def test_link_context_nearest_preceding_text(spark):
    out = {(r['url'], r['pos']): (r['span_idx'], r['raw_link'], r['context'])
           for r in link_context(_docs(spark)).collect()}
    assert out == {
        ('d1', 0): (1, '/a', 'intro'),
        ('d1', 1): (3, '/b', 'mid'),
        # the media span between /b and /c is not prose: context stays 'mid'
        ('d1', 2): (5, '/c', 'mid'),
        # link with no preceding text span: context NULL, no throw
        ('d2', 0): (0, '/a', None),
    }


def test_link_context_matches_extract_outlinks_ordering(spark):
    """The link ordinal (pos) and raw_link agree with extract_outlinks —
    the engine's follow stage — on the golden corpus."""
    docs = golden_site(spark, 'http').select(
        F.col('doc_id').alias('url'), F.lit(0).cast('long').alias('priority'), 'spans')
    a = {(r['parent_url'], r['pos']): r['raw_link']
         for r in extract_outlinks(docs).collect()}
    b = {(r['url'], r['pos']): r['raw_link']
         for r in link_context(docs).collect()}
    assert a == b and len(a) > 0


def test_anchor_text_profile(spark):
    prof = {r['raw_link']: (r['n_refs'], r['n_docs'], r['first_context'], r['last_context'])
            for r in anchor_text_profile(link_context(_docs(spark))).collect()}
    assert prof == {
        '/a': (2, 2, 'intro', 'intro'),  # NULL context ignored by min/max
        '/b': (1, 1, 'mid', 'mid'),
        '/c': (1, 1, 'mid', 'mid'),
    }


def test_link_context_plan_is_shuffle_free(spark):
    plan = link_context(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan
