"""Span-sequence integrity operators (operators/spans.py) — the north-rule
per-row invariant (kind, text, media_ref, order) as a scalable audit.

Reference anchor: the parse path emits spans in document order
(core/response.py:77-116); the engine must preserve that sequence on every
emitted document.  These tests pin the signature algebra (order-sensitive,
NULL-vs-empty distinct, partitioning-invariant), the 4-way parity
classification, the composition stats, and the parity plan shape (slim
single-join, no Python nodes).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scalpel_spark.operators import spans as sp
from scalpel_spark.sources.corpus import SPAN_TYPE, golden_site

DOC_SCHEMA = T.StructType(
    [T.StructField('doc_id', T.StringType()), T.StructField('spans', SPAN_TYPE)]
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (doc_id, [{'kind': k, 'text': t, 'media_ref': m, 'offset': o} for (k, t, m, o) in ss])
            for doc_id, ss in rows
        ],
        DOC_SCHEMA,
    )


def _sig_map(df):
    return {r['doc_id']: r['span_sig'] for r in sp.with_span_signature(df).collect()}


def test_signature_order_and_field_sensitivity(spark):
    base = [('text', 'a', None, 0), ('media', None, 'img://x', 1)]
    variants = {
        'base': base,
        'swapped': list(reversed(base)),                       # order matters
        'kind': [('link', 'a', None, 0), base[1]],             # kind matters
        'text': [('text', 'b', None, 0), base[1]],             # text matters
        'media': [base[0], ('media', None, 'img://y', 1)],     # media_ref matters
        'offset': [('text', 'a', None, 9), base[1]],           # offset matters
        'null_vs_empty': [('text', '', None, 0), base[1]],     # NULL != ''
        'dup': base,                                           # same spans → same sig
    }
    sigs = _sig_map(_docs(spark, list(variants.items())))
    assert sigs['base'] == sigs['dup']
    others = {k: v for k, v in sigs.items() if k not in ('base', 'dup')}
    assert len(set(others.values()) | {sigs['base']}) == len(others) + 1


def test_signature_partitioning_invariant(spark):
    docs = golden_site(spark, 'http')
    one = _sig_map(docs.coalesce(1))
    many = _sig_map(docs.repartition(7, 'doc_id'))
    assert one == many and len(one) == 3


def test_parity_four_way_classification(spark):
    left = _docs(spark, [
        ('same', [('text', 'a', None, 0)]),
        ('changed', [('text', 'a', None, 0), ('link', 'u', None, 1)]),
        ('gone', [('text', 'z', None, 0)]),
    ])
    right = _docs(spark, [
        ('same', [('text', 'a', None, 0)]),
        ('changed', [('text', 'a', None, 0)]),          # lost its link span
        ('new', [('media', None, 'img://n', 0)]),
    ])
    got = {r['doc_id']: r['status'] for r in sp.span_parity(left, right).collect()}
    assert got == {'same': 'match', 'changed': 'mismatch',
                   'gone': 'left_only', 'new': 'right_only'}
    summary = {r['status']: r['n_docs'] for r in sp.span_parity_summary(left, right).collect()}
    assert summary == {'match': 1, 'mismatch': 1, 'left_only': 1, 'right_only': 1}


def test_span_stats_golden_site(spark):
    docs = golden_site(spark, 'http')
    stats = {r['doc_id']: r for r in sp.span_stats(docs).collect()}
    rows = docs.select('doc_id', 'spans').collect()
    for r in rows:
        by_kind = {}
        chars = 0
        for s in r['spans']:
            by_kind[s['kind']] = by_kind.get(s['kind'], 0) + 1
            if s['kind'] == 'text' and s['text'] is not None:
                chars += len(s['text'])
        got = stats[r['doc_id']]
        assert got['n_spans'] == len(r['spans'])
        assert got['n_text'] == by_kind.get('text', 0)
        assert got['n_link'] == by_kind.get('link', 0)
        assert got['n_media'] == by_kind.get('media', 0)
        assert got['text_chars'] == chars


def test_engine_emitted_docs_are_span_exact(spark):
    """End-to-end north-rule invariant: every document the engine emits is a
    span-exact copy of its corpus row — no reorder, no drop, no rewrite
    through fetch/middleware/commit (reference emit: any_io/static_spider.py:143)."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(spark, n_pages=120, n_hosts=6, seed=21)
    robots = synthetic_robots(spark, n_hosts=6)
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=2)
    engine = CrawlEngine(spark, corpus, robots, cfg, SnapshotStore(tempfile.mkdtemp()))
    res = engine.run([r['doc_id'] for r in corpus.limit(3).collect()])
    emitted = res.docs.select('doc_id', 'spans')
    summary = {r['status']: r['n_docs']
               for r in sp.span_parity_summary(emitted, corpus.select('doc_id', 'spans')).collect()}
    assert summary.get('mismatch', 0) == 0 and summary.get('left_only', 0) == 0
    assert summary.get('match', 0) == emitted.count() > 0


def test_parity_plan_is_slim_single_join_no_python(spark):
    docs = golden_site(spark, 'http')
    plan = sp.span_parity(docs, docs)._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEval' not in plan
    assert plan.count('SortMergeJoin') + plan.count('BroadcastHashJoin') == 1
    # the spans payload is projected away before the exchange: no 'spans'
    # column crosses the shuffle boundary
    for line in plan.splitlines():
        if 'Exchange' in line:
            assert 'spans' not in line
