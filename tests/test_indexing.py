"""Index-build operators: champion postings, anchor-term rollup,
Dice collocations (`scalpel_spark/operators/indexing.py`).

The salted two-phase top-k in champion_postings must be provably
salt-invariant — the key test compares n_salts=1 (flat window) against
n_salts=7 on the same corpus.
"""

from pyspark.sql import functions as F

from scalpel_spark.operators import indexing


def _docs(spark):
    rows = [
        (0, 'spark join scan join join filter'),
        (1, 'join scan scan'),
        (2, 'filter filter filter filter join'),
        (3, 'spark spark scan'),
        (4, 'join'),
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_champion_postings_ranks_by_tf_then_doc_id(spark):
    out = indexing.champion_postings(_docs(spark), k=2).collect()
    by_tok = {}
    for r in out:
        by_tok.setdefault(r.tok, []).append(r)
    join = sorted(by_tok['join'], key=lambda r: r.rank)
    # 'join': doc0 tf=3, doc2 tf=1, doc1 tf=1, doc4 tf=1 → top-2 is
    # doc0 then the lowest doc_id among the tf=1 ties (doc1)
    assert [(r.doc_id, r.tf, r.rank) for r in join] == [(0, 3, 1), (1, 1, 2)]
    assert join[0].df == 4  # docs 0,1,2,4
    assert join[0].cf == 6  # 3+1+1+1
    spark_tok = by_tok['spark']
    assert {(r.doc_id, r.tf) for r in spark_tok} == {(3, 2), (0, 1)}


def test_champion_postings_salt_invariant(spark):
    docs = _docs(spark)
    flat = indexing.champion_postings(docs, k=2, n_salts=1)
    salted = indexing.champion_postings(docs, k=2, n_salts=7)
    key = ['tok', 'rank']
    assert sorted(map(tuple, flat.collect())) == sorted(map(tuple, salted.collect()))
    assert flat.count() == salted.count()
    assert [f.name for f in flat.schema] == key[:1] + ['df', 'cf', 'rank', 'doc_id', 'tf']


def test_anchor_terms_top_k_with_term_tiebreak(spark):
    links = spark.createDataFrame(
        [('t1', 'apple'), ('t1', 'apple'), ('t1', 'pear'), ('t1', 'kiwi'),
         ('t2', 'zzz')],
        'dst string, term string')
    out = indexing.anchor_terms(links, k=2).collect()
    t1 = sorted([r for r in out if r.dst == 't1'], key=lambda r: r.rank)
    # apple n_refs=2 first; pear vs kiwi tie at 1 → kiwi wins alphabetically
    assert [(r.term, r.n_refs, r.rank) for r in t1] == [('apple', 2, 1), ('kiwi', 1, 2)]
    assert [(r.term, r.rank) for r in out if r.dst == 't2'] == [('zzz', 1)]


def test_collocations_dice_exact_integer(spark):
    docs = spark.createDataFrame(
        [(0, 'new york new york city'), (1, 'new york is big big')],
        'doc_id long, text string')
    out = {r.bigram: r for r in indexing.collocations(docs, min_count=2).collect()}
    ny = out['new york']
    # n_ab=3, n_a(new)=3, n_b(york)=3 → 2*3*1e6 // 6 = 1_000_000 (perfect)
    assert (ny.n_ab, ny.n_a, ny.n_b, ny.dice_ppm) == (3, 3, 3, 1_000_000)
    assert 'york new' not in out  # seen once only
    assert 'big big' not in out   # within one doc but count 1


def test_collocations_min_count_filters(spark):
    docs = spark.createDataFrame([(0, 'a b a b a c')], 'doc_id long, text string')
    out = indexing.collocations(docs, min_count=2)
    rows = {r.bigram: r.n_ab for r in out.collect()}
    assert rows == {'a b': 2, 'b a': 2}


def test_salted_topk_model_invariance():
    """Pure-model proof of the two-phase decomposition over arbitrary
    corpora: for ANY assignment of rows to salts, (local top-k per salt →
    global top-k of survivors) equals the flat top-k, because
    (tf DESC, doc_id ASC) is a total order and each global winner wins
    its own salt. The Spark test above pins the implementation; this
    pins the algorithm across the input space (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(0, 5),      # tok
                  st.integers(0, 30),     # doc_id
                  st.integers(1, 9)),     # tf
        min_size=0, max_size=60, unique_by=lambda r: (r[0], r[1]))

    @settings(max_examples=200, deadline=None)
    @given(rows=rows_strategy, k=st.integers(1, 4), n_salts=st.integers(1, 5))
    def check(rows, k, n_salts):
        def topk(items):
            return sorted(items, key=lambda r: (-r[2], r[1]))[:k]

        by_tok = {}
        for r in rows:
            by_tok.setdefault(r[0], []).append(r)
        for tok, items in by_tok.items():
            flat = topk(items)
            salted = {}
            for r in items:
                salted.setdefault(hash(r[1]) % n_salts, []).append(r)
            survivors = [r for salt_rows in salted.values() for r in topk(salt_rows)]
            assert topk(survivors) == flat

    check()


def test_champion_postings_plan_has_partial_agg(spark):
    """The (tok, doc_id) count must partial-aggregate map-side (the
    within-doc repeats collapse before the exchange)."""
    plan = indexing.champion_postings(_docs(spark), k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'HashAggregate' in plan
    assert 'Exchange' in plan


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def _queries(spark, *qs):
    return spark.createDataFrame(
        [(f'q{i}', q) for i, q in enumerate(qs)],
        'query_id string, query_text string')


def test_bm25_ranks_high_tf_short_doc_first(spark):
    # doc 10: 3x 'join' in 4 tokens; doc 11: 1x 'join' in 8 tokens;
    # doc 12: no 'join'. BM25 must rank 10 > 11 and exclude 12.
    docs = spark.createDataFrame(
        [(10, 'join join join scan'),
         (11, 'join scan scan scan filter filter filter filter'),
         (12, 'scan filter scan filter')],
        'doc_id long, text string')
    out = indexing.bm25_topk(docs, _queries(spark, 'join'), k=5).collect()
    assert [r['doc_id'] for r in sorted(out, key=lambda r: r['rank'])] == [10, 11]
    assert out[0]['score_micro'] > 0


def test_bm25_rare_term_outscores_common_term(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4 — for a two-term
    # query, the doc holding the rare term must beat a common-only doc.
    docs = spark.createDataFrame(
        [(0, 'common rare'), (1, 'common x'), (2, 'common y'), (3, 'common z')],
        'doc_id long, text string')
    out = {r['doc_id']: r['rank']
           for r in indexing.bm25_topk(docs, _queries(spark, 'common rare'), k=4).collect()}
    assert out[0] == 1


def test_bm25_duplicate_query_terms_scored_once(spark):
    docs = spark.createDataFrame(
        [(0, 'join scan'), (1, 'join filter')], 'doc_id long, text string')
    once = indexing.bm25_topk(docs, _queries(spark, 'join'), k=2)
    twice = indexing.bm25_topk(docs, _queries(spark, 'join join'), k=2)
    assert sorted((r['doc_id'], r['score_micro']) for r in once.collect()) == \
        sorted((r['doc_id'], r['score_micro']) for r in twice.collect())


def test_bm25_salt_invariant_and_k_cutoff(spark):
    rows = [(i, ' '.join(['join'] * (i % 5 + 1) + ['t%d' % i])) for i in range(40)]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    q = _queries(spark, 'join')
    flat = [(r['rank'], r['doc_id'], r['score_micro'])
            for r in indexing.bm25_topk(docs, q, k=7, n_salts=1).collect()]
    salted = [(r['rank'], r['doc_id'], r['score_micro'])
              for r in indexing.bm25_topk(docs, q, k=7, n_salts=5).collect()]
    assert sorted(flat) == sorted(salted)
    assert len(flat) == 7


def test_bm25_tie_breaks_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(5, 'join scan'), (2, 'join scan'), (9, 'join scan')],
        'doc_id long, text string')
    out = sorted(indexing.bm25_topk(docs, _queries(spark, 'join'), k=3).collect(),
                 key=lambda r: r['rank'])
    assert [r['doc_id'] for r in out] == [2, 5, 9]
    assert len({r['score_micro'] for r in out}) == 1
