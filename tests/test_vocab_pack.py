"""BPE vocabulary learning (`operators/vocab.py`), caption-pair
extraction and media-aware interleaved packing (`operators/content.py`).

The BPE check is against an INDEPENDENT in-test reference implementation
(Counter + string re-segmentation, structured differently from the
operator's tuple loop), not against the operator's own internals.
"""

from collections import Counter

from pyspark.sql import functions as F

from scalpel_spark.operators import content as C
from scalpel_spark.operators import vocab as V
from scalpel_spark.operators.curation import pack_sequences
from tests.test_content import L, M, T, _doc, _docs


# ---------------------------------------------------------------------------
# bpe_merges vs an independent reference
# ---------------------------------------------------------------------------


def _ref_bpe(texts, n_merges):
    """Reference BPE: word freqs via Counter, symbols as space-joined
    strings, merges applied with split/join."""
    wf = Counter(w for t in texts for w in t.split(' ') if w)
    vocab = Counter()
    for w, n in wf.items():
        vocab[' '.join(list(w) + ['</w>'])] += n
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for sym, n in vocab.items():
            parts = sym.split(' ')
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((rank, a, b, cnt))
        nv = Counter()
        for sym, n in vocab.items():
            parts = sym.split(' ')
            out, i = [], 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            nv[' '.join(out)] += n
        vocab = nv
    return merges


def test_bpe_matches_independent_reference(spark):
    texts = ['low lower lowest', 'new newer newest low',
             'wide wider widest new new', 'low low lower']
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], 'doc_id long, text string')
    got = [(r['rank'], r['left'], r['right'], r['pair_count'])
           for r in V.bpe_merges(docs, n_merges=10).orderBy('rank').collect()]
    assert got == _ref_bpe(texts, 10)


def test_bpe_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame([(0, 'ab cd')], 'doc_id long, text string')
    # every adjacent pair occurs once -> zero merges
    assert V.bpe_merges(docs, n_merges=5).count() == 0


def test_bpe_deterministic_across_partitionings(spark):
    texts = [f'tok{i % 7} alpha beta' for i in range(40)]
    a = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                              'doc_id long, text string')
    b = a.repartition(13)
    ra = [tuple(r) for r in V.bpe_merges(a, 8).orderBy('rank').collect()]
    rb = [tuple(r) for r in V.bpe_merges(b, 8).orderBy('rank').collect()]
    assert ra == rb and len(ra) == 8


# ---------------------------------------------------------------------------
# caption_pairs
# ---------------------------------------------------------------------------


def test_caption_pairs_picks_longest_then_lexicographic(spark):
    docs = _docs(spark, [
        _doc('http://a.com/1', [T('short'), M('img://x')]),
        _doc('http://a.com/2', [T('a much longer caption'), M('img://x')]),
        _doc('http://a.com/3', [T('b much longer caption'), M('img://x')]),
        _doc('http://a.com/4', [T('zz'), M('img://y')]),  # below min chars
    ])
    out = {r['media_ref']: r for r in C.caption_pairs(docs).collect()}
    assert out['img://x']['caption'] == 'b much longer caption'
    assert out['img://x']['n_occurrences'] == 3
    assert 'img://y' not in out


def test_caption_pairs_respects_min_chars(spark):
    docs = _docs(spark, [_doc('http://a.com/1', [T('okay'), M('img://z')])])
    assert C.caption_pairs(docs, min_caption_chars=4).count() == 1
    assert C.caption_pairs(docs, min_caption_chars=5).count() == 0


# ---------------------------------------------------------------------------
# pack_interleaved
# ---------------------------------------------------------------------------


def test_pack_interleaved_costs_media_and_matches_flat_when_none(spark):
    docs = _docs(spark, [
        _doc('d1', [T('one two three'), M('img://a'), M('img://b')]),
        _doc('d2', [T('four five'), L('x')]),
    ])
    out = {r['doc_id']: r
           for r in C.pack_interleaved(docs, 128, media_tokens=10).collect()}
    assert out['d1']['n_tokens'] == 3 + 2 * 10
    assert out['d1']['n_media_spans'] == 2
    assert out['d2']['n_tokens'] == 2 and out['d2']['n_media_spans'] == 0

    # with no media spans the layout equals pack_sequences on the
    # concatenated text (same doc_ids -> same shuffle keys)
    nomedia = _docs(spark, [
        _doc('d1', [T('one two three')]), _doc('d2', [T('four five')]),
    ])
    flat = spark.createDataFrame(
        [('d1', 'one two three'), ('d2', 'four five')],
        'doc_id string, text string')
    a = sorted((r['doc_id'], r['cum_before'], r['seq_id'], r['offset'])
               for r in C.pack_interleaved(nomedia, 4, 10).collect())
    b = sorted((r['doc_id'], r['cum_before'], r['seq_id'], r['offset'])
               for r in pack_sequences(flat, 4).collect())
    assert a == b


def test_pack_interleaved_bucket_invariance(spark):
    from scalpel_spark.sources.corpus import synthetic_corpus
    docs = synthetic_corpus(spark, n_pages=60, n_hosts=4, seed=9)
    a = sorted(tuple(r) for r in
               C.pack_interleaved(docs, 256, n_buckets=4).collect())
    b = sorted(tuple(r) for r in
               C.pack_interleaved(docs, 256, n_buckets=64).collect())
    assert a == b


# ---------------------------------------------------------------------------
# bpe_encode_words / bpe_token_stats vs an independent reference
# ---------------------------------------------------------------------------


def _ref_encode(word, merges):
    """Reference BPE apply: the textbook while-loop over (left, right)
    merges in rank order (structured as index scan, unlike the
    operator's array fold)."""
    sym = list(word) + ['</w>']
    for left, right in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_reference_on_learned_merges(spark):
    texts = ['low lower lowest', 'new newer newest low',
             'wide wider widest new new', 'low low lower',
             'aaaa aaaaa ababab abab']
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], 'doc_id long, text string')
    merges = [(r['left'], r['right'])
              for r in V.bpe_merges(docs, n_merges=12).orderBy('rank').collect()]
    words = sorted({w for t in texts for w in t.split(' ') if w})
    wdf = spark.createDataFrame([(w,) for w in words], 'word string')
    got = {r['word']: r['tokens']
           for r in V.bpe_encode_words(wdf, merges).collect()}
    for w in words:
        assert got[w] == _ref_encode(w, merges), w


def test_bpe_encode_handles_quote_and_backslash_symbols(spark):
    wdf = spark.createDataFrame([("a'b\\c",)], 'word string')
    got = V.bpe_encode_words(wdf, [("a", "'"), ("a'", 'b')]).collect()[0]
    assert got['tokens'] == _ref_encode("a'b\\c", [("a", "'"), ("a'", 'b')])


def test_bpe_token_stats_sums_and_compression(spark):
    docs = spark.createDataFrame(
        [(0, 'low low'), (1, 'lower')], 'doc_id long, text string')
    merges = [('l', 'o'), ('lo', 'w'), ('low', '</w>')]
    rows = {r['doc_id']: r
            for r in V.bpe_token_stats(docs, merges).collect()}
    # 'low' -> ['low</w>'] (1 token), n_symbols 4; doc 0 has two of them
    assert rows[0]['n_words'] == 2
    assert rows[0]['n_tokens'] == 2
    assert rows[0]['n_symbols'] == 8
    assert rows[0]['compression_ppm'] == 250000
    # 'lower' -> ['low', 'e', 'r', '</w>'] = 4 tokens, 6 symbols
    assert rows[1]['n_tokens'] == 4
    assert rows[1]['n_symbols'] == 6
    assert rows[1]['compression_ppm'] == 666666


def test_bpe_encode_partitioning_invariant(spark):
    texts = [f'tok{i % 9} alpha beta gamma' for i in range(60)]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 'doc_id long, text string')
    merges = [(r['left'], r['right'])
              for r in V.bpe_merges(docs, n_merges=6).orderBy('rank').collect()]
    a = sorted(tuple(r) for r in V.bpe_token_stats(docs, merges).collect())
    b = sorted(tuple(r) for r in
               V.bpe_token_stats(docs.repartition(11), merges).collect())
    assert a == b


def test_bpe_fold_equals_reference_property(spark):
    """Property (hypothesis): for ANY word over a small alphabet and ANY
    valid merge sequence (each merge fuses two symbols already in the
    pool), the distributed array fold segments EXACTLY like the textbook
    while-loop encoder — including adjacent-overlap runs like 'aaaa'.
    One Spark job per example batch keeps the runtime sane."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words_strategy = st.lists(
        st.text(alphabet='abc', min_size=0, max_size=10),
        min_size=1, max_size=12, unique=True)

    def merges_from_seed(picks):
        pool = ['a', 'b', 'c', '</w>']
        merges = []
        for i, j in picks:
            left, right = pool[i % len(pool)], pool[j % len(pool)]
            merges.append((left, right))
            pool.append(left + right)
        return merges

    @settings(max_examples=8, deadline=None)
    @given(words=words_strategy,
           picks=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                          min_size=0, max_size=6))
    def run(words, picks):
        merges = merges_from_seed(picks)
        words = [w for w in words if w] or ['a']
        wdf = spark.createDataFrame([(w,) for w in set(words)], 'word string')
        got = {r['word']: r['tokens']
               for r in V.bpe_encode_words(wdf, merges).collect()}
        for w in set(words):
            assert got[w] == _ref_encode(w, merges), (w, merges)

    run()
