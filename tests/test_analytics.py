"""Unit tests for the training-data analytics operators (dedup, similarity,
text analysis, sessionization) over tiny deterministic frames."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators import dedup, sessions, similarity, textops

DOCS = [
    # doc 0/1 exact duplicates; doc 2 near-dup of 0 (one token changed);
    # doc 3 unrelated
    (0, 'alpha beta gamma delta epsilon zeta eta theta', 'en', 'src0', 46),
    (1, 'alpha beta gamma delta epsilon zeta eta theta', 'en', 'src1', 46),
    (2, 'alpha beta gamma delta epsilon zeta eta iota', 'en', 'src2', 45),
    (3, 'one two three four five six seven eight nine ten', 'fr', 'src3', 49),
]
DOC_SCHEMA = 'doc_id long, text string, lang string, source string, n_chars long'


@pytest.fixture(scope='module')
def docs(spark):
    return spark.createDataFrame(DOCS, DOC_SCHEMA)


def test_exact_duplicates(docs):
    rows = dedup.exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]['n_copies'] == 2
    assert rows[0]['canonical_doc_id'] == 0


def test_ngram_jaccard_pairs(docs):
    rows = {(r['doc_a'], r['doc_b']): r['jaccard']
            for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    assert rows[(0, 1)] == 1.0
    assert (0, 2) in rows and 0.3 <= rows[(0, 2)] < 1.0
    assert all(3 not in pair for pair in rows)


def test_minhash_lsh_finds_exact_dup(docs):
    rows = {(r['doc_a'], r['doc_b']): r['matches']
            for r in dedup.minhash_lsh_pairs(docs, n=3, min_matches=8).collect()}
    assert rows[(0, 1)] == 16


def test_simhash_fingerprints(docs):
    fps = {r['doc_id']: r['simhash'] for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]  # identical token sets
    assert fps[0] != fps[3]
    assert all(0 <= v < 2**32 for v in fps.values())


def test_simhash_near_pairs(docs):
    pairs = {(r['doc_a'], r['doc_b']): r['hamming']
             for r in dedup.simhash_near_pairs(docs, max_hamming=31).collect()}
    assert pairs[(0, 1)] == 0


def test_planted_duplicates_roundtrip(docs):
    plus = dedup.with_planted_duplicates(docs, n=2, id_offset=100)
    assert plus.count() == 6
    groups = dedup.exact_duplicates(plus).collect()
    # (0,1,100,101) share one text → one group of 4; nothing else repeats
    by_copies = sorted(g['n_copies'] for g in groups)
    assert by_copies == [4]


EMB = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [1.0, 0.0, 0.0, 0.0], 0),   # identical to 0
    (2, [0.9, 0.1, 0.0, 0.0], 0),   # near 0
    (3, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal
    (4, [0.0, -1.0, 0.0, 0.0], 1),  # opposite of 3
]
EMB_SCHEMA = 'vec_id long, embedding array<float>, label int'


@pytest.fixture(scope='module')
def emb(spark):
    return spark.createDataFrame(EMB, EMB_SCHEMA)


def test_embedding_duplicates(emb):
    rows = {(r['vec_a'], r['vec_b']): r['cosine']
            for r in dedup.embedding_duplicates(emb, threshold=0.95).collect()}
    assert rows[(0, 1)] == 1.0
    assert (3, 4) not in rows  # cosine -1, same label but far


def test_cosine_topk(emb):
    rows = similarity.cosine_topk(emb, n_queries=1, k=2).collect()
    got = [(r['rank'], r['neighbor_id']) for r in sorted(rows, key=lambda r: r['rank'])]
    assert got[0] == (1, 1)  # identical vector ranks first
    assert got[1] == (2, 2)  # near vector second


def test_lsh_buckets_group_identical_vectors(emb):
    b = {r['vec_id']: r['bucket'] for r in similarity.lsh_buckets(emb, n_planes=6).collect()}
    assert b[0] == b[1]
    assert b[3] != b[4]  # opposite vectors flip every plane sign


def test_lsh_bucket_topk_finds_identical(emb):
    rows = similarity.lsh_bucket_topk(emb, n_queries=1, k=2, n_planes=6).collect()
    by_rank = sorted(rows, key=lambda r: r['rank'])
    assert by_rank[0]['neighbor_id'] == 1 and by_rank[0]['cosine'] == 1.0


def test_language_id(spark):
    df = spark.createDataFrame(
        [(0, 'the cat sat on the mat', 'en'), (1, 'el gato de la casa', 'es'),
         (2, 'xylophone quartz', 'zh')],
        'doc_id long, text string, lang string',
    )
    pred = {r['doc_id']: r['pred_lang'] for r in textops.language_id(df).collect()}
    assert pred[0] == 'en'
    assert pred[1] == 'es'
    assert pred[2] == 'und'


def test_quality_scores(spark):
    df = spark.createDataFrame([(0, 'the the the the', 'en')], 'doc_id long, text string, lang string')
    r = textops.quality_scores(df).collect()[0]
    assert r['n_tokens'] == 4
    assert r['mean_token_len'] == 3.0
    assert r['stopword_ratio'] == 1.0
    assert r['distinct_ratio'] == 0.25
    # 0.4*0.04 + 0.3*0.25 + 0.2*1.0 + 0.1*0.375 = 0.3285
    assert r['score'] == 0.3285


def test_token_counts(docs):
    rows = {r['lang']: r for r in textops.token_counts(docs).collect()}
    assert rows['en']['n_docs'] == 3
    assert rows['fr']['total_tokens'] == 10
    # subwords for doc 3 = sum(ceil(len/4)): one,two,four,five,six,nine,ten=1
    # each; three,seven,eight=2 each → 7 + 6 = 13
    assert rows['fr']['total_subwords'] == 13


def test_document_fingerprints_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(0, 'alpha beta gamma'), (1, 'gamma beta alpha'), (2, 'alpha beta gamma')],
        'doc_id long, text string',
    )
    fps = {r['doc_id']: (r['fp_weighted'], r['fp_xor'])
           for r in textops.document_fingerprints(df).collect()}
    assert fps[0] == fps[2]
    assert fps[0][0] != fps[1][0]  # weighted fingerprint is order-sensitive
    assert fps[0][1] == fps[1][1]  # xor fold is order-insensitive


def test_sessionize(spark):
    base = pd.Timestamp('2024-01-01 00:00:00')
    rows = [
        (1, 100, base.to_pydatetime()),
        (2, 100, (base + pd.Timedelta(minutes=10)).to_pydatetime()),  # session 0
        (3, 100, (base + pd.Timedelta(minutes=50)).to_pydatetime()),  # gap 40m → session 1
        (4, 200, base.to_pydatetime()),                               # other user
    ]
    ev = spark.createDataFrame(rows, 'event_id long, user_id long, ts timestamp')
    stats = {r['user_id']: r for r in sessions.session_stats(ev, gap_s=1800).collect()}
    assert stats[100]['n_sessions'] == 2
    assert stats[100]['max_session_events'] == 2
    assert stats[200]['n_sessions'] == 1

    sess = sessions.sessionize(ev, gap_s=1800).collect()
    assert {(r['user_id'], r['session_id']): r['n_events'] for r in sess} == {
        (100, 0): 2, (100, 1): 1, (200, 0): 1,
    }


def test_containment_pairs(spark):
    df = spark.createDataFrame(
        [(0, 'a b c d e', 'en', 's', 9),                      # short doc
         (1, 'a b c d e f g h i j k l', 'en', 's', 23),       # contains doc 0
         (2, 'z y x w v u t s r q', 'en', 's', 19)],          # unrelated
        DOC_SCHEMA,
    )
    rows = {(r['doc_contained'], r['doc_container']): r['containment']
            for r in dedup.containment_pairs(df, n=3, threshold=0.9).collect()}
    assert rows[(0, 1)] == 1.0      # all of doc 0's shingles appear in doc 1
    assert (1, 0) not in rows       # asymmetric: doc 1 is not contained in doc 0
    assert all(2 not in p for p in rows)


def test_ivf_assignments_and_topk(emb):
    assign = {r['vec_id']: r['cell'] for r in similarity.ivf_assignments(emb).collect()}
    # label-0 vectors cluster near (1,0,0,0); 3 and 4 are opposite so the
    # label-1 centroid is ~origin — all that matters is determinism + a
    # valid cell per vector
    assert set(assign) == {0, 1, 2, 3, 4}
    assert assign[0] == assign[1]  # identical vectors share a cell
    rows = similarity.ivf_topk(emb, n_queries=1, k=2).collect()
    by_rank = sorted(rows, key=lambda r: r['rank'])
    assert by_rank[0]['neighbor_id'] == 1 and by_rank[0]['cosine'] == 1.0


def test_ivf_nprobe_improves_recall(spark):
    """Multi-probe IVF: the query's true nearest neighbor lives across the
    cell boundary (L2 cells split on magnitude; cosine ignores it), so
    nprobe=1 misses it and nprobe=2 finds it."""
    rows = [(0, 0, [3.0, 3.0]),   # query: cell 0, but points along (1,1)
            (1, 0, [5.0, 0.0]),
            (2, 0, [0.0, 5.0]),
            (3, 1, [6.0, 6.0]),   # cosine-identical direction to the query
            (4, 1, [6.2, 6.0]),
            (5, 1, [5.0, 5.2])]
    emb = spark.createDataFrame(rows, 'vec_id long, label long, embedding array<double>')
    one = similarity.ivf_topk(emb, n_queries=1, k=1, nprobe=1).collect()
    two = similarity.ivf_topk(emb, n_queries=1, k=1, nprobe=2).collect()
    assert one[0]['neighbor_id'] == 1 and abs(one[0]['cosine'] - 0.707107) < 1e-5
    assert two[0]['neighbor_id'] == 3 and two[0]['cosine'] == 1.0


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(0, '  Hello,  WORLD!! 42 foo_bar  ', 'en', 's', 30),
         (1, 'hello world 42 foo bar', 'en', 's', 22)],
        DOC_SCHEMA,
    )
    rows = {r['doc_id']: r for r in textops.normalize_text(df).collect()}
    assert rows[0]['norm_text'] == 'hello world 42 foo bar'
    # cosmetic variants collapse to the same normalized form
    assert rows[0]['norm_text'] == rows[1]['norm_text']
    assert rows[0]['n_chars_norm'] == 22


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(0, 'write to alice.j+spam@mail.example.com or bob@x.io today', 'en', 's', 1),
         (1, 'call +1 (415) 555-0199 or 020 7946-0958 now', 'en', 's', 1),
         (2, 'hosts 10.0.0.1 and 192.168.255.254 are up', 'en', 's', 1),
         (3, 'no pii here at all', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    rows = {r['doc_id']: r for r in textops.redact_pii(df).collect()}
    assert (rows[0]['n_emails'], rows[0]['n_ipv4'], rows[0]['n_phones']) == (2, 0, 0)
    assert rows[0]['redacted_text'] == 'write to <EMAIL> or <EMAIL> today'
    assert rows[1]['n_phones'] == 2
    assert rows[1]['redacted_text'] == 'call <PHONE> or <PHONE> now'
    assert (rows[2]['n_ipv4'], rows[2]['n_phones']) == (2, 0)
    assert rows[2]['redacted_text'] == 'hosts <IPV4> and <IPV4> are up'
    assert rows[3]['redacted_text'] == 'no pii here at all'
    assert (rows[3]['n_emails'], rows[3]['n_ipv4'], rows[3]['n_phones']) == (0, 0, 0)


def test_repetition_scores(spark):
    docs = spark.createDataFrame(
        [(0, 'a a a b', 'en', 's', 1),
         (1, 'x y x y x y', 'en', 's', 1),
         (2, 'q w', 'en', 's', 1),
         (3, 'z z z z z', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    rows = {r['doc_id']: r for r in textops.repetition_scores(docs, n=3).collect()}
    assert rows[0]['top_token_frac'] == 0.75 and rows[0]['dup_ngram_frac'] == 0.0
    assert rows[1]['top_token_frac'] == 0.5 and rows[1]['dup_ngram_frac'] == 0.5
    assert rows[2]['top_token_frac'] == 0.5 and rows[2]['dup_ngram_frac'] == 0.0
    assert rows[3]['top_token_frac'] == 1.0 and rows[3]['dup_ngram_frac'] == 0.6667
    assert rows[1]['n_tokens'] == 6


def test_minhash_incremental_against_index(spark):
    base = spark.createDataFrame(
        [(0, 'alpha beta gamma delta epsilon zeta eta theta iota kappa', 'en', 's', 1),
         (1, 'one two three four five six seven eight nine ten', 'en', 's', 1),
         (2, 'red orange yellow green blue indigo violet pink brown black', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    new = spark.createDataFrame(
        [(100, 'one two three four five six seven eight nine ten', 'en', 's', 1),
         (101, 'totally unrelated fresh words appearing nowhere else at all ok', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    index = dedup.minhash_signatures(base, k=16, n=3)
    out = dedup.minhash_pairs_against_index(new, index, k=16, bands=4, n=3,
                                            min_matches=8).collect()
    assert len(out) == 1
    row = out[0]
    assert (row['new_doc_id'], row['index_doc_id'], row['matches']) == (100, 1, 16)


def test_corpus_freq_scores(spark):
    # corpus: 'a' x4, 'b' x2, 'z' x1, 'q' x1 -> total 8 tokens
    docs = spark.createDataFrame(
        [(0, 'a a a b', 'en', 's', 1), (1, 'a b z q', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    rows = {r['doc_id']: r for r in textops.corpus_freq_scores(docs).collect()}
    # ppm: a=500000, b=250000, z=q=125000
    assert rows[0]['n_tokens'] == 4
    assert rows[0]['avg_token_freq_ppm'] == (3 * 500000 + 250000) // 4
    assert rows[0]['min_token_freq_ppm'] == 250000
    assert rows[1]['avg_token_freq_ppm'] == (500000 + 250000 + 125000 + 125000) // 4
    assert rows[1]['min_token_freq_ppm'] == 125000


def test_tfidf_keywords(spark):
    docs = spark.createDataFrame(
        [(0, 'apple apple banana common', 'en', 's', 1),
         (1, 'banana cherry common common', 'en', 's', 1),
         (2, 'common plain words here', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    out = textops.tfidf_keywords(docs, k=2).collect()
    top = {r['doc_id']: [] for r in out}
    for r in sorted(out, key=lambda r: (r['doc_id'], r['rank'])):
        top[r['doc_id']].append(r['keyword'])
    # doc 0: apple tf=2 df=1 -> 2*3e6; banana tf=1 df=2 -> 1.5e6; common 1e6
    assert top[0] == ['apple', 'banana']
    # doc 1: cherry 3e6; common tf=2 df=3 -> 2e6; banana 1.5e6
    assert top[1] == ['cherry', 'common']
    # doc 2: here/plain/words all 3e6, tie -> token asc; common 1e6
    assert top[2] == ['here', 'plain']


def test_classifier_scores_mean_weight_and_sign(spark):
    from scalpel_spark.operators import textops as t

    docs = spark.createDataFrame(
        [(0, 'aa bb aa', 'en', 's', 1)], DOC_SCHEMA)
    # tiny injectable model: every bucket weight +5 except bucket of 'bb'
    w = t.classifier_weights(spark, n_buckets=8, seed=3)
    out = t.classifier_scores(docs, w, n_buckets=8).collect()[0]
    assert out['n_tokens'] == 3
    # recompute expected from the same deterministic weights
    import hashlib

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    weights = {b: h60(f'3-{b}') % 2001 - 1000 for b in range(8)}
    toks = ['aa', 'bb', 'aa']
    total = sum(weights[h60(tok) % 8] for tok in toks)
    assert out['score_ppm'] == (total * 1000) // 3
    assert out['pred_keep'] == (total > 0)


def test_classifier_scores_trained_weights_injectable(spark):
    from scalpel_spark.operators import textops as t

    docs = spark.createDataFrame(
        [(0, 'good good', 'en', 's', 1), (1, 'bad bad', 'en', 's', 1)],
        DOC_SCHEMA)
    import hashlib

    def bucket(tok, n=16):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n

    w = spark.createDataFrame(
        [(bucket('good'), 10), (bucket('bad'), -10)]
        + [(b, 0) for b in range(16) if b not in (bucket('good'), bucket('bad'))],
        'bucket LONG, weight LONG')
    out = {r['doc_id']: r['pred_keep'] for r in
           t.classifier_scores(docs, w, n_buckets=16).collect()}
    assert out == {0: True, 1: False}


def test_bigram_lm_scores_self_trained(spark):
    # corpus bigrams: (a,b) x2 from doc0+doc1, (b,a) x1, (a,c) x1
    # prefix counts: a-> 3, b-> 1
    docs = spark.createDataFrame(
        [(0, 'a b a', 'en', 's', 1), (1, 'a b', 'en', 's', 1),
         (2, 'a c', 'en', 's', 1), (3, 'solo', 'en', 's', 1)],
        DOC_SCHEMA,
    )
    rows = {r['doc_id']: r for r in textops.bigram_lm_scores(docs).collect()}
    assert 3 not in rows  # single-token doc has no bigrams
    # cond ppm: (a,b) = 2*1e6//3 = 666666; (b,a) = 1e6; (a,c) = 1e6//3 = 333333
    assert rows[0]['n_bigrams'] == 2
    assert rows[0]['avg_cond_ppm'] == (666666 + 1000000) // 2
    assert rows[0]['min_cond_ppm'] == 666666
    assert rows[1]['avg_cond_ppm'] == 666666
    assert rows[2]['avg_cond_ppm'] == 333333


def test_bigram_lm_scores_external_model(spark):
    # model trained on ref; crawl doc with an unseen bigram scores it 0 ppm
    ref = spark.createDataFrame([(0, 'x y x y', 'en', 's', 1)], DOC_SCHEMA)
    crawl = spark.createDataFrame([(9, 'x y zz', 'en', 's', 1)], DOC_SCHEMA)
    model = textops.bigram_model(ref)
    r = textops.bigram_lm_scores(crawl, model=model).collect()[0]
    # (x,y): c=2, pfx(x)=2 -> 1e6; (y,zz): unseen -> 0
    assert r['n_bigrams'] == 2
    assert r['avg_cond_ppm'] == 500000
    assert r['min_cond_ppm'] == 0


def test_normalize_unicode_nfc_and_nfkc(spark):
    """Combining sequences compose under NFC; compatibility forms
    (fullwidth, ligature) fold only under NFKC; None stays None."""
    from scalpel_spark.operators.textops import normalize_unicode

    docs = spark.createDataFrame([
        ('d1', 'café'),          # e + combining acute
        ('d2', 'café'),           # precomposed
        ('d3', 'ＡＢ'),        # fullwidth AB
        ('d4', 'ﬁle'),            # fi ligature
        ('d5', 'plain'),
        ('d6', None),
    ], 'doc_id string, text string')
    nfc = {r['doc_id']: (r['norm_unicode'], r['changed'])
           for r in normalize_unicode(docs, 'NFC').collect()}
    assert nfc['d1'] == ('café', True)
    assert nfc['d2'] == ('café', False)
    assert nfc['d3'] == ('ＡＢ', False)   # NFC keeps fullwidth
    assert nfc['d5'] == ('plain', False)
    assert nfc['d6'][0] is None
    nfkc = {r['doc_id']: r['norm_unicode']
            for r in normalize_unicode(docs, 'NFKC').collect()}
    assert nfkc['d3'] == 'AB'
    assert nfkc['d4'] == 'file'
    # after NFC, d1 and d2 fingerprint identically (the dedup motivation)
    assert nfc['d1'][0] == nfc['d2'][0]


# ---------------------------------------------------------------------------
# token_spectrum / vocab_growth: corpus statistics
# ---------------------------------------------------------------------------


def test_token_spectrum_count_of_counts(spark):
    from scalpel_spark.operators.textops import token_spectrum

    docs = spark.createDataFrame(
        [(0, 'a a a b b c'), (1, 'a d')],
        'doc_id LONG, text STRING')
    got = {r['freq']: r['n_types'] for r in token_spectrum(docs).collect()}
    # a:4, b:2, c:1, d:1
    assert got == {4: 1, 2: 1, 1: 2}


def test_vocab_growth_monotone_and_totals(spark):
    import pytest as _pytest

    from scalpel_spark.operators.textops import vocab_growth

    docs = spark.createDataFrame(
        [(i, f'w{i % 7} w{i % 13} shared') for i in range(64)],
        'doc_id LONG, text STRING')
    rows = sorted(vocab_growth(docs, n_points=8).collect(),
                  key=lambda r: r['point'])
    # cumulative counts are monotone and end at the exact totals
    toks = [r['tokens_cum'] for r in rows]
    vocab = [r['vocab_cum'] for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    assert toks[-1] == 64 * 3
    assert vocab[-1] == 13 + 1  # w0..w12 (the %7 names overlap), shared
    with _pytest.raises(ValueError):
        vocab_growth(docs, n_points=6)


def test_vocab_growth_prefix_definition_matches_python(spark):
    import hashlib

    from scalpel_spark.operators.textops import vocab_growth

    docs = [(i, f't{i} common') for i in range(32)]
    df = spark.createDataFrame(docs, 'doc_id LONG, text STRING')
    rows = {r['point']: r for r in vocab_growth(df, n_points=4).collect()}

    def bucket(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h >> 58  # 60 - log2(4)

    seen, growth = set(), {}
    for b in range(4):
        for i, text in docs:
            if bucket(i) == b:
                seen.update(text.split())
        growth[b] = len(seen)
    for b, r in rows.items():
        assert r['vocab_cum'] == growth[b], b
