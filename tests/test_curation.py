"""End-to-end curation pipeline: quality gate -> exact dedup -> near-dup
clustering -> keep-one-drop-rest, plus the deterministic token-budget
sampler. The sampler tests recompute the greedy fill in plain Python
(md5-derived shuffle keys) as an independent oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators import curation, textops

DOC_SCHEMA_SRC = 'doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG'


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _verdicts(df):
    return {r['doc_id']: (r['verdict'], r['cluster_id']) for r in df.collect()}


def _corpus(spark):
    t1 = ' '.join(f'w{i}' for i in range(30))
    t2 = ' '.join(f'W{i},' for i in range(30))  # normalizes to t1 exactly
    t3 = ' '.join([f'w{i}' for i in range(26)] + [f'x{i}' for i in range(4)])
    t5 = ' '.join(f'y{i}' for i in range(30))
    return spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (5, t5)], 'doc_id long, text string')


def test_curate_dedup_stages(spark):
    # threshold 0 disables the quality gate so only the dedup stages fire:
    # doc 2 is a cosmetic (case/punct) variant of 1 -> exact_dup; doc 3
    # shares 23 of its 27 4-gram shingles with 1 (j = 23/31 = 0.74) ->
    # near_dup; doc 5 is unrelated -> kept
    out = _verdicts(curation.curate(_corpus(spark), quality_threshold=0.0))
    assert out[1] == ('kept', 1)
    assert out[2] == ('exact_dup', 1)
    assert out[3] == ('near_dup', 1)
    assert out[5] == ('kept', 5)


def test_curate_quality_gate_runs_first(spark):
    # threshold strictly between doc 1's score and doc 2's (doc 2's longer
    # comma-suffixed tokens raise mean_token_len, so it scores higher):
    # doc 1 drops at the gate and never reaches the dedup stages, making
    # its cosmetic twin doc 2 the exact-canonical and the near-dup anchor
    docs = _corpus(spark)
    scores = {r['doc_id']: r['score'] for r in textops.quality_scores(docs).collect()}
    lower = max(scores[1], scores[3], scores[5])
    assert lower < scores[2]
    thr = (lower + scores[2]) / 2
    out = _verdicts(curation.curate(docs, quality_threshold=thr))
    assert out[1] == ('low_quality', -1)
    assert out[3][0] == 'low_quality' and out[5][0] == 'low_quality'
    # doc 2 was an exact_dup in the other test; with its twin gone at the
    # gate it is now the canonical survivor
    assert out[2] == ('kept', 2)
    # every input doc gets exactly one verdict row
    assert set(out) == {1, 2, 3, 5}


def test_curate_all_kept_when_no_dups(spark):
    docs = spark.createDataFrame(
        [(i, ' '.join(f'z{i}_{j}' for j in range(25))) for i in range(4)],
        'doc_id long, text string')
    out = _verdicts(curation.curate(docs, quality_threshold=0.0))
    assert out == {d: ('kept', d) for d in range(4)}


def _sample_corpus(spark):
    rows = []
    for i in range(40):
        lang = 'en' if i % 2 == 0 else 'fr'
        n_tok = 5 + (i * 7) % 23
        rows.append((i, ' '.join(f't{i}_{j}' for j in range(n_tok)), lang))
    return spark.createDataFrame(rows, 'doc_id long, text string, lang string')


def _expected_greedy(rows, budget):
    # independent Python oracle: greedy fill per lang in (md5 key, doc_id)
    # order, keep while the running total BEFORE the doc is under budget
    by_lang: dict[str, list] = {}
    for doc_id, text, lang in rows:
        by_lang.setdefault(lang, []).append((_h60(str(doc_id)), doc_id, len(text.split(' '))))
    kept = {}
    for lang, docs in by_lang.items():
        cum = 0
        for _, doc_id, nt in sorted(docs):
            if cum < budget:
                kept[doc_id] = (lang, nt, cum)
            cum += nt
    return kept


def test_token_budget_sample_matches_python_oracle(spark):
    docs = _sample_corpus(spark)
    rows = [(r['doc_id'], r['text'], r['lang']) for r in docs.collect()]
    expected = _expected_greedy(rows, budget=100)
    got = {r['doc_id']: (r['lang'], r['n_tokens'], r['cum_before'])
           for r in curation.token_budget_sample(docs, 100).collect()}
    assert got == expected
    # a meaningful split: something kept, something dropped, both langs hit
    assert 0 < len(got) < len(rows)
    assert {v[0] for v in got.values()} == {'en', 'fr'}


def test_token_budget_bucket_count_invariance(spark):
    # buckets range-partition the key space, so the kept set must be
    # identical at any power-of-two bucket count
    docs = _sample_corpus(spark)
    a = {tuple(r) for r in curation.token_budget_sample(docs, 120, n_buckets=4).collect()}
    b = {tuple(r) for r in curation.token_budget_sample(docs, 120, n_buckets=64).collect()}
    assert a == b and a


def test_token_budget_rejects_bad_bucket_count(spark):
    with pytest.raises(ValueError, match='power of two'):
        curation.token_budget_sample(_sample_corpus(spark), 100, n_buckets=48)


def test_decontaminate_flags_benchmark_overlap(spark):
    bench = spark.createDataFrame(
        [(100, 'one two three four five six seven eight nine')],
        'bench_id long, text string',
    )
    docs = spark.createDataFrame(
        [(0, 'one two three four five six seven eight tail', 'en', 's', 1),
         (1, 'zzz one two three four five six seven eight nine', 'en', 's', 1),
         (2, 'completely different words with no overlap at all here', 'en', 's', 1),
         (3, 'short doc', 'en', 's', 1)],
        'doc_id long, text string, lang string, source string, n_chars long',
    )
    rows = {r['doc_id']: r for r in curation.decontaminate(docs, bench, n=8).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]['n_matched_shingles'] == 1
    assert rows[1]['n_matched_shingles'] == 2
    assert rows[0]['first_bench_id'] == 100
    # the clean corpus is the anti-join complement
    clean = docs.join(curation.decontaminate(docs, bench, n=8), 'doc_id', 'left_anti')
    assert sorted(r['doc_id'] for r in clean.collect()) == [2, 3]


def test_source_reputation_separates_spam_source(spark):
    good = 'the quick brown fox jumps over the lazy dog'
    docs = spark.createDataFrame(
        [(0, good, 'en', 'good', 1), (1, good + ' again today', 'en', 'good', 1),
         (2, 'a a', 'en', 'bad', 1), (3, 'a a', 'en', 'bad', 1), (4, 'a a', 'en', 'bad', 1)],
        'doc_id long, text string, lang string, source string, n_chars long',
    )
    rows = {r['source']: r for r in curation.source_reputation(docs).collect()}
    assert rows['good']['n_docs'] == 2 and rows['bad']['n_docs'] == 3
    assert rows['bad']['mean_score'] < rows['good']['mean_score']
    assert rows['bad']['n_low_quality'] == 3 and rows['bad']['low_quality_frac'] == 1.0
    assert rows['good']['n_low_quality'] == 0 and rows['good']['low_quality_frac'] == 0.0


def _expected_packing(rows, seq_tokens):
    import hashlib

    order = sorted(
        (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16), doc_id, len(text.split(' ')))
        for doc_id, text, _ in rows
    )
    out, cum = {}, 0
    for _, doc_id, nt in order:
        out[doc_id] = (nt, cum, cum // seq_tokens, cum % seq_tokens,
                       cum % seq_tokens + nt > seq_tokens)
        cum += nt
    return out


def test_pack_sequences_matches_python_oracle(spark):
    docs = _sample_corpus(spark)
    rows = [(r['doc_id'], r['text'], r['lang']) for r in docs.collect()]
    expected = _expected_packing(rows, seq_tokens=64)
    got = {r['doc_id']: (r['n_tokens'], r['cum_before'], r['seq_id'],
                         r['offset'], r['spans_boundary'])
           for r in curation.pack_sequences(docs, 64).collect()}
    assert got == expected
    # every doc is packed, multiple sequences exist, some doc straddles
    assert len(got) == len(rows)
    assert len({v[2] for v in got.values()}) > 1
    assert any(v[4] for v in got.values())


def test_pack_sequences_bucket_count_invariance(spark):
    docs = _sample_corpus(spark)
    a = {tuple(r) for r in curation.pack_sequences(docs, 64, n_buckets=1).collect()}
    b = {tuple(r) for r in curation.pack_sequences(docs, 64, n_buckets=64).collect()}
    assert a == b and a


def test_pack_sequences_rejects_bad_bucket_count(spark):
    with pytest.raises(ValueError, match='power of two'):
        curation.pack_sequences(_sample_corpus(spark), 64, n_buckets=12)


def test_domain_cap_keeps_top_k_per_source(spark):
    # quality score rises with length/diversity: make doc 3 clearly worst
    rows = [
        (0, 'the quick brown fox jumps of a tree', 'en', 'src_a', 1),
        (1, 'a different and rather unique sentence of words', 'en', 'src_a', 1),
        (2, 'yet another perfectly normal document of text', 'en', 'src_a', 1),
        (3, 'spam spam spam spam', 'en', 'src_a', 1),
        (4, 'only doc of source b stays whatever happens', 'en', 'src_b', 1),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA_SRC)
    out = {r['doc_id']: r['keep'] for r in
           curation.domain_cap(docs, max_per_source=3).collect()}
    assert len(out) == 5
    assert sum(out[i] for i in (0, 1, 2, 3)) == 3  # exactly K kept in src_a
    assert out[3] is False                          # the worst one dropped
    assert out[4] is True


def test_domain_cap_tie_break_by_doc_id(spark):
    # identical text -> identical score: quota fills by ascending doc_id
    rows = [(i, 'same text here really', 'en', 's', 1) for i in range(5)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA_SRC)
    out = {r['doc_id']: r['keep'] for r in
           curation.domain_cap(docs, max_per_source=2).collect()}
    assert out == {0: True, 1: True, 2: False, 3: False, 4: False}


def test_domain_cap_matches_flat_window(spark):
    # decomposed verdicts == flat ROW_NUMBER per source on a mixed corpus
    import random

    rng = random.Random(5)
    words = ['alpha', 'beta', 'gamma', 'delta', 'the', 'a', 'of']
    rows = [(i, ' '.join(rng.choices(words, k=rng.randint(3, 12))),
             'en', f'src_{i % 3}', 1) for i in range(60)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA_SRC)
    got = {(r['doc_id']): r['keep'] for r in
           curation.domain_cap(docs, max_per_source=7).collect()}
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from scalpel_spark.functions.texthash import pround
    from scalpel_spark.operators.textops import quality_feature_cols
    feats = quality_feature_cols(F.col('text'))
    flat = docs.select('doc_id', 'source', pround(feats['score'], 4).alias('s'))
    w = Window.partitionBy('source').orderBy(F.col('s').desc(), F.col('doc_id'))
    exp = {r['doc_id']: r['rn'] <= 7 for r in
           flat.withColumn('rn', F.row_number().over(w)).collect()}
    assert got == exp


def test_pack_sequences_exact_fill_is_not_boundary(spark):
    # doc 2's 4 tokens end exactly at the capacity: offset+nt == seq_tokens
    # must NOT flag spans_boundary
    docs = spark.createDataFrame(
        [(0, 'a b c d', 'en', 's', 1), (1, 'e f g h', 'en', 's', 1)],
        DOC_SCHEMA_SRC)
    out = curation.pack_sequences(docs, seq_tokens=4, n_buckets=1).collect()
    assert all(not r['spans_boundary'] for r in out)
    assert sorted(r['offset'] for r in out) == [0, 0]


def test_domain_cap_zero_quota_drops_all(spark):
    docs = spark.createDataFrame(
        [(0, 'some words here', 'en', 's', 1)], DOC_SCHEMA_SRC)
    out = curation.domain_cap(docs, max_per_source=0).collect()
    assert [r['keep'] for r in out] == [False]


# --------------------------------------------------------------------------
# mixture_sample: explicit per-stratum training-mix weights
# --------------------------------------------------------------------------


def test_mixture_sample_respects_per_stratum_budgets(spark):
    docs = _sample_corpus(spark)
    rows = [(r['doc_id'], r['text'], r['lang']) for r in docs.collect()]
    budget, weights = 200, {'en': 400_000, 'fr': 100_000}
    got = curation.mixture_sample(docs, budget, weights).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r['lang'], []).append(r)
    for lang, members in by_lang.items():
        cap = budget * weights[lang] // 1_000_000
        assert all(r['stratum_budget'] == cap for r in members)
        # greedy fill: every kept doc started under the cap, and the kept
        # set equals the flat per-lang greedy oracle
        exp = _expected_greedy(
            [t for t in rows if t[2] == lang], budget=cap)
        assert {r['doc_id'] for r in members} == set(exp)


def test_mixture_sample_drops_unlisted_strata(spark):
    docs = _sample_corpus(spark)
    got = curation.mixture_sample(docs, 1000, {'fr': 1_000_000}).collect()
    assert got and all(r['lang'] == 'fr' for r in got)


def test_mixture_sample_bucket_count_invariance(spark):
    docs = _sample_corpus(spark)
    w = {'en': 600_000, 'fr': 300_000}
    a = {tuple(r) for r in
         curation.mixture_sample(docs, 150, w, n_buckets=4).collect()}
    b = {tuple(r) for r in
         curation.mixture_sample(docs, 150, w, n_buckets=64).collect()}
    assert a == b and a


def test_mixture_sample_zero_weight_keeps_nothing(spark):
    docs = _sample_corpus(spark)
    got = curation.mixture_sample(docs, 1000, {'en': 0}).collect()
    assert got == []


def test_assign_shards_deterministic_and_balanced(spark, tmp_path):
    from scalpel_spark.functions.texthash import hash60
    docs = spark.createDataFrame(
        [(i, f'doc {i} text body', 'en', 's', 10) for i in range(200)],
        'doc_id long, text string, lang string, source string, n_chars long')
    a1 = {r['doc_id']: r['shard'] for r in curation.assign_shards(docs, 8).collect()}
    a2 = {r['doc_id']: r['shard'] for r in
          curation.assign_shards(docs.repartition(7), 8).collect()}
    assert a1 == a2  # partition-layout independent
    assert all(0 <= s < 8 for s in a1.values())
    stats = curation.shard_stats(docs, 8).collect()
    counts = {r['shard']: r['n_docs'] for r in stats}
    assert sum(counts.values()) == 200
    # hash balance: no shard more than 3x the fair share at n=200
    assert max(counts.values()) <= 3 * 200 / 8


def test_write_training_shards_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f'text {i}', 'en', 's', 6) for i in range(50)],
        'doc_id long, text string, lang string, source string, n_chars long')
    path = str(tmp_path / 'shards')
    curation.write_training_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 50
    expect = {r['doc_id']: r['shard'] for r in curation.assign_shards(docs, 4).collect()}
    got = {r['doc_id']: int(r['shard']) for r in back.collect()}
    assert got == expect
    # partition pruning: reading one shard dir returns exactly its docs
    one = spark.read.parquet(path).filter('shard = 2')
    assert {r['doc_id'] for r in one.collect()} == {d for d, s in expect.items() if s == 2}


def _chunk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, 'en', 's', len(t)) for i, t in rows],
        'doc_id long, text string, lang string, source string, n_chars long')


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = _chunk_docs(spark, [(1, 'a b c')])
    got = curation.chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r['chunk_seq'], r['start'], r['chunk_len'], r['chunk_text']) == (0, 0, 3, 'a b c')


def test_chunk_documents_overlap_and_tail(spark):
    # 10 tokens, chunk=6, overlap=2 -> stride 4 -> starts 0,4,8
    text = ' '.join(f't{i}' for i in range(10))
    docs = _chunk_docs(spark, [(7, text)])
    got = sorted(curation.chunk_documents(docs, chunk_tokens=6, overlap=2).collect(),
                 key=lambda r: r['chunk_seq'])
    assert [(r['start'], r['chunk_len']) for r in got] == [(0, 6), (4, 6), (8, 2)]
    # consecutive chunks share exactly the overlap tokens
    assert got[0]['chunk_text'].split()[-2:] == got[1]['chunk_text'].split()[:2]
    assert got[2]['chunk_text'] == 't8 t9'


def test_chunk_documents_exact_boundary_no_empty_tail(spark):
    # 8 tokens, chunk=4, overlap=0 -> exactly 2 chunks, no empty third
    text = ' '.join(f'w{i}' for i in range(8))
    docs = _chunk_docs(spark, [(3, text)])
    got = curation.chunk_documents(docs, chunk_tokens=4, overlap=0).collect()
    assert sorted((r['start'], r['chunk_len']) for r in got) == [(0, 4), (4, 4)]


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = _chunk_docs(spark, [(1, 'x')])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.chunk_documents(docs, chunk_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# epoch_layout: per-epoch deterministic shuffle + shard layout
# ---------------------------------------------------------------------------


def test_epoch_layout_is_a_permutation_and_bucket_invariant(spark):
    import hashlib

    from scalpel_spark.operators.curation import epoch_layout

    docs = spark.createDataFrame([(i,) for i in range(200)], 'doc_id LONG')
    outs = []
    for nb in (1, 8, 64):
        rows = epoch_layout(docs, n_shards=4, epoch=1, n_buckets=nb).collect()
        outs.append(sorted((r['doc_id'], r['shard'], r['pos_in_shard'])
                           for r in rows))
    assert outs[0] == outs[1] == outs[2]
    rows = outs[0]
    assert len(rows) == 200
    # within each shard, positions are dense 0..n-1
    by_shard = {}
    for d, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # shard-major order equals global md5-key order (shards are key ranges)
    def key(doc_id):
        h = hashlib.md5(f'e1|{doc_id}'.encode()).hexdigest()
        return int(h[:15], 16)
    global_order = sorted((d for d, _, _ in rows), key=lambda d: (key(d), d))
    layout_order = [d for d, _, _ in sorted(rows, key=lambda t: (t[1], t[2]))]
    assert layout_order == global_order


def test_epoch_layout_epochs_differ_and_validate(spark):
    import pytest as _pytest

    from scalpel_spark.operators.curation import epoch_layout

    docs = spark.createDataFrame([(i,) for i in range(50)], 'doc_id LONG')
    e0 = {r['doc_id']: (r['shard'], r['pos_in_shard'])
          for r in epoch_layout(docs, n_shards=4, epoch=0).collect()}
    e1 = {r['doc_id']: (r['shard'], r['pos_in_shard'])
          for r in epoch_layout(docs, n_shards=4, epoch=1).collect()}
    assert e0 != e1  # a different permutation per epoch
    assert set(e0) == set(e1)
    with _pytest.raises(ValueError):
        epoch_layout(docs, n_shards=3)
    with _pytest.raises(ValueError):
        epoch_layout(docs, n_shards=4, n_buckets=5)


# ---------------------------------------------------------------------------
# chunk_documents_cdc: content-defined chunk boundaries
# ---------------------------------------------------------------------------


def test_cdc_chunks_cover_and_are_shift_resistant(spark):
    import pytest as _pytest

    from scalpel_spark.operators.curation import chunk_documents_cdc

    words = [f'w{i}' for i in range(200)]
    base = ' '.join(words)
    edited = ' '.join(['INSERTED'] + words)  # one token prepended
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], 'doc_id LONG, text STRING')
    out = chunk_documents_cdc(docs, mean_tokens=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r['doc_id'], []).append(r)
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r['chunk_seq'])
        # chunks tile the document exactly
        joined = ' '.join(c['chunk_text'] for c in chunks)
        assert joined == (base if d == 0 else edited)
        assert chunks[0]['start'] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b['start'] == a['start'] + a['chunk_len']
    # shift resistance: all base chunks except the first reappear
    # verbatim in the edited doc (fixed-stride would share none)
    base_texts = {c['chunk_text'] for c in by_doc[0]}
    edit_texts = {c['chunk_text'] for c in by_doc[1]}
    shared = base_texts & edit_texts
    assert len(shared) >= len(base_texts) - 1
    with _pytest.raises(ValueError):
        chunk_documents_cdc(docs, mean_tokens=10)


def test_cdc_boundary_is_content_mask(spark):
    import hashlib

    from scalpel_spark.operators.curation import chunk_documents_cdc

    words = [f'tok{i}' for i in range(64)]
    docs = spark.createDataFrame(
        [(0, ' '.join(words))], 'doc_id LONG, text STRING')
    out = sorted(chunk_documents_cdc(docs, mean_tokens=8).collect(),
                 key=lambda r: r['chunk_seq'])

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # recompute expected boundaries in pure Python
    expected_chunks, cur = [], []
    for w in words:
        cur.append(w)
        if h60(w) % 8 == 0:
            expected_chunks.append(cur)
            cur = []
    if cur:
        expected_chunks.append(cur)
    assert [c['chunk_text'] for c in out] == [' '.join(c) for c in expected_chunks]


def test_hash_sample_consistent_and_joinable(spark):
    import pytest as _pytest

    from scalpel_spark.operators.curation import hash_sample

    docs = spark.createDataFrame([(i, f'd{i}') for i in range(1000)],
                                 'doc_id LONG, text STRING')
    a = {r['doc_id'] for r in hash_sample(docs, 250_000, 'doc_id').collect()}
    b = {r['doc_id'] for r in hash_sample(docs, 250_000, 'doc_id').collect()}
    assert a == b and 150 < len(a) < 350  # deterministic, ~25%
    # a different table sampled on the same keys keeps the SAME keys
    other = spark.createDataFrame([(i, i * 2) for i in range(1000)],
                                  'doc_id LONG, v LONG')
    c = {r['doc_id'] for r in hash_sample(other, 250_000, 'doc_id').collect()}
    assert c == a
    # salt derives an independent sample; rate bounds enforced
    d = {r['doc_id'] for r in
         hash_sample(docs, 250_000, 'doc_id', salt='s2').collect()}
    assert d != a
    assert hash_sample(docs, 0, 'doc_id').count() == 0
    assert hash_sample(docs, 1_000_000, 'doc_id').count() == 1000
    with _pytest.raises(ValueError):
        hash_sample(docs, 1_000_001, 'doc_id')


def test_curation_report_rollup(spark):
    from scalpel_spark.operators.curation import curation_report

    verdicts = spark.createDataFrame(
        [(0, 'kept'), (1, 'low_quality'), (2, 'exact_dup'),
         (3, 'near_dup'), (4, 'kept'), (5, 'kept')],
        'doc_id LONG, verdict STRING')
    docs = spark.createDataFrame(
        [(i, 'srcA' if i < 4 else 'srcB') for i in range(6)],
        'doc_id LONG, source STRING')
    out = {r['group']: r for r in curation_report(verdicts, docs).collect()}
    a = out['srcA']
    assert (a['n_docs'], a['n_kept'], a['n_low_quality'],
            a['n_exact_dup'], a['n_near_dup']) == (4, 1, 1, 1, 1)
    assert a['kept_ppm'] == 250_000
    assert out['srcB']['kept_ppm'] == 1_000_000
