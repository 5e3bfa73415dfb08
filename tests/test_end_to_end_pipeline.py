"""End-to-end training-data pipeline over the WARC interchange loop:

    WARC files  →  read_warc  →  warc_to_corpus (interleaved spans)
                →  text extraction  →  curate (quality + exact + near dup)
                →  pack_sequences (training layout)
                →  epoch_layout (shard files)
                →  warc_record_bytes / write_warc_shards (re-export)
                →  read_warc (round trip closes)

One test drives the whole chain a reference user would run when
switching their archive pipeline to this engine — every stage is an
operator under test elsewhere; here the CONTRACTS between them are the
subject (schemas line up, verdicts partition the corpus, layouts cover
exactly the kept set, the re-export round-trips).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_warc_to_training_shards_and_back(spark, tmp_path):
    from scalpel_spark.operators.curation import (
        curate,
        epoch_layout,
        pack_sequences,
    )
    from scalpel_spark.sources.warc import (
        read_warc,
        warc_record_bytes,
        warc_to_corpus,
        write_synthetic_warc,
        write_warc_shards,
    )

    # -- ingest: two archives, one gzipped ------------------------------
    wdir = tmp_path / 'in'
    wdir.mkdir()
    write_synthetic_warc(str(wdir / 'a.warc'), n_records=40, seed=3,
                         with_images=True)
    write_synthetic_warc(str(wdir / 'b.warc.gz'), n_records=25, seed=4,
                         gzip_file=True)
    records = read_warc(spark, str(wdir))
    corpus = warc_to_corpus(records)
    n_captures = corpus.count()
    # the two archives re-capture overlapping URLs — dedupe captures
    # (exact URL identity; CDX revisit logic handles the general case)
    corpus = corpus.dropDuplicates(['doc_id'])
    n_docs = corpus.count()
    assert 0 < n_docs < n_captures

    # spans -> flat text docs (the documents-table shape downstream
    # operators consume); doc ids re-keyed to longs for the curation ops
    docs = corpus.select(
        F.xxhash64('doc_id').alias('doc_id'),
        F.col('doc_id').alias('url'),
        F.array_join(
            F.transform(
                F.filter('spans', lambda s: s['kind'] == 'text'),
                lambda s: s['text']),
            ' ').alias('text'),
    ).withColumn('n_chars', F.length('text'))
    assert docs.select('doc_id').distinct().count() == n_docs

    # -- curate: one verdict row per doc, verdicts partition the corpus -
    verdicts = curate(docs, quality_threshold=0.05, n=4,
                      jaccard_threshold=0.5)
    assert verdicts.count() == n_docs
    kinds = {r['verdict'] for r in verdicts.select('verdict').distinct().collect()}
    assert 'kept' in kinds
    kept = verdicts.filter(F.col('verdict') == 'kept').select('doc_id')
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    kept_docs = docs.join(kept, 'doc_id')

    # -- training layout: packing covers exactly the kept set ----------
    packed = pack_sequences(kept_docs, seq_tokens=32)
    assert packed.count() == n_kept
    assert packed.filter(F.col('seq_id') < 0).count() == 0

    shards = epoch_layout(kept_docs, n_shards=4, epoch=0)
    assert shards.count() == n_kept
    # dense positions within every shard
    per = shards.groupBy('shard').agg(
        F.count(F.lit(1)).alias('n'), F.max('pos_in_shard').alias('mx'))
    for r in per.collect():
        assert r['mx'] == r['n'] - 1

    # -- re-export kept docs as WARC and read them back ----------------
    out_dir = str(tmp_path / 'out')
    export = kept_docs.select(
        'url',
        F.lit(200).cast('int').alias('status'),
        F.lit('text/plain').alias('content_type'),
        F.encode('text', 'UTF-8').alias('body'),
        F.concat(F.lit('<urn:uuid:'), F.col('doc_id').cast('string'),
                 F.lit('>')).alias('record_id'),
    )
    manifest = write_warc_shards(warc_record_bytes(export), out_dir,
                                 n_shards=2)
    assert sum(r['n_records'] for r in manifest.collect()) == n_kept
    back = read_warc(spark, out_dir)
    round_tripped = {
        (r['target_uri'], bytes(r['payload']).decode())
        for r in back.collect()
    }
    want = {(r['url'], r['text']) for r in kept_docs.collect()}
    assert round_tripped == want
