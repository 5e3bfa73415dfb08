"""Multimodal plumbing tests: schema, Arrow batch shape, decode quarantine,
span-order preservation (BASELINE.json per-row invariant)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scalpel_spark.operators import multimodal as mm
from scalpel_spark.sources.corpus import golden_site, synthetic_corpus


@pytest.fixture(scope='module')
def media(spark):
    return mm.synthetic_media(spark, 30).persist()


def test_synthetic_media_deterministic(spark, media):
    again = mm.synthetic_media(spark, 30)
    assert media.exceptAll(again).isEmpty() and again.exceptAll(media).isEmpty()
    kinds = {r['kind'] for r in media.select('kind').distinct().collect()}
    assert kinds <= {'image', 'audio', 'video'}
    assert media.filter(F.length('payload') != 32).count() == 0


def test_extract_features_fake_decode(media):
    feats = mm.extract_media_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r['decode_ok']
        assert len(r['feature']) == 8
        assert r['n_bytes'] == 32
        assert all(0.0 <= v < 1.0 for v in r['feature'])


def test_extract_features_quarantines_failures(media):
    def flaky(payload: bytes, kind: str) -> np.ndarray:
        if kind == 'video':
            raise ValueError('no codec')
        return mm.fake_decode(payload, kind)

    feats = mm.extract_media_features(media, decode_fn=flaky).collect()
    bad = [r for r in feats if not r['decode_ok']]
    assert all(r['kind'] == 'video' for r in bad)
    assert all(r['feature'] == [] for r in bad)
    assert len(bad) == sum(1 for r in feats if r['kind'] == 'video')


def test_real_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.real_decode_stub(b'\x00' * 8, 'image')


def test_resize_plan_aspect_ratio(media):
    plans = mm.resize_plan(media, max_side=256).collect()
    for r in plans:
        assert max(r['target_width'], r['target_height']) <= 256
        if max(r['width'], r['height']) <= 256:
            assert (r['target_width'], r['target_height']) == (r['width'], r['height'])
        else:  # ceil keeps proportions within 1px
            ratio = r['width'] / r['height']
            t_ratio = r['target_width'] / r['target_height']
            assert abs(ratio - t_ratio) / ratio < 0.15


def test_frame_sample_plan(media):
    plans = mm.frame_sample_plan(media, every_ms=1000)
    joined = plans.groupBy('media_ref').agg(
        F.count('*').alias('n'), F.max('ts_ms').alias('last_ts')
    ).join(media.filter("kind = 'video'"), 'media_ref')
    for r in joined.collect():
        assert r['n'] == r['duration_ms'] // 1000 + 1
        assert r['last_ts'] <= r['duration_ms']


def test_join_spans_to_media_preserves_order(spark):
    corpus = synthetic_corpus(spark, n_pages=60, n_hosts=5, seed=42)
    docs = corpus.select('doc_id', 'spans')
    media_refs = (
        docs.select(F.explode(F.filter('spans', lambda s: s['kind'] == F.lit('media'))).alias('s'))
        .select(F.col('s.media_ref').alias('media_ref'))
        .distinct()
    )
    media = media_refs.withColumn('kind', F.lit('image')).withColumn(
        'payload', F.to_binary(F.md5('media_ref'), F.lit('hex'))
    )
    joined = mm.join_spans_to_media(docs, media)
    n_spans = docs.select(
        F.explode(F.filter('spans', lambda s: s['kind'] == F.lit('media')))
    ).count()
    assert joined.count() == n_spans  # left join loses no spans
    assert joined.filter(F.col('payload').isNull()).count() == 0
    # offsets preserved verbatim: join back on (doc_id, media_ref) and compare
    orig = docs.select(
        'doc_id',
        F.explode(F.filter('spans', lambda s: s['kind'] == F.lit('media'))).alias('s'),
    ).select('doc_id', F.col('s.media_ref').alias('media_ref'), F.col('s.offset').alias('orig_offset'))
    mismatch = joined.join(orig, ['doc_id', 'media_ref']).filter(
        F.col('offset') != F.col('orig_offset')
    )
    assert mismatch.count() == 0


def test_golden_site_has_no_media(spark):
    docs = golden_site(spark, 'http').select('doc_id', 'spans')
    media = mm.synthetic_media(spark, 5)
    assert mm.join_spans_to_media(docs, media).count() == 0


def test_media_frontier_dedup_and_host_parse(spark):
    """media_frontier: media spans → distinct new refs with parsed host,
    anti-joined against the already-fetched set; NULL refs and non-media
    spans never schedule."""
    from scalpel_spark.sources.corpus import SPAN_TYPE

    schema = T.StructType([
        T.StructField('doc_id', T.StringType()),
        T.StructField('spans', SPAN_TYPE),
    ])
    mk = lambda kind, text, ref, off: {'kind': kind, 'text': text, 'media_ref': ref, 'offset': off}
    docs = spark.createDataFrame([
        ('d1', [mk('text', 'a', None, 0), mk('media', None, 'img://hA/1', 1),
                mk('media', None, 'img://hB/2', 2)]),
        ('d2', [mk('media', None, 'img://hA/1', 0),   # duplicate ref across docs
                mk('media', None, None, 1),           # NULL ref never schedules
                mk('link', 'u', None, 2)]),
        ('d3', [mk('media', None, 'img://hA/3', 0)]),
    ], schema)
    all_new = {(r['media_ref'], r['media_host'])
               for r in mm.media_frontier(docs).collect()}
    assert all_new == {('img://hA/1', 'hA'), ('img://hB/2', 'hB'), ('img://hA/3', 'hA')}
    seen = spark.createDataFrame([('img://hA/1',)], 'media_ref string')
    fresh = {r['media_ref'] for r in mm.media_frontier(docs, seen_media=seen).collect()}
    assert fresh == {'img://hB/2', 'img://hA/3'}


def test_sniff_content_type_magic_bytes(spark):
    """sniff_content_type: every prefix family, both two-part probes
    (RIFF tag, ISO-BMFF ftyp), and the octet-stream fallback — built
    from real byte literals, not hex strings."""
    cases = [
        (b'\xff\xd8\xff\xe0' + b'JFIF....', 'image/jpeg'),
        (b'\x89PNG\r\n\x1a\n' + b'....', 'image/png'),
        (b'GIF87a....', 'image/gif'),
        (b'GIF89a....', 'image/gif'),
        (b'%PDF-1.7\n', 'application/pdf'),
        (b'\x1f\x8b\x08....', 'application/gzip'),
        (b'PK\x03\x04....', 'application/zip'),
        (b'OggS....', 'audio/ogg'),
        (b'ID3\x04....', 'audio/mpeg'),
        (b'\x1a\x45\xdf\xa3....', 'video/webm'),
        (b'<!doctype html>', 'text/html'),
        (b'<html><body>', 'text/html'),
        # WHATWG: leading whitespace skipped, case-insensitive
        (b'  \r\n\t<HTML><BODY>', 'text/html'),
        (b'<!DOCTYPE HTML PUBLIC', 'text/html'),
        (b'\n<DIV class="x">', 'text/html'),
        (b'<?xml version="1.0"?>', 'application/xml'),
        (b' <?XML version="1.0"?>', 'application/xml'),
        (b'RIFF\x00\x00\x00\x00WEBPVP8 ', 'image/webp'),
        (b'RIFF\x00\x00\x00\x00WAVEfmt ', 'audio/wav'),
        (b'RIFF\x00\x00\x00\x00AVI LIST', 'video/avi'),
        (b'\x00\x00\x00\x18ftypisom', 'video/mp4'),
        # ISO-BMFF brand disambiguation: the container is not always video
        (b'\x00\x00\x00\x1cftypavif', 'image/avif'),
        (b'\x00\x00\x00\x1cftypheic', 'image/heic'),
        (b'\x00\x00\x00\x1cftypmif1', 'image/heic'),
        (b'\x00\x00\x00\x1cftypM4A ', 'audio/mp4'),
        # RIFF with an unknown tag falls through to octet-stream
        (b'RIFF\x00\x00\x00\x00XXXX....', 'application/octet-stream'),
        (b'random body text', 'application/octet-stream'),
        (b'', 'application/octet-stream'),
        # WHATWG tag-terminating byte: a tag-name PREFIX is not a match
        (b'<htmlxyz>', 'application/octet-stream'),
        (b'<script-foo>', 'application/octet-stream'),
        (b'<border=1>', 'application/octet-stream'),
        (b'<p>', 'text/html'),
        (b'<br >', 'text/html'),
    ]
    df = spark.createDataFrame(
        [(i, payload) for i, (payload, _) in enumerate(cases)],
        'i int, payload binary')
    got = {r['i']: r['ct']
           for r in df.select('i', mm.sniff_content_type(
               F.col('payload')).alias('ct')).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_sniff_charset_precedence_ladder(spark):
    """BOM > declared header > meta prescan > ascii > windows-1252
    (WHATWG: the transport-layer charset outranks the in-band prescan,
    only the BOM outranks the header); UTF-32 BOMs beat their UTF-16
    prefixes."""
    cases = [
        # (payload, declared, want)
        (b'\x00\x00\xfe\xffXX', None, 'utf-32be'),
        (b'\xff\xfe\x00\x00XX', None, 'utf-32le'),
        (b'\xef\xbb\xbfhello', None, 'utf-8'),
        (b'\xfe\xffhi', None, 'utf-16be'),
        (b'\xff\xfeh\x00i\x00', None, 'utf-16le'),
        # BOM beats meta AND declared
        (b'\xef\xbb\xbf<meta charset="shift_jis">', 'koi8-r', 'utf-8'),
        # meta prescan, both forms, case-insensitive, quotes optional
        (b'<meta charset="Shift_JIS">', None, 'shift_jis'),
        (b"<META CHARSET='EUC-KR'>", None, 'euc-kr'),
        (b'<meta http-equiv="Content-Type" '
         b'content="text/html; charset=ISO-8859-2">', None, 'iso-8859-2'),
        (b'<meta charset=utf-8>', None, 'utf-8'),
        # declared header beats meta (WHATWG transport precedence)
        (b'<meta charset="big5">x', 'utf-8', 'utf-8'),
        # meta wins only when nothing was declared
        (b'<meta charset="big5">x', None, 'big5'),
        # only META declarations count: accept-charset on a form and
        # charset= in a link query string never hijack the verdict
        (b'<form accept-charset="utf-8">caf\xe9', None, 'windows-1252'),
        (b'<a href="/x?charset=utf-8">caf\xe9</a>', None, 'windows-1252'),
        # declared beats the ascii fallback
        (b'plain ascii body', 'KOI8-R ', 'koi8-r'),
        # ascii fallback when nothing declared
        (b'plain ascii body', None, 'ascii'),
        (b'', None, 'ascii'),
        # high bytes, no evidence -> WHATWG default
        (b'caf\xe9 body', None, 'windows-1252'),
    ]
    df = spark.createDataFrame(
        [(i, p, d) for i, (p, d, _) in enumerate(cases)],
        'i int, payload binary, declared string')
    got = {r['i']: r['cs'] for r in df.select(
        'i', mm.sniff_charset(F.col('payload'), F.col('declared'))
        .alias('cs')).collect()}
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)
    # without the declared column, declared rows fall through to ascii
    got2 = {r['i']: r['cs'] for r in df.select(
        'i', mm.sniff_charset(F.col('payload')).alias('cs')).collect()}
    declared_idx = next(i for i, (p, d, _) in enumerate(cases)
                        if p == b'plain ascii body' and d is not None)
    assert got2[declared_idx] == 'ascii'


# ------------------------------------------------------- perceptual hash ---


def test_media_dhash_one_byte_flip_bounded(spark):
    """A one-byte corruption flips at most 2 of the 63 dHash bits."""
    from pyspark.sql import functions as F

    from scalpel_spark.operators.multimodal import (media_dhash,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=240, groups=120, seed=3)
    fps = media.select('media_id', 'grp', media_dhash('payload').alias('fp'))
    a = fps.filter('media_id < 120').select('grp', F.col('fp').alias('fa'))
    b = fps.filter('media_id >= 120').select('grp', F.col('fp').alias('fb'))
    rows = (a.join(b, 'grp')
            .select(F.bit_count(F.col('fa').bitwiseXOR(F.col('fb'))).alias('h'))
            .collect())
    assert len(rows) == 120
    assert all(r['h'] <= 2 for r in rows)


def test_media_dhash_positive_63_bits(spark):
    from pyspark.sql import functions as F

    from scalpel_spark.operators.multimodal import (media_dhash,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=50, groups=50, seed=11)
    mm = media.select(media_dhash('payload').alias('fp')).agg(
        F.min('fp').alias('lo'), F.max('fp').alias('hi')).collect()[0]
    assert mm['lo'] >= 0
    assert mm['hi'] < (1 << 63)


def test_media_phash_pairs_finds_planted_dups(spark):
    """Every planted variant pairs with its base (hamming <= 2 <= 6);
    the banded join must find all of them (pigeonhole completeness)."""
    from scalpel_spark.operators.multimodal import (media_phash_pairs,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=300, groups=100, seed=5)
    pairs = media_phash_pairs(media, max_hamming=6, id_col='media_id')
    got = {(r['ref_a'], r['ref_b']) for r in pairs.collect()}
    # groups 0..99: members {g, g+100, g+200} -> 3 pairs per group, minus
    # any pair whose corruption coincides (still a pair, hamming 0)
    for g in range(100):
        for x, y in [(g, g + 100), (g, g + 200), (g + 100, g + 200)]:
            assert (x, y) in got, (x, y)


def test_media_phash_pairs_no_false_positives_above_threshold(spark):
    from scalpel_spark.operators.multimodal import (media_phash_pairs,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=200, groups=100, seed=9)
    pairs = media_phash_pairs(media, max_hamming=2, id_col='media_id')
    for r in pairs.collect():
        assert r['hamming'] <= 2
        # cross-group random payloads sit ~31 bits apart; anything this
        # close must be a planted pair
        assert r['ref_b'] - r['ref_a'] == 100


def test_media_phash_partitioning_invariant(spark):
    from scalpel_spark.operators.multimodal import (media_phash_pairs,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=120, groups=60, seed=13)
    base = sorted(map(tuple, media_phash_pairs(media, id_col='media_id').collect()))
    rep = sorted(map(tuple, media_phash_pairs(
        media.repartition(7), id_col='media_id').collect()))
    assert base == rep
