"""WARC source (sources/warc.py): Content-Length-honoring record
framing, HTTP body split, gzip handling, quarantine policy, and the
parallel-by-file read path."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from scalpel_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_response_stats,
    write_synthetic_warc,
)


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / 'warcs'
    d.mkdir()
    write_synthetic_warc(str(d / 'a.warc'), n_records=20, seed=3)
    write_synthetic_warc(str(d / 'b.warc.gz'), n_records=10, seed=4,
                         gzip_file=True)
    return str(d)


def test_read_warc_counts_and_bodies(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r['warc_type'], []).append(r)
    # 20 + 10 responses, 2 warcinfo, ceil(20/9)=3 + 2 requests
    assert len(by_type['response']) == 30
    assert len(by_type['warcinfo']) == 2
    assert len(by_type['request']) == 3 + 2
    assert '_error' not in by_type
    # body split off the HTTP head: payload starts with <html>
    resp = by_type['response'][0]
    assert bytes(resp['payload']).startswith(b'<html>')
    assert resp['http_status'] in (200, 404)
    assert resp['target_uri'].startswith('https://h')


def test_payload_containing_magic_bytes_survives(spark, tmp_path):
    """Content-Length framing: a body that CONTAINS 'WARC/1.0\\r\\n' must
    not split the record (the delimiter-splitting failure mode)."""
    import io
    body = b'evil WARC/1.0\r\n\r\nWARC-Type: fake\r\n payload'
    http = (f'HTTP/1.1 200 OK\r\n\r\n').encode() + body
    buf = io.BytesIO()
    buf.write(b'WARC/1.0\r\n')
    for k, v in [('WARC-Type', 'response'),
                 ('WARC-Target-URI', 'https://x.test/'),
                 ('Content-Length', str(len(http)))]:
        buf.write(f'{k}: {v}\r\n'.encode())
    buf.write(b'\r\n' + http + b'\r\n\r\n')
    recs = parse_warc_bytes(buf.getvalue(), 'x')
    assert len(recs) == 1
    assert recs[0][9] == body


def test_warc_response_stats_rollup(spark, warc_dir):
    stats = {(r['warc_type'], r['http_status']): r
             for r in warc_response_stats(read_warc(spark, warc_dir)).collect()}
    # statuses: i%7==0 -> 404: a has i in 0,7,14 -> 3; b has 0,7 -> 2
    assert stats[('response', 404)]['n_records'] == 5
    assert stats[('response', 200)]['n_records'] == 25
    assert stats[('warcinfo', None)]['n_records'] == 2
    assert stats[('response', 200)]['payload_bytes'] > 0


def test_malformed_file_quarantines_not_crashes(spark, tmp_path):
    d = tmp_path / 'bad'
    d.mkdir()
    (d / 'good.warc').write_bytes(b'')  # empty file -> zero records, fine
    (d / 'bad.warc').write_bytes(b'NOT A WARC FILE AT ALL\r\n')
    df = read_warc(spark, str(d))
    rows = df.collect()
    errs = [r for r in rows if r['warc_type'] == '_error']
    assert len(errs) == 1 and 'bad.warc' in errs[0]['warc_file']
    with pytest.raises(Exception):
        read_warc(spark, str(d), ignore_errors=False).collect()


def test_gzip_and_plain_parse_identically(spark, tmp_path):
    a, b = str(tmp_path / 'p.warc'), str(tmp_path / 'p.warc.gz')
    write_synthetic_warc(a, n_records=8, seed=5)
    write_synthetic_warc(b, n_records=8, seed=5, gzip_file=True)
    ra = sorted((r['record_seq'], r['warc_type'], r['target_uri'],
                 bytes(r['payload']))
                for r in read_warc(spark, a).collect())
    rb = sorted((r['record_seq'], r['warc_type'], r['target_uri'],
                 bytes(r['payload']))
                for r in read_warc(spark, b).collect())
    assert ra == rb


def test_warc_to_corpus_spans(spark, tmp_path):
    from scalpel_spark.sources.warc import warc_to_corpus

    d = tmp_path / 'c'
    d.mkdir()
    write_synthetic_warc(str(d / 'c.warc'), n_records=12, seed=6,
                         with_images=True)
    docs = {r['doc_id']: r['spans']
            for r in warc_to_corpus(read_warc(spark, str(d))).collect()}
    # only 200s become documents: i % 7 != 0 -> 12 - 2 = 10
    assert len(docs) == 10
    for doc_id, spans in docs.items():
        assert spans[0]['kind'] == 'text' and spans[0]['offset'] == 0
        assert '<' not in spans[0]['text']  # tags stripped
        for j, sp in enumerate(spans[1:], start=1):
            assert sp['kind'] == 'media' and sp['offset'] == j
            assert sp['media_ref'].startswith('https://img.example.com/')
    # i % 3 == 0 and i % 7 != 0 -> i in {3, 6, 9} have one image span
    n_media = sum(len(sp) - 1 for sp in docs.values())
    assert n_media == 3


def test_warc_to_corpus_feeds_downstream_operators(spark, tmp_path):
    """The bridge output IS the input_hint shape: the span fingerprint
    operator (north-rule invariant surface) consumes it unchanged."""
    from scalpel_spark.operators.spans import with_span_signature
    from scalpel_spark.sources.warc import warc_to_corpus

    d = tmp_path / 'f'
    d.mkdir()
    write_synthetic_warc(str(d / 'f.warc'), n_records=8, seed=7,
                         with_images=True)
    docs = warc_to_corpus(read_warc(spark, str(d)))
    fps = with_span_signature(docs)
    rows = fps.collect()
    assert len(rows) == docs.count()
    assert all(r['span_sig'] is not None for r in rows)


# ---------------------------------------------------------------------------
# writer (warc_record_bytes + write_warc_shards): round-trip with the reader
# ---------------------------------------------------------------------------

WRITE_SCHEMA = ('url STRING, status INT, content_type STRING, '
                'body BINARY, record_id STRING')


def _write_rows(n=12):
    return [
        (f'https://h{i % 3}.example.com/p/{i}', 404 if i % 5 == 0 else 200,
         'text/html', f'<html>body {i} ' .encode() + b'z' * (i % 9),
         f'<urn:uuid:w-{i}>')
        for i in range(n)
    ]


def test_record_bytes_parse_back(spark):
    from scalpel_spark.sources.warc import warc_record_bytes

    df = spark.createDataFrame(_write_rows(6), WRITE_SCHEMA)
    rows = warc_record_bytes(df).collect()
    for r in rows:
        assert len(r['record_bytes']) == r['record_len']
        parsed = parse_warc_bytes(bytes(r['record_bytes']), 'mem')
        assert len(parsed) == 1
        (_, _, wtype, uri, _, rid, ctype, clen, status, payload) = parsed[0]
        assert wtype == 'response' and uri == r['url']
        assert rid == r['record_id'] and status == r['status']
        assert payload == bytes(r['body'])


def test_write_shards_roundtrip_and_determinism(spark, tmp_path):
    from scalpel_spark.sources.warc import warc_record_bytes, write_warc_shards

    df = warc_record_bytes(spark.createDataFrame(_write_rows(12), WRITE_SCHEMA))
    out1, out2 = str(tmp_path / 'w1'), str(tmp_path / 'w2')
    m1 = {r['shard']: r for r in write_warc_shards(df, out1, n_shards=3).collect()}
    m2 = {r['shard']: r for r in write_warc_shards(df, out2, n_shards=3).collect()}
    assert sum(r['n_records'] for r in m1.values()) == 12
    # deterministic: same shard set, identical bytes per shard
    assert set(m1) == set(m2)
    for s in m1:
        with open(m1[s]['path'], 'rb') as a, open(m2[s]['path'], 'rb') as b:
            assert a.read() == b.read()
    # round-trip through the reader
    back = read_warc(spark, out1).collect()
    got = {(r['target_uri'], r['http_status'], bytes(r['payload'])) for r in back}
    want = {(u, s, b) for u, s, _, b, _ in _write_rows(12)}
    assert got == want


def test_written_body_with_magic_bytes_survives(spark, tmp_path):
    from scalpel_spark.sources.warc import warc_record_bytes, write_warc_shards

    evil = b'prefix WARC/1.0\r\nWARC-Type: response\r\n\r\n suffix'
    df = warc_record_bytes(spark.createDataFrame(
        [('https://x.example.com/a', 200, 'text/plain', evil, '<urn:uuid:e>')],
        WRITE_SCHEMA))
    out = str(tmp_path / 'evil')
    write_warc_shards(df, out, n_shards=1).collect()
    back = read_warc(spark, out).collect()
    assert len(back) == 1 and bytes(back[0]['payload']) == evil


def test_write_shards_with_warcinfo_header(spark, tmp_path):
    from scalpel_spark.sources.warc import warc_record_bytes, write_warc_shards

    df = warc_record_bytes(spark.createDataFrame(_write_rows(6), WRITE_SCHEMA))
    out = str(tmp_path / 'wi')
    write_warc_shards(df, out, n_shards=2, with_warcinfo=True).collect()
    back = read_warc(spark, out).collect()
    infos = [r for r in back if r['warc_type'] == 'warcinfo']
    resps = [r for r in back if r['warc_type'] == 'response']
    assert len(infos) == 2       # one header per shard file
    assert all(r['record_seq'] == 0 for r in infos)
    assert len(resps) == 6
    assert all(b'software: scalpel-spark' in bytes(r['payload'])
               for r in infos)


def test_write_shards_gzip_records_roundtrip(spark, tmp_path):
    """Per-record gzip members (CommonCrawl layout): round-trips through
    the stdlib multi-member walk, stays deterministic, and the manifest's
    member_offsets are real file offsets — each one starts a gzip member
    that decompresses to exactly one WARC record (the seekability
    contract a CDX consumer relies on)."""
    import gzip as _gz

    from scalpel_spark.sources.warc import warc_record_bytes, write_warc_shards

    df = warc_record_bytes(spark.createDataFrame(_write_rows(12), WRITE_SCHEMA))
    out1, out2 = str(tmp_path / 'g1'), str(tmp_path / 'g2')
    m1 = {r['shard']: r
          for r in write_warc_shards(df, out1, n_shards=3,
                                     gzip_records=True).collect()}
    m2 = {r['shard']: r
          for r in write_warc_shards(df, out2, n_shards=3,
                                     gzip_records=True).collect()}
    assert sum(r['n_records'] for r in m1.values()) == 12
    for s in m1:  # deterministic bytes (gzip mtime=0)
        with open(m1[s]['path'], 'rb') as a, open(m2[s]['path'], 'rb') as b:
            assert a.read() == b.read()
    # full round-trip through the reader's multi-member gzip walk
    back = read_warc(spark, out1).collect()
    got = {(r['target_uri'], r['http_status'], bytes(r['payload'])) for r in back}
    want = {(u, s, b) for u, s, _, b, _ in _write_rows(12)}
    assert got == want
    # member_offsets: seek to each offset, read ONE member, parse ONE record
    for s, m in m1.items():
        offs = m['member_offsets']
        assert len(offs) == m['n_records']
        with open(m['path'], 'rb') as f:
            blob = f.read()
        assert m['n_bytes'] == len(blob)
        bounds = list(offs) + [len(blob)]
        for i in range(len(offs)):
            member = blob[bounds[i]:bounds[i + 1]]
            assert member[:2] == b'\x1f\x8b'
            recs = parse_warc_bytes(_gz.decompress(member), 'seek')
            assert len(recs) == 1 and recs[0][2] == 'response'


def test_uncompressed_manifest_offsets_are_record_starts(spark, tmp_path):
    from scalpel_spark.sources.warc import warc_record_bytes, write_warc_shards

    df = warc_record_bytes(spark.createDataFrame(_write_rows(6), WRITE_SCHEMA))
    out = str(tmp_path / 'u')
    (m,) = write_warc_shards(df, out, n_shards=1).collect()
    with open(m['path'], 'rb') as f:
        blob = f.read()
    for off in m['member_offsets']:
        assert blob[off:off + 5] == b'WARC/'


def test_reason_phrases_rfc9110(spark):
    """404 archives as 'HTTP/1.1 404 Not Found' (ADVICE r4: no more
    '404 OK'); unmapped statuses keep the RFC 9112 empty reason phrase."""
    from scalpel_spark.sources.warc import warc_record_bytes

    rows = [('https://x.example.com/a', 404, 'text/html', b'x', '<urn:uuid:a>'),
            ('https://x.example.com/b', 200, 'text/html', b'y', '<urn:uuid:b>'),
            ('https://x.example.com/c', 599, 'text/html', b'z', '<urn:uuid:c>')]
    got = {r['url']: bytes(r['record_bytes'])
           for r in warc_record_bytes(
               spark.createDataFrame(rows, WRITE_SCHEMA)).collect()}
    assert b'HTTP/1.1 404 Not Found\r\n' in got['https://x.example.com/a']
    assert b'HTTP/1.1 200 OK\r\n' in got['https://x.example.com/b']
    assert b'HTTP/1.1 599 \r\n' in got['https://x.example.com/c']
    # unmapped status still parses back with the right code
    parsed = parse_warc_bytes(got['https://x.example.com/c'], 'mem')
    assert parsed[0][8] == 599
