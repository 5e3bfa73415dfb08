"""WARC (Web ARChive, ISO 28500) source — the crawl-interchange format
CommonCrawl and every archive pipeline speak.

The reference spider persists msgpack item files (any_io/files.py:45-84,
covered by `plans/storage`); WARC is the beyond-reference source a
web-scale pipeline actually ingests. Layout reality at 100 TB: WARC is a
sequence of length-delimited records per file (~1 GB each), so the unit
of parallelism is the FILE — Spark lists the bucket, one task streams
one file (`binaryFile` source), and the parser honors each record's
``Content-Length`` header (NOT delimiter splitting, which corrupts any
payload containing the magic bytes). That per-file decode is Python by
necessity — a record-framing format with no JVM builtin — and runs as
the same Arrow-batched ``mapInPandas`` boundary as the media decode
stage (DESIGN.md Python boundary; one batch row = one file, bounded
record lists out).

Gzip: CommonCrawl WARCs are per-record gzip members; ``read_warc``
transparently handles BOTH whole-file gzip (``.warc.gz``) and
concatenated per-record members via the stdlib (``gzip.decompress``
walks every member in a multi-member stream), and treats a non-gzip
prefix as plain WARC. ``write_warc_shards(gzip_records=True)`` emits the
CommonCrawl layout — one gzip member per record — and records each
member's byte offset in the shard manifest (``member_offsets``), which
is exactly the index a random-access consumer (CDX lookup, range-GET
replay) needs to seek to one record without touching the rest of the
file; the parse contract and schema are identical either way.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Standard reason phrases (RFC 9110 §15) for the statuses a crawl
# archive actually sees; anything else serializes with an empty reason
# phrase — "HTTP/1.1 <code> " — which RFC 9112 §4 explicitly allows
# (reason-phrase may be empty; the SP before it stays).
HTTP_REASONS: dict[int, str] = {
    200: 'OK', 201: 'Created', 204: 'No Content', 206: 'Partial Content',
    301: 'Moved Permanently', 302: 'Found', 303: 'See Other',
    304: 'Not Modified', 307: 'Temporary Redirect', 308: 'Permanent Redirect',
    400: 'Bad Request', 401: 'Unauthorized', 403: 'Forbidden',
    404: 'Not Found', 405: 'Method Not Allowed', 410: 'Gone',
    429: 'Too Many Requests', 500: 'Internal Server Error',
    502: 'Bad Gateway', 503: 'Service Unavailable', 504: 'Gateway Timeout',
}


def http_reason_sql_case(col: str = 'status') -> str:
    """The same status→reason mapping as a SQL CASE fragment, generated
    from HTTP_REASONS so the DuckDB oracle can never drift from the
    Spark serializer."""
    whens = ' '.join(f"WHEN {k} THEN '{v}'" for k, v in HTTP_REASONS.items())
    return f"CASE {col} {whens} ELSE '' END"


WARC_RECORD_SCHEMA = T.StructType([
    T.StructField('warc_file', T.StringType()),
    T.StructField('record_seq', T.IntegerType()),   # position within file
    T.StructField('warc_type', T.StringType()),     # response/request/...
    T.StructField('target_uri', T.StringType()),
    T.StructField('warc_date', T.StringType()),
    T.StructField('record_id', T.StringType()),
    T.StructField('content_type', T.StringType()),
    T.StructField('content_length', T.LongType()),
    T.StructField('http_status', T.IntegerType()),  # null unless response
    T.StructField('payload', T.BinaryType()),       # HTTP body (or block)
])


def parse_warc_bytes(blob: bytes, name: str = '') -> list[tuple]:
    """Minimal ISO 28500 parser over one WARC file's bytes: version line,
    CRLF-delimited headers, ``Content-Length`` exact block read, CRLF CRLF
    record separator. For ``response`` records the HTTP status line +
    headers are split off the block so ``payload`` is the body. Raises
    ValueError on a malformed version line (quarantined by the caller)."""
    if blob[:2] == b'\x1f\x8b':
        blob = gzip.decompress(blob)
    out, pos, seq = [], 0, 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos:pos + 2] == b'\r\n':
            pos += 2
        if pos >= n:
            break
        eol = blob.index(b'\r\n', pos)
        version = blob[pos:eol].decode('ascii', 'replace')
        if not version.startswith('WARC/'):
            raise ValueError(f'{name}: bad WARC version line at {pos}: {version!r}')
        pos = eol + 2
        headers = {}
        while True:
            eol = blob.index(b'\r\n', pos)
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.decode('utf-8', 'replace').partition(':')
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get('content-length', '0'))
        block = blob[pos:pos + clen]
        pos += clen
        wtype = headers.get('warc-type', '')
        status, payload = None, block
        if wtype == 'response' and block[:5] == b'HTTP/':
            try:
                head_end = block.index(b'\r\n\r\n')
                status_line = block[:block.index(b'\r\n')].decode('ascii', 'replace')
                status = int(status_line.split(' ')[1])
                payload = block[head_end + 4:]
            except (ValueError, IndexError):
                pass  # keep the whole block; status stays null
        out.append((
            name, seq, wtype,
            headers.get('warc-target-uri'),
            headers.get('warc-date'),
            headers.get('warc-record-id'),
            headers.get('content-type'),
            clen, status, payload,
        ))
        seq += 1
    return out


def read_warc(spark: SparkSession, path: str,
              ignore_errors: bool = True) -> DataFrame:
    """WARC files under ``path`` as one record-per-row DataFrame
    (WARC_RECORD_SCHEMA). One Spark task parses one file (binaryFile
    source — parallelism = file count, the native WARC layout); a
    malformed file either raises (``ignore_errors=False``) or yields a
    single quarantine row with ``warc_type='_error'`` — the same
    quarantine-not-crash policy as the fetch and decode stages."""
    files = spark.read.format('binaryFile').load(path)

    def per_file(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for fname, blob in zip(pdf['path'], pdf['content']):
                try:
                    rows.extend(parse_warc_bytes(bytes(blob), fname))
                except Exception as e:  # noqa: BLE001 — quarantine row
                    if not ignore_errors:
                        raise
                    rows.append((fname, -1, '_error', None, None, None,
                                 str(e)[:200], 0, None, b''))
            yield pd.DataFrame(rows, columns=cols)

    return (
        files.select('path', 'content')
        .mapInPandas(per_file, WARC_RECORD_SCHEMA)
    )


def warc_response_stats(records: DataFrame) -> DataFrame:
    """Ingest rollup per (warc_type, http_status): record counts and
    payload byte totals — the sanity table an ingestion job emits before
    anything downstream trusts the batch. Pure JVM aggregation."""
    return (
        records.groupBy('warc_type', 'http_status')
        .agg(F.count('*').alias('n_records'),
             F.sum(F.length('payload')).cast('long').alias('payload_bytes'),
             F.count_distinct('target_uri').alias('n_uris'))
    )


def write_synthetic_warc(path: str, n_records: int, seed: int = 3,
                         gzip_file: bool = False,
                         with_images: bool = False) -> None:
    """Deterministic WARC file for tests/oracles: responses with known
    statuses/bodies, one request and one warcinfo record interleaved.
    Driver-side test fixture (bounded), NOT a production writer."""
    buf = io.BytesIO()

    def rec(wtype: str, headers: dict, block: bytes) -> None:
        h = {'WARC-Type': wtype, 'Content-Length': str(len(block)), **headers}
        buf.write(b'WARC/1.0\r\n')
        for k, v in h.items():
            buf.write(f'{k}: {v}\r\n'.encode())
        buf.write(b'\r\n')
        buf.write(block)
        buf.write(b'\r\n\r\n')

    rec('warcinfo', {'WARC-Record-ID': f'<urn:uuid:info-{seed}>',
                     'Content-Type': 'application/warc-fields'},
        b'software: scalpel-spark-tests\r\n')
    for i in range(n_records):
        url = f'https://h{i % 5}.example.com/p/{i}'
        status = 404 if i % 7 == 0 else 200
        img = (f'<img src="https://img.example.com/a{i % 4}.png">'
               if with_images and i % 3 == 0 else '')
        body = (f'<html>page {i} {img}' + 'x' * (i % 23) + '</html>').encode()
        http = (f'HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n'
                f'Content-Length: {len(body)}\r\n\r\n').encode() + body
        rec('response',
            {'WARC-Target-URI': url,
             'WARC-Date': '2026-01-01T00:00:00Z',
             'WARC-Record-ID': f'<urn:uuid:resp-{seed}-{i}>',
             'Content-Type': 'application/http; msgtype=response'},
            http)
        if i % 9 == 0:
            rec('request',
                {'WARC-Target-URI': url,
                 'WARC-Record-ID': f'<urn:uuid:req-{seed}-{i}>',
                 'Content-Type': 'application/http; msgtype=request'},
                f'GET /p/{i} HTTP/1.1\r\nHost: h{i % 5}.example.com\r\n\r\n'.encode())
    data = buf.getvalue()
    if gzip_file:
        data = gzip.compress(data, mtime=0)
    with open(path, 'wb') as f:
        f.write(data)


WARC_WRITE_DATE = '2026-01-01T00:00:00Z'


def warc_record_bytes(df: DataFrame,
                      warc_date: str = WARC_WRITE_DATE) -> DataFrame:
    """Serialize crawl results into ISO 28500 ``response`` records as a
    PURE column transformation — ``record_bytes BINARY`` per row, no
    Python, no side effects.

    Input contract: ``(url STRING, status INT, content_type STRING,
    body BINARY, record_id STRING)``. Output adds ``record_bytes`` (the
    full framed record incl. the trailing CRLF CRLF separator) and
    ``record_len``. The HTTP block is reconstructed with exact
    ``Content-Length`` headers at both layers, so
    ``read_warc(write_warc_shards(...))`` round-trips bit-for-bit — and
    because framing is length-delimited, a body containing ``WARC/1.0``
    survives (same property the reader is pinned on).

    Keeping serialization separate from the sink means the expensive part
    (byte assembly) is distributed, testable, and oracle-checkable
    (md5 of the record bytes recomputes in SQL); the sink below only
    concatenates.
    """
    body = F.col('body')
    reasons = F.create_map(
        *[F.lit(x) for kv in HTTP_REASONS.items() for x in kv])
    reason = F.coalesce(
        F.element_at(reasons, F.col('status')), F.lit(''))
    http_head = F.concat(
        F.lit('HTTP/1.1 '), F.col('status').cast('string'),
        F.lit(' '), reason, F.lit('\r\n'),
        F.lit('Content-Type: '), F.col('content_type'), F.lit('\r\n'),
        F.lit('Content-Length: '), F.length(body).cast('string'),
        F.lit('\r\n\r\n'),
    )
    block_len = F.length(F.encode(http_head, 'UTF-8')) + F.length(body)
    warc_head = F.concat(
        F.lit('WARC/1.0\r\n'),
        F.lit('WARC-Type: response\r\n'),
        F.lit('WARC-Target-URI: '), F.col('url'), F.lit('\r\n'),
        F.lit('WARC-Date: '), F.lit(warc_date), F.lit('\r\n'),
        F.lit('WARC-Record-ID: '), F.col('record_id'), F.lit('\r\n'),
        F.lit('Content-Type: application/http; msgtype=response\r\n'),
        F.lit('Content-Length: '), block_len.cast('string'),
        F.lit('\r\n\r\n'),
    )
    rec = F.concat(F.encode(warc_head, 'UTF-8'), F.encode(http_head, 'UTF-8'),
                   body, F.encode(F.lit('\r\n\r\n'), 'UTF-8'))
    return df.withColumn('record_bytes', rec) \
             .withColumn('record_len', F.length(rec).cast('long'))


def warcinfo_bytes(software: str = 'scalpel-spark',
                   warc_date: str = WARC_WRITE_DATE,
                   shard: int = 0) -> bytes:
    """A deterministic ``warcinfo`` header record (ISO 28500 convention:
    every WARC file opens with one, describing its producer). Driver-side
    helper — bounded bytes, passed into :func:`write_warc_shards`."""
    fields = (f'software: {software}\r\nformat: WARC File Format 1.0\r\n'
              ).encode()
    head = (
        'WARC/1.0\r\n'
        'WARC-Type: warcinfo\r\n'
        f'WARC-Date: {warc_date}\r\n'
        f'WARC-Record-ID: <urn:uuid:warcinfo-{shard}>\r\n'
        'Content-Type: application/warc-fields\r\n'
        f'Content-Length: {len(fields)}\r\n\r\n'
    ).encode()
    return head + fields + b'\r\n\r\n'


def write_warc_shards(df: DataFrame, out_dir: str, n_shards: int = 4,
                      order_col: str = 'url',
                      with_warcinfo: bool = False,
                      gzip_records: bool = False) -> DataFrame:
    """Sink: write ``record_bytes`` rows as ``n_shards`` WARC files under
    ``out_dir`` (``part-NNNNN.warc`` / ``.warc.gz``), returning a
    MATERIALIZED manifest DataFrame ``(shard, path, n_records, n_bytes,
    member_offsets)``.

    Shard routing is ``xxhash64(order_col) pmod n_shards`` (size-balanced,
    deterministic) and rows are written in ``order_col`` order within the
    shard, so file contents are a pure function of the input — a
    speculatively re-executed task rewrites the identical bytes, and the
    write itself goes to a tmp path then ``os.replace`` (atomic on POSIX),
    the same retry discipline as the snapshot store. One grouped-map task
    streams one file — the native WARC parallelism unit, mirroring the
    reader.

    ``gzip_records=True`` emits the CommonCrawl/ISO 28500 seekable layout:
    ONE GZIP MEMBER PER RECORD (``mtime=0`` so bytes stay deterministic),
    and ``member_offsets`` carries each record's starting byte offset in
    the file — the index a CDX/range-GET consumer seeks by. Uncompressed
    shards get the same offsets (record starts), so downstream indexing
    code is layout-agnostic. ``read_warc`` reads both layouts (stdlib
    gzip walks concatenated members).

    Evaluation and deployment contract: the write runs EXACTLY ONCE,
    inside this call — the shard tasks execute eagerly and the returned
    manifest is a small materialized frame (``n_shards`` rows), so
    re-running actions on it never re-executes the file writes (ADVICE r4,
    warc.py:286). Executors ``open()`` local paths: ``out_dir`` must be on
    a filesystem shared by driver and executors (local mode, NFS, or a
    FUSE-mounted object store); a pure-object-store deployment swaps the
    ``open``/``os.replace`` pair for its client the same way ``fetch_fn``
    is injected. Each shard buffers in one pandas frame in its task —
    size shards (``n_shards``) so a shard fits executor memory (~1 GB
    WARC convention).
    """
    import os

    from pyspark.sql import types as TT

    manifest_schema = TT.StructType([
        TT.StructField('shard', TT.IntegerType()),
        TT.StructField('path', TT.StringType()),
        TT.StructField('n_records', TT.LongType()),
        TT.StructField('n_bytes', TT.LongType()),
        TT.StructField('member_offsets', TT.ArrayType(TT.LongType())),
    ])
    os.makedirs(out_dir, exist_ok=True)
    ext = '.warc.gz' if gzip_records else '.warc'

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values('_order', kind='mergesort')
        path = os.path.join(out_dir, f'part-{shard:05d}{ext}')
        tmp = path + '.tmp'
        n_bytes = 0
        offsets: list[int] = []
        with open(tmp, 'wb') as f:
            if with_warcinfo:
                info = warcinfo_bytes(shard=shard)
                if gzip_records:
                    info = gzip.compress(info, mtime=0)
                f.write(info)
                n_bytes += len(info)
            for blob in pdf['record_bytes']:
                b = bytes(blob)
                if gzip_records:
                    b = gzip.compress(b, mtime=0)
                offsets.append(n_bytes)
                f.write(b)
                n_bytes += len(b)
        os.replace(tmp, path)
        return pd.DataFrame(
            [(shard, path, len(pdf), n_bytes, offsets)],
            columns=['shard', 'path', 'n_records', 'n_bytes',
                     'member_offsets'])

    routed = df.withColumn(
        'shard',
        F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards)).cast('int'),
    ).withColumn('_order', F.col(order_col))
    lazy = (
        routed.select('shard', '_order', 'record_bytes')
        .groupBy('shard').applyInPandas(write_shard, manifest_schema)
    )
    # Force the writes NOW, exactly once; the manifest is n_shards rows.
    rows = lazy.collect()
    return df.sparkSession.createDataFrame(rows, manifest_schema)


def warc_to_corpus(records: DataFrame) -> DataFrame:
    """Bridge: 200-status WARC responses -> the engine's interleaved
    document shape (doc_id, spans: array<struct<kind,text,media_ref,
    offset>>) — the input_hint schema every downstream operator
    (dedup, curation, content extraction, packing) consumes.

    Pure JVM column algebra: charset chosen by the WHATWG sniffer
    (`multimodal.sniff_charset` — BOM > transport header > meta prescan)
    over a BOUNDED charset set (CASE over decode()), one text span from
    the tag-stripped body, one media span per <img src> occurrence in
    document order (offset = position). Tag-stripping by regexp is the
    documented simplification — span-faithful HTML segmentation is the
    content-extraction layer's job (`operators/content.py`); this
    bridge feeds it.
    """
    from scalpel_spark.operators.multimodal import sniff_charset

    resp = records.filter(
        (F.col('warc_type') == 'response') & (F.col('http_status') == 200))
    declared = F.regexp_extract(F.coalesce(F.col('content_type'), F.lit('')),
                                r'charset=([A-Za-z0-9_\-]+)', 1)
    cs = sniff_charset(F.col('payload'), declared=declared)
    html = (
        F.when(cs == 'utf-8', F.decode('payload', 'UTF-8'))
        .when(cs == 'utf-16be', F.decode('payload', 'UTF-16BE'))
        .when(cs == 'utf-16le', F.decode('payload', 'UTF-16LE'))
        .when(cs == 'ascii', F.decode('payload', 'US-ASCII'))
        .otherwise(F.decode('payload', 'ISO-8859-1'))
    )
    text = F.trim(F.regexp_replace(
        F.regexp_replace(html, r'<[^>]*>', ' '), r'\s+', ' '))
    imgs = F.regexp_extract_all(
        F.col('_html'), F.lit('<img[^>]*src=["\']([^"\']+)'), F.lit(1))
    text_span = F.struct(
        F.lit('text').alias('kind'), text.alias('text'),
        F.lit(None).cast('string').alias('media_ref'),
        F.lit(0).alias('offset'))
    media_spans = F.transform(
        F.col('_imgs'),
        lambda ref, i: F.struct(
            F.lit('media').alias('kind'),
            F.lit(None).cast('string').alias('text'),
            ref.alias('media_ref'),
            (i + 1).cast('int').alias('offset')))
    return (
        resp.withColumn('_html', html)
        .withColumn('_imgs', imgs)
        .select(
            F.col('target_uri').alias('doc_id'),
            F.concat(F.array(text_span), media_spans).alias('spans'),
        )
    )
