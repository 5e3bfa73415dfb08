"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media content is carried as opaque ``binary`` payloads with typed metadata
— the input_hint's interleaved-span model (``kind='media'`` spans hold a
``media_ref``) resolved against a media-store table::

    media(media_ref STRING, kind STRING, payload BINARY,
          width INT, height INT, sample_rate INT, duration_ms INT)

Decode / feature-extract run as Arrow-batched ``mapInPandas`` stages —
the one place Python is allowed, because codecs are Python/C libraries,
and even then batch-at-a-time over Arrow, never per-row driver loops.
The actual codec libraries (PIL/librosa/av) are NOT available in this
container, so ``decode_fn`` defaults to a deterministic fake (documented,
seed-stable) and a real deployment injects its own; the Spark-side
contract — schema, batch iteration, partition-by-media_ref locality —
is real and tested either way.

Scale notes: payloads dominate bytes at 100 TB, so the media table is
partitioned by ``media_ref`` hash bucket and the feature extraction is a
pure map stage (no shuffle); only the tiny feature vectors ever move.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField('media_ref', T.StringType()),
        T.StructField('kind', T.StringType()),  # image | audio | video
        T.StructField('payload', T.BinaryType()),
        T.StructField('width', T.IntegerType()),
        T.StructField('height', T.IntegerType()),
        T.StructField('sample_rate', T.IntegerType()),
        T.StructField('duration_ms', T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField('media_ref', T.StringType()),
        T.StructField('kind', T.StringType()),
        T.StructField('n_bytes', T.LongType()),
        T.StructField('feature', T.ArrayType(T.FloatType())),
        T.StructField('decode_ok', T.BooleanType()),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media-store rows (payload = seed-stable pseudo-bytes
    derived from xxhash64 — pure column algebra, scales to any n)."""
    df = spark.range(0, n)
    h = F.xxhash64('id', F.lit(seed))
    kind = F.element_at(
        F.array(F.lit('image'), F.lit('audio'), F.lit('video')),
        (F.pmod(h, F.lit(3)) + 1).cast('int'),
    )
    # payload: 64 deterministic bytes from repeated hashing (unhex of md5 x2)
    payload = F.to_binary(
        F.concat(F.md5(F.concat(F.lit('a'), F.col('id'))), F.md5(F.concat(F.lit('b'), F.col('id')))),
        F.lit('hex'),
    )
    return df.select(
        F.concat(F.lit('img://h'), F.pmod(h, F.lit(50)).cast('string'), F.lit('/'), F.col('id')).alias('media_ref'),
        kind.alias('kind'),
        payload.alias('payload'),
        F.when(kind == 'image', (F.pmod(h, F.lit(1024)) + 32).cast('int')).alias('width'),
        F.when(kind == 'image', (F.pmod(F.xxhash64('id', F.lit(seed + 1)), F.lit(768)) + 32).cast('int')).alias('height'),
        F.when(kind == 'audio', F.lit(16000)).cast('int').alias('sample_rate'),
        F.when(kind != 'image', (F.pmod(h, F.lit(60000)) + 1000).cast('int')).alias('duration_ms'),
    )


def fake_decode(payload: np.ndarray, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: 8-dim feature = byte-window
    means, scaled to [0, 1). A real deployment swaps this for PIL/librosa
    decode + model features; the contract is (bytes, kind) -> float32[D]."""
    buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if len(buf) == 0:
        return np.zeros(8, dtype=np.float32)
    chunks = np.array_split(buf, 8)
    return np.array([c.mean() / 255.0 for c in chunks], dtype=np.float32)


def real_decode_stub(payload: np.ndarray, kind: str) -> np.ndarray:
    """The production decode path. Image/audio codec libraries are not
    installed in this environment."""
    raise NotImplementedError(
        'media codecs (PIL/librosa/av) unavailable in this container; '
        'inject a decode_fn or use fake_decode for plumbing tests'
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Optional[Callable[[bytes, str], np.ndarray]] = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over the media table.

    Each partition streams pandas batches; ``decode_fn(payload_bytes, kind)
    -> np.float32[D]`` runs vectorized per batch. Decode failures set
    ``decode_ok=False`` with an empty feature (quarantine-not-crash, the
    only sane policy at 10^10 rows).
    """
    fn = decode_fn or fake_decode

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf['payload'], pdf['kind']):
                try:
                    feats.append(fn(payload, kind).tolist())
                    oks.append(True)
                except Exception:
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame(
                {
                    'media_ref': pdf['media_ref'],
                    'kind': pdf['kind'],
                    'n_bytes': pdf['payload'].map(len).astype('int64'),
                    'feature': feats,
                    'decode_ok': oks,
                }
            )

    return media.select('media_ref', 'kind', 'payload').mapInPandas(per_batch, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-column resize planning (target dims preserving aspect ratio) —
    the metadata half of an image-resize stage; the pixel half is the
    decode_fn's job. Demonstrates that geometry logic stays JVM-side."""
    scale = F.when(
        F.greatest('width', 'height') > max_side,
        F.lit(max_side) / F.greatest('width', 'height').cast('double'),
    ).otherwise(F.lit(1.0))
    return media.filter(F.col('kind') == 'image').select(
        'media_ref', 'width', 'height',
        F.ceil(F.col('width') * scale).cast('int').alias('target_width'),
        F.ceil(F.col('height') * scale).cast('int').alias('target_height'),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp
    (posexplode of a sequence — order-preserving, shuffle-free)."""
    n_frames = (F.col('duration_ms') / every_ms).cast('int') + 1
    return media.filter(F.col('kind') == 'video').select(
        'media_ref',
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias('frame_idx', '_i'),
    ).select('media_ref', 'frame_idx', (F.col('frame_idx') * every_ms).alias('ts_ms'))


def join_spans_to_media(docs: DataFrame, media: DataFrame) -> DataFrame:
    """Resolve kind='media' spans of the interleaved documents table against
    the media store: explode media spans → join on media_ref. The span
    side keeps (doc_id, offset) so span order is reconstructible —
    the per-row span-sequence invariant survives the round trip."""
    spans = docs.select(
        'doc_id',
        F.posexplode(F.filter('spans', lambda s: s['kind'] == F.lit('media'))).alias('pos', 'span'),
    ).select('doc_id', 'pos', F.col('span.media_ref').alias('media_ref'), F.col('span.offset').alias('offset'))
    return spans.join(media, 'media_ref', 'left')


def media_frontier(docs: DataFrame, seen_media: DataFrame | None = None) -> DataFrame:
    """The media analogue of the URL frontier's schedule+dedup step: media
    spans referenced by emitted documents become fetch candidates, deduped
    against the already-fetched media set (the interleaved-payload twin of
    ``operators/seen.anti_join_seen`` — reference URL dedup:
    ``any_io/static_spider.py:100-106`` applied to the media axis).

    docs must carry (doc_id, spans); seen_media, if given, carries
    ``media_ref``. Returns one row per NEW distinct media_ref with its
    host (parsed from the ``img://<host>/<id>`` ref) for politeness
    grouping — ready to feed the same per-host dispatch window the page
    frontier uses.

    Scale shape: media spans are filtered map-side (no full-spans
    explode), the distinct is one shuffle on media_ref, and the seen
    check is a LEFT ANTI equi-join — at 10^10 refs this is the same
    bloom-prefilterable plan as the URL seen set.
    """
    refs = docs.select(
        F.explode(
            F.filter('spans', lambda s: s['kind'] == F.lit('media'))
        ).alias('span')
    ).select(F.col('span.media_ref').alias('media_ref')).filter(
        F.col('media_ref').isNotNull()
    ).distinct()
    if seen_media is not None:
        refs = refs.join(
            seen_media.select('media_ref').distinct(), 'media_ref', 'left_anti'
        )
    host = F.regexp_extract('media_ref', r'^[a-z]+://([^/]+)/', 1)
    return refs.select('media_ref', host.alias('media_host'))


# -- content-type sniffing (magic bytes) -------------------------------------

# (uppercase-hex prefix of the payload, sniffed type). Order matters only
# for readability — prefixes are mutually exclusive. RIFF and ISO-BMFF
# need a second probe deeper in the header, and markup needs a
# whitespace/case-tolerant text probe — both handled separately below.
MAGIC_PREFIXES = (
    ('FFD8FF', 'image/jpeg'),
    ('89504E470D0A1A0A', 'image/png'),
    ('474946383761', 'image/gif'),   # GIF87a
    ('474946383961', 'image/gif'),   # GIF89a
    ('25504446', 'application/pdf'),  # %PDF
    ('1F8B', 'application/gzip'),
    ('504B0304', 'application/zip'),
    ('4F676753', 'audio/ogg'),        # OggS
    ('494433', 'audio/mpeg'),         # ID3
    ('1A45DFA3', 'video/webm'),       # EBML (matroska/webm)
)

# ISO base-media 'ftyp' brands (bytes 9-12, uppercase hex) that are NOT
# video — the container is shared by images (AVIF/HEIC) and audio (M4A),
# so the brand disambiguates exactly like the RIFF tag does.
FTYP_BRANDS = (
    ('61766966', 'image/avif'),   # 'avif'
    ('61766973', 'image/avif'),   # 'avis' (AVIF sequence)
    ('68656963', 'image/heic'),   # 'heic'
    ('68656978', 'image/heic'),   # 'heix'
    ('6D696631', 'image/heic'),   # 'mif1'
    ('4D344120', 'audio/mp4'),    # 'M4A '
)

# WHATWG MIME sniffing: markup matches after skipping leading tab/LF/FF/
# CR/space, case-insensitively. Checked on a latin-1 view of the prefix
# (total on bytes — never throws) AFTER every binary signature misses.
_WS = r'[\t\n\x0c\r ]*'
# every WHATWG table row ends with a tag-terminating byte (0x20 or 0x3E)
# after the tag name — without it '<htmlxyz' or '<script-foo' would
# classify as text/html. Longer names before their prefixes (br before
# b) so backtracking never has to rescue a match.
_HTML_TAG_RE = (_WS + r'<(?:!doctype html|html|head|body|script|iframe|'
                r'h1|div|font|table|style|title|br|b|p|a|!--)[ >]')
_XML_RE = _WS + r'<\?xml'


def sniff_content_type(payload: Column) -> Column:
    """Classify a binary payload by its magic bytes — the server-declared
    Content-Type header is wrong or missing often enough at web scale
    that crawlers sniff (the reference trusts the header outright,
    ``any_io/static_spider.py``; browsers and Common Crawl both sniff).

    Pure JVM column algebra: one ``hex()`` of the first 16 bytes plus
    prefix tests, and one latin-1 decode + regexp for the markup probes
    — no UDF, everything inside whole-stage codegen. Container formats
    with a two-part signature probe deeper: RIFF bytes 9-12 pick
    WEBP/WAV/AVI, and the ISO base-media 'ftyp' box brand at bytes 9-12
    picks AVIF/HEIC/M4A vs MP4 (the container is shared across
    image/audio/video). HTML/XML match the WHATWG way: leading
    whitespace skipped, case-insensitive tag list. Unknown payloads
    come back ``application/octet-stream``.
    """
    hx = F.hex(F.substring(payload, 1, 16))
    out = None
    for prefix, ctype in MAGIC_PREFIXES:
        cond = hx.startswith(prefix)
        out = F.when(cond, F.lit(ctype)) if out is None else out.when(cond, F.lit(ctype))
    riff_tag = F.substring(hx, 17, 8)  # bytes 9-12 of the payload
    out = out.when(hx.startswith('52494646') & (riff_tag == '57454250'),
                   F.lit('image/webp'))
    out = out.when(hx.startswith('52494646') & (riff_tag == '57415645'),
                   F.lit('audio/wav'))
    out = out.when(hx.startswith('52494646') & (riff_tag == '41564920'),
                   F.lit('video/avi'))
    ftyp = F.substring(hx, 9, 8) == '66747970'  # 'ftyp' @ bytes 5-8
    brand = F.substring(hx, 17, 8)              # brand @ bytes 9-12
    for bhex, ctype in FTYP_BRANDS:
        out = out.when(ftyp & (brand == bhex), F.lit(ctype))
    out = out.when(ftyp, F.lit('video/mp4'))
    text = F.lower(F.decode(F.substring(payload, 1, 64), 'ISO-8859-1'))
    out = out.when(text.rlike('^' + _XML_RE), F.lit('application/xml'))
    out = out.when(text.rlike('^' + _HTML_TAG_RE), F.lit('text/html'))
    return out.otherwise(F.lit('application/octet-stream'))


# -- charset sniffing (BOM + meta prescan) ------------------------------------

# (uppercase-hex BOM, charset). Longest first: UTF-32 BOMs contain the
# UTF-16 ones as prefixes and must win.
BOM_PREFIXES = (
    ('0000FEFF', 'utf-32be'),
    ('FFFE0000', 'utf-32le'),
    ('EFBBBF', 'utf-8'),
    ('FEFF', 'utf-16be'),
    ('FFFE', 'utf-16le'),
)


def sniff_charset(payload: Column, declared: Column | None = None) -> Column:
    """Guess a text payload's encoding the way browsers do (WHATWG
    encoding sniffing, batch analog) — the reference decodes with
    whatever httpx picked from the header, which at web scale is wrong
    or missing for a long tail of pages. Precedence:

    1. byte-order mark (UTF-32 before UTF-16 — prefix containment);
    2. the server-declared charset (optional ``declared`` column) —
       WHATWG order: the transport-layer header outranks the in-band
       prescan, only the BOM outranks the header;
    3. ``<meta charset=...>`` / ``http-equiv`` form inside the first
       1024 bytes (the WHATWG prescan window), matched case-insensitively
       on a latin-1 view of the prefix (latin-1 is total on bytes, so
       the prescan never throws) — anchored to a ``<meta`` element, so
       ``accept-charset`` form attributes or ``charset=`` query strings
       in links can never hijack the verdict;
    4. pure-ASCII prescan window → ``ascii``;
    5. otherwise ``windows-1252`` — the WHATWG default.

    Pure JVM column algebra (hex prefix tests + one decode + one regexp)
    — no UDF, whole-stage codegen. The ASCII test inspects the prescan
    window, not the full payload — same trade every streaming sniffer
    makes; treat ``ascii`` as "ascii so far".
    """
    hx = F.hex(F.substring(payload, 1, 4))
    out = None
    for bom, cs in BOM_PREFIXES:
        cond = hx.startswith(bom)
        out = F.when(cond, F.lit(cs)) if out is None else out.when(cond, F.lit(cs))
    if declared is not None:
        d = F.lower(F.trim(declared))
        out = out.when(d.isNotNull() & (d != ''), d)
    prescan = F.lower(F.decode(F.substring(payload, 1, 1024), 'ISO-8859-1'))
    # anchored to a <meta> element (WHATWG prescan honors meta only);
    # [^>]* keeps the match inside the tag, and the non-alnum guard
    # before 'charset' rejects accept-charset
    meta = F.regexp_extract(
        prescan,
        r'<meta[^>]*?[^a-z0-9_\-]charset\s*=\s*["\']?([a-z0-9_\-]+)', 1)
    out = out.when(meta != '', meta)
    out = out.when(prescan.rlike('^[\\x01-\\x7f]*$'), F.lit('ascii'))
    return out.otherwise(F.lit('windows-1252'))


# ------------------------------------------------------- perceptual hash ---

PHASH_BITS = 63  # 64 payload bytes -> 63 adjacent-difference bits
PHASH_BANDS = 7  # 7 bands x 9 bits; Hamming <= 6 pigeonholes one clean band


def media_dhash(payload_col: str, n_bytes: int = 64) -> Column:
    """63-bit difference-hash (dHash) perceptual fingerprint of a media
    payload column: bit j is set iff byte[j] > byte[j+1] — the classic
    gradient-direction hash (Krawetz), over the payload's leading
    ``n_bytes`` bytes. On a REAL deployment the input is the decoded,
    downscaled 8x8 luma grid emitted by the mapInPandas decode stage
    (`extract_media_features`); the hash itself needs no codec, so it
    stays pure JVM column algebra — hex() -> byte array -> one aggregate
    fold, whole-stage codegen, no UDF. DuckDB twin: the same
    substr / '0x'-cast / shift arithmetic (see the `media_phash_dedup`
    oracle in `__spark_entry__`).

    A one-byte change flips at most 2 of the 63 bits — which is why
    Hamming-band blocking (`media_phash_pairs`) finds corrupted or
    re-encoded near-duplicate assets that exact payload hashing misses.
    63 bits (not 64) keeps the fingerprint strictly positive in a signed
    BIGINT on both engines — no sign-bit divergence.
    """
    return _dhash_expr(_payload_bytes(payload_col, n_bytes), n_bytes)


def _payload_bytes(payload_col: str, n_bytes: int) -> str:
    """SQL expr: the payload's first n_bytes as an int array."""
    return (f'transform(sequence(0, {n_bytes - 1}), '
            f'i -> cast(conv(substr(hex({payload_col}), i*2+1, 2), 16, 10) as int))')


def _dhash_expr(bytes_expr: str, n_bytes: int) -> Column:
    """SQL fold: adjacent-difference bits packed into a BIGINT.

    The byte array is bound ONCE per row through a one-element
    ``transform`` lambda (``pb``): the fold references ``pb`` 2x per
    step, and Catalyst does not CSE across lambda scopes — textually
    inlining ``bytes_expr`` would re-evaluate the 64 conv/substr calls
    on every one of the 126 references (measured ~x5 slower; projection
    collapsing also re-inlines a materialized column, so an alias is
    not a fix either)."""
    fold = (
        f'aggregate(sequence(1, {n_bytes - 1}), cast(0 as bigint), '
        f'(acc, i) -> acc + if(element_at(pb, i) > element_at(pb, i + 1), '
        f'shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint)))'
    )
    return F.expr(f'element_at(transform(array({bytes_expr}), pb -> {fold}), 1)')


def media_phash_pairs(media: DataFrame, max_hamming: int = 6,
                      id_col: str = 'media_ref',
                      payload_col: str = 'payload') -> DataFrame:
    """Perceptual near-duplicate media pairs by dHash Hamming distance,
    blocked on 9-bit bands — the media-axis twin of
    ``dedup.simhash_near_pairs``.

    Pigeonhole: Hamming(a, b) <= 6 over 7 disjoint 9-bit bands forces at
    least one band where a and b agree exactly, so the banded self-join
    finds every qualifying pair while only ever joining within buckets —
    never asset x asset. At 10^10 media refs each asset emits 7 slim
    (band, bucket, id, fp) rows; bucket skew is bounded because dHash
    bits of non-duplicate assets are near-uniform. Returns
    (ref_a, ref_b, hamming), ref_a < ref_b, hamming <= max_hamming.
    """
    fps = media.select(
        F.col(id_col).alias('ref'),
        media_dhash(payload_col).alias('phash'),
    )
    width = 9
    banded = fps.select(
        'ref', 'phash',
        F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))).alias('band'),
    ).withColumn(
        'bucket', F.expr(f'shiftright(phash, band * {width}) & {(1 << width) - 1}')
    )
    a = banded.select('band', 'bucket', F.col('ref').alias('ref_a'),
                      F.col('phash').alias('fp_a'))
    b = banded.select('band', 'bucket', F.col('ref').alias('ref_b'),
                      F.col('phash').alias('fp_b'))
    return (
        a.join(b, ['band', 'bucket'])
        .filter(F.col('ref_a') < F.col('ref_b'))
        .select('ref_a', 'ref_b',
                F.bit_count(F.col('fp_a').bitwiseXOR(F.col('fp_b'))).alias('hamming'))
        .distinct()
        .filter(F.col('hamming') <= max_hamming)
    )


def synthetic_media_variants(spark: SparkSession, n: int, groups: int,
                             seed: int = 7) -> DataFrame:
    """Deterministic near-duplicate media corpus for the perceptual-hash
    operators: ``groups`` base 64-byte payloads (md5-derived), each extra
    copy (variant v = id div groups > 0) sliced with a one-byte 0xf0
    corruption at byte position id mod 64 — the re-encoded/bit-rotted
    duplicate a crawl sees. Pure column algebra; the DuckDB oracle
    rebuilds the identical corpus from the same expressions."""
    df = spark.range(0, n)
    g = F.pmod(F.col('id'), F.lit(groups))
    # 4 x 32 hex chars = 64 payload bytes
    base = F.concat(*[
        F.md5(F.concat(F.lit(f'{c}{seed}-'), g.cast('string')))
        for c in 'mnoq'
    ])
    pos = F.pmod(F.col('id'), F.lit(64))
    spliced = F.expr(
        "concat(substr(_h, 1, _p * 2), 'f0', substr(_h, _p * 2 + 3))"
    )
    hx = F.when(F.col('id') < groups, base).otherwise(spliced)
    return (
        df.withColumn('_h', base)
        .withColumn('_p', pos)
        .select(
            F.col('id').alias('media_id'),
            g.cast('int').alias('grp'),
            F.to_binary(hx, F.lit('hex')).alias('payload'),
        )
    )
