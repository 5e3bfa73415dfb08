"""Deterministic, engine-portable text hashing for the dedup/similarity
operators.

Design constraint: the driver's correctness gate compares every Spark query
against a DuckDB oracle by value-hash, so all hash arithmetic must be
reproducible bit-for-bit in ANSI SQL on both engines. We therefore derive
hashes from ``md5`` (present and identical in Spark and DuckDB) and keep
everything in 60-bit integer space (15 hex chars < 2^60 fits a signed
BIGINT in both engines, no overflow/wrap divergence).

At 100 TB these expressions are pure JVM column algebra (whole-stage
codegen) — no Python on the hot path. ``xxhash64`` would be faster
JVM-side, but it has no DuckDB twin; production deployments can swap
``HASH60`` for ``F.xxhash64`` behind the same helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1
# fingerprint modulus small enough that pos * (h % MERSENNE31) never
# overflows int64 even summed over thousands of tokens (engine-portable:
# DuckDB would promote to int128 on overflow, Spark would wrap — avoid both)
MERSENNE31 = (1 << 31) - 1


def pround(col: Column, digits: int) -> Column:
    """Portable fixed-precision rounding: floor(x*10^d + 0.5)/10^d.

    Spark's ``round`` re-parses the double's shortest decimal repr
    (HALF_UP on the string) while DuckDB rounds the raw binary value —
    they disagree whenever the shortest repr shows a trailing 5 the binary
    sits just below. floor on the raw double is identical in both engines.
    DuckDB twin: ``floor(x * 10^d + 0.5) / 10^d``.
    """
    scale = 10 ** digits
    return F.floor(col * scale + F.lit(0.5)) / scale


def pround_sql(expr: str, digits: int) -> str:
    scale = 10 ** digits
    return f'floor(({expr}) * {scale} + 0.5) / {scale}'


def hash60(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative BIGINT (< 2^60).

    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast('long')


def hash60_sql(expr: str) -> str:
    """The DuckDB-side rendering of :func:`hash60` for oracle SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_affine_constants(k: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for the affine MinHash family
    sig_i = (a_i * (h mod M31) + b_i) mod M31 over the Mersenne prime
    2^31-1 — the textbook universal-hash construction: ONE base hash per
    shingle instead of k independent md5 calls (16x less hashing on the
    dedup hot path), with each affine map a distinct permutation of the
    31-bit space. The 31-bit reduction keeps a*h < 2^62 so int64 never
    overflows in either engine. Shared verbatim by the Spark operator and
    the DuckDB oracle SQL."""
    consts = []
    for i in range(k):
        a = ((2 * i + 1) * 2654435761) % MERSENNE31 or 1
        b = (i * 2654435769 + 98765) % MERSENNE31
        consts.append((a, b))
    return consts


def tokens(text: Column) -> Column:
    """Whitespace tokenization. DuckDB twin: ``string_split(x, ' ')``."""
    return F.split(text, ' ')


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles in document order. Empty array when the doc has
    fewer than ``n`` tokens.

    Built as ``arrays_zip`` of the n shifted slices of ``toks`` and a
    ``concat_ws`` over each zipped struct — O(tokens) array work per row.
    The previous form (``transform`` over an index sequence with
    ``element_at(toks, i+k)`` inside the lambda) was O(tokens * n) calls
    into an *interpreted* lambda, and when ``toks`` is an unmaterialized
    ``split(text)`` expression the lambda re-splits the text once per
    element (no common-subexpression elimination inside higher-order
    functions) — measured 9.0s -> 1.3s for 256k shingles at sf0.1.
    IMPORTANT: pass a *materialized* token column (see ``dedup._shingled``),
    not the raw split expression, so the slices share one split.

    DuckDB twin (unchanged — same output strings)::

        list_transform(range(1, greatest(len(l) - {n-2}, 1)),
                       i -> l[i] || ' ' || l[i+1] || ... )
    """
    m = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, m) for k in range(n)])
    return F.when(m > 0, F.transform(
        zipped, lambda s: F.concat_ws(' ', *[s[str(k)] for k in range(n)])
    )).otherwise(F.array().cast('array<string>'))


def shingles_sql(list_expr: str, n: int = 3) -> str:
    parts = ' || \' \' || '.join(f'{list_expr}[i+{k}]' if k else f'{list_expr}[i]' for k in range(n))
    return (
        f"CASE WHEN len({list_expr}) >= {n} THEN "
        f"list_transform(range(1, len({list_expr}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


def log2_milli_expr(name: str) -> str:
    """Spark-SQL rendering of an exact deterministic fixed-point log2 of
    the positive integer column ``name``, in milli-units:

        1000 * flog2(v) + ((v - 2^flog2) * 1000) div 2^flog2

    ``flog2(v) = length(bin(v)) - 1`` is the bit length (exact in both
    engines); the second term linearly interpolates within the octave in
    DECIMAL integral division, so every step is integer arithmetic that
    DuckDB reproduces bit-for-bit (``ln``/``log2`` over doubles are NOT
    bit-reproducible across engines — the same reason tfidf/bm25 use
    rational idf surrogates). Absolute error vs true log2 < 0.0861,
    irrelevant for weighting; determinism is the contract. Caller
    guarantees ``v >= 1``. DuckDB twin: :func:`log2_milli_sql`.
    """
    c = f'CAST({name} AS BIGINT)'
    fl = f'(length(bin({c})) - 1)'
    p = f'CAST(power(2, {fl}) AS BIGINT)'
    return (f'({fl} * 1000 + CAST(CAST({c} - {p} AS DECIMAL(28,0)) * 1000'
            f' div CAST({p} AS DECIMAL(19,0)) AS BIGINT))')


def log2_milli_sql(expr: str) -> str:
    """DuckDB rendering of :func:`log2_milli_expr` (expr must be >= 1)."""
    c = f'CAST({expr} AS BIGINT)'
    fl = f'(length(bin({c})) - 1)'
    p = f'CAST(power(2, {fl}) AS BIGINT)'
    return f'({fl} * 1000 + CAST({c} - {p} AS HUGEINT) * 1000 // {p})'
