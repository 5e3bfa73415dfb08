"""At-rest file layout: Z-order (Morton) interleaved sort keys for
multi-column data skipping.

Why this exists: parquet/Iceberg scans prune ROW GROUPS by min/max
statistics. Sorting the at-rest table by one column (e.g. SURT host — see
``tests/test_surt_layout.py``) gives perfect pruning on that column and
none on any other; a crawl store is queried both by host (recrawl
planning, politeness) AND by time (freshness windows, CDX revisits).
Z-ordering interleaves the bits of both keys so that a range predicate on
EITHER column touches O(sqrt) of the row groups instead of all of them —
the same trick Delta's OPTIMIZE ZORDER and Iceberg's sort-order
z-transform apply (public semantics; reimplemented here as plain column
algebra, no engine support needed: ``df.repartitionByRange(zkey).
sortWithinPartitions(zkey).write...``).

Everything is exact integer bit algebra (shifts/masks, unrolled per bit —
bits are bounded constants), so the key is engine-portable and
oracle-checkable bit-for-bit. Binning:

* :func:`range_bin` — equal-width bins from a broadcast (min, max); fine
  for roughly uniform keys (timestamps, sequence numbers);
* for skewed keys, bin by *rank* first (compose with
  ``quantiles.exact_quantiles`` or a hash: ``xxhash64(host) & mask`` is
  already uniform) — the interleave does not care where bins came from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bin(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Equal-width bin of ``col`` into ``[0, 2**bits)`` given broadcast
    min/max columns; monotone in ``col``, degenerate span -> bin 0."""
    n_bins = 1 << bits
    width = (vmax - vmin).cast('double')
    raw = F.floor((col - vmin).cast('double') * n_bins / width)
    return (
        F.when(width > 0,
               F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)))
        .otherwise(F.lit(0)).cast('long')
    )


def morton_interleave(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` of non-negative integer columns ``x``
    and ``y`` into a 2*bits-bit Morton key (x takes even positions, y
    odd). Unrolled constant-length bit algebra — stays in whole-stage
    codegen."""
    if not 1 <= bits <= 31:
        raise ValueError(f'bits must be in [1, 31], got {bits}')
    xl, yl = x.cast('long'), y.cast('long')
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def morton_interleave_sql(x: str, y: str, bits: int) -> str:
    """The DuckDB twin of :func:`morton_interleave` for oracle SQL."""
    terms = []
    for i in range(bits):
        terms.append(f'((({x} >> {i}) & 1) << {2 * i})')
        terms.append(f'((({y} >> {i}) & 1) << {2 * i + 1})')
    return ' | '.join(terms)


def zorder_key(df: DataFrame, x_col: str, y_col: str,
               bits: int = 12) -> DataFrame:
    """Add ``zkey`` interleaving equal-width range bins of two numeric
    columns (each binned to ``bits`` bits from its global min/max — one
    tiny broadcast aggregate, corpus touched map-side only).

    Write path: ``zorder_key(df, 'host_bin', 'fetched_day')
    .repartitionByRange(n, 'zkey').sortWithinPartitions('zkey')`` — range
    partitioning keeps files disjoint in zkey, so min/max stats prune on
    both source dimensions.
    """
    mm = df.agg(
        F.min(x_col).alias('_xmin'), F.max(x_col).alias('_xmax'),
        F.min(y_col).alias('_ymin'), F.max(y_col).alias('_ymax'),
    )
    out = df.join(F.broadcast(mm))
    xb = range_bin(F.col(x_col), F.col('_xmin'), F.col('_xmax'), bits)
    yb = range_bin(F.col(y_col), F.col('_ymin'), F.col('_ymax'), bits)
    return (
        out.withColumn('zkey', morton_interleave(xb, yb, bits))
        .drop('_xmin', '_xmax', '_ymin', '_ymax')
    )
