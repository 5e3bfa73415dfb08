"""Z-order layout keys: interleave correctness vs a Python reference,
locality of the curve, and min/max-pruning effectiveness on both axes."""

from __future__ import annotations

import pytest

from scalpel_spark.operators import layout


def _py_morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_python_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, 'x LONG, y LONG')
    got = {(r['x'], r['y']): r['z'] for r in df.select(
        'x', 'y', layout.morton_interleave(
            df['x'], df['y'], bits=4).alias('z')).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y, 4)
    # the key is a bijection over the grid
    assert len(set(got.values())) == 256


def test_morton_sql_twin_matches(spark):
    import duckdb

    rows = [(x, y) for x in range(0, 1000, 37) for y in range(0, 1000, 41)]
    sql = layout.morton_interleave_sql('x', 'y', 10)
    duck = {
        (x, y): z
        for x, y, z in duckdb.sql(
            'SELECT x, y, ' + sql + ' AS z FROM (SELECT UNNEST('
            + str([x for x, _ in rows]) + ') AS x, UNNEST('
            + str([y for _, y in rows]) + ') AS y)').fetchall()
    }
    df = spark.createDataFrame(rows, 'x LONG, y LONG')
    got = {(r['x'], r['y']): r['z'] for r in df.select(
        'x', 'y', layout.morton_interleave(df['x'], df['y'], 10).alias('z')
    ).collect()}
    assert got == duck


def test_zorder_prunes_both_axes(spark):
    # 64x64 grid of (host_bin, day); cut into 64 zkey-contiguous "files"
    # of 64 rows each. A 1/8-wide slab on EITHER axis must touch far
    # fewer files than linear layout does on its bad axis (64/64).
    rows = [(h, d) for h in range(64) for d in range(64)]
    df = layout.zorder_key(
        spark.createDataFrame(rows, 'h LONG, d LONG'), 'h', 'd', bits=6)
    keyed = sorted((r['zkey'], r['h'], r['d']) for r in df.collect())
    files = [keyed[i:i + 64] for i in range(0, len(keyed), 64)]

    def files_touched(pred):
        return sum(1 for f in files if any(pred(h, d) for _, h, d in f))

    # file min/max pruning == "does any row in the file satisfy the range"
    host_slab = files_touched(lambda h, d: h < 8)
    day_slab = files_touched(lambda h, d: d < 8)
    assert host_slab <= 16 and day_slab <= 16  # vs 64 under the bad axis
    # point lookup touches very few files
    assert files_touched(lambda h, d: h == 3 and d == 5) <= 2


def test_range_bin_degenerate_and_bounds(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(5,), (5,), (5,)], 'v LONG')
    out = df.select(layout.range_bin(
        F.col('v'), F.lit(5), F.lit(5), bits=4).alias('b')).collect()
    assert {r['b'] for r in out} == {0}
    with pytest.raises(ValueError):
        layout.morton_interleave(F.col('v'), F.col('v'), bits=0)


def test_zorder_parquet_min_max_stats_prune_both_axes(spark, tmp_path):
    """Not a simulation: write real parquet under both layouts and read
    the per-file column min/max back with pyarrow — the exact statistics
    a scan's file/row-group pruning consults."""
    import glob

    import pyarrow.parquet as pq

    rows = [(h, d) for h in range(64) for d in range(64)]
    df = layout.zorder_key(
        spark.createDataFrame(rows, 'h LONG, d LONG'), 'h', 'd', bits=6)

    zdir, ldir = str(tmp_path / 'z'), str(tmp_path / 'l')
    (df.repartitionByRange(16, 'zkey').sortWithinPartitions('zkey')
       .write.parquet(zdir))
    (df.repartitionByRange(16, 'h').sortWithinPartitions('h', 'd')
       .write.parquet(ldir))

    def overlap_count(path, col, lo, hi):
        n = 0
        for f in glob.glob(f'{path}/part-*.parquet'):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index(col)
            fmin = min(md.row_group(i).column(ci).statistics.min
                       for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(ci).statistics.max
                       for i in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                n += 1
        return n

    n_files = len(glob.glob(f'{zdir}/part-*.parquet'))
    assert n_files >= 8
    # predicate: a 1/8 slab on each axis
    z_h = overlap_count(zdir, 'h', 0, 7)
    z_d = overlap_count(zdir, 'd', 0, 7)
    l_h = overlap_count(ldir, 'h', 0, 7)
    l_d = overlap_count(ldir, 'd', 0, 7)
    # linear layout: perfect on its sort axis, useless on the other
    assert l_h <= 3 and l_d == n_files
    # z-order: real min/max stats prune BOTH axes well below full scan
    assert z_h <= n_files // 2 and z_d <= n_files // 2
