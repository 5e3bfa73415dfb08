"""HyperLogLog + Count-Min sketch operators (operators/sketches.py).

Pins: estimator accuracy vs exact distinct, DuckDB bit-parity of the
whole register->estimate pipeline, the MERGE laws (register max / counter
sum) that make the sketches shard-safe at 100 TB, CMS's one-sided error
guarantee, and partitioning invariance.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
    hll_cardinality,
    hll_estimate,
    hll_estimate_sql,
    hll_registers,
    hll_registers_sql,
)


@pytest.fixture(scope='module')
def urls(spark):
    # 6000 rows, exactly 4000 distinct urls spread over 23 hosts
    return spark.range(0, 6000).select(
        F.concat(
            F.lit('https://h'), F.pmod('id', F.lit(23)).cast('string'),
            F.lit('.test/p/'), F.pmod('id', F.lit(4000)).cast('string'),
        ).alias('url'),
        F.concat(F.lit('h'), F.pmod('id', F.lit(23)).cast('string')).alias('host'),
    ).cache()


def test_hll_estimate_within_bound(spark, urls):
    exact = urls.select('url').distinct().count()
    est = hll_cardinality(urls, 'url', p=8).collect()[0]['estimate_milli'] / 1000
    # standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - exact) / exact < 0.20
    # p=10 must be tighter than 3 sigma of 3.3%
    est10 = hll_cardinality(urls, 'url', p=10).collect()[0]['estimate_milli'] / 1000
    assert abs(est10 - exact) / exact < 0.10


def test_hll_duckdb_bit_parity(spark, urls):
    urls.createOrReplaceTempView('urls_v')
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT concat('https://h', CAST(i % 23 AS VARCHAR), "
        "'.test/p/', CAST(i % 4000 AS VARCHAR)) AS url, "
        "concat('h', CAST(i % 23 AS VARCHAR)) AS host FROM range(6000) t(i)"
    )
    got = {
        r['host']: (r['estimate_milli'], r['n_registers'])
        for r in hll_cardinality(urls, 'url', p=8, group_cols=['host']).collect()
    }
    reg = hll_registers_sql('url', 'urls', p=8, group_exprs=['host'])
    rows = con.execute(
        f'WITH regs AS ({reg}) ' + hll_estimate_sql('regs', p=8, group_exprs=['host'])
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want


def test_hll_register_merge_law(spark, urls):
    """registers(A ∪ B) == groupBy-max(registers(A) ∪ registers(B)) —
    the property that lets shards/waves combine without re-reading data."""
    a = urls.filter(F.pmod(F.xxhash64('url'), F.lit(2)) == 0)
    b = urls.filter(F.pmod(F.xxhash64('url'), F.lit(2)) == 1)
    whole = sorted(map(tuple, hll_registers(urls, 'url', p=6).collect()))
    merged = sorted(map(tuple, (
        hll_registers(a, 'url', p=6)
        .unionAll(hll_registers(b, 'url', p=6))
        .groupBy('bucket').agg(F.max('rho').alias('rho'))
    ).collect()))
    assert whole == merged


def test_hll_duplicate_insensitive(spark, urls):
    one = hll_cardinality(urls, 'url', p=8).collect()[0]['estimate_milli']
    tripled = hll_cardinality(urls.unionAll(urls).unionAll(urls), 'url',
                              p=8).collect()[0]['estimate_milli']
    assert one == tripled


def test_hll_partitioning_invariant(spark, urls):
    base = hll_cardinality(urls, 'url', p=8).collect()[0]['estimate_milli']
    rep = hll_cardinality(urls.repartition(13, 'host'), 'url',
                          p=8).collect()[0]['estimate_milli']
    assert base == rep


def test_hll_small_range_linear_counting(spark):
    # 3 distinct values in 256 registers -> raw estimate way under 2.5m,
    # linear-counting branch must fire and land near 3
    tiny = spark.createDataFrame(
        [('a',), ('b',), ('c',), ('a',)], 'url string')
    row = hll_cardinality(tiny, 'url', p=8).collect()[0]
    assert row['n_registers'] == 3
    assert 2500 <= row['estimate_milli'] <= 3600


def test_cms_never_underestimates(spark, urls):
    docs = urls.select(F.concat(F.lit('w'), F.col('host'), F.lit(' common common '),
                                F.col('url')).alias('text'))
    rows = cms_heavy_hitters(docs, top_n=15).collect()
    assert len(rows) == 15
    assert all(r['cms_count'] >= r['exact_count'] for r in rows)
    assert all(r['overestimate_ppm'] >= 0 for r in rows)


def test_cms_counter_merge_law(spark, urls):
    """counters(A ∪ B) == groupBy-sum(counters(A) ∪ counters(B))."""
    docs = urls.select(F.col('url').alias('text'))
    a = docs.limit(3000)
    whole = sorted(map(tuple, cms_counters(docs, depth=3, width=64).collect()))
    # split deterministically by hash
    pa = docs.filter(F.pmod(F.xxhash64('text'), F.lit(2)) == 0)
    pb = docs.filter(F.pmod(F.xxhash64('text'), F.lit(2)) == 1)
    merged = sorted(map(tuple, (
        cms_counters(pa, depth=3, width=64)
        .unionAll(cms_counters(pb, depth=3, width=64))
        .groupBy('row', 'col').agg(F.sum('cnt').alias('cnt'))
    ).collect()))
    assert whole == merged


def test_cms_exact_for_dominant_key(spark):
    # one token 500x, 5 rare tokens: with width 512 >> 6 keys, the
    # dominant key's estimate should be exact (no collision pressure)
    docs = spark.range(0, 500).select(F.lit('heavy').alias('text')).unionAll(
        spark.range(0, 5).select(F.concat(F.lit('rare'), 'id').alias('text')))
    rows = {r['word']: r for r in cms_heavy_hitters(docs, top_n=6).collect()}
    assert rows['heavy']['exact_count'] == 500
    assert rows['heavy']['cms_count'] == 500


def test_cms_estimate_zero_for_absent_word(spark, urls):
    docs = urls.select(F.col('url').alias('text'))
    counters = cms_counters(docs)
    absent = spark.createDataFrame([('never-seen-token-xyz',)], 'word string')
    est = cms_estimate(counters, absent).collect()[0]['cms_count']
    # could collide upward but with 4x512 cells vs 4000 keys it is sparse;
    # the guarantee we pin is lookup works and is finite/non-negative
    assert est >= 0


# ---------------------------------------------------------------- KMV ---


def test_kmv_merge_law(spark, urls):
    """k-minima of (A ∪ B) == k smallest of (sketch(A) ∪ sketch(B)) —
    the union-mergeability that makes KMV a distributed sketch."""
    from scalpel_spark.operators.sketches import kmv_sketch

    a = urls.filter(F.pmod(F.xxhash64('url'), F.lit(2)) == 0)
    b = urls.filter(F.pmod(F.xxhash64('url'), F.lit(2)) == 1)
    whole = sorted(r['h'] for r in kmv_sketch(urls, 'url', 64).collect())
    merged = sorted(r['h'] for r in (
        kmv_sketch(a, 'url', 64).unionAll(kmv_sketch(b, 'url', 64))
        .distinct().orderBy('h').limit(64)
    ).collect())
    assert whole == merged


def test_kmv_exact_below_k(spark):
    from scalpel_spark.operators.sketches import kmv_estimate_milli, kmv_sketch

    tiny = spark.createDataFrame([('a',), ('b',), ('c',), ('a',)], 'url string')
    row = kmv_estimate_milli(kmv_sketch(tiny, 'url', 256), 256).collect()[0]
    assert row['estimate_milli'] == 3000
    assert row['n_values'] == 3


def test_kmv_estimate_within_bound(spark, urls):
    from scalpel_spark.operators.sketches import kmv_estimate_milli, kmv_sketch

    exact = urls.select('url').distinct().count()
    est = kmv_estimate_milli(kmv_sketch(urls, 'url', 256),
                             256).collect()[0]['estimate_milli'] / 1000
    assert abs(est - exact) / exact < 0.20  # 3 sigma of 1/sqrt(256)


def test_kmv_overlap_estimates_jaccard(spark):
    from scalpel_spark.operators.sketches import kmv_overlap

    a = spark.range(0, 20000).select(F.concat(F.lit('u'), 'id').alias('url'))
    b = spark.range(10000, 30000).select(F.concat(F.lit('u'), 'id').alias('url'))
    row = kmv_overlap(a, b, 'url', 256).collect()[0]
    # true jaccard 1/3, union 30000, intersection 10000
    assert abs(row['jaccard_ppm'] / 1e6 - 1 / 3) < 0.10
    assert abs(row['union_est_milli'] / 1000 - 30000) / 30000 < 0.20
    assert abs(row['intersection_est_milli'] / 1000 - 10000) / 10000 < 0.25


def test_kmv_disjoint_sets(spark):
    from scalpel_spark.operators.sketches import kmv_overlap

    a = spark.range(0, 5000).select(F.concat(F.lit('a'), 'id').alias('url'))
    b = spark.range(0, 5000).select(F.concat(F.lit('b'), 'id').alias('url'))
    row = kmv_overlap(a, b, 'url', 128).collect()[0]
    # disjoint-ish: a handful of hash-rank coincidences at most
    assert row['jaccard_ppm'] == 0
    assert row['intersection_est_milli'] == 0


def test_hll_xxhash_production_path(spark, urls):
    """The xxhash60 production hash is a drop-in: same estimator, same
    error envelope, duplicate-insensitive (no DuckDB twin by design)."""
    from scalpel_spark.operators.sketches import xxhash60

    exact = urls.select('url').distinct().count()
    est = hll_cardinality(urls, 'url', p=8,
                          hash_fn=xxhash60).collect()[0]['estimate_milli'] / 1000
    assert abs(est - exact) / exact < 0.20
    dup = hll_cardinality(urls.unionAll(urls), 'url', p=8,
                          hash_fn=xxhash60).collect()[0]['estimate_milli'] / 1000
    assert dup == est


def test_kmv_matrix_pairwise_jaccard(spark):
    from scalpel_spark.operators.sketches import kmv_overlap_matrix

    df = None
    for g, lo, hi in [('A', 0, 10000), ('B', 5000, 15000), ('C', 20000, 30000)]:
        part = spark.range(lo, hi).select(
            F.lit(g).alias('src'), F.concat(F.lit('u'), 'id').alias('url'))
        df = part if df is None else df.unionAll(part)
    rows = {(r['grp_a'], r['grp_b']): r
            for r in kmv_overlap_matrix(df, 'url', 'src', 256).collect()}
    assert set(rows) == {('A', 'B'), ('A', 'C'), ('B', 'C')}
    assert abs(rows[('A', 'B')]['jaccard_ppm'] / 1e6 - 1 / 3) < 0.10
    assert rows[('A', 'C')]['jaccard_ppm'] == 0
    assert rows[('B', 'C')]['jaccard_ppm'] == 0
    assert all(r['n_merged'] == 256 for r in rows.values())


def test_kmv_matrix_duckdb_parity(spark):
    from scalpel_spark.operators.sketches import (kmv_matrix_sql,
                                                  kmv_overlap_matrix)

    df = spark.range(0, 9000).select(
        F.concat(F.lit('s'), F.pmod('id', F.lit(4)).cast('string')).alias('src'),
        F.concat(F.lit('u'), F.pmod('id', F.lit(3000)).cast('string')).alias('url'))
    got = sorted(tuple(r) for r in
                 kmv_overlap_matrix(df, 'url', 'src', 128).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT 's' || CAST(i % 4 AS VARCHAR) AS src, "
        "'u' || CAST(i % 3000 AS VARCHAR) AS url FROM range(9000) t(i)")
    want = sorted(tuple(r) for r in
                  con.execute(kmv_matrix_sql('url', 't', 'src', 128)).fetchall())
    assert got == want
