"""Bloom / cuckoo URL-seen structures (SURVEY.md §4.2) and the
bloom-prefiltered anti-join's exactness guarantee."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators.seen import Bloom, CuckooFilter, anti_join_seen, build_bloom, sizing_for


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    num_bits, num_hashes = sizing_for(len(keys), 0.01)
    b = Bloom([np.zeros(num_bits >> 3, dtype=np.uint8)], num_bits, num_hashes)
    b.add_array(keys)
    assert b.contains_array(keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    num_bits, num_hashes = sizing_for(len(keys), 0.01)
    b = Bloom([np.zeros(num_bits >> 3, dtype=np.uint8)], num_bits, num_hashes)
    b.add_array(keys)
    fpr = b.contains_array(probe).mean()
    assert fpr < 0.05  # sized for 1%, generous margin


def test_bloom_merge_is_union():
    rng = np.random.default_rng(3)
    a_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    b_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    num_bits, k = sizing_for(10_000, 0.01)
    a = Bloom([np.zeros(num_bits >> 3, dtype=np.uint8)], num_bits, k)
    b = Bloom([np.zeros(num_bits >> 3, dtype=np.uint8)], num_bits, k)
    a.add_array(a_keys)
    b.add_array(b_keys)
    a.merge(b)
    assert a.contains_array(a_keys).all() and a.contains_array(b_keys).all()


def test_build_bloom_distributed(spark):
    df = spark.range(0, 50_000, 1, 8).select(F.xxhash64('id').alias('h'))
    bloom = build_bloom(df, 'h', expected=50_000)
    hashes = np.array([r['h'] for r in df.collect()], dtype=np.int64)
    assert bloom.contains_array(hashes).all()


def test_anti_join_seen_exact_above_and_below_threshold(spark):
    cand = spark.range(0, 10_000).select(
        F.concat(F.lit('u'), F.col('id')).alias('url'), F.xxhash64('id').alias('url_hash')
    )
    seen = spark.range(0, 10_000, 2).select(
        F.concat(F.lit('u'), F.col('id')).alias('url'), F.xxhash64('id').alias('url_hash')
    )
    expected = {f'u{i}' for i in range(1, 10_000, 2)}
    # below threshold → plain anti-join path
    plain = anti_join_seen(cand, seen, 'url_hash', seen_count=5_000, bloom_threshold=100_000)
    assert {r['url'] for r in plain.collect()} == expected
    # above threshold → bloom-prefiltered path; result must be identical
    bloomed = anti_join_seen(cand, seen, 'url_hash', seen_count=5_000, bloom_threshold=1_000)
    assert {r['url'] for r in bloomed.collect()} == expected


def test_cuckoo_insert_contains_delete():
    rng = np.random.default_rng(11)
    keys = rng.integers(-(2**62), 2**62, size=8_000, dtype=np.int64)
    cf = CuckooFilter(num_buckets=8192)
    failed = cf.insert(keys)
    assert failed == 0  # 8k keys in 8192*4 slots → comfortable occupancy
    assert cf.contains(keys).all()
    # delete half, the rest must remain
    half = keys[:4_000]
    deleted = cf.delete(half)
    assert deleted == 4_000
    assert cf.contains(keys[4_000:]).all()
    # deleted keys mostly gone (fingerprint collisions allow a few ghosts)
    assert cf.contains(half).mean() < 0.05


def test_cuckoo_false_positive_rate():
    rng = np.random.default_rng(13)
    keys = rng.integers(-(2**62), 2**62, size=8_000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=8_000, dtype=np.int64)
    cf = CuckooFilter(num_buckets=8192)
    cf.insert(keys)
    assert cf.contains(probe).mean() < 0.02  # 16-bit fingerprints → ~2/65536 per slot pair

# ---------------------------------------------------------------------------
# sharded bloom (round-2 verdict #2: the 10^10-key layout)
# ---------------------------------------------------------------------------


def test_shards_for_sizing():
    """1 shard at every sandbox scale; power-of-2 shards once one bitmap
    would exceed MAX_SHARD_BYTES (10^10 keys @ 12 b/key = ~15 GB → 8+
    shards of <=256 MB each)."""
    from scalpel_spark.operators.seen import MAX_SHARD_BYTES, _next_pow2, shards_for

    assert shards_for(100_000) == 1
    assert shards_for(100_000_000) == 1  # 150 MB bitmap still fits one shard
    n = shards_for(10_000_000_000)
    assert n >= 8 and (n & (n - 1)) == 0
    per_shard_bytes = _next_pow2(10_000_000_000 // n * 12) >> 3
    assert per_shard_bytes <= MAX_SHARD_BYTES


def test_sharded_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(21)
    keys = rng.integers(-(2**62), 2**62, size=40_000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=40_000, dtype=np.int64)
    num_bits, k = sizing_for(len(keys) // 8, 0.01)  # per-shard sizing
    b = Bloom([np.zeros(num_bits >> 3, dtype=np.uint8) for _ in range(8)], num_bits, k)
    b.add_array(keys)
    assert b.contains_array(keys).all()
    assert b.contains_array(probe).mean() < 0.05


def test_sharded_bloom_merge_is_union_per_shard():
    rng = np.random.default_rng(23)
    a_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    b_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    num_bits, k = sizing_for(5_000, 0.01)
    mk = lambda: Bloom([np.zeros(num_bits >> 3, dtype=np.uint8) for _ in range(4)], num_bits, k)  # noqa: E731
    a, b = mk(), mk()
    a.add_array(a_keys)
    b.add_array(b_keys)
    a.merge(b)
    assert a.contains_array(a_keys).all() and a.contains_array(b_keys).all()


def test_build_bloom_sharded_distributed(spark):
    df = spark.range(0, 50_000, 1, 8).select(F.xxhash64('id').alias('h'))
    bloom = build_bloom(df, 'h', expected=50_000, n_shards=4)
    assert bloom.n_shards == 4
    hashes = np.array([r['h'] for r in df.collect()], dtype=np.int64)
    assert bloom.contains_array(hashes).all()
    # shards genuinely partition the key space: every shard holds some keys
    from scalpel_spark.operators.seen import _shard_of

    assert len(np.unique(_shard_of(hashes, 4))) == 4


def test_anti_join_sharded_bloom_identical(spark):
    """Shard count is invisible to results: the n_shards=4 prefiltered
    anti-join returns the exact same set as n_shards=1."""
    from scalpel_spark.operators.seen import bloom_prefiltered_anti_join

    cand = spark.range(0, 10_000).select(
        F.concat(F.lit('u'), F.col('id')).alias('url'), F.xxhash64('id').alias('url_hash')
    )
    seen = spark.range(0, 10_000, 2).select(
        F.concat(F.lit('u'), F.col('id')).alias('url'), F.xxhash64('id').alias('url_hash')
    )
    expected = {f'u{i}' for i in range(1, 10_000, 2)}
    for n_shards in (1, 4):
        bloom = build_bloom(seen, 'url_hash', expected=5_000, n_shards=n_shards)
        got = {r['url'] for r in bloom_prefiltered_anti_join(cand, seen, bloom).collect()}
        assert got == expected


def test_engine_sharded_bloom_identical_crawl(spark):
    """End-to-end: a crawl forced onto the bloom path (bloom_threshold=0)
    with bloom_shards=4 produces the identical dispatch sequence as the
    single-shard default."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=150, n_hosts=8, seed=42).persist()
    seeds = sorted(r['doc_id'] for r in corpus.limit(4).collect())
    a = CrawlEngine(spark, corpus, config=CrawlConfig(bloom_threshold=0)).run(seeds)
    b = CrawlEngine(spark, corpus,
                    config=CrawlConfig(bloom_threshold=0, bloom_shards=4)).run(seeds)
    assert a.dispatch_rows() == b.dispatch_rows()
    corpus.unpersist()


# ---------------------------------------------------------------------------
# executor-side sharded cuckoo (round-2 verdict #3)
# ---------------------------------------------------------------------------


def test_cuckoo_vectorized_insert_matches_loop_membership():
    """The vectorized slot-filling insert and the per-key kick fallback
    together hold exactly the inserted keys (no false negatives)."""
    rng = np.random.default_rng(31)
    keys = rng.integers(-(2**62), 2**62, size=100_000, dtype=np.int64)
    cf = CuckooFilter(num_buckets=65536)  # 262k slots — comfortable
    assert cf.insert(keys) == 0
    assert cf.contains(keys).all()
    # duplicates occupy one slot each (counting semantics for delete)
    cf2 = CuckooFilter(num_buckets=8192)
    dup = np.array([12345, 12345], dtype=np.int64)
    cf2.insert(dup)
    cf2.delete(dup[:1])
    assert cf2.contains(dup[:1]).all()  # second copy still present


def test_sharded_cuckoo_store_insert_delete_no_driver_hash_collect(spark, tmp_path):
    """10^5 hashes flow to the sidecar as ONE grouped executor job; the
    driver only ever collects the per-shard summary rows (<= n_shards),
    never a hash array."""
    from unittest import mock

    from scalpel_spark.operators.seen import ShardedCuckooStore

    store = ShardedCuckooStore(str(tmp_path / 'shards'), num_buckets=1 << 18, n_shards=4)
    df = spark.range(0, 100_000, 1, 8).select(F.xxhash64('id').alias('url_hash'))

    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4 whose subclass overrides collect)
    DataFrame = type(df)
    collected_sizes = []
    real_collect = DataFrame.collect

    def spy_collect(self):
        rows = real_collect(self)
        collected_sizes.append(len(rows))
        return rows

    with mock.patch.object(DataFrame, 'collect', spy_collect):
        saturated = store.insert_df(df)
    assert not saturated
    assert max(collected_sizes) <= 4  # summaries only — never 10^5 hashes

    hashes = np.array([r['url_hash'] for r in df.collect()], dtype=np.int64)
    assert store.contains(hashes).all()
    # executor-side delete of half the keys
    half = spark.range(0, 50_000, 1, 8).select(F.xxhash64('id').alias('url_hash'))
    with mock.patch.object(DataFrame, 'collect', spy_collect):
        n = store.delete_df(half)
    assert n == 50_000
    other = np.array([r['h'] for r in
                      spark.range(50_000, 100_000).select(F.xxhash64('id').alias('h')).collect()],
                     dtype=np.int64)
    assert store.contains(other).all()


def test_sharded_cuckoo_persists_across_instances(tmp_path, spark):
    from scalpel_spark.operators.seen import ShardedCuckooStore

    a = ShardedCuckooStore(str(tmp_path / 's'), num_buckets=1 << 16, n_shards=2)
    df = spark.range(0, 10_000).select(F.xxhash64('id').alias('url_hash'))
    a.insert_df(df)
    b = ShardedCuckooStore(str(tmp_path / 's'), num_buckets=1 << 16, n_shards=2)
    assert b.exists()
    hashes = np.array([r['url_hash'] for r in df.collect()], dtype=np.int64)
    assert b.contains(hashes).all()


def test_engine_sharded_cuckoo_identical_crawl(spark, tmp_path):
    """cuckoo_shards=4 produces the identical crawl as the single-shard
    sidecar (shard layout is invisible to results)."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=120, n_hosts=6, seed=42).persist()
    seeds = sorted(r['doc_id'] for r in corpus.limit(4).collect())
    runs = {}
    for n_shards in (1, 4):
        cfg = CrawlConfig(seen_filter='cuckoo', cuckoo_shards=n_shards)
        store = SnapshotStore(str(tmp_path / f'store{n_shards}'))
        runs[n_shards] = CrawlEngine(spark, corpus, config=cfg, store=store).run(seeds)
    assert runs[1].dispatch_rows() == runs[4].dispatch_rows()
    corpus.unpersist()


def test_sharded_cuckoo_reapplied_insert_is_noop(spark, tmp_path):
    """Retry/speculation safety (VERDICT r3 #4): re-running insert_df
    with the SAME apply_id (a retried task set after a completed rename)
    must not double-insert — ONE fingerprint per key, so one delete
    fully removes membership. A fresh apply_id still inserts a second
    copy (distinct logical operations keep the counting invariant)."""
    from scalpel_spark.operators.seen import ShardedCuckooStore

    store = ShardedCuckooStore(str(tmp_path / 's'), num_buckets=1 << 16,
                               n_shards=2)
    df = spark.range(0, 1_000).select(F.xxhash64('id').alias('url_hash'))
    hashes = np.array([r['url_hash'] for r in df.collect()], dtype=np.int64)

    store.insert_df(df, apply_id='wave-0-insert')
    store.insert_df(df, apply_id='wave-0-insert')  # retried job: no-op
    assert store.contains(hashes).all()
    assert store.delete_df(df, apply_id='wave-0-forget') == 1_000
    assert not store.contains(hashes).any()  # single copy was removed

    # distinct logical ops DO stack copies; a re-applied delete no-ops
    store.insert_df(df, apply_id='wave-1-insert')
    store.insert_df(df, apply_id='wave-2-insert')
    assert store.delete_df(df, apply_id='wave-3-forget') == 1_000
    assert store.contains(hashes).all()  # second copy survives
    assert store.delete_df(df, apply_id='wave-3-forget') == 0  # replayed
    assert store.contains(hashes).all()
    assert store.delete_df(df, apply_id='wave-4-forget') == 1_000
    assert not store.contains(hashes).any()


def test_skew_report_ranks_and_summary(spark):
    from pyspark.sql import functions as F

    from scalpel_spark.operators.skew import skew_report

    rows = [('hot',)] * 60 + [('warm',)] * 30 + [('a',)] * 5 + [('b',)] * 5
    df = spark.createDataFrame(rows, 'host STRING')
    out = {r['key']: r for r in skew_report(df, 'host', top_k=2).collect()}
    assert set(out) == {'__total__', 'hot', 'warm'}
    assert out['hot']['rank'] == 1 and out['hot']['n_rows'] == 60
    assert out['hot']['share_ppm'] == 600_000
    assert out['warm']['rank'] == 2 and out['warm']['share_ppm'] == 300_000
    assert out['__total__']['n_rows'] == 100
    assert out['__total__']['share_ppm'] == 600_000  # max key share
    # plan check: no Python nodes
    plan = skew_report(df, 'host')._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan
