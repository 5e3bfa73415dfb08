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
    b = Bloom(np.zeros(num_bits >> 3, dtype=np.uint8), num_bits, num_hashes)
    b.add_array(keys)
    assert b.contains_array(keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    num_bits, num_hashes = sizing_for(len(keys), 0.01)
    b = Bloom(np.zeros(num_bits >> 3, dtype=np.uint8), num_bits, num_hashes)
    b.add_array(keys)
    fpr = b.contains_array(probe).mean()
    assert fpr < 0.05  # sized for 1%, generous margin


def test_bloom_merge_is_union():
    rng = np.random.default_rng(3)
    a_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    b_keys = rng.integers(0, 2**60, size=5_000, dtype=np.int64)
    num_bits, k = sizing_for(10_000, 0.01)
    a = Bloom(np.zeros(num_bits >> 3, dtype=np.uint8), num_bits, k)
    b = Bloom(np.zeros(num_bits >> 3, dtype=np.uint8), num_bits, k)
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
