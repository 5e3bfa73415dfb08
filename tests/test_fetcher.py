"""Live-fetch source plumbing (sources/fetcher.py): host-partitioned
dispatch order, pacing slots, quarantine, injectable fetch callable."""

import hashlib

import pandas as pd
import pytest

from pyspark.sql import functions as F

from scalpel_spark.sources.fetcher import (
    deterministic_fake_fetch, fetch_frontier, real_http_fetch)


def _frontier(spark, n_hosts=4, per_host=6):
    rows = []
    pri = 0
    for p in range(per_host):
        for h in range(n_hosts):
            rows.append((f'http://h{h}.test/p{p}', f'h{h}.test', pri, 2.0))
            pri += 1
    return spark.createDataFrame(
        rows, 'url string, host string, priority long, delay double')


def test_fake_fetch_matches_md5(spark):
    out = fetch_frontier(_frontier(spark), n_partitions=2).collect()
    assert len(out) == 24
    for r in out:
        d = hashlib.md5(r['url'].encode()).hexdigest()
        assert r['body'] == d
        assert r['status'] == (404 if d[-1] == 'f' else 200)
        assert r['fetch_ms'] == float(int(d[:2], 16) % 10 + 1)


def test_dispatch_slots_follow_priority_order_per_host(spark):
    out = fetch_frontier(_frontier(spark), delay_col='delay',
                         n_partitions=2).collect()
    # per host: the k-th URL in priority order gets dispatch_ms = k*2000
    by_host = {}
    for r in sorted(out, key=lambda r: int(r['url'].rsplit('p', 1)[1])):
        by_host.setdefault(r['host'], []).append(r['dispatch_ms'])
    assert len(by_host) == 4
    for host, ms in by_host.items():
        assert ms == [i * 2000.0 for i in range(6)], (host, ms)


def test_host_owned_by_single_task(spark):
    df = fetch_frontier(_frontier(spark), n_partitions=3)
    got = (df.withColumn('pid', F.spark_partition_id())
           .groupBy('host').agg(F.countDistinct('pid').alias('np'))
           .collect())
    assert all(r['np'] == 1 for r in got)


def test_slots_survive_arrow_batch_splits(spark):
    spark.conf.set('spark.sql.execution.arrow.maxRecordsPerBatch', '5')
    try:
        out = fetch_frontier(_frontier(spark, n_hosts=1, per_host=23),
                             delay_col='delay', n_partitions=1).collect()
        ms = sorted(r['dispatch_ms'] for r in out)
        assert ms == [i * 2000.0 for i in range(23)]
    finally:
        spark.conf.unset('spark.sql.execution.arrow.maxRecordsPerBatch')


def test_failing_fetch_quarantines_not_crashes(spark):
    def bomb(batch: pd.DataFrame) -> pd.DataFrame:
        raise RuntimeError('connection pool exploded')

    out = fetch_frontier(_frontier(spark), fetch_fn=bomb, n_partitions=2).collect()
    assert len(out) == 24
    assert all(r['status'] == -1 and r['body'] == '' for r in out)


def test_real_fetch_is_a_documented_stub():
    with pytest.raises(NotImplementedError):
        real_http_fetch(pd.DataFrame({'url': ['http://x'], 'host': ['x']}))


def test_fake_fetch_is_pure_pandas():
    batch = pd.DataFrame({'url': ['http://a/1', 'http://b/2'],
                          'host': ['a', 'b']})
    out = deterministic_fake_fetch(batch)
    assert list(out.columns) == ['status', 'body', 'fetch_ms']
    pd.testing.assert_frame_equal(out, deterministic_fake_fetch(batch))
