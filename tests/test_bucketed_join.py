"""Bucketed fetch join (DESIGN.md): pre-bucketing the corpus on the join
key removes the corpus-side shuffle — at 100 TB, the only side that can
afford to move is the frontier."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from scalpel_spark.sources.corpus import synthetic_corpus, write_bucketed_corpus


@pytest.fixture()
def no_broadcast(spark):
    # force a sort-merge join so the shuffle structure is visible
    old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
    spark.conf.set('spark.sql.adaptive.autoBroadcastJoinThreshold', '-1')
    yield
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)
    spark.conf.unset('spark.sql.adaptive.autoBroadcastJoinThreshold')


def _n_exchanges(df) -> int:
    df.count()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count('Exchange')


def test_bucketed_corpus_join_is_one_sided_shuffle(spark, tmp_path, no_broadcast):
    corpus = synthetic_corpus(spark, n_pages=500, n_hosts=8, seed=1)
    frontier = corpus.select(F.col('doc_id').alias('url')).filter(
        F.pmod(F.xxhash64('doc_id'), F.lit(5)) == 0)

    # baseline: plain parquet corpus → BOTH join sides shuffle
    plain_path = str(tmp_path / 'plain')
    corpus.write.mode('overwrite').parquet(plain_path)
    plain = spark.read.parquet(plain_path)
    both = frontier.join(plain, frontier['url'] == plain['doc_id']).select('url', 'http_status')
    assert _n_exchanges(both) >= 2

    # bucketed corpus → only the frontier side shuffles
    table = 'corpus_bucketed_' + uuid.uuid4().hex[:8]
    write_bucketed_corpus(corpus, table, n_buckets=8, path=str(tmp_path / 'bucketed'))
    try:
        bucketed = spark.table(table)
        one = frontier.join(bucketed, frontier['url'] == bucketed['doc_id']).select(
            'url', 'http_status')
        assert _n_exchanges(one) == 1
        # same rows either way — the layout is a physical choice only
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, both.collect()))
    finally:
        spark.sql(f'DROP TABLE IF EXISTS {table}')
