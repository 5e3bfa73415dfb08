"""Resume determinism (SURVEY.md §5.2.6 / north-rule T4): a crawl
interrupted after wave k and resumed from the snapshot store must produce
state tables identical to an uninterrupted run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

N_PAGES, N_HOSTS = 100, 6


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture(scope='module')
def corpus_and_robots(spark):
    return (
        synthetic_corpus(spark, n_pages=N_PAGES, n_hosts=N_HOSTS, seed=42).persist(),
        synthetic_robots(spark, n_hosts=N_HOSTS),
    )


def test_interrupted_plus_resumed_equals_uninterrupted(spark, tmp_path, corpus_and_robots):
    corpus, robots = corpus_and_robots
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(N_HOSTS)]
    kwargs = dict(follow_robots_txt=True, max_dispatch_per_host_per_wave=5)

    full_store = SnapshotStore(str(tmp_path / 'full'))
    full = CrawlEngine(spark, corpus, robots, CrawlConfig(**kwargs), full_store).run(seeds)

    part_store = SnapshotStore(str(tmp_path / 'part'))
    CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=2, **kwargs), part_store).run(seeds)
    resumed = CrawlEngine(spark, corpus, robots, CrawlConfig(**kwargs), part_store).resume()

    seen_cols = ['url', 'url_hash', 'status', 'wave', 'priority']
    assert _rows(resumed.seen, seen_cols) == _rows(full.seen, seen_cols)
    assert _rows(resumed.followed, ['url']) == _rows(full.followed, ['url'])
    assert _rows(resumed.items, ['doc_id', 'quote', 'author', 'item_seq']) == \
        _rows(full.items, ['doc_id', 'quote', 'author', 'item_seq'])
    assert resumed.fetch_sequence() == full.fetch_sequence()


def test_resume_without_snapshot_raises(spark, tmp_path, corpus_and_robots):
    corpus, robots = corpus_and_robots
    engine = CrawlEngine(spark, corpus, robots, CrawlConfig(),
                         SnapshotStore(str(tmp_path / 'empty')))
    with pytest.raises(ValueError, match='nothing to resume'):
        engine.resume()


def test_snapshot_manifest_atomicity(spark, tmp_path, corpus_and_robots):
    """Every snapshot in the manifest is loadable; wave ids are dense."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'atomic'))
    CrawlEngine(
        spark, corpus, robots, CrawlConfig(follow_robots_txt=True, max_waves=3), store
    ).run([f'http://h0.example.com/p0.html'])
    snaps = store.snapshots()
    assert [s['wave'] for s in snaps] == list(range(len(snaps)))
    for s in snaps:
        for table, path in s['tables'].items():
            spark.read.parquet(path).count()  # loadable, not torn


def test_time_travel_as_of_snapshot(spark, tmp_path, corpus_and_robots):
    """Iceberg VERSION-AS-OF parity: `CrawlResult.as_of(snapshot_id)` reads
    the accumulated seen state as of each wave's commit — monotone growth,
    per-wave prefix equality with the final state, and KeyError on unknown
    ids (no silent full-history fallback)."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'tt'))
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=3)
    res = CrawlEngine(spark, corpus, robots, cfg, store).run(
        [r['doc_id'] for r in corpus.limit(3).collect()])
    snaps = store.snapshots()
    assert len(snaps) >= 2
    final = _rows(res.seen, ['url', 'status', 'wave'])
    prev_n = 0
    for snap in snaps:
        seen_at = res.as_of(snap['id'], 'seen')
        rows_at = _rows(seen_at, ['url', 'status', 'wave'])
        assert len(rows_at) >= prev_n                       # monotone accumulation
        assert rows_at == [r for r in final if r[2] <= snap['wave']]  # exact wave prefix
        prev_n = len(rows_at)
    assert _rows(res.as_of(snaps[-1]['id'], 'seen'), ['url']) == _rows(res.seen, ['url'])
    with pytest.raises(KeyError):
        res.as_of('s999999-w9', 'seen')
