"""Snapshot maintenance (Iceberg rewrite_data_files / expire_snapshots /
remove_orphan_files parity): every wave commits a snapshot, so an always-on
crawl must be able to compact + expire history without changing current
state, breaking time-travel to retained snapshots, or breaking resume.

Reference parity note: the reference has no persistence at all
(crash = restart, ``scalpel/any_io/static_spider.py``); snapshot
maintenance belongs to the Iceberg-table layer the north rule adds.
"""

from __future__ import annotations

import os

import pytest

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


SEEN_COLS = ['url', 'url_hash', 'status', 'wave', 'priority']
KW = dict(follow_robots_txt=True, max_dispatch_per_host_per_wave=5)


def test_expire_preserves_state_and_time_travel(spark, tmp_path, corpus_and_robots):
    """Checkpoint + expire: current state bit-identical, superseded
    prefix gone from manifest AND disk, expired ids not time-travelable,
    retained snapshot still readable."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'exp'))
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(N_HOSTS)]
    engine = CrawlEngine(spark, corpus, robots, CrawlConfig(**KW), store)
    res = engine.run(seeds)

    before_seen = _rows(res.seen, SEEN_COLS)
    before_items = _rows(res.items, ['doc_id', 'quote', 'author', 'item_seq'])
    before_metrics = res.metrics.count()
    old_ids = [s['id'] for s in store.snapshots()]
    assert len(old_ids) >= 3  # multi-wave crawl: real history to expire

    expired = engine.expire_snapshots(retain_last=1)
    assert expired == old_ids  # checkpoint superseded ALL prior history

    snaps = store.snapshots()
    assert len(snaps) == 1 and snaps[0]['metadata'].get('checkpoint')
    assert _rows(res.seen, SEEN_COLS) == before_seen
    assert _rows(res.items, ['doc_id', 'quote', 'author', 'item_seq']) == before_items
    assert res.metrics.count() == before_metrics
    data_dir = os.path.join(store.root, 'data')
    on_disk = set(os.listdir(data_dir))
    assert not (on_disk & set(expired))            # expired dirs deleted
    assert snaps[0]['id'] in on_disk               # retained dir intact
    with pytest.raises(KeyError):
        res.as_of(expired[0], 'seen')              # like Iceberg: id is gone
    assert _rows(res.as_of(snaps[0]['id'], 'seen'), SEEN_COLS) == before_seen


def test_expire_mid_crawl_then_resume_is_deterministic(spark, tmp_path, corpus_and_robots):
    """The strongest invariant: interrupt after wave 2, expire history,
    resume — final tables identical to an uninterrupted run (the
    checkpoint must carry frontier + next_priority + every state table)."""
    corpus, robots = corpus_and_robots
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(N_HOSTS)]

    full = CrawlEngine(spark, corpus, robots, CrawlConfig(**KW),
                       SnapshotStore(str(tmp_path / 'full'))).run(seeds)

    part_store = SnapshotStore(str(tmp_path / 'part'))
    part_engine = CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=2, **KW), part_store)
    part_engine.run(seeds)
    assert part_engine.expire_snapshots(retain_last=1)
    resumed = CrawlEngine(spark, corpus, robots, CrawlConfig(**KW), part_store).resume()

    assert _rows(resumed.seen, SEEN_COLS) == _rows(full.seen, SEEN_COLS)
    assert _rows(resumed.followed, ['url']) == _rows(full.followed, ['url'])
    assert _rows(resumed.items, ['doc_id', 'quote', 'author', 'item_seq']) == \
        _rows(full.items, ['doc_id', 'quote', 'author', 'item_seq'])
    assert resumed.fetch_sequence() == full.fetch_sequence()


def test_expire_without_checkpoint_is_noop(spark, tmp_path, corpus_and_robots):
    """Every pre-checkpoint snapshot contributes delta paths to current
    state, so direct expiry must refuse to delete anything."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'noop'))
    CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=2, **KW), store).run(
        [f'http://h{h}.example.com/p{h}.html' for h in range(N_HOSTS)])
    n = len(store.snapshots())
    assert n >= 2
    assert store.expire_snapshots(retain_last=1) == []
    assert len(store.snapshots()) == n


def test_remove_orphan_files(spark, tmp_path, corpus_and_robots):
    """Unreferenced data/<id> dirs (crash leftovers) are deleted;
    referenced ones are untouched."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'orph'))
    CrawlEngine(spark, corpus, robots, CrawlConfig(max_waves=1, **KW), store).run(
        [f'http://h0.example.com/p0.html'])
    orphan = os.path.join(store.root, 'data', 's999999-w9')
    os.makedirs(orphan)
    open(os.path.join(orphan, 'part-junk.parquet'), 'w').close()
    removed = store.remove_orphan_files()
    assert removed == ['s999999-w9'] and not os.path.exists(orphan)
    for snap in store.snapshots():
        for path in snap['tables'].values():
            assert os.path.exists(path)


def test_commit_ids_unique_after_expiry(spark, tmp_path, corpus_and_robots):
    """Snapshot sequence numbers are monotone across expiry: a new commit
    after expiring history must NOT reuse a retained snapshot's id (the
    old ``len(snapshots)`` scheme would, silently overwriting its data)."""
    corpus, robots = corpus_and_robots
    store = SnapshotStore(str(tmp_path / 'ids'))
    engine = CrawlEngine(spark, corpus, robots, CrawlConfig(**KW), store)
    res = engine.run([f'http://h{h}.example.com/p{h}.html' for h in range(N_HOSTS)])
    engine.expire_snapshots(retain_last=1)
    ids_before = {s['id'] for s in store.snapshots()}
    engine.forget([res.seen.limit(1).collect()[0]['url']])
    new_ids = {s['id'] for s in store.snapshots()} - ids_before
    assert len(new_ids) == 1
    seqs = sorted(int(s['id'][1:7]) for s in store.snapshots())
    assert len(set(seqs)) == len(seqs)  # strictly unique, monotone history
