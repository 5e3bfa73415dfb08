"""Structured Streaming operators: file source → availableNow trigger →
memory sink, fully offline."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalpel_spark.streaming.frontier_stream import (
    FETCH_EVENT_SCHEMA,
    session_windows,
    stateful_politeness,
    windowed_host_throughput,
)


def _write_events(spark, tmpdir: str, rows):
    rows = [(u, h, ts.to_pydatetime(), p) for u, h, ts, p in rows]
    df = spark.createDataFrame(rows, FETCH_EVENT_SCHEMA)
    df.coalesce(1).write.mode('append').parquet(tmpdir)


def _run_stream(spark, out_df, name: str):
    q = (
        out_df.writeStream.format('memory')
        .queryName(name)
        .outputMode('append')
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f'select * from {name}')


@pytest.fixture()
def events_dir(spark, tmp_path):
    base = pd.Timestamp('2024-01-01 00:00:00')
    rows = []
    for i in range(12):
        host = f'h{i % 2}.example.com'
        rows.append((f'http://{host}/p{i}.html', host, base + pd.Timedelta(seconds=i), i))
    # watermark flush sentinel: append-mode windowed aggs only emit once the
    # watermark passes the window end, so a single availableNow batch needs
    # one event far in the future to close the real windows
    rows.append(('http://flush/p.html', 'flush', base + pd.Timedelta(hours=1), 999))
    d = str(tmp_path / 'events')
    _write_events(spark, d, rows)
    return d


def test_stateful_politeness_budget(spark, events_dir):
    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(events_dir)
    name = 'admit_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, stateful_politeness(stream, budget_per_batch=4), name)
    rows = [r for r in out.collect() if r['host'] != 'flush']
    assert len(rows) == 12  # single batch: every new URL emitted once
    per_host = {}
    for r in rows:
        per_host.setdefault(r['host'], []).append(r)
    for host, hr in per_host.items():
        admitted = [r for r in hr if r['admitted']]
        assert len(admitted) == 4  # budget enforced per batch
        # admission is by priority order
        max_admitted = max(r['priority'] for r in admitted)
        min_rejected = min(r['priority'] for r in hr if not r['admitted'])
        assert max_admitted < min_rejected
        assert all(r['dispatched_total'] == 4 for r in hr)


def test_stateful_politeness_multichunk_group(spark, tmp_path):
    """ADVICE r1: the budget must hold across Arrow chunk boundaries — a
    host with more rows than maxRecordsPerBatch still admits exactly
    budget_per_batch URLs, in global priority order."""
    base = pd.Timestamp('2024-01-01 00:00:00')
    n = 500
    rows = [(f'http://big/p{i}.html', 'big.example.com',
             base + pd.Timedelta(seconds=i), n - i) for i in range(n)]
    d = str(tmp_path / 'big')
    _write_events(spark, d, rows)
    spark.conf.set('spark.sql.execution.arrow.maxRecordsPerBatch', '100')
    try:
        stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(d)
        name = 'chunk_' + uuid.uuid4().hex[:8]
        out = _run_stream(spark, stateful_politeness(stream, budget_per_batch=7), name)
        rows = out.collect()
        admitted = sorted(r['priority'] for r in rows if r['admitted'])
        # exactly 7 admitted (not 7 per 100-row chunk), and they are the 7
        # globally smallest priorities
        assert admitted == list(range(1, 8))
        assert all(r['dispatched_total'] == 7 for r in rows)
    finally:
        spark.conf.set('spark.sql.execution.arrow.maxRecordsPerBatch', '65536')


def test_stateful_politeness_deferred_drain(spark, tmp_path):
    """Deferred URLs re-enter admission in later micro-batches in priority
    order (the batch engine's deferred re-enqueue, streaming twin)."""
    import time as _time

    base = pd.Timestamp('2024-01-01 00:00:00')
    d = str(tmp_path / 'drain')
    host = 'h.example.com'
    batch1 = [(f'http://{host}/p{i}.html', host, base + pd.Timedelta(seconds=i), i)
              for i in range(6)]
    _write_events(spark, d, batch1)
    _time.sleep(1.1)  # distinct mtime → deterministic file (batch) order
    batch2 = [(f'http://{host}/p{i}.html', host, base + pd.Timedelta(seconds=i), i)
              for i in range(10, 16)]
    _write_events(spark, d, batch2)

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    name = 'drain_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, stateful_politeness(stream, budget_per_batch=4), name)
    rows = out.collect()
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r['url'], []).append(r['admitted'])

    # batch 1: priorities 0-3 admitted, 4-5 deferred (emitted false);
    # batch 2: deferred 4-5 outrank new 10-15 → admitted, then 10-11
    admitted_prios = sorted(r['priority'] for r in rows if r['admitted'])
    assert admitted_prios == [0, 1, 2, 3, 4, 5, 10, 11]
    # deferred URLs appear twice: false on arrival, true when dispatched
    assert by_url[f'http://{host}/p4.html'] == [False, True]
    assert by_url[f'http://{host}/p5.html'] == [False, True]
    # never-dispatched URLs appear once, false
    assert by_url[f'http://{host}/p15.html'] == [False]
    # running counter: 4 after batch 1, 8 after batch 2
    totals = sorted({r['dispatched_total'] for r in rows})
    assert totals == [4, 8]


def test_stateful_politeness_idle_host_timeout_drain(spark, tmp_path):
    """VERDICT r2 #6: a host with deferred carryover but NO new arrivals
    must still drain within its budget — ProcessingTimeTimeout fires the
    group in a later micro-batch and dispatches the backlog, instead of
    stranding it until the next arrival (or forever)."""
    import time as _time

    base = pd.Timestamp('2024-01-01 00:00:00')
    d = str(tmp_path / 'idle')
    busy, other = 'busy.example.com', 'other.example.com'
    batch1 = [(f'http://{busy}/p{i}.html', busy, base + pd.Timedelta(seconds=i), i)
              for i in range(6)]
    _write_events(spark, d, batch1)
    _time.sleep(1.1)  # distinct mtime → deterministic file (batch) order
    # batch 2 carries NOTHING for the busy host — only the timeout can
    # drain its two deferred URLs
    _write_events(spark, d, [(f'http://{other}/q.html', other,
                              base + pd.Timedelta(seconds=60), 100)])

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    name = 'idle_' + uuid.uuid4().hex[:8]
    out = _run_stream(
        spark, stateful_politeness(stream, budget_per_batch=4, drain_after_ms=1), name)
    rows = out.collect()
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r['url'], []).append(r['admitted'])

    # batch 1: 0-3 admitted, 4-5 deferred; batch 2: timeout drains 4-5
    assert by_url[f'http://{busy}/p4.html'] == [False, True]
    assert by_url[f'http://{busy}/p5.html'] == [False, True]
    busy_admitted = sorted(r['priority'] for r in rows
                           if r['host'] == busy and r['admitted'])
    assert busy_admitted == [0, 1, 2, 3, 4, 5]
    # running counter advances through the drain firing
    assert max(r['dispatched_total'] for r in rows if r['host'] == busy) == 6
    assert by_url[f'http://{other}/q.html'] == [True]


def test_windowed_host_throughput(spark, events_dir):
    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(events_dir)
    name = 'win_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, windowed_host_throughput(stream, '10 seconds', '1 minute'), name)
    rows = [r for r in out.collect() if r['host'] != 'flush']
    # 12 events over 12s, 2 hosts → windows [0,10) and [10,20) per host
    got = {(str(r['window_start']), r['host']): r['n_fetches'] for r in rows}
    assert sum(got.values()) == 12
    assert len({k[0] for k in got}) == 2


def test_session_windows(spark, tmp_path):
    base = pd.Timestamp('2024-01-01 00:00:00')
    rows = [
        ('u1', 'h0', base, 0),
        ('u2', 'h0', base + pd.Timedelta(minutes=5), 1),
        ('u3', 'h0', base + pd.Timedelta(hours=2), 2),  # new session after gap
        ('flush', 'flush', base + pd.Timedelta(days=1), 3),  # watermark flush
    ]
    d = str(tmp_path / 'sess')
    _write_events(spark, d, rows)
    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(d)
    name = 'sess_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, session_windows(stream, gap='30 minutes', watermark='10 hours'), name)
    rows = sorted((r for r in out.collect() if r['host'] != 'flush'),
                  key=lambda r: r['session_start'])
    assert [r['n_events'] for r in rows] == [2, 1]


def test_dedup_discovered_across_batches(spark, tmp_path):
    """Streaming URL-seen dedup: repeats within the watermark horizon are
    dropped, across micro-batch boundaries (state-store keyed on url)."""
    import time as _time

    from scalpel_spark.streaming.frontier_stream import dedup_discovered

    base = pd.Timestamp('2024-01-01 00:00:00')
    d = str(tmp_path / 'dedup')
    host = 'h.example.com'
    batch1 = [(f'http://{host}/p{i}.html', host, base + pd.Timedelta(seconds=i), i)
              for i in (0, 1, 2, 2)]  # in-batch duplicate of p2
    _write_events(spark, d, batch1)
    _time.sleep(1.1)
    batch2 = [(f'http://{host}/p{i}.html', host, base + pd.Timedelta(seconds=10 + i), i)
              for i in (1, 2, 3)]  # 1 and 2 already seen, 3 is new
    _write_events(spark, d, batch2)

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    name = 'dedup_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, dedup_discovered(stream, watermark='1 hour'), name)
    urls = sorted(r['url'] for r in out.collect())
    assert urls == [f'http://{host}/p{i}.html' for i in range(4)]  # each once


def test_stateful_politeness_empty_carryover_roundtrip(spark, tmp_path):
    """A host that stays under budget writes an EMPTY carryover to state;
    the next batch must read it back cleanly (array-typed state fields)."""
    import time as _time

    base = pd.Timestamp('2024-01-01 00:00:00')
    d = str(tmp_path / 'under')
    host = 'h.example.com'
    _write_events(spark, d, [(f'http://{host}/p0.html', host, base, 0),
                             (f'http://{host}/p1.html', host, base, 1)])
    _time.sleep(1.1)
    _write_events(spark, d, [(f'http://{host}/p2.html', host, base + pd.Timedelta(seconds=5), 2)])

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    name = 'under_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, stateful_politeness(stream, budget_per_batch=4), name)
    rows = out.collect()
    assert all(r['admitted'] for r in rows) and len(rows) == 3
    assert sorted({r['dispatched_total'] for r in rows}) == [2, 3]


def test_curate_stream_gates_then_dedups(spark, tmp_path):
    """Streaming curation twin: low-quality docs never reach the state
    store; exact normalized-text dups are dropped across micro-batches."""
    import time as _time

    from scalpel_spark.streaming.curation_stream import (
        DOC_EVENT_SCHEMA,
        curate_stream,
    )

    base = pd.Timestamp('2024-01-01 00:00:00')
    d = str(tmp_path / 'docs')
    good = 'the quick brown fox jumps over a lazy dog of words and more text here'
    other = 'a completely different document with its own unique set of tokens inside'
    batch1 = [
        (0, good, base.to_pydatetime()),
        (1, 'spam spam spam spam',
         (base + pd.Timedelta(seconds=1)).to_pydatetime()),  # low quality
    ]
    spark.createDataFrame(batch1, DOC_EVENT_SCHEMA).coalesce(1) \
        .write.mode('append').parquet(d)
    _time.sleep(1.1)
    batch2 = [
        (2, good.upper() + '!',
         (base + pd.Timedelta(seconds=10)).to_pydatetime()),  # normalized dup of 0
        (3, other, (base + pd.Timedelta(seconds=11)).to_pydatetime()),
    ]
    spark.createDataFrame(batch2, DOC_EVENT_SCHEMA).coalesce(1) \
        .write.mode('append').parquet(d)

    stream = (spark.readStream.schema(DOC_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    name = 'curate_' + uuid.uuid4().hex[:8]
    out = _run_stream(spark, curate_stream(stream, quality_threshold=0.45), name)
    rows = {r['doc_id']: r for r in out.collect()}
    assert set(rows) == {0, 3}           # 1 gated, 2 deduped vs 0
    assert rows[0]['fingerprint'] is not None
