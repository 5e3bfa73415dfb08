"""Structured Streaming mode for the crawl engine (SURVEY.md §2.9 T1/T5).

The reference crawl is a terminating batch BFS, so streaming is an
*extension*, not a parity requirement: these operators let the same frontier
semantics run continuously (URLs arriving while processing — the queue-grows
-during-crawl behavior of ``any_io/response.py:29`` — becomes a stream of
discovered URLs).

Three operators:

* ``windowed_host_throughput`` — tumbling-window fetch counts per host with
  a watermark for late events (the metrics table's streaming twin).
* ``session_windows`` — native ``F.session_window`` gap sessions (the
  streaming twin of ``operators/sessions.py``).
* ``stateful_politeness`` — ``applyInPandasWithState`` keyed by host: the
  per-host politeness budget as a custom stateful operator. State =
  (dispatched_total, deferred URL carryover); URLs over budget are
  emitted ``admitted=false`` in their arrival batch, carried in state,
  and re-emitted ``admitted=true`` when a later micro-batch has budget —
  the streaming twin of the batch engine's deferred re-enqueue.

All are testable offline with file sources + ``trigger(availableNow=True)``
+ memory sink — no network needed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField('url', T.StringType()),
        T.StructField('host', T.StringType()),
        T.StructField('ts', T.TimestampType()),
        T.StructField('priority', T.LongType()),
    ]
)

ADMIT_SCHEMA = T.StructType(
    [
        T.StructField('host', T.StringType()),
        T.StructField('url', T.StringType()),
        T.StructField('priority', T.LongType()),
        T.StructField('admitted', T.BooleanType()),
        T.StructField('dispatched_total', T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField('dispatched_total', T.LongType()),
        # deferred (over-budget) URLs carried to the next micro-batch —
        # the streaming twin of the batch engine's `deferred` re-enqueue
        # (plans/engine.py politeness step)
        T.StructField('carry_urls', T.ArrayType(T.StringType())),
        T.StructField('carry_prios', T.ArrayType(T.LongType())),
    ]
)


def windowed_host_throughput(stream: DataFrame, window: str = '10 seconds',
                             watermark: str = '30 seconds') -> DataFrame:
    """Per-host fetch counts in tumbling windows; late rows beyond the
    watermark are dropped (bounded state — mandatory for an unbounded
    crawl stream)."""
    return (
        stream.withWatermark('ts', watermark)
        .groupBy(F.window('ts', window).alias('win'), 'host')
        .agg(F.count('*').alias('n_fetches'), F.min('priority').alias('min_priority'))
        .select(F.col('win.start').alias('window_start'), 'host', 'n_fetches', 'min_priority')
    )


def session_windows(stream: DataFrame, gap: str = '30 minutes',
                    watermark: str = '1 hour') -> DataFrame:
    """Gap-based session windows per host (streaming twin of
    ``operators/sessions.sessionize``)."""
    return (
        stream.withWatermark('ts', watermark)
        .groupBy(F.session_window('ts', gap).alias('sess'), 'host')
        .agg(F.count('*').alias('n_events'))
        .select(F.col('sess.start').alias('session_start'), F.col('sess.end').alias('session_end'),
                'host', 'n_events')
    )


def dedup_discovered(stream: DataFrame, watermark: str = '1 hour') -> DataFrame:
    """Streaming URL-seen dedup: first sighting of each URL wins, repeats
    within the watermark horizon are dropped. Uses
    ``dropDuplicatesWithinWatermark`` — the key-only dedup whose per-URL
    state IS evicted once the watermark passes (plain ``dropDuplicates``
    on a key subset without the event-time column keeps state forever).
    The streaming twin of the batch engine's seen anti-join: the state
    store is the recent-seen set, the durable full set lives in the
    committed seen table that a periodic batch anti-join reconciles
    against.
    """
    return stream.withWatermark('ts', watermark).dropDuplicatesWithinWatermark(['url'])


def stateful_politeness(stream: DataFrame, budget_per_batch: int = 5,
                        drain_after_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-host dispatch admission with
    carryover re-enqueue.

    Each micro-batch admits at most ``budget_per_batch`` URLs per host in
    priority order ACROSS the whole batch group (the pandas chunk iterator
    is concatenated first — chunks are an Arrow transfer artifact split at
    ``maxRecordsPerBatch``, never an admission boundary). Over-budget URLs
    are kept in state and re-compete in later micro-batches, highest
    priority first — the streaming twin of the batch engine's ``deferred``
    re-enqueue (plans/engine.py step 4).

    Emission contract: every NEW URL is emitted once in its arrival batch
    with its admission status; a deferred URL is emitted again (admitted =
    true) in the batch that finally dispatches it. ``dispatched_total`` is
    the host's post-batch running counter, identical on every row of the
    batch.

    ``drain_after_ms`` arms ``GroupStateTimeout.ProcessingTimeTimeout``:
    a host holding deferred URLs that receives NO new arrivals for that
    long is invoked with ``state.hasTimedOut`` in a later micro-batch and
    drains up to ``budget_per_batch`` carryover URLs per timeout firing
    (re-arming itself until the carryover is empty) — so an idle host's
    backlog still dispatches within its budget instead of waiting for the
    next arrival. ``None`` keeps the legacy no-timeout behavior where
    stream-end strands the carryover.
    """

    def admit(key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            total, carry_urls, carry_prios = state.get
            carry_urls, carry_prios = list(carry_urls), list(carry_prios)
        else:
            total, carry_urls, carry_prios = 0, [], []
        if drain_after_ms is not None and state.hasTimedOut:
            # idle-host drain: no new arrivals this batch — dispatch the
            # highest-priority carryover within the same per-batch budget
            pool = pd.DataFrame({'url': carry_urls, 'priority': carry_prios})
            pool = pool.sort_values(['priority', 'url'], kind='mergesort')
            admitted = pool.head(budget_per_batch)
            deferred = pool.tail(max(len(pool) - budget_per_batch, 0))
            total += len(admitted)
            state.update((total, list(deferred['url']),
                          [int(p) for p in deferred['priority']]))
            if len(deferred):
                state.setTimeoutDuration(drain_after_ms)
            yield pd.DataFrame({
                'host': host,
                'url': admitted['url'].to_numpy(),
                'priority': admitted['priority'].to_numpy(),
                'admitted': True,
                'dispatched_total': total,
            })
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        new = (pd.concat(chunks, ignore_index=True) if chunks
               else pd.DataFrame({'url': [], 'priority': []}))
        new_urls = set(new['url'])

        pool = pd.DataFrame({
            'url': carry_urls + list(new['url']),
            'priority': carry_prios + [int(p) for p in new['priority']],
        }).sort_values(['priority', 'url'], kind='mergesort')
        admitted_mask = [i < budget_per_batch for i in range(len(pool))]
        pool = pool.assign(admitted=admitted_mask)
        n_admitted = int(pool['admitted'].sum())
        total += n_admitted

        deferred = pool[~pool['admitted']]
        state.update((total, list(deferred['url']), [int(p) for p in deferred['priority']]))
        if drain_after_ms is not None and len(deferred):
            state.setTimeoutDuration(drain_after_ms)

        # emit: all admitted rows + the newly-arrived-and-deferred rows
        # (carryover rows already emitted admitted=false on arrival)
        emit = pool[pool['admitted'] | pool['url'].isin(new_urls)]
        yield pd.DataFrame({
            'host': host,
            'url': emit['url'].to_numpy(),
            'priority': emit['priority'].to_numpy(),
            'admitted': emit['admitted'].to_numpy(),
            'dispatched_total': total,
        })

    return (
        stream.groupBy('host')
        .applyInPandasWithState(
            admit,
            outputStructType=ADMIT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode='append',
            timeoutConf=(GroupStateTimeout.NoTimeout if drain_after_ms is None
                         else GroupStateTimeout.ProcessingTimeTimeout),
        )
    )
