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
  (dispatched_total, last_batch_dispatched); URLs over budget in a batch
  are emitted with ``admitted=false`` (a real deployment would loop them
  back into the frontier topic).

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

_STATE_SCHEMA = T.StructType([T.StructField('dispatched_total', T.LongType())])


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


def stateful_politeness(stream: DataFrame, budget_per_batch: int = 5) -> DataFrame:
    """Custom stateful operator: per-host dispatch admission.

    Each micro-batch admits at most ``budget_per_batch`` URLs per host in
    priority order; a persistent per-host counter (`dispatched_total`)
    carries across batches. Arrow-batched grouped-map state — no per-row
    Python, state is one int per host.
    """

    def admit(key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        total = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values('priority')
            admitted = [i < budget_per_batch for i in range(len(pdf))]
            total += sum(admitted)
            out.append(pd.DataFrame({
                'host': host,
                'url': pdf['url'].to_numpy(),
                'priority': pdf['priority'].to_numpy(),
                'admitted': admitted,
                'dispatched_total': total,
            }))
        state.update((total,))
        yield from out

    return (
        stream.groupBy('host')
        .applyInPandasWithState(
            admit,
            outputStructType=ADMIT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode='append',
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
