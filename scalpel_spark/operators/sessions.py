"""Event sessionization — the batch twin of the streaming session-window
(`streaming/` holds the Structured Streaming variant).

Gap-based sessions: a new session starts when the gap to the previous event
of the same user exceeds ``gap_s``. Computed with lag + running sum windows
— one shuffle on user_id, arithmetic in exact integer microseconds
(``unix_micros``) so the DuckDB oracle (``epoch_us``) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import pround


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """(user_id, session_id, n_events, started_us, ended_us) per session."""
    # parquet timestamps load as TIMESTAMP_NTZ; session tz is pinned UTC so
    # the cast is a pure reinterpretation, matching DuckDB's epoch_us(ts)
    us = F.unix_micros(F.col('ts').cast('timestamp'))
    # us is monotone in ts, so ordering by (us, event_id) ≡ (ts, event_id)
    w = Window.partitionBy('user_id').orderBy('us', 'event_id')
    gap_us = gap_s * 1_000_000
    marked = events.select(
        'user_id', 'event_id', us.alias('us')
    ).withColumn(
        'new_session',
        F.when(F.col('us') - F.lag('us').over(w) > gap_us, 1).otherwise(0),
    ).withColumn('session_id', F.sum('new_session').over(w).cast('long'))
    return (
        marked.groupBy('user_id', 'session_id')
        .agg(
            F.count('*').alias('n_events'),
            F.min('us').alias('started_us'),
            F.max('us').alias('ended_us'),
        )
    )


def session_stats(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-user session summary: (user_id, n_sessions, max_session_events,
    avg_session_events)."""
    s = sessionize(events, gap_s)
    return s.groupBy('user_id').agg(
        F.count('*').alias('n_sessions'),
        F.max('n_events').alias('max_session_events'),
        pround(F.avg('n_events'), 4).alias('avg_session_events'),
    )
