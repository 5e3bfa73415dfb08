"""Live HTTP fetch source — the real-deployment twin of the corpus join.

In the graft there is no network, so the engine's fetch stage is a join
against the synthetic web table (SURVEY §2.1 S2: ``frontier ⋈ corpus``).
On a real crawl the same stage is THIS operator: an Arrow-batched
``mapInPandas`` fetcher over host-partitioned frontier rows — the shape
SURVEY S2 prescribes ("on a real crawl: ``mapInPandas`` batch fetcher
per host-partition").

Physical contract (what makes this correct at 1000 executors):

* **Partition by host** (``repartition(host)`` — or the engine's salted
  host for hot sites) and sort within partitions by ``(host, priority)``
  so ONE task owns each host's dispatch order. Politeness then needs no
  coordination: a task paces its own hosts; two tasks never share one.
* **Batch, never per-row**: the fetch callable receives a pandas
  DataFrame of URLs (one Arrow batch) and returns aligned columns; a
  real implementation runs an async client pool per batch (the
  reference's httpx AsyncClient, ``any_io/static_spider.py:70-74``,
  becomes one client per TASK reused across batches).
* **Virtual dispatch times**: each row gets ``dispatch_ms`` — the
  cumulative per-host pacing budget (``slot × delay``) a live fetcher
  sleeps to honor crawl-delay; recorded so tests can assert pacing
  without wall-clock sleeps (and so lineage metrics can audit it).
* **Quarantine, not crash**: a fetch callable raising on a batch marks
  those rows ``status=-1`` (unreachable) instead of failing the stage —
  at 10^10 URLs a dead host must never kill a wave.

No network library ships in this container, so ``real_http_fetch`` is a
documented ``NotImplementedError`` stub and tests inject
``deterministic_fake_fetch`` (payload = md5(url), latency = a stable
function of the hash) — the same injectable-callable pattern as
``operators/multimodal.decode_fn``. The Spark-side plumbing (schema,
partitioning, ordering, pacing, quarantine) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField('url', T.StringType()),
        T.StructField('host', T.StringType()),
        T.StructField('status', T.IntegerType()),
        T.StructField('body', T.StringType()),
        T.StructField('fetch_ms', T.DoubleType()),
        T.StructField('dispatch_ms', T.DoubleType()),
    ]
)


def deterministic_fake_fetch(batch: pd.DataFrame) -> pd.DataFrame:
    """Seed-stable fake: status 200 (or 404 when md5(url) ends in 'f'),
    body = md5 hex of the url, latency = (first md5 byte % 10) + 1 ms.
    Chosen so a DuckDB twin (``md5(url)``) can recompute every value."""
    digests = [hashlib.md5(u.encode('utf-8')).hexdigest() for u in batch['url']]
    return pd.DataFrame(
        {
            'status': [404 if d[-1] == 'f' else 200 for d in digests],
            'body': digests,
            'fetch_ms': [float(int(d[:2], 16) % 10 + 1) for d in digests],
        }
    )


def real_http_fetch(batch: pd.DataFrame) -> pd.DataFrame:
    """Live-network fetch is not possible in this sandbox (no network,
    no httpx/aiohttp installed). A deployment injects a callable with
    this exact signature: pandas DataFrame in (columns ``url``, ``host``),
    pandas DataFrame out (columns ``status``, ``body``, ``fetch_ms``),
    typically an async client pool per task, reused across batches."""
    raise NotImplementedError(
        'no network in this environment — inject fetch_fn=your_batch_fetcher'
    )


def fetch_frontier(
    frontier_df: DataFrame,
    fetch_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    url_col: str = 'url',
    host_col: str = 'host',
    order_col: str = 'priority',
    delay_col: Optional[str] = None,
    default_delay: float = 0.0,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Fetch a wave's frontier rows through an injected batch fetcher.

    Rows are repartitioned by ``host`` and sorted ``(host, order_col)``
    within partitions, so each host's URLs arrive at one task in dispatch
    order. ``dispatch_ms`` = slot × delay × 1000 per host (slot counted
    in that order) — the pacing a live fetcher sleeps between same-host
    requests; cross-host requests in a partition interleave freely. A
    batch whose ``fetch_fn`` call raises quarantines to ``status=-1``
    with empty body rather than failing the task.
    """
    fn = fetch_fn or deterministic_fake_fetch
    cols = [F.col(url_col).alias('url'), F.col(host_col).alias('host'),
            F.col(order_col).alias('_ord')]
    if delay_col is not None:
        cols.append(F.col(delay_col).cast('double').alias('_delay'))
    else:
        cols.append(F.lit(float(default_delay)).alias('_delay'))
    prepared = frontier_df.select(*cols)
    if n_partitions is not None:
        prepared = prepared.repartition(n_partitions, 'host')
    else:
        prepared = prepared.repartition('host')
    prepared = prepared.sortWithinPartitions('host', '_ord')

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-host slot counters persist ACROSS batches within the task:
        # a host split over two Arrow batches keeps accumulating slots
        slots: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            try:
                fetched = fn(pdf[['url', 'host']])
                status = fetched['status'].astype('int32')
                body = fetched['body']
                fetch_ms = fetched['fetch_ms'].astype('float64')
            except Exception:
                status = pd.Series([-1] * len(pdf), dtype='int32')
                body = pd.Series([''] * len(pdf))
                fetch_ms = pd.Series([0.0] * len(pdf), dtype='float64')
            dispatch = []
            for host, delay in zip(pdf['host'], pdf['_delay']):
                slot = slots.get(host, 0)
                slots[host] = slot + 1
                dispatch.append(slot * float(delay) * 1000.0)
            yield pd.DataFrame(
                {
                    'url': pdf['url'].values,
                    'host': pdf['host'].values,
                    'status': status.values,
                    'body': body.values,
                    'fetch_ms': fetch_ms.values,
                    'dispatch_ms': dispatch,
                }
            )

    return prepared.mapInPandas(run_batches, FETCH_SCHEMA)
