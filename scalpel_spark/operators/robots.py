"""Robots.txt evaluation as a batch operator.

Reference semantics (``any_io/robots.py:43-95``, ``core/robots.py:12-42``),
lifted to set-oriented form:

* per-host decision computed ONCE, on the host's *first dispatched URL*
  (the reference caches ``_delay_mapping[host]`` after the first
  ``get_request_delay`` call — the first URL decides the whole host,
  including the ``-1`` never-fetch sentinel);
* fetch-status policy: connect-timeout (-1) / 401 / 403 → deny-all;
  other 4xx/5xx → allow-all with no rules; 200 → stdlib RobotFileParser;
  missing robots row ≡ connect-timeout (no server ⇒ deny, matching
  ``httpx.ConnectTimeout`` → False at ``any_io/robots.py:51-53``);
* delay precedence: ``crawl_delay('*')`` → ``request_rate.seconds/requests``
  → config default (``core/robots.py:21-42``).

Physical shape: the frontier's *distinct new hosts* (one row per host after
a min_by aggregation) are broadcast-joined to the small robots table, then
evaluated in ``mapInPandas`` — the Python robots parser runs once per host,
never per URL, so per-URL work stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from urllib.robotparser import RobotFileParser

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField('host', T.StringType()),
        T.StructField('excluded', T.BooleanType()),
        T.StructField('delay', T.DoubleType()),
    ]
)


def _evaluate_host(fetch_status, rules: str, decision_url: str, user_agent: str,
                   default_delay: float, mode: str = 'anyio',
                   matcher: str = 'stdlib'):
    """Pure per-host kernel — also the spec used by the simulator.

    ``mode='green'`` reproduces the gevent backend's pacing: the config
    delay is ALWAYS used for allowed hosts — robots crawl-delay /
    request-rate are not honored (green/static_spider.py:192-199 TODO;
    documented at docs/static-spider.md "Good to know"). Exclusion
    (deny-all, -1 sentinel) is identical in both modes.

    ``matcher='rfc9309'`` drops the reference's first-URL-decides-the-host
    quirk: rules-based denial is decided PER URL downstream
    (``operators/robots9309``), so here only the fetch-status policy
    (timeout/401/403 → deny-all) can exclude the host; the delay
    precedence is unchanged (crawl-delay IS host-scoped).
    """
    if fetch_status is None or fetch_status == -1 or fetch_status in (401, 403):
        return True, -1.0
    if fetch_status >= 400:
        return False, float(default_delay)
    parser = RobotFileParser()
    parser.parse((rules or '').splitlines())
    if matcher == 'stdlib' and not parser.can_fetch(user_agent, decision_url):
        return True, -1.0
    if mode == 'green':
        return False, float(default_delay)
    crawl_delay = parser.crawl_delay('*')
    if crawl_delay is not None:
        return False, float(crawl_delay)
    request_rate = parser.request_rate('*')
    if request_rate is not None:
        return False, request_rate.seconds / request_rate.requests
    return False, float(default_delay)


def evaluate_new_hosts(
    new_host_first_urls: DataFrame,  # (host, decision_url) — one row per host
    robots_df: DataFrame,  # (host, fetch_status, rules) — small, broadcastable
    user_agent: str,
    default_delay: float,
    mode: str = 'anyio',
    matcher: str = 'stdlib',
) -> DataFrame:
    """Returns (host, excluded, delay) for hosts not yet in the state table."""
    joined = new_host_first_urls.join(F.broadcast(robots_df), 'host', 'left').select(
        'host', 'decision_url', 'fetch_status', 'rules'
    )

    def eval_batches(batches):
        for pdf in batches:
            out = {'host': [], 'excluded': [], 'delay': []}
            for host, url, status, rules in zip(pdf['host'], pdf['decision_url'], pdf['fetch_status'], pdf['rules']):
                status = None if pd.isna(status) else int(status)
                excluded, delay = _evaluate_host(status, rules, url, user_agent, default_delay, mode, matcher)
                out['host'].append(host)
                out['excluded'].append(excluded)
                out['delay'].append(delay)
            yield pd.DataFrame(out)

    return joined.mapInPandas(eval_batches, HOST_STATE_SCHEMA)
