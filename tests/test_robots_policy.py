"""Table-driven robots policy tests (SURVEY.md §5.2.2) at the operator
level: fetch-status policy, rules evaluation against the canonical
reference fixture, delay precedence, and compute-once-per-host."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators.robots import _evaluate_host, evaluate_new_hosts
from scalpel_spark.sources.corpus import CANONICAL_ROBOTS

UA = 'Mozilla/5.0'


# (fetch_status, rules, url, expected_excluded, expected_delay) —
# policy table from any_io/robots.py:46-91 + core/robots.py:21-42
POLICY = [
    (None, '', 'http://h/x', True, -1.0),            # no robots server ≡ timeout → deny
    (-1, '', 'http://h/x', True, -1.0),              # connect timeout → deny
    (401, '', 'http://h/x', True, -1.0),             # unauthorized → deny
    (403, '', 'http://h/x', True, -1.0),             # forbidden → deny
    (404, '', 'http://h/x', False, 3.0),             # not found → allow, config delay
    (500, '', 'http://h/x', False, 3.0),             # server error → allow
    (200, 'User-agent: *\nDisallow: /\n', 'http://h/x', True, -1.0),       # Disallow: / → -1
    (200, 'User-agent: *\nCrawl-delay: 2\n', 'http://h/x', False, 2.0),    # crawl-delay wins
    (200, 'User-agent: *\nRequest-rate: 2/5\n', 'http://h/x', False, 2.5), # 2/5 → 2.5s
    (200, 'User-agent: *\nCrawl-delay: 7\nRequest-rate: 2/5\n', 'http://h/x', False, 7.0),  # precedence
    (200, 'User-agent: *\nDisallow:\n', 'http://h/x', False, 3.0),         # allow-all → config delay
]


@pytest.mark.parametrize('status,rules,url,exp_excluded,exp_delay', POLICY)
def test_policy_kernel(status, rules, url, exp_excluded, exp_delay):
    excluded, delay = _evaluate_host(status, rules, url, UA, 3.0)
    assert (excluded, delay) == (exp_excluded, exp_delay)


def test_canonical_fixture_rules():
    """Reference conftest fixture (tests/conftest.py:11-21): Googlebot
    denied /videos//photos/; * denied /admin/ except admin-ajax.php."""
    ex, _ = _evaluate_host(200, CANONICAL_ROBOTS, 'http://h/videos/x.mp4', 'Googlebot', 0.0)
    assert ex is True
    ex, _ = _evaluate_host(200, CANONICAL_ROBOTS, 'http://h/videos/x.mp4', UA, 0.0)
    assert ex is False  # only Googlebot is denied videos
    ex, _ = _evaluate_host(200, CANONICAL_ROBOTS, 'http://h/admin/panel', UA, 0.0)
    assert ex is True
    # stdlib RobotFileParser — the parser the reference itself uses
    # (any_io/robots.py:4) — applies FIRST match in file order, so the
    # later Allow line does NOT override the /admin/ Disallow for this
    # path. Pinning the reference's actual runtime behavior, not the
    # Google longest-match semantics the fixture's author may have meant.
    ex, _ = _evaluate_host(200, CANONICAL_ROBOTS, 'http://h/admin/admin-ajax.php', UA, 0.0)
    assert ex is True


def test_evaluate_new_hosts_operator(spark):
    hosts = spark.createDataFrame(
        [('a.com', 'http://a.com/x'), ('b.com', 'http://b.com/x'), ('c.com', 'http://c.com/x')],
        'host string, decision_url string',
    )
    robots = spark.createDataFrame(
        [('a.com', 200, 'User-agent: *\nCrawl-delay: 4\n'), ('b.com', 403, '')],
        'host string, fetch_status int, rules string',
    )  # c.com missing → deny
    out = {r['host']: (r['excluded'], r['delay'])
           for r in evaluate_new_hosts(hosts, robots, UA, 1.0).collect()}
    assert out == {'a.com': (False, 4.0), 'b.com': (True, -1.0), 'c.com': (True, -1.0)}
    # exactly one decision row per host — compute-once semantics
    assert len(out) == 3


def test_decision_is_first_url_of_host(spark):
    """The host's FIRST dispatched URL decides the whole host — matching
    the reference's delay-mapping cache (any_io/robots.py:79-95): if the
    first URL is disallowed, the host is -1 forever, even for URLs the
    rules would allow."""
    hosts = spark.createDataFrame(
        [('h.com', 'http://h.com/admin/panel')], 'host string, decision_url string'
    )
    robots = spark.createDataFrame(
        [('h.com', 200, CANONICAL_ROBOTS)], 'host string, fetch_status int, rules string'
    )
    out = evaluate_new_hosts(hosts, robots, UA, 1.0).collect()[0]
    assert out['excluded'] is True and out['delay'] == -1.0
