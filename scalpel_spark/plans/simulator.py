"""Pure-Python reference crawl simulator — the executable spec.

Implements the reference worker loop (``any_io/static_spider.py:177-203``)
in its deterministic sequential regime: a single FIFO worker that fully
handles each URL (fetch → parse → enqueue follows) before the next dispatch.
Under uniform politeness delay this is exactly the reference's
``queue.get()`` order (BFS by insertion order); SURVEY.md §3.4 adopts it as
the analytic definition of crawl-order parity.

Semantics reproduced, with citations:
* dispatch:       FIFO queue seeded in list order            any_io/queue.py:80-87
* robots check:   at dispatch time, delay == -1 → excluded   any_io/static_spider.py:181-184
* seen dedup:     reachable ∪ unreachable ∪ robots_excluded  any_io/static_spider.py:100-106
* file branch:    unreadable → unreachable                   any_io/static_spider.py:116-127
* http branch:    status >= 400 → unreachable, no parse      any_io/static_spider.py:130-134
* stats:          counter/reachable/fetch_time on success    any_io/static_spider.py:137-140
* follow dedup:   RAW link vs followed ∪ reachable, the      any_io/response.py:14-29
                  ABSOLUTIZED link is recorded+enqueued
* robots cache:   first URL of a host decides the host's     any_io/robots.py:79-95
                  delay (incl. -1 = never fetch) forever
* robots policy:  timeout/401/403 → deny; other 4xx/5xx →    any_io/robots.py:50-67
                  allow; 200 → RobotFileParser rules
* delay prec.:    crawl_delay('*') → request_rate s/r →      core/robots.py:21-42
                  config default

Deliberate divergence (documented): the reference shares ONE RobotFileParser
instance across hosts (``any_io/robots.py:22``), so a host whose robots.txt
returned 4xx/5xx can read a *stale previous host's* crawl-delay — an
artifact that is timing-dependent under the reference's own concurrency.
Both this simulator and the engine use hermetic per-host evaluation (fresh
parser per host), i.e. parity with the specified behavior, not the race.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from io import StringIO
from typing import Callable, Optional
from urllib.robotparser import RobotFileParser

from scalpel_spark.functions import urlkit

LinkSelector = Callable[[list[str]], list[str]]


def select_all_links(links: list[str]) -> list[str]:
    return list(links)


def select_second_page_link(links: list[str]) -> list[str]:
    """The reference integration parse: xpath ``//a[2][contains(@href, "page")]``
    (tests/any_io/test_static_spider.py:344-347) — the 2nd anchor, only if
    its href contains 'page'."""
    if len(links) >= 2 and 'page' in links[1]:
        return [links[1]]
    return []


LINK_SELECTORS: dict[str, LinkSelector] = {
    'all': select_all_links,
    'second_contains_page': select_second_page_link,
}


@dataclass
class SimResult:
    fetch_seq: list[str] = field(default_factory=list)  # crawl-order parity sequence
    dispatch_rows: list[dict] = field(default_factory=list)  # url, dispatch_seq, wave, status, followed
    reachable: set[str] = field(default_factory=set)
    unreachable: set[str] = field(default_factory=set)
    robots_excluded: set[str] = field(default_factory=set)
    followed: set[str] = field(default_factory=set)
    items: list[dict] = field(default_factory=list)  # doc_id, quote, author, item_seq
    emitted_docs: list[dict] = field(default_factory=list)  # doc_id, spans
    request_counter: int = 0
    total_fetch_time: float = 0.0

    @property
    def average_fetch_time(self) -> float:
        # 0.0 guard — core/spider.py:144
        return self.total_fetch_time / self.request_counter if self.request_counter else 0.0


def _parse_robots(rules: str) -> RobotFileParser:
    parser = RobotFileParser()
    parser.parse(StringIO(rules).read().splitlines())
    return parser


def _delay_from_rules(parser: RobotFileParser, default: float) -> float:
    """core/robots.py:21-42 precedence."""
    crawl_delay = parser.crawl_delay('*')
    if crawl_delay is not None:
        return float(crawl_delay)
    request_rate = parser.request_rate('*')
    if request_rate is not None:
        return request_rate.seconds / request_rate.requests
    return default


class CrawlSimulator:
    """corpus: doc_id → row dict (CORPUS_SCHEMA fields, spans as list of dicts)
    robots: host → row dict (host, fetch_status, rules)."""

    def __init__(
        self,
        corpus: dict[str, dict],
        robots: Optional[dict[str, dict]] = None,
        *,
        follow_robots_txt: bool = False,
        user_agent: str = 'Mozilla/5.0',
        request_delay: float = 0.0,
        link_selector: LinkSelector | str = 'all',
        politeness_mode: str = 'anyio',
    ):
        self.corpus = corpus
        self.robots = robots or {}
        self.follow_robots_txt = follow_robots_txt
        self.user_agent = user_agent
        self.request_delay = request_delay
        self.link_selector = LINK_SELECTORS[link_selector] if isinstance(link_selector, str) else link_selector
        # 'green' = gevent backend pacing: robots delay NOT honored for
        # allowed hosts, config delay always used (green/static_spider.py:192-199
        # TODO); allow/deny verdicts identical in both modes, but under a
        # dispatch budget a denied URL consumes a slot in green (the
        # worker sleeps after every dequeue) and is free in anyio — see
        # run_waves step 4
        self.politeness_mode = politeness_mode
        # host → (excluded, delay); first URL of the host decides (any_io/robots.py:79-95)
        self._host_state: dict[str, tuple[bool, float]] = {}

    def _robots_decision(self, url: str) -> tuple[bool, float]:
        host = urlkit.host_of(url)
        if host is None:  # file URLs have no host → config delay, never excluded
            return False, self.request_delay
        if host in self._host_state:
            return self._host_state[host]
        row = self.robots.get(host)
        if row is None or row['fetch_status'] == -1 or row['fetch_status'] in (401, 403):
            decision = (True, -1.0)  # deny-all → host excluded forever
        elif row['fetch_status'] >= 400:
            decision = (False, self.request_delay)  # allow-all, no rules parsed
        else:
            parser = _parse_robots(row['rules'])
            if not parser.can_fetch(self.user_agent, url):
                decision = (True, -1.0)  # first URL denied → whole host -1
            elif self.politeness_mode == 'green':
                decision = (False, self.request_delay)  # green/static_spider.py:192-199
            else:
                decision = (False, _delay_from_rules(parser, self.request_delay))
        self._host_state[host] = decision
        return decision

    def run_waves(
        self,
        seeds: list[str],
        *,
        max_dispatch_per_host_per_wave: Optional[int] = None,
        wave_duration: Optional[float] = None,
        max_waves: int = 1000,
        link_selector: Optional[LinkSelector] = None,
    ) -> SimResult:
        """Wave-mode twin of :meth:`run` — the executable spec of the
        engine's set-oriented loop (plans/engine.py ``_run_wave``),
        including the politeness budget:

        per wave, per host, budget = least(``max_dispatch_per_host_per_wave``,
        max(1, floor(``wave_duration`` / delay))) where delay is the
        host_state delay the robots evaluation recorded (crawl-delay →
        request-rate → config default precedence, any_io/robots.py:79-95;
        config default for hosts with no robots decision). This is the
        reference's sleep-between-dispatches pacing
        (any_io/static_spider.py:180,187) expressed per wave: a delay-d
        host fits at most wave_duration/d dispatches in one wave.
        Over-budget URLs defer to the next wave, keeping their priority.

        ``dispatch_rows`` entries carry (url, wave, status, priority) in
        (wave, priority) order — directly comparable to
        ``CrawlResult.dispatch_rows()``. Hot-host salting is an engine
        physical concern (it re-buckets WHICH urls defer); parity tests
        run unsalted.
        """
        for seed in seeds:
            err = urlkit.validate_url(seed)
            if err is not None:
                raise ValueError(err)
        select_links = link_selector or self.link_selector

        res = SimResult()
        seen: dict[str, tuple[str, int, int]] = {}  # url -> (status, wave, prio)
        frontier: list[tuple[str, int]] = [(u, i) for i, u in enumerate(seeds)]
        next_priority = len(seeds)
        wave = 0
        while frontier and wave < max_waves:
            # 1. within-wave dedup: first enqueue (min priority) wins
            byurl: dict[str, int] = {}
            for url, prio in frontier:
                if url not in byurl or prio < byurl[url]:
                    byurl[url] = prio
            # 2. seen anti-join
            new = sorted(((p, u) for u, p in byurl.items() if u not in seen))
            if not new:
                break
            # 3. robots: new hosts decided on their min-priority URL
            allowed: list[tuple[int, str]] = []
            excluded: list[tuple[int, str]] = []
            if self.follow_robots_txt:
                for prio, url in new:  # min-priority URL of each new host decides
                    host = urlkit.host_of(url)
                    if (host is not None and host not in self._host_state
                            and urlkit.scheme_of(url) in ('http', 'https')):
                        self._robots_decision(url)
                for prio, url in new:
                    host = urlkit.host_of(url)
                    file_bypass = (self.politeness_mode == 'green'
                                   and urlkit.scheme_of(url) == 'file')
                    if (host is not None and self._host_state.get(host, (False,))[0]
                            and not file_bypass):
                        excluded.append((prio, url))
                    else:
                        allowed.append((prio, url))
            else:
                allowed = list(new)
            budgeted = (max_dispatch_per_host_per_wave is not None
                        or wave_duration is not None)
            # gevent slot semantics (green/static_spider.py:189-199): the
            # green worker sleeps after EVERY dequeue, so a denied URL
            # consumes a dispatch slot — under a budget, denied rows
            # compete for slots in priority order and past-budget ones
            # defer like any other row. The anyio worker excludes at
            # schedule time without sleeping (free). Mirrors the engine's
            # `_rx` flag through the step-4 window.
            green_slot_rx = self.politeness_mode == 'green' and budgeted
            if not green_slot_rx:
                for prio, url in excluded:
                    seen[url] = ('robots_excluded', wave, prio)
                    res.robots_excluded.add(url)
                excluded = []

            # 4. politeness budget: per host, priority order
            deferred: list[tuple[str, int]] = []
            if budgeted:
                rx = {url for _, url in excluded}
                byhost: dict[Optional[str], list[tuple[int, str]]] = {}
                for prio, url in allowed + excluded:
                    byhost.setdefault(urlkit.host_of(url), []).append((prio, url))
                allowed = []
                for host, rows in byhost.items():
                    budget = float('inf')
                    if max_dispatch_per_host_per_wave is not None:
                        budget = float(max_dispatch_per_host_per_wave)
                    if wave_duration is not None:
                        delay = self._host_state.get(host, (False, None))[1]
                        if delay is None:
                            delay = self.request_delay
                        if delay > 0:
                            budget = min(budget, max(1.0, wave_duration // delay))
                    rows.sort()
                    b = len(rows) if budget == float('inf') else int(budget)
                    for prio, url in rows[:b]:
                        if url in rx:  # slot consumed, verdict recorded
                            seen[url] = ('robots_excluded', wave, prio)
                            res.robots_excluded.add(url)
                        else:
                            allowed.append((prio, url))
                    deferred.extend((url, prio) for prio, url in rows[b:])
                allowed.sort()

            # 5/6. fetch + stats, 7. follow (state snapshots from BEFORE
            # this wave, like the engine's seen_state/followed_state reads)
            reachable_before = set(res.reachable)
            followed_before = set(res.followed)
            fresh: list[tuple[int, int, str, str]] = []  # (parent_prio, pos, raw, parent)
            for prio, url in allowed:
                row = self.corpus.get(url)
                scheme = urlkit.scheme_of(url)
                ok = row is not None and (
                    (scheme == 'file' and row.get('readable', True))
                    or (scheme != 'file' and row['http_status'] < 400)
                )
                if not ok:
                    seen[url] = ('unreachable', wave, prio)
                    res.unreachable.add(url)
                    continue
                seen[url] = ('reachable', wave, prio)
                res.reachable.add(url)
                res.request_counter += 1
                res.total_fetch_time += row['fetch_ms']
                res.fetch_seq.append(url)
                spans = row['spans']
                res.emitted_docs.append({'doc_id': url, 'spans': spans})
                text_spans = [s['text'] for s in spans if s['kind'] == 'text']
                for k in range(len(text_spans) // 2):
                    res.items.append({'doc_id': url, 'quote': text_spans[2 * k],
                                      'author': text_spans[2 * k + 1], 'item_seq': k})
                links = [s['text'] for s in spans if s['kind'] == 'link']
                for pos, raw in enumerate(select_links(links)):
                    if raw in followed_before or raw in reachable_before:
                        continue
                    fresh.append((prio, pos, raw, url))
            # dense priorities in (parent_priority, pos) order — the
            # engine's dense_sequence_with_count total order
            fresh.sort()
            next_frontier: list[tuple[str, int]] = []
            for parent_prio, pos, raw, parent in fresh:
                absolute = urlkit.absolutize(parent, raw)
                res.followed.add(absolute)
                next_frontier.append((absolute, next_priority))
                next_priority += 1
            frontier = next_frontier + deferred
            wave += 1

        res.dispatch_rows = [
            {'url': u, 'wave': w, 'status': s, 'priority': p}
            for u, (s, w, p) in sorted(seen.items(), key=lambda kv: (kv[1][1], kv[1][2]))
        ]
        return res

    def run(self, seeds: list[str]) -> SimResult:
        for seed in seeds:
            err = urlkit.validate_url(seed)
            if err is not None:
                raise ValueError(err)

        res = SimResult()
        queue: deque[tuple[str, int]] = deque((u, 0) for u in seeds)  # (url, wave)
        dispatch_seq = 0

        while queue:
            url, wave = queue.popleft()

            scheme = urlkit.scheme_of(url)
            if self.follow_robots_txt and scheme in ('http', 'https'):
                excluded, _delay = self._robots_decision(url)
            elif (self.follow_robots_txt and self.politeness_mode == 'anyio'
                  and urlkit.host_of(url) is not None):
                # anyio worker consults the robots delay-mapping for EVERY
                # dequeued URL (any_io/static_spider.py:181-184), so a
                # file://host/path URL whose host was already denied is
                # excluded at schedule time; green's _handle_url reads file
                # URLs before its robots check (green/static_spider.py:
                # 126-140) — file bypass. A host never decided over http
                # stays undecided (robots.txt is an http fetch), matching
                # the engine's http-only host evaluation.
                excluded = self._host_state.get(urlkit.host_of(url), (False,))[0]
            else:
                excluded = False
            if self.follow_robots_txt:
                if excluded:
                    if url not in (res.reachable | res.unreachable | res.robots_excluded):
                        res.robots_excluded.add(url)
                        res.dispatch_rows.append(
                            {'url': url, 'dispatch_seq': dispatch_seq, 'wave': wave,
                             'status': 'robots_excluded', 'followed': url in res.followed}
                        )
                        dispatch_seq += 1
                    continue

            # seen dedup at handle time (any_io/static_spider.py:100-106)
            if url in res.reachable or url in res.unreachable or url in res.robots_excluded:
                continue

            row = self.corpus.get(url)
            scheme = urlkit.scheme_of(url)
            ok = row is not None and (
                (scheme == 'file' and row.get('readable', True))
                or (scheme != 'file' and row['http_status'] < 400)
            )
            if not ok:
                res.unreachable.add(url)
                res.dispatch_rows.append(
                    {'url': url, 'dispatch_seq': dispatch_seq, 'wave': wave,
                     'status': 'unreachable', 'followed': url in res.followed}
                )
                dispatch_seq += 1
                continue

            # success: stats (any_io/static_spider.py:137-140)
            res.request_counter += 1
            res.reachable.add(url)
            res.total_fetch_time += row['fetch_ms']
            res.fetch_seq.append(url)
            res.dispatch_rows.append(
                {'url': url, 'dispatch_seq': dispatch_seq, 'wave': wave,
                 'status': 'reachable', 'followed': url in res.followed}
            )
            dispatch_seq += 1

            spans = row['spans']
            res.emitted_docs.append({'doc_id': url, 'spans': spans})

            # items: consecutive (quote, author) pairs over kind='text' spans in array order
            text_spans = [s['text'] for s in spans if s['kind'] == 'text']
            for k in range(len(text_spans) // 2):
                res.items.append(
                    {'doc_id': url, 'quote': text_spans[2 * k], 'author': text_spans[2 * k + 1], 'item_seq': k}
                )

            # follow: RAW-link dedup then absolutize+record (any_io/response.py:14-29)
            links = [s['text'] for s in spans if s['kind'] == 'link']
            for raw in self.link_selector(links):
                if raw in res.followed or raw in res.reachable:
                    continue
                absolute = urlkit.absolutize(url, raw)
                res.followed.add(absolute)
                queue.append((absolute, wave + 1))

        return res
