"""Engine configuration — the reference's ``Configuration``
(``core/config.py:168-259``) re-expressed for the wave engine, plus the
Spark-scale knobs (bloom sizing, salting, politeness budget).

Loadable from YAML / TOML / environment with the reference's namespacing:
``scalpel`` section in YAML/TOML, ``SCALPEL_`` prefix in env
(``core/config.py:349-435``).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field, fields
from typing import Callable, Optional

# fake-useragent fallback string — core/config.py:261-276
DEFAULT_USER_AGENT = 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/44.0.2403.157 Safari/537.36'


@dataclass(frozen=True)
class CrawlConfig:
    # reference-parity knobs (core/config.py:228-259)
    min_request_delay: int = 0
    max_request_delay: int = 0
    fetch_timeout: float = 5.0
    user_agent: str = DEFAULT_USER_AGENT
    follow_robots_txt: bool = False
    # which reference backend's politeness-delay semantics to reproduce
    # (SURVEY §3.2): 'anyio' (canonical) honors robots crawl-delay /
    # request-rate for allowed hosts (any_io/static_spider.py:171-175);
    # 'green' always paces with the config request_delay — robots delay is
    # NOT honored (explicit TODO, green/static_spider.py:192-199).
    # Robots allow/deny exclusion (incl. the -1 sentinel) is identical in
    # both modes; only the recorded per-host delay differs.
    politeness_mode: str = 'anyio'
    # robots rule matcher: 'stdlib' (default — reference parity: the
    # stdlib RobotFileParser decides on the host's FIRST dispatched URL
    # and that verdict sticks for the whole host, the reference's
    # _delay_mapping quirk, any_io/robots.py:82-91); 'rfc9309'
    # (beyond-reference — RFC 9309 wildcard matching PER URL via
    # operators/robots9309: `*`/`$` patterns, longest-match-wins, allow
    # breaks ties; only the URLs a rule actually denies are excluded,
    # the rest of the host proceeds). Host-level state (delay precedence
    # and the fetch-status deny-all policy: timeout/401/403) is identical
    # in both modes — robots.txt and crawl-delay ARE host-scoped.
    robots_matcher: str = 'stdlib'
    # content-digest dedup (beyond reference — Heritrix's digest-based
    # duplicate reduction): when True, a document whose span-sequence
    # fingerprint (operators/spans.span_signature_col, the north-rule
    # invariant key) was already emitted — in a prior wave OR earlier in
    # this wave (lowest priority wins) — still counts reachable and still
    # lands in docs_delta (span parity is per fetch), but emits NO items:
    # mirror sites and URL aliases produce training data once. The
    # signature set persists as content_seen_delta; forget() drops a
    # signature only when no remaining document still holds it.
    content_dedup: bool = False
    # X-Robots-Tag / meta-robots page-level indexing control (beyond the
    # reference, which has no index): when True the corpus must carry a
    # robots_tag column; a noindex page is fetched and its links followed
    # but it emits NO items, a nofollow page keeps its items but its
    # outlinks never reach the frontier or the host-rank lineage
    # (operators/directives.py). Default off: reference parity unchanged.
    respect_meta_robots: bool = False
    # engine knobs
    link_rule: str = 'all'  # or 'second_contains_page' (reference integration parse)
    max_dispatch_per_host_per_wave: Optional[int] = None  # politeness budget; None = unbounded
    # global fetch-capacity cap (beyond reference — the reference's single
    # worker IS its global cap): at most this many dispatches per wave
    # ACROSS all hosts, FIFO by priority; overflow defers to the next
    # wave. Applied after the per-host budget, exact without a global
    # sort (histogram-threshold, see engine step 4b). None = unbounded.
    max_dispatch_per_wave: Optional[int] = None
    # wall-clock seconds one wave represents (SURVEY §2.9 T2): when set,
    # each host's per-wave dispatch budget is delay-derived —
    # max(1, floor(wave_duration / delay)) — from the host_state delay the
    # robots evaluation recorded (crawl-delay → request-rate → config
    # default precedence, any_io/robots.py:79-95), so a `Crawl-delay: 10`
    # host is paced 10x slower than a delay-1 host, exactly the
    # reference's sleep-between-dispatches pacing
    # (any_io/static_spider.py:180,187). delay <= 0 (or politeness_mode=
    # 'green' with request_delay 0, which records the config delay) means
    # unbounded-by-delay; combined with max_dispatch_per_host_per_wave the
    # smaller budget wins. None = budget is max_dispatch... alone.
    wave_duration: Optional[float] = None
    hot_host_threshold: Optional[int] = None  # rows per host that triggers salting
    num_salts: int = 8
    bloom_threshold: int = 4096  # seen rows below which the bloom prefilter is skipped
    # bloom shard count (None = auto: 1 shard until one bitmap would exceed
    # seen.MAX_SHARD_BYTES, then power-of-2 shards by hash range — the
    # 10^10-key layout where a single 15 GB bitmap could not broadcast)
    bloom_shards: Optional[int] = None
    # seen-set prefilter structure: 'bloom' (default — rebuilt per wave
    # from the seen table, no deletes) or 'cuckoo' (persistent sidecar,
    # updated incrementally per wave, delete-capable → enables forget()/
    # recrawl windows without rescanning seen; falls back to the exact
    # anti-join if it ever saturates, preserving exactness)
    seen_filter: str = 'bloom'
    cuckoo_buckets: int = 1 << 16  # × 4 slots ≈ 250k keys at ~95% load (TOTAL across shards)
    # cuckoo sidecar shard count: shard tables live as independent files
    # maintained by per-shard executor tasks (seen.ShardedCuckooStore) —
    # at 10^10 keys (~20 GB of tables) shards are what keeps each file /
    # broadcast segment bounded; 1 at sandbox scales
    cuckoo_shards: int = 1
    # host_state rows up to which the robots join gets a broadcast hint;
    # beyond it (10^7-10^8 hosts at web scale) the join is left to AQE,
    # which picks a shuffle join on `host` — a broadcast would not fit
    broadcast_host_limit: int = 1_000_000
    max_waves: int = 1000
    checkpoint_dir: Optional[str] = None  # SnapshotStore root; None → temp dir
    item_processors: tuple = ()  # Callable[[DataFrame], DataFrame] transforms, applied in order
    # fetch-stage decorators (core/config.py:248-250): each receives the
    # fetch function (DataFrame -> DataFrame) and returns a wrapped one;
    # applied in order, so the LAST registered runs outermost
    response_middlewares: tuple = ()
    # reference `ignore_errors` semantics at stage level
    # (tests/any_io/test_static_spider.py:194-220): False (default) — a
    # failing item-processor/middleware kills the wave, like the reference
    # parse-callback exception propagating; True — the failing stage's
    # input rows are quarantined to `items_quarantine_delta` (with the
    # error) and the crawl continues. At 10^10 rows quarantine-and-continue
    # is the only sane policy for data-dependent stage failures.
    ignore_errors: bool = False
    # frontier canonicalization (functions/urlkit.canonicalize_for_frontier:
    # fragment drop + tracking/session-param strip + stable param sort)
    # applied to every seed and discovered link BEFORE hashing/seen-keying,
    # so `?utm_source=` variants collapse into one frontier entry. OFF by
    # default for reference parity — the reference dedups the literal URL
    # string (any_io/response.py:22-24). With the flag on, the engine
    # fetches the canonical form (tracking params never change page
    # identity by definition), and forget() canonicalizes its inputs the
    # same way so recrawl targeting stays consistent.
    canonicalize_urls: bool = False
    # priority-queue frontier (beyond reference — the reference's queue is
    # strictly FIFO): a SQL expression over the frontier columns
    # (url, host, scheme, wave, priority) computing a dispatch score.
    # Within each host, higher scores win the politeness-budget slots
    # first; ties (and None, the default) fall back to FIFO discovery
    # order, so the default is bit-identical to reference dispatch.
    # Scoring only reorders dispatch WITHIN a wave's per-host window —
    # discovery priorities, dedup, and robots semantics are untouched, and
    # URLs that lose a slot defer to the next wave exactly as under FIFO.
    # Evaluated JVM-side (F.expr), e.g. "-length(url)" (shallow pages
    # first) or "CASE WHEN url LIKE '%/product/%' THEN 1 ELSE 0 END".
    frontier_priority: Optional[str] = None
    # starvation control for the priority frontier: when > 0 (and
    # frontier_priority is set), a URL's effective score grows by this
    # amount for every wave it has waited since enqueue (score +
    # aging * (current_wave - enqueue_wave)) — a low-scored URL deferred
    # behind a stream of high-scored arrivals eventually outbids them
    # instead of starving forever. 0 (default) = pure score order. The
    # wait is derived from the frontier row's own wave column, so it
    # survives resume() with no extra state.
    score_aging_per_wave: float = 0.0
    # URL quality rules (beyond reference — C4/RefinedWeb front-of-frontier
    # filtering, operators/urlfilter.py): when enabled, every wave's
    # candidates pass the rule set (blocklist/length/depth/params/spam)
    # BEFORE probing the seen set, so junk URLs cost zero requests AND
    # zero bloom probes. blocklist_hosts is a host tuple (broadcast-joined;
    # real deployments load 10^5-10^7 hosts — still broadcast-scale).
    url_rules: bool = False
    blocklist_hosts: tuple = ()
    # politeness grouping identity (beyond reference — the reference keys
    # everything by host because it crawls one site at a time,
    # any_io/robots.py:44-56): 'host' (default, reference parity) counts
    # the per-wave dispatch budget per exact host; 'domain' counts it per
    # REGISTERED domain (functions/urls.registered_domain_col — PSL-style
    # pay-level domain), so a site cannot absorb the whole wave through
    # thousands of subdomains (blogspot.com, *.github.io, link farms).
    # Robots evaluation and the recorded per-host delay stay host-keyed
    # in all scopes (robots.txt IS per host); only the slot-counting
    # window key widens. Each row's delay-derived budget still comes from
    # its own host's robots delay — the strictest host in a domain defers
    # first. 'ip' counts the budget per SERVER (Heritrix-style IP
    # politeness): hosts sharing a resolved address — vhosts, CDN pools,
    # wildcard-DNS link farms — share one window, so a thousand vhosts on
    # one box cannot multiply the load the crawl puts on it. Requires a
    # host→ip mapping table passed to CrawlEngine(host_ips=...); hosts
    # missing from the map fall back to their own host identity (DNS
    # unknown = host-scoped, never dropped).
    politeness_scope: str = 'host'
    # sitemap bootstrap (beyond reference — the reference's seed list is
    # hand-fed): when True, the SEED hosts' robots.txt ``Sitemap:``
    # directives are followed at run start — sitemap pages come from the
    # injectable CrawlEngine(sitemap_pages=(url, body)) table,
    # ``<sitemapindex>`` pages are resolved up to sitemap_index_hops
    # levels, and every document ``<loc>`` is appended to the wave-0
    # frontier AFTER the explicit seeds (dense priorities in
    # (sitemap_url, pos) appearance order — publication order is crawl
    # order). Discovered URLs flow through the normal seen-dedup /
    # robots / politeness pipeline; non-http(s) locs are dropped.
    follow_sitemaps: bool = False
    sitemap_index_hops: int = 2
    # feed bootstrap (beyond reference, sitemap's freshness counterpart):
    # when True, the injectable CrawlEngine(feed_pages=(url, body)) table
    # of fetched RSS/Atom pages is parsed at run start and every entry
    # link is appended to the wave-0 frontier after the explicit seeds
    # (and after sitemap locs when both bootstraps are on), with dense
    # priorities in (feed_url, pos) publication order — newest-first in
    # real feeds, so freshness leads. Discovered URLs flow through the
    # normal seen-dedup / robots / politeness pipeline; non-http(s)
    # links are dropped.
    follow_feeds: bool = False
    # fetch retries (beyond reference — the reference treats any non-OK
    # response as final and never re-enqueues, any_io/static_spider.py's
    # single attempt per dequeued URL): when > 0, a URL whose fetch came
    # back 'unreachable' is re-enqueued into the NEXT wave's frontier at
    # its ORIGINAL priority (FIFO position preserved) for up to
    # max_retries extra attempts; only the FINAL failure enters the seen
    # set as 'unreachable'. While retries remain the URL is deliberately
    # withheld from seen_delta, so the exact anti-join — the dedup source
    # of truth — re-admits it next wave; the bloom/cuckoo prefilters may
    # answer "maybe seen", which merely routes the row to the exact join
    # (prefilter false-positives are allowed by construction, so no
    # structure change is needed). Attempt counts persist per url_hash in
    # the retry_delta table — retries survive resume(), and forget()
    # clears them with the rest of the per-URL state. Wave granularity IS
    # the backoff: one wave represents wave_duration seconds of pacing.
    # 0 = reference parity (one attempt, failures are final).
    max_retries: int = 0
    # fetch-stage strategy (SURVEY §2.2 S2): 'corpus_join' (default) —
    # the wave's allowed frontier equi-joins the corpus table on url,
    # the at-rest layout of an already-fetched web (bucketed one-Exchange
    # join, sources/corpus.py); 'mapinpandas' — the LIVE-deployment path:
    # the frontier flows through sources/fetcher.fetch_frontier, an
    # Arrow-batched mapInPandas stage partitioned by host with
    # cross-batch per-host slot pacing, calling `fetch_fn` (an injected
    # batch HTTP client, the Spark twin of the reference's client at
    # any_io/static_spider.py:62-74). Content resolution (spans) still
    # comes from the corpus join afterward — in production that join IS
    # the parse stage over fetched bodies. Both modes produce identical
    # crawl results when fetch_fn reports the corpus statuses (the
    # default corpus-backed fake), proven by the golden-crawl oracle in
    # both modes.
    fetch_mode: str = 'corpus_join'
    # injected batch fetcher for fetch_mode='mapinpandas': pandas
    # DataFrame (url, host) -> pandas DataFrame (status, body, fetch_ms),
    # executed inside the mapInPandas task (e.g. an async client pool
    # reused across Arrow batches). None = a corpus-backed deterministic
    # fake the engine builds for parity testing (guarded to small
    # corpora — a deployment MUST inject its real client here; loadable
    # from YAML/TOML/env as a dotted path like item_processors).
    fetch_fn: Optional[Callable] = None
    # document rendering mode (SURVEY §2.1 S5 — the selenium spider,
    # any_io/selenium_spider.py / core/selenium.py:14-39): 'static'
    # (default, reference StaticSpider parity) emits the corpus `spans`;
    # 'dom' emits the browser-rendered variant — `coalesce(dom_spans,
    # spans)` when the corpus carries a dom_spans column (pages without a
    # JS-modified DOM render identically) — and, matching the reference,
    # treats file:// URLs as UNREACHABLE (SeleniumSpider._handle_url
    # hard-errors the file scheme, any_io/selenium_spider.py:70-73; the
    # static spider reads them, any_io/static_spider.py:116-127). The
    # frontier/dedup/robots/politeness discipline is IDENTICAL in both
    # modes — the selenium spider subclasses the whole static loop and
    # differs only in how the document was produced; links are extracted
    # from the rendered spans, so a JS-injected link span is followed in
    # dom mode only (SPA crawling).
    render_mode: str = 'static'
    seed: int = 42

    def __post_init__(self):
        if self.min_request_delay < 0 or self.max_request_delay < 0:
            raise ValueError('request delays must be >= 0')  # core/config.py:20-26
        if self.max_request_delay < self.min_request_delay:
            raise ValueError('max_request_delay must be >= min_request_delay')  # core/config.py:29-33
        if self.link_rule not in ('all', 'second_contains_page'):
            raise ValueError(f'unknown link_rule: {self.link_rule}')
        if self.politeness_mode not in ('anyio', 'green'):
            raise ValueError(f'unknown politeness_mode: {self.politeness_mode}')
        if self.wave_duration is not None and self.wave_duration <= 0:
            raise ValueError('wave_duration must be > 0 seconds')
        if self.seen_filter not in ('bloom', 'cuckoo'):
            raise ValueError(f'unknown seen_filter: {self.seen_filter}')
        if self.politeness_scope not in ('host', 'domain', 'ip'):
            raise ValueError(f'unknown politeness_scope: {self.politeness_scope}')
        if self.robots_matcher not in ('stdlib', 'rfc9309'):
            raise ValueError(f'unknown robots_matcher: {self.robots_matcher}')
        if self.max_dispatch_per_wave is not None and self.max_dispatch_per_wave < 1:
            raise ValueError('max_dispatch_per_wave must be >= 1')
        if self.max_retries < 0:
            raise ValueError('max_retries must be >= 0')
        if self.fetch_mode not in ('corpus_join', 'mapinpandas'):
            raise ValueError(f'unknown fetch_mode: {self.fetch_mode}')
        if self.render_mode not in ('static', 'dom'):
            raise ValueError(f'unknown render_mode: {self.render_mode}')
        if self.sitemap_index_hops < 0:
            raise ValueError('sitemap_index_hops must be >= 0')
        if self.score_aging_per_wave < 0:
            raise ValueError('score_aging_per_wave must be >= 0')

    @property
    def request_delay(self) -> float:
        """Reference draws randint(min, max) per call (core/config.py:300-312);
        tests pin min == max for determinism
        (tests/any_io/test_static_spider.py:278) — we draw once, seeded."""
        if self.min_request_delay == self.max_request_delay:
            return float(self.min_request_delay)
        return float(random.Random(self.seed).randint(self.min_request_delay, self.max_request_delay))


_BOOL_TRUE = {'1', 'true', 'yes', 'y', 'on'}
_INT_FIELDS = {'min_request_delay', 'max_request_delay', 'max_dispatch_per_host_per_wave',
               'max_dispatch_per_wave',
               'hot_host_threshold', 'num_salts', 'bloom_threshold', 'bloom_shards',
               'max_waves', 'seed', 'broadcast_host_limit', 'cuckoo_buckets',
               'cuckoo_shards', 'max_retries', 'sitemap_index_hops'}
_FLOAT_FIELDS = {'fetch_timeout', 'wave_duration', 'score_aging_per_wave'}
_BOOL_FIELDS = {'follow_robots_txt', 'ignore_errors', 'url_rules', 'follow_sitemaps',
                'follow_feeds', 'respect_meta_robots'}
_CALLABLE_SEQ_FIELDS = {'item_processors', 'response_middlewares'}
_CALLABLE_FIELDS = {'fetch_fn'}
_STR_SEQ_FIELDS = {'blocklist_hosts'}


def resolve_callable(path):
    """Dotted-path → callable converter, the reference's callable-loading
    semantics (``core/config.py:81-130``: processors/middlewares arrive
    from YAML/TOML/env as import strings). Accepts ``pkg.mod:attr`` or
    ``pkg.mod.attr``; already-callable values pass through."""
    if callable(path):
        return path
    if not isinstance(path, str):
        raise TypeError(f'expected dotted path or callable, got {type(path).__name__}')
    import importlib

    if ':' in path:
        mod_name, attr = path.split(':', 1)
    else:
        mod_name, _, attr = path.rpartition('.')
    if not mod_name or not attr:
        raise ValueError(f'not a dotted callable path: {path!r}')
    fn = getattr(importlib.import_module(mod_name), attr)
    if not callable(fn):
        raise TypeError(f'{path!r} resolved to a non-callable {type(fn).__name__}')
    return fn


def _coerce(name: str, value):
    if name in _CALLABLE_SEQ_FIELDS and value is not None:
        # YAML/TOML deliver a list; env delivers a comma-separated string
        if isinstance(value, str):
            value = [v.strip() for v in value.split(',') if v.strip()]
        return tuple(resolve_callable(v) for v in value)
    if name in _CALLABLE_FIELDS and value is not None:
        return resolve_callable(value)
    if name in _STR_SEQ_FIELDS and value is not None:
        if isinstance(value, str):
            value = [v.strip() for v in value.split(',') if v.strip()]
        return tuple(value)
    if value is None or not isinstance(value, str):
        return value
    if name in _BOOL_FIELDS:
        return value.strip().lower() in _BOOL_TRUE  # str→bool converter, core/config.py:81-95
    if name in _INT_FIELDS:
        return int(value)
    if name in _FLOAT_FIELDS:
        return float(value)
    return value


def _from_mapping(data: dict) -> CrawlConfig:
    known = {f.name for f in fields(CrawlConfig)}
    kwargs = {k: _coerce(k, v) for k, v in data.items() if k in known}
    return CrawlConfig(**kwargs)


def load_from_yaml(path: str) -> CrawlConfig:
    """YAML file with a ``scalpel`` top-level section (core/config.py:349-376)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _from_mapping(data.get('scalpel', {}))


def load_from_toml(path: str) -> CrawlConfig:
    """TOML file with a ``scalpel`` table (core/config.py:378-405)."""
    import tomllib

    with open(path, 'rb') as f:
        data = tomllib.load(f)
    return _from_mapping(data.get('scalpel', {}))


def load_from_env(environ: Optional[dict] = None) -> CrawlConfig:
    """SCALPEL_-prefixed environment variables (core/config.py:407-435)."""
    environ = environ if environ is not None else dict(os.environ)
    data = {k[len('SCALPEL_'):].lower(): v for k, v in environ.items() if k.startswith('SCALPEL_')}
    return _from_mapping(data)
