"""CrawlEngine — the wave-based BFS crawl loop (SURVEY.md §3.4).

Replaces the reference's per-URL coroutine loop
(``any_io/static_spider.py:177-203``) with set-oriented waves:

  wave k:  dedup(anti-join seen, bloom-prefiltered)      [F1/J1]
           → robots broadcast-join + per-host eval        [F3/J2]
           → politeness slots (+ salted skew handling)    [W1/T2]
           → fetch = join corpus                          [S2/J3]
           → parse: explode spans → items + outlinks      [P1/F5/W2]
           → follow: raw-link anti-join, absolutize,      [F2/J4/P3]
             dense priorities → frontier wave k+1
           → atomic snapshot commit (resume point)        [T4]

Every state table is immutable per wave and committed atomically via
SnapshotStore; deltas (seen/followed/items/docs/metrics) accumulate
append-only, exactly the Iceberg pattern. All per-URL logic is JVM column
algebra or Arrow-vectorized pandas UDFs — no per-row Python.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass
from typing import Optional, Sequence


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scalpel_spark.config import CrawlConfig
from scalpel_spark.functions import urlkit
from scalpel_spark.functions.texthash import pround
from scalpel_spark.functions.urls import (absolutize_udf, canonical_frontier_udf, host_col,
                                          scheme_col, url_hash_col)
from scalpel_spark.operators.ordering import dense_sequence_with_count
from scalpel_spark.operators.parse import extract_items, extract_outlinks
from scalpel_spark.operators.robots import HOST_STATE_SCHEMA, evaluate_new_hosts
from scalpel_spark.operators.seen import (ShardedCuckooStore, anti_join_seen_cuckoo,
                                          bloom_prefiltered_anti_join, build_bloom)
from scalpel_spark.operators.skew import detect_hot_keys
from scalpel_spark.plans.storage import SnapshotStore

# corpus-row cap on the driver-collected corpus-backed fake fetcher
# (fetch_mode='mapinpandas' with no injected fetch_fn) — parity-test
# scale only; see CrawlEngine._fetch_fn
_FAKE_FETCH_LIMIT = 100_000

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField('url', T.StringType()),
        T.StructField('url_hash', T.LongType()),
        T.StructField('host', T.StringType()),
        T.StructField('scheme', T.StringType()),
        T.StructField('wave', T.IntegerType()),
        T.StructField('priority', T.LongType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField('url', T.StringType()),
        T.StructField('url_hash', T.LongType()),
        T.StructField('status', T.StringType()),
        T.StructField('wave', T.IntegerType()),
        T.StructField('priority', T.LongType()),
    ]
)

METRICS_SCHEMA = 'wave int, stage string, partition_id int, rows long, ms double'

# one row per retry ATTEMPT (url_hash, how-many-th failure, which wave) —
# the max(attempt) per url_hash is the URL's budget consumed so far
RETRY_SCHEMA = 'url_hash long, attempt int, wave int'


@dataclass
class CrawlStatistics:
    """Reference ``SpiderStatistics`` (core/spider.py:63-86)."""

    reachable_urls: set
    unreachable_urls: set
    robots_excluded_urls: set
    followed_urls: set
    request_counter: int
    average_fetch_time: float
    total_time: float


class CrawlResult:
    def __init__(self, spark: SparkSession, store: SnapshotStore, total_time: float):
        self.spark = spark
        self.store = store
        self.total_time = total_time

    def _delta(self, name: str) -> Optional[DataFrame]:
        paths = self.store.state_paths(name)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def as_of(self, snapshot_id: str, table: str = 'seen') -> Optional[DataFrame]:
        """Time-travel read: the accumulated state of ``table`` (seen,
        followed, items, docs, metrics) AS OF the named snapshot — the
        Iceberg ``VERSION AS OF`` surface over the manifest
        (SnapshotStore.state_paths_at). Snapshot ids come from
        ``self.store.snapshots()``; each wave commits one, so this answers
        "what had we crawled by wave k" without replaying the crawl."""
        paths = self.store.state_paths_at(f'{table}_delta', snapshot_id)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    @property
    def seen(self) -> DataFrame:
        return self._delta('seen_delta')

    @property
    def followed(self) -> DataFrame:
        return self._delta('followed_delta')

    @property
    def items(self) -> DataFrame:
        return self._delta('items_delta')

    @property
    def items_quarantine(self) -> Optional[DataFrame]:
        """Raw items of waves whose processor chain failed under
        ``ignore_errors=True`` (with the error string) — None if no wave
        quarantined."""
        return self._delta('items_quarantine_delta')

    @property
    def retries(self) -> Optional[DataFrame]:
        """Retry lineage under ``max_retries > 0``: one row per retry
        attempt (url_hash, attempt, wave). None when no fetch ever
        failed with attempts left (or max_retries=0)."""
        return self._delta('retry_delta')

    @property
    def docs(self) -> DataFrame:
        return self._delta('docs_delta')

    @property
    def links(self) -> Optional[DataFrame]:
        """Host-level link lineage: (src_host, dst_host, n_links, wave) —
        one aggregated row per citing/cited host pair per wave. None for
        stores written before the table existed (or crawls with no
        follows)."""
        return self._delta('links_delta')

    def host_ranks(self, iters: int = 3, damping_pct: int = 85) -> Optional[DataFrame]:
        """Integer PageRank (host, rank_ppb) over the crawl's observed
        host graph — the authority signal the priority frontier
        (``frontier_policy='priority'``) consumes on the next crawl.
        n_links multiplicity is honored exactly (a host citing another
        10× sends 10 shares), but SELF-citations are excluded before
        ranking — nav/pagination blocks to a host's own pages would
        otherwise let it inflate its own authority (the lineage table
        keeps self-edges; only the rank computation drops them). None
        when no link lineage exists."""
        from scalpel_spark.operators.graphrank import host_rank

        links = self.links
        if links is None:
            return None
        edges = (
            links.filter(F.col('src_host') != F.col('dst_host'))
            .groupBy(F.col('src_host').alias('src'),
                     F.col('dst_host').alias('dst'))
            .agg(F.sum('n_links').alias('n_links'))
        )
        return host_rank(edges, iters=iters, damping_pct=damping_pct,
                         weight='n_links')

    @property
    def metrics(self) -> DataFrame:
        return self._delta('metrics_delta')

    def fetch_sequence(self) -> list[str]:
        """Crawl-order parity sequence: reachable URLs in dispatch order
        (wave, priority) — the analytic equivalent of the reference's
        queue.get() order (SURVEY.md §3.4)."""
        rows = (
            self.seen.filter(F.col('status') == 'reachable')
            .orderBy('wave', 'priority')
            .select('url')
            .collect()
        )
        return [r['url'] for r in rows]

    def dispatch_rows(self) -> list[dict]:
        rows = self.seen.orderBy('wave', 'priority').collect()
        return [
            {'url': r['url'], 'wave': r['wave'], 'status': r['status'],
             'priority': r['priority']}
            for r in rows
        ]

    def statistics_agg(self) -> DataFrame:
        """Production statistics: pure aggregates, no driver-side URL sets.

        One row per seen status: (status, n_urls, total_fetch_ms,
        avg_fetch_ms) — fetch columns are non-null only for 'reachable'
        (the reference only times successful fetches,
        core/spider.py:137-144). This is the path real runs use
        (tools/submit_crawl.py); the set-returning :meth:`statistics`
        below is the reference-API parity surface and collects every URL
        to the driver — test-scale only.
        """
        counts = self.seen.groupBy('status').agg(F.count('*').alias('n_urls'))
        docs = self.docs
        if docs is None:
            fetch = self.spark.createDataFrame(
                [], 'status string, total_fetch_ms double, avg_fetch_ms double')
        else:
            fetch = docs.agg(
                F.lit('reachable').alias('status'),
                F.sum('fetch_ms').cast('double').alias('total_fetch_ms'),
                pround(F.avg('fetch_ms'), 4).alias('avg_fetch_ms'),
            )
        return counts.join(fetch, 'status', 'left').select(
            'status', 'n_urls', 'total_fetch_ms', 'avg_fetch_ms')

    def statistics(self) -> CrawlStatistics:
        by_status: dict[str, set] = {'reachable': set(), 'unreachable': set(), 'robots_excluded': set()}
        for r in self.seen.select('url', 'status').collect():
            by_status[r['status']].add(r['url'])
        followed = {r['url'] for r in self.followed.select('url').collect()} if self.followed is not None else set()
        docs = self.docs
        agg = docs.agg(F.sum('fetch_ms').alias('t'), F.count('*').alias('n')).collect()[0] if docs is not None else None
        counter = len(by_status['reachable'])
        total_fetch = float(agg['t'] or 0.0) if agg else 0.0
        return CrawlStatistics(
            reachable_urls=by_status['reachable'],
            unreachable_urls=by_status['unreachable'],
            robots_excluded_urls=by_status['robots_excluded'],
            followed_urls=followed,
            request_counter=counter,
            average_fetch_time=total_fetch / counter if counter else 0.0,  # core/spider.py:144
            total_time=self.total_time,
        )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        robots: Optional[DataFrame] = None,
        config: Optional[CrawlConfig] = None,
        store: Optional[SnapshotStore] = None,
        host_ips: Optional[DataFrame] = None,
        host_budgets: Optional[DataFrame] = None,
        sitemap_pages: Optional[DataFrame] = None,
        feed_pages: Optional[DataFrame] = None,
        dust_rules: Optional[DataFrame] = None,
        canonical_map: Optional[DataFrame] = None,
        plan_capture: bool = False,
    ):
        self.spark = spark
        # executed-plan capture for the wave-loop physical audit (VERDICT
        # r4 Missing #3): when on, each wave records (wave, stage,
        # executedPlan string) for its two load-bearing frames — the
        # schedule+dedup probe and the fetch working set — right after
        # the stage's action, so tests can pin the AQE-final physical
        # shape (LeftAnti seen probe, broadcast host_state, no Python
        # nodes outside the sanctioned stages). Opt-in debug facility:
        # off (default) adds zero actions and zero state.
        self.plan_capture = plan_capture
        self.captured_plans: list[tuple[int, str, str]] = []
        self.config = config or CrawlConfig()
        self.corpus = corpus
        self.robots = robots
        # politeness_scope='ip' (Heritrix-style server politeness): an
        # injectable (host, ip) resolution table — a production deployment
        # materializes it from its DNS cache; hosts missing from it fall
        # back to host-scoped budgets. Counted once per run for the
        # broadcast-hint decision (same policy as host_state).
        self.host_ips = host_ips
        self._host_ips_count = None
        # injectable per-host budget table (host, budget) — the consumer
        # side of scheduling.plan_host_budgets / adaptive_backoff: the
        # effective per-wave budget becomes least(uniform knob,
        # delay-derived, table). Unmapped hosts are unbounded-by-table.
        self.host_budgets = host_budgets
        self._host_budgets_count = None
        # host_rank for frontier_priority expressions: computed once per
        # run from the persisted link lineage (see _frontier_ranks)
        self._rank_df = None
        self._rank_count = 0
        self._rank_ready = False
        if self.config.politeness_scope == 'ip' and host_ips is None:
            raise ValueError("politeness_scope='ip' requires a host_ips "
                             "DataFrame (host string, ip string)")
        # sitemap bootstrap source: fetched sitemap XML pages (url, body).
        # Sitemaps are raw XML, not span documents, so they live beside
        # the corpus rather than in it.
        self.sitemap_pages = sitemap_pages
        if self.config.follow_sitemaps:
            if sitemap_pages is None:
                raise ValueError('follow_sitemaps requires a sitemap_pages '
                                 'DataFrame (url string, body string)')
            if self.robots is None:
                raise ValueError('follow_sitemaps requires a robots table '
                                 '(Sitemap: directives live in robots.txt)')
        # feed bootstrap source: fetched RSS/Atom pages (url, body) — the
        # poll list IS the injected table (feeds have no robots directive)
        self.feed_pages = feed_pages
        if self.config.follow_feeds and feed_pages is None:
            raise ValueError('follow_feeds requires a feed_pages '
                             'DataFrame (url string, body string)')
        if self.config.respect_meta_robots and 'robots_tag' not in corpus.columns:
            raise ValueError('respect_meta_robots requires a robots_tag '
                             'column on the corpus (X-Robots-Tag header / '
                             'meta robots content, NULL when absent)')
        # mined DUST rules (operators/dust.mine_param_rules output:
        # host, param[, support]) — when injected, every URL entering the
        # frontier (seeds, links, sitemap/feed locs) first drops its
        # host's proven-ignorable params, so alias URLs collapse BEFORE
        # seen-keying and fetch. Orthogonal to canonicalize_urls (which
        # strips the global tracking-param list): DUST is host-specific
        # evidence, and it applies first so the generic canonical form
        # stays the last word on URL identity.
        self.dust_rules = dust_rules
        # resolved rel=canonical folds (operators/canonicals.fold_canonicals
        # output restricted to folded rows: src → canonical_url) — when
        # injected, a frontier URL that some already-fetched page declared
        # an alias of is rewritten to its stable canonical target BEFORE
        # DUST/seen-keying. Exact-URL rewrites beat inferred rules, so the
        # map applies first; the join side is host-bounded in practice and
        # left to AQE (broadcast when small, shuffle join beyond).
        # src must be unique or the left join in _canonicalized would fan
        # each matching frontier row out N ways (duplicate fetches
        # downstream) — fold_canonicals emits unique srcs, but nothing
        # enforces that on an injected map, so dedupe defensively here
        # (one shuffle at injection, not per call: _canonicalized reuses
        # the deduped frame every wave).
        self.canonical_map = (canonical_map.dropDuplicates(['src'])
                              if canonical_map is not None else None)
        if self.config.follow_robots_txt and robots is None:
            # no robots table ≡ every robots.txt fetch times out → deny-all
            self.robots = spark.createDataFrame([], 'host string, fetch_status int, rules string')
        # explicit store > config.checkpoint_dir > throwaway temp dir
        if store is None:
            root = self.config.checkpoint_dir or tempfile.mkdtemp(prefix='scalpel-spark-')
            store = SnapshotStore(root)
        self.store = store
        self._cuckoo = None
        self._cuckoo_saturated = False
        # in-run incremental bloom (rebuilt lazily per run/resume — the
        # "rebuild-at-resume-time accelerator" of DESIGN.md)
        self._bloom = None
        self._bloom_capacity = 0
        self._fetch_fn_cache = None
        if self.config.seen_filter == 'cuckoo':
            self._cuckoo = self._load_cuckoo()

    # -- state helpers ------------------------------------------------------

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _state(self, name: str, schema) -> DataFrame:
        paths = self.store.state_paths(name)
        if not paths:
            return self._empty(schema)
        return self.spark.read.parquet(*paths)

    def _canonicalized(self, df: DataFrame, col: str = 'url') -> DataFrame:
        """Under ``config.canonicalize_urls``, rewrite ``col`` to its
        frontier-canonical form (tracking-param strip + param sort +
        fragment drop, vectorized ``canonical_frontier_udf``) BEFORE any
        hashing/seen-keying — one URL identity per page. Identity
        passthrough when the flag is off (reference parity: dedup on the
        literal URL string). Injected rewrites share this single
        integration point, most-specific first: the exact-URL
        rel=canonical map, then host-specific DUST rules, then the
        generic canonical form as the last word on URL identity."""
        if self.canonical_map is not None:
            cm = self.canonical_map.select(
                F.col('src').alias('_cm_src'), F.col('dst').alias('_cm_dst'))
            df = (df.join(cm, F.col(col) == F.col('_cm_src'), 'left')
                  .withColumn(col, F.coalesce('_cm_dst', F.col(col)))
                  .drop('_cm_src', '_cm_dst'))
        if self.dust_rules is not None:
            from scalpel_spark.operators.dust import strip_params

            df = strip_params(df, self.dust_rules, url_col=col)
        if not self.config.canonicalize_urls:
            return df
        return df.withColumn(col, canonical_frontier_udf(F.col(col)))

    def _fetch_fn(self):
        """Resolve the ``fetch_mode='mapinpandas'`` batch fetcher: the
        injected ``CrawlConfig.fetch_fn``, else a corpus-backed
        deterministic fake — status/latency copied from the corpus row
        (missing URL → 404), body = the url — so both fetch modes produce
        identical crawl results and share one golden oracle. The fake
        collects ``(doc_id, http_status, fetch_ms)`` into a driver dict
        captured by the task closure, which is PARITY-TEST SCALE ONLY
        and guarded: a deployment injects its real batch HTTP client
        (the reference's pool, any_io/static_spider.py:62-74)."""
        if self.config.fetch_fn is not None:
            return self.config.fetch_fn
        if self._fetch_fn_cache is None:
            rows = (self.corpus
                    .select('doc_id', 'http_status', 'fetch_ms')
                    .limit(_FAKE_FETCH_LIMIT + 1).collect())
            if len(rows) > _FAKE_FETCH_LIMIT:
                raise ValueError(
                    "fetch_mode='mapinpandas' without fetch_fn builds a "
                    f'corpus-backed fake capped at {_FAKE_FETCH_LIMIT} '
                    'corpus rows — inject CrawlConfig.fetch_fn (your '
                    'batch HTTP client) for real deployments')
            table = {
                r['doc_id']: (
                    int(r['http_status']) if r['http_status'] is not None else 0,
                    float(r['fetch_ms']) if r['fetch_ms'] is not None else 0.0)
                for r in rows
            }

            def corpus_fake(batch):
                import pandas as pd

                looked = [table.get(u) for u in batch['url']]
                return pd.DataFrame({
                    'status': [v[0] if v is not None else 404 for v in looked],
                    'body': [u if v is not None else ''
                             for u, v in zip(batch['url'], looked)],
                    'fetch_ms': [v[1] if v is not None else 0.0 for v in looked],
                })

            self._fetch_fn_cache = corpus_fake
        return self._fetch_fn_cache

    # -- cuckoo sidecar (seen_filter='cuckoo') -------------------------------

    def _load_cuckoo(self) -> 'ShardedCuckooStore':
        """Open the persistent sharded seen-prefilter sidecar; when absent
        but seen state exists (e.g. a store written under
        seen_filter='bloom'), rebuild it from the seen hashes ONCE — as an
        executor-side bulk insert job (ShardedCuckooStore.insert_df), never
        a driver-side hash collect."""
        sidecar = ShardedCuckooStore(os.path.join(self.store.root, 'cuckoo_shards'),
                                     self.config.cuckoo_buckets, self.config.cuckoo_shards)
        if sidecar.exists():
            self._cuckoo_saturated = sidecar.any_saturated()
            return sidecar
        self._cuckoo_saturated = False
        seen = self._state('seen_delta', SEEN_SCHEMA)
        if self.store.state_paths('seen_delta'):
            if sidecar.insert_df(seen.select('url_hash')):
                self._cuckoo_saturated = True
        return sidecar

    def _frontier_ranks(self) -> Optional[DataFrame]:
        """(host, host_rank) for frontier_priority expressions that
        reference ``host_rank``: integer-ppb PageRank over the persisted
        link lineage (CrawlResult.host_ranks semantics — n_links
        multiplicity honored, self-citations excluded). Computed ONCE per
        run, at first use, from the lineage AS OF run start — within-run
        determinism; the natural consumer is a recrawl scoring hosts by
        the previous crawl's observed authority. None when no lineage
        exists yet (fresh store → every rank 0 → FIFO)."""
        if self._rank_ready:
            return self._rank_df
        self._rank_ready = True
        if self.store.state_paths('links_delta'):
            from scalpel_spark.operators.graphrank import host_rank

            links = self.spark.read.parquet(*self.store.state_paths('links_delta'))
            edges = (
                links.filter(F.col('src_host') != F.col('dst_host'))
                .groupBy(F.col('src_host').alias('src'),
                         F.col('dst_host').alias('dst'))
                .agg(F.sum('n_links').alias('n_links'))
            )
            # localCheckpoint, not persist: the per-wave
            # spark.catalog.clearCache() would unpersist a cached handle
            # and silently re-run the whole lineage scan + PageRank every
            # wave; a localCheckpoint survives the cache clear, so the
            # rank really is computed once per run
            ranks = host_rank(edges, weight='n_links').select(
                'host', F.col('rank_ppb').alias('host_rank')).localCheckpoint()
            self._rank_count = ranks.count()
            self._rank_df = ranks
        return self._rank_df

    def refresh_robots(self, hosts=None) -> None:
        """Expire cached robots decisions — the TTL hook (RFC 9309 §2.4
        allows caching robots.txt, but crawlers must refresh; the
        reference re-fetches robots per process start, so a long-lived
        wave store needs an explicit expiry). Commits a ``host_state``
        rewrite with the given hosts' rows REMOVED (``hosts=None`` drops
        every decision): the next wave that dispatches a URL on such a
        host re-evaluates it against the CURRENT robots table —
        allow/deny, fetch-status policy, and crawl-delay all refresh.
        Already-recorded seen/docs rows are untouched (use ``forget()``
        to make previously excluded URLs eligible again); the frontier is
        carried forward so ``resume()`` keeps working.

        ``hosts`` is an iterable of host strings or a one-column
        DataFrame."""
        current = self.store.load_current(self.spark, 'host_state')
        if current is None:
            return
        if hosts is None:
            kept = self._empty(HOST_STATE_SCHEMA)
        else:
            hdf = hosts if isinstance(hosts, DataFrame) else \
                self.spark.createDataFrame([(h,) for h in hosts], 'host string')
            kept = current.join(hdf.select('host'), 'host', 'left_anti')
        snap = self.store.current()
        wave, next_priority = -1, 0
        tables = {'host_state': kept}
        if snap is not None:
            wave = snap['wave']
            next_priority = snap['metadata'].get('next_priority', 0)
            if 'frontier' in snap['tables']:
                tables['frontier'] = self.store.load(self.spark, snap, 'frontier')
        self.store.commit(tables, wave, metadata={'next_priority': next_priority,
                                                  'robots_refresh': True})

    def _sitemap_bootstrap(self, frontier: DataFrame, next_priority: int
                           ) -> tuple[DataFrame, int]:
        """Seed-expansion hop (CrawlConfig.follow_sitemaps): the SEED
        hosts' robots.txt ``Sitemap:`` directives → sitemap pages
        (injectable (url, body) table) → document ``<loc>`` entries, with
        ``<sitemapindex>`` pages resolved up to ``sitemap_index_hops``
        further levels. Discovered URLs join the wave-0 frontier AFTER
        the explicit seeds, densely prioritized in (sitemap_url, pos)
        appearance order — publication order is crawl order; duplicate
        locs keep their first appearance. Non-http(s) locs drop here;
        everything else flows through the normal seen-dedup / robots /
        politeness pipeline. All parsing is map-side JVM regexp
        (operators/sitemap); the only shuffles are the per-hop semi-join
        against the (tiny) directive set and the final dedup/ordering
        over the discovered locs."""
        from scalpel_spark.operators.sitemap import (robots_sitemap_urls,
                                                     sitemap_entries)

        hosts = frontier.select('host').distinct()
        directives = robots_sitemap_urls(self.robots.join(hosts, 'host', 'left_semi'))
        to_fetch = directives.select(F.col('sitemap_url').alias('url')).distinct()
        pages = self.sitemap_pages.select('url', 'body')
        doc_entries = None
        for _hop in range(self.config.sitemap_index_hops + 1):
            fetched = pages.join(to_fetch, 'url', 'left_semi')
            entries = sitemap_entries(fetched).persist()
            docs_e = entries.filter(~F.col('is_index')).select(
                'sitemap_url', 'pos', 'loc')
            doc_entries = docs_e if doc_entries is None else doc_entries.unionByName(docs_e)
            to_fetch = entries.filter(F.col('is_index')).select(
                F.col('loc').alias('url')).distinct()
            if to_fetch.isEmpty():
                break
        return self._bootstrap_union(frontier, doc_entries, 'loc',
                                     'sitemap_url', next_priority)

    def _feed_bootstrap(self, frontier: DataFrame, next_priority: int
                        ) -> tuple[DataFrame, int]:
        """Seed-expansion hop (CrawlConfig.follow_feeds): the injected
        RSS/Atom pages' entry links join the wave-0 frontier after the
        explicit seeds (and after sitemap locs when both bootstraps are
        on), densely prioritized in (feed_url, pos) publication order —
        real feeds publish newest-first, so freshness leads the wave.
        Duplicate links keep their first appearance; links take the same
        canonical identity as seeds (one URL identity per page under
        canonicalize_urls); non-http(s) links drop. Parsing is map-side
        JVM regexp (operators/feeds); the only shuffles are the
        first-appearance dedup and ordering over the (tiny) entry set."""
        from scalpel_spark.operators.feeds import feed_entries

        entries = feed_entries(self.feed_pages.select('url', 'body'))
        return self._bootstrap_union(frontier, entries, 'link',
                                     'feed_url', next_priority)

    def _bootstrap_union(self, frontier: DataFrame, entries: DataFrame,
                         url_col: str, source_col: str, next_priority: int
                         ) -> tuple[DataFrame, int]:
        """Shared tail of the sitemap/feed bootstraps: canonicalize the
        discovered URLs (same identity as seeds and followed links under
        canonicalize_urls, BEFORE dedup so tracking-param variants
        collapse), keep each URL's FIRST appearance (min (source, pos)),
        number densely in (source, pos) publication order, and union
        frontier-shaped rows — non-http(s) URLs drop."""
        entries = self._canonicalized(entries, url_col)
        first_seen = entries.groupBy(url_col).agg(
            F.min(F.struct(source_col, 'pos')).alias('_first'))
        ordered, n = dense_sequence_with_count(
            first_seen.select(
                url_col,
                F.col(f'_first.{source_col}').alias(source_col),
                F.col('_first.pos').alias('pos')),
            [source_col, 'pos'], 'priority', start=next_priority)
        u = F.col(url_col)
        new_rows = ordered.select(
            u.alias('url'),
            url_hash_col(u).alias('url_hash'),
            host_col(u).alias('host'),
            scheme_col(u).alias('scheme'),
            F.lit(0).alias('wave'),
            'priority',
        ).filter(F.col('scheme').isin('http', 'https'))
        return frontier.unionByName(new_rows), next_priority + n

    def forget(self, urls) -> None:
        """Recrawl window: remove URLs from the seen AND followed sets so a
        later run re-fetches them (the delete the north star's cuckoo
        fallback exists for — a bloom cannot forget). Commits a compaction
        snapshot: `seen_compacted` / `followed_compacted` REPLACE all prior
        history (Iceberg rewrite semantics, see SnapshotStore.state_paths),
        `forgotten_delta` records lineage, and the current frontier is
        carried forward so resume() still works. Under seen_filter='cuckoo'
        the hashes are also deleted from the sidecar, so the next run's
        prefilter treats them as new without rescanning the seen table.
        """
        if isinstance(urls, DataFrame):
            fdf = urls.select('url')
        else:
            fdf = self.spark.createDataFrame([(u,) for u in urls], 'url string')
        fdf = self._canonicalized(fdf)
        fdf = fdf.select('url', url_hash_col(F.col('url')).alias('url_hash'))
        # sidecar deletes are restricted to URLs actually present in the
        # PRE-compaction seen table: deleting a never-inserted hash whose
        # (bucket, fingerprint) collides with a seen URL would evict that
        # URL's entry — a false negative that bypasses the exact anti-join
        # ("definitely new") and re-crawls a seen URL. The semi-join keeps
        # the counting invariant exact. (Captured lazily here, evaluated
        # after the commit — the pre-compaction parquet files survive the
        # snapshot rewrite, Iceberg-style.)
        cuckoo_deletes = None
        if self._cuckoo is not None and self.store.state_paths('seen_delta'):
            pre_seen = self.spark.read.parquet(*self.store.state_paths('seen_delta'))
            cuckoo_deletes = fdf.join(pre_seen.select('url'), 'url', 'left_semi')
        tables = {'forgotten_delta': fdf}
        # every per-URL state table is compacted: a forgotten URL must also
        # drop its emitted document and items, or the recrawl would leave
        # stale duplicates behind (and overcount fetch statistics)
        for delta, key in (('seen_delta', 'url'), ('followed_delta', 'url'),
                           ('docs_delta', 'doc_id'), ('items_delta', 'doc_id')):
            if not self.store.state_paths(delta):
                continue
            state = self.spark.read.parquet(*self.store.state_paths(delta))
            compacted = state.join(fdf.select(F.col('url').alias(key)), key, 'left_anti')
            tables[delta.replace('_delta', '_compacted')] = compacted
        # retry budgets are per-URL state too (keyed by url_hash): a
        # forgotten URL's next crawl starts with a fresh attempt budget
        if self.store.state_paths('retry_delta'):
            state = self.spark.read.parquet(*self.store.state_paths('retry_delta'))
            tables['retry_compacted'] = state.join(
                fdf.select('url_hash'), 'url_hash', 'left_anti')
        # content_dedup interplay: a forgotten URL's span signature leaves
        # the content-seen set ONLY if no remaining document still holds
        # it — otherwise a recrawl would re-emit items another live URL
        # already emitted. (Signatures recomputed from the pre-compaction
        # docs_delta; one column crosses the shuffles.)
        if (self.store.state_paths('content_seen_delta')
                and self.store.state_paths('docs_delta')):
            from scalpel_spark.operators.spans import span_signature_col

            docs_state = self.spark.read.parquet(*self.store.state_paths('docs_delta'))
            sigged = docs_state.select(
                'doc_id', span_signature_col(F.col('spans')).alias('csig'))
            fkeys = fdf.select(F.col('url').alias('doc_id'))
            gone = sigged.join(fkeys, 'doc_id', 'left_semi').select('csig').distinct()
            kept = sigged.join(fkeys, 'doc_id', 'left_anti').select('csig').distinct()
            removable = gone.join(kept, 'csig', 'left_anti')
            content_state = self.spark.read.parquet(
                *self.store.state_paths('content_seen_delta'))
            tables['content_seen_compacted'] = content_state.join(
                removable, 'csig', 'left_anti')
        snap = self.store.current()
        wave, next_priority = -1, 0
        if snap is not None:
            wave = snap['wave']
            next_priority = snap['metadata'].get('next_priority', 0)
            if 'frontier' in snap['tables']:
                tables['frontier'] = self.store.load(self.spark, snap, 'frontier')
        self.store.commit(tables, wave, metadata={'next_priority': next_priority,
                                                  'compaction': True})
        if cuckoo_deletes is not None:
            self._cuckoo.delete_df(cuckoo_deletes.select('url_hash'))

    def expire_snapshots(self, retain_last: int = 1) -> list[str]:
        """Table maintenance for an always-on crawl: every wave commits a
        snapshot, so a 10^10-URL crawl's manifest and data directories grow
        without bound. Runs the Iceberg maintenance trio over the store —
        checkpoint-compact the accumulated state into one snapshot
        (``rewrite_data_files``), expire the fully superseded history
        prefix beyond ``retain_last`` (``expire_snapshots``), and delete
        orphan data dirs (``remove_orphan_files``). Current state is
        bit-identical before and after (tests/test_expire.py); expired
        snapshot ids are no longer time-travelable, exactly like Iceberg.
        Returns the expired ids."""
        self.store.checkpoint(self.spark)
        expired = self.store.expire_snapshots(retain_last)
        self.store.remove_orphan_files()
        return expired

    # -- public API ---------------------------------------------------------

    def run(self, seeds: Sequence[str]) -> CrawlResult:
        """Small driver-side seed list (the reference API shape,
        ``Spider.urls``). For frontier-scale seed sets use
        :meth:`run_frontier`."""
        started = time.time()
        for url in seeds:
            err = urlkit.validate_url(url)
            if err is not None:
                raise ValueError(err)  # fail-fast like core/spider.py:15-53

        seeds_df = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], 'url string, priority long'
        )
        seeds_df = self._canonicalized(seeds_df)
        frontier = seeds_df.select(
            'url',
            url_hash_col(F.col('url')).alias('url_hash'),
            host_col(F.col('url')).alias('host'),
            scheme_col(F.col('url')).alias('scheme'),
            F.lit(0).alias('wave'),
            'priority',
        )
        next_priority = len(seeds)
        if self.config.follow_sitemaps:
            frontier, next_priority = self._sitemap_bootstrap(frontier, next_priority)
        if self.config.follow_feeds:
            frontier, next_priority = self._feed_bootstrap(frontier, next_priority)
        return self._loop(frontier, wave=0, next_priority=next_priority, started=started)

    def run_frontier(self, seeds_df: DataFrame, on_invalid: str = 'error') -> CrawlResult:
        """Distributed seed ingestion for 10^10-URL frontiers: ``seeds_df``
        is ``(url STRING, priority LONG)`` (priority = seed order; any
        dense or sparse total order works). Validation runs in the
        vectorized ``validate_url_udf`` on executors — the driver never
        materializes the seed set.

        ``on_invalid``: ``'error'`` fail-fast with the reference's message
        (first invalid row by priority — matching ``core/spider.py:15-53``
        semantics without collecting the full set); ``'skip'`` quarantine
        invalid rows (the only sane policy when seeds arrive from a
        previous crawl's outlinks at scale).
        """
        from scalpel_spark.functions.urls import validate_url_udf

        if on_invalid not in ('error', 'skip'):
            raise ValueError(f'unknown on_invalid: {on_invalid}')
        started = time.time()
        checked = seeds_df.select('url', 'priority', validate_url_udf(F.col('url')).alias('_err'))
        if on_invalid == 'error':
            bad = checked.filter(F.col('_err').isNotNull()).orderBy('priority').limit(1).collect()
            if bad:
                raise ValueError(bad[0]['_err'])
            valid = checked.drop('_err')
        else:
            valid = checked.filter(F.col('_err').isNull()).drop('_err')
        valid = self._canonicalized(valid)
        frontier = valid.select(
            'url',
            url_hash_col(F.col('url')).alias('url_hash'),
            host_col(F.col('url')).alias('host'),
            scheme_col(F.col('url')).alias('scheme'),
            F.lit(0).alias('wave'),
            F.col('priority').cast('long').alias('priority'),
        )
        max_p = frontier.agg(F.max('priority')).collect()[0][0]
        next_priority = (max_p or 0) + 1
        if self.config.follow_sitemaps:
            frontier, next_priority = self._sitemap_bootstrap(frontier, next_priority)
        if self.config.follow_feeds:
            frontier, next_priority = self._feed_bootstrap(frontier, next_priority)
        return self._loop(frontier, wave=0, next_priority=next_priority, started=started)

    def resume(self) -> CrawlResult:
        """Deterministic resume from the latest committed snapshot (T4)."""
        snap = self.store.current()
        if snap is None:
            raise ValueError('nothing to resume: no committed snapshot')
        frontier = self.store.load(self.spark, snap, 'frontier')
        wave = snap['wave'] + 1
        next_priority = snap['metadata']['next_priority']
        return self._loop(frontier, wave=wave, next_priority=next_priority, started=time.time())

    # -- the wave loop ------------------------------------------------------

    def _loop(self, frontier: DataFrame, wave: int, next_priority: int, started: float) -> CrawlResult:
        cfg = self.config
        # counted ONCE per run (covers resume); thereafter maintained as a
        # running upper bound (+= newly scheduled per wave) — re-counting
        # the union of all seen deltas every wave would be O(waves^2) scan
        # work at scale, and the count only drives bloom sizing
        seen_count = self._state('seen_delta', SEEN_SCHEMA).count()
        while wave < cfg.max_waves:
            frontier = frontier.persist()
            n_frontier = frontier.count()
            if n_frontier == 0:
                frontier.unpersist()
                break
            frontier, next_priority, seen_count = self._run_wave(
                frontier, wave, next_priority, n_frontier, seen_count
            )
            wave += 1
        return CrawlResult(self.spark, self.store, total_time=time.time() - started)

    def _capture_plan(self, wave: int, stage: str, df: DataFrame) -> None:
        """Record the EXECUTED physical plan of a wave stage (AQE final
        plan — call only after the stage's action ran). Under Spark 4.1
        the static explain carries neither join-strategy finality nor
        codegen markers, so the executed plan is the only truthful
        physical evidence; see tools/plan_audit.py."""
        if self.plan_capture:
            self.captured_plans.append(
                (wave, stage,
                 df._jdf.queryExecution().executedPlan().toString()))

    def _run_wave(self, frontier: DataFrame, wave: int, next_priority: int, n_frontier: int,
                  seen_count: int):
        cfg = self.config
        metrics_rows: list[tuple] = []
        t_wave = time.time()

        seen_state = self._state('seen_delta', SEEN_SCHEMA)

        # 1. within-wave dedup: first enqueue wins (min priority) — FIFO parity.
        # _enq_wave preserves the row's ORIGINAL enqueue wave (deferred rows
        # keep theirs under score aging) — consumed only by the aging term
        # in step 4's scoring, dropped before fetch.
        cand = frontier.groupBy('url').agg(
            F.min('priority').alias('priority'),
            F.first('url_hash').alias('url_hash'),
            F.first('host').alias('host'),
            F.first('scheme').alias('scheme'),
            F.min('wave').alias('_enq_wave'),
        ).withColumn('wave', F.lit(wave))

        # 1b. opt-in URL quality rules (beyond reference, C4-style): junk
        # candidates vanish here — before any seen probe, robots lookup,
        # or dispatch slot. The blocklist is config-carried (tiny) and
        # broadcast inside filter_frontier.
        if cfg.url_rules:
            from scalpel_spark.operators.urlfilter import filter_frontier

            bl = None
            if cfg.blocklist_hosts:
                bl = self.spark.createDataFrame(
                    [(h,) for h in cfg.blocklist_hosts], 'host string')
            # host_col='host': block on the engine's normalized host
            # identity (lower(parse_url HOST)) — never a re-derived one
            # that could disagree on case/port/userinfo
            cand = filter_frontier(cand, bl, host_col='host')

        # 2. seen dedup (F1/J1): prefiltered exact anti-join. Cuckoo mode
        # probes the persistent sidecar (updated incrementally, never
        # rescanning seen — and delete-capable for forget()); a saturated
        # cuckoo could yield false NEGATIVES (dropped inserts), so it
        # falls back — exactness always wins. Bloom mode is also
        # incremental within a run: built ONCE with 4x headroom, then
        # OR-merged with a per-wave mini-bloom over just the wave's new
        # rows (executor-side per-shard OR-merge) — O(seen) scanned once per
        # run instead of O(waves × seen).
        t0 = time.time()
        if self._cuckoo is not None and not self._cuckoo_saturated:
            new = anti_join_seen_cuckoo(cand, seen_state, self._cuckoo)
        elif seen_count >= cfg.bloom_threshold:
            if self._bloom is None or seen_count > self._bloom_capacity:
                self._bloom_capacity = max(seen_count, cfg.bloom_threshold) * 4
                self._bloom = build_bloom(seen_state, 'url_hash', expected=self._bloom_capacity,
                                          n_shards=cfg.bloom_shards)
            new = bloom_prefiltered_anti_join(cand, seen_state, self._bloom)
        elif seen_count:
            # tiny seen side: Catalyst broadcasts the exact anti-join
            new = cand.join(seen_state.select('url_hash', 'url'), ['url_hash', 'url'], 'left_anti')
        else:
            new = cand
        new = new.persist()
        # ONE action yields both the scheduled-set size and the
        # per-partition lineage rows (metrics the north rule requires) —
        # no separate count() round-trip
        pid_frame = new.groupBy(F.spark_partition_id().alias('pid')).count()
        pid_counts = pid_frame.collect()
        self._capture_plan(wave, 'schedule_dedup', pid_frame)
        n_new = sum(int(r['count']) for r in pid_counts)
        metrics_rows.append((wave, 'schedule_dedup', -1, n_new, (time.time() - t0) * 1000))
        if n_new:
            if self._cuckoo is not None:
                # executor-side sharded bulk insert: the wave's hashes
                # shuffle to their owning shard's task; the driver sees
                # only per-shard summaries (ShardedCuckooStore.insert_df)
                if self._cuckoo.insert_df(new.select('url_hash')):
                    self._cuckoo_saturated = True
            if self._bloom is not None:
                # same-capacity mini-bloom over this wave's rows, built
                # executor-side, OR-merged — the bloom never rescans seen
                self._bloom.merge(
                    build_bloom(new, 'url_hash', expected=self._bloom_capacity,
                                n_shards=self._bloom.n_shards))
        if n_new == 0:
            frontier.unpersist()
            new.unpersist()
            self._commit_wave({'frontier': self._empty(FRONTIER_SCHEMA)}, wave, next_priority, metrics_rows)
            return self._empty(FRONTIER_SCHEMA), next_priority, seen_count

        # per-partition lineage for the scheduled set (same collect as above)
        for r in pid_counts:
            metrics_rows.append((wave, 'scheduled_rows', int(r['pid']), int(r['count']), 0.0))

        # 3. robots (F3/J2/T3): per-host decision on the host's first URL
        excluded = None
        allowed = new
        if cfg.follow_robots_txt:
            t0 = time.time()
            # host_state is a FULL table (unlike the *_delta tables): read
            # only the latest snapshot's copy, never the union across waves
            host_state = self.store.load_current(self.spark, 'host_state')
            if host_state is None:
                host_state = self._empty(HOST_STATE_SCHEMA)
            http_rows = new.filter(F.col('scheme').isin('http', 'https') & F.col('host').isNotNull())
            new_hosts = (
                http_rows.join(host_state.select('host'), 'host', 'left_anti')
                .groupBy('host')
                .agg(F.min_by('url', 'priority').alias('decision_url'))
            )
            # only this wave's NEW hosts are evaluated; the result stays
            # distributed end-to-end: parquet-backed prior state ∪ this
            # wave's persisted fresh rows. No driver materialization — at
            # web scale (10^7-10^8 hosts) a per-wave collect would be
            # O(waves × hosts) serial driver work and an OOM.
            fresh = evaluate_new_hosts(new_hosts, self.robots, cfg.user_agent,
                                       cfg.request_delay, cfg.politeness_mode,
                                       cfg.robots_matcher).persist()
            host_state = host_state.unionByName(fresh)
            n_hosts = host_state.count()
            self._host_state_snapshot = host_state
            # broadcast-hint only while the table is small; beyond the
            # limit let AQE pick the strategy (shuffle join on host)
            right = F.broadcast(host_state) if n_hosts <= cfg.broadcast_host_limit else host_state
            joined = new.join(right, 'host', 'left')
            is_excluded = F.coalesce(F.col('excluded'), F.lit(False))
            if cfg.politeness_mode == 'green':
                # gevent-backend fidelity (green/static_spider.py:126-140):
                # file URLs are read in _handle_url BEFORE the robots check
                # (which lives in the http else-branch only), so a denied
                # host's file:// URLs are still fetched. The anyio worker
                # instead consults the robots delay-mapping per dequeued
                # URL regardless of scheme (any_io/static_spider.py:181-184)
                # — host-keyed schedule-time exclusion, the default here.
                is_excluded = is_excluded & (F.col('scheme') != 'file')
            rep_cols = ()
            if cfg.robots_matcher == 'rfc9309':
                # per-URL wildcard matching (operators/robots9309): the
                # wave's hosts' robots.txt parse+compile ONCE per host
                # (rules_table, Arrow-batched), then every URL decides
                # map-side against the broadcast one-row-per-host rules
                # array — no extra shuffle on the URL axis. Host-level
                # exclusion above is now fetch-status-policy only
                # (timeout/401/403), so `is_excluded | rep_denied` is the
                # complete RFC 9309 verdict. A production deployment
                # would persist compiled rules in host_state instead of
                # re-deriving them per wave; re-deriving keeps the stored
                # schema reference-shaped and costs one tiny per-host job.
                from scalpel_spark.operators.robots9309 import (
                    match_urls, rules_table)

                wave_hosts = new.select('host').distinct()
                applicable = self.robots.join(wave_hosts, 'host', 'left_semi')
                rep_rules = rules_table(applicable, cfg.user_agent)
                # ONE implementation of the RFC 9309 precedence rule:
                # match_urls owns the broadcast join + longest-match /
                # allow-wins decision; the engine only scopes it to
                # http(s) schemes
                joined = match_urls(joined, rep_rules, out_col='rep_allowed')
                is_excluded = is_excluded | (
                    F.col('scheme').isin('http', 'https') & ~F.col('rep_allowed')
                )
                rep_cols = ('rep_allowed',)
            # keep the per-host `delay` when wave_duration derives the
            # budget from it (step 4); drop it otherwise
            drop_cols = ('excluded',) if cfg.wave_duration is not None else ('excluded', 'delay')
            drop_cols = drop_cols + rep_cols
            # gevent-backend slot semantics (green/static_spider.py:
            # 189-199 + 107-115): the green worker sleeps request_delay
            # after EVERY dequeue and only then _handle_url runs the
            # robots check — a denied URL therefore CONSUMES a dispatch
            # slot. The anyio worker checks at schedule time and
            # `continue`s without sleeping (any_io/static_spider.py:
            # 177-187) — a denied URL is free. Model: under 'green' with
            # any dispatch budget active, denied rows ride through the
            # politeness window flagged (`_rx`), occupy slots in FIFO
            # priority order (deferring past-budget rows to the next
            # wave like any other row), and only slot winners land in
            # seen as robots_excluded — the split happens after step 4b.
            # Without a budget the divergence is unobservable at wave
            # granularity, so the schedule-time path stays.
            green_slot_rx = cfg.politeness_mode == 'green' and (
                cfg.max_dispatch_per_host_per_wave is not None
                or cfg.wave_duration is not None
                or self.host_budgets is not None
                or cfg.max_dispatch_per_wave is not None)
            if green_slot_rx:
                excluded = None
                allowed = joined.withColumn('_rx', is_excluded).drop(*drop_cols)
            else:
                excluded = joined.filter(is_excluded).select(
                    'url', 'url_hash', F.lit('robots_excluded').alias('status'), F.col('wave'), 'priority'
                )
                allowed = joined.filter(~is_excluded).drop(*drop_cols)
            metrics_rows.append((wave, 'robots', -1, n_hosts, (time.time() - t0) * 1000))

        # 4. politeness budget (W1/T2) with hot-host salting (§4.2).
        # Budget per host = least(max_dispatch_per_host_per_wave,
        # max(1, floor(wave_duration / delay))) — the second term is the
        # reference's sleep-between-dispatches pacing
        # (any_io/static_spider.py:180,187 via any_io/robots.py:79-95)
        # expressed per wave: a host whose robots delay is d seconds fits
        # at most wave_duration/d dispatches in one wave (at least 1, so
        # slow hosts still progress). Hosts without a robots decision
        # (file scheme, no host, robots off) pace with the config
        # request_delay, like the reference's _get_request_delay default.
        deferred = self._empty(FRONTIER_SCHEMA)
        # priority scoring (beyond reference) — computed ONCE here, shared
        # by the per-host windows (step 4) and the score-aware global cap
        # (step 4b). The expression may reference `host_rank` (integer-ppb
        # PageRank over the PREVIOUS crawls' persisted link lineage,
        # frozen at run start so the score is deterministic within a run;
        # a fresh store has no lineage → rank 0 → FIFO): recrawls dispatch
        # high-authority hosts' URLs first — the OPIC/adaptive-crawl loop
        # closed with the engine's own lineage.
        gated = (cfg.max_dispatch_per_host_per_wave is not None
                 or cfg.wave_duration is not None
                 or self.host_budgets is not None)
        if cfg.frontier_priority is not None and (gated or cfg.max_dispatch_per_wave is not None):
            if 'host_rank' in cfg.frontier_priority:
                ranks = self._frontier_ranks()
                if ranks is not None:
                    right = (F.broadcast(ranks)
                             if self._rank_count <= cfg.broadcast_host_limit else ranks)
                    allowed = allowed.join(right, 'host', 'left')
                if 'host_rank' not in allowed.columns:
                    allowed = allowed.withColumn('host_rank', F.lit(0).cast('long'))
                allowed = allowed.withColumn(
                    'host_rank', F.coalesce(F.col('host_rank'), F.lit(0)).cast('long'))
            if 'opic' in cfg.frontier_priority:
                # OPIC importance (cash + history, integer ppb) from the
                # state the PREVIOUS wave committed — unlike host_rank
                # (frozen at run start from prior-run lineage), OPIC
                # accumulates within the run, one O(wave) update per
                # wave, so the frontier adapts mid-crawl. No state yet
                # (wave 0, or priority never referenced it) scores 0 →
                # FIFO, matching opic's fresh-crawl cold start.
                state = self.store.load_current(self.spark, 'opic_state')
                if state is not None:
                    imp = state.select('host', (
                        F.col('cash_ppb') + F.col('hist_ppb')).alias('opic'))
                    n_imp = imp.count()
                    right = (F.broadcast(imp)
                             if n_imp <= cfg.broadcast_host_limit else imp)
                    allowed = allowed.join(right, 'host', 'left')
                if 'opic' not in allowed.columns:
                    allowed = allowed.withColumn('opic', F.lit(0).cast('long'))
                allowed = allowed.withColumn(
                    'opic', F.coalesce(F.col('opic'), F.lit(0)).cast('long'))
            allowed = allowed.withColumn(
                '_score', F.expr(cfg.frontier_priority)).drop('host_rank', 'opic')
            if cfg.score_aging_per_wave:
                # starvation control: every wave a row has waited since
                # enqueue raises its effective score — _enq_wave (kept at
                # deferral, min-merged at dedup) is the enqueue wave, so
                # aging needs no extra state table and survives resume
                allowed = allowed.withColumn(
                    '_score',
                    F.col('_score')
                    + F.lit(cfg.score_aging_per_wave)
                    * (F.lit(wave) - F.col('_enq_wave')).cast('double'))
        if gated:
            # politeness_scope='domain' widens the slot-counting key from
            # the exact host to its registered domain (PLD) — one window
            # per site, not per subdomain. Map-side column; the window
            # shuffle key changes but its shape doesn't. 'host' (default)
            # is reference parity.
            pol_key = 'host'
            if cfg.politeness_scope == 'domain':
                from scalpel_spark.functions.urls import registered_domain_col

                allowed = allowed.withColumn(
                    '_pol_domain', registered_domain_col(F.col('host')))
                pol_key = '_pol_domain'
            elif cfg.politeness_scope == 'ip':
                # server politeness: vhosts resolving to one address share
                # the window. Broadcast-hint the mapping while small (same
                # policy as host_state); unmapped hosts coalesce to their
                # own host identity, so DNS gaps degrade to host scope.
                ips = self.host_ips.select('host', 'ip')
                if self._host_ips_count is None:
                    self._host_ips_count = ips.count()
                right = F.broadcast(ips) if self._host_ips_count <= cfg.broadcast_host_limit else ips
                allowed = allowed.join(right, 'host', 'left').withColumn(
                    '_pol_ip', F.coalesce(F.col('ip'), F.col('host')))
                pol_key = '_pol_ip'
            budget = None
            if cfg.max_dispatch_per_host_per_wave is not None:
                budget = F.lit(cfg.max_dispatch_per_host_per_wave).cast('long')
            if cfg.wave_duration is not None:
                delay = (F.coalesce(F.col('delay'), F.lit(float(cfg.request_delay)))
                         if 'delay' in allowed.columns else F.lit(float(cfg.request_delay)))
                # delay <= 0 → NULL = unbounded-by-delay (F.least skips nulls)
                delay_budget = F.when(
                    delay > 0,
                    F.greatest(F.lit(1).cast('long'),
                               F.floor(F.lit(float(cfg.wave_duration)) / delay).cast('long')),
                )
                budget = delay_budget if budget is None else F.least(budget, delay_budget)
            if self.host_budgets is not None:
                # injectable per-host budget table — the consumer side of
                # operators/scheduling.plan_host_budgets (authority-
                # weighted allocation) or any external capacity plan.
                # Budgets are per HOST (like the robots delay) even under
                # a wider politeness scope; unmapped hosts get NULL =
                # unbounded-by-table (F.least skips nulls). Broadcast-hint
                # policy follows host_state.
                hb = self.host_budgets.select(
                    'host', F.col('budget').cast('long').alias('_host_budget'))
                if self._host_budgets_count is None:
                    self._host_budgets_count = hb.count()
                right = (F.broadcast(hb)
                         if self._host_budgets_count <= cfg.broadcast_host_limit else hb)
                allowed = allowed.join(right, 'host', 'left')
                hb_col = F.col('_host_budget')
                budget = hb_col if budget is None else F.least(budget, hb_col)
            # priority-queue frontier (beyond reference): the optional
            # JVM-side score reorders dispatch within each host's window —
            # higher scores win slots first, ties fall back to FIFO, so
            # frontier_priority=None is bit-identical to reference order.
            # Map-side expression; the window shuffle is unchanged.
            if cfg.frontier_priority is not None:
                slot_order = [F.desc('_score'), F.asc('priority')]
            else:
                slot_order = [F.asc('priority')]
            if cfg.hot_host_threshold is not None:
                hot = detect_hot_keys(allowed, pol_key, cfg.hot_host_threshold)
                marked = allowed.join(F.broadcast(hot.withColumn('_hot', F.lit(True))), pol_key, 'left')
                salted = marked.withColumn(
                    'salt',
                    F.when(F.col('_hot'), F.pmod(F.col('url_hash'), F.lit(cfg.num_salts)).cast('int')).otherwise(
                        F.lit(0)
                    ),
                )
                w = Window.partitionBy(pol_key, 'salt').orderBy(*slot_order)
                slot = F.row_number().over(w) - 1
                # hot hosts: interleave salt buckets → dispatch slots stay unique per host
                salted = salted.withColumn(
                    '_slot',
                    F.when(F.col('_hot'), slot * cfg.num_salts + F.col('salt')).otherwise(slot),
                )
                allowed = salted.drop('_hot', 'salt')
            else:
                w = Window.partitionBy(pol_key).orderBy(*slot_order)
                allowed = allowed.withColumn('_slot', F.row_number().over(w) - 1)
            # NULL budget (both knobs unbounded for this host) → never over
            over = F.coalesce(F.col('_slot') >= budget, F.lit(False))
            # under score aging a deferred row keeps its ORIGINAL enqueue
            # wave so its wait keeps accruing; otherwise the re-eligibility
            # wave (reference-shaped frontier contents)
            defer_wave = (F.col('_enq_wave') if cfg.score_aging_per_wave
                          and cfg.frontier_priority is not None
                          else F.col('wave') + 1)
            deferred = (
                allowed.filter(over)
                .select('url', 'url_hash', 'host', 'scheme', defer_wave.alias('wave'), 'priority')
            )
            # _score survives into step 4b when the global cap will
            # consume it; everything else window-local is dropped here
            drop_cols_4 = ['_slot', '_pol_domain', '_pol_ip', 'ip', '_host_budget']
            if cfg.max_dispatch_per_wave is None:
                drop_cols_4.append('_score')
            allowed = allowed.filter(~over).drop(*drop_cols_4)

        # 4b. global fetch-capacity cap (max_dispatch_per_wave): keep the
        # K lowest-priority rows ACROSS hosts (global FIFO — the
        # reference's single worker is exactly this with K=1 per delay
        # tick), defer the rest. Exact WITHOUT a global sort or a
        # driver-side limit(): priorities are UNIQUE (dense sequence,
        # operators/ordering), so a 2^16-wide bucket histogram — tiny on
        # the driver even at 10^10 priorities (~150k buckets) — locates
        # the straddling bucket, and only THAT bucket's ≤65536 rows are
        # ranked (single bounded window partition). Everything below the
        # bucket keeps, everything above defers, no row outside the
        # straddle bucket ever sorts. With frontier_priority set the cap
        # becomes a true PRIORITY-QUEUE dequeue across hosts: top-K by
        # (_score DESC, priority ASC) via scheduling.topk_by_score —
        # range-repartition on the order key (scores are arbitrary user
        # expressions, so no dense-key histogram exists), per-partition
        # counts, and only the single straddling partition ranks.
        if cfg.max_dispatch_per_wave is not None and cfg.frontier_priority is not None:
            from scalpel_spark.operators.scheduling import topk_by_score

            allowed = allowed.persist()
            kept, overflow = topk_by_score(allowed, cfg.max_dispatch_per_wave)
            overflow_wave = (F.col('_enq_wave') if cfg.score_aging_per_wave
                             else F.col('wave') + 1)
            deferred = deferred.unionByName(overflow.select(
                'url', 'url_hash', 'host', 'scheme',
                overflow_wave.alias('wave'), 'priority'))
            allowed = kept.drop('_score')
        elif cfg.max_dispatch_per_wave is not None:
            cap = cfg.max_dispatch_per_wave
            allowed = allowed.persist()
            bucket = F.shiftright(F.col('priority'), 16)
            hist = sorted(
                (r['b'], r['c'])
                for r in allowed.groupBy(bucket.alias('b'))
                .agg(F.count('*').alias('c')).collect()
            )
            if sum(c for _, c in hist) > cap:
                run = 0
                sb = hist[-1][0]
                base = 0
                for b, c in hist:
                    if run + c > cap:
                        sb, base = b, run
                        break
                    run += c
                straddle = allowed.filter(bucket == sb).withColumn(
                    '_grank',
                    F.row_number().over(Window.partitionBy(F.lit(1)).orderBy('priority')),
                )
                kept = allowed.filter(bucket < sb).unionByName(
                    straddle.filter(F.col('_grank') <= cap - base).drop('_grank'))
                overflow = allowed.filter(bucket > sb).unionByName(
                    straddle.filter(F.col('_grank') > cap - base).drop('_grank'))
                deferred = deferred.unionByName(overflow.select(
                    'url', 'url_hash', 'host', 'scheme',
                    (F.col('wave') + 1).alias('wave'), 'priority'))
                allowed = kept
        # green handle-time exclusion: the denied rows that won dispatch
        # slots this wave are marked robots_excluded NOW (they consumed
        # their slot, like the gevent worker's post-dequeue sleep);
        # denied rows past the budget were deferred with everything else
        if '_rx' in allowed.columns:
            excluded = allowed.filter(F.col('_rx')).select(
                'url', 'url_hash', F.lit('robots_excluded').alias('status'),
                F.col('wave'), 'priority')
            allowed = allowed.filter(~F.col('_rx')).drop('_rx')

        # mapinpandas fetch paces dispatch from the recorded robots delay,
        # so that column rides into the fetch stage in that mode only
        # (falling back to the config delay when no robots step ran —
        # same precedence as the politeness budget at step 4)
        allowed = allowed.drop('_enq_wave')
        if cfg.fetch_mode != 'mapinpandas':
            allowed = allowed.drop('delay')
        elif 'delay' not in allowed.columns:
            allowed = allowed.withColumn('delay', F.lit(float(cfg.request_delay)))

        # 5. fetch = join corpus (S2/J3); status routing (F4). Response
        # middlewares wrap the fetch *stage* exactly like the reference's
        # decorator composition around the fetch callable
        # (any_io/static_spider.py:62-68): last registered runs outermost.
        # S5 selenium parity: a 'render' column ('static'|'dom') on the
        # corpus flows through fetch into the emitted docs — the rendering
        # mode changes nothing about frontier/dedup/robots semantics
        # (any_io/selenium_spider.py subclasses share the whole loop)
        render_cols = ['render'] if 'render' in self.corpus.columns else []
        # render_mode='dom' (S5, any_io/selenium_spider.py): the emitted
        # document is the browser-rendered span set — coalesce(dom_spans,
        # spans), pages without a JS-modified DOM render identically —
        # and file:// URLs are UNREACHABLE (SeleniumSpider._handle_url
        # hard-errors the file scheme, :70-73). Everything else —
        # frontier, dedup, robots, politeness, ordering — is the shared
        # static loop, so the plan is identical up to the span column.
        dom_mode = cfg.render_mode == 'dom'
        span_expr = (
            F.coalesce(F.col('dom_spans'), F.col('spans')).alias('spans')
            if dom_mode and 'dom_spans' in self.corpus.columns
            else F.col('spans')
        )
        # meta-robots tag rides the corpus row only when the knob consumes
        # it — plans stay byte-identical with the knob off
        tag_cols = ['robots_tag'] if cfg.respect_meta_robots else []

        def base_fetch(allowed_df: DataFrame) -> DataFrame:
            corpus = self.corpus.select('doc_id', span_expr, 'http_status', 'readable',
                                        'fetch_ms', *render_cols, *tag_cols)
            out = allowed_df.join(corpus, allowed_df['url'] == corpus['doc_id'], 'left')
            found = F.col('doc_id').isNotNull()
            file_ok = (F.lit(False) if dom_mode
                       else found & F.coalesce(F.col('readable'), F.lit(False)))
            ok = F.when(
                F.col('scheme') == 'file', file_ok
            ).otherwise(found & (F.col('http_status') < 400))
            return out.withColumn('status', F.when(ok, 'reachable').otherwise('unreachable'))

        def base_fetch_mapinpandas(allowed_df: DataFrame) -> DataFrame:
            # live-deployment fetch stage (S2 twin of the reference's
            # client pool, any_io/static_spider.py:62-74): http(s) rows
            # flow through sources/fetcher.fetch_frontier — an
            # Arrow-batched mapInPandas stage partitioned by host with
            # cross-batch per-host slot pacing from the recorded robots
            # delay, batch failures quarantined to transport status -1 —
            # then the corpus join resolves CONTENT (spans); in
            # production that join IS the parse stage over fetched
            # bodies. Transport status decides http reachability
            # (100..399 — exact parity with corpus_join's http_status
            # routing, and -1 lands unreachable); file:// rows never
            # touch the HTTP client (any_io/static_spider.py:116-127)
            # and keep the scheme/readable branch + corpus latency.
            from scalpel_spark.sources.fetcher import fetch_frontier

            transport = fetch_frontier(
                allowed_df.filter(F.col('scheme') != 'file'),
                fetch_fn=self._fetch_fn(),
                order_col='priority', delay_col='delay',
            ).select(F.col('url').alias('_t_url'),
                     F.col('status').alias('_t_status'),
                     F.col('fetch_ms').alias('_t_fetch_ms'),
                     'dispatch_ms')
            corpus = self.corpus.select(
                'doc_id', span_expr, 'readable',
                F.col('fetch_ms').alias('_c_fetch_ms'), *render_cols, *tag_cols)
            out = (allowed_df.drop('delay')
                   .join(transport, F.col('url') == F.col('_t_url'), 'left')
                   .join(corpus, F.col('url') == F.col('doc_id'), 'left'))
            found = F.col('doc_id').isNotNull()
            is_file = F.col('scheme') == 'file'
            file_ok = (F.lit(False) if dom_mode
                       else found & F.coalesce(F.col('readable'), F.lit(False)))
            ok = F.when(
                is_file, file_ok
            ).otherwise(found & (F.col('_t_status') >= 100) & (F.col('_t_status') < 400))
            return (out
                    .withColumn('status', F.when(ok, 'reachable').otherwise('unreachable'))
                    .withColumn('fetch_ms', F.when(is_file, F.col('_c_fetch_ms'))
                                .otherwise(F.col('_t_fetch_ms')))
                    .drop('_t_url', '_t_status', '_t_fetch_ms', '_c_fetch_ms'))

        base = base_fetch_mapinpandas if cfg.fetch_mode == 'mapinpandas' else base_fetch

        def compose_and_fetch() -> DataFrame:
            fn = base
            for middleware in cfg.response_middlewares:
                fn = middleware(fn)
            return fn(allowed)

        try:
            fetched = compose_and_fetch()
            if cfg.ignore_errors and cfg.response_middlewares:
                # surface data-dependent (evaluation-time) middleware
                # failures NOW, inside the guarded region — a middleware
                # whose returned plan raises per-row would otherwise kill
                # the wave at items.count()/commit even with ignore_errors
                fetched = fetched.persist()
                fetched.count()
        except Exception:
            if not cfg.ignore_errors:
                raise
            # ignore_errors quarantine semantics (T-level parity with
            # tests/any_io/test_static_spider.py:194-220): a failing
            # middleware chain is skipped, the bare fetch proceeds
            metrics_rows.append((wave, 'middleware_error', -1, 0, 0.0))
            fetched = base(allowed)
        # the wave's working set feeds four downstream tables (seen/docs/
        # items/outlinks) that are each materialized at commit — persist it
        # once so the fetch join is not recomputed per table write
        # (MEMORY_AND_DISK default: spills, never OOMs, at big waves)
        fetched = fetched.persist()
        if self.plan_capture:
            # audit-only extra action: materialize the (persisted) fetch
            # working set now so its executed plan — robots broadcast,
            # dispatch window, corpus join — is capturable
            fetched.count()
            self._capture_plan(wave, 'fetch', fetched)

        # 5b. fetch retries (opt-in, CrawlConfig.max_retries): an
        # unreachable fetch with attempts left re-enters the NEXT wave's
        # frontier at its original priority and is WITHHELD from
        # seen_delta — the exact anti-join (the dedup source of truth)
        # then re-admits it, no matter what the bloom/cuckoo prefilter
        # answers (a "maybe seen" only routes the row to the exact join).
        # Attempt counts live in retry_delta, aggregated per url_hash, so
        # the budget survives resume(). The final failure lands in seen as
        # 'unreachable' exactly like max_retries=0.
        retry_requeue, retry_delta = None, None
        seen_src = fetched
        if cfg.max_retries:
            prior = (self._state('retry_delta', RETRY_SCHEMA)
                     .groupBy('url_hash').agg(F.max('attempt').alias('_prev')))
            tried = fetched.join(prior, 'url_hash', 'left').withColumn(
                '_attempt', F.coalesce(F.col('_prev'), F.lit(0)) + 1)
            retrying = (F.col('status') == 'unreachable') & (F.col('_attempt') <= cfg.max_retries)
            retry_rows = tried.filter(retrying).persist()
            n_retry = retry_rows.count()
            if n_retry:
                retry_requeue = retry_rows.select(
                    'url', 'url_hash', 'host', 'scheme',
                    F.lit(wave + 1).alias('wave'), 'priority')
                retry_delta = retry_rows.select(
                    'url_hash', F.col('_attempt').alias('attempt'),
                    F.lit(wave).alias('wave'))
                metrics_rows.append((wave, 'retry_requeued', -1, n_retry, 0.0))
                seen_src = tried.filter(~retrying).drop('_prev', '_attempt')

        seen_delta = seen_src.select('url', 'url_hash', 'status', 'wave', 'priority')
        if excluded is not None:
            seen_delta = seen_delta.unionByName(excluded)

        docs = fetched.filter(F.col('status') == 'reachable').select(
            'url', 'priority', 'spans', 'fetch_ms', *render_cols, *tag_cols)

        # 5a'. meta-robots directives (opt-in, CrawlConfig.
        # respect_meta_robots; operators/directives.py): per-row flag
        # columns, no join — the tag already rides the fetched row.
        # noindex withholds a page's ITEMS (docs/seen stay complete: the
        # fetch happened, span parity is per fetch, and its links still
        # count); nofollow withholds a page's OUTLINKS from both the
        # frontier and the host-rank lineage (its endorsements are void)
        # while its items stay.
        indexable_docs = follow_docs = docs
        if cfg.respect_meta_robots:
            from scalpel_spark.operators.directives import (nofollow_col,
                                                            noindex_col)

            tag = F.col('robots_tag')
            indexable_docs = docs.filter(~noindex_col(tag))
            follow_docs = docs.filter(~nofollow_col(tag))

        # 5c. content-digest dedup (opt-in, CrawlConfig.content_dedup):
        # one items emission per unique span-sequence fingerprint. The
        # anti-join against the persisted signature set prunes cross-wave
        # duplicates; the per-signature row_number (orderBy priority —
        # first-discovered wins, matching FIFO semantics) prunes
        # within-wave ones. docs/seen are untouched: dedup is an ITEMS
        # policy, the fetch record stays complete.
        items_src = indexable_docs
        content_delta = None
        if cfg.content_dedup:
            from scalpel_spark.operators.spans import span_signature_col

            sigged = indexable_docs.withColumn('csig', span_signature_col(F.col('spans')))
            prior_sigs = self._state('content_seen_delta', 'csig long, wave int')
            fresh = sigged.join(prior_sigs.select('csig'), 'csig', 'left_anti')
            w_sig = Window.partitionBy('csig').orderBy('priority')
            winners = (fresh.withColumn('_rn', F.row_number().over(w_sig))
                       .filter(F.col('_rn') == 1).drop('_rn'))
            content_delta = winners.select('csig').withColumn('wave', F.lit(wave))
            items_src = winners.drop('csig')

        # 6. items (F5/S6): span pairs + processor chain. With
        # ignore_errors, a failing processor chain quarantines the wave's
        # raw items (with the error) instead of killing the crawl —
        # runtime (data-dependent) failures are surfaced eagerly inside
        # the guarded region via a persist+count, not at commit time.
        raw_items = extract_items(items_src).withColumn('wave', F.lit(wave))
        items, quarantine = raw_items, None
        if cfg.item_processors:
            try:
                for processor in cfg.item_processors:
                    items = processor(items)
                if cfg.ignore_errors:
                    items = items.persist()
                    items.count()
            except Exception as e:
                if not cfg.ignore_errors:
                    raise
                err = f'{type(e).__name__}: {e}'
                quarantine = raw_items.withColumn('error', F.lit(err[:500]))
                items = self._empty(raw_items.schema)
                # the wave emitted NO items, so its content signatures
                # must not enter content_seen_delta — committing them
                # would permanently suppress this content (a later
                # duplicate would be anti-joined away without any items
                # row ever existing)
                content_delta = None
                metrics_rows.append((wave, 'items_quarantined', -1, 0, 0.0))

        docs_delta = docs.select(
            F.col('url').alias('doc_id'), 'spans', F.lit(wave).alias('wave'), 'priority', 'fetch_ms',
            *render_cols,
        )

        # 7. follow (F2/J4/P3/W2): raw-link anti-join → absolutize → priorities
        outlinks = extract_outlinks(follow_docs, cfg.link_rule)
        followed_state = self._state('followed_delta', 'url string')
        reachable_urls = seen_state.filter(F.col('status') == 'reachable').select('url')
        follow_block = followed_state.select('url').unionByName(reachable_urls)
        # reference quirk: dedup compares the RAW href (any_io/response.py:22-24)
        fresh_links = outlinks.join(follow_block, outlinks['raw_link'] == follow_block['url'], 'left_anti')
        absolutized = fresh_links.withColumn('abs_url', absolutize_udf(F.col('parent_url'), F.col('raw_link')))
        absolutized = self._canonicalized(absolutized, 'abs_url')
        with_prio, n_links = dense_sequence_with_count(
            absolutized, ['parent_priority', 'pos'], 'priority', start=next_priority)
        next_priority += n_links  # dense: max assigned = start + n_links - 1
        next_frontier_new = with_prio.select(
            F.col('abs_url').alias('url'),
            url_hash_col(F.col('abs_url')).alias('url_hash'),
            host_col(F.col('abs_url')).alias('host'),
            scheme_col(F.col('abs_url')).alias('scheme'),
            F.lit(wave + 1).alias('wave'),
            'priority',
        )
        followed_delta = next_frontier_new.select('url').distinct().join(
            followed_state, 'url', 'left_anti'
        )
        # host-level link lineage: who cites whom, aggregated before the
        # commit so the table is host²-bounded, not link-bounded. Feeds
        # CrawlResult.host_ranks() (graphrank.host_rank) for
        # priority-frontier scoring. Derived from ALL outlinks — BEFORE
        # the fresh-links anti-join — so repeat citations of already-
        # discovered pages still count as authority (an anti-joined
        # lineage would only ever record first discoveries, skewing rank
        # toward whichever host was crawled first). Relative links resolve
        # to the parent host by definition; no absolutize pass needed at
        # host granularity.
        links_delta = (
            outlinks.groupBy(
                host_col(F.col('parent_url')).alias('src_host'),
                F.when(
                    F.col('raw_link').contains('://'),
                    host_col(F.col('raw_link')),
                ).otherwise(host_col(F.col('parent_url'))).alias('dst_host'),
            )
            .agg(F.count('*').alias('n_links'))
            .withColumn('wave', F.lit(wave))
        )
        next_frontier = next_frontier_new.unionByName(deferred)
        if retry_requeue is not None:
            next_frontier = next_frontier.unionByName(retry_requeue)

        # OPIC state update (only when the priority expression consumes
        # it): this wave's dispatched hosts bank their cash and spend it
        # along this wave's host-level lineage — the O(wave) incremental
        # importance (graphrank.opic_update) the next wave's scoring
        # reads back via load_current. Self-citations are excluded, like
        # host_rank's ranking semantics; robots-excluded rows never hit
        # the network, so they don't count as fetches. First tracked
        # wave seeds equal cash over the hosts observed so far
        # (opic_init); hosts discovered later enter with received cash
        # (OPIC's new-page rule).
        opic_state = None
        if cfg.frontier_priority is not None and 'opic' in cfg.frontier_priority:
            from scalpel_spark.operators.graphrank import opic_init, opic_update

            fetched_hosts = (
                seen_delta.filter(F.col('status') != 'robots_excluded')
                .select(host_col(F.col('url')).alias('host')).distinct()
            )
            wave_edges = (
                links_delta.filter(F.col('src_host') != F.col('dst_host'))
                .select(F.col('src_host').alias('src'),
                        F.col('dst_host').alias('dst'), 'n_links')
            )
            prev = self.store.load_current(self.spark, 'opic_state')
            if prev is None:
                prev = opic_init(fetched_hosts.unionByName(
                    wave_edges.select(F.col('dst').alias('host'))).distinct())
            opic_state = opic_update(prev, wave_edges, fetched_hosts,
                                     weight='n_links')

        # 8. atomic snapshot commit (T4)
        tables = {
            'frontier': next_frontier,
            'seen_delta': seen_delta,
            'followed_delta': followed_delta,
            'items_delta': items,
            'docs_delta': docs_delta,
            'links_delta': links_delta,
        }
        if quarantine is not None:
            tables['items_quarantine_delta'] = quarantine
        if content_delta is not None:
            tables['content_seen_delta'] = content_delta
        if retry_delta is not None:
            tables['retry_delta'] = retry_delta
        if opic_state is not None:
            tables['opic_state'] = opic_state
        if cfg.follow_robots_txt:
            tables['host_state'] = getattr(self, '_host_state_snapshot', self._empty(HOST_STATE_SCHEMA))
        metrics_rows.append((wave, 'wave_total', -1, n_new, (time.time() - t_wave) * 1000))
        snap = self._commit_wave(tables, wave, next_priority, metrics_rows)

        frontier.unpersist()
        new.unpersist()
        # dense_sequence persists an intermediate per wave; everything this
        # wave needed is now on disk, so drop all cached lineage.
        self.spark.catalog.clearCache()

        committed_frontier = self.spark.read.parquet(snap['tables']['frontier'])
        return committed_frontier, next_priority, seen_count + n_new

    def _commit_wave(self, tables: dict, wave: int, next_priority: int, metrics_rows: list) -> dict:
        tables = dict(tables)
        tables['metrics_delta'] = self.spark.createDataFrame(metrics_rows, METRICS_SCHEMA)
        snapshot_id = self.store.commit(tables, wave, metadata={'next_priority': next_priority})
        return next(s for s in self.store.snapshots() if s['id'] == snapshot_id)
