"""spark-submit entry point for the crawl engine (north-rule deployment
shape: ``spark-submit --py-files scalpel_spark.zip tools/submit_crawl.py``).

Runs a deterministic synthetic crawl and prints one JSON line with crawl
statistics and throughput. Package the library first::

    python tools/package.py          # writes dist/scalpel_spark.zip
    spark-submit --master local[8] --py-files dist/scalpel_spark.zip \
        tools/submit_crawl.py --n-pages 20000 --n-hosts 200 --budget 2000

On a real cluster the same command line targets YARN/K8s masters; the
engine itself has no local-mode assumptions.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-pages', type=int, default=50_000)
    ap.add_argument('--seeds-per-host', type=int, default=10)
    ap.add_argument('--links-per-page', type=int, default=8)
    ap.add_argument('--n-hosts', type=int, default=200)
    ap.add_argument('--hot-hosts', type=int, default=4)
    ap.add_argument('--budget', type=int, default=2_000)
    ap.add_argument('--max-waves', type=int, default=5)
    ap.add_argument('--seed', type=int, default=42)
    ap.add_argument('--checkpoint-dir', default=None)
    ap.add_argument('--expire-snapshots', type=int, default=None, metavar='RETAIN_LAST',
                    help='after the crawl, compact state and expire superseded '
                         'snapshot history down to the last RETAIN_LAST entries '
                         '(Iceberg rewrite_data_files + expire_snapshots)')
    ap.add_argument('--url-rules', action='store_true',
                    help='enable C4-style URL quality rules ahead of the frontier')
    ap.add_argument('--fetch-mode', choices=['corpus_join', 'mapinpandas'],
                    default='corpus_join',
                    help='fetch stage: corpus equi-join (default) or the '
                         'live-deployment mapInPandas fetcher (injectable '
                         'batch client; corpus-backed fake here)')
    ap.add_argument('--politeness-mode', choices=['anyio', 'green'],
                    default='anyio',
                    help="backend semantics: 'green' paces with the config "
                         'delay, reads file URLs before robots, and a '
                         'denied URL consumes a dispatch slot')
    ap.add_argument('--robots-matcher', choices=['stdlib', 'rfc9309'], default='stdlib',
                    help='stdlib = reference parity (first URL decides the host); '
                         'rfc9309 = per-URL wildcard matching')
    ap.add_argument('--politeness-scope', choices=['host', 'domain', 'ip'], default='host',
                    help='count the per-wave dispatch budget per exact host, '
                         'per registered domain (PLD), or per resolved server '
                         'address (ip; synthesises a host->ip map grouping '
                         '--vhosts-per-ip hosts per address)')
    ap.add_argument('--vhosts-per-ip', type=int, default=4,
                    help="hosts per synthetic address under --politeness-scope ip")
    ap.add_argument('--global-budget', type=int, default=None, metavar='K',
                    help='global fetch-capacity cap: at most K dispatches per '
                         'wave across ALL hosts (FIFO by priority)')
    ap.add_argument('--meta-robots-every', type=int, default=0, metavar='N',
                    help='respect_meta_robots demo: pages whose doc_id '
                         'hash %% N == 0 get noindex, == 1 get nofollow '
                         '(N >= 2; 0 = knob off)')
    ap.add_argument('--content-dedup', action='store_true',
                    help='emit items once per unique span-sequence fingerprint '
                         '(Heritrix-style digest dedup)')
    ap.add_argument('--blocklist-hosts', default='',
                    help='comma-separated hosts to refuse (implies --url-rules)')
    ap.add_argument('--max-retries', type=int, default=0,
                    help='re-enqueue unreachable fetches up to N times '
                         '(attempt budgets persist in retry_delta)')
    ap.add_argument('--frontier-priority', default=None, metavar='SQL',
                    help="dispatch score expression, e.g. '-length(url)' or "
                         "'host_rank' (PageRank over persisted lineage); "
                         "with --global-budget the cap becomes a score-"
                         "ordered priority-queue dequeue")
    ap.add_argument('--host-ranks', type=int, default=None, metavar='TOP_N',
                    help='after the crawl, print the TOP_N hosts by link-graph '
                         'PageRank from the persisted lineage')
    ap.add_argument('--score-aging', type=float, default=0.0, metavar='PER_WAVE',
                    help='starvation control for --frontier-priority: effective '
                         'score grows by this per wave a URL has waited since '
                         'its own enqueue')
    ap.add_argument('--sitemap-pages', default=None, metavar='PARQUET',
                    help='parquet path of fetched sitemap pages (url, body); '
                         'enables follow_sitemaps seed expansion from the seed '
                         "hosts' robots Sitemap: directives")
    ap.add_argument('--feed-pages', default=None, metavar='PARQUET',
                    help='parquet path of fetched RSS/Atom pages (url, body); '
                         'enables follow_feeds seed expansion in publication '
                         'order')
    args = ap.parse_args()

    # spark-submit provides the session; build via getOrCreate so the
    # submitted conf (master, executors) wins over library defaults
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel('WARN')

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(
        spark, n_pages=args.n_pages, n_hosts=args.n_hosts,
        seed=args.seed, hot_hosts=args.hot_hosts,
        links_per_page=args.links_per_page,
    )
    robots = synthetic_robots(spark, n_hosts=args.n_hosts)
    if args.meta_robots_every:
        from pyspark.sql import functions as _F

        n = args.meta_robots_every
        if n < 2:
            ap.error('--meta-robots-every needs N >= 2 (N=1 would tag '
                     'every page noindex and leave nofollow unreachable)')
        h = _F.abs(_F.xxhash64('doc_id'))
        corpus = corpus.withColumn(
            'robots_tag',
            _F.when(h % n == 0, 'noindex')
            .when(h % n == 1, 'nofollow'))
    blocklist = tuple(h.strip() for h in args.blocklist_hosts.split(',') if h.strip())
    cfg = CrawlConfig(
        follow_robots_txt=True,
        max_dispatch_per_host_per_wave=args.budget,
        hot_host_threshold=max(args.budget // 2, 16),
        max_waves=args.max_waves,
        url_rules=args.url_rules or bool(blocklist),
        blocklist_hosts=blocklist,
        robots_matcher=args.robots_matcher,
        fetch_mode=args.fetch_mode,
        politeness_mode=args.politeness_mode,
        politeness_scope=args.politeness_scope,
        max_dispatch_per_wave=args.global_budget,
        content_dedup=args.content_dedup,
        respect_meta_robots=bool(args.meta_robots_every),
        max_retries=args.max_retries,
        frontier_priority=args.frontier_priority,
        score_aging_per_wave=args.score_aging,
        follow_sitemaps=args.sitemap_pages is not None,
        follow_feeds=args.feed_pages is not None,
    )
    store = SnapshotStore(args.checkpoint_dir or tempfile.mkdtemp(prefix='crawl-submit-'))
    # seeds must exist in the synthetic web; one per host so politeness and
    # robots branches all engage (some hosts deny — that is the point)
    from pyspark.sql import functions as F

    from pyspark.sql import Window

    w = Window.partitionBy('host').orderBy('doc_id')
    seeds = [
        r['doc_id'] for r in corpus
        .withColumn('host', F.lower(F.parse_url('doc_id', F.lit('HOST'))))
        .withColumn('rn', F.row_number().over(w))
        .filter(F.col('rn') <= args.seeds_per_host)
        .orderBy('host', 'doc_id').collect()
    ]

    host_ips = None
    if args.politeness_scope == 'ip':
        # deterministic stand-in for a DNS cache: group consecutive hosts
        # onto one synthetic address (a production run materializes real
        # resolutions into the same (host, ip) shape)
        host_ips = (
            corpus.select(F.lower(F.parse_url('doc_id', F.lit('HOST'))).alias('host'))
            .distinct()
            .withColumn('ip', F.concat(
                F.lit('10.0.'),
                (F.abs(F.xxhash64('host')) % args.n_hosts / args.vhosts_per_ip)
                .cast('int').cast('string'),
                F.lit('.1')))
        )

    sitemap_pages = (spark.read.parquet(args.sitemap_pages)
                     if args.sitemap_pages else None)
    feed_pages = spark.read.parquet(args.feed_pages) if args.feed_pages else None

    t0 = time.time()
    engine = CrawlEngine(spark, corpus, robots, cfg, store, host_ips=host_ips,
                         sitemap_pages=sitemap_pages, feed_pages=feed_pages)
    result = engine.run(seeds)
    wall = time.time() - t0
    n_expired = len(engine.expire_snapshots(args.expire_snapshots)) \
        if args.expire_snapshots is not None else None
    # aggregate-only statistics (<= 3 rows to the driver); the set-returning
    # result.statistics() is the reference-parity surface, test-scale only
    stats = {r['status']: r for r in result.statistics_agg().collect()}
    n_seen = sum(r['n_urls'] for r in stats.values())
    reach = stats.get('reachable')
    print(json.dumps({
        'n_pages': args.n_pages,
        'n_hosts': args.n_hosts,
        'waves': int(result.metrics.agg({'wave': 'max'}).collect()[0][0]) + 1,
        'reachable': int(reach['n_urls']) if reach else 0,
        'unreachable': int(stats['unreachable']['n_urls']) if 'unreachable' in stats else 0,
        'robots_excluded': int(stats['robots_excluded']['n_urls']) if 'robots_excluded' in stats else 0,
        'seen_total': n_seen,
        'avg_fetch_ms': round(reach['avg_fetch_ms'], 3) if reach and reach['avg_fetch_ms'] else 0.0,
        'wall_sec': round(wall, 2),
        'urls_per_sec': round(n_seen / wall, 1),
        'checkpoint_dir': store.root,
        **({'snapshots_expired': n_expired,
            'snapshots_retained': len(store.snapshots())}
           if n_expired is not None else {}),
        **({'host_ranks': [
                {'host': r['host'], 'rank_ppb': int(r['rank_ppb'])}
                for r in result.host_ranks()
                .orderBy(F.col('rank_ppb').desc(), 'host')
                .limit(args.host_ranks).collect()]}
           if args.host_ranks else {}),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
