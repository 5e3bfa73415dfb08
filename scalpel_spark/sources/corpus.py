"""Synthetic web corpus — the interleaved text+media documents table that
replaces live HTTP in the graft (reference fetch: ``any_io/static_spider.py:130``).

Schema (BASELINE.json input_hint + FIXTURES.md §1):
    doc_id      string   — canonical URL of the page (fetch join key)
    spans       array<struct<kind string, text string, media_ref string, offset int>>
    http_status int      — 200 | 404 | 500 (error → unreachable, parse skipped)
    scheme      string   — http | https | file
    readable    boolean  — file-scheme read success flag
    fetch_ms    double   — deterministic synthetic fetch latency

Two tiers:
* ``golden_site`` — the reference's 3-page quotes site, verbatim semantics
  (``tests/website/page{1,2,3}.html``; goldens at
  ``tests/any_io/test_static_spider.py:336-401``).
* ``synthetic_corpus`` — an N-page deterministic link graph generated with
  pure JVM column expressions (no driver loops, no Python UDFs) so corpus
  generation itself scales to 10^10 rows on a cluster: every attribute is a
  hash function of (page_id, seed).

All randomness is ``xxhash64``-derived from (id, seed): same seed → same
corpus, at any parallelism, on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField('kind', T.StringType()),
            T.StructField('text', T.StringType()),
            T.StructField('media_ref', T.StringType()),
            T.StructField('offset', T.IntegerType()),
        ]
    )
)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField('doc_id', T.StringType()),
        T.StructField('spans', SPAN_TYPE),
        T.StructField('http_status', T.IntegerType()),
        T.StructField('scheme', T.StringType()),
        T.StructField('readable', T.BooleanType()),
        T.StructField('fetch_ms', T.DoubleType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField('host', T.StringType()),
        T.StructField('fetch_status', T.IntegerType()),  # -1 = connect timeout
        T.StructField('rules', T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Golden 3-page reference site (tests/website/page{1,2,3}.html)
# ---------------------------------------------------------------------------

_GOLDEN_QUOTES = {
    1: [
        (
            'The world as we have created it is a process of our thinking. '
            'It cannot be changed without changing our thinking.',
            'Albert Einstein',
        ),
        (
            'It is our choices, Harry, that show what we truly are, far more than our abilities.',
            'J. K. Rowling',
        ),
    ],
    2: [
        (
            'There are only two ways to live your life. One is as though nothing is a miracle. '
            'The other is as though everything is a miracle.',
            'Albert Einstein',
        ),
        (
            'The person, be it gentleman or lady, who has not pleasure in a good novel, '
            'must be intolerably stupid.',
            'Jane Austen',
        ),
    ],
    3: [
        (
            "Imperfection is beauty, madness is genius and it's better to be absolutely "
            'ridiculous than absolutely boring.',
            'Marilyn Monroe',
        ),
        (
            'Try not to become a man of success. Rather become a man of value.',
            'Albert Einstein',
        ),
    ],
}

# (prev_href, next_href) per page, exactly as in the reference HTML
_GOLDEN_LINKS = {1: ('#', 'page2.html'), 2: ('page1.html', 'page3.html'), 3: ('page2.html', '#')}


def golden_site_rows(style: str = 'http') -> list[dict]:
    """The 3-page site as corpus rows.

    ``style='http'``: seed is ``http://quotes.com`` and pages 2/3 live at
    ``http://quotes.com/page{i}.html`` (tests/any_io/test_static_spider.py:383-401).
    ``style='file'``: seed is ``file:///website/page1.html`` — followed URLs
    collapse to ``file:/website/page{i}.html`` (:360-381).
    """
    if style == 'http':
        doc_ids = {
            1: 'http://quotes.com',
            2: 'http://quotes.com/page2.html',
            3: 'http://quotes.com/page3.html',
        }
        scheme = 'http'
    elif style == 'file':
        doc_ids = {
            1: 'file:///website/page1.html',
            # follow() absolutizes relative hrefs against the seed → single-slash form
            2: 'file:/website/page2.html',
            3: 'file:/website/page3.html',
        }
        scheme = 'file'
    else:
        raise ValueError(f'unknown style: {style}')

    rows = []
    for page in (1, 2, 3):
        spans, off = [], 0
        for quote, author in _GOLDEN_QUOTES[page]:
            spans.append({'kind': 'text', 'text': quote, 'media_ref': None, 'offset': off})
            spans.append({'kind': 'text', 'text': author, 'media_ref': None, 'offset': off + 1})
            off += 2
        prev_href, next_href = _GOLDEN_LINKS[page]
        spans.append({'kind': 'link', 'text': prev_href, 'media_ref': None, 'offset': off})
        spans.append({'kind': 'link', 'text': next_href, 'media_ref': None, 'offset': off + 1})
        rows.append(
            {
                'doc_id': doc_ids[page],
                'spans': spans,
                'http_status': 200,
                'scheme': scheme,
                'readable': True,
                'fetch_ms': float(page),  # deterministic: avg = 2.0
            }
        )
    return rows


def golden_site(spark: SparkSession, style: str = 'http') -> DataFrame:
    return spark.createDataFrame(golden_site_rows(style), CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# Scalable deterministic synthetic corpus (pure column expressions)
# ---------------------------------------------------------------------------

_AUTHORS = ['Albert Einstein', 'Jane Austen', 'Marilyn Monroe', 'J. K. Rowling', 'Mark Twain']


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def synthetic_corpus(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int,
    seed: int = 42,
    hot_hosts: int = 0,
    hot_fraction: float = 0.3,
    error_rate_mod: int = 50,
    links_per_page: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """N-page deterministic link graph.

    * ``hot_hosts`` > 0 concentrates ``hot_fraction`` of pages onto that many
      hosts (hot-domain skew for the salting tests, FIXTURES.md §Scales).
    * links are a mix of absolute same-host, relative same-host, absolute
      cross-host, duplicate, fragment-only ('#...') and dead (404) targets.
    * 1/error_rate_mod pages are 404 and 1/error_rate_mod are 500.

    Everything below is JVM column algebra over ``spark.range`` — generation
    is embarrassingly parallel and seed-stable at any partitioning.
    """
    cold_hosts = max(n_hosts - hot_hosts, 1)
    hot_pct = int(hot_fraction * 100)

    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    pid = F.col('id')
    s = F.lit(seed)

    if hot_hosts > 0:
        is_hot = F.pmod(_h(pid, s, F.lit(1)), F.lit(100)) < hot_pct
        host_id = F.when(is_hot, F.pmod(_h(pid, s, F.lit(2)), F.lit(hot_hosts))).otherwise(
            F.lit(hot_hosts) + F.pmod(_h(pid, s, F.lit(3)), F.lit(cold_hosts))
        )
    else:
        host_id = F.pmod(_h(pid, s, F.lit(3)), F.lit(n_hosts))

    df = df.withColumn('host_id', host_id)
    df = df.withColumn('doc_id', _page_url(F.col('host_id'), pid))

    # deterministic link targets: k-th link of page i → page hash(i, seed, 100+k) % n
    def link_struct(k: int) -> F.Column:
        tgt = F.pmod(_h(pid, s, F.lit(100 + k)), F.lit(n_pages))
        tgt_host = _target_host(tgt, s, n_hosts, hot_hosts, cold_hosts, hot_pct)
        same_host = tgt_host == F.col('host_id')
        # same-host targets are emitted as *relative* hrefs half the time
        rel = F.pmod(_h(pid, s, F.lit(200 + k)), F.lit(2)) == 0
        href = F.when(same_host & rel, F.concat(F.lit('p'), tgt.cast('string'), F.lit('.html'))).otherwise(
            _page_url(tgt_host, tgt)
        )
        # every 11th link is fragment-only (must resolve to base sans fragment)
        href = F.when(F.pmod(_h(pid, s, F.lit(300 + k)), F.lit(11)) == 0, F.lit('#section')).otherwise(href)
        return F.struct(
            F.lit('link').alias('kind'),
            href.alias('text'),
            F.lit(None).cast('string').alias('media_ref'),
            F.lit(4 + k).cast('int').alias('offset'),
        )

    quote_author = F.element_at(
        F.array(*[F.lit(a) for a in _AUTHORS]), (F.pmod(_h(pid, s, F.lit(4)), F.lit(len(_AUTHORS))) + 1).cast('int')
    )
    text_spans = [
        F.struct(
            F.lit('text').alias('kind'),
            F.concat(F.lit('quote-'), pid.cast('string'), F.lit('-alpha')).alias('text'),
            F.lit(None).cast('string').alias('media_ref'),
            F.lit(0).cast('int').alias('offset'),
        ),
        F.struct(
            F.lit('text').alias('kind'),
            quote_author.alias('text'),
            F.lit(None).cast('string').alias('media_ref'),
            F.lit(1).cast('int').alias('offset'),
        ),
        # interleaved media span (opaque ref) — every 3rd page
        F.struct(
            F.lit('media').alias('kind'),
            F.lit(None).cast('string').alias('text'),
            F.concat(F.lit('img://h'), F.col('host_id').cast('string'), F.lit('/'), pid.cast('string')).alias(
                'media_ref'
            ),
            F.lit(2).cast('int').alias('offset'),
        ),
    ]
    n_links_col = (F.pmod(_h(pid, s, F.lit(5)), F.lit(links_per_page)) + 1).cast('int')
    link_structs = F.slice(F.array(*[link_struct(k) for k in range(links_per_page)]), 1, n_links_col)
    media_included = F.pmod(_h(pid, s, F.lit(6)), F.lit(3)) == 0
    spans = F.when(
        media_included, F.concat(F.array(*text_spans), link_structs)
    ).otherwise(F.concat(F.array(*text_spans[:2]), link_structs))

    status = (
        F.when(F.pmod(_h(pid, s, F.lit(7)), F.lit(error_rate_mod)) == 0, F.lit(404))
        .when(F.pmod(_h(pid, s, F.lit(7)), F.lit(error_rate_mod)) == 1, F.lit(500))
        .otherwise(F.lit(200))
    )

    return df.select(
        F.col('doc_id'),
        spans.alias('spans'),
        status.cast('int').alias('http_status'),
        F.lit('http').alias('scheme'),
        F.lit(True).alias('readable'),
        (F.lit(1.0) + F.pmod(_h(pid, s, F.lit(8)), F.lit(100)).cast('double') / 10.0).alias('fetch_ms'),
    )


def _page_url(host_id, page_id) -> F.Column:
    return F.concat(
        F.lit('http://h'), host_id.cast('string'), F.lit('.example.com/p'), page_id.cast('string'), F.lit('.html')
    )


def _target_host(tgt, s, n_hosts, hot_hosts, cold_hosts, hot_pct) -> F.Column:
    if hot_hosts > 0:
        is_hot = F.pmod(_h(tgt, s, F.lit(1)), F.lit(100)) < hot_pct
        return F.when(is_hot, F.pmod(_h(tgt, s, F.lit(2)), F.lit(hot_hosts))).otherwise(
            F.lit(hot_hosts) + F.pmod(_h(tgt, s, F.lit(3)), F.lit(cold_hosts))
        )
    return F.pmod(_h(tgt, s, F.lit(3)), F.lit(n_hosts))


# ---------------------------------------------------------------------------
# Robots fixtures
# ---------------------------------------------------------------------------

# canonical reference fixture — /root/reference/tests/conftest.py:11-21
CANONICAL_ROBOTS = (
    'User-agent: Googlebot\n'
    'Disallow: /videos/\n'
    'Disallow: /photos/\n'
    '\n'
    'User-agent: *\n'
    'Disallow: /admin/\n'
    'Allow: /admin/admin-ajax.php\n'
)


def synthetic_robots_rows(n_hosts: int, seed: int = 42) -> list[dict]:
    """Deterministic per-host robots rows covering every policy branch of
    ``any_io/robots.py:46-91``: 200+rules, 401/403 (deny all), 404/500
    (allow all), -1 connect timeout (deny all), Disallow: / (delay -1),
    Crawl-delay, Request-rate."""
    rows = []
    for h in range(n_hosts):
        host = f'h{h}.example.com'
        m = h % 12
        if m == 0:
            rows.append({'host': host, 'fetch_status': 401, 'rules': ''})
        elif m == 1:
            rows.append({'host': host, 'fetch_status': 404, 'rules': ''})
        elif m == 2:
            rows.append({'host': host, 'fetch_status': -1, 'rules': ''})  # connect timeout
        elif m == 3:
            rows.append({'host': host, 'fetch_status': 200, 'rules': 'User-agent: *\nDisallow: /\n'})
        elif m == 4:
            rows.append({'host': host, 'fetch_status': 200, 'rules': 'User-agent: *\nCrawl-delay: 2\n'})
        elif m == 5:
            rows.append({'host': host, 'fetch_status': 200, 'rules': 'User-agent: *\nRequest-rate: 2/5\n'})
        elif m == 6:
            rows.append({'host': host, 'fetch_status': 200, 'rules': CANONICAL_ROBOTS})
        elif m == 7:
            rows.append({'host': host, 'fetch_status': 500, 'rules': ''})
        else:
            rows.append({'host': host, 'fetch_status': 200, 'rules': 'User-agent: *\nDisallow:\n'})
    return rows


def synthetic_robots(spark: SparkSession, n_hosts: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synthetic_robots_rows(n_hosts, seed), ROBOTS_SCHEMA)


def write_bucketed_corpus(corpus_df: DataFrame, table_name: str,
                          n_buckets: int = 8, path: str | None = None) -> None:
    """Persist the corpus as a parquet table bucketed (and sorted) on
    ``doc_id`` — the at-rest layout DESIGN.md prescribes for the fetch
    join: at 100 TB the corpus is by far the bigger join side, so
    pre-bucketing it on the join key makes the fetch a one-sided shuffle
    (only the much smaller frontier moves; the corpus-side Exchange
    disappears from the plan — proven by
    tests/test_bucketed_join.py). ``path`` makes it an external table
    (keeps test data out of the default warehouse)."""
    writer = (corpus_df.write.mode('overwrite').format('parquet')
              .bucketBy(n_buckets, 'doc_id').sortBy('doc_id'))
    if path is not None:
        writer = writer.option('path', path)
    writer.saveAsTable(table_name)


def with_render_modes(corpus_df: DataFrame, dom_mod: int = 3, seed: int = 42) -> DataFrame:
    """S5 selenium parity: tag every ``dom_mod``-th page (hash-selected,
    deterministic) as browser-rendered (``render='dom'``), the rest as
    ``'static'``. The span contract is identical for both modes — the
    selenium spider differs only in *how* the DOM was produced
    (``any_io/selenium_spider.py:17-18`` subclasses the static loop)."""
    is_dom = F.pmod(F.xxhash64('doc_id', F.lit(seed)), F.lit(dom_mod)) == 0
    return corpus_df.withColumn('render', F.when(is_dom, 'dom').otherwise('static'))


def with_dom_variants(corpus_df: DataFrame, dom_mod: int = 3, seed: int = 42,
                      js_link: str | None = None) -> DataFrame:
    """S5 selenium semantics with a DIVERGENT rendered document: every
    ``dom_mod``-th page (hash-selected, deterministic) gets a
    ``dom_spans`` column — the static spans plus one JS-injected text
    span appended at the next offset (what the browser's DOM holds after
    scripts ran); other pages get ``dom_spans = NULL`` (their DOM equals
    the static HTML, so ``CrawlConfig(render_mode='dom')``'s
    ``coalesce(dom_spans, spans)`` falls back). ``js_link='<url>'``
    additionally appends a kind='link' span pointing there on the
    JS-modified pages — a link only a browser discovers, so dom mode
    crawls it and static mode never sees it (the SPA case,
    any_io/selenium_spider.py:17-21). Pure column algebra over the span
    arrays — no explode, scales with the corpus."""
    tagged = with_render_modes(corpus_df, dom_mod=dom_mod, seed=seed)
    js_span = F.struct(
        F.lit('text').alias('kind'),
        F.concat(F.lit('js-rendered:'), F.col('doc_id')).alias('text'),
        F.lit(None).cast('string').alias('media_ref'),
        F.size('spans').cast('int').alias('offset'))
    extra = F.array(js_span)
    if js_link is not None:
        extra = F.concat(extra, F.array(F.struct(
            F.lit('link').alias('kind'),
            F.lit(js_link).alias('text'),
            F.lit(None).cast('string').alias('media_ref'),
            (F.size('spans') + 1).cast('int').alias('offset'))))
    return tagged.withColumn(
        'dom_spans',
        F.when(F.col('render') == 'dom',
               F.concat(F.col('spans'), extra)).otherwise(F.lit(None)))
