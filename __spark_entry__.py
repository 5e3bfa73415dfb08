"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data pipeline operators (dedup, similarity
search, text analysis); ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL for each (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings). Engine-level crawl queries
whose semantics are iterative (wave loop) either pin their deterministic
golden result as a VALUES oracle or omit the oracle (rows-only check).

Parity rules used throughout (so value-hashes match bit-for-bit):
* all hashes are md5-derived 60-bit ints (`functions/texthash.py`) —
  identical in Spark and DuckDB;
* money sums go through DECIMAL(18,4) so addition order can't wobble the
  doubles; averages/cosines are rounded at fixed precision;
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import (
    MERSENNE31,
    hash60,
    hash60_sql,
    log2_milli_sql,
    pround,
)
from scalpel_spark.operators import (
    clustering,
    curation,
    dedup,
    graphrank,
    indexing,
    lineops,
    sessions,
    similarity,
    substr,
    textops,
)

SF_DEFAULT = '/root/testdata/sf0.001'

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f'{sf_dir}/{name}.parquet')


def _docs_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.with_planted_duplicates(_t(spark, sf_dir, 'documents'))


DOCS_PLUS_SQL = (
    "docs_plus AS ("
    " SELECT doc_id, text, lang, source, n_chars FROM documents"
    " UNION ALL"
    " SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars"
    " FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 20))"
)

H60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _shingle_sql(n: int = 4) -> str:
    """CTEs: toks (doc_id, l), sh (doc_id, sset = distinct n-gram shingles)."""
    parts = ' || \' \' || '.join(f'l[i+{k}]' if k else 'l[i]' for k in range(n))
    return (
        "toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM docs_plus), "
        f"sh AS (SELECT doc_id, CASE WHEN len(l) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(l) - {n - 2}), i -> {parts})) "
        "ELSE CAST([] AS VARCHAR[]) END AS sset FROM toks)"
    )


# ---------------------------------------------------------------------------
# 1. relational operator analogues (SURVEY.md §2.4/2.5/2.6/2.7/2.8) on TPC-H
# ---------------------------------------------------------------------------


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 aggregation surface: TPC-H Q1 pricing summary."""
    li = _t(spark, sf_dir, 'lineitem').filter(F.col('l_shipdate') <= F.lit('1998-09-02'))
    dec = lambda c: F.col(c).cast('decimal(18,4)')  # noqa: E731
    return (
        li.groupBy('l_returnflag', 'l_linestatus')
        .agg(
            F.sum(dec('l_quantity')).cast('double').alias('sum_qty'),
            F.sum(dec('l_extendedprice')).cast('double').alias('sum_base_price'),
            F.sum(dec('l_extendedprice') * (F.lit(1).cast('decimal(18,4)') - dec('l_discount')))
            .cast('double').alias('sum_disc_price'),
            pround(F.avg('l_quantity'), 4).alias('avg_qty'),
            F.count('*').alias('count_order'),
        )
    )


ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
       floor((AVG(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_frontier_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/J1 seen-set anti-join analogue: customers with no orders."""
    cust = _t(spark, sf_dir, 'customer')
    orders = _t(spark, sf_dir, 'orders')
    never = cust.join(orders, cust['c_custkey'] == orders['o_custkey'], 'left_anti')
    return never.groupBy('c_nationkey').agg(
        F.count('*').alias('n_customers'),
        F.min('c_custkey').alias('min_custkey'),
    )


ORACLE_ANTI_JOIN = """
SELECT c_nationkey, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def q_robots_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast-dim join analogue: revenue per nation via supplier."""
    li = _t(spark, sf_dir, 'lineitem')
    sup = _t(spark, sf_dir, 'supplier')
    nat = _t(spark, sf_dir, 'nation')
    dec = lambda c: F.col(c).cast('decimal(18,4)')  # noqa: E731
    return (
        li.join(F.broadcast(sup), li['l_suppkey'] == sup['s_suppkey'])
        .join(F.broadcast(nat), sup['s_nationkey'] == nat['n_nationkey'])
        .groupBy('n_name')
        .agg(
            F.sum(dec('l_extendedprice') * (F.lit(1).cast('decimal(18,4)') - dec('l_discount')))
            .cast('double').alias('revenue'),
            F.count('*').alias('n_lineitems'),
        )
    )


ORACLE_BROADCAST = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_fetch_sortmerge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 big equi-join analogue: orders ⋈ lineitem per priority."""
    orders = _t(spark, sf_dir, 'orders')
    li = _t(spark, sf_dir, 'lineitem')
    dec = lambda c: F.col(c).cast('decimal(18,4)')  # noqa: E731
    return (
        orders.join(li, orders['o_orderkey'] == li['l_orderkey'])
        .groupBy('o_orderpriority')
        .agg(
            F.countDistinct('o_orderkey').alias('n_orders'),
            F.sum(dec('l_extendedprice')).cast('double').alias('gross'),
        )
    )


ORACLE_SORTMERGE = """
SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def q_politeness_dispatch_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 per-host dispatch-slot window analogue: first 3 events per user."""
    ev = _t(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    return (
        ev.withColumn('slot', F.row_number().over(w))
        .filter(F.col('slot') <= 3)
        .groupBy('event_type')
        .agg(F.count('*').alias('n_dispatched'), F.countDistinct('user_id').alias('n_users'))
    )


ORACLE_DISPATCH = """
SELECT event_type, COUNT(*) AS n_dispatched, COUNT(DISTINCT user_id) AS n_users
FROM (SELECT event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS slot
      FROM events)
WHERE slot <= 3 GROUP BY event_type
"""


def q_discovery_order_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 posexplode document-order analogue: tokens at positions 1..5."""
    docs = _t(spark, sf_dir, 'documents')
    ex = docs.select(F.posexplode(F.split('text', ' ')).alias('pos0', 'token'))
    return (
        ex.select((F.col('pos0') + 1).alias('pos'), 'token')
        .filter(F.col('pos') <= 5)
        .groupBy('token')
        .agg(F.count('*').alias('n_occurrences'), F.min('pos').alias('first_pos'))
    )


ORACLE_POSEXPLODE = """
WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
     ex AS (SELECT unnest(l) AS token, generate_subscripts(l, 1) AS pos FROM t)
SELECT token, COUNT(*) AS n_occurrences, MIN(pos) AS first_pos
FROM ex WHERE pos <= 5 GROUP BY token
"""


def q_seen_union_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 status-union analogue: union of two event subsets, counted."""
    ev = _t(spark, sf_dir, 'events')
    high = ev.filter(F.col('value') >= 50).select('event_type').withColumn('bucket', F.lit('high'))
    early = ev.filter(F.col('ts') < F.lit('2024-01-10')).select('event_type').withColumn('bucket', F.lit('early'))
    return high.unionByName(early).groupBy('bucket', 'event_type').agg(F.count('*').alias('n'))


ORACLE_UNION = """
SELECT bucket, event_type, COUNT(*) AS n FROM (
  SELECT event_type, 'high' AS bucket FROM events WHERE value >= 50
  UNION ALL
  SELECT event_type, 'early' AS bucket FROM events WHERE ts < TIMESTAMP '2024-01-10'
) GROUP BY bucket, event_type
"""


def q_crawl_statistics_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 statistics surface on documents."""
    docs = _t(spark, sf_dir, 'documents')
    return docs.groupBy('lang').agg(
        F.count('*').alias('n_docs'),
        pround(F.avg('n_chars'), 4).alias('avg_chars'),
        F.countDistinct('source').alias('n_sources'),
    )


ORACLE_STATS = """
SELECT lang, COUNT(*) AS n_docs, floor((AVG(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 top-k: 3 priciest orders per priority class."""
    orders = _t(spark, sf_dir, 'orders')
    w = Window.partitionBy('o_orderpriority').orderBy(F.col('o_totalprice').desc(), F.col('o_orderkey'))
    return (
        orders.withColumn('rnk', F.row_number().over(w))
        .filter(F.col('rnk') <= 3)
        .select('o_orderpriority', F.col('rnk').cast('long').alias('rnk'), 'o_orderkey', 'o_totalprice')
    )


ORACLE_TOPK = """
SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
WHERE rnk <= 3
"""


def q_host_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 host extraction: synthesize URLs from orders, extract host."""
    orders = _t(spark, sf_dir, 'orders')
    url = F.concat(
        F.lit('http://h'), F.pmod(F.col('o_custkey'), F.lit(50)).cast('string'),
        F.lit('.example.com/o/'), F.col('o_orderkey').cast('string'),
    )
    host = F.regexp_extract(url, r'^http://([^/]+)/', 1)
    return orders.select(host.alias('host')).groupBy('host').agg(F.count('*').alias('n_urls'))


ORACLE_HOST = """
SELECT regexp_extract('http://h' || CAST(o_custkey % 50 AS VARCHAR) || '.example.com/o/' || CAST(o_orderkey AS VARCHAR),
                      '^http://([^/]+)/', 1) AS host,
       COUNT(*) AS n_urls
FROM orders GROUP BY 1
"""


def q_skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.2 hot-key salting: two-phase salted aggregation must equal the
    direct GROUP BY (the oracle computes it unsalted) — the semantic
    guarantee behind the engine's hot-host salting. Phase 1 pre-aggregates
    per (key, salt) so no single reducer sees a whole hot key; phase 2
    merges the partials."""
    li = _t(spark, sf_dir, 'lineitem')
    dec = lambda c: F.col(c).cast('decimal(18,4)')  # noqa: E731
    salted = li.withColumn('salt', F.pmod(F.xxhash64('l_orderkey'), F.lit(8)))
    partial = salted.groupBy('l_suppkey', 'salt').agg(
        F.sum(dec('l_quantity')).alias('pq'),
        F.count('*').alias('pc'),
    )
    return partial.groupBy('l_suppkey').agg(
        F.sum('pq').cast('double').alias('total_qty'),
        F.sum('pc').alias('n_items'),
    )


ORACLE_SALTED = """
SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_suppkey
"""


def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + date predicates + top-10 by revenue —
    the filter-pushdown / join-order / top-k composite."""
    cust = _t(spark, sf_dir, 'customer').filter(F.col('c_mktsegment') == 'BUILDING')
    orders = _t(spark, sf_dir, 'orders').filter(F.col('o_orderdate') < F.lit('1995-03-15'))
    li = _t(spark, sf_dir, 'lineitem').filter(F.col('l_shipdate') > F.lit('1995-03-15'))
    dec = lambda c: F.col(c).cast('decimal(18,4)')  # noqa: E731
    joined = (
        cust.join(orders, cust['c_custkey'] == orders['o_custkey'])
        .join(li, orders['o_orderkey'] == li['l_orderkey'])
        .groupBy('l_orderkey', 'o_orderdate')
        .agg(F.sum(dec('l_extendedprice') * (F.lit(1).cast('decimal(18,4)') - dec('l_discount')))
             .cast('double').alias('revenue'))
    )
    # top-10 via sort+limit FIRST (TakeOrderedAndProject — distributed
    # partial top-k, no single-partition global window over the full
    # aggregate), then rank the surviving 10 rows
    top = joined.orderBy(F.col('revenue').desc(), F.col('l_orderkey')).limit(10)
    w = Window.orderBy(F.col('revenue').desc(), F.col('l_orderkey'))
    return (
        top.withColumn('rnk', F.row_number().over(w))
        .select('l_orderkey', F.date_format('o_orderdate', 'yyyy-MM-dd').alias('o_orderdate'),
                'revenue', F.col('rnk').cast('long').alias('rnk'))
    )


ORACLE_TPCH_Q3 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT l_orderkey, o_orderdate, revenue,
         ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rnk
  FROM (
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate))
WHERE rnk <= 10
"""


# ---------------------------------------------------------------------------
# 2. URL algebra golden (P3/P4 — reference core/response.py:103-116)
# ---------------------------------------------------------------------------

URL_GOLDEN = [
    ('http://quotes.com', 'page2.html', 'http://quotes.com/page2.html'),
    ('file:///website/page1.html', 'page2.html', 'file:/website/page2.html'),
    ('http://example.com/a/b.html', '#frag', 'http://example.com/a/b.html'),
    ('http://example.com/a/b/c.html', '../d.html', 'http://example.com/a/d.html'),
    ('http://example.com/a/b.html', '/root.html', 'http://example.com/root.html'),
    ('http://example.com/a/b.html', 'https://other.com/x', 'https://other.com/x'),
    ('http://example.com/a/b.html', 'https://other.com/x#keep', 'https://other.com/x'),
    ('http://example.com/a/b.html', '//cdn.com/y.js', 'http://cdn.com/y.js'),
    ('http://example.com/a/', 'b/c.html?q=1', 'http://example.com/a/b/c.html?q=1'),
    ('http://example.com', './x.html', 'http://example.com/x.html'),
]


def q_url_canonicalize_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 absolutization via the vectorized pandas UDF, against the pinned
    reference goldens (file:/// collapse, fragment asymmetry)."""
    from scalpel_spark.functions.urls import absolutize_udf

    df = spark.createDataFrame([(b, l) for b, l, _ in URL_GOLDEN], 'base string, link string')
    return df.select('base', 'link', absolutize_udf(F.col('base'), F.col('link')).alias('absolute'))


ORACLE_URL = 'SELECT * FROM (VALUES\n' + ',\n'.join(
    "  ('{}', '{}', '{}')".format(b, l, e) for b, l, e in URL_GOLDEN
) + '\n) AS t(base, link, absolute)'


CANON_GOLDEN = [
    ('http://a.com/p?utm_source=x&id=2&utm_campaign=c', 'http://a.com/p?id=2'),
    ('http://a.com/p?b=2&a=1', 'http://a.com/p?a=1&b=2'),
    ('http://a.com/p?a=1#frag', 'http://a.com/p?a=1'),
    ('http://a.com/p?gclid=xyz', 'http://a.com/p'),
    ('HTTP://a.com/p', 'http://a.com/p'),
    ('http://a.com/p?', 'http://a.com/p'),
    ('http://a.com/p?a=1&a=0', 'http://a.com/p?a=1&a=0'),
    ('file:///website/p.html?ref=nav', 'file:/website/p.html'),
    ('http://a.com/p?PHPSESSID=9&x=1', 'http://a.com/p?x=1'),
]


def q_url_frontier_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier canonicalization (seen-set key normalizer): fragment drop,
    tracking/session-param strip, stable param sort — one page stays ONE
    frontier entry regardless of link cosmetics. Pinned goldens."""
    from scalpel_spark.functions.urls import canonical_frontier_udf

    df = spark.createDataFrame([(u,) for u, _ in CANON_GOLDEN], 'url string')
    return df.select('url', canonical_frontier_udf(F.col('url')).alias('canonical'))


ORACLE_CANON = 'SELECT * FROM (VALUES\n' + ',\n'.join(
    "  ('{}', '{}')".format(u, c) for u, c in CANON_GOLDEN
) + '\n) AS t(url, canonical)'


# ---------------------------------------------------------------------------
# 3. deduplication (training-data pipeline)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_docs_plus(spark, sf_dir))


ORACLE_DEDUP_EXACT = f"""
WITH {DOCS_PLUS_SQL}
SELECT fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc_id
FROM (SELECT doc_id, {H60.format(x='lower(text)')} AS fingerprint FROM docs_plus)
GROUP BY fingerprint HAVING COUNT(*) > 1
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs_plus(spark, sf_dir), n=4, threshold=0.5)


ORACLE_JACCARD = f"""
WITH {DOCS_PLUS_SQL}, {_shingle_sql(4)},
ex0 AS (SELECT doc_id, unnest(sset) AS s FROM sh),
mk AS (SELECT doc_id, s,
              s IN (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) > 100) AS h
       FROM ex0),
ky AS (SELECT doc_id, MIN(CASE WHEN NOT h THEN s END) AS nh_min, MIN(s) AS all_min
       FROM mk GROUP BY doc_id),
ex AS (SELECT mk.doc_id, mk.s FROM mk JOIN ky USING (doc_id)
       WHERE NOT h OR (nh_min IS NULL AND s = all_min)),
cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         floor((CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
               / (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset)))) * 10000 + 0.5) / 10000 AS jaccard
  FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a JOIN sh sb ON sb.doc_id = cand.doc_b)
WHERE jaccard >= 0.5
"""


def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters via connected components (min-label propagation)
    over the n-gram Jaccard pair graph, with the keep-one-drop-rest
    decision: is_canonical = 1 for the min doc_id of each cluster. The
    transitive-closure step pair operators leave to the pipeline —
    A~B, B~C must merge even when A~C was never emitted. Oracle is a
    recursive CTE computing the same closure."""
    pairs = dedup.ngram_jaccard_pairs(_docs_plus(spark, sf_dir), n=4, threshold=0.5)
    return dedup.cluster_canonical(pairs)


ORACLE_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
{ORACLE_JACCARD}
),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         FROM reach GROUP BY src),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       CAST(c.doc_id = c.cluster_id AS INTEGER) AS is_canonical
FROM comp c JOIN sizes s USING (cluster_id)
"""


def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: quality gate -> exact dedup on the
    normalized fingerprint -> near-dup connected components over
    normalized text -> keep-one-drop-rest, one attributable verdict row
    per input doc. Oracle recomputes every stage in SQL, including the
    df-capped blocking and the recursive-CTE closure."""
    return curation.curate(_docs_plus(spark, sf_dir), quality_threshold=0.45,
                           n=4, jaccard_threshold=0.5)


def _curate_oracle() -> str:
    stop = ' + '.join(_count_tok_sql(s) for s in textops.STOPWORDS)
    return f"""
WITH RECURSIVE {DOCS_PLUS_SQL},
f AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' ')) AS mean_len,
         CAST({stop} AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) AS dr
  FROM docs_plus),
scored AS (
  SELECT doc_id, text,
         floor((0.4 * LEAST(n_tokens / 100.0, 1.0) + 0.3 * dr
               + 0.2 * LEAST(stop_ratio * 5.0, 1.0)
               + 0.1 * LEAST(mean_len / 8.0, 1.0)) * 10000 + 0.5) / 10000 AS score
  FROM f),
nrm AS (
  SELECT doc_id, score,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM scored),
surv AS (SELECT doc_id, score, norm_text, {H60.format(x='norm_text')} AS fp
         FROM nrm WHERE score >= 0.45),
canon AS (SELECT fp, MIN(doc_id) AS c FROM surv GROUP BY fp),
jn AS (SELECT s.doc_id, s.score, s.norm_text, c.c FROM surv s JOIN canon c USING (fp)),
es AS (SELECT doc_id, score, norm_text FROM jn WHERE doc_id = c),
toks AS (SELECT doc_id, string_split(norm_text, ' ') AS l FROM es),
sh AS (SELECT doc_id, CASE WHEN len(l) >= 4 THEN
         list_distinct(list_transform(range(1, len(l) - 2),
           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))
       ELSE CAST([] AS VARCHAR[]) END AS sset FROM toks),
ex0 AS (SELECT doc_id, unnest(sset) AS s FROM sh),
mk AS (SELECT doc_id, s,
              s IN (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) > 100) AS h
       FROM ex0),
ky AS (SELECT doc_id, MIN(CASE WHEN NOT h THEN s END) AS nh_min, MIN(s) AS all_min
       FROM mk GROUP BY doc_id),
exx AS (SELECT mk.doc_id, mk.s FROM mk JOIN ky USING (doc_id)
        WHERE NOT h OR (nh_min IS NULL AND s = all_min)),
cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           floor((CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
                 / (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset)))) * 10000 + 0.5) / 10000 AS jaccard
    FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a JOIN sh sb ON sb.doc_id = cand.doc_b)
  WHERE jaccard >= 0.5),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         FROM reach GROUP BY src),
near AS (SELECT doc_id, cluster_id FROM comp WHERE doc_id <> cluster_id)
SELECT doc_id, 'low_quality' AS verdict, CAST(-1 AS BIGINT) AS cluster_id, score
FROM nrm WHERE score < 0.45
UNION ALL
SELECT doc_id, 'exact_dup' AS verdict, c AS cluster_id, score FROM jn WHERE doc_id <> c
UNION ALL
SELECT n.doc_id, 'near_dup' AS verdict, n.cluster_id, es.score
FROM near n JOIN es USING (doc_id)
UNION ALL
SELECT es.doc_id, 'kept' AS verdict, es.doc_id AS cluster_id, es.score
FROM es WHERE es.doc_id NOT IN (SELECT doc_id FROM near)
"""


def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified token-budget sampler (greedy fill in
    md5-shuffle-key order, bucket-decomposed prefix sum). The oracle
    computes the same greedy fill with one flat window per stratum —
    provably equal because the buckets range-partition the key space."""
    return curation.token_budget_sample(_t(spark, sf_dir, 'documents'),
                                        budget_tokens=3000, n_buckets=64)


ORACLE_TOKEN_BUDGET = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {H60.format(x='CAST(doc_id AS VARCHAR)')} AS k
  FROM documents),
cum AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM base)
SELECT doc_id, lang, n_tokens, cum_before FROM cum WHERE cum_before < 3000
"""


_MIX_BUDGET = 10_000
_MIX_WEIGHTS = {'en': 500_000, 'fr': 200_000, 'zh': 100_000}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit training-mix sampler: per-language token budgets from
    ppm mixture weights (en 50% / fr 20% / zh 10%, de+es dropped), each
    stratum greedy-filled in md5-shuffle-key order. The oracle joins the
    same weights table onto the flat per-stratum running total."""
    return curation.mixture_sample(
        _t(spark, sf_dir, 'documents'), _MIX_BUDGET, _MIX_WEIGHTS)


_MIX_VALUES = ', '.join(
    f"('{s}', CAST({(_MIX_BUDGET * w) // 1_000_000} AS BIGINT))"
    for s, w in sorted(_MIX_WEIGHTS.items()))

ORACLE_MIXTURE = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {H60.format(x='CAST(doc_id AS VARCHAR)')} AS k
  FROM documents),
cum AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM base),
w AS (SELECT * FROM (VALUES {_MIX_VALUES}) AS t(lang, stratum_budget))
SELECT c.doc_id, c.lang, c.n_tokens, c.cum_before, w.stratum_budget
FROM cum c JOIN w USING (lang) WHERE c.cum_before < w.stratum_budget
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (2048-token training sequences in
    md5-shuffle-key order). The oracle computes the same layout with one
    flat global window — equal because the buckets range-partition the
    key space, so bucket-major order IS global key order."""
    return curation.pack_sequences(_t(spark, sf_dir, 'documents'),
                                   seq_tokens=2048, n_buckets=64)


ORACLE_PACK_SEQUENCES = f"""
WITH base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {H60.format(x='CAST(doc_id AS VARCHAR)')} AS k
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM base)
SELECT doc_id, n_tokens, cum_before,
       cum_before // 2048 AS seq_id,
       cum_before % 2048 AS offset,
       (cum_before % 2048) + n_tokens > 2048 AS spans_boundary
FROM cum
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs_plus(spark, sf_dir), k=16, bands=4, n=4, min_matches=8)


def _minhash_consts_sql(k: int = 16) -> str:
    from scalpel_spark.functions.texthash import minhash_affine_constants

    rows = ', '.join(f'({i}, {a}, {b})'
                     for i, (a, b) in enumerate(minhash_affine_constants(k)))
    return f'consts(i, a, b) AS (VALUES {rows})'


ORACLE_MINHASH = f"""
WITH {DOCS_PLUS_SQL}, {_shingle_sql(4)}, {_minhash_consts_sql(16)},
ex AS (SELECT doc_id, unnest(sset) AS s FROM sh WHERE len(sset) > 0),
based AS (SELECT doc_id, ({H60.format(x='s')}) % {MERSENNE31} AS hb FROM ex),
hashed AS (SELECT doc_id, i, (a * hb + b) % {MERSENNE31} AS h
           FROM based CROSS JOIN consts),
mh AS (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
banded AS (SELECT doc_id, sig, band,
                  array_to_string(sig[band*4+1 : band*4+4], ',') AS bucket
           FROM sig CROSS JOIN range(4) t(band)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, matches FROM (
  SELECT doc_a, doc_b,
         len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i])) AS matches
  FROM cand)
WHERE matches >= 8
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: the planted-duplicate batch (doc_id >= 1e6)
    checked against the signature index of the base corpus — each planted
    doc must hit its original with a full 16/16 match, and the base corpus
    is never self-paired."""
    docs = _t(spark, sf_dir, 'documents')
    new = dedup.with_planted_duplicates(docs).filter(F.col('doc_id') >= 1000000)
    index = dedup.minhash_signatures(docs, k=16, n=4)
    return dedup.minhash_pairs_against_index(new, index, k=16, bands=4, n=4,
                                             min_matches=8)


ORACLE_MINHASH_INCREMENTAL = f"""
WITH {DOCS_PLUS_SQL}, {_shingle_sql(4)}, {_minhash_consts_sql(16)},
ex AS (SELECT doc_id, unnest(sset) AS s FROM sh WHERE len(sset) > 0),
based AS (SELECT doc_id, ({H60.format(x='s')}) % {MERSENNE31} AS hb FROM ex),
hashed AS (SELECT doc_id, i, (a * hb + b) % {MERSENNE31} AS h
           FROM based CROSS JOIN consts),
mh AS (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
banded AS (SELECT doc_id, sig, band,
                  array_to_string(sig[band*4+1 : band*4+4], ',') AS bucket
           FROM sig CROSS JOIN range(4) t(band)),
cand AS (SELECT DISTINCT a.doc_id AS new_doc_id, b.doc_id AS index_doc_id,
                a.sig AS sig_a, b.sig AS sig_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id >= 1000000 AND b.doc_id < 1000000)
SELECT new_doc_id, index_doc_id, matches FROM (
  SELECT new_doc_id, index_doc_id,
         len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i])) AS matches
  FROM cand)
WHERE matches >= 8
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_fingerprints(_docs_plus(spark, sf_dir))


def _simhash_oracle(bits: int = 32) -> str:
    sums = ', '.join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    fp = ' + '.join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH {DOCS_PLUS_SQL},
ex AS (SELECT doc_id, {H60.format(x='tok')} AS h
       FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM docs_plus)),
sums AS (SELECT doc_id, {sums} FROM ex GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_duplicates(_t(spark, sf_dir, 'embeddings'), threshold=0.9)


ORACLE_EMB_DUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cosine
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 >= 0.9
"""


# ---------------------------------------------------------------------------
# 4. similarity search
# ---------------------------------------------------------------------------


def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(_t(spark, sf_dir, 'embeddings'), n_queries=10, k=5)


ORACLE_SIM_TOPK = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         floor((list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5
"""


def q_similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_bucket_topk(_t(spark, sf_dir, 'embeddings'), n_queries=10, k=3)


ORACLE_SIM_LSH = f"""
WITH q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv,
                  CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
planes AS (SELECT p, d,
                  CAST(({H60.format(x="CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)")}) & 1 AS BIGINT) * 2 - 1 AS sgn
           FROM (SELECT p, unnest(range((SELECT MAX(len(qv)) FROM q))) AS d
                 FROM range(8) t(p))),
dots AS (SELECT vec_id, p, SUM(qv[CAST(d AS INTEGER) + 1] * sgn) AS dot
         FROM q CROSS JOIN planes GROUP BY vec_id, p),
buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dot > 0 THEN 1 << CAST(p AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id),
v AS (SELECT q.vec_id, q.e, b.bucket FROM q JOIN buckets b ON q.vec_id = b.vec_id),
scored AS (SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
                  floor((list_cosine_similarity(a.e, c.e)) * 1000000 + 0.5) / 1000000 AS cosine
           FROM v a JOIN v c ON a.bucket = c.bucket AND a.vec_id != c.vec_id
           WHERE a.vec_id < 10)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 3
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(_docs_plus(spark, sf_dir), n=4, threshold=0.9)


ORACLE_CONTAINMENT = f"""
WITH {DOCS_PLUS_SQL}, {_shingle_sql(4)},
ex0 AS (SELECT doc_id, unnest(sset) AS s FROM sh WHERE len(sset) > 0),
mk AS (SELECT doc_id, s,
              s IN (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) > 100) AS h
       FROM ex0),
ky AS (SELECT doc_id, MIN(CASE WHEN NOT h THEN s END) AS nh_min, MIN(s) AS all_min
       FROM mk GROUP BY doc_id),
ex AS (SELECT mk.doc_id, mk.s FROM mk JOIN ky USING (doc_id)
       WHERE NOT h OR (nh_min IS NULL AND s = all_min)),
cand AS (SELECT DISTINCT a.doc_id AS doc_contained, b.doc_id AS doc_container
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id != b.doc_id)
SELECT doc_contained, doc_container, containment FROM (
  SELECT doc_contained, doc_container,
         floor((CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) / len(sa.sset)) * 10000 + 0.5) / 10000 AS containment
  FROM cand JOIN sh sa ON sa.doc_id = cand.doc_contained
            JOIN sh sb ON sb.doc_id = cand.doc_container)
WHERE containment >= 0.9
"""


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(_t(spark, sf_dir, 'embeddings'), n_queries=10, k=3)


ORACLE_SIM_IVF = """
WITH q AS (SELECT vec_id, label,
                  list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv,
                  CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
dims AS (SELECT vec_id, label, unnest(qv) AS x, generate_subscripts(qv, 1) AS d FROM q),
cent AS (SELECT label, d, CAST(floor(AVG(x) + 0.5) AS BIGINT) AS c FROM dims GROUP BY 1, 2),
cv AS (SELECT label AS cell, list(c ORDER BY d) AS cvec FROM cent GROUP BY label),
scored AS (SELECT q.vec_id, cv.cell,
                  list_sum(list_transform(range(1, len(qv) + 1),
                                          i -> (qv[i] - cvec[i]) * (qv[i] - cvec[i]))) AS d2
           FROM q CROSS JOIN cv),
assign AS (SELECT vec_id, cell FROM (
             SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
             FROM scored) WHERE rn = 1),
v AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign a USING (vec_id)),
pairs AS (SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
                 floor(list_cosine_similarity(a.e, c.e) * 1000000 + 0.5) / 1000000 AS cosine
          FROM v a JOIN v c ON a.cell = c.cell AND a.vec_id != c.vec_id
          WHERE a.vec_id < 10)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# 5. text analysis
# ---------------------------------------------------------------------------


def q_similarity_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (nprobe=2): queries search their TWO nearest
    centroid cells — the standard recall/cost dial missing from the
    single-probe variant. Corpus vectors stay indexed under their primary
    cell only."""
    return similarity.ivf_topk(_t(spark, sf_dir, 'embeddings'), n_queries=10, k=3, nprobe=2)


ORACLE_SIM_IVF_NPROBE2 = """
WITH q AS (SELECT vec_id, label,
                  list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv,
                  CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
dims AS (SELECT vec_id, label, unnest(qv) AS x, generate_subscripts(qv, 1) AS d FROM q),
cent AS (SELECT label, d, CAST(floor(AVG(x) + 0.5) AS BIGINT) AS c FROM dims GROUP BY 1, 2),
cv AS (SELECT label AS cell, list(c ORDER BY d) AS cvec FROM cent GROUP BY label),
scored AS (SELECT q.vec_id, cv.cell,
                  list_sum(list_transform(range(1, len(qv) + 1),
                                          i -> (qv[i] - cvec[i]) * (qv[i] - cvec[i]))) AS d2
           FROM q CROSS JOIN cv),
ranked AS (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM scored),
assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
assign_q AS (SELECT vec_id, cell FROM ranked WHERE rn <= 2),
v AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign a USING (vec_id)),
vq AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign_q a USING (vec_id)),
pairs AS (SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
                 floor(list_cosine_similarity(a.e, c.e) * 1000000 + 0.5) / 1000000 AS cosine
          FROM vq a JOIN v c ON a.cell = c.cell AND a.vec_id != c.vec_id
          WHERE a.vec_id < 10)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs)
WHERE rank <= 3
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = textops.language_id(_t(spark, sf_dir, 'documents'))
    return pred.groupBy('lang', 'pred_lang').agg(F.count('*').alias('n'))


def _count_tok_sql(tok: str) -> str:
    return f"CAST(len(list_filter(string_split(text, ' '), t -> t = '{tok}')) AS BIGINT)"


def _langid_oracle() -> str:
    score = {
        lang: ' + '.join(_count_tok_sql(m) for m in marks)
        for lang, marks in textops.LANG_MARKERS.items()
        if marks
    }
    ordered = sorted(score)
    best = 'GREATEST(' + ', '.join(f's_{lang}' for lang in ordered) + ')'
    pred = "'und'"
    for lang in reversed(ordered):
        pred = f"CASE WHEN s_{lang} = best THEN '{lang}' ELSE {pred} END"
    sel = ', '.join(f'{expr} AS s_{lang}' for lang, expr in score.items())
    return f"""
WITH scored AS (SELECT doc_id, lang, {sel} FROM documents),
best AS (SELECT doc_id, lang, {best} AS best, * FROM scored),
pred AS (SELECT doc_id, lang, CASE WHEN best > 0 THEN {pred} ELSE 'und' END AS pred_lang FROM best)
SELECT lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY lang, pred_lang
"""


def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_scores(_t(spark, sf_dir, 'documents'))


def _quality_oracle() -> str:
    stop = ' + '.join(_count_tok_sql(s) for s in textops.STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' ')) AS mean_len,
         CAST({stop} AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) AS dr
  FROM documents)
SELECT doc_id, n_tokens,
       floor((mean_len) * 10000 + 0.5) / 10000 AS mean_token_len,
       floor((stop_ratio) * 10000 + 0.5) / 10000 AS stopword_ratio,
       floor((dr) * 10000 + 0.5) / 10000 AS distinct_ratio,
       floor((0.4 * LEAST(n_tokens / 100.0, 1.0) + 0.3 * dr
             + 0.2 * LEAST(stop_ratio * 5.0, 1.0) + 0.1 * LEAST(mean_len / 8.0, 1.0)) * 10000 + 0.5) / 10000 AS score
FROM f
"""


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_counts(_t(spark, sf_dir, 'documents'))


ORACLE_TOKEN_COUNTS = """
WITH per_doc AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS ns
  FROM documents)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(SUM(ns) AS BIGINT) AS total_subwords, floor((AVG(nt)) * 10000 + 0.5) / 10000 AS avg_tokens
FROM per_doc GROUP BY lang
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase / punct→space / collapse / trim)
    feeding exact dedup: cosmetic variants collapse to one fingerprint."""
    norm = textops.normalize_text(_t(spark, sf_dir, 'documents'))
    return norm.select(
        'doc_id', 'n_chars_norm',
        hash60(F.col('norm_text')).alias('norm_fingerprint'),
    )


ORACLE_TEXT_NORMALIZE = f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents)
SELECT doc_id, CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
       {H60.format(x='norm_text')} AS norm_fingerprint
FROM norm
"""


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with deterministically planted PII
    (the synthetic corpus has none): emails / IPv4 / phone-like runs
    counted against the original text, redaction applied sequentially.
    Result carries hash60(redacted_text) so the compare stays slim."""
    docs = _t(spark, sf_dir, 'documents')
    m = F.col('doc_id') % 4
    planted = docs.select(
        'doc_id',
        F.concat(
            F.col('text'),
            F.when(m == 0, F.lit(' mail bob.smith@example.org now'))
            .when(m == 1, F.lit(' dial +1 (415) 555-0199 today'))
            .when(m == 2, F.lit(' host 10.20.30.40 is up'))
            .otherwise(F.lit('')),
        ).alias('text'),
    )
    red = textops.redact_pii(planted)
    return red.select('doc_id', 'n_emails', 'n_ipv4', 'n_phones',
                      hash60(F.col('redacted_text')).alias('redacted_hash'))


def _redact_oracle() -> str:
    pats = {name: pat for name, pat, _ in textops.PII_PATTERNS}
    chain = 'text'
    for name, pat, tok in textops.PII_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{tok}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id, text || CASE doc_id % 4
    WHEN 0 THEN ' mail bob.smith@example.org now'
    WHEN 1 THEN ' dial +1 (415) 555-0199 today'
    WHEN 2 THEN ' host 10.20.30.40 is up'
    ELSE '' END AS text
  FROM documents),
red AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{pats['email']}')) AS BIGINT) AS n_emails,
    CAST(len(regexp_extract_all(text, '{pats['ipv4']}')) AS BIGINT) AS n_ipv4,
    CAST(len(regexp_extract_all(text, '{pats['phone']}')) AS BIGINT) AS n_phones,
    {chain} AS rt
  FROM planted)
SELECT doc_id, n_emails, n_ipv4, n_phones, {H60.format(x='rt')} AS redacted_hash
FROM red
"""


def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.document_fingerprints(_t(spark, sf_dir, 'documents'))


ORACLE_FINGERPRINTS = f"""
WITH ex AS (
  SELECT doc_id, pos, {H60.format(x='tok')} AS h
  FROM (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)))
SELECT doc_id,
       CAST(SUM(pos * (h % {MERSENNE31})) % {MERSENNE31} AS BIGINT) AS fp_weighted,
       CAST(bit_xor(h) AS BIGINT) AS fp_xor
FROM ex GROUP BY doc_id
"""


def q_text_corpus_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.corpus_freq_scores(_t(spark, sf_dir, 'documents'))


ORACLE_CORPUS_FREQ = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
total AS (SELECT SUM(cnt) AS total_toks FROM counts),
per AS (SELECT doc_id, (cnt * 1000000) // total_toks AS freq_ppm
        FROM tok JOIN counts USING (tok) CROSS JOIN total)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(freq_ppm) // COUNT(*) AS BIGINT) AS avg_token_freq_ppm,
       CAST(MIN(freq_ppm) AS BIGINT) AS min_token_freq_ppm
FROM per GROUP BY doc_id
"""


def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.tfidf_keywords(_t(spark, sf_dir, 'documents'), k=3)


ORACLE_TFIDF = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (SELECT doc_id, tok, tf * ((n_docs * 1000000) // df) AS score
           FROM tf JOIN dfreq USING (tok) CROSS JOIN nd),
ranked AS (SELECT doc_id, tok, score,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
           FROM scored)
SELECT doc_id, tok AS keyword, CAST(rank AS BIGINT) AS rank, CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= 3
"""


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM likelihood scores (CCNet-perplexity stand-in), model
    self-trained on the documents table; integer ppm end to end."""
    return textops.bigram_lm_scores(_t(spark, sf_dir, 'documents'))


def q_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic training-shard assignment, pinned by per-shard
    doc/token/char totals over 16 shards."""
    from scalpel_spark.operators import curation

    return curation.shard_stats(_t(spark, sf_dir, 'documents'), n_shards=16)


ORACLE_SHARD_STATS = f"""
WITH s AS (SELECT {hash60_sql('CAST(doc_id AS VARCHAR)')} % 16 AS shard,
                  len(string_split(text, ' ')) AS nt,
                  length(text) AS nc
           FROM documents)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(SUM(nc) AS BIGINT) AS total_chars
FROM s GROUP BY shard
"""


def q_url_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (pay-level domain) extraction + SURT keys over a
    deterministic synthetic host mix (multi-label public suffixes, deep
    subdomains, a suffix-less localhost) — the PLD politeness identity
    and the web-archive frontier sort key, both recomputed independently
    by the DuckDB twin."""
    from scalpel_spark.functions.urls import (
        registered_domain_col, surt_host_col, surt_key_col)

    d = F.col('doc_id')
    sub = (F.when(d % 3 == 0, F.lit('www.'))
           .when(d % 3 == 1, F.lit('a.b.')).otherwise(F.lit('')))
    suf = (F.when(d % 5 == 0, F.lit('.com'))
           .when(d % 5 == 1, F.lit('.co.uk'))
           .when(d % 5 == 2, F.lit('.org'))
           .when(d % 5 == 3, F.lit('.com.au')).otherwise(F.lit('.de')))
    host = F.when(d % 11 == 0, F.lit('localhost')).otherwise(
        F.concat(sub, F.lit('d'), (d % 7).cast('string'), suf))
    url = F.concat(F.lit('http://'), host, F.lit('/p/'), d.cast('string'), F.lit('/x'))
    g = (
        _t(spark, sf_dir, 'documents')
        .select(host.alias('host'), url.alias('url'))
        .groupBy('host')
        .agg(F.count('*').alias('n_urls'), F.min('url').alias('min_url'))
    )
    return g.select(
        'host',
        registered_domain_col(F.col('host')).alias('registered_domain'),
        surt_host_col(F.col('host')).alias('surt_host'),
        surt_key_col(F.col('min_url')).alias('surt_key'),
        'n_urls',
    )


def _suffix_list_sql() -> str:
    from scalpel_spark.functions.urls import MULTI_LABEL_SUFFIXES

    return '[' + ', '.join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES) + ']'


ORACLE_URL_REGISTERED_DOMAIN = f"""
WITH u AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN 'localhost' ELSE
           (CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'a.b.' ELSE '' END)
           || 'd' || CAST(doc_id % 7 AS VARCHAR)
           || (CASE doc_id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org'
                               WHEN 3 THEN '.com.au' ELSE '.de' END)
         END AS host, doc_id
  FROM documents),
g AS (SELECT host, COUNT(*) AS n_urls,
             MIN('http://' || host || '/p/' || CAST(doc_id AS VARCHAR) || '/x') AS min_url
      FROM u GROUP BY host),
l AS (SELECT host, n_urls, min_url, string_split(host, '.') AS labels FROM g)
SELECT host,
       CASE WHEN len(labels) <= 2 THEN host
            WHEN list_contains({{suffixes}}, labels[-2] || '.' || labels[-1])
              THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
            ELSE labels[-2] || '.' || labels[-1] END AS registered_domain,
       array_to_string(list_reverse(labels), ',') AS surt_host,
       array_to_string(list_reverse(labels), ',') || ')' ||
         coalesce(regexp_extract(min_url, '^[a-z]+://[^/]+(/[^?#]*)', 1), '/') AS surt_key,
       n_urls
FROM l
"""


def q_robots_rfc9309(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 wildcard robots matching end-to-end: real robots.txt TEXT
    is parsed + compiled once per host (operators/robots9309.rules_table),
    then every URL is decided map-side (match_urls — longest pattern wins,
    allow breaks ties, trailing $ anchors, query string defeats the
    anchor, missing group/row ⇒ allowed). The DuckDB twin re-makes every
    decision from the equivalent compiled-rule VALUES with RE2
    regexp_matches — so parse, translate, precedence, and target
    normalization are all oracle-checked. Beyond-reference: the
    reference's stdlib parser (any_io/robots.py:29) predates RFC 9309."""
    from scalpel_spark.operators.robots9309 import match_urls, rules_table

    d = F.col('doc_id')
    cls = (d % 3).cast('int')
    host = F.concat(F.lit('h'), (d % 5).cast('string'), F.lit('.c'),
                    cls.cast('string'), F.lit('.test'))
    path = (F.when(d % 7 == 0, F.concat(F.lit('/private/doc'), d.cast('string')))
            .when(d % 7 == 1, F.concat(F.lit('/private/pub'), d.cast('string')))
            .when(d % 7 == 2, F.concat(F.lit('/files/x'), d.cast('string'), F.lit('.php')))
            .when(d % 7 == 3, F.concat(F.lit('/x'), d.cast('string'), F.lit('.php')))
            .when(d % 7 == 4, F.concat(F.lit('/x'), d.cast('string'), F.lit('.php?v=1')))
            .when(d % 7 == 5, F.concat(F.lit('/open/'), d.cast('string')))
            .otherwise(F.lit('')))
    urls = (_t(spark, sf_dir, 'documents')
            .select(F.concat(F.lit('http://'), host, path).alias('url'),
                    host.alias('host')))
    robots_texts = [
        'User-agent: *\nDisallow: /private/\nAllow: /private/pub*',
        'User-agent: *\nDisallow: /*.php$\nAllow: /files/',
        'User-agent: otherbot\nDisallow: /',
    ]
    robots = spark.createDataFrame(
        [(f'h{h}.c{c}.test', robots_texts[c]) for h in range(5) for c in range(3)],
        'host string, rules string')
    rules = rules_table(robots, 'mybot')
    return (match_urls(urls, rules)
            .groupBy('host', 'rep_allowed')
            .agg(F.count('*').alias('n_urls'), F.min('url').alias('min_url')))


ORACLE_ROBOTS_RFC9309 = r"""
WITH u AS (
  SELECT 'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.c'
           || CAST(doc_id % 3 AS VARCHAR) || '.test' AS base,
         'h' || CAST(doc_id % 5 AS VARCHAR) || '.c'
           || CAST(doc_id % 3 AS VARCHAR) || '.test' AS host,
         CAST(doc_id % 3 AS INT) AS cls,
         CASE doc_id % 7
           WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
           WHEN 1 THEN '/private/pub' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN '/files/x' || CAST(doc_id AS VARCHAR) || '.php'
           WHEN 3 THEN '/x' || CAST(doc_id AS VARCHAR) || '.php'
           WHEN 4 THEN '/x' || CAST(doc_id AS VARCHAR) || '.php?v=1'
           WHEN 5 THEN '/open/' || CAST(doc_id AS VARCHAR)
           ELSE '' END AS path
  FROM documents),
rules(cls, rx, allow, plen) AS (VALUES
  (0, '^/private/', FALSE, 9), (0, '^/private/pub.*', TRUE, 13),
  (1, '^/.*\.php$', FALSE, 7), (1, '^/files/', TRUE, 7)),
t AS (
  SELECT DISTINCT cls, CASE WHEN path = '' THEN '/' ELSE path END AS target
  FROM u),
m AS (
  SELECT t.cls, t.target, r.allow,
         ROW_NUMBER() OVER (PARTITION BY t.cls, t.target
                            ORDER BY r.plen DESC, r.allow DESC) AS rn
  FROM t JOIN rules r ON r.cls = t.cls
  WHERE regexp_matches(t.target, r.rx)),
final AS (
  SELECT u.base || u.path AS url, u.host, COALESCE(m.allow, TRUE) AS rep_allowed
  FROM u LEFT JOIN m
    ON m.cls = u.cls
   AND m.target = (CASE WHEN u.path = '' THEN '/' ELSE u.path END)
   AND m.rn = 1)
SELECT host, rep_allowed, COUNT(*) AS n_urls, MIN(url) AS min_url
FROM final GROUP BY host, rep_allowed
"""


def q_url_resolve_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-lifted redirect-chain resolution (operators/redirects.py)
    over a deterministic synthetic redirect graph: chains up to 15 hops
    (every doc_id not ≡0 mod 16 redirects to doc_id-1), self-loops at
    multiples of 19, cap max_hops=6 — so the result mixes direct,
    resolved, loop-unresolved, and truncated-unresolved URLs with EXACT
    hop counts at a non-power-of-two cap. DuckDB twin: recursive CTE
    walking the same graph hop-by-hop."""
    from scalpel_spark.operators.redirects import resolve_redirects

    d = F.col('doc_id')
    as_url = lambda c: F.concat(F.lit('http://r.test/u/'), c.cast('string'))  # noqa: E731
    docs = _t(spark, sf_dir, 'documents')
    urls = docs.select(as_url(d).alias('url'))
    edges = (docs.filter((d % 19 == 0) | (d % 16 != 0))
             .select(as_url(d).alias('src'),
                     as_url(F.when(d % 19 == 0, d).otherwise(d - 1)).alias('dst')))
    out = resolve_redirects(urls, edges, max_hops=6)
    return out.groupBy('redirect_status', 'hops').agg(
        F.count('*').alias('n_urls'),
        F.min('url').alias('min_url'),
        F.min('final_url').alias('min_final'))


ORACLE_RESOLVE_REDIRECTS = """
WITH RECURSIVE
u AS (SELECT 'http://r.test/u/' || CAST(doc_id AS VARCHAR) AS url, doc_id AS d
      FROM documents),
e AS (SELECT 'http://r.test/u/' || CAST(d AS VARCHAR) AS src,
             'http://r.test/u/' ||
               CAST(CASE WHEN d % 19 = 0 THEN d ELSE d - 1 END AS VARCHAR) AS dst
      FROM (SELECT doc_id AS d FROM documents)
      WHERE d % 19 = 0 OR d % 16 <> 0),
walk(url, cur, hops) AS (
  SELECT url, url, 0 FROM u
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.cur
  WHERE w.hops < 6),
last AS (SELECT url, arg_max(cur, hops) AS final_url, MAX(hops) AS hops
         FROM walk GROUP BY url),
fin AS (SELECT l.url, l.final_url, l.hops,
               CASE WHEN EXISTS(SELECT 1 FROM e WHERE e.src = l.final_url)
                      THEN 'unresolved'
                    WHEN l.hops = 0 THEN 'direct'
                    ELSE 'resolved' END AS redirect_status
        FROM last l)
SELECT redirect_status, hops, COUNT(*) AS n_urls,
       MIN(url) AS min_url, MIN(final_url) AS min_final
FROM fin GROUP BY redirect_status, hops
"""


def q_url_rel_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical folding (operators/canonicals.fold_canonicals)
    over a deterministic synthetic declaration set: per doc_id d with
    host c((d div 25) % 4) — 1-hop folds (d≡1 mod 5 → d-1), 2-hop
    chains (d≡2 → d-1 → d-2), a planted 2-cycle (d≡16/21 mod 25, plus
    the chains entering it → unresolved at max_hops=4), cross-host
    hijack declarations (d≡3 mod 5 → x.test, DROPPED by the same-host
    policy → self), self-declarations (d≡4 → self), and no declaration
    (d≡0). DuckDB twin: recursive CTE over the same honored edge set."""
    from scalpel_spark.operators import canonicals

    d = F.col('d')
    u = lambda c: F.concat(  # noqa: E731
        F.lit('http://c'), (F.floor(c / 25).cast('long') % 4).cast('string'),
        F.lit('.test/p/'), c.cast('long').cast('string'))
    docs = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('d'))
    canon = (
        F.when(d % 25 == 16, u(d + 5))
        .when(d % 25 == 21, u(d - 5))
        .when((d % 5 == 1) | (d % 5 == 2), u(d - 1))
        .when(d % 5 == 3, F.concat(F.lit('http://x.test/p/'),
                                   d.cast('string')))
        .when(d % 5 == 4, u(d))
        .otherwise(F.lit(None).cast('string')))
    pages = docs.select(u(d).alias('url'), canon.alias('canonical'))
    out = canonicals.fold_canonicals(docs.select(u(d).alias('url')), pages,
                                     max_hops=4)
    return out.groupBy('canonical_status', 'hops').agg(
        F.count('*').alias('n_urls'),
        F.min('url').alias('min_url'),
        F.min('canonical_url').alias('min_canonical'))


# The honored edge set replicates the same-host policy's OUTCOME (the
# d≡3-mod-5 x.test declarations are the only cross-host ones, and the
# Spark side drops them via parse_url host equality): edges exist only
# for d≡1/2 mod 5 (with the d≡16/21-mod-25 cycle override).
ORACLE_REL_CANONICAL = """
WITH RECURSIVE
doc AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
u AS (SELECT d,
             'http://c' || ((d // 25) % 4) || '.test/p/' || d AS url
      FROM doc),
e AS (SELECT 'http://c' || ((d // 25) % 4) || '.test/p/' || d AS src,
             CASE
               WHEN d % 25 = 16 THEN 'http://c' || (((d + 5) // 25) % 4)
                                     || '.test/p/' || (d + 5)
               WHEN d % 25 = 21 THEN 'http://c' || (((d - 5) // 25) % 4)
                                     || '.test/p/' || (d - 5)
               ELSE 'http://c' || (((d - 1) // 25) % 4)
                    || '.test/p/' || (d - 1)
             END AS dst
      FROM doc
      WHERE d % 25 IN (16, 21) OR d % 5 IN (1, 2)),
walk(url, cur, hops) AS (
  SELECT url, url, 0 FROM u
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.cur
  WHERE w.hops < 4),
last AS (SELECT url, arg_max(cur, hops) AS canonical_url, MAX(hops) AS hops
         FROM walk GROUP BY url),
fin AS (SELECT l.url, l.canonical_url, l.hops,
               CASE WHEN EXISTS(SELECT 1 FROM e WHERE e.src = l.canonical_url)
                      THEN 'unresolved'
                    WHEN l.hops = 0 THEN 'self'
                    ELSE 'folded' END AS canonical_status
        FROM last l)
SELECT canonical_status, hops, COUNT(*) AS n_urls,
       MIN(url) AS min_url, MIN(canonical_url) AS min_canonical
FROM fin GROUP BY canonical_status, hops
"""


def q_fetch_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live-deployment fetch source (sources/fetcher.fetch_frontier):
    host-partitioned Arrow-batched mapInPandas with the deterministic
    fake fetcher (body = md5(url), status 404 iff the digest ends in
    'f', latency = first digest byte % 10 + 1) and per-host pacing slots
    (dispatch_ms = slot × delay × 1000 in priority order). The DuckDB
    twin recomputes every value from md5(url) + a per-host ROW_NUMBER —
    so batching, ordering, and pacing are all oracle-checked."""
    from scalpel_spark.sources.fetcher import fetch_frontier

    d = F.col('doc_id')
    frontier = _t(spark, sf_dir, 'documents').select(
        F.concat(F.lit('http://f'), (d % 7).cast('string'),
                 F.lit('.test/p/'), d.cast('string')).alias('url'),
        F.concat(F.lit('f'), (d % 7).cast('string'), F.lit('.test')).alias('host'),
        d.alias('priority'),
        (d % 3).cast('double').alias('delay'))
    fetched = fetch_frontier(frontier, delay_col='delay', n_partitions=4)
    return fetched.groupBy('host').agg(
        F.count('*').alias('n_urls'),
        F.sum(F.when(F.col('status') == 404, 1).otherwise(0)).alias('n_404'),
        F.sum('fetch_ms').alias('sum_fetch_ms'),
        F.sum('dispatch_ms').alias('sum_dispatch_ms'),
        F.countDistinct('body').alias('n_bodies'),
        F.min('body').alias('min_body'))


ORACLE_FETCH_MAPINPANDAS = """
WITH u AS (
  SELECT 'http://f' || CAST(doc_id % 7 AS VARCHAR) || '.test/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         'f' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host,
         doc_id AS priority,
         CAST(doc_id % 3 AS DOUBLE) AS delay
  FROM documents),
f AS (
  SELECT host, md5(url) AS body,
         CASE WHEN substr(md5(url), 32, 1) = 'f' THEN 404 ELSE 200 END AS status,
         CAST(CAST('0x' || substr(md5(url), 1, 2) AS INT) % 10 + 1 AS DOUBLE)
           AS fetch_ms,
         (ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority) - 1)
           * delay * 1000.0 AS dispatch_ms
  FROM u)
SELECT host, COUNT(*) AS n_urls,
       CAST(SUM(CASE WHEN status = 404 THEN 1 ELSE 0 END) AS BIGINT) AS n_404,
       SUM(fetch_ms) AS sum_fetch_ms,
       SUM(dispatch_ms) AS sum_dispatch_ms,
       COUNT(DISTINCT body) AS n_bodies,
       MIN(body) AS min_body
FROM f GROUP BY host
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style fixed-size token chunking with overlap (chunk=24,
    stride=16): every chunk's offset, length, and exact text pinned."""
    from scalpel_spark.operators import curation

    return curation.chunk_documents(
        _t(spark, sf_dir, 'documents'), chunk_tokens=24, overlap=8)


ORACLE_CHUNK_DOCUMENTS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
u AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM t
      WHERE len(toks) > 0),
s AS (SELECT doc_id, toks,
             unnest(range(0, n_tokens, 16)) AS start
      FROM u)
SELECT doc_id,
       CAST(start // 16 AS BIGINT) AS chunk_seq,
       CAST(start AS BIGINT) AS start,
       CAST(len(toks[start + 1 : start + 24]) AS BIGINT) AS chunk_len,
       array_to_string(toks[start + 1 : start + 24], ' ') AS chunk_text
FROM s
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 quantization parity, pinned per vector by integer aggregates
    of the quantized array (L1 and sum-of-squares) plus the ppb scale."""
    from scalpel_spark.operators import similarity as sim

    qz = sim.quantize_embeddings(_t(spark, sf_dir, 'embeddings'))
    zero = F.lit(0).cast('long')
    l1 = F.aggregate(F.transform('qvec', F.abs), zero, lambda a, v: a + v)
    sq = F.aggregate(F.transform('qvec', lambda v: v * v), zero, lambda a, v: a + v)
    return qz.select('vec_id', 'scale_ppb', 'dim',
                     l1.alias('q_l1'), sq.alias('q_sq'))


ORACLE_QUANTIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x, list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
q AS (SELECT vec_id,
        CASE WHEN mx = 0 THEN list_transform(x, v -> CAST(0 AS BIGINT))
             ELSE list_transform(x, v -> CAST(floor(v * 127.0 / mx + 0.5) AS BIGINT)) END AS qv,
        CASE WHEN mx = 0 THEN 0 ELSE CAST(floor(mx * 1000000000 / 127.0) AS BIGINT) END AS scale_ppb,
        len(x) AS dim
      FROM m)
SELECT vec_id, scale_ppb, CAST(dim AS BIGINT) AS dim,
       CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
       CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS q_sq
FROM q
"""


def q_similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scalpel_spark.operators import similarity as sim

    return sim.quantized_topk(_t(spark, sf_dir, 'embeddings'), n_queries=10, k=5)


ORACLE_QUANTIZED_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x, list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
q AS (SELECT vec_id,
        CASE WHEN mx = 0 THEN list_transform(x, v -> CAST(0 AS BIGINT))
             ELSE list_transform(x, v -> CAST(floor(v * 127.0 / mx + 0.5) AS BIGINT)) END AS qv,
        CASE WHEN mx = 0 THEN 0 ELSE CAST(floor(mx * 1000000000 / 127.0) AS BIGINT) END AS scale_ppb
      FROM m),
qq AS (SELECT vec_id AS query_id, qv AS a FROM q WHERE vec_id < 10),
cc AS (SELECT vec_id AS neighbor_id, qv AS b, scale_ppb FROM q),
dots AS (SELECT query_id, neighbor_id,
           CAST(list_sum(list_transform(generate_series(1, len(a)), i -> a[i] * b[i])) AS BIGINT)
             * scale_ppb AS score
         FROM qq JOIN cc ON query_id != neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM dots)
WHERE rank <= 5
"""


def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion parity: both engines synthesize identical
    per-source sitemap XML (CDATA every 5th loc, lastmod every 3rd entry,
    plus one sitemapindex page over all sources) from the documents
    table, then parse it back to (sitemap_url, pos, loc, lastmod,
    is_index) — pinning the block/loc/lastmod/CDATA regex semantics
    byte-for-byte."""
    from scalpel_spark.operators import sitemap

    docs = _t(spark, sf_dir, 'documents')
    u = F.concat(F.lit('https://'), F.col('source'),
                 F.lit('.example.com/doc/'), F.col('doc_id').cast('string'))
    frag = F.concat(
        F.lit('<url><loc>'),
        F.when(F.col('doc_id') % 5 == 0,
               F.concat(F.lit('<![CDATA['), u, F.lit(']]>'))).otherwise(u),
        F.lit('</loc>'),
        F.when(
            F.col('doc_id') % 3 == 0,
            F.concat(F.lit('<lastmod>2026-01-'),
                     F.lpad((F.col('doc_id') % 28 + 1).cast('string'), 2, '0'),
                     F.lit('</lastmod>')),
        ).otherwise(F.lit('')),
        F.lit('</url>'),
    )
    per_source = (
        docs.select('source', F.struct('doc_id', frag.alias('frag')).alias('s'))
        .groupBy('source')
        .agg(F.array_sort(F.collect_list('s')).alias('frags'))
        .select(
            F.concat(F.lit('https://'), F.col('source'),
                     F.lit('.example.com/sitemap.xml')).alias('url'),
            F.concat(
                F.lit('<urlset>'),
                F.concat_ws('', F.transform('frags', lambda s: s['frag'])),
                F.lit('</urlset>'),
            ).alias('body'),
        )
    )
    index = (
        docs.select('source').distinct()
        .groupBy()
        .agg(F.array_sort(F.collect_list('source')).alias('srcs'))
        .select(
            F.lit('https://index.example.com/sitemap_index.xml').alias('url'),
            F.concat(
                F.lit('<sitemapindex>'),
                F.concat_ws('', F.transform(
                    'srcs',
                    lambda s: F.concat(F.lit('<sitemap><loc>https://'), s,
                                       F.lit('.example.com/sitemap.xml</loc></sitemap>')))),
                F.lit('</sitemapindex>'),
            ).alias('body'),
        )
    )
    return sitemap.sitemap_entries(per_source.unionByName(index))


ORACLE_SITEMAP = r"""
WITH d AS (SELECT doc_id, source,
                  'https://' || source || '.example.com/doc/' || doc_id AS u
           FROM documents),
frag AS (SELECT doc_id, source,
  '<url><loc>' ||
  CASE WHEN doc_id % 5 = 0 THEN '<![CDATA[' || u || ']]>' ELSE u END ||
  '</loc>' ||
  CASE WHEN doc_id % 3 = 0
       THEN '<lastmod>2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod>'
       ELSE '' END || '</url>' AS f
  FROM d),
pages AS (
  SELECT 'https://' || source || '.example.com/sitemap.xml' AS url,
         '<urlset>' || string_agg(f, '' ORDER BY doc_id) || '</urlset>' AS body
  FROM frag GROUP BY source
  UNION ALL
  SELECT 'https://index.example.com/sitemap_index.xml',
         '<sitemapindex>' || string_agg(
           '<sitemap><loc>https://' || source || '.example.com/sitemap.xml</loc></sitemap>',
           '' ORDER BY source) || '</sitemapindex>'
  FROM (SELECT DISTINCT source FROM documents)),
blocks AS (SELECT url AS sitemap_url,
                  body LIKE '%<sitemapindex%' AS is_index,
                  regexp_extract_all(body, '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1) AS bl
           FROM pages),
exploded AS (SELECT sitemap_url, is_index, bl,
                    UNNEST(generate_series(1, len(bl))) AS i
             FROM blocks),
parsed AS (SELECT sitemap_url, CAST(i - 1 AS BIGINT) AS pos,
                  regexp_replace(trim(regexp_extract(bl[i], '(?s)<loc>\s*(.*?)\s*</loc>', 1)),
                                 '^<!\[CDATA\[|\]\]>$', '', 'g') AS loc,
                  regexp_extract(bl[i], '<lastmod>\s*([^<]*?)\s*</lastmod>', 1) AS lastmod,
                  is_index
           FROM exploded)
SELECT sitemap_url, pos, loc, lastmod, is_index FROM parsed WHERE loc != ''
"""


ORACLE_BIGRAM_LM = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bg AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
       FROM (SELECT doc_id, l, UNNEST(generate_series(1, len(l) - 1)) AS i FROM tk)),
bgc AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY w1, w2),
pfx AS (SELECT w1, SUM(cnt) AS pfx_cnt FROM bgc GROUP BY w1),
per AS (SELECT doc_id, (cnt * 1000000) // pfx_cnt AS cond_ppm
        FROM bg JOIN bgc USING (w1, w2) JOIN pfx USING (w1))
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(cond_ppm) // COUNT(*) AS BIGINT) AS avg_cond_ppm,
       CAST(MIN(cond_ppm) AS BIGINT) AS min_cond_ppm
FROM per GROUP BY doc_id
"""


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank over a deterministic hash-derived host graph
    (N = |documents| hosts, 3 pseudo-random out-links each, self-loops
    dropped). Both engines construct the identical graph from the same
    md5 formula, so the oracle recomputes the ranks independently —
    no pinned constants."""
    n = _t(spark, sf_dir, 'documents').count()
    e = spark.range(n).select(
        F.col('id').alias('src'),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias('j'),
    )
    dst = F.pmod(
        hash60(F.concat(F.col('src').cast('string'), F.lit('-'),
                        F.col('j').cast('string'))),
        F.lit(n),
    )
    edges = e.select('src', dst.alias('dst')).filter(F.col('dst') != F.col('src'))
    return graphrank.host_rank(edges, iters=3)


def _host_rank_cte(iters: int, damping_pct: int = 85) -> str:
    """DuckDB twin of graphrank.host_rank over the hash-derived graph,
    unrolled: integer ppb arithmetic, mass from dangling hosts and
    flooring NOT redistributed."""
    tp = f'({1_000_000_000 * (100 - damping_pct) // 100}) // nn.n'
    parts = [f"""nh AS (SELECT COUNT(*) AS n FROM documents),
raw AS (SELECT src, j
        FROM (SELECT unnest(range((SELECT n FROM nh))) AS src)
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
edges AS (SELECT * FROM (
    SELECT src,
           {H60.format(x="CAST(src AS VARCHAR) || '-' || CAST(j AS VARCHAR)")}
             % (SELECT n FROM nh) AS dst
    FROM raw) WHERE dst != src),
nodes AS (SELECT DISTINCT host FROM (
    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT host, 1000000000 // nn.n AS rank_ppb FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        parts.append(f"""r{i} AS (
  SELECT nodes.host,
         CAST(({tp}) + ({damping_pct} * COALESCE(insum.s, 0)) // 100 AS BIGINT) AS rank_ppb
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS host, SUM(r.rank_ppb // o.outdeg) AS s
             FROM edges e JOIN r{i - 1} r ON e.src = r.host
                          JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) insum ON nodes.host = insum.host)""")
    return ',\n'.join(parts)


ORACLE_HOST_RANK = f"""
WITH {_host_rank_cte(3)}
SELECT host, rank_ppb FROM r3
"""


def q_plan_host_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder budget allocation composed over the host_rank
    query's deterministic graph: 100k fetch slots divided proportionally
    to rank, allocations integer and summing exactly to the budget."""
    from scalpel_spark.operators import scheduling

    return scheduling.plan_host_budgets(q_host_rank(spark, sf_dir), 100_000)


ORACLE_PLAN_BUDGETS = f"""
WITH {_host_rank_cte(3)},
ranks AS (SELECT host, rank_ppb FROM r3),
tot AS (SELECT SUM(rank_ppb) AS t FROM ranks),
based AS (SELECT host, rank_ppb,
                 (100000 * rank_ppb) // t AS base,
                 (100000 * rank_ppb) % t AS rem
          FROM ranks CROSS JOIN tot),
lo AS (SELECT 100000 - SUM(base) AS leftover FROM based),
rn AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC) AS rn FROM based)
SELECT host, rank_ppb,
       CAST(base + CASE WHEN rn <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END
            AS BIGINT) AS budget
FROM rn
"""


def q_host_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (graphrank.trust_rank) over the SAME hash-derived host
    graph as the host_rank query, teleport restricted to the trusted
    tenth of the hosts (host % 10 == 0) — the link-spam demotion signal.
    Both engines construct graph + trusted set from the same formulas and
    recompute the integer-ppb trust independently — no pinned
    constants."""
    n = _t(spark, sf_dir, 'documents').count()
    e = spark.range(n).select(
        F.col('id').alias('src'),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias('j'),
    )
    dst = F.pmod(
        hash60(F.concat(F.col('src').cast('string'), F.lit('-'),
                        F.col('j').cast('string'))),
        F.lit(n),
    )
    edges = e.select('src', dst.alias('dst')).filter(F.col('dst') != F.col('src'))
    trusted = spark.range(0, n, 10).select(F.col('id').alias('host'))
    return graphrank.trust_rank(edges, trusted, iters=3)


def _trust_rank_cte(iters: int, damping_pct: int = 85) -> str:
    """DuckDB twin of graphrank.trust_rank over the hash-derived graph:
    same edges as _host_rank_cte, teleport mass only to host % 10 == 0
    (every host id is < n, so the modulus IS the membership test)."""
    tp = f'({1_000_000_000 * (100 - damping_pct) // 100}) // tn.t'
    parts = [f"""nh AS (SELECT COUNT(*) AS n FROM documents),
raw AS (SELECT src, j
        FROM (SELECT unnest(range((SELECT n FROM nh))) AS src)
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
edges AS (SELECT * FROM (
    SELECT src,
           {H60.format(x="CAST(src AS VARCHAR) || '-' || CAST(j AS VARCHAR)")}
             % (SELECT n FROM nh) AS dst
    FROM raw) WHERE dst != src),
trusted AS (SELECT host FROM (
    SELECT unnest(range((SELECT n FROM nh))) AS host) WHERE host % 10 = 0),
nodes AS (SELECT DISTINCT host FROM (
    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges
    UNION ALL SELECT host FROM trusted)),
tn AS (SELECT COUNT(*) AS t FROM trusted),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
t0 AS (SELECT host, CASE WHEN host % 10 = 0 THEN 1000000000 // tn.t
                         ELSE 0 END AS trust_ppb
       FROM nodes CROSS JOIN tn)"""]
    for i in range(1, iters + 1):
        parts.append(f"""t{i} AS (
  SELECT nodes.host,
         CAST((CASE WHEN nodes.host % 10 = 0 THEN {tp} ELSE 0 END)
              + ({damping_pct} * COALESCE(insum.s, 0)) // 100 AS BIGINT)
           AS trust_ppb
  FROM nodes CROSS JOIN tn
  LEFT JOIN (SELECT e.dst AS host, SUM(r.trust_ppb // o.outdeg) AS s
             FROM edges e JOIN t{i - 1} r ON e.src = r.host
                          JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) insum ON nodes.host = insum.host)""")
    return ',\n'.join(parts)


ORACLE_HOST_TRUST_RANK = f"""
WITH {_trust_rank_cte(3)}
SELECT host, trust_ppb FROM t3
"""


def _hash_edges(spark: SparkSession, sf_dir: str):
    """The deterministic 3-out-edge host graph shared by the rank-family
    queries (host_rank / trust_rank / hits / opic): dst = h60(src-j) mod
    n over the documents row count, self-loops dropped."""
    n = _t(spark, sf_dir, 'documents').count()
    e = spark.range(n).select(
        F.col('id').alias('src'),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias('j'),
    )
    dst = F.pmod(
        hash60(F.concat(F.col('src').cast('string'), F.lit('-'),
                        F.col('j').cast('string'))),
        F.lit(n),
    )
    return n, e.select('src', dst.alias('dst')).filter(
        F.col('dst') != F.col('src'))


_EDGES_CTE = f"""nh AS (SELECT COUNT(*) AS n FROM documents),
rawe AS (SELECT src, j
        FROM (SELECT unnest(range((SELECT n FROM nh))) AS src)
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
edges AS (SELECT * FROM (
    SELECT src,
           {H60.format(x="CAST(src AS VARCHAR) || '-' || CAST(j AS VARCHAR)")}
             % (SELECT n FROM nh) AS dst
    FROM rawe) WHERE dst != src)"""


def q_host_anti_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-TrustRank (graphrank.anti_trust_rank, Krishnan & Raj AIRWeb
    2006) over the shared hash-derived host graph: TrustRank on the
    REVERSED edges seeded with the known-spam seventh of hosts
    (host % 7 == 3) — spam score flows backwards along in-links, tagging
    the hosts that link INTO the spam neighbourhood.  Both engines
    recompute the integer-ppb scores independently — no pinned
    constants."""
    n, edges = _hash_edges(spark, sf_dir)
    spam = spark.range(3, n, 7).select(F.col('id').alias('host'))
    return graphrank.anti_trust_rank(edges, spam, iters=3)


def _anti_trust_cte(iters: int, damping_pct: int = 85) -> str:
    """DuckDB twin of graphrank.anti_trust_rank: the trust recursion of
    _trust_rank_cte run over REVERSED edges with spam seeds
    host % 7 == 3."""
    tp = f'({1_000_000_000 * (100 - damping_pct) // 100}) // tn.t'
    parts = [_EDGES_CTE + f""",
redges AS (SELECT dst AS src, src AS dst FROM edges),
spam AS (SELECT host FROM (
    SELECT unnest(range((SELECT n FROM nh))) AS host) WHERE host % 7 = 3),
nodes AS (SELECT DISTINCT host FROM (
    SELECT src AS host FROM redges UNION ALL SELECT dst FROM redges
    UNION ALL SELECT host FROM spam)),
tn AS (SELECT COUNT(*) AS t FROM spam),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM redges GROUP BY src),
t0 AS (SELECT host, CASE WHEN host % 7 = 3 THEN 1000000000 // tn.t
                         ELSE 0 END AS trust_ppb
       FROM nodes CROSS JOIN tn)"""]
    for i in range(1, iters + 1):
        parts.append(f"""t{i} AS (
  SELECT nodes.host,
         CAST((CASE WHEN nodes.host % 7 = 3 THEN {tp} ELSE 0 END)
              + ({damping_pct} * COALESCE(insum.s, 0)) // 100 AS BIGINT)
           AS trust_ppb
  FROM nodes CROSS JOIN tn
  LEFT JOIN (SELECT e.dst AS host, SUM(r.trust_ppb // o.outdeg) AS s
             FROM redges e JOIN t{i - 1} r ON e.src = r.host
                          JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) insum ON nodes.host = insum.host)""")
    return ',\n'.join(parts)


ORACLE_ANTI_TRUST = f"""
WITH {_anti_trust_cte(3)}
SELECT host, trust_ppb AS spam_ppb FROM t3
"""


def q_host_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass (graphrank.spam_mass, Gyöngyi et al. VLDB
    2006): the ppm fraction of each host's PageRank not covered by its
    TrustRank (trusted tenth, host % 10 == 0) — high rank with low trust
    is the spam-farm signature.  Composes the two rank queries' exact
    integer pipelines; the oracle re-derives both and the mass quotient
    independently."""
    n, edges = _hash_edges(spark, sf_dir)
    trusted = spark.range(0, n, 10).select(F.col('id').alias('host'))
    rank = graphrank.host_rank(edges, iters=3)
    trust = graphrank.trust_rank(edges, trusted, iters=3)
    return graphrank.spam_mass(rank, trust)


def _spam_mass_trust_recursion(iters: int, damping_pct: int = 85) -> str:
    """Trust recursion (trusted tenth) sharing _host_rank_cte's
    edges/nodes/outdeg CTEs — t0..t{iters} on top of the rank CTEs."""
    tp = f'({1_000_000_000 * (100 - damping_pct) // 100}) // tn.t'
    parts = [f"""tn AS (SELECT COUNT(*) AS t FROM (
    SELECT unnest(range((SELECT n FROM nh))) AS host) WHERE host % 10 = 0),
t0 AS (SELECT host, CASE WHEN host % 10 = 0 THEN 1000000000 // tn.t
                         ELSE 0 END AS trust_ppb
       FROM nodes CROSS JOIN tn)"""]
    for i in range(1, iters + 1):
        parts.append(f"""t{i} AS (
  SELECT nodes.host,
         CAST((CASE WHEN nodes.host % 10 = 0 THEN {tp} ELSE 0 END)
              + ({damping_pct} * COALESCE(insum.s, 0)) // 100 AS BIGINT)
           AS trust_ppb
  FROM nodes CROSS JOIN tn
  LEFT JOIN (SELECT e.dst AS host, SUM(r.trust_ppb // o.outdeg) AS s
             FROM edges e JOIN t{i - 1} r ON e.src = r.host
                          JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) insum ON nodes.host = insum.host)""")
    return ',\n'.join(parts)


ORACLE_SPAM_MASS = f"""
WITH {_host_rank_cte(3)},
{_spam_mass_trust_recursion(3)}
SELECT r3.host, r3.rank_ppb,
       CAST(COALESCE(t3.trust_ppb, 0) AS BIGINT) AS trust_ppb,
       CASE WHEN r3.rank_ppb <= 0 THEN 0
            ELSE CAST(CAST(r3.rank_ppb
                           - LEAST(COALESCE(t3.trust_ppb, 0), r3.rank_ppb)
                           AS HUGEINT) * 1000000 // r3.rank_ppb AS BIGINT)
       END AS mass_ppm
FROM r3 LEFT JOIN t3 ON r3.host = t3.host
"""


def q_link_spam_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/linkspam.link_spam_features — per-host structural spam
    features (Becchetti et al. TWEB 2008 family): distinct counterparty
    fan-out/in, link volumes, reciprocity ppm (link exchanges) and
    self-citation ppm.  The graph here KEEPS self-loops (dst may equal
    src in the hash formula) so self_ppm is exercised.  One groupBy per
    direction + one left-semi reciprocity join on the reversed pair key;
    integral-div ppm.  Full recomputing oracle."""
    from scalpel_spark.operators.linkspam import link_spam_features

    n = _t(spark, sf_dir, 'documents').count()
    e = spark.range(n).select(
        F.col('id').alias('src'),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias('j'),
    )
    dst = F.pmod(
        hash60(F.concat(F.col('src').cast('string'), F.lit('-'),
                        F.col('j').cast('string'))),
        F.lit(n),
    )
    return link_spam_features(e.select('src', dst.alias('dst')))


ORACLE_LINK_SPAM = f"""
WITH nh AS (SELECT COUNT(*) AS n FROM documents),
rawe AS (SELECT src, j
        FROM (SELECT unnest(range((SELECT n FROM nh))) AS src)
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
alledges AS (
    SELECT src,
           {H60.format(x="CAST(src AS VARCHAR) || '-' || CAST(j AS VARCHAR)")}
             % (SELECT n FROM nh) AS dst
    FROM rawe),
pairs AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
          FROM alledges GROUP BY src, dst),
recip AS (SELECT p.src, CAST(COUNT(*) AS BIGINT) AS n_recip
          FROM pairs p
          WHERE p.src != p.dst AND EXISTS (
              SELECT 1 FROM pairs b WHERE b.src = p.dst AND b.dst = p.src)
          GROUP BY p.src),
outs AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_hosts,
                CAST(SUM(w) AS BIGINT) AS out_links,
                CAST(SUM(CASE WHEN src = dst THEN w ELSE 0 END) AS BIGINT)
                  AS self_links,
                CAST(SUM(CASE WHEN src != dst THEN 1 ELSE 0 END) AS BIGINT)
                  AS out_nonself
         FROM pairs GROUP BY src),
ins AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_hosts,
               CAST(SUM(w) AS BIGINT) AS in_links
        FROM pairs GROUP BY dst),
hosts AS (SELECT DISTINCT host FROM (
    SELECT src AS host FROM pairs UNION ALL SELECT dst FROM pairs))
SELECT h.host,
       CAST(COALESCE(o.out_hosts, 0) AS BIGINT) AS out_hosts,
       CAST(COALESCE(i.in_hosts, 0) AS BIGINT) AS in_hosts,
       CAST(COALESCE(o.out_links, 0) AS BIGINT) AS out_links,
       CAST(COALESCE(i.in_links, 0) AS BIGINT) AS in_links,
       CASE WHEN COALESCE(o.out_nonself, 0) = 0 THEN 0
            ELSE CAST(CAST(COALESCE(r.n_recip, 0) AS HUGEINT) * 1000000
                      // o.out_nonself AS BIGINT) END AS reciprocal_ppm,
       CASE WHEN COALESCE(o.out_links, 0) = 0 THEN 0
            ELSE CAST(CAST(COALESCE(o.self_links, 0) AS HUGEINT) * 1000000
                      // o.out_links AS BIGINT) END AS self_ppm
FROM hosts h
LEFT JOIN outs o ON h.host = o.src
LEFT JOIN ins i ON h.host = i.dst
LEFT JOIN recip r ON h.host = r.src
"""


def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer HITS (graphrank.hits) over the same hash-derived host
    graph as host_rank: mutually-reinforcing hub/authority scores with
    exact decimal L1 normalization each half-step. Both engines unroll
    the same integer arithmetic — no pinned constants."""
    _, edges = _hash_edges(spark, sf_dir)
    return graphrank.hits(edges, iters=2)


def _hits_cte(iters: int) -> str:
    """DuckDB twin of graphrank.hits: HUGEINT reproduces the DECIMAL
    multiply, // the FLOOR-division, bit for bit."""
    parts = [_EDGES_CTE + """,
nodes AS (SELECT DISTINCT host FROM (
    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
hub0 AS (SELECT host, CAST(1000000000 AS BIGINT) AS hub FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f"""araw{i} AS (
  SELECT nodes.host, COALESCE(t.s, 0) AS raw FROM nodes
  LEFT JOIN (SELECT e.dst AS host, SUM(h.hub) AS s
             FROM edges e JOIN hub{i - 1} h ON e.src = h.host
             GROUP BY e.dst) t ON nodes.host = t.host),
auth{i} AS (
  SELECT host, CAST((raw::HUGEINT * 1000000000)
      // (SELECT GREATEST(1, SUM(raw)) FROM araw{i}) AS BIGINT) AS auth
  FROM araw{i}),
hraw{i} AS (
  SELECT nodes.host, COALESCE(t.s, 0) AS raw FROM nodes
  LEFT JOIN (SELECT e.src AS host, SUM(a.auth) AS s
             FROM edges e JOIN auth{i} a ON e.dst = a.host
             GROUP BY e.src) t ON nodes.host = t.host),
hub{i} AS (
  SELECT host, CAST((raw::HUGEINT * 1000000000)
      // (SELECT GREATEST(1, SUM(raw)) FROM hraw{i}) AS BIGINT) AS hub
  FROM hraw{i})""")
    return ',\n'.join(parts)


ORACLE_HOST_HITS = f"""
WITH {_hits_cte(2)}
SELECT a.host, a.auth AS auth_ppb, h.hub AS hub_ppb
FROM auth2 a JOIN hub2 h ON a.host = h.host
"""


def q_host_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC incremental importance (graphrank.opic_init/opic_update)
    over the shared hash-derived graph: two crawl waves — wave 1 fetches
    hosts ≡0 (mod 2), wave 2 hosts ≡0 (mod 3) — each banking the fetched
    hosts' cash into history and distributing it along out-edges, with
    dangling cash redistributed uniformly. Both engines replay the same
    integer-ppb updates independently."""
    n, edges = _hash_edges(spark, sf_dir)
    state = graphrank.opic_init(
        spark.range(n).select(F.col('id').alias('host')))
    for mod in (2, 3):
        fetched = spark.range(n).filter(F.col('id') % mod == 0).select(
            F.col('id').alias('host'))
        state = graphrank.opic_update(state, edges, fetched)
    return state


def _opic_cte(mods) -> str:
    """DuckDB twin of two opic_update waves. The node set stays range(n)
    every wave (dsts are mod-n, fetched ⊆ range(n)), so the uniform
    dangling share divides by the constant n."""
    parts = [_EDGES_CTE + """,
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
s0 AS (SELECT host,
              CAST(1000000000 // (SELECT n FROM nh) AS BIGINT) AS cash,
              CAST(0 AS BIGINT) AS hist
       FROM (SELECT unnest(range((SELECT n FROM nh))) AS host))"""]
    for k, m in enumerate(mods, start=1):
        parts.append(f"""c{k} AS (
  SELECT e.dst AS host, SUM(s.cash // o.outdeg) AS insum
  FROM edges e
  JOIN s{k - 1} s ON e.src = s.host AND e.src % {m} = 0
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
p{k} AS (SELECT COALESCE(SUM(cash), 0) AS pot FROM s{k - 1}
         WHERE host % {m} = 0
           AND host NOT IN (SELECT src FROM edges)),
s{k} AS (
  SELECT s.host,
         CAST(CASE WHEN s.host % {m} = 0 THEN 0 ELSE s.cash END
              + COALESCE(c.insum, 0)
              + (SELECT pot FROM p{k}) // (SELECT n FROM nh)
              AS BIGINT) AS cash,
         CAST(s.hist + CASE WHEN s.host % {m} = 0 THEN s.cash ELSE 0 END
              AS BIGINT) AS hist
  FROM s{k - 1} s LEFT JOIN c{k} c ON s.host = c.host)""")
    return ',\n'.join(parts)


ORACLE_HOST_OPIC = f"""
WITH {_opic_cte((2, 3))}
SELECT host, cash AS cash_ppb, hist AS hist_ppb FROM s2
"""


def _dust_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DUST evidence: per documents row r, three fetched
    URLs on host h(r%5).test path /p(r%7) — A=?id&sess, B=?id, C=?sess.
    The content signature ignores sess on EVEN hosts (A and B agree →
    sess is provably ignorable there) but includes it on ODD hosts
    (counterexample kills the rule); C's unique signature kills any
    'id is ignorable' rule everywhere."""
    r = F.col('r')
    u = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('r'))
    host = F.concat(F.lit('h'), (r % 5).cast('string'), F.lit('.test'))
    base = F.concat(F.lit('https://'), host, F.lit('/p'),
                    (r % 7).cast('string'))
    sess = F.concat(F.lit('s'), r.cast('string'))
    idv = (r % 3).cast('string')
    content = F.concat(F.lit('c|'), host, F.lit('|'), (r % 7).cast('string'),
                       F.lit('|'), idv, F.lit('|'))
    a = u.select(
        F.concat(base, F.lit('?id='), idv, F.lit('&sess='), sess).alias('url'),
        hash60(F.concat(content, F.when((r % 5) % 2 == 1, sess)
                        .otherwise(F.lit('')))).alias('sig'))
    b = u.select(
        F.concat(base, F.lit('?id='), idv).alias('url'),
        hash60(content).alias('sig'))
    c = u.select(
        F.concat(base, F.lit('?sess='), sess).alias('url'),
        hash60(F.concat(F.lit('noid|'), r.cast('string'))).alias('sig'))
    return a.unionByName(b).unionByName(c)


_DUST_DOCS_CTE = f"""du AS (SELECT CAST(doc_id AS BIGINT) AS r FROM documents),
dq AS (SELECT r, 'h' || (r % 5) || '.test' AS host,
              'https://h' || (r % 5) || '.test/p' || (r % 7) AS base,
              r % 7 AS pn, r % 3 AS idv, 's' || r AS sess,
              r % 5 AS hn
       FROM du),
ddocs AS (
  SELECT base || '?id=' || idv || '&sess=' || sess AS url,
         {H60.format(x="'c|' || host || '|' || pn || '|' || idv || '|' || CASE WHEN hn % 2 = 1 THEN sess ELSE '' END")} AS sig
  FROM dq
  UNION ALL
  SELECT base || '?id=' || idv AS url,
         {H60.format(x="'c|' || host || '|' || pn || '|' || idv || '|'")} AS sig
  FROM dq
  UNION ALL
  SELECT base || '?sess=' || sess AS url,
         {H60.format(x="'noid|' || r")} AS sig
  FROM dq),
dparsed AS (
  SELECT url, sig,
         split_part(split_part(url, '://', 2), '/', 1) AS host,
         '/' || split_part(split_part(split_part(url, '://', 2), '?', 1),
                           '/', 2) AS path,
         CASE WHEN contains(url, '?')
              THEN list_filter(string_split(split_part(url, '?', 2), '&'),
                               x -> x != '')
              ELSE [] END AS ps
  FROM ddocs),
dbases AS (SELECT host, path,
                  array_to_string(list_sort(ps), '&') AS residual,
                  sig AS sig_twin
           FROM dparsed),
dcands AS (
  SELECT host, path, sig,
         array_to_string(list_sort(list_filter(
             ps, x -> split_part(x, '=', 1) != param)), '&') AS residual,
         param
  FROM (SELECT host, path, sig, ps,
               unnest(list_distinct(list_transform(
                   ps, x -> split_part(x, '=', 1)))) AS param
        FROM dparsed WHERE len(ps) > 0)),
drules AS (
  SELECT host, param,
         SUM(CASE WHEN c.sig = b.sig_twin THEN 1 ELSE 0 END) AS support,
         SUM(CASE WHEN c.sig != b.sig_twin THEN 1 ELSE 0 END) AS cx
  FROM dcands c JOIN dbases b USING (host, path, residual)
  GROUP BY host, param)"""


def q_url_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule mining (dust.mine_param_rules): learn per-host
    ignorable query params from content-duplicate evidence. Both engines
    parse the same synthetic URLs and roll the twin-pair votes up
    independently — rules must have zero counterexamples."""
    from scalpel_spark.operators import dust

    return dust.mine_param_rules(_dust_docs(spark, sf_dir), min_support=2)


ORACLE_DUST_RULES = f"""
WITH {_DUST_DOCS_CTE}
SELECT host, param, CAST(support AS BIGINT) AS support
FROM drules WHERE support >= 2 AND cx = 0
"""


def q_url_dust_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule application (dust.strip_params): the mined rules
    rewrite the ?id&sess URLs — sess drops on even hosts (rule holds),
    odd hosts stay byte-identical (counterexample blocked the rule),
    surviving params keep their original order."""
    from scalpel_spark.operators import dust

    docs = _dust_docs(spark, sf_dir)
    rules = dust.mine_param_rules(docs, min_support=2)
    frontier = docs.filter(F.col('url').contains('&sess=')).select('url')
    return dust.strip_params(frontier, rules)


ORACLE_DUST_STRIP = f"""
WITH {_DUST_DOCS_CTE},
dsess AS (SELECT DISTINCT host FROM drules
          WHERE param = 'sess' AND support >= 2 AND cx = 0),
dfront AS (SELECT url, host, ps FROM dparsed WHERE contains(url, '&sess=')),
dkept AS (
  SELECT url, host,
         list_filter(ps, x -> split_part(x, '=', 1) != 'sess') AS keep
  FROM dfront)
SELECT CASE WHEN host IN (SELECT host FROM dsess)
            THEN split_part(url, '?', 1) ||
                 CASE WHEN len(keep) > 0
                      THEN '?' || array_to_string(keep, '&')
                      ELSE '' END
            ELSE url END AS url
FROM dkept
"""


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection (mirrors.mirror_pairs) over a synthetic
    20-host corpus where host m(i) and m(i+10) serve identical content
    sets, ODD hosts additionally serve unique pages (so their mirror
    containment is 500000 ppm vs the even pairs' 10^6), and a
    boilerplate signature on all 20 hosts is dropped by the df cap.
    Both engines rebuild profiles and recompute containment."""
    from scalpel_spark.operators import mirrors

    r = F.col('r')
    u = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('r'))
    host = F.concat(F.lit('m'), (r % 20).cast('string'))
    a = u.select(host.alias('host'), hash60(F.concat(
        F.lit('mc|'), (r % 10).cast('string'), F.lit('|'),
        F.expr('r div 20').cast('string'))).alias('sig'))
    b = u.filter((r % 20) % 2 == 1).select(
        host.alias('host'),
        hash60(F.concat(F.lit('extra|'), r.cast('string'))).alias('sig'))
    c = u.select(host.alias('host'), hash60(F.lit('boiler')).alias('sig'))
    docs = a.unionByName(b).unionByName(c)
    return mirrors.mirror_pairs(docs, min_overlap_ppm=400_000, df_cap=10)


ORACLE_MIRROR_HOSTS = f"""
WITH mr AS (SELECT CAST(doc_id AS BIGINT) AS r FROM documents),
md AS (
  SELECT 'm' || (r % 20) AS host,
         {H60.format(x="'mc|' || (r % 10) || '|' || CAST(r // 20 AS VARCHAR)")} AS sig
  FROM mr
  UNION ALL
  SELECT 'm' || (r % 20),
         {H60.format(x="'extra|' || r")}
  FROM mr WHERE (r % 20) % 2 = 1
  UNION ALL
  SELECT 'm' || (r % 20), {H60.format(x="'boiler'")} FROM mr),
mprof AS (SELECT DISTINCT host, sig FROM md),
mcap AS (SELECT * FROM mprof WHERE sig IN (
    SELECT sig FROM mprof GROUP BY sig HAVING COUNT(*) <= 10)),
msizes AS (SELECT host, COUNT(*) AS n FROM mcap GROUP BY host),
mpairs AS (SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
           FROM mcap a JOIN mcap b ON a.sig = b.sig AND a.host < b.host
           GROUP BY a.host, b.host)
SELECT host_a, host_b, CAST(shared AS BIGINT) AS shared,
       CAST(sa.n AS BIGINT) AS size_a, CAST(sb.n AS BIGINT) AS size_b,
       CAST((shared * 1000000) // LEAST(sa.n, sb.n) AS BIGINT) AS overlap_ppm
FROM mpairs JOIN msizes sa ON host_a = sa.host
            JOIN msizes sb ON host_b = sb.host
WHERE (shared * 1000000) // LEAST(sa.n, sb.n) >= 400000
"""


def q_soft404_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (soft404.soft404_flags) over a synthetic
    5-host fetched corpus: per host, three error-template copies under
    distinct paths in three spellings (double space / lowercase /
    UPPERCASE — exercising the normalize step on both engines), one
    REAL 404 with the same body (never flagged: status gate), one
    unique article ABOUT 404s (never flagged: repetition gate), one
    benign page repeated across paths (never a template: phrase gate),
    and unique normal pages. Both engines learn templates and flag
    independently."""
    from scalpel_spark.operators import soft404

    r = F.col('r')
    hostname = F.concat(F.lit('h'), (F.expr('r div 10') % 5).cast('string'))
    c = r % 10
    text = (
        F.when(c == 0, F.concat(F.lit('Sorry,  this page was not found on '),
                                hostname))
        .when(c.isin(1, 3), F.concat(
            F.lit('sorry, this page was not found on '), hostname))
        .when(c == 2, F.concat(F.lit('SORRY, THIS PAGE WAS NOT FOUND ON '),
                               F.upper(hostname)))
        .when(c == 4, F.concat(F.lit('The error 404 history essay number '),
                               r.cast('string')))
        .when(c == 5, F.lit('Welcome to our homepage'))
        .otherwise(F.concat(F.lit('Document body '), r.cast('string')))
    )
    corpus = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('r')).select(
        F.concat(F.lit('http://'), hostname, F.lit('.example.com/p'),
                 r.cast('string')).alias('url'),
        hostname.alias('host'),
        F.when(c == 3, F.lit(404)).otherwise(F.lit(200)).alias('status'),
        text.alias('text'))
    return soft404.soft404_flags(corpus, min_paths=3).select(
        'url', 'host', F.col('status').cast('long').alias('status'), 'sig',
        'template_paths', 'is_soft404')


ORACLE_SOFT404_FLAGS = """
WITH rr AS (SELECT CAST(doc_id AS BIGINT) AS r FROM documents),
corpus AS (
  SELECT 'http://h' || ((r // 10) % 5) || '.example.com/p' || r AS url,
         'h' || ((r // 10) % 5) AS host,
         CASE WHEN r % 10 = 3 THEN 404 ELSE 200 END AS status,
         CASE
           WHEN r % 10 = 0 THEN 'Sorry,  this page was not found on h'
                                || ((r // 10) % 5)
           WHEN r % 10 IN (1, 3) THEN 'sorry, this page was not found on h'
                                || ((r // 10) % 5)
           WHEN r % 10 = 2 THEN 'SORRY, THIS PAGE WAS NOT FOUND ON H'
                                || ((r // 10) % 5)
           WHEN r % 10 = 4 THEN 'The error 404 history essay number ' || r
           WHEN r % 10 = 5 THEN 'Welcome to our homepage'
           ELSE 'Document body ' || r
         END AS text
  FROM rr),
pages AS (
  SELECT url, host, status,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS sig,
         regexp_matches(lower(text),
           'page not found|page was not found|file not found|error 404'
           || '|404 not found|does not exist|no longer available'
           || '|页面不存在|introuvable')
           AS err
  FROM corpus),
templates AS (
  SELECT host, sig, COUNT(DISTINCT url) AS template_paths
  FROM pages WHERE status = 200 AND err
  GROUP BY host, sig HAVING COUNT(DISTINCT url) >= 3)
SELECT p.url, p.host, CAST(p.status AS BIGINT) AS status, p.sig,
       CAST(t.template_paths AS BIGINT) AS template_paths,
       (p.status = 200 AND t.template_paths IS NOT NULL) AS is_soft404
FROM pages p LEFT JOIN templates t ON p.host = t.host AND p.sig = t.sig
"""


def q_crawl_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash crawler sharding (scheduling.crawler_shards):
    one synthetic host per documents row, assigned to 7 crawler
    instances by argmax of the portable 60-bit md5 score. Both engines
    recompute every (host, shard) score and the argmax independently."""
    from scalpel_spark.operators import scheduling

    hosts = _t(spark, sf_dir, 'documents').select(
        F.concat(F.lit('h'), F.col('doc_id').cast('string')).alias('host'))
    out = scheduling.crawler_shards(hosts, 7)
    return out.select('host', F.col('shard').cast('long').alias('shard'))


ORACLE_SHARD_RENDEZVOUS = f"""
WITH hosts AS (SELECT 'h' || CAST(doc_id AS VARCHAR) AS host FROM documents),
cand AS (SELECT host, shard FROM hosts
         CROSS JOIN (SELECT unnest(range(7)) AS shard)),
scored AS (SELECT host, shard,
    {H60.format(x="host || '#' || CAST(shard AS VARCHAR) || '#'")} AS s
    FROM cand),
rn AS (SELECT host, shard,
       ROW_NUMBER() OVER (PARTITION BY host ORDER BY s DESC, shard DESC) AS r
       FROM scored)
SELECT host, CAST(shard AS BIGINT) AS shard FROM rn WHERE r = 1
"""


def q_cdx_revisit_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style capture index (operators/cdx.cdx_index) over a
    deterministic synthetic capture set: one doc per documents row,
    hosts id%13, waves id%4, span content keyed by id%50 so digests
    collide across URLs and waves (the WARC revisit case). Both engines
    recompute SURT urlkey, the 60-bit span digest, and the
    first-capture-wins revisit classification independently."""
    from scalpel_spark.operators import cdx

    d = _t(spark, sf_dir, 'documents').select(F.col('doc_id').alias('id'))
    k = F.pmod(F.col('id'), F.lit(50)).cast('string')
    docs = d.select(
        F.concat(F.lit('http://h'),
                 F.pmod(F.col('id'), F.lit(13)).cast('string'),
                 F.lit('.example.org/p'),
                 F.col('id').cast('string')).alias('doc_id'),
        F.pmod(F.col('id'), F.lit(4)).cast('int').alias('wave'),
        F.array(
            F.struct(F.lit('text').alias('kind'),
                     F.concat(F.lit('c'), k).alias('text'),
                     F.lit('').alias('media_ref'),
                     F.lit(0).alias('offset')),
            F.struct(F.lit('media').alias('kind'),
                     F.lit('').alias('text'),
                     F.concat(F.lit('m'), k).alias('media_ref'),
                     F.lit(1).alias('offset')),
        ).alias('spans'),
    )
    return cdx.cdx_index(docs)


_CDX_CANON = ("'text' || chr(31) || 'c' || kk || chr(31) || '' || chr(31) || '0'"
              " || chr(30) ||"
              " 'media' || chr(31) || '' || chr(31) || 'm' || kk || chr(31) || '1'")

ORACLE_CDX_REVISIT = f"""
WITH d AS (SELECT doc_id AS id, CAST(doc_id % 50 AS VARCHAR) AS kk
           FROM documents),
caps AS (
  SELECT 'org,example,h' || CAST(id % 13 AS VARCHAR) || ')/p'
           || CAST(id AS VARCHAR) AS urlkey,
         'http://h' || CAST(id % 13 AS VARCHAR) || '.example.org/p'
           || CAST(id AS VARCHAR) AS url,
         CAST(id % 4 AS INT) AS wave,
         {H60.format(x=_CDX_CANON)} AS digest,
         CAST(2 AS BIGINT) AS n_spans,
         CAST(1 + len(kk) AS BIGINT) AS content_chars
  FROM d),
rn AS (SELECT *,
              ROW_NUMBER() OVER (PARTITION BY digest
                                 ORDER BY wave, urlkey, url) AS _rn,
              FIRST_VALUE(wave) OVER (PARTITION BY digest
                                      ORDER BY wave, urlkey, url) AS original_wave
       FROM caps)
SELECT urlkey, url, wave, digest, n_spans, content_chars,
       _rn > 1 AS revisit, original_wave
FROM rn
"""


def q_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed ingestion (operators/feeds.feed_entries) over 8
    deterministic synthetic feeds built from the documents table (odd
    feed ids are Atom, even are RSS 2.0; items in id order). Both
    engines construct byte-identical XML bodies and re-extract every
    entry independently with the same RE2-compatible patterns."""
    from scalpel_spark.operators import feeds

    d = _t(spark, sf_dir, 'documents').select(F.col('doc_id').alias('id'))
    fid = F.pmod(F.col('id'), F.lit(8))
    ds = F.pmod(F.col('id'), F.lit(28)).cast('string')
    ids = F.col('id').cast('string')
    fs = fid.cast('string')
    atom_item = F.concat(
        F.lit('<entry><link href="http://f'), fs, F.lit('.news.example/a'),
        ids, F.lit('"/><updated>U'), ds, F.lit('</updated><id>g'), ids,
        F.lit('</id></entry>'))
    rss_item = F.concat(
        F.lit('<item><link>http://f'), fs, F.lit('.news.example/r'), ids,
        F.lit('</link><pubDate>D'), ds, F.lit('</pubDate><guid>g'), ids,
        F.lit('</guid></item>'))
    item = F.when(F.pmod(fid, F.lit(2)) == 1, atom_item).otherwise(rss_item)
    grouped = d.groupBy(fid.alias('fid')).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col('id'),
                                                     item.alias('it')))),
                lambda s: s['it'],
            ), '').alias('joined'))
    is_atom_feed = F.pmod(F.col('fid'), F.lit(2)) == 1
    pages = grouped.select(
        F.concat(F.lit('http://f'), F.col('fid').cast('string'),
                 F.lit('.news.example/feed.xml')).alias('url'),
        F.concat(F.when(is_atom_feed, F.lit('<feed>')).otherwise(F.lit('<rss>')),
                 F.col('joined'),
                 F.when(is_atom_feed, F.lit('</feed>')).otherwise(F.lit('</rss>'))
                 ).alias('body'),
    )
    return feeds.feed_entries(pages)


ORACLE_FEED_DISCOVERY = r"""
WITH d AS (SELECT doc_id AS id, doc_id % 8 AS fid FROM documents),
items AS (
  SELECT id, fid,
         CASE WHEN fid % 2 = 1 THEN
           '<entry><link href="http://f' || CAST(fid AS VARCHAR)
           || '.news.example/a' || CAST(id AS VARCHAR) || '"/><updated>U'
           || CAST(id % 28 AS VARCHAR) || '</updated><id>g'
           || CAST(id AS VARCHAR) || '</id></entry>'
         ELSE
           '<item><link>http://f' || CAST(fid AS VARCHAR)
           || '.news.example/r' || CAST(id AS VARCHAR) || '</link><pubDate>D'
           || CAST(id % 28 AS VARCHAR) || '</pubDate><guid>g'
           || CAST(id AS VARCHAR) || '</guid></item>'
         END AS it
  FROM d),
pages AS (
  SELECT fid,
         'http://f' || CAST(fid AS VARCHAR) || '.news.example/feed.xml'
           AS feed_url,
         fid % 2 = 1 AS is_atom,
         (CASE WHEN fid % 2 = 1 THEN '<feed>' ELSE '<rss>' END)
           || string_agg(it, '' ORDER BY id)
           || (CASE WHEN fid % 2 = 1 THEN '</feed>' ELSE '</rss>' END) AS body
  FROM items GROUP BY fid),
exploded AS (
  SELECT feed_url, is_atom,
         unnest(regexp_extract_all(body,
             CASE WHEN is_atom THEN '(?s)<entry>(.*?)</entry>'
                  ELSE '(?s)<item>(.*?)</item>' END, 1)) AS block,
         unnest(range(len(regexp_extract_all(body,
             CASE WHEN is_atom THEN '(?s)<entry>(.*?)</entry>'
                  ELSE '(?s)<item>(.*?)</item>' END, 1)))) AS pos
  FROM pages),
parsed AS (
  SELECT feed_url, CAST(pos AS BIGINT) AS pos,
         CASE WHEN is_atom
              THEN regexp_extract(COALESCE(
                     list_filter(regexp_extract_all(block, '(?s)(<link[^>]*>)', 1),
                                 t -> regexp_matches(t, 'rel="alternate"')
                                      OR NOT contains(t, ' rel='))[1],
                     ''), 'href="([^"]*)"', 1)
              ELSE regexp_replace(trim(regexp_extract(
                     block, '(?s)<link>\s*(.*?)\s*</link>', 1)),
                     '^<!\[CDATA\[|\]\]>$', '', 'g')
         END AS link,
         CASE WHEN is_atom
              THEN regexp_extract(block, '(?s)<updated>\s*(.*?)\s*</updated>', 1)
              ELSE regexp_extract(block, '(?s)<pubDate>\s*(.*?)\s*</pubDate>', 1)
         END AS published,
         regexp_extract(block, '(?s)<(?:guid|id)[^>]*>\s*(.*?)\s*</(?:guid|id)>', 1)
           AS guid,
         is_atom
  FROM exploded)
SELECT * FROM parsed WHERE link != ''
"""


def q_change_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-churn revisit planning over a deterministic synthetic
    3-wave recrawl history (orders keyed by o_orderkey % 3 churn every
    wave, the rest never change): per-host change rate and the
    waves-per-change revisit interval."""
    from scalpel_spark.operators import scheduling

    orders = _t(spark, sf_dir, 'orders')
    k, c = F.col('o_orderkey'), F.col('o_custkey')
    hist = orders.select(
        F.concat(F.lit('http://h'), F.pmod(c, F.lit(20)).cast('string'),
                 F.lit('.example.com/o/'), k.cast('string')).alias('url'),
        F.concat(F.lit('h'), F.pmod(c, F.lit(20)).cast('string'))
        .alias('host'),
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias('wave'),
        'o_orderkey',
    ).select(
        'url', 'host', 'wave',
        (F.col('o_orderkey') * 10
         + F.when(F.col('o_orderkey') % 3 == 0, F.col('wave'))
         .otherwise(F.lit(0))).cast('long').alias('content_hash'),
    )
    return scheduling.change_rates(hist, max_interval=16)


ORACLE_CHANGE_RATES = """
WITH hist AS (
  SELECT 'http://h' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com/o/'
           || CAST(o_orderkey AS VARCHAR) AS url,
         'h' || CAST(o_custkey % 20 AS VARCHAR) AS host,
         w.wave,
         CAST(o_orderkey * 10 + CASE WHEN o_orderkey % 3 = 0 THEN w.wave
                                     ELSE 0 END AS BIGINT) AS content_hash
  FROM orders CROSS JOIN (SELECT unnest([0, 1, 2]) AS wave) w),
lagged AS (
  SELECT host, url,
         CASE WHEN lag(content_hash) OVER
                (PARTITION BY url ORDER BY wave) IS NULL THEN NULL
              WHEN content_hash != lag(content_hash) OVER
                (PARTITION BY url ORDER BY wave) THEN 1
              ELSE 0 END AS changed
  FROM hist),
agg AS (
  SELECT host,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(COUNT(changed) AS BIGINT) AS n_intervals,
         CAST(COALESCE(SUM(changed), 0) AS BIGINT) AS n_changes
  FROM lagged GROUP BY host)
SELECT host, n_urls, n_intervals, n_changes,
       CAST(CASE WHEN n_intervals > 0
                 THEN (n_changes * 1000000) // n_intervals
                 ELSE 0 END AS BIGINT) AS change_ppm,
       CAST(CASE WHEN n_changes = 0 THEN 16
                 ELSE LEAST(16, GREATEST(1, n_intervals // n_changes))
                 END AS BIGINT) AS revisit_waves
FROM agg
"""


def q_robots_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-Robots-Tag directive flags (directives.robots_directives) over
    8 deterministic tag families covering every semantic branch:
    unrestricted ('', 'all'), each directive alone (mixed case), 'none'
    implication, multi-token lists with stray spaces, and the
    free-text-colon trap (unavailable_after) that a substring match
    would false-positive on. DuckDB recomputes the same token-boundary
    regexes independently."""
    from scalpel_spark.operators.directives import robots_directives

    d = F.col('d')
    tag = (
        F.when(d % 8 == 0, F.lit(''))
        .when(d % 8 == 1, F.lit('noindex'))
        .when(d % 8 == 2, F.lit('NOFOLLOW'))
        .when(d % 8 == 3, F.lit('none'))
        .when(d % 8 == 4, F.lit('noindex, nofollow'))
        .when(d % 8 == 5, F.lit('noarchive ,noindex'))
        .when(d % 8 == 6, F.lit('unavailable_after: 25 Jun 2027'))
        .otherwise(F.lit('all')))
    pages = (_t(spark, sf_dir, 'documents')
             .select(F.col('doc_id').cast('long').alias('d'))
             .select(F.concat(F.lit('https://x.test/p'), d.cast('string'))
                     .alias('url'), d.alias('d'), tag.alias('robots_tag')))
    flags = robots_directives(pages).join(pages.select('url', 'd'), 'url')
    return flags.groupBy('noindex', 'nofollow', 'noarchive').agg(
        F.count('*').alias('n'), F.min('d').alias('min_d'))


ORACLE_ROBOTS_DIRECTIVES = """
WITH doc AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
p AS (SELECT d, CASE
    WHEN d % 8 = 0 THEN ''
    WHEN d % 8 = 1 THEN 'noindex'
    WHEN d % 8 = 2 THEN 'NOFOLLOW'
    WHEN d % 8 = 3 THEN 'none'
    WHEN d % 8 = 4 THEN 'noindex, nofollow'
    WHEN d % 8 = 5 THEN 'noarchive ,noindex'
    WHEN d % 8 = 6 THEN 'unavailable_after: 25 Jun 2027'
    ELSE 'all' END AS tag
  FROM doc),
f AS (SELECT d,
  regexp_matches(tag, '(?i)(?:^|,)\\s*noindex\\s*(?:,|$)')
    OR regexp_matches(tag, '(?i)(?:^|,)\\s*none\\s*(?:,|$)') AS noindex,
  regexp_matches(tag, '(?i)(?:^|,)\\s*nofollow\\s*(?:,|$)')
    OR regexp_matches(tag, '(?i)(?:^|,)\\s*none\\s*(?:,|$)') AS nofollow,
  regexp_matches(tag, '(?i)(?:^|,)\\s*noarchive\\s*(?:,|$)') AS noarchive
  FROM p)
SELECT noindex, nofollow, noarchive, COUNT(*) AS n, MIN(d) AS min_d
FROM f GROUP BY noindex, nofollow, noarchive
"""


def q_sitemap_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-driven incremental recrawl (sitemap.sitemap_delta): both
    engines synthesize the same entry list (lastmod day = doc_id % 28
    + 1 for every 3rd doc) and capture table (every 2nd doc captured
    at 2026-01-15), so all four actions appear and the instant-based
    W3C comparison (date-only lastmod = end of day, so the same-day
    boundary refetches), max-lastmod dup collapse, and left-join
    semantics are pinned by the DuckDB twin."""
    from scalpel_spark.operators.sitemap import sitemap_delta

    docs = _t(spark, sf_dir, 'documents')
    did = F.col('doc_id').cast('long')
    u = F.concat(F.lit('https://'), F.col('source'),
                 F.lit('.example.com/doc/'), F.col('doc_id').cast('string'))
    entries = docs.select(
        u.alias('loc'),
        F.when(did % 3 == 0,
               F.concat(F.lit('2026-01-'),
                        F.lpad((did % 28 + 1).cast('string'), 2, '0')))
        .otherwise(F.lit('')).alias('lastmod'))
    captures = docs.filter(did % 2 == 0).select(
        u.alias('url'), F.lit('2026-01-15').alias('last_capture'))
    return sitemap_delta(entries, captures)


ORACLE_SITEMAP_DELTA = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS did,
                  'https://' || source || '.example.com/doc/' || doc_id AS u
           FROM documents),
e AS (SELECT u AS loc,
             CASE WHEN did % 3 = 0
                  THEN '2026-01-' || lpad(CAST(did % 28 + 1 AS VARCHAR), 2, '0')
                  ELSE '' END AS lastmod
      FROM d),
g AS (SELECT loc, MAX(lastmod) AS lastmod FROM e GROUP BY loc),
caps AS (SELECT u AS url, '2026-01-15' AS last_capture FROM d
         WHERE did % 2 = 0)
SELECT g.loc, g.lastmod,
       COALESCE(c.last_capture, '') AS last_capture,
       CASE WHEN c.url IS NULL THEN 'new'
            WHEN g.lastmod = '' THEN 'unknown'
            WHEN TRY_CAST(CASE WHEN regexp_matches(g.lastmod,
                     '^\\d{4}-\\d{2}-\\d{2}$')
                   THEN g.lastmod || 'T23:59:59' ELSE g.lastmod END
                   AS TIMESTAMP) IS NULL
                 OR TRY_CAST(c.last_capture AS TIMESTAMP) IS NULL
              THEN 'unknown'
            WHEN TRY_CAST(CASE WHEN regexp_matches(g.lastmod,
                     '^\\d{4}-\\d{2}-\\d{2}$')
                   THEN g.lastmod || 'T23:59:59' ELSE g.lastmod END
                   AS TIMESTAMP) > TRY_CAST(c.last_capture AS TIMESTAMP)
              THEN 'refetch'
            ELSE 'skip' END AS action
FROM g LEFT JOIN caps c ON g.loc = c.url
"""


def q_conditional_fetch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-revisit planning (scheduling.conditional_fetch_plan)
    over a deterministic synthetic 3-wave capture history built from
    documents: content versions bump at wave w when (d+w) % 3 == 0,
    ETags exist where d % 3 != 0, Last-Modified where d % 2 == 0 — so
    the output exercises all three fetch modes, the RFC 9110 validator
    precedence, and the per-host Laplace-smoothed 304-rate arithmetic,
    each recomputed independently by the DuckDB twin."""
    from scalpel_spark.operators.scheduling import conditional_fetch_plan

    d = F.col('d')
    w = F.col('wave')
    c1 = F.when((d + 1) % 3 == 0, 1).otherwise(0)
    c2 = F.when((d + 2) % 3 == 0, 1).otherwise(0)
    v = (F.when(w >= 1, c1).otherwise(0)
         + F.when(w >= 2, c2).otherwise(0)).cast('long')
    hist = (
        _t(spark, sf_dir, 'documents')
        .select(F.col('doc_id').cast('long').alias('d'))
        .select(d, F.explode(F.sequence(F.lit(0), F.lit(2))).alias('wave'))
        .select(
            F.concat(F.lit('http://h'), (d % 7).cast('string'),
                     F.lit('.test/p'), d.cast('string')).alias('url'),
            F.concat(F.lit('h'), (d % 7).cast('string')).alias('host'),
            w.alias('wave'),
            F.concat(F.lit('c'), d.cast('string'), F.lit(':'),
                     v.cast('string')).alias('content_hash'),
            F.when(d % 3 != 0,
                   F.concat(F.lit('e'), d.cast('string'), F.lit('-'),
                            v.cast('string'))).alias('etag'),
            F.when(d % 2 == 0,
                   F.concat(F.lit('lm'), d.cast('string'), F.lit('-'),
                            v.cast('string'))).alias('last_modified'),
        ))
    out = conditional_fetch_plan(hist)
    # NULL validators -> '' at the comparison boundary only (sorting
    # mixed None/str rows is undefined); the operator API keeps NULLs.
    return out.withColumn('etag', F.coalesce('etag', F.lit(''))) \
              .withColumn('last_modified', F.coalesce('last_modified', F.lit('')))


ORACLE_CONDITIONAL_FETCH = """
WITH doc AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
hist AS (
  SELECT 'http://h' || CAST(d % 7 AS VARCHAR) || '.test/p'
           || CAST(d AS VARCHAR) AS url,
         'h' || CAST(d % 7 AS VARCHAR) AS host,
         w.wave,
         (CASE WHEN w.wave >= 1 AND (d + 1) % 3 = 0 THEN 1 ELSE 0 END
          + CASE WHEN w.wave >= 2 AND (d + 2) % 3 = 0 THEN 1 ELSE 0 END) AS v,
         d
  FROM doc CROSS JOIN (SELECT unnest([0, 1, 2]) AS wave) w),
obs AS (
  SELECT url, host, wave,
         CASE WHEN d % 3 != 0
              THEN 'e' || CAST(d AS VARCHAR) || '-' || CAST(v AS VARCHAR)
              END AS etag,
         CASE WHEN d % 2 = 0
              THEN 'lm' || CAST(d AS VARCHAR) || '-' || CAST(v AS VARCHAR)
              END AS last_modified,
         CASE WHEN lag(v) OVER (PARTITION BY url ORDER BY wave) IS NULL
              THEN NULL
              WHEN v = lag(v) OVER (PARTITION BY url ORDER BY wave) THEN 1
              ELSE 0 END AS unchanged
  FROM hist),
last AS (
  SELECT url, host, CAST(wave AS BIGINT) AS last_wave, etag, last_modified,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY wave DESC) AS rn
  FROM obs),
rates AS (
  SELECT host,
         CAST(COUNT(unchanged) AS BIGINT) AS host_pairs,
         CAST(COALESCE(SUM(unchanged), 0) AS BIGINT) AS host_unchanged
  FROM obs GROUP BY host)
SELECT l.url, l.host, l.last_wave,
       CASE WHEN l.etag IS NOT NULL THEN 'conditional_etag'
            WHEN l.last_modified IS NOT NULL THEN 'conditional_ims'
            ELSE 'full' END AS fetch_mode,
       COALESCE(l.etag, '') AS etag,
       COALESCE(l.last_modified, '') AS last_modified,
       r.host_pairs, r.host_unchanged,
       CAST(((r.host_unchanged + 1) * 1000000) // (r.host_pairs + 2)
            AS BIGINT) AS expected_304_ppm
FROM last l JOIN rates r USING (host) WHERE l.rn = 1
"""


def q_adaptive_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-rate budget backoff over a deterministic synthetic fetch log
    derived from orders (both engines rebuild the same (host, status)
    rows): 429s demand back-off at full weight, 5xx at half, floor at
    the minimum budget."""
    from scalpel_spark.operators import scheduling

    orders = _t(spark, sf_dir, 'orders')
    k = F.col('o_orderkey')
    fetches = orders.select(
        F.concat(F.lit('h'), F.pmod(F.col('o_custkey'), F.lit(20))
                 .cast('string')).alias('host'),
        F.when(k % 17 == 0, 429)
        .when(k % 13 == 0, 503)
        .when(k % 11 == 0, 500)
        .otherwise(200).cast('int').alias('http_status'),
    )
    return scheduling.adaptive_backoff(fetches, base_budget=100)


ORACLE_ADAPTIVE_BACKOFF = """
WITH fetches AS (
  SELECT 'h' || CAST(o_custkey % 20 AS VARCHAR) AS host,
         CASE WHEN o_orderkey % 17 = 0 THEN 429
              WHEN o_orderkey % 13 = 0 THEN 503
              WHEN o_orderkey % 11 = 0 THEN 500
              ELSE 200 END AS http_status
  FROM orders),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN http_status = 429 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_throttled,
         CAST(SUM(CASE WHEN http_status BETWEEN 500 AND 599 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_server_err
  FROM fetches GROUP BY host)
SELECT host, n_total, n_throttled, n_server_err,
       LEAST(1000000,
             ((2 * n_throttled + n_server_err) * 1000000) // (2 * n_total))
         AS penalty_ppm,
       GREATEST(CAST(1 AS BIGINT),
                (100 * (1000000 - LEAST(1000000,
                 ((2 * n_throttled + n_server_err) * 1000000)
                   // (2 * n_total)))) // 1000000) AS budget
FROM agg
"""


def q_retry_after_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-After honoring (scheduling.retry_after_backoff) over a
    deterministic synthetic fetch log from orders: 429s carry numeric
    delta-seconds on even keys and an HTTP-date (default_secs fallback)
    on odd, 503s carry numerics on every 3rd key and nothing otherwise,
    200/500 rows never count — pinning the directive gate, the numeric
    parse, the date fallback, max-hold, and the ceil wave division."""
    from scalpel_spark.operators import scheduling

    orders = _t(spark, sf_dir, 'orders')
    k = F.col('o_orderkey')
    st = (F.when(k % 17 == 0, 429)
          .when(k % 13 == 0, 503)
          .when(k % 11 == 0, 500)
          .otherwise(200).cast('int'))
    fetches = orders.select(
        F.concat(F.lit('h'), F.pmod(F.col('o_custkey'), F.lit(20))
                 .cast('string')).alias('host'),
        st.alias('http_status'), k.alias('k'),
    ).select(
        'host', 'http_status',
        F.when((F.col('http_status') == 429) & (F.col('k') % 2 == 0),
               (F.col('k') % 300).cast('string'))
        .when(F.col('http_status') == 429,
              F.lit('Wed, 01 Jan 2027 00:00:00 GMT'))
        .when((F.col('http_status') == 503) & (F.col('k') % 3 == 0),
              (F.col('k') % 120).cast('string'))
        .alias('retry_after'),
    )
    return scheduling.retry_after_backoff(
        fetches, wave_duration_ms=60_000, current_wave=7, default_secs=90)


ORACLE_RETRY_AFTER = """
WITH fetches AS (
  SELECT 'h' || CAST(o_custkey % 20 AS VARCHAR) AS host,
         CASE WHEN o_orderkey % 17 = 0 THEN 429
              WHEN o_orderkey % 13 = 0 THEN 503
              WHEN o_orderkey % 11 = 0 THEN 500
              ELSE 200 END AS st,
         o_orderkey AS k
  FROM orders),
r AS (SELECT host, st,
        CASE WHEN st = 429 AND k % 2 = 0 THEN CAST(k % 300 AS VARCHAR)
             WHEN st = 429 THEN 'Wed, 01 Jan 2027 00:00:00 GMT'
             WHEN st = 503 AND k % 3 = 0 THEN CAST(k % 120 AS VARCHAR)
             END AS retry_after
      FROM fetches),
d AS (SELECT host,
        CASE WHEN (st = 429 OR st = 503) AND retry_after IS NOT NULL
                  AND retry_after != ''
             THEN CASE WHEN regexp_matches(retry_after, '^[0-9]{1,9}$')
                       THEN CAST(retry_after AS BIGINT)
                       ELSE 90 END
             END AS secs
      FROM r),
agg AS (SELECT host,
          CAST(SUM(CASE WHEN secs IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_directives,
          CAST(COALESCE(MAX(secs), 0) AS BIGINT) AS hold_secs
        FROM d GROUP BY host)
SELECT host, n_directives, hold_secs,
       CAST(8 + (hold_secs * 1000 + 59999) // 60000 AS BIGINT)
         AS resume_wave
FROM agg
"""


def q_latency_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-aware politeness (scheduling.latency_budget) over a
    deterministic synthetic fetch log from orders (fetch_ms =
    (k % 97)/10 + 1 — identical IEEE double arithmetic on both
    engines, floored to integer microseconds): per-host mean latency →
    delay-factor pause → wave budget, min/max clamps exercised by the
    spread of per-host means."""
    from scalpel_spark.operators import scheduling

    orders = _t(spark, sf_dir, 'orders')
    k = F.col('o_orderkey')
    fetches = orders.select(
        F.concat(F.lit('h'), F.pmod(F.col('o_custkey'), F.lit(20))
                 .cast('string')).alias('host'),
        ((k % 97).cast('double') / 10.0 + 1.0).alias('fetch_ms'),
    )
    return scheduling.latency_budget(
        fetches, wave_duration_ms=60_000, delay_factor_ppm=2_000_000,
        min_budget=1, max_budget=5_000)


ORACLE_LATENCY_BUDGET = """
WITH fetches AS (
  SELECT 'h' || CAST(o_custkey % 20 AS VARCHAR) AS host,
         CAST(o_orderkey % 97 AS DOUBLE) / 10.0 + 1.0 AS fetch_ms
  FROM orders),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(SUM(CAST(floor(fetch_ms * 1000) AS BIGINT)) AS BIGINT)
           AS sum_us
  FROM fetches GROUP BY host),
d AS (
  SELECT host, n_fetches, sum_us // n_fetches AS mean_fetch_us
  FROM agg),
b AS (
  SELECT host, n_fetches, mean_fetch_us,
         (2000000 * mean_fetch_us) // 1000000 AS delay_us
  FROM d)
SELECT host, n_fetches, mean_fetch_us, delay_us,
       LEAST(CAST(5000 AS BIGINT),
             GREATEST(CAST(1 AS BIGINT),
                      60000000 // GREATEST(CAST(1 AS BIGINT), delay_us)))
         AS budget
FROM b
"""


def q_recrawl_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Age × authority recrawl picks over a deterministic synthetic seen
    table (both engines build identical rows, so score and order are
    recomputed independently)."""
    from scalpel_spark.operators import scheduling

    d = F.col('doc_id')
    host = F.concat(F.lit('h'), (d % 37).cast('string'), F.lit('.example.com'))
    seen = _t(spark, sf_dir, 'documents').select(
        F.concat(F.lit('http://'), host, F.lit('/page'), d.cast('string')).alias('url'),
        host.alias('host'),
        F.when(d % 7 == 0, F.lit('unreachable')).otherwise(F.lit('reachable')).alias('status'),
        (d % 6).cast('long').alias('wave'),
    )
    ranks = spark.range(37).select(
        F.concat(F.lit('h'), F.col('id').cast('string'), F.lit('.example.com')).alias('host'),
        F.pmod(hash60(F.concat(F.lit('rank-'), F.col('id').cast('string'))),
               F.lit(1_000_000)).alias('rank_ppb'),
    )
    return scheduling.select_recrawl(seen, ranks, current_wave=6,
                                     min_age=1, limit=50)


ORACLE_RECRAWL = f"""
WITH seen AS (
  SELECT 'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/page'
           || CAST(doc_id AS VARCHAR) AS url,
         'h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
         CASE WHEN doc_id % 7 = 0 THEN 'unreachable' ELSE 'reachable' END AS status,
         doc_id % 6 AS wave
  FROM documents),
ranks AS (
  SELECT 'h' || CAST(k AS VARCHAR) || '.example.com' AS host,
         ({H60.format(x="'rank-' || CAST(k AS VARCHAR)")}) % 1000000 AS rank_ppb
  FROM (SELECT unnest(range(37)) AS k)),
aged AS (
  SELECT s.url, s.host, 6 - s.wave AS age,
         CAST((6 - s.wave) * COALESCE(r.rank_ppb, 0) AS BIGINT) AS score
  FROM seen s LEFT JOIN ranks r USING (host)
  WHERE s.status = 'reachable' AND 6 - s.wave >= 1)
SELECT url, host, age, score FROM aged
ORDER BY score DESC, url ASC LIMIT 50
"""


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering.kmeans_assign(_t(spark, sf_dir, 'embeddings'), k=4, iters=2)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering.semdedup(_t(spark, sf_dir, 'embeddings'), k=4, iters=2, threshold=0.4)


def _kmeans_cte(k: int, iters: int, quant: int = 1000, prefix: str = '',
                q_sql: str | None = None) -> str:
    """DuckDB twin of clustering.kmeans_assign as a CTE chain ending in
    {prefix}asg{iters}: init centroids = the k smallest vec_ids, then per
    round argmin assignment (quantized squared L2, ties to smaller cell)
    and rounded-mean centroid recompute. ``q_sql`` overrides the source
    CTE body (must yield (vec_id, qv)) — the PQ oracle feeds per-subspace
    slices through the same chain; ``prefix`` namespaces the CTEs so
    several chains coexist in one statement."""
    p = prefix
    q_sql = q_sql or f"""SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS qv
           FROM embeddings"""
    parts = [f"""{p}q AS ({q_sql}),
{p}dims AS (SELECT vec_id, unnest(qv) AS x, generate_subscripts(qv, 1) AS d FROM {p}q),
{p}cent0 AS (SELECT vec_id AS cell, d, x AS c FROM {p}dims
          WHERE vec_id IN (SELECT vec_id FROM {p}q ORDER BY vec_id LIMIT {k}))"""]
    for i in range(1, iters + 1):
        parts.append(f"""{p}cv{i} AS (SELECT cell, list(c ORDER BY d) AS cvec FROM {p}cent{i - 1} GROUP BY cell),
{p}scored{i} AS (SELECT {p}q.vec_id, {p}cv{i}.cell,
                  list_sum(list_transform(range(1, len(qv) + 1),
                                          j -> (qv[j] - cvec[j]) * (qv[j] - cvec[j]))) AS d2
           FROM {p}q CROSS JOIN {p}cv{i}),
{p}asg{i} AS (SELECT vec_id, cell FROM (
             SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
             FROM {p}scored{i}) WHERE rn = 1),
{p}cent{i} AS (SELECT a.cell, d, CAST(floor(AVG(x) + 0.5) AS BIGINT) AS c
            FROM {p}dims v JOIN {p}asg{i} a USING (vec_id) GROUP BY a.cell, d)""")
    return ',\n'.join(parts)


ORACLE_KMEANS = f"""
WITH {_kmeans_cte(4, 2)}
SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg2
"""

ORACLE_SEMDEDUP = f"""
WITH {_kmeans_cte(4, 2)},
v AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev, a.cell
      FROM embeddings e JOIN asg2 a USING (vec_id)),
dup AS (SELECT DISTINCT a.vec_id FROM v a JOIN v b ON a.cell = b.cell AND b.vec_id < a.vec_id
        WHERE floor(list_cosine_similarity(a.ev, b.ev) * 1000000 + 0.5) / 1000000 >= 0.4)
SELECT v.vec_id, CAST(v.cell AS BIGINT) AS cell, (d.vec_id IS NULL) AS keep
FROM v LEFT JOIN dup d ON v.vec_id = d.vec_id
"""


def q_similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_topk): 4 subspaces × 4
    subcentroids, 2 Lloyd rounds per subspace, asymmetric-distance
    search for 5 queries. The DuckDB twin replays every subspace's
    k-means bit-for-bit through the shared _kmeans_cte chain (sliced
    source), rebuilds the codes/codebooks, and recomputes the ADC sums
    and ranking — integer arithmetic end to end."""
    return similarity.pq_topk(_t(spark, sf_dir, 'embeddings'),
                              n_queries=5, k=3, m=4, ksub=4, iters=2)


def _pq_oracle(m: int = 4, ksub: int = 4, iters: int = 2,
               quant: int = 1000, n_queries: int = 5, k: int = 3) -> str:
    def hi(j):
        return 'dim' if j == m - 1 else f'{j + 1} * w'

    chains = ',\n'.join(
        _kmeans_cte(ksub, iters, quant, prefix=f's{j}_',
                    q_sql=(f'SELECT vec_id, list_slice(qv, {j} * w + 1, '
                           f'{hi(j)}) AS qv FROM pq_src'))
        for j in range(m))
    codes = ' UNION ALL '.join(
        f'SELECT vec_id, {j} AS sub, cell FROM s{j}_asg{iters}'
        for j in range(m))
    cbs = ' UNION ALL '.join(
        f'SELECT {j} AS sub, cell, cvec FROM s{j}_cv{iters}'
        for j in range(m))
    qsubs = ' UNION ALL '.join(
        f'SELECT vec_id AS query_id, {j} AS sub, '
        f'list_slice(qv, {j} * w + 1, {hi(j)}) AS qs '
        f'FROM pq_src WHERE vec_id < {n_queries}'
        for j in range(m))
    return f"""
WITH pq_src AS (SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS qv,
         GREATEST(1, len(embedding) // {m}) AS w,
         len(embedding) AS dim
       FROM embeddings),
{chains},
pq_codes AS ({codes}),
pq_cbs AS ({cbs}),
pq_qs AS ({qsubs}),
pq_dist AS (SELECT query_id, sub, cell,
       list_sum(list_transform(range(1, len(qs) + 1),
                i -> (qs[i] - cvec[i]) * (qs[i] - cvec[i]))) AS d2
     FROM pq_qs JOIN pq_cbs USING (sub)),
pq_scored AS (SELECT query_id, vec_id AS neighbor_id, SUM(d2) AS adc_d2
     FROM pq_codes JOIN pq_dist USING (sub, cell)
     WHERE query_id != vec_id GROUP BY 1, 2),
pq_ranked AS (SELECT query_id, neighbor_id, adc_d2,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_d2, neighbor_id) AS rank
     FROM pq_scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(adc_d2 AS BIGINT) AS adc_d2
FROM pq_ranked WHERE rank <= {k}
"""


def q_similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (similarity.ivf_pq_topk): coarse label cells bound the
    candidate set (nprobe=2), PQ codes of the RESIDUAL vector bound the
    storage, ADC sums rank. The DuckDB twin recomputes the coarse
    quantizer, the probe ranking, the residuals, every subspace's
    k-means (shared _kmeans_cte over a residual source), the codes and
    codebooks, and the cell-restricted ADC ranking — all integer."""
    return similarity.ivf_pq_topk(_t(spark, sf_dir, 'embeddings'),
                                  n_queries=5, k=3, nprobe=2,
                                  m=4, ksub=4, iters=2)


def _ivf_pq_oracle(m: int = 4, ksub: int = 4, iters: int = 2,
                   nprobe: int = 2, quant: int = 1000,
                   n_queries: int = 5, k: int = 3) -> str:
    def hi(j, w='w', dim='dim'):
        return dim if j == m - 1 else f'{j + 1} * {w}'

    chains = ',\n'.join(
        _kmeans_cte(ksub, iters, quant=1, prefix=f's{j}_',
                    q_sql=(f'SELECT vec_id, list_slice(qv, {j} * w + 1, '
                           f'{hi(j)}) AS qv FROM res_src'))
        for j in range(m))
    codes = ' UNION ALL '.join(
        f'SELECT vec_id, {j} AS sub, cell AS code FROM s{j}_asg{iters}'
        for j in range(m))
    cbs = ' UNION ALL '.join(
        f'SELECT {j} AS sub, cell AS code, cvec FROM s{j}_cv{iters}'
        for j in range(m))
    qsubs = ' UNION ALL '.join(
        f'SELECT query_id, cell, {j} AS sub, '
        f'list_slice(r, {j} * w + 1, {hi(j)}) AS rs FROM qres'
        for j in range(m))
    return f"""
WITH src AS (SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS qv
       FROM embeddings),
icent AS (SELECT label AS cell, d, CAST(floor(AVG(x) + 0.5) AS BIGINT) AS c
       FROM (SELECT vec_id, label, unnest(qv) AS x,
                    generate_subscripts(qv, 1) AS d FROM src)
       GROUP BY label, d),
icv AS (SELECT cell, list(c ORDER BY d) AS cvec FROM icent GROUP BY cell),
iscored AS (SELECT src.vec_id, icv.cell,
       list_sum(list_transform(range(1, len(qv) + 1),
                j -> (qv[j] - cvec[j]) * (qv[j] - cvec[j]))) AS d2
       FROM src CROSS JOIN icv),
iprobe AS (SELECT vec_id, cell,
       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       FROM iscored),
res_src AS (SELECT s.vec_id, p.cell,
       list_transform(range(1, len(s.qv) + 1),
                      j -> s.qv[j] - icv.cvec[j]) AS qv,
       GREATEST(1, len(s.qv) // {m}) AS w, len(s.qv) AS dim
       FROM src s
       JOIN iprobe p ON s.vec_id = p.vec_id AND p.rn = 1
       JOIN icv ON icv.cell = p.cell),
{chains},
pq_codes AS ({codes}),
pq_cbs AS ({cbs}),
qres AS (SELECT s.vec_id AS query_id, p.cell,
       list_transform(range(1, len(s.qv) + 1),
                      j -> s.qv[j] - icv.cvec[j]) AS r,
       GREATEST(1, len(s.qv) // {m}) AS w, len(s.qv) AS dim
       FROM src s
       JOIN iprobe p ON s.vec_id = p.vec_id AND p.rn <= {nprobe}
       JOIN icv ON icv.cell = p.cell
       WHERE s.vec_id < {n_queries}),
qsubs AS ({qsubs}),
dist AS (SELECT query_id, cell, sub, code,
       list_sum(list_transform(range(1, len(rs) + 1),
                i -> (rs[i] - cvec[i]) * (rs[i] - cvec[i]))) AS d2
       FROM qsubs JOIN pq_cbs USING (sub)),
cand AS (SELECT c.vec_id, p.cell, c.sub, c.code
       FROM pq_codes c JOIN iprobe p ON c.vec_id = p.vec_id AND p.rn = 1),
adc AS (SELECT query_id, vec_id AS neighbor_id, SUM(d2) AS adc_d2
       FROM cand JOIN dist USING (cell, sub, code)
       WHERE query_id != vec_id GROUP BY 1, 2),
ranked AS (SELECT query_id, neighbor_id, adc_d2,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_d2, neighbor_id) AS rank
       FROM adc)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(adc_d2 AS BIGINT) AS adc_d2
FROM ranked WHERE rank <= {k}
"""


def q_text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (textops.normalize_unicode) over
    deterministic synthetic text: combining-accent sequences that must
    compose, precomposed twins that must pass through, a combining ring,
    and plain ASCII. DuckDB's native nfc_normalize is the oracle — the
    pandas-UDF normalization must match it byte-for-byte."""
    from scalpel_spark.operators.textops import normalize_unicode

    d = F.col('d')
    filler = F.substring(F.md5(d.cast('string')), 1, 8)
    text = (
        F.when(d % 4 == 0, F.concat(F.lit('café '), filler))
        .when(d % 4 == 1, F.concat(F.lit('café '), filler))
        .when(d % 4 == 2, F.concat(F.lit('Å '), filler))
        .otherwise(filler))
    docs = _t(spark, sf_dir, 'documents').select(
        'doc_id', F.col('doc_id').cast('long').alias('d')
    ).select('doc_id', text.alias('text'))
    return normalize_unicode(docs, 'NFC')


ORACLE_TEXT_NFC = """
WITH doc AS (SELECT doc_id, CAST(doc_id AS BIGINT) AS d FROM documents),
p AS (SELECT doc_id, CASE
    WHEN d % 4 = 0 THEN 'café ' || f
    WHEN d % 4 = 1 THEN 'café ' || f
    WHEN d % 4 = 2 THEN 'Å ' || f
    ELSE f END AS text
  FROM (SELECT doc_id, d, SUBSTR(md5(CAST(d AS VARCHAR)), 1, 8) AS f
        FROM doc))
SELECT doc_id, nfc_normalize(text) AS norm_unicode,
       nfc_normalize(text) != text AS changed
FROM p
"""


def q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = textops.classifier_weights(spark, n_buckets=1024, seed=7)
    return textops.classifier_scores(_t(spark, sf_dir, 'documents'), w,
                                     n_buckets=1024)


ORACLE_CLASSIFIER = f"""
WITH w AS (
  SELECT k AS bucket,
         ({H60.format(x="'7-' || CAST(k AS VARCHAR)")}) % 2001 - 1000 AS weight
  FROM (SELECT unnest(range(1024)) AS k)),
tok AS (
  SELECT doc_id, ({H60.format(x='t')}) % 1024 AS bucket
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents))
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST((SUM(weight) * 1000) // COUNT(*) AS BIGINT) AS score_ppm,
       SUM(weight) > 0 AS pred_keep
FROM tok JOIN w USING (bucket)
GROUP BY doc_id
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota via histogram decomposition; the flat
    ROW_NUMBER-per-source oracle is equal by construction (only the
    straddling score bucket ranks rows)."""
    return curation.domain_cap(_t(spark, sf_dir, 'documents'),
                               max_per_source=30)


def _domain_cap_oracle() -> str:
    return f"""
WITH q AS ({_quality_oracle()}),
nrm AS (SELECT q.doc_id, d.source, q.score
        FROM q JOIN documents d USING (doc_id)),
ranked AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM nrm)
SELECT doc_id, source, score, rn <= 30 AS keep FROM ranked
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lineops.line_dedup(_t(spark, sf_dir, 'documents'), line_tokens=8, min_docs=2)


# Shared CTE: regroup the whitespace tokens into deterministic 8-token
# lines — the DuckDB twin of lineops.split_token_lines.
_LINES_CTE = """
toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
         FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
lines AS (SELECT doc_id, (pos - 1) // 8 AS line_no,
                 string_agg(tok, ' ' ORDER BY pos) AS line
          FROM toks GROUP BY doc_id, (pos - 1) // 8)
"""

ORACLE_LINE_DEDUP = f"""
WITH {_LINES_CTE},
heavy AS (
  SELECT {H60.format(x='line')} AS line_hash
  FROM lines GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (
  SELECT l.doc_id, l.line_no, l.line, (h.line_hash IS NOT NULL) AS is_heavy
  FROM lines l LEFT JOIN heavy h ON {H60.format(x='l.line')} = h.line_hash)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT is_heavy THEN line END,
                           chr(10) ORDER BY line_no), '') AS clean_text,
       COUNT(*) AS n_lines,
       SUM(CASE WHEN is_heavy THEN 1 ELSE 0 END) AS n_lines_removed
FROM marked GROUP BY doc_id
"""


def q_line_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lineops.line_quality_filter(
        _t(spark, sf_dir, 'documents'), line_tokens=8, min_line_tokens=3
    )


ORACLE_LINE_QUALITY = f"""
WITH {_LINES_CTE},
flagged AS (
  SELECT doc_id, line_no, line,
         (len(string_split(line, ' ')) < 3
          OR regexp_matches(line, '{lineops.NUMERIC_LINE_RE}')
          OR regexp_matches(line, '{lineops.BULLET_LINE_RE}')) AS drop_it
  FROM lines)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT drop_it THEN line END,
                           chr(10) ORDER BY line_no), '') AS clean_text,
       COUNT(*) AS n_lines,
       SUM(CASE WHEN drop_it THEN 1 ELSE 0 END) AS n_lines_removed
FROM flagged GROUP BY doc_id
"""


def q_substr_strike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr pass (Lee et al. 2022): corpus-duplicated >=8-token
    runs detected by window hashing, merged to maximal islands, struck."""
    return substr.strike_dup_substrings(
        _t(spark, sf_dir, 'documents'), window_tokens=8, min_count=2)


_SUBSTR_W = 8
# the DuckDB twin of texthash.word_shingles(toks, 8): same output strings
_SUBSTR_WIN_SQL = (
    "CASE WHEN len(l) >= 8 THEN list_transform(range(1, len(l) - 6), i -> "
    + " || ' ' || ".join(f'l[i+{k}]' if k else 'l[i]' for k in range(8))
    + ") ELSE CAST([] AS VARCHAR[]) END"
)

ORACLE_SUBSTR_STRIKE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
wins AS (
  SELECT doc_id, pos - 1 AS pos, {H60.format(x='win')} AS h
  FROM (SELECT doc_id, unnest(w) AS win, generate_subscripts(w, 1) AS pos
        FROM (SELECT doc_id, {_SUBSTR_WIN_SQL} AS w FROM t))),
duph AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
occ AS (SELECT doc_id, pos, pos + {_SUBSTR_W} AS e FROM wins JOIN duph USING (h)),
flg AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos >= COALESCE(MAX(e) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS f
  FROM occ),
isl AS (SELECT doc_id, pos, e,
               SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS iid
        FROM flg),
runs AS (SELECT doc_id, iid, MIN(pos) AS s, MAX(e) AS e
         FROM isl GROUP BY doc_id, iid),
cov AS (SELECT doc_id, SUM(e - s) AS dup_tokens FROM runs GROUP BY doc_id),
toks AS (SELECT doc_id, unnest(l) AS tok,
                generate_subscripts(l, 1) - 1 AS pos FROM t),
kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
         WHERE NOT EXISTS (SELECT 1 FROM runs r
                           WHERE r.doc_id = tk.doc_id
                             AND tk.pos >= r.s AND tk.pos < r.e)),
clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
          FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.l) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST((COALESCE(c.dup_tokens, 0) * 1000000) // len(t.l) AS BIGINT)
         AS dup_ppm,
       COALESCE(cl.clean_text, '') AS clean_text
FROM t LEFT JOIN cov c USING (doc_id)
       LEFT JOIN clean cl ON cl.doc_id = t.doc_id
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.repetition_scores(_t(spark, sf_dir, 'documents'), n=3)


ORACLE_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
gr AS (SELECT doc_id, CASE WHEN len(l) >= 3 THEN
         list_transform(range(1, len(l) - 1), i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
       ELSE CAST([] AS VARCHAR[]) END AS grams FROM toks),
mapside AS (
  SELECT doc_id, CASE WHEN len(grams) > 0 THEN
    floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) * 10000 + 0.5) / 10000
  ELSE 0.0 END AS dup_ngram_frac FROM gr),
cnt AS (SELECT doc_id, s, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(l) AS s FROM toks) GROUP BY doc_id, s),
top AS (SELECT doc_id, MAX(c) AS max_tok, SUM(c) AS n_tokens FROM cnt GROUP BY doc_id)
SELECT t.doc_id,
       floor((CAST(max_tok AS DOUBLE) / n_tokens) * 10000 + 0.5) / 10000 AS top_token_frac,
       m.dup_ngram_frac,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM top t JOIN mapside m ON t.doc_id = m.doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the held-out set is docs 0-4 (their own
    rows flag themselves, proving the overlap join); any other doc sharing
    an 8-gram with them is flagged with attribution."""
    docs = _t(spark, sf_dir, 'documents')
    bench = docs.filter(F.col('doc_id') < 5).select(
        F.col('doc_id').alias('bench_id'), 'text')
    return curation.decontaminate(docs, bench, n=8)


def _decon_shingle_sql(n: int = 8) -> str:
    parts = ' || \' \' || '.join(f'l[i+{k}]' if k else 'l[i]' for k in range(n))
    return (
        f"CASE WHEN len(l) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(l) - {n - 2}), i -> {parts})) "
        "ELSE CAST([] AS VARCHAR[]) END"
    )


ORACLE_DECONTAMINATE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT doc_id, {_decon_shingle_sql(8)} AS sset FROM toks),
bx AS (SELECT doc_id AS bench_id, UNNEST(sset) AS s FROM sh WHERE doc_id < 5),
bg AS (SELECT s, MIN(bench_id) AS first_bench_id FROM bx GROUP BY s),
dx AS (SELECT doc_id, UNNEST(sset) AS s FROM sh)
SELECT dx.doc_id, COUNT(*) AS n_matched_shingles, MIN(bg.first_bench_id) AS first_bench_id
FROM dx JOIN bg USING (s)
GROUP BY dx.doc_id
"""


def q_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.source_reputation(_t(spark, sf_dir, 'documents'))


def _source_reputation_oracle() -> str:
    stop = ' + '.join(_count_tok_sql(s) for s in textops.STOPWORDS)
    return f"""
WITH f AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' ')) AS mean_len,
         CAST({stop} AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) AS dr
  FROM documents),
s AS (
  SELECT source,
         floor((0.4 * LEAST(n_tokens / 100.0, 1.0) + 0.3 * dr
               + 0.2 * LEAST(stop_ratio * 5.0, 1.0)
               + 0.1 * LEAST(mean_len / 8.0, 1.0)) * 10000 + 0.5) / 10000 AS score
  FROM f)
SELECT source, COUNT(*) AS n_docs,
       floor((AVG(score)) * 10000 + 0.5) / 10000 AS mean_score,
       CAST(SUM(CASE WHEN score < 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
       floor((CAST(SUM(CASE WHEN score < 0.45 THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*)) * 10000 + 0.5) / 10000 AS low_quality_frac
FROM s GROUP BY source
"""


# ---------------------------------------------------------------------------
# 6. sessionization (streaming-semantics batch twin, SURVEY.md §2.9)
# ---------------------------------------------------------------------------


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessions.session_stats(_t(spark, sf_dir, 'events'), gap_s=1800)


ORACLE_SESSIONS = """
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked),
per_sess AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT user_id, COUNT(*) AS n_sessions, CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       floor((AVG(n_events)) * 10000 + 0.5) / 10000 AS avg_session_events
FROM per_sess GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# 7. crawl engine end-to-end (iterative — golden VALUES oracle / rows-only)
# ---------------------------------------------------------------------------


def q_crawl_golden_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference integration crawl (3-page quotes site) through the full
    wave engine; deterministic golden result pinned as a VALUES oracle
    (tests/any_io/test_static_spider.py:383-401)."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    engine = CrawlEngine(
        spark, golden_site(spark, 'http'),
        config=CrawlConfig(link_rule='second_contains_page'),
    )
    result = engine.run(['http://quotes.com'])
    return result.seen.select(
        'url', 'status',
        F.col('wave').cast('long').alias('wave'),
        F.col('priority').cast('long').alias('priority'),
    )


ORACLE_CRAWL_GOLDEN = """
SELECT * FROM (VALUES
  ('http://quotes.com', 'reachable', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('http://quotes.com/page2.html', 'reachable', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
  ('http://quotes.com/page3.html', 'reachable', CAST(2 AS BIGINT), CAST(2 AS BIGINT))
) AS t(url, status, wave, priority)
"""


def q_crawl_render_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 selenium-spider semantics, driver-oracled (VERDICT r4 Missing
    #4): the golden site with DOM variants on pages 1-2 (dom_mod=2,
    seed=2 — page 3's DOM equals its static HTML) crawled through BOTH
    render modes. render_mode='dom' emits coalesce(dom_spans, spans) —
    the browser-rendered document — while the frontier / dedup / robots /
    ordering discipline is the shared static loop
    (any_io/selenium_spider.py:17-21 subclasses StaticSpider whole; the
    divergence is only WHAT the fetch produced, core/selenium.py:14-39).
    The pinned oracle shows identical (doc_id, priority) sets across
    modes — same frontier — with the JS-injected span present exactly on
    the dom-rendered pages in dom mode: different document."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site, with_dom_variants

    corpus = with_dom_variants(golden_site(spark, 'http'), dom_mod=2, seed=2)
    parts = []
    for mode in ('static', 'dom'):
        cfg = CrawlConfig(link_rule='second_contains_page', render_mode=mode)
        r = CrawlEngine(spark, corpus, config=cfg).run(['http://quotes.com'])
        parts.append(r.docs.select(
            F.lit(mode).alias('mode'), 'doc_id',
            F.col('priority').cast('long').alias('priority'),
            F.size('spans').cast('long').alias('n_spans'),
            F.exists('spans', lambda s: F.coalesce(s['text'], F.lit(''))
                     .startswith('js-rendered:')).alias('has_js_span')))
    return parts[0].unionByName(parts[1])


ORACLE_CRAWL_RENDER_MODE = """
SELECT * FROM (VALUES
  ('static', 'http://quotes.com',            CAST(0 AS BIGINT), CAST(6 AS BIGINT), FALSE),
  ('static', 'http://quotes.com/page2.html', CAST(1 AS BIGINT), CAST(6 AS BIGINT), FALSE),
  ('static', 'http://quotes.com/page3.html', CAST(2 AS BIGINT), CAST(6 AS BIGINT), FALSE),
  ('dom',    'http://quotes.com',            CAST(0 AS BIGINT), CAST(7 AS BIGINT), TRUE),
  ('dom',    'http://quotes.com/page2.html', CAST(1 AS BIGINT), CAST(7 AS BIGINT), TRUE),
  ('dom',    'http://quotes.com/page3.html', CAST(2 AS BIGINT), CAST(6 AS BIGINT), FALSE)
) AS t(mode, doc_id, priority, n_spans, has_js_span)
"""


def q_crawl_golden_http_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME golden crawl as crawl_golden_http, through the
    live-deployment fetch stage (CrawlConfig.fetch_mode='mapinpandas'):
    the frontier flows through sources/fetcher.fetch_frontier — the
    Arrow-batched, host-partitioned mapInPandas fetcher with per-host
    slot pacing — instead of the corpus equi-join; content resolution
    stays a corpus join (the parse stage). Identical output proves the
    two fetch paths are interchangeable, so the shared VALUES oracle is
    the cross-mode parity gate."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    engine = CrawlEngine(
        spark, golden_site(spark, 'http'),
        config=CrawlConfig(link_rule='second_contains_page',
                           fetch_mode='mapinpandas'),
    )
    result = engine.run(['http://quotes.com'])
    return result.seen.select(
        'url', 'status',
        F.col('wave').cast('long').alias('wave'),
        F.col('priority').cast('long').alias('priority'),
    )


def q_crawl_golden_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production statistics path (`CrawlResult.statistics_agg`): pure
    aggregates, no driver-side URL sets — the scale-safe twin of the
    reference's `SpiderStatistics` (core/spider.py:63-86). Deterministic
    golden crawl → VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    engine = CrawlEngine(
        spark, golden_site(spark, 'http'),
        config=CrawlConfig(link_rule='second_contains_page'),
    )
    return engine.run(['http://quotes.com']).statistics_agg()


ORACLE_CRAWL_STATS = """
SELECT * FROM (VALUES
  ('reachable', CAST(3 AS BIGINT), CAST(6.0 AS DOUBLE), CAST(2.0 AS DOUBLE))
) AS t(status, n_urls, total_fetch_ms, avg_fetch_ms)
"""


def q_crawl_manyhosts_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale proof for the distributed host_state path (round-1 verdict #1):
    a 2-wave crawl over 10^4 distinct hosts with robots enforcement. The
    per-host robots decisions stay a distributed DataFrame end-to-end (no
    driver collect in plans/engine.py); seeds arrive via the distributed
    `run_frontier` ingestion. Deterministic → per-(wave,status) aggregate
    pinned as a VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    n_hosts = 12_000
    corpus = synthetic_corpus(spark, n_pages=12_000, n_hosts=n_hosts, seed=7,
                              links_per_page=2).persist()
    robots = synthetic_robots(spark, n_hosts=n_hosts)
    engine = CrawlEngine(
        spark, corpus, robots=robots,
        config=CrawlConfig(
            follow_robots_txt=True,
            max_dispatch_per_host_per_wave=4,
            max_waves=2,
        ),
    )
    # one seed per host (guarantees 12k distinct hosts in host_state in
    # wave 0 — many resolve to unreachable, which is the point: robots is
    # evaluated per HOST, fetch success is irrelevant) plus a corpus
    # sample so waves 1+ have real follows
    per_host = spark.range(0, n_hosts).select(
        F.concat(F.lit('http://h'), F.col('id').cast('string'),
                 F.lit('.example.com/p'), F.col('id').cast('string'),
                 F.lit('.html')).alias('url'),
        F.col('id').alias('priority'),
    )
    sample = corpus.filter(F.pmod(F.xxhash64('doc_id', F.lit(99)), F.lit(4)) == 0).select(
        F.col('doc_id').alias('url'),
        (F.lit(100_000) + F.pmod(F.xxhash64('doc_id'), F.lit(1_000_000))).alias('priority'),
    )
    result = engine.run_frontier(per_host.unionByName(sample))
    return (
        result.seen.groupBy('wave', 'status')
        .agg(F.count('*').alias('n_urls'), F.min('priority').alias('min_priority'))
        .select(F.col('wave').cast('long').alias('wave'), 'status', 'n_urls', 'min_priority')
    )


# pinned from the deterministic run (seed=7 corpus, seed=42 robots policy table)
ORACLE_CRAWL_MANYHOSTS = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'reachable', CAST(2179 AS BIGINT), CAST(100541 AS BIGINT)),
  (CAST(0 AS BIGINT), 'robots_excluded', CAST(3726 AS BIGINT), CAST(0 AS BIGINT)),
  (CAST(0 AS BIGINT), 'unreachable', CAST(9094 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), 'reachable', CAST(1477 AS BIGINT), CAST(1037573 AS BIGINT)),
  (CAST(1 AS BIGINT), 'robots_excluded', CAST(524 AS BIGINT), CAST(1099997 AS BIGINT)),
  (CAST(1 AS BIGINT), 'unreachable', CAST(68 AS BIGINT), CAST(1100004 AS BIGINT))
) AS t(wave, status, n_urls, min_priority)
"""


def q_url_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style URL rules over a deterministic synthetic frontier derived
    from documents (both engines build byte-identical URLs, so every flag
    is recomputed independently): host blocklist (broadcast), length,
    path depth, query-param traps, spam keywords."""
    from scalpel_spark.operators import urlfilter

    d = F.col('doc_id')
    url = F.concat(
        F.lit('http://h'), (d % 37).cast('string'), F.lit('.example.com/'),
        F.repeat(F.lit('d/'), (d % 12).cast('int')),
        F.lit('page'), d.cast('string'),
        F.when(d % 13 == 0, F.repeat(F.lit('x'), 280)).otherwise(F.lit('')),
        F.when(d % 5 == 0, F.lit('?a=1&b=2&c=3&d=4&e=5')).otherwise(F.lit('')),
        F.when(d % 11 == 0, F.lit('&casino')).otherwise(F.lit('')),
    )
    frontier = _t(spark, sf_dir, 'documents').select('doc_id', url.alias('url'))
    bl = spark.range(37).filter(F.col('id') % 7 == 0).select(
        F.concat(F.lit('h'), F.col('id').cast('string'),
                 F.lit('.example.com')).alias('host'))
    return urlfilter.url_quality_flags(frontier, bl).select(
        'doc_id', 'flag_blocked', 'flag_long', 'flag_deep',
        'flag_query_heavy', 'flag_spam', 'keep')


ORACLE_URL_QUALITY = """
WITH fr AS (
  SELECT doc_id,
         'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/'
         || repeat('d/', CAST(doc_id % 12 AS INT))
         || 'page' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 13 = 0 THEN repeat('x', 280) ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '?a=1&b=2&c=3&d=4&e=5' ELSE '' END)
         || (CASE WHEN doc_id % 11 = 0 THEN '&casino' ELSE '' END) AS url
  FROM documents),
bl AS (SELECT 'h' || CAST(k AS VARCHAR) || '.example.com' AS host
       FROM (SELECT unnest(range(37)) AS k) WHERE k % 7 = 0),
flags AS (
  SELECT doc_id,
         lower(split_part(split_part(split_part(split_part(url, '://', 2), '?', 1),
                                     '/', 1), ':', 1))
           IN (SELECT host FROM bl) AS flag_blocked,
         len(url) > 300 AS flag_long,
         (len(split_part(url, '?', 1))
          - len(replace(split_part(url, '?', 1), '/', '')) - 2) > 8 AS flag_deep,
         (CASE WHEN strpos(url, '?') > 0
               THEN len(substr(url, strpos(url, '?') + 1))
                    - len(replace(substr(url, strpos(url, '?') + 1), '&', '')) + 1
               ELSE 0 END) > 4 AS flag_query_heavy,
         regexp_matches(lower(url), 'casino|viagra|porn|xxx') AS flag_spam
  FROM fr)
SELECT doc_id, flag_blocked, flag_long, flag_deep, flag_query_heavy, flag_spam,
       NOT (flag_blocked OR flag_long OR flag_deep OR flag_query_heavy OR flag_spam) AS keep
FROM flags
"""


def q_url_trap_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap URL-shape signals over a deterministic synthetic
    frontier (repeated segments, digit mills, deep paths, faceted
    params) — both engines build byte-identical URLs and recompute every
    signal independently."""
    from scalpel_spark.operators import urlfilter

    d = F.col('doc_id')
    url = F.concat(
        F.lit('http://h'), (d % 23).cast('string'), F.lit('.example.com/'),
        F.repeat(F.lit('cal/2024/'), (d % 6).cast('int')),
        F.lit('id'), d.cast('string'),
        F.when(d % 9 == 0, F.lit('/9876543210')).otherwise(F.lit('')),
        F.when(d % 4 == 0, F.lit('?p=1&q=2&r=3&s=4&t=5')).otherwise(F.lit('')),
    )
    frontier = _t(spark, sf_dir, 'documents').select('doc_id', url.alias('url'))
    return urlfilter.trap_scores(frontier).select(
        'doc_id', 'seg_repeat', 'depth', 'digit_ppm', 'n_params', 'flag_trap')


ORACLE_URL_TRAPS = """
WITH fr AS (
  SELECT doc_id,
         'http://h' || CAST(doc_id % 23 AS VARCHAR) || '.example.com/'
         || repeat('cal/2024/', CAST(doc_id % 6 AS INT))
         || 'id' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 9 = 0 THEN '/9876543210' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 0 THEN '?p=1&q=2&r=3&s=4&t=5' ELSE '' END)
           AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
         CASE WHEN strpos(split_part(split_part(url, '://', 2), '?', 1), '/') > 0
              THEN substr(split_part(split_part(url, '://', 2), '?', 1),
                          strpos(split_part(split_part(url, '://', 2), '?', 1), '/'))
              ELSE '' END AS path
  FROM fr),
segs AS (
  SELECT doc_id, url, path,
         list_filter(string_split(path, '/'), s -> s != '') AS sl
  FROM parts),
sig AS (
  SELECT doc_id,
         CAST(COALESCE(list_max(list_transform(sl,
              s -> len(list_filter(sl, x -> x = s)))), 0) AS BIGINT)
           AS seg_repeat,
         CAST(len(sl) AS BIGINT) AS depth,
         CAST(CASE WHEN len(path) > 0 THEN floor(
              (len(path) - len(regexp_replace(path, '[0-9]', '', 'g')))
              * 1000000.0 / len(path)) ELSE 0 END AS BIGINT) AS digit_ppm,
         CAST(CASE WHEN strpos(url, '?') > 0
              THEN len(substr(url, strpos(url, '?') + 1))
                   - len(replace(substr(url, strpos(url, '?') + 1), '&', ''))
                   + 1
              ELSE 0 END AS BIGINT) AS n_params
  FROM segs)
SELECT doc_id, seg_repeat, depth, digit_ppm, n_params,
       (seg_repeat > 2 OR depth > 8 OR digit_ppm > 400000 OR n_params > 4)
         AS flag_trap
FROM sig
"""


def q_crawl_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-authority PageRank over the link lineage a real crawl
    persisted (links_delta, host-aggregated per wave): run a deterministic
    3-wave crawl, then rank its observed host graph — the signal the
    priority frontier consumes on the next crawl. Deterministic end to end
    (seed-stable corpus, integer ppb rank arithmetic) → pinned VALUES
    oracle."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=8, seed=13)
    cfg = CrawlConfig(follow_robots_txt=False, max_waves=3)
    seeds = [r['doc_id'] for r in corpus.orderBy('doc_id').limit(5).collect()]
    res = CrawlEngine(spark, corpus, config=cfg,
                      store=SnapshotStore(tempfile.mkdtemp())).run(seeds)
    return res.host_ranks(iters=3)


# pinned from the deterministic run (seed=13 corpus, seeds = 5 smallest
# doc_ids, 3 waves, 3 rank iterations) — verified identical across runs
ORACLE_CRAWL_HOST_RANK = """
SELECT * FROM (VALUES
  ('h0.example.com', CAST(106254184 AS BIGINT)),
  ('h1.example.com', CAST(163341584 AS BIGINT)),
  ('h2.example.com', CAST(167508636 AS BIGINT)),
  ('h3.example.com', CAST(112794586 AS BIGINT)),
  ('h4.example.com', CAST(133002450 AS BIGINT)),
  ('h5.example.com', CAST(88206446 AS BIGINT)),
  ('h6.example.com', CAST(113913505 AS BIGINT)),
  ('h7.example.com', CAST(114978527 AS BIGINT))
) AS t(host, rank_ppb)
"""


def q_crawl_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delay-derived politeness budget (SURVEY §2.9 T2/W1): per-host budget
    = least(max_dispatch, max(1, floor(wave_duration / robots delay))) —
    the reference's crawl-delay pacing (any_io/static_spider.py:180,187 via
    any_io/robots.py:79-95) per wave. 10 seeds/host, wave_duration=10:
    h4 (Crawl-delay: 2) → 5/wave, h5 (Request-rate: 2/5) → 4/wave,
    delay-0 hosts → max_dispatch=8. Deterministic → VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(spark, n_pages=150, n_hosts=12, seed=11)
    robots = synthetic_robots(spark, n_hosts=12)
    engine = CrawlEngine(
        spark, corpus, robots=robots,
        config=CrawlConfig(
            follow_robots_txt=True,
            wave_duration=10.0,
            max_dispatch_per_host_per_wave=8,
            max_waves=2,
        ),
    )
    seeds = [f'http://h{h}.example.com/p{p}.html' for h in range(12) for p in range(10)]
    result = engine.run(seeds)
    dispatched = result.seen.filter(F.col('status') != 'robots_excluded')
    return (
        dispatched.select(F.regexp_extract('url', r'^http://([^/]+)/', 1).alias('host'),
                          'wave', 'priority')
        .groupBy('host', 'wave')
        .agg(F.count('*').alias('n_dispatched'), F.min('priority').alias('min_priority'))
        .select('host', F.col('wave').cast('long').alias('wave'), 'n_dispatched', 'min_priority')
    )


def q_crawl_priority_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-queue frontier (beyond reference): a JVM-side score
    expression decides which URLs win the per-host budget slots; ties and
    the default fall back to FIFO. Budget 1/wave on one host with an
    explicit score inversion → the seeds dispatch in reverse seed order.
    Deterministic → VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=150, n_hosts=12, seed=11)
    seeds = [f'http://h8.example.com/p{p}.html' for p in range(3)]
    score = ("CASE WHEN url LIKE '%/p2.html' THEN 100 "
             "WHEN url LIKE '%/p1.html' THEN 50 ELSE 0 END")
    cfg = CrawlConfig(max_dispatch_per_host_per_wave=1, max_waves=3,
                      frontier_priority=score)
    result = CrawlEngine(spark, corpus, config=cfg).run(seeds)
    return (
        result.seen.filter(F.col('url').isin(seeds))
        .select('url', F.col('wave').cast('long').alias('wave'),
                F.col('priority').cast('long').alias('priority'))
    )


# seeds dispatch in score order (p2, p1, p0) while keeping their FIFO
# discovery priorities (0, 1, 2)
ORACLE_PRIORITY_FRONTIER = """
SELECT * FROM (VALUES
  ('http://h8.example.com/p0.html', CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
  ('http://h8.example.com/p1.html', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
  ('http://h8.example.com/p2.html', CAST(0 AS BIGINT), CAST(2 AS BIGINT))
) AS t(url, wave, priority)
"""


# pinned from the deterministic run (corpus seed=11, robots policy table):
# h4 = 5/wave (Crawl-delay 2), h5 = 4/wave (Request-rate 2/5), delay-0
# hosts = 8 in wave 0 (max_dispatch); h0/h2/h3 excluded entirely
ORACLE_POLITENESS_BUDGET = """
SELECT * FROM (VALUES
  ('h1.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(10 AS BIGINT)),
  ('h10.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(100 AS BIGINT)),
  ('h11.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(110 AS BIGINT)),
  ('h4.example.com', CAST(0 AS BIGINT), CAST(5 AS BIGINT), CAST(40 AS BIGINT)),
  ('h5.example.com', CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(50 AS BIGINT)),
  ('h6.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(60 AS BIGINT)),
  ('h7.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(70 AS BIGINT)),
  ('h8.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(80 AS BIGINT)),
  ('h9.example.com', CAST(0 AS BIGINT), CAST(8 AS BIGINT), CAST(90 AS BIGINT)),
  ('h1.example.com', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(18 AS BIGINT)),
  ('h10.example.com', CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(108 AS BIGINT)),
  ('h11.example.com', CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(118 AS BIGINT)),
  ('h4.example.com', CAST(1 AS BIGINT), CAST(5 AS BIGINT), CAST(45 AS BIGINT)),
  ('h5.example.com', CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(54 AS BIGINT)),
  ('h6.example.com', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(68 AS BIGINT)),
  ('h7.example.com', CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(78 AS BIGINT)),
  ('h8.example.com', CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(88 AS BIGINT)),
  ('h9.example.com', CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(98 AS BIGINT))
) AS t(host, wave, n_dispatched, min_priority)
"""


def q_crawl_synthetic_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic 200-page crawl with robots + politeness budget + hot-host
    salting; deterministic per-wave dispatch statistics. The wave loop is
    iterative but its inputs are fixed, so the output is a constant table
    — VALUES-oracled like crawl_politeness_budget."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=12, seed=42, hot_hosts=2)
    robots = synthetic_robots(spark, n_hosts=12)
    engine = CrawlEngine(
        spark, corpus, robots=robots,
        config=CrawlConfig(
            follow_robots_txt=True,
            max_dispatch_per_host_per_wave=10,
            hot_host_threshold=16,
            max_waves=4,
        ),
    )
    seeds = [f'http://h{h}.example.com/p{h}.html' for h in range(12)]
    result = engine.run(seeds)
    return (
        result.seen.groupBy('wave', 'status')
        .agg(F.count('*').alias('n_urls'), F.min('priority').alias('min_priority'))
        .select(F.col('wave').cast('long').alias('wave'), 'status', 'n_urls', 'min_priority')
    )


# pinned from the deterministic run (corpus seed=42, hot_hosts=2, robots
# policy table, max_dispatch=10, hot_host_threshold=16, max_waves=4) —
# the same VALUES-twin technique as ORACLE_POLITENESS_BUDGET: the wave
# loop is iterative but its inputs are fixed, so its per-wave dispatch
# statistics are a constant table
ORACLE_SYNTHETIC_POLITENESS = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'reachable', CAST(1 AS BIGINT), CAST(11 AS BIGINT)),
  (CAST(0 AS BIGINT), 'robots_excluded', CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
  (CAST(0 AS BIGINT), 'unreachable', CAST(8 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), 'reachable', CAST(1 AS BIGINT), CAST(13 AS BIGINT)),
  (CAST(1 AS BIGINT), 'robots_excluded', CAST(1 AS BIGINT), CAST(12 AS BIGINT)),
  (CAST(2 AS BIGINT), 'reachable', CAST(4 AS BIGINT), CAST(14 AS BIGINT)),
  (CAST(3 AS BIGINT), 'reachable', CAST(5 AS BIGINT), CAST(18 AS BIGINT)),
  (CAST(3 AS BIGINT), 'robots_excluded', CAST(5 AS BIGINT), CAST(19 AS BIGINT))
) AS t(wave, status, n_urls, min_priority)
"""


def q_crawl_green_file_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backend-fidelity divergence (VERDICT r2 #8): under deny-all robots
    the anyio worker excludes a denied host's file:// URL at schedule time
    (any_io/static_spider.py:181-184, host-keyed delay mapping) while the
    gevent backend reads file URLs before its robots check
    (green/static_spider.py:126-140) and fetches it. Both modes through
    the full engine; deterministic VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

    host = 'denied.example.com'
    http_url, file_url = f'http://{host}/a.html', f'file://{host}/b.txt'
    corpus = spark.createDataFrame([
        {'doc_id': http_url,
         'spans': [{'kind': 'text', 'text': 'alpha', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0},
        {'doc_id': file_url,
         'spans': [{'kind': 'text', 'text': 'beta', 'media_ref': None, 'offset': 0}],
         'http_status': 0, 'scheme': 'file', 'readable': True, 'fetch_ms': 3.0},
    ], CORPUS_SCHEMA)
    robots = spark.createDataFrame(
        [{'host': host, 'fetch_status': 200, 'rules': 'User-agent: *\nDisallow: /'}],
        ROBOTS_SCHEMA)
    out = None
    for mode in ('anyio', 'green'):
        cfg = CrawlConfig(follow_robots_txt=True, politeness_mode=mode, max_waves=2)
        res = CrawlEngine(spark, corpus, robots, cfg).run([http_url, file_url])
        part = res.seen.select(F.lit(mode).alias('mode'), 'url', 'status')
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_GREEN_FILE_BYPASS = """
SELECT * FROM (VALUES
  ('anyio', 'http://denied.example.com/a.html', 'robots_excluded'),
  ('anyio', 'file://denied.example.com/b.txt', 'robots_excluded'),
  ('green', 'http://denied.example.com/a.html', 'robots_excluded'),
  ('green', 'file://denied.example.com/b.txt', 'reachable')
) AS t(mode, url, status)
"""


def q_crawl_rfc9309(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.robots_matcher through the full engine: under
    'Disallow: /private/' + 'Disallow: /*.pdf$' with a DENIED first seed,
    the stdlib matcher (reference parity, any_io/robots.py:82-91 — first
    URL decides the host) excludes ALL four URLs, while 'rfc9309' excludes
    exactly the two rule-matched ones (wildcard $ incl.) and fetches the
    rest. Deterministic VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

    host = 'rep.example.com'
    paths = ['/private/a', '/public/b', '/private/sub/c', '/docs.pdf']
    corpus = spark.createDataFrame([
        {'doc_id': f'http://{host}{p}',
         'spans': [{'kind': 'text', 'text': f'body{i}', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0}
        for i, p in enumerate(paths)
    ], CORPUS_SCHEMA)
    robots = spark.createDataFrame(
        [{'host': host, 'fetch_status': 200,
          'rules': 'User-agent: *\nDisallow: /private/\nDisallow: /*.pdf$'}],
        ROBOTS_SCHEMA)
    seeds = [f'http://{host}{p}' for p in paths]
    out = None
    for matcher in ('stdlib', 'rfc9309'):
        cfg = CrawlConfig(follow_robots_txt=True, robots_matcher=matcher, max_waves=2)
        res = CrawlEngine(spark, corpus, robots, cfg).run(seeds)
        part = res.seen.select(F.lit(matcher).alias('matcher'), 'url', 'status')
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CRAWL_RFC9309 = """
SELECT * FROM (VALUES
  ('stdlib', 'http://rep.example.com/private/a', 'robots_excluded'),
  ('stdlib', 'http://rep.example.com/public/b', 'robots_excluded'),
  ('stdlib', 'http://rep.example.com/private/sub/c', 'robots_excluded'),
  ('stdlib', 'http://rep.example.com/docs.pdf', 'robots_excluded'),
  ('rfc9309', 'http://rep.example.com/private/a', 'robots_excluded'),
  ('rfc9309', 'http://rep.example.com/public/b', 'reachable'),
  ('rfc9309', 'http://rep.example.com/private/sub/c', 'robots_excluded'),
  ('rfc9309', 'http://rep.example.com/docs.pdf', 'robots_excluded')
) AS t(matcher, url, status)
"""


def q_crawl_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.content_dedup through the full engine: /a and /b carry
    IDENTICAL span sequences (a mirror), /c is unique — with the flag on,
    items emit once per unique content (first-discovered URL wins by
    priority) while all three URLs stay reachable with complete docs
    rows; with it off every page emits. Deterministic VALUES oracle over
    (mode, doc_id, n_items)."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    host = 'mirror.example.com'

    def spans(key):
        return [{'kind': 'text', 'text': key, 'media_ref': None, 'offset': 0},
                {'kind': 'text', 'text': key + '-author', 'media_ref': None, 'offset': 1}]

    corpus = spark.createDataFrame([
        {'doc_id': f'http://{host}{p}', 'spans': spans(k),
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0}
        for p, k in (('/a', 'same'), ('/b', 'same'), ('/c', 'solo'))
    ], CORPUS_SCHEMA)
    seeds = [f'http://{host}{p}' for p in ('/a', '/b', '/c')]
    out = None
    for flag in (False, True):
        cfg = CrawlConfig(max_waves=2, content_dedup=flag)
        res = CrawlEngine(spark, corpus, config=cfg).run(seeds)
        part = (res.items.groupBy('doc_id').agg(F.count('*').alias('n_items'))
                .select(F.lit('dedup' if flag else 'plain').alias('mode'),
                        'doc_id', 'n_items'))
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CRAWL_CONTENT_DEDUP = """
SELECT * FROM (VALUES
  ('plain', 'http://mirror.example.com/a', CAST(1 AS BIGINT)),
  ('plain', 'http://mirror.example.com/b', CAST(1 AS BIGINT)),
  ('plain', 'http://mirror.example.com/c', CAST(1 AS BIGINT)),
  ('dedup', 'http://mirror.example.com/a', CAST(1 AS BIGINT)),
  ('dedup', 'http://mirror.example.com/c', CAST(1 AS BIGINT))
) AS t(mode, doc_id, n_items)
"""


def q_crawl_global_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.max_dispatch_per_wave through the full engine: six
    seeds on one host under a global cap of 2 dispatch in strict FIFO
    pairs across waves 0/1/2 (engine step 4b histogram-threshold cap —
    no global sort, only the straddle bucket ranks). Linkless corpus so
    the dispatch schedule is exactly the seed list; VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    host = 'cap.example.com'
    urls = [f'http://{host}/p{k}' for k in range(6)]
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': f'body{k}', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 2.0}
        for k, u in enumerate(urls)
    ], CORPUS_SCHEMA)
    cfg = CrawlConfig(max_dispatch_per_wave=2, max_waves=3)
    res = CrawlEngine(spark, corpus, config=cfg).run(urls)
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_GLOBAL_BUDGET = """
SELECT * FROM (VALUES
  ('http://cap.example.com/p0', 0, 'reachable'),
  ('http://cap.example.com/p1', 0, 'reachable'),
  ('http://cap.example.com/p2', 1, 'reachable'),
  ('http://cap.example.com/p3', 1, 'reachable'),
  ('http://cap.example.com/p4', 2, 'reachable'),
  ('http://cap.example.com/p5', 2, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_retry_requeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.max_retries through the full engine: three seeds on one
    host — one healthy, one transiently failing (a response middleware
    marks it unreachable while wave < 2, the deterministic stand-in for a
    recovering 5xx), one permanently dead (HTTP 500 in the corpus). With
    max_retries=2, the flaky URL burns two retries and succeeds at wave 2;
    the dead URL burns both retries and finalizes 'unreachable' at wave 2;
    retry lineage (retry_delta) counts 2 attempts for each. Failures with
    attempts left are withheld from seen, so the exact anti-join re-admits
    them — no bloom/cuckoo structure change. VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    host = 'retry.example.com'
    ok, flaky, dead = (f'http://{host}/{p}' for p in ('ok', 'flaky', 'dead'))
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': b, 'media_ref': None, 'offset': 0}],
         'http_status': st, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u, b, st in ((ok, 'fine', 200), (flaky, 'late', 200), (dead, 'gone', 500))
    ], CORPUS_SCHEMA)

    def flaky_until(fetch):
        def wrapped(df):
            out = fetch(df)
            return out.withColumn(
                'status',
                F.when((F.col('url') == flaky) & (F.col('wave') < 2),
                       F.lit('unreachable')).otherwise(F.col('status')))
        return wrapped

    cfg = CrawlConfig(max_retries=2, max_waves=6,
                      response_middlewares=(flaky_until,))
    res = CrawlEngine(spark, corpus, config=cfg).run([ok, flaky, dead])
    n_retries = res.retries.groupBy('url_hash').agg(
        F.count('*').alias('n_retries'))
    return (res.seen.join(n_retries, 'url_hash', 'left')
            .select('url', 'status', 'wave',
                    F.coalesce(F.col('n_retries'), F.lit(0)).cast('long').alias('n_retries')))


ORACLE_CRAWL_RETRY_REQUEUE = """
SELECT * FROM (VALUES
  ('http://retry.example.com/ok', 'reachable', 0, CAST(0 AS BIGINT)),
  ('http://retry.example.com/flaky', 'reachable', 2, CAST(2 AS BIGINT)),
  ('http://retry.example.com/dead', 'unreachable', 2, CAST(2 AS BIGINT))
) AS t(url, status, wave, n_retries)
"""


def _anchor_fixture(spark) -> DataFrame:
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    def span(kind, text=None, ref=None):
        return {'kind': kind, 'text': text, 'media_ref': ref, 'offset': 0}

    rows = [
        {'doc_id': 'd1',
         'spans': [span('text', 'intro'), span('link', '/a'), span('text', 'mid'),
                   span('link', '/b'), span('media', None, 'img://x'), span('link', '/c')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'd2',
         'spans': [span('link', '/a'), span('text', 'tail')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'd3', 'spans': [],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
    ]
    return spark.createDataFrame(rows, CORPUS_SCHEMA).withColumnRenamed('doc_id', 'url')


def q_link_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/parse.link_context — anchor-context extraction: each link
    span paired with the nearest PRECEDING text span (the span model's
    anchor text, Brin & Page 1998 §2.2). Array-local column algebra, zero
    shuffle (plan pinned by test). A media span between two links is not
    prose; a link with no preceding prose gets context NULL. VALUES
    oracle over the deterministic fixture."""
    from scalpel_spark.operators.parse import link_context

    return link_context(_anchor_fixture(spark)).select(
        'url', 'pos', 'span_idx', 'raw_link',
        # NULL context (no preceding prose) surfaces as '' — the compare
        # harness sorts column values and cannot order NULL among strings
        F.coalesce(F.col('context'), F.lit('')).alias('context'))


ORACLE_LINK_CONTEXT = """
SELECT * FROM (VALUES
  ('d1', 0, 1, '/a', 'intro'),
  ('d1', 1, 3, '/b', 'mid'),
  ('d1', 2, 5, '/c', 'mid'),
  ('d2', 0, 0, '/a', '')
) AS t(url, pos, span_idx, raw_link, context)
"""


def q_anchor_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/parse.anchor_text_profile — per-target anchor rollup
    (n_refs, n_docs, lexicographic first/last context) over link_context
    output: one combinable groupBy on the target, bounded row width (no
    per-target context collection — a hub target would otherwise become a
    multi-MB row at web scale). VALUES oracle."""
    from scalpel_spark.operators.parse import anchor_text_profile, link_context

    return anchor_text_profile(link_context(_anchor_fixture(spark))).select(
        'raw_link', F.col('n_refs').cast('long').alias('n_refs'),
        F.col('n_docs').cast('long').alias('n_docs'),
        'first_context', 'last_context')


ORACLE_ANCHOR_TEXT_PROFILE = """
SELECT * FROM (VALUES
  ('/a', CAST(2 AS BIGINT), CAST(2 AS BIGINT), 'intro', 'intro'),
  ('/b', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'mid', 'mid'),
  ('/c', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'mid', 'mid')
) AS t(raw_link, n_refs, n_docs, first_context, last_context)
"""


def q_crawl_ip_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.politeness_scope='ip' (Heritrix-style server
    politeness) through the full engine: vhosts a/b share 10.0.0.1 so
    they share ONE per-wave dispatch window (budget 1 → FIFO: a at wave
    0, b deferred to wave 1); host c is absent from the host_ips map and
    falls back to its own host window (wave 0). Linkless corpus so the
    schedule is exactly the seed list; VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    urls = [f'http://{h}.example.com/page' for h in ('a', 'b', 'c')]
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'body', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u in urls
    ], CORPUS_SCHEMA)
    host_ips = spark.createDataFrame(
        [('a.example.com', '10.0.0.1'), ('b.example.com', '10.0.0.1')],
        'host string, ip string')
    cfg = CrawlConfig(max_dispatch_per_host_per_wave=1, max_waves=3,
                      politeness_scope='ip')
    res = CrawlEngine(spark, corpus, config=cfg, host_ips=host_ips).run(urls)
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_IP_POLITENESS = """
SELECT * FROM (VALUES
  ('http://a.example.com/page', 0, 'reachable'),
  ('http://c.example.com/page', 0, 'reachable'),
  ('http://b.example.com/page', 1, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_priority_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-aware global cap: with frontier_priority set,
    max_dispatch_per_wave dequeues the globally HIGHEST-scored URLs first
    across hosts (scheduling.topk_by_score — range-repartition on the
    order key, per-partition counts, only the straddling partition
    ranks), instead of the FIFO dense-priority histogram. Three seeds
    with score=length(url): dispatch order is the inverse of seed order.
    VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    urls = ['http://a.com/1', 'http://b.com/22', 'http://c.com/333']
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u in urls
    ], CORPUS_SCHEMA)
    cfg = CrawlConfig(max_dispatch_per_wave=1, max_waves=3,
                      frontier_priority='length(url)')
    res = CrawlEngine(spark, corpus, config=cfg).run(urls)
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_PRIORITY_GLOBAL = """
SELECT * FROM (VALUES
  ('http://c.com/333', 0, 'reachable'),
  ('http://b.com/22', 1, 'reachable'),
  ('http://a.com/1', 2, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_host_budget_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injectable per-host budget table (CrawlEngine(host_budgets=...)),
    the consumer side of scheduling.plan_host_budgets: effective budget =
    least(uniform knob, table); unmapped hosts are unbounded-by-table.
    a.com capped at 1/wave by the table (knob 2), b.com at 2/wave by the
    knob (table 9). VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    urls = [f'http://{h}/p{i}' for h in ('a.com', 'b.com') for i in range(3)]
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u in urls
    ], CORPUS_SCHEMA)
    budgets = spark.createDataFrame([('a.com', 1), ('b.com', 9)],
                                    'host string, budget int')
    cfg = CrawlConfig(max_waves=4, max_dispatch_per_host_per_wave=2)
    res = CrawlEngine(spark, corpus, config=cfg, host_budgets=budgets).run(urls)
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_HOST_BUDGET_TABLE = """
SELECT * FROM (VALUES
  ('http://a.com/p0', 0, 'reachable'),
  ('http://a.com/p1', 1, 'reachable'),
  ('http://a.com/p2', 2, 'reachable'),
  ('http://b.com/p0', 0, 'reachable'),
  ('http://b.com/p1', 0, 'reachable'),
  ('http://b.com/p2', 1, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_rank_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frontier_priority='host_rank' — the adaptive-crawl loop closed
    with the engine's own lineage: run 1 crawls a hub on host a citing
    host b three times (link lineage persisted); run 2 on the SAME store
    seeds one new URL per host under a global cap of 1/wave, and the
    CITED host's URL dispatches first (PageRank over the persisted
    lineage, frozen at run start), where FIFO would have picked the
    earlier seed. VALUES oracle."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    def doc(u, spans):
        return {'doc_id': u, 'spans': spans, 'http_status': 200,
                'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}

    def text(t):
        return {'kind': 'text', 'text': t, 'media_ref': None, 'offset': 0}

    def link(u):
        return {'kind': 'link', 'text': u, 'media_ref': None, 'offset': 0}

    store = SnapshotStore(tempfile.mkdtemp(prefix='rank-recrawl-'))
    corpus1 = spark.createDataFrame([
        doc('http://a.com/root',
            [text('hub'), link('http://b.com/x'), link('http://b.com/y'),
             link('http://b.com/z')]),
    ], CORPUS_SCHEMA)
    CrawlEngine(spark, corpus1, config=CrawlConfig(max_waves=1),
                store=store).run(['http://a.com/root'])

    corpus2 = spark.createDataFrame(
        [doc('http://a.com/new', [text('na')]),
         doc('http://b.com/new', [text('nb')])], CORPUS_SCHEMA)
    cfg = CrawlConfig(max_waves=2, max_dispatch_per_wave=1,
                      frontier_priority='host_rank')
    res = CrawlEngine(spark, corpus2, config=cfg, store=store).run(
        ['http://a.com/new', 'http://b.com/new'])
    return res.seen.filter(F.col('url').endswith('/new')).select(
        'url', 'wave', 'status')


ORACLE_CRAWL_RANK_RECRAWL = """
SELECT * FROM (VALUES
  ('http://b.com/new', 0, 'reachable'),
  ('http://a.com/new', 1, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_opic_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frontier_priority='opic' — WITHIN-RUN adaptive ordering from the
    engine's incremental OPIC state: the wave-0 hub cites c.com first
    (FIFO would dispatch it next) but cites b.com twice, so after the
    wave-0 cash distribution b.com's importance is higher and the global
    cap of 1/wave dispatches b.com/x at wave 1, c.com/x at wave 2.
    VALUES oracle; the FIFO counterfactual is pinned by
    tests/test_opic_engine.py."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    def doc(u, spans):
        return {'doc_id': u, 'spans': spans, 'http_status': 200,
                'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}

    def text(t):
        return {'kind': 'text', 'text': t, 'media_ref': None, 'offset': 0}

    def link(u):
        return {'kind': 'link', 'text': u, 'media_ref': None, 'offset': 0}

    corpus = spark.createDataFrame([
        doc('http://a.com/root',
            [text('hub'), link('http://c.com/x'),
             link('http://b.com/x'), link('http://b.com/x')]),
        doc('http://b.com/x', [text('b')]),
        doc('http://c.com/x', [text('c')]),
    ], CORPUS_SCHEMA)
    cfg = CrawlConfig(max_waves=3, max_dispatch_per_wave=1,
                      frontier_priority='opic')
    res = CrawlEngine(spark, corpus, config=cfg,
                      store=SnapshotStore(tempfile.mkdtemp())).run(
        ['http://a.com/root'])
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_OPIC = """
SELECT * FROM (VALUES
  ('http://a.com/root', 0, 'reachable'),
  ('http://b.com/x', 1, 'reachable'),
  ('http://c.com/x', 2, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_sitemap_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.follow_sitemaps through the full engine: the seed
    host's robots.txt ``Sitemap:`` directive points at a sitemapindex,
    whose child urlset lists two documents (one CDATA-wrapped loc, one
    plain) plus an ftp loc that must drop. Discovered URLs join the
    wave-0 frontier after the explicit seed, densely prioritized in
    publication order. VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

    index = ('<?xml version="1.0"?><sitemapindex>\n'
             '<sitemap><loc> http://s.com/sm1.xml </loc></sitemap>\n'
             '</sitemapindex>')
    sm1 = ('<?xml version="1.0"?><urlset>\n'
           '<url><loc><![CDATA[http://s.com/d1]]></loc>'
           '<lastmod>2026-01-01</lastmod></url>\n'
           '<url><loc>http://s.com/d2</loc></url>\n'
           '<url><loc>ftp://s.com/skip-me</loc></url>\n'
           '</urlset>')
    corpus = spark.createDataFrame([
        {'doc_id': u,
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for u in ('http://s.com/home', 'http://s.com/d1', 'http://s.com/d2')
    ], CORPUS_SCHEMA)
    robots = spark.createDataFrame(
        [('s.com', 200,
          'User-agent: *\nAllow: /\nSitemap: http://s.com/index.xml')],
        ROBOTS_SCHEMA)
    pages = spark.createDataFrame(
        [('http://s.com/index.xml', index), ('http://s.com/sm1.xml', sm1)],
        'url string, body string')
    cfg = CrawlConfig(follow_sitemaps=True, max_waves=1)
    res = CrawlEngine(spark, corpus, robots, cfg, sitemap_pages=pages).run(
        ['http://s.com/home'])
    return res.seen.select('url', 'wave',
                           F.col('priority').cast('long').alias('priority'),
                           'status')


ORACLE_CRAWL_SITEMAP_BOOTSTRAP = """
SELECT * FROM (VALUES
  ('http://s.com/home', 0, CAST(0 AS BIGINT), 'reachable'),
  ('http://s.com/d1', 0, CAST(1 AS BIGINT), 'reachable'),
  ('http://s.com/d2', 0, CAST(2 AS BIGINT), 'reachable')
) AS t(url, wave, priority, status)
"""


def q_crawl_feed_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.follow_feeds through the full engine: one RSS page
    (CDATA link, an ftp link that must drop) and one Atom page (with a
    duplicate of an RSS link) expand the wave-0 frontier after the
    explicit seed, densely prioritized in (feed_url, pos) publication
    order with first-appearance dedup. VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    rss = ('<rss><channel>\n'
           '<item><link>http://n.com/a1</link><guid>g1</guid></item>\n'
           '<item><link><![CDATA[http://n.com/a2]]></link></item>\n'
           '<item><link>ftp://n.com/skip</link></item>\n'
           '</channel></rss>')
    atom = ('<feed>\n'
            '<entry><link href="http://n.com/b1"/></entry>\n'
            '<entry><link href="http://n.com/a1"/></entry>\n'
            '</feed>')
    corpus = spark.createDataFrame([
        {'doc_id': f'http://n.com/{p}',
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for p in ('home', 'a1', 'a2', 'b1')
    ], CORPUS_SCHEMA)
    pages = spark.createDataFrame(
        [('http://n.com/rss.xml', rss), ('http://n.com/atom.xml', atom)],
        'url string, body string')
    cfg = CrawlConfig(follow_feeds=True, max_waves=1)
    res = CrawlEngine(spark, corpus, config=cfg, feed_pages=pages).run(
        ['http://n.com/home'])
    return res.seen.select('url', 'wave',
                           F.col('priority').cast('long').alias('priority'),
                           'status')


ORACLE_CRAWL_FEED_BOOTSTRAP = """
SELECT * FROM (VALUES
  ('http://n.com/home', 0, CAST(0 AS BIGINT), 'reachable'),
  ('http://n.com/b1', 0, CAST(1 AS BIGINT), 'reachable'),
  ('http://n.com/a1', 0, CAST(2 AS BIGINT), 'reachable'),
  ('http://n.com/a2', 0, CAST(3 AS BIGINT), 'reachable')
) AS t(url, wave, priority, status)
"""


def q_crawl_score_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.score_aging_per_wave through the full engine: a
    low-scored URL (b.com, score 1) facing a stream of fresh high-scored
    arrivals (an a.com link chain discovers one score-10 page per wave
    under a global cap of 1) ages 5/wave from its own enqueue wave and
    outbids the fresh arrival at wave 2 (1 + 2x5 = 11 > 10) — without
    aging it would starve until the chain runs dry. VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    def span(kind, text):
        return {'kind': kind, 'text': text, 'media_ref': None, 'offset': 0}

    corpus = spark.createDataFrame([
        {'doc_id': 'http://a.com/1',
         'spans': [span('text', 'p'), span('link', 'http://a.com/2')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'http://a.com/2',
         'spans': [span('text', 'p'), span('link', 'http://a.com/3')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'http://a.com/3', 'spans': [span('text', 'p')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
        {'doc_id': 'http://b.com/x', 'spans': [span('text', 'p')],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0},
    ], CORPUS_SCHEMA)
    cfg = CrawlConfig(
        max_dispatch_per_wave=1, max_waves=6,
        frontier_priority="CASE WHEN host = 'a.com' THEN 10.0 ELSE 1.0 END",
        score_aging_per_wave=5.0)
    res = CrawlEngine(spark, corpus, config=cfg).run(
        ['http://a.com/1', 'http://b.com/x'])
    return res.seen.select('url', 'wave', 'status')


ORACLE_CRAWL_SCORE_AGING = """
SELECT * FROM (VALUES
  ('http://a.com/1', 0, 'reachable'),
  ('http://a.com/2', 1, 'reachable'),
  ('http://b.com/x', 2, 'reachable'),
  ('http://a.com/3', 3, 'reachable')
) AS t(url, wave, status)
"""


def q_crawl_robots_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlEngine.refresh_robots — robots-decision TTL (RFC 9309 §2.4
    caching): run 1 under deny-all records the host as excluded; run 2
    with an UPDATED allow-all robots table still honors the cached
    verdict (cache semantics); run 3 after refresh_robots() re-evaluates
    against the current table and fetches. One store, three runs, VALUES
    oracle over the final seen set."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA, ROBOTS_SCHEMA

    corpus = spark.createDataFrame([
        {'doc_id': f'http://h.com/{p}',
         'spans': [{'kind': 'text', 'text': 'x', 'media_ref': None, 'offset': 0}],
         'http_status': 200, 'scheme': 'http', 'readable': None, 'fetch_ms': 1.0}
        for p in ('a', 'b', 'c')
    ], CORPUS_SCHEMA)

    def robots(rules):
        return spark.createDataFrame([('h.com', 200, rules)], ROBOTS_SCHEMA)

    deny = 'User-agent: *\nDisallow: /'
    allow = 'User-agent: *\nAllow: /'
    store = SnapshotStore(tempfile.mkdtemp(prefix='robots-refresh-'))
    cfg = CrawlConfig(follow_robots_txt=True, max_waves=1)
    CrawlEngine(spark, corpus, robots(deny), cfg, store).run(['http://h.com/a'])
    CrawlEngine(spark, corpus, robots(allow), cfg, store).run(['http://h.com/b'])
    engine3 = CrawlEngine(spark, corpus, robots(allow), cfg, store)
    engine3.refresh_robots()
    res = engine3.run(['http://h.com/c'])
    return res.seen.select('url', 'status')


ORACLE_CRAWL_ROBOTS_REFRESH = """
SELECT * FROM (VALUES
  ('http://h.com/a', 'robots_excluded'),
  ('http://h.com/b', 'robots_excluded'),
  ('http://h.com/c', 'reachable')
) AS t(url, status)
"""


def q_crawl_canonicalized_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.canonicalize_urls through the full engine: with the
    flag on, a ?utm_source= seed variant collapses into the clean URL's
    frontier entry (ONE seen row, first-enqueue priority); with it off,
    reference literal-URL dedup keeps both (the variant misses the corpus
    and lands unreachable). Deterministic VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    seeds = ['http://quotes.com', 'http://quotes.com?utm_source=news&fbclid=x']
    out = None
    for flag in (True, False):
        cfg = CrawlConfig(link_rule='second_contains_page', max_waves=1,
                          canonicalize_urls=flag)
        res = CrawlEngine(spark, golden_site(spark, 'http'), config=cfg).run(seeds)
        part = res.seen.select(
            F.lit(flag).alias('canonicalize'), 'url', 'status',
            F.col('priority').cast('long').alias('priority'))
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CANONICALIZED_SEEN = """
SELECT * FROM (VALUES
  (TRUE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com?utm_source=news&fbclid=x', 'unreachable', CAST(1 AS BIGINT))
) AS t(canonicalize, url, status, priority)
"""


def q_crawl_dust_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlEngine(dust_rules=...) through the full engine: with a mined
    (quotes.com, sess) rule injected, a ?sess= alias seed collapses into
    the clean URL's frontier entry before seen-keying and fetch; without
    rules, reference literal-URL dedup keeps both and the alias lands
    unreachable. Deterministic VALUES oracle."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    seeds = ['http://quotes.com', 'http://quotes.com?sess=zz9']
    rules = spark.createDataFrame(
        [('quotes.com', 'sess', 5)],
        'host STRING, param STRING, support LONG')
    out = None
    for with_rules in (True, False):
        cfg = CrawlConfig(link_rule='second_contains_page', max_waves=1)
        res = CrawlEngine(
            spark, golden_site(spark, 'http'), config=cfg,
            dust_rules=rules if with_rules else None).run(seeds)
        part = res.seen.select(
            F.lit(with_rules).alias('dust'), 'url', 'status',
            F.col('priority').cast('long').alias('priority'))
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CRAWL_DUST = """
SELECT * FROM (VALUES
  (TRUE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com?sess=zz9', 'unreachable', CAST(1 AS BIGINT))
) AS t(dust, url, status, priority)
"""


def q_crawl_canonical_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlEngine(canonical_map=...) through the full engine: with a
    resolved rel=canonical fold injected (print-view page → clean page),
    the alias seed collapses into the canonical URL's frontier entry
    before seen-keying and fetch; without the map, reference literal-URL
    dedup keeps both and the alias lands unreachable. Deterministic
    VALUES oracle (same structure as crawl_dust_alias — the two engine
    knobs share the _canonicalized integration point)."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import golden_site

    seeds = ['http://quotes.com', 'http://quotes.com/print/home']
    cmap = spark.createDataFrame(
        [('http://quotes.com/print/home', 'http://quotes.com')],
        'src STRING, dst STRING')
    out = None
    for with_map in (True, False):
        cfg = CrawlConfig(link_rule='second_contains_page', max_waves=1)
        res = CrawlEngine(
            spark, golden_site(spark, 'http'), config=cfg,
            canonical_map=cmap if with_map else None).run(seeds)
        part = res.seen.select(
            F.lit(with_map).alias('folded'), 'url', 'status',
            F.col('priority').cast('long').alias('priority'))
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CRAWL_CANONICAL_FOLD = """
SELECT * FROM (VALUES
  (TRUE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com', 'reachable', CAST(0 AS BIGINT)),
  (FALSE, 'http://quotes.com/print/home', 'unreachable', CAST(1 AS BIGINT))
) AS t(folded, url, status, priority)
"""


def q_crawl_meta_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlConfig.respect_meta_robots through the full engine: a p1 ->
    p2 -> p3 chain where p1 is noindex and p2 is nofollow. Respected,
    p1 emits no items (fetch/links unaffected) and p2's endorsement of
    p3 is void, so p3 is never discovered; unrespected, the identical
    tagged corpus crawls and indexes everything — pinned by a
    deterministic VALUES oracle over both runs' seen rows and items."""
    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.sources.corpus import CORPUS_SCHEMA

    def doc(u, spans, tag):
        return {'doc_id': u, 'spans': spans, 'http_status': 200,
                'scheme': 'http', 'readable': None, 'fetch_ms': 1.0,
                'robots_tag': tag}

    def span(kind, text, off):
        return {'kind': kind, 'text': text, 'media_ref': None,
                'offset': off}

    schema = CORPUS_SCHEMA.add('robots_tag', 'string')
    corpus = spark.createDataFrame([
        doc('http://a.com/p1',
            [span('text', 'q1', 0), span('text', 'a1', 1),
             span('link', 'http://a.com/p2', 2)], 'noindex'),
        doc('http://a.com/p2',
            [span('text', 'q2', 0), span('text', 'a2', 1),
             span('link', 'http://a.com/p3', 2)], 'nofollow'),
        doc('http://a.com/p3',
            [span('text', 'q3', 0), span('text', 'a3', 1)], None),
    ], schema)
    out = None
    for respected in (True, False):
        cfg = CrawlConfig(max_waves=4, respect_meta_robots=respected)
        res = CrawlEngine(spark, corpus, config=cfg).run(['http://a.com/p1'])
        seen_part = res.seen.select(
            F.lit(respected).alias('respected'), F.lit('seen').alias('kind'),
            F.concat('url', F.lit(':'), 'status').alias('key'))
        item_part = res.items.select(
            F.lit(respected).alias('respected'), F.lit('item').alias('kind'),
            F.concat('doc_id', F.lit(':'), 'quote').alias('key'))
        part = seen_part.unionByName(item_part)
        out = part if out is None else out.unionByName(part)
    return out


ORACLE_CRAWL_META_ROBOTS = """
SELECT * FROM (VALUES
  (TRUE,  'seen', 'http://a.com/p1:reachable'),
  (TRUE,  'seen', 'http://a.com/p2:reachable'),
  (TRUE,  'item', 'http://a.com/p2:q2'),
  (FALSE, 'seen', 'http://a.com/p1:reachable'),
  (FALSE, 'seen', 'http://a.com/p2:reachable'),
  (FALSE, 'seen', 'http://a.com/p3:reachable'),
  (FALSE, 'item', 'http://a.com/p1:q1'),
  (FALSE, 'item', 'http://a.com/p2:q2'),
  (FALSE, 'item', 'http://a.com/p3:q3')
) AS t(respected, kind, key)
"""


def q_media_sniff_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content-type sniffing (multimodal.sniff_content_type)
    over deterministic synthetic payloads: 14 header families (JPEG,
    PNG, GIF87a/89a, RIFF→WEBP, RIFF→WAV, PDF, gzip, isom-brand MP4,
    ID3 MP3, mixed-case whitespace-led HTML ×2, AVIF and M4A ftyp
    brands, unknown) built as hex strings from doc_id and unhexed into
    real binary. Spark sniffs the BYTES; the DuckDB twin classifies
    the same hex with an independent CASE — the markup families decode
    back to VARCHAR so the WHATWG whitespace/case tolerance is
    recomputed, and the ftyp brand split (AVIF/HEIC/M4A vs MP4) plus
    the RIFF tag probe are both pinned."""
    from scalpel_spark.operators.multimodal import sniff_content_type

    d = F.col('d')
    filler = F.upper(F.substring(F.md5(d.cast('string')), 1, 8))
    # hex('<!DocType HTML pub') / hex('  \n<HTML><p>') / hex('ftypavif')
    # / hex('ftypM4A ') below — WHATWG case/whitespace fidelity and the
    # ISO-BMFF brand split are part of the oracle-checked surface
    hexpay = (
        F.when(d % 14 == 0, F.concat(F.lit('FFD8FFE0'), filler))
        .when(d % 14 == 1, F.concat(F.lit('89504E470D0A1A0A'), filler))
        .when(d % 14 == 2, F.concat(F.lit('474946383761'), filler))
        .when(d % 14 == 3, F.concat(F.lit('474946383961'), filler))
        .when(d % 14 == 4, F.concat(F.lit('52494646'), filler,
                                    F.lit('57454250')))
        .when(d % 14 == 5, F.concat(F.lit('52494646'), filler,
                                    F.lit('57415645')))
        .when(d % 14 == 6, F.concat(F.lit('25504446'), filler))
        .when(d % 14 == 7, F.concat(F.lit('1F8B08'), filler))
        .when(d % 14 == 8, F.concat(F.lit('0000001866747970'), filler))
        .when(d % 14 == 9, F.concat(F.lit('494433'), filler))
        .when(d % 14 == 10,
              F.lit('3C21446F63547970652048544D4C20707562'))
        .when(d % 14 == 11, F.lit('20200A3C48544D4C3E3C703E'))
        .when(d % 14 == 12, F.concat(F.lit('0000001C667479706176696606'),
                                     filler))
        .when(d % 14 == 13, F.concat(F.lit('0000001C667479704D344120'),
                                     filler))
        .otherwise(F.concat(F.lit('DEADBEEF'), filler)))
    docs = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('d'))
    out = docs.select(
        d, sniff_content_type(F.unhex(hexpay)).alias('content_type'))
    return out.groupBy('content_type').agg(
        F.count('*').alias('n'), F.min('d').alias('min_d'))


ORACLE_MEDIA_SNIFF = """
WITH doc AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
p AS (SELECT d,
  CASE
    WHEN d % 14 = 0 THEN 'FFD8FFE0' || f
    WHEN d % 14 = 1 THEN '89504E470D0A1A0A' || f
    WHEN d % 14 = 2 THEN '474946383761' || f
    WHEN d % 14 = 3 THEN '474946383961' || f
    WHEN d % 14 = 4 THEN '52494646' || f || '57454250'
    WHEN d % 14 = 5 THEN '52494646' || f || '57415645'
    WHEN d % 14 = 6 THEN '25504446' || f
    WHEN d % 14 = 7 THEN '1F8B08' || f
    WHEN d % 14 = 8 THEN '0000001866747970' || f
    WHEN d % 14 = 9 THEN '494433' || f
    WHEN d % 14 = 10 THEN '3C21446F63547970652048544D4C20707562'
    WHEN d % 14 = 11 THEN '20200A3C48544D4C3E3C703E'
    WHEN d % 14 = 12 THEN '0000001C667479706176696606' || f
    WHEN d % 14 = 13 THEN '0000001C667479704D344120' || f
    ELSE 'DEADBEEF' || f
  END AS hx
  FROM (SELECT d, UPPER(SUBSTR(md5(CAST(d AS VARCHAR)), 1, 8)) AS f
        FROM doc)),
-- markup families decode to VARCHAR (pure ASCII) so the WHATWG
-- whitespace-skip + case-insensitive tag match is recomputed
-- independently, not assumed from the generating rule
c AS (SELECT d, hx,
  CASE WHEN d % 14 IN (10, 11) THEN decode(unhex(hx)) END AS body
  FROM p),
t AS (SELECT d, CASE
    WHEN hx LIKE 'FFD8FF%' THEN 'image/jpeg'
    WHEN hx LIKE '89504E470D0A1A0A%' THEN 'image/png'
    WHEN hx LIKE '474946383761%' OR hx LIKE '474946383961%'
      THEN 'image/gif'
    WHEN hx LIKE '25504446%' THEN 'application/pdf'
    WHEN hx LIKE '1F8B%' THEN 'application/gzip'
    WHEN hx LIKE '504B0304%' THEN 'application/zip'
    WHEN hx LIKE '4F676753%' THEN 'audio/ogg'
    WHEN hx LIKE '494433%' THEN 'audio/mpeg'
    WHEN hx LIKE '1A45DFA3%' THEN 'video/webm'
    WHEN hx LIKE '52494646%' AND SUBSTR(hx, 17, 8) = '57454250'
      THEN 'image/webp'
    WHEN hx LIKE '52494646%' AND SUBSTR(hx, 17, 8) = '57415645'
      THEN 'audio/wav'
    WHEN hx LIKE '52494646%' AND SUBSTR(hx, 17, 8) = '41564920'
      THEN 'video/avi'
    WHEN SUBSTR(hx, 9, 8) = '66747970' THEN
      CASE SUBSTR(hx, 17, 8)
        WHEN '61766966' THEN 'image/avif'
        WHEN '61766973' THEN 'image/avif'
        WHEN '68656963' THEN 'image/heic'
        WHEN '68656978' THEN 'image/heic'
        WHEN '6D696631' THEN 'image/heic'
        WHEN '4D344120' THEN 'audio/mp4'
        ELSE 'video/mp4' END
    WHEN body IS NOT NULL AND regexp_matches(lower(body),
      '^[\\t\\n\\x0c\\r ]*<\\?xml') THEN 'application/xml'
    WHEN body IS NOT NULL AND regexp_matches(lower(body),
      '^[\\t\\n\\x0c\\r ]*<(?:!doctype html|html|head|body|script|iframe|'
      || 'h1|div|font|table|style|title|br|b|p|a|!--)[ >]')
      THEN 'text/html'
    ELSE 'application/octet-stream'
  END AS content_type FROM c)
SELECT content_type, COUNT(*) AS n, MIN(d) AS min_d
FROM t GROUP BY content_type
"""


def q_media_sniff_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing (multimodal.sniff_charset) over deterministic
    synthetic payloads crossing 6 BOM states (none / UTF-8 / UTF-16
    both endians / UTF-32 both endians) with 4 body families (meta
    charset, http-equiv charset, plain ASCII, high-byte latin-1).
    Spark sniffs real BYTES (BOM hex + latin-1-encoded body); the
    DuckDB twin re-derives the verdict from the same body STRING with
    its own regex/ASCII checks and the BOM rule — so the precedence
    ladder, both meta forms, and the windows-1252 default are all
    oracle-checked."""
    from scalpel_spark.operators.multimodal import sniff_charset

    d = F.col('d')
    filler = F.substring(F.md5(d.cast('string')), 1, 8)
    html = (
        F.when(d % 4 == 0,
               F.concat(F.lit('<meta charset="shift_jis"><p>'), filler))
        .when(d % 4 == 1,
              F.concat(F.lit('<meta http-equiv="content-type" '
                             'content="text/html; charset=ISO-8859-2"><p>'),
                       filler))
        .when(d % 4 == 2, F.concat(F.lit('<p>plain '), filler))
        .otherwise(F.concat(F.lit('café '), filler)))
    bom = (
        F.when(d % 6 == 1, 'EFBBBF')
        .when(d % 6 == 2, 'FEFF')
        .when(d % 6 == 3, 'FFFE')
        .when(d % 6 == 4, '0000FEFF')
        .when(d % 6 == 5, 'FFFE0000')
        .otherwise(''))
    payload = F.unhex(F.concat(bom, F.hex(F.encode(html, 'ISO-8859-1'))))
    docs = _t(spark, sf_dir, 'documents').select(
        F.col('doc_id').cast('long').alias('d'))
    out = docs.select(d, sniff_charset(payload).alias('charset'))
    return out.groupBy('charset').agg(
        F.count('*').alias('n'), F.min('d').alias('min_d'))


ORACLE_MEDIA_CHARSET = """
WITH doc AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
p AS (SELECT d, d % 6 AS bom,
  CASE
    WHEN d % 4 = 0 THEN '<meta charset="shift_jis"><p>' || f
    WHEN d % 4 = 1 THEN '<meta http-equiv="content-type" '
      || 'content="text/html; charset=ISO-8859-2"><p>' || f
    WHEN d % 4 = 2 THEN '<p>plain ' || f
    ELSE 'café ' || f
  END AS html
  FROM (SELECT d, SUBSTR(md5(CAST(d AS VARCHAR)), 1, 8) AS f FROM doc)),
c AS (SELECT d, CASE
    WHEN bom = 1 THEN 'utf-8'
    WHEN bom = 2 THEN 'utf-16be'
    WHEN bom = 3 THEN 'utf-16le'
    WHEN bom = 4 THEN 'utf-32be'
    WHEN bom = 5 THEN 'utf-32le'
    WHEN regexp_extract(lower(html),
        '<meta[^>]*?[^a-z0-9_\\-]charset\\s*=\\s*["'']?([a-z0-9_\\-]+)',
        1) != ''
      THEN regexp_extract(lower(html),
        '<meta[^>]*?[^a-z0-9_\\-]charset\\s*=\\s*["'']?([a-z0-9_\\-]+)', 1)
    WHEN regexp_matches(html, '^[\\x01-\\x7f]*$') THEN 'ascii'
    ELSE 'windows-1252'
  END AS charset FROM p)
SELECT charset, COUNT(*) AS n, MIN(d) AS min_d FROM c GROUP BY charset
"""


def q_spans_fingerprint_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-sequence fingerprint (operators/spans.py) over the
    reference's golden 3-page site — the north-rule invariant ("span-sequence
    equality (kind, text, media_ref, order) on every emitted document",
    reference parse path core/response.py:77-116) as a map-side 60-bit
    signature.  Deterministic → exact signatures pinned as a VALUES oracle."""
    from scalpel_spark.operators import spans as sp
    from scalpel_spark.sources.corpus import golden_site

    docs = golden_site(spark, 'http')
    return sp.with_span_signature(docs).select(
        'doc_id', 'span_sig', F.size('spans').cast('long').alias('n_spans'))


ORACLE_SPANS_GOLDEN = """
SELECT * FROM (VALUES
  ('http://quotes.com', CAST(706096425200159455 AS BIGINT), CAST(6 AS BIGINT)),
  ('http://quotes.com/page2.html', CAST(760134644376185007 AS BIGINT), CAST(6 AS BIGINT)),
  ('http://quotes.com/page3.html', CAST(765052511856382037 AS BIGINT), CAST(6 AS BIGINT))
) AS t(doc_id, span_sig, n_spans)
"""


def q_spans_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-composition rollup over a 400-page interleaved synthetic corpus
    (operators/spans.span_stats): per-doc text/link/media counts computed
    map-side with array filter/aggregate (no explode), then ONE aggregation
    shuffle over the tiny (n_text, n_media, n_link) key space.  The shape a
    100 TB media-inventory audit would use.  Deterministic VALUES oracle."""
    from scalpel_spark.operators import spans as sp
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=400, n_hosts=8, seed=13)
    return (
        sp.span_stats(corpus)
        .groupBy('n_text', 'n_media', 'n_link')
        .agg(F.count('*').alias('n_docs'), F.sum('text_chars').alias('text_chars'))
    )


ORACLE_SPANS_STATS = """
SELECT * FROM (VALUES
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(73 AS BIGINT), CAST(1965 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(49 AS BIGINT), CAST(1346 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(73 AS BIGINT), CAST(1999 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(64 AS BIGINT), CAST(1748 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(38 AS BIGINT), CAST(1034 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(40 AS BIGINT), CAST(1081 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(31 AS BIGINT), CAST(865 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(32 AS BIGINT), CAST(866 AS BIGINT))
) AS t(n_text, n_media, n_link, n_docs, text_chars)
"""


def q_spans_parity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed span-sequence parity audit (operators/spans.span_parity):
    left = a 300-page corpus; right = the same corpus with deterministic
    faults injected in pure column algebra — docs with xxhash64(doc_id)%7==0
    lose their last span (mismatch), %7==1 are deleted (left_only), and ten
    extra pages are appended (right_only).  Each side reduces map-side to
    (doc_id, signature); the single full-outer join shuffles 16 bytes/row —
    the plan a 10^10-doc emitted-vs-source audit needs.  VALUES oracle pins
    the 4-way classification counts."""
    from scalpel_spark.operators import spans as sp
    from scalpel_spark.sources.corpus import synthetic_corpus

    left = synthetic_corpus(spark, n_pages=300, n_hosts=8, seed=5)
    bucket = F.pmod(F.xxhash64('doc_id'), F.lit(7))
    mutated = left.withColumn(
        'spans',
        F.when(bucket == 0, F.slice('spans', 1, F.size('spans') - 1)).otherwise(F.col('spans')),
    ).filter(bucket != 1)
    extra = (
        synthetic_corpus(spark, n_pages=310, n_hosts=8, seed=5)
        .filter(F.regexp_extract('doc_id', r'/p(\d+)\.html$', 1).cast('int') >= 300)
    )
    right = mutated.unionByName(extra)
    return sp.span_parity_summary(left, right)


ORACLE_SPANS_PARITY = """
SELECT * FROM (VALUES
  ('left_only', CAST(35 AS BIGINT)),
  ('match', CAST(229 AS BIGINT)),
  ('mismatch', CAST(36 AS BIGINT)),
  ('right_only', CAST(10 AS BIGINT))
) AS t(status, n_docs)
"""


def q_content_media_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-caption alignment over interleaved spans
    (operators/content.media_captions): every media span gets the nearest
    text span as its caption candidate (both directions, tie to prev, NULL
    past max_gap).  The corpus is mutated in pure column algebra so all
    three outcomes occur: bucket 0 docs keep their layout (caption = the
    preceding author span), bucket 1 docs lose every text span (no
    caption), bucket 2 docs lose their text spans but gain a trailing
    caption span (side='next', gap = 1 + n_links, so max_gap=3 splits the
    bucket into captioned and uncaptioned halves).  One doc_id shuffle of
    slim rows; per-doc windows cannot skew.  Deterministic VALUES oracle
    over the (caption_side, gap) histogram."""
    from scalpel_spark.operators.content import media_captions
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=240, n_hosts=8, seed=21)
    bucket = F.pmod(F.xxhash64('doc_id'), F.lit(3))
    no_text = F.filter('spans', lambda s: s['kind'] != 'text')
    tail = F.array(F.struct(
        F.lit('text').alias('kind'),
        F.lit('trailing caption').alias('text'),
        F.lit(None).cast('string').alias('media_ref'),
        F.lit(99).cast('int').alias('offset')))
    mutated = corpus.withColumn(
        'spans',
        F.when(bucket == 1, no_text)
        .when(bucket == 2, F.concat(no_text, tail))
        .otherwise(F.col('spans')))
    return (
        media_captions(mutated, max_gap=3)
        .groupBy(F.coalesce('caption_side', F.lit('none')).alias('caption_side'),
                 F.coalesce('gap', F.lit(-1)).alias('gap'))
        .agg(F.count('*').alias('n_media'),
             F.count_distinct('caption').alias('n_captions'))
    )


ORACLE_CONTENT_CAPTIONS = """
SELECT * FROM (VALUES
  ('none', CAST(-1 AS INTEGER), CAST(36 AS BIGINT), CAST(0 AS BIGINT)),
  ('next', CAST(2 AS INTEGER), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  ('next', CAST(3 AS INTEGER), CAST(16 AS BIGINT), CAST(1 AS BIGINT)),
  ('prev', CAST(1 AS INTEGER), CAST(24 AS BIGINT), CAST(5 AS BIGINT))
) AS t(caption_side, gap, n_media, n_captions)
"""


def q_content_main_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-run boilerplate removal (operators/content.extract_main_content):
    the Boilerpipe-family block link-density rule restated over span runs —
    a maximal run of >= 3 link spans is navigation, everything else is
    content; the cleaned doc is the surviving text spans concatenated in
    span order.  links_per_page=6 makes nav runs of 1..6 so both sides of
    the threshold occur.  Gaps-and-islands run detection: one doc_id
    shuffle, three per-document windows, no self-join.  Deterministic
    VALUES oracle over the (n_content, n_boiler) histogram."""
    from scalpel_spark.operators.content import extract_main_content
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=300, n_hosts=8, seed=33,
                              links_per_page=6)
    return (
        extract_main_content(corpus, min_link_run=3)
        .groupBy('n_content', 'n_boiler')
        .agg(F.count('*').alias('n_docs'),
             F.sum('content_chars').alias('content_chars'))
    )


ORACLE_CONTENT_MAIN = """
SELECT * FROM (VALUES
  (CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(34 AS BIGINT), CAST(915 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(4 AS BIGINT), CAST(38 AS BIGINT), CAST(1056 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(5 AS BIGINT), CAST(35 AS BIGINT), CAST(958 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(6 AS BIGINT), CAST(35 AS BIGINT), CAST(959 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(35 AS BIGINT), CAST(962 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(16 AS BIGINT), CAST(427 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(4 AS BIGINT), CAST(23 AS BIGINT), CAST(629 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(13 AS BIGINT), CAST(362 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(6 AS BIGINT), CAST(13 AS BIGINT), CAST(360 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(44 AS BIGINT), CAST(1211 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(0 AS BIGINT), CAST(14 AS BIGINT), CAST(380 AS BIGINT))
) AS t(n_content, n_boiler, n_docs, content_chars)
"""


def q_content_host_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-page template detection (operators/content.host_templates):
    spans rendering identically on >= 90% of a host's pages are sitewide
    furniture.  Each host gets a deterministic 2-span nav prefix injected
    in column algebra (host-specific hrefs), so exactly those two
    fingerprints cross the threshold on every host while per-page body
    spans never do.  Plan: explode -> distinct(host, fp, doc) -> ONE
    groupBy(host, fp) + broadcast host page counts; no doc x doc pair.
    Deterministic VALUES oracle over the full template table."""
    from scalpel_spark.operators.content import host_templates
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=4, seed=7)
    host = F.parse_url('doc_id', F.lit('HOST'))
    nav = F.array(
        F.struct(F.lit('link').alias('kind'),
                 F.concat(F.lit('http://'), host, F.lit('/')).alias('text'),
                 F.lit(None).cast('string').alias('media_ref'),
                 F.lit(-2).cast('int').alias('offset')),
        F.struct(F.lit('link').alias('kind'),
                 F.concat(F.lit('http://'), host, F.lit('/about.html')).alias('text'),
                 F.lit(None).cast('string').alias('media_ref'),
                 F.lit(-1).cast('int').alias('offset')))
    withnav = corpus.withColumn('spans', F.concat(nav, F.col('spans')))
    return host_templates(withnav, min_pages=4, min_share_pct=90).select(
        'host', 'fp', 'kind', 'sample_text', 'n_docs', 'host_docs', 'share_pct')


ORACLE_CONTENT_TEMPLATES = """
SELECT * FROM (VALUES
  ('h0.example.com', CAST(6341346054008031083 AS BIGINT), 'link', 'http://h0.example.com/', CAST(40 AS BIGINT), CAST(40 AS BIGINT), CAST(100 AS BIGINT)),
  ('h0.example.com', CAST(9108160872101987958 AS BIGINT), 'link', 'http://h0.example.com/about.html', CAST(40 AS BIGINT), CAST(40 AS BIGINT), CAST(100 AS BIGINT)),
  ('h1.example.com', CAST(-5493335317970876929 AS BIGINT), 'link', 'http://h1.example.com/', CAST(45 AS BIGINT), CAST(45 AS BIGINT), CAST(100 AS BIGINT)),
  ('h1.example.com', CAST(-7010897346392040571 AS BIGINT), 'link', 'http://h1.example.com/about.html', CAST(45 AS BIGINT), CAST(45 AS BIGINT), CAST(100 AS BIGINT)),
  ('h2.example.com', CAST(-7558091202258537457 AS BIGINT), 'link', 'http://h2.example.com/', CAST(56 AS BIGINT), CAST(56 AS BIGINT), CAST(100 AS BIGINT)),
  ('h2.example.com', CAST(7233659841854102501 AS BIGINT), 'link', 'http://h2.example.com/about.html', CAST(56 AS BIGINT), CAST(56 AS BIGINT), CAST(100 AS BIGINT)),
  ('h3.example.com', CAST(-5371414072820680915 AS BIGINT), 'link', 'http://h3.example.com/about.html', CAST(59 AS BIGINT), CAST(59 AS BIGINT), CAST(100 AS BIGINT)),
  ('h3.example.com', CAST(3022689603375581227 AS BIGINT), 'link', 'http://h3.example.com/', CAST(59 AS BIGINT), CAST(59 AS BIGINT), CAST(100 AS BIGINT))
) AS t(host, fp, kind, sample_text, n_docs, host_docs, share_pct)
"""


def q_content_strip_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template stripping (operators/content.strip_templates): the detected
    (host, fp) template set is collected to a bounded per-host fingerprint
    array, broadcast, and applied as a map-side F.filter over the spans
    array — the documents themselves never shuffle, and survivor span
    order is untouched (the north-rule invariant holds on what remains).
    Rolled up per host: docs, spans stripped, spans kept.  Deterministic
    VALUES oracle."""
    from scalpel_spark.operators.content import host_templates, strip_templates
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=4, seed=7)
    host = F.parse_url('doc_id', F.lit('HOST'))
    nav = F.array(
        F.struct(F.lit('link').alias('kind'),
                 F.concat(F.lit('http://'), host, F.lit('/')).alias('text'),
                 F.lit(None).cast('string').alias('media_ref'),
                 F.lit(-2).cast('int').alias('offset')),
        F.struct(F.lit('link').alias('kind'),
                 F.concat(F.lit('http://'), host, F.lit('/about.html')).alias('text'),
                 F.lit(None).cast('string').alias('media_ref'),
                 F.lit(-1).cast('int').alias('offset')))
    withnav = corpus.withColumn('spans', F.concat(nav, F.col('spans')))
    tpl = host_templates(withnav, min_pages=4, min_share_pct=90)
    stripped = strip_templates(withnav, tpl)
    return (
        stripped.groupBy(F.parse_url('doc_id', F.lit('HOST')).alias('host'))
        .agg(F.count('*').alias('n_docs'),
             F.sum('n_stripped').alias('spans_stripped'),
             F.sum(F.size('spans')).cast('long').alias('spans_kept'))
    )


ORACLE_CONTENT_STRIP = """
SELECT * FROM (VALUES
  ('h0.example.com', CAST(40 AS BIGINT), CAST(80 AS BIGINT), CAST(191 AS BIGINT)),
  ('h1.example.com', CAST(45 AS BIGINT), CAST(90 AS BIGINT), CAST(221 AS BIGINT)),
  ('h2.example.com', CAST(56 AS BIGINT), CAST(112 AS BIGINT), CAST(276 AS BIGINT)),
  ('h3.example.com', CAST(59 AS BIGINT), CAST(118 AS BIGINT), CAST(295 AS BIGINT))
) AS t(host, n_docs, spans_stripped, spans_kept)
"""


def q_content_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style (media_ref, caption) pair extraction
    (operators/content.caption_pairs): per distinct media asset, the best
    aligned caption (longest, lexicographic tie) with placement counts —
    the multimodal training-pair table an interleaved corpus yields.
    One groupBy(media_ref) past the caption alignment; rolled up by
    (caption_side, gap) for a compact pinned oracle."""
    from scalpel_spark.operators.content import caption_pairs
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=240, n_hosts=8, seed=21)
    return (
        caption_pairs(corpus)
        .groupBy('caption_side', 'gap')
        .agg(F.count('*').alias('n_assets'),
             F.count_distinct('caption').alias('n_captions'),
             F.sum('n_occurrences').alias('n_placements'))
    )


ORACLE_CAPTION_PAIRS = """
SELECT * FROM (VALUES
  ('prev', CAST(1 AS INTEGER), CAST(83 AS BIGINT), CAST(5 AS BIGINT), CAST(83 AS BIGINT))
) AS t(caption_side, gap, n_assets, n_captions, n_placements)
"""


def q_content_pack_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-aware sequence packing (operators/content.pack_interleaved):
    the GPT-style concat-and-chunk layout with each media span costed at
    a fixed vision-token budget (64), per-doc costing map-side over the
    spans array, global layout via the bucket-decomposed prefix sum (no
    single-task sort, provably n_buckets-invariant —
    tests/test_vocab_pack.py).  Pinned per-sequence rollup."""
    from scalpel_spark.operators.content import pack_interleaved
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=300, n_hosts=8, seed=33)
    return (
        pack_interleaved(corpus, seq_tokens=512, media_tokens=64)
        .groupBy('seq_id')
        .agg(F.count('*').alias('n_docs'),
             F.sum('n_tokens').alias('seq_cost'),
             F.sum('n_media_spans').alias('n_media'),
             F.sum(F.when(F.col('spans_boundary'), 1).otherwise(0))
              .cast('long').alias('n_straddle'))
    )


ORACLE_PACK_INTERLEAVED = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(15 AS BIGINT), CAST(559 AS BIGINT), CAST(8 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(25 AS BIGINT), CAST(466 AS BIGINT), CAST(6 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(22 AS BIGINT), CAST(520 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(18 AS BIGINT), CAST(505 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(18 AS BIGINT), CAST(567 AS BIGINT), CAST(8 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(21 AS BIGINT), CAST(519 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(20 AS BIGINT), CAST(448 AS BIGINT), CAST(6 AS BIGINT), CAST(0 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(45 AS BIGINT), CAST(526 AS BIGINT), CAST(6 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(19 AS BIGINT), CAST(508 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(17 AS BIGINT), CAST(503 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(10 AS BIGINT), CAST(28 AS BIGINT), CAST(538 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(11 AS BIGINT), CAST(25 AS BIGINT), CAST(527 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(12 AS BIGINT), CAST(21 AS BIGINT), CAST(517 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(13 AS BIGINT), CAST(6 AS BIGINT), CAST(146 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT))
) AS t(seq_id, n_docs, seq_cost, n_media, n_straddle)
"""


def q_vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/vocab.bpe_merges — the first 15 BPE merges learned from
    the documents table (Sennrich et al. 2016): ONE distributed word
    count (the only corpus-sized pass) capped by the straddle top-k,
    then the bounded-vocabulary merge loop with (count DESC, pair ASC)
    tie-breaks — deterministic across any partitioning
    (tests/test_vocab_pack.py pins it against an independent reference
    implementation).  Runs over the scale-independent synthetic corpus
    (pinned oracles must not depend on sf — the repo convention), text =
    the interleaved text spans joined in span order."""
    from scalpel_spark.operators.vocab import bpe_merges
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=400, n_hosts=8, seed=5)
    docs = corpus.select(
        'doc_id',
        F.array_join(
            F.transform(F.filter('spans', lambda s: s['kind'] == 'text'),
                        lambda s: s['text']), ' ').alias('text'))
    return bpe_merges(docs, n_merges=15)


ORACLE_BPE_MERGES = """
SELECT * FROM (VALUES
  (CAST(1 AS INTEGER), 't', 'e', CAST(561 AS BIGINT)),
  (CAST(2 AS INTEGER), '-', 'a', CAST(400 AS BIGINT)),
  (CAST(3 AS INTEGER), '-a', 'l', CAST(400 AS BIGINT)),
  (CAST(4 AS INTEGER), '-al', 'p', CAST(400 AS BIGINT)),
  (CAST(5 AS INTEGER), '-alp', 'h', CAST(400 AS BIGINT)),
  (CAST(6 AS INTEGER), '-alph', 'a', CAST(400 AS BIGINT)),
  (CAST(7 AS INTEGER), '-alpha', '</w>', CAST(400 AS BIGINT)),
  (CAST(8 AS INTEGER), 'o', 'te', CAST(400 AS BIGINT)),
  (CAST(9 AS INTEGER), 'ote', '-', CAST(400 AS BIGINT)),
  (CAST(10 AS INTEGER), 'q', 'u', CAST(400 AS BIGINT)),
  (CAST(11 AS INTEGER), 'qu', 'ote-', CAST(400 AS BIGINT)),
  (CAST(12 AS INTEGER), 'i', 'n', CAST(339 AS BIGINT)),
  (CAST(13 AS INTEGER), '.', '</w>', CAST(180 AS BIGINT)),
  (CAST(14 AS INTEGER), 'in', '</w>', CAST(163 AS BIGINT)),
  (CAST(15 AS INTEGER), 's', 'te', CAST(161 AS BIGINT))
) AS t(rank, "left", "right", pair_count)
"""


def q_crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume + Iceberg-style time travel as a driver-checkable diff
    (SURVEY §2 T4, plans/storage.SnapshotStore): run the synthetic crawl
    to wave 2, resume the SAME store to completion, then read the seen
    table VERSION-AS-OF the interruption snapshot (`CrawlResult.as_of`)
    and diff it against the final state — every URL classifies as
    carried (present at the checkpoint, status unchanged) or added by
    the resumed waves; a changed status would surface as its own row
    (deterministically none here: seen statuses are write-once).
    Pinned VALUES oracle; resume-equals-uninterrupted is pinned
    separately by tests/test_resume.py."""
    import tempfile

    from scalpel_spark.config import CrawlConfig
    from scalpel_spark.plans.engine import CrawlEngine
    from scalpel_spark.plans.storage import SnapshotStore
    from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

    n_hosts = 6
    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=n_hosts, seed=17)
    robots = synthetic_robots(spark, n_hosts=n_hosts)
    store = SnapshotStore(tempfile.mkdtemp(prefix='snapdiff_'))
    seeds = sorted(
        r['u'] for r in corpus
        .groupBy(F.parse_url('doc_id', F.lit('HOST')).alias('h'))
        .agg(F.min('doc_id').alias('u')).collect()
    )
    kwargs = dict(follow_robots_txt=True, max_dispatch_per_host_per_wave=5)
    CrawlEngine(spark, corpus, robots,
                CrawlConfig(max_waves=2, **kwargs), store).run(seeds)
    mid_id = store.snapshots()[-1]['id']
    res = CrawlEngine(spark, corpus, robots,
                      CrawlConfig(**kwargs), store).resume()
    mid = res.as_of(mid_id, 'seen').select(
        'url', F.col('status').alias('status_mid'))
    fin = res.seen.select('url', F.col('status').alias('status'), 'wave')
    change = (
        F.when(F.col('status_mid').isNull(), F.lit('added'))
        .when(F.col('status_mid') != F.col('status'), F.lit('changed'))
        .otherwise(F.lit('carried'))
    )
    return (
        fin.join(mid, 'url', 'left')
        .groupBy(change.alias('change'), 'status')
        .agg(F.count('*').alias('n_urls'),
             F.min('wave').cast('long').alias('first_wave'),
             F.max('wave').cast('long').alias('last_wave'))
    )


ORACLE_SNAPSHOT_DIFF = """
SELECT * FROM (VALUES
  ('added', 'reachable', CAST(36 AS BIGINT), CAST(2 AS BIGINT), CAST(9 AS BIGINT)),
  ('added', 'robots_excluded', CAST(35 AS BIGINT), CAST(2 AS BIGINT), CAST(10 AS BIGINT)),
  ('added', 'unreachable', CAST(3 AS BIGINT), CAST(6 AS BIGINT), CAST(9 AS BIGINT)),
  ('carried', 'reachable', CAST(7 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  ('carried', 'robots_excluded', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT))
) AS t(change, status, n_urls, first_wave, last_wave)
"""


def _stream_events(spark, tmpdir: str, rows) -> None:
    from scalpel_spark.streaming.frontier_stream import FETCH_EVENT_SCHEMA
    df = spark.createDataFrame(list(rows), FETCH_EVENT_SCHEMA)
    df.coalesce(1).write.mode('append').parquet(tmpdir)


def _stream_collect(spark, out_df, prefix: str) -> DataFrame:
    """availableNow file-source run into a memory sink, returned as a
    (bounded) DataFrame — the offline deterministic harness the
    streaming tests use."""
    import uuid as _uuid
    name = prefix + _uuid.uuid4().hex[:8]
    q = (out_df.writeStream.format('memory').queryName(name)
         .outputMode('append').trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f'select * from {name}')


def q_stream_politeness_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming stateful politeness
    (streaming/frontier_stream.stateful_politeness): two deterministic
    micro-batches (file source, maxFilesPerTrigger=1, mtime-ordered),
    per-host budget 4 — over-budget URLs are emitted admitted=false on
    arrival, carried in applyInPandasWithState state, and drained in
    priority order when a later batch has budget. The rollup pins the
    CROSS-BATCH semantics: deferred-then-drained URLs appear twice, the
    running dispatched_total steps by the budget, and host isolation
    holds. VALUES-pinned oracle (streaming is not SQL-expressible; the
    pinned rows ARE the spec, double-checked by tests/test_streaming.py)."""
    import datetime
    import tempfile
    import time as _time

    from scalpel_spark.streaming.frontier_stream import (FETCH_EVENT_SCHEMA,
                                                         stateful_politeness)

    base = datetime.datetime(2024, 1, 1)
    d = tempfile.mkdtemp(prefix='stream_pol_')

    def ev(host, prio):
        return (f'http://{host}/p{prio}.html', host,
                base + datetime.timedelta(seconds=prio), prio)

    a, b = 'a.example.com', 'b.example.com'
    _stream_events(spark, d, [ev(a, i) for i in range(6)] + [ev(b, i) for i in range(2)])
    _time.sleep(1.1)  # distinct mtime -> deterministic file (batch) order
    _stream_events(spark, d, [ev(a, i) for i in range(10, 14)] + [ev(b, 10)])

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    out = _stream_collect(
        spark, stateful_politeness(stream, budget_per_batch=4), 'pol_')
    return (
        out.groupBy('host')
        .agg(F.count('*').alias('n_emissions'),
             F.sum(F.when(F.col('admitted'), 1).otherwise(0))
              .cast('long').alias('n_admitted'),
             F.count_distinct('url').alias('n_urls'),
             F.max('dispatched_total').alias('max_dispatched'),
             F.sum(F.when(F.col('admitted'), F.col('priority')))
              .cast('long').alias('admitted_prio_sum'))
    )


def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-seen dedup
    (streaming/frontier_stream.dedup_discovered): dropDuplicates keyed on
    url under a watermark — repeats are dropped ACROSS micro-batch
    boundaries via the state store (the streaming twin of the batch
    seen anti-join). Two batches with in-batch and cross-batch repeats;
    each URL must survive exactly once. VALUES-pinned oracle (the output
    SET is batch-order-independent, so the pin is robust)."""
    import datetime
    import tempfile
    import time as _time

    from scalpel_spark.streaming.frontier_stream import (FETCH_EVENT_SCHEMA,
                                                         dedup_discovered)

    base = datetime.datetime(2024, 1, 1)
    d = tempfile.mkdtemp(prefix='stream_dedup_')

    def ev(host, i, sec):
        return (f'http://{host}/p{i}.html', host,
                base + datetime.timedelta(seconds=sec), i)

    a, b = 'a.example.com', 'b.example.com'
    _stream_events(spark, d,
                   [ev(a, 0, 0), ev(a, 1, 1), ev(a, 2, 2), ev(a, 2, 2),
                    ev(b, 0, 3)])
    _time.sleep(1.1)
    _stream_events(spark, d,
                   [ev(a, 1, 10), ev(a, 2, 11), ev(a, 3, 12),
                    ev(b, 0, 13), ev(b, 1, 14)])

    stream = (spark.readStream.schema(FETCH_EVENT_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    out = _stream_collect(
        spark, dedup_discovered(stream, watermark='1 hour'), 'dedup_')
    return (
        out.groupBy('host')
        .agg(F.count('*').alias('n_unique'),
             F.count_distinct('url').alias('n_urls'),
             F.sum('priority').cast('long').alias('prio_sum'))
    )


ORACLE_STREAM_POLITENESS = """
SELECT * FROM (VALUES
  ('a.example.com', CAST(12 AS BIGINT), CAST(8 AS BIGINT), CAST(10 AS BIGINT), CAST(8 AS BIGINT), CAST(36 AS BIGINT)),
  ('b.example.com', CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(11 AS BIGINT))
) AS t(host, n_emissions, n_admitted, n_urls, max_dispatched, admitted_prio_sum)
"""


ORACLE_STREAM_DEDUP = """
SELECT * FROM (VALUES
  ('a.example.com', CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(6 AS BIGINT)),
  ('b.example.com', CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT))
) AS t(host, n_unique, n_urls, prio_sum)
"""


def q_vocab_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/vocab.bpe_token_stats — the learned 15-merge vocabulary
    APPLIED back to the corpus, per-host tokenization rollup. Encode is
    a chain of leftmost-greedy array folds over DISTINCT words (each word
    encoded once, joined back — the Zipf trick), pure JVM expressions
    (tests/test_vocab_pack.py pins the fold against an independent
    while-loop reference encoder). Pinned oracle on the
    scale-independent synthetic corpus (repo convention)."""
    from scalpel_spark.operators.vocab import bpe_merges, bpe_token_stats
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=400, n_hosts=8, seed=5)
    docs = corpus.select(
        'doc_id',
        F.array_join(
            F.transform(F.filter('spans', lambda s: s['kind'] == 'text'),
                        lambda s: s['text']), ' ').alias('text'))
    merges = [(r['left'], r['right'])
              for r in bpe_merges(docs, n_merges=15).orderBy('rank').collect()]
    stats = bpe_token_stats(docs, merges)
    return (
        stats
        .groupBy(F.parse_url('doc_id', F.lit('HOST')).alias('host'))
        .agg(F.count('*').alias('n_docs'),
             F.sum('n_words').alias('n_words'),
             F.sum('n_tokens').alias('n_tokens'),
             F.sum('n_symbols').alias('n_symbols'))
        .withColumn(
            'compression_ppm',
            F.expr('cast(cast(n_tokens as decimal(28,0)) * 1000000'
                   ' div cast(n_symbols as decimal(19,0)) as bigint)'))
    )


ORACLE_BPE_ENCODE = """
SELECT * FROM (VALUES
  ('h0.example.com', CAST(52 AS BIGINT), CAST(167 AS BIGINT), CAST(834 AS BIGINT), CAST(1538 AS BIGINT), CAST(542262 AS BIGINT)),
  ('h1.example.com', CAST(43 AS BIGINT), CAST(140 AS BIGINT), CAST(690 AS BIGINT), CAST(1271 AS BIGINT), CAST(542879 AS BIGINT)),
  ('h2.example.com', CAST(49 AS BIGINT), CAST(154 AS BIGINT), CAST(773 AS BIGINT), CAST(1429 AS BIGINT), CAST(540937 AS BIGINT)),
  ('h3.example.com', CAST(52 AS BIGINT), CAST(168 AS BIGINT), CAST(822 AS BIGINT), CAST(1519 AS BIGINT), CAST(541145 AS BIGINT)),
  ('h4.example.com', CAST(57 AS BIGINT), CAST(181 AS BIGINT), CAST(890 AS BIGINT), CAST(1664 AS BIGINT), CAST(534855 AS BIGINT)),
  ('h5.example.com', CAST(54 AS BIGINT), CAST(178 AS BIGINT), CAST(874 AS BIGINT), CAST(1604 AS BIGINT), CAST(544887 AS BIGINT)),
  ('h6.example.com', CAST(42 AS BIGINT), CAST(137 AS BIGINT), CAST(650 AS BIGINT), CAST(1218 AS BIGINT), CAST(533661 AS BIGINT)),
  ('h7.example.com', CAST(51 AS BIGINT), CAST(165 AS BIGINT), CAST(816 AS BIGINT), CAST(1510 AS BIGINT), CAST(540397 AS BIGINT))
) AS t(host, n_docs, n_words, n_tokens, n_symbols, compression_ppm)
"""


def q_sketch_hll_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-text cardinality per source
    (operators/sketches.hll_cardinality) audited against the exact
    distinct count: the mergeable register sketch every per-host /
    per-source frontier statistic uses at 10^10 URLs, where the exact
    pass exists only to PIN the estimate. Register build is one slim
    (source, bucket) groupBy-MAX with map-side partials; estimator is
    DECIMAL integral division + an embedded exact linear-counting table
    — bit-identical in the fully recomputing DuckDB oracle."""
    from scalpel_spark.operators.sketches import hll_cardinality

    docs = _t(spark, sf_dir, 'documents')
    est = hll_cardinality(docs, 'text', p=8, group_cols=['source'])
    exact = (docs.groupBy('source')
             .agg(F.count_distinct('text').alias('exact_distinct')))
    return (
        est.join(exact, 'source')
        .select(
            'source', 'estimate_milli', 'n_registers', 'exact_distinct',
            # abs(est - exact)/exact in ppb: est is milli-scaled, so
            # abs(est_milli - exact*1000) * 10^6 div exact
            F.expr('cast(cast(abs(estimate_milli - exact_distinct * 1000) '
                   'as decimal(28,0)) * 1000000 '
                   'div cast(exact_distinct as decimal(19,0)) '
                   'as bigint)').alias('abs_err_ppb'),
        )
    )


def _oracle_hll_sources() -> str:
    from scalpel_spark.operators.sketches import (hll_estimate_sql,
                                                  hll_registers_sql)
    reg = hll_registers_sql('text', 'documents', p=8, group_exprs=['source'])
    est = hll_estimate_sql('regs', p=8, group_exprs=['source'])
    return f"""
WITH regs AS ({reg}),
est AS ({est}),
exact AS (SELECT source, COUNT(DISTINCT text) AS exact_distinct
          FROM documents GROUP BY source)
SELECT source, estimate_milli, n_registers, exact_distinct,
       CAST(CAST(abs(estimate_milli - exact_distinct * 1000) AS HUGEINT)
            * 1000000 // exact_distinct AS BIGINT) AS abs_err_ppb
FROM est JOIN exact USING (source)
"""


def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter audit (operators/sketches.cms_heavy_hitters):
    the corpus' top-20 tokens with exact count, the estimate read back
    from the d=4 x w=512 counter table (bounded state that merges by SUM
    across shards — the one-pass frequency structure at 100 TB), and the
    one-sided overestimate in ppm. Fully recomputed in DuckDB."""
    from scalpel_spark.operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(_t(spark, sf_dir, 'documents'),
                             top_n=20, depth=4, width=512)


def _oracle_cms_heavy_hitters() -> str:
    from scalpel_spark.operators.sketches import cms_cells_sql
    cells = cms_cells_sql('word', depth=4, width=512)
    probe_rows = ' UNION ALL '.join(
        f'SELECT word, {i} AS row, {c} AS col FROM top'
        for i, c in enumerate(cells)
    )
    tok_cells = cms_cells_sql('tok', depth=4, width=512)
    counter_rows = ' UNION ALL '.join(
        f'SELECT {i} AS row, {c} AS col FROM tok2'
        for i, c in enumerate(tok_cells)
    )
    return f"""
WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
tok2 AS (SELECT tok FROM tok WHERE tok <> ''),
exact AS (SELECT tok AS word, COUNT(*) AS exact_count FROM tok2 GROUP BY tok),
top AS (SELECT word, exact_count FROM exact
        ORDER BY exact_count DESC, word LIMIT 20),
counters AS (SELECT row, col, COUNT(*) AS cnt
             FROM ({counter_rows}) GROUP BY row, col),
probes AS ({probe_rows}),
est AS (SELECT word, MIN(COALESCE(cnt, 0)) AS cms_count
        FROM probes LEFT JOIN counters USING (row, col) GROUP BY word)
SELECT word, exact_count, CAST(cms_count AS BIGINT) AS cms_count,
       CAST(CAST(cms_count - exact_count AS HUGEINT) * 1000000
            // exact_count AS BIGINT) AS overestimate_ppm
FROM top JOIN est USING (word)
"""


def q_sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta) sketch set algebra (operators/sketches.kmv_overlap):
    Jaccard / union / intersection estimates between two overlapping
    crawl-snapshot URL sets from their 256-minima sketches — the
    crawl-overlap question HLL cannot answer (no intersection), computed
    without ever joining URL x URL: after the two distinct passes only
    <= 3k hash rows move. Deterministic synthetic sets with known truth
    (Jaccard 1/3, union 45k, intersection 15k); FULLY recomputed in
    DuckDB via the shared *_sql twins."""
    from scalpel_spark.operators.sketches import kmv_overlap

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit('https://h'), F.pmod('id', F.lit(97)).cast('string'),
                     F.lit('.site/p/'), F.col('id').cast('string')).alias('url'))

    return kmv_overlap(urls(0, 30000), urls(15000, 45000), 'url', k=256)


def _oracle_kmv_overlap() -> str:
    from scalpel_spark.operators.sketches import kmv_overlap_sql, kmv_sketch_sql
    mk = ("SELECT concat('https://h', CAST(i % 97 AS VARCHAR), '.site/p/', "
          "CAST(i AS VARCHAR)) AS url FROM range({lo}, {hi}) t(i)")
    sa = kmv_sketch_sql('url', f'({mk.format(lo=0, hi=30000)})', 256)
    sb = kmv_sketch_sql('url', f'({mk.format(lo=15000, hi=45000)})', 256)
    return (f'WITH sa AS ({sa}), sb AS ({sb}) '
            + kmv_overlap_sql('sa', 'sb', 256))


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source ingestion (sources/warc.read_warc): two deterministic
    WARC files (one plain, one whole-file gzip) parsed one-task-per-file
    with Content-Length record framing (never delimiter splitting — a
    payload containing the magic bytes survives, pinned by
    tests/test_warc.py), HTTP bodies split from response blocks, rolled
    up per (warc_type, http_status). Pinned VALUES oracle (the source
    synthesizes its own input; DuckDB has no WARC reader to twin)."""
    import tempfile

    from scalpel_spark.sources.warc import (read_warc, warc_response_stats,
                                            write_synthetic_warc)

    d = tempfile.mkdtemp(prefix='warc_ingest_')
    write_synthetic_warc(f'{d}/a.warc', n_records=20, seed=3)
    write_synthetic_warc(f'{d}/b.warc.gz', n_records=10, seed=4,
                         gzip_file=True)
    # -1 = "no HTTP status" (non-response records): NULL sort keys are
    # not comparable in the driver's canonicalizer
    return (
        warc_response_stats(read_warc(spark, d))
        .withColumn('http_status',
                    F.coalesce('http_status', F.lit(-1)).cast('int'))
    )


def q_warc_to_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC -> interleaved-document bridge (sources/warc.warc_to_corpus):
    200-status responses become the input_hint span shape — charset via
    the WHATWG sniffer, one tag-stripped text span, one media span per
    <img src> in document order — then a per-host rollup over the span
    arrays (map-side F.filter/F.aggregate, no explode). This is the
    ingestion path that feeds every downstream operator from real
    archive files. Pinned VALUES oracle."""
    import tempfile

    from scalpel_spark.sources.warc import (read_warc, warc_to_corpus,
                                            write_synthetic_warc)

    d = tempfile.mkdtemp(prefix='warc_docs_')
    write_synthetic_warc(f'{d}/a.warc', n_records=30, seed=11,
                         with_images=True)
    docs = warc_to_corpus(read_warc(spark, d))
    n_media = F.size(F.filter('spans', lambda s: s['kind'] == 'media'))
    text_tokens = F.aggregate(
        F.filter('spans', lambda s: s['kind'] == 'text'),
        F.lit(0).cast('long'),
        lambda acc, s: acc + F.size(F.split(F.coalesce(s['text'], F.lit('')),
                                            ' ')))
    return (
        docs.groupBy(F.parse_url('doc_id', F.lit('HOST')).alias('host'))
        .agg(F.count('*').alias('n_docs'),
             F.sum(n_media).cast('long').alias('n_media_spans'),
             F.sum(text_tokens).cast('long').alias('n_text_tokens'))
    )


ORACLE_WARC_TO_DOCS = """
SELECT * FROM (VALUES
  ('h0.example.com', CAST(5 AS BIGINT), CAST(1 AS BIGINT), CAST(15 AS BIGINT)),
  ('h1.example.com', CAST(5 AS BIGINT), CAST(1 AS BIGINT), CAST(15 AS BIGINT)),
  ('h2.example.com', CAST(5 AS BIGINT), CAST(2 AS BIGINT), CAST(15 AS BIGINT)),
  ('h3.example.com', CAST(5 AS BIGINT), CAST(2 AS BIGINT), CAST(14 AS BIGINT)),
  ('h4.example.com', CAST(5 AS BIGINT), CAST(2 AS BIGINT), CAST(15 AS BIGINT))
) AS t(host, n_docs, n_media_spans, n_text_tokens)
"""


ORACLE_WARC_INGEST = """
SELECT * FROM (VALUES
  ('request', CAST(-1 AS INTEGER), CAST(5 AS BIGINT), CAST(216 AS BIGINT), CAST(3 AS BIGINT)),
  ('response', CAST(200 AS INTEGER), CAST(25 AS BIGINT), CAST(716 AS BIGINT), CAST(17 AS BIGINT)),
  ('response', CAST(404 AS INTEGER), CAST(5 AS BIGINT), CAST(129 AS BIGINT), CAST(3 AS BIGINT)),
  ('warcinfo', CAST(-1 AS INTEGER), CAST(2 AS BIGINT), CAST(62 AS BIGINT), CAST(0 AS BIGINT))
) AS t(warc_type, http_status, n_records, payload_bytes, n_uris)
"""


def q_sketch_kmv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source overlap matrix
    (operators/sketches.kmv_overlap_matrix): KMV Jaccard estimates
    between every pair of `documents.source` groups on distinct text —
    "which sources share content", the contamination matrix a mixture
    designer reads before setting sampling weights. The corpus is
    touched once (grouped sketch build: distinct + partitioned
    row_number, each window task holds ONE group's hashes); everything
    after is O(G^2 k) bounded rows. FULLY recomputed in DuckDB."""
    from scalpel_spark.operators.sketches import kmv_overlap_matrix

    return kmv_overlap_matrix(_t(spark, sf_dir, 'documents'),
                              'text', 'source', k=128)


def _oracle_kmv_matrix() -> str:
    from scalpel_spark.operators.sketches import kmv_matrix_sql
    return kmv_matrix_sql('text', 'documents', 'source', k=128)


def q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate media detection
    (operators/multimodal.media_phash_pairs): 63-bit dHash fingerprints
    over payload bytes, 9-bit Hamming-band blocking (never asset x
    asset), pairs with Hamming <= 6 rolled up by (same_group, hamming)
    over a planted-duplicate corpus (`synthetic_media_variants`: one-byte
    corruptions of group bases — the re-encoded dup a crawl sees). The
    DuckDB oracle rebuilds the corpus, the dHash fold, the banding, and
    the pair join from scratch."""
    from scalpel_spark.operators.multimodal import (media_phash_pairs,
                                                    synthetic_media_variants)

    media = synthetic_media_variants(spark, n=400, groups=120, seed=7)
    pairs = media_phash_pairs(media, max_hamming=6, id_col='media_id')
    grp = media.select(F.col('media_id'), F.col('grp'))
    return (
        pairs
        .join(grp.withColumnRenamed('media_id', 'ref_a')
                 .withColumnRenamed('grp', 'grp_a'), 'ref_a')
        .join(grp.withColumnRenamed('media_id', 'ref_b')
                 .withColumnRenamed('grp', 'grp_b'), 'ref_b')
        .groupBy((F.col('grp_a') == F.col('grp_b')).alias('same_group'),
                 F.col('hamming').cast('int').alias('hamming'))
        .agg(F.count('*').alias('n_pairs'))
    )


ORACLE_MEDIA_PHASH = """
WITH m AS (
  SELECT i AS media_id, CAST(i % 120 AS INTEGER) AS grp,
         md5('m7-' || CAST(i % 120 AS VARCHAR))
           || md5('n7-' || CAST(i % 120 AS VARCHAR))
           || md5('o7-' || CAST(i % 120 AS VARCHAR))
           || md5('q7-' || CAST(i % 120 AS VARCHAR)) AS baseh,
         CAST(i % 64 AS INTEGER) AS p
  FROM range(400) t(i)),
hx AS (
  SELECT media_id, grp,
         CASE WHEN media_id < 120 THEN baseh
              ELSE substr(baseh, 1, p * 2) || 'f0' || substr(baseh, p * 2 + 3)
         END AS h
  FROM m),
bytes AS (
  SELECT media_id, grp, CAST(j AS INTEGER) AS j,
         CAST(('0x' || substr(h, CAST(j * 2 + 1 AS INTEGER), 2)) AS INTEGER) AS b
  FROM hx, range(64) r(j)),
bits AS (
  SELECT media_id, grp, j,
         CASE WHEN b > lead(b) OVER (PARTITION BY media_id ORDER BY j)
              THEN 1 ELSE 0 END AS bit
  FROM bytes),
fp AS (
  SELECT media_id, grp,
         SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << j)) AS phash
  FROM bits WHERE j < 63 GROUP BY media_id, grp),
bands AS (
  SELECT media_id, grp, phash, band,
         (phash >> CAST(band * 9 AS INTEGER)) & 511 AS bucket
  FROM fp, range(7) rb(band)),
pairs AS (
  SELECT DISTINCT a.media_id AS ra, b.media_id AS rb,
         a.grp = b.grp AS same_group,
         bit_count(xor(a.phash, b.phash)) AS hamming
  FROM bands a JOIN bands b USING (band, bucket)
  WHERE a.media_id < b.media_id)
SELECT same_group, CAST(hamming AS INTEGER) AS hamming,
       COUNT(*) AS n_pairs
FROM pairs WHERE hamming <= 6
GROUP BY same_group, hamming
"""


def q_media_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-axis frontier schedule+dedup (operators/multimodal.media_frontier):
    media spans referenced by a 500-page interleaved corpus become fetch
    candidates, LEFT-ANTI-deduped against the refs already fetched (the
    first 250 pages' media), then rolled up per media host for politeness
    grouping — the interleaved-payload twin of the URL seen-set step
    (reference dedup: any_io/static_spider.py:100-106).  Deterministic
    VALUES oracle over the per-host new-ref counts."""
    from scalpel_spark.operators.multimodal import media_frontier
    from scalpel_spark.sources.corpus import synthetic_corpus

    corpus = synthetic_corpus(spark, n_pages=500, n_hosts=10, seed=17)
    pid = F.regexp_extract('doc_id', r'/p(\d+)\.html$', 1).cast('int')
    seen = media_frontier(corpus.filter(pid < 250))
    return (
        media_frontier(corpus, seen_media=seen)
        .groupBy('media_host')
        .agg(F.count('*').alias('n_new_refs'))
    )


ORACLE_MEDIA_FRONTIER = """
SELECT * FROM (VALUES
  ('h0', CAST(8 AS BIGINT)),
  ('h1', CAST(14 AS BIGINT)),
  ('h2', CAST(4 AS BIGINT)),
  ('h3', CAST(5 AS BIGINT)),
  ('h4', CAST(2 AS BIGINT)),
  ('h5', CAST(10 AS BIGINT)),
  ('h6', CAST(9 AS BIGINT)),
  ('h7', CAST(5 AS BIGINT)),
  ('h8', CAST(15 AS BIGINT)),
  ('h9', CAST(9 AS BIGINT))
) AS t(media_host, n_new_refs)
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def q_index_champion_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/indexing.champion_postings — per-term top-3 documents by
    tf plus df/cf stats, the impact-ordered index-pruning build (what a
    crawl corpus feeds next; the reference stops at item extraction,
    core/spider.py:92). Skew-safe two-phase top-k: salted local ranks
    first, so a stopword's posting list never lands in one window task.
    The oracle recomputes with a flat window — equality IS the proof the
    salted decomposition is correct."""
    return indexing.champion_postings(_t(spark, sf_dir, 'documents'), k=3)


ORACLE_CHAMPION_POSTINGS = """
WITH tf AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok, doc_id),
stats AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY tok),
ranked AS (
  SELECT tok, doc_id, tf,
         CAST(ROW_NUMBER() OVER (PARTITION BY tok ORDER BY tf DESC, doc_id ASC)
              AS INT) AS rank
  FROM tf)
SELECT r.tok, s.df, s.cf, r.rank, r.doc_id, r.tf
FROM ranked r JOIN stats s ON r.tok = s.tok
WHERE r.rank <= 3
"""


def q_index_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/indexing.anchor_terms — per-target top-3 anchor terms over
    a deterministic hash-derived link graph (3 out-links per doc, same md5
    formula as host_rank; anchor term = the source doc's 1st/2nd token by
    link slot). The target-side anchor rollup is the ranking signal every
    web indexer aggregates; unlike anchor_text_profile (bounded first/last
    context), this is the term histogram. Oracle recomputes the graph and
    ranks independently — no pinned constants."""
    docs = _t(spark, sf_dir, 'documents').select('doc_id', 'text')
    n = docs.count()
    fan = docs.select(
        'doc_id', F.split('text', ' ').alias('toks'),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias('j'),
    )
    dst = F.pmod(
        hash60(F.concat(F.col('doc_id').cast('string'), F.lit('-'),
                        F.col('j').cast('string'))),
        F.lit(n),
    )
    links = (
        fan.select(
            F.col('doc_id'), dst.alias('dst'),
            F.element_at('toks', (F.pmod(F.col('j'), F.lit(2)) + 1).cast('int'))
            .alias('term'))
        .filter(F.col('dst') != F.col('doc_id'))
    )
    return indexing.anchor_terms(links, k=3)


ORACLE_ANCHOR_TERMS = f"""
WITH nd AS (SELECT COUNT(*) AS n FROM documents),
fan AS (
  SELECT doc_id, string_split(text, ' ') AS toks, j
  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
links AS (
  SELECT {H60.format(x="CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR)")}
           % (SELECT n FROM nd) AS dst,
         toks[1 + (j % 2)] AS term, doc_id
  FROM fan),
agg AS (
  SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS n_refs
  FROM links WHERE dst != doc_id GROUP BY dst, term),
ranked AS (
  SELECT dst, term, n_refs,
         CAST(ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n_refs DESC, term ASC)
              AS INT) AS rank
  FROM agg)
SELECT dst, term, n_refs, rank FROM ranked WHERE rank <= 3
"""


def q_index_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/indexing.collocations — adjacent-bigram collocations
    scored by exact-integer Dice ppm (bounded in [0, 1e6], unlike PMI
    whose hapax-pair score overflows int64 on a trillion-token corpus).
    DECIMAL integral div on the Spark side, HUGEINT // in the oracle —
    the graphrank bit-parity convention."""
    return indexing.collocations(_t(spark, sf_dir, 'documents'), min_count=2)


ORACLE_COLLOCATIONS = """
WITH tk AS (SELECT string_split(text, ' ') AS l FROM documents),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(l) AS tok FROM tk) GROUP BY tok),
bg AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM (SELECT l[i] || ' ' || l[i + 1] AS bigram
        FROM (SELECT l, UNNEST(generate_series(1, len(l) - 1)) AS i FROM tk))
  GROUP BY bigram HAVING COUNT(*) >= 2),
j AS (
  SELECT bigram, n_ab, string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM bg)
SELECT j.bigram, j.n_ab, a.n AS n_a, b.n AS n_b,
       CAST(CAST(j.n_ab AS HUGEINT) * 2000000 // CAST(a.n + b.n AS HUGEINT)
            AS BIGINT) AS dice_ppm
FROM j JOIN uni a ON j.w1 = a.tok JOIN uni b ON j.w2 = b.tok
"""


_BM25_QUERIES = [
    ('q1', 'hash join table'),
    ('q2', 'fast scan'),
    ('q3', 'sort merge batch window'),
    ('q4', 'value value spark'),  # duplicate term — scored once (DISTINCT)
]


def q_index_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/indexing.bm25_topk — Okapi BM25 top-5 retrieval over the
    documents table for four fixed query strings (the query-time half of
    the champion-list index build).  Scores are scaled-integer BM25
    (k1=1.2, b=0.75; rational idf surrogate ((N+1)*1000) div df — the
    tfidf_keywords convention, since ln() is not bit-reproducible across
    engines): every div is DECIMAL integral division, so the oracle
    reproduces scores exactly.  Per-query top-k is two-phase salted so a
    stopword query can't collapse its candidate set into one window task.
    The oracle recomputes everything independently (no pinned constants)."""
    queries_df = spark.createDataFrame(_BM25_QUERIES,
                                       'query_id string, query_text string')
    return indexing.bm25_topk(_t(spark, sf_dir, 'documents'), queries_df, k=5)


ORACLE_BM25 = """
WITH q(query_id, query_text) AS (VALUES
  ('q1', 'hash join table'), ('q2', 'fast scan'),
  ('q3', 'sort merge batch window'), ('q4', 'value value spark')),
qt AS (SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS tok FROM q),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(CAST(SUM(dl) AS HUGEINT) * 1000 // COUNT(*) AS BIGINT) AS avgdl_milli
  FROM dl),
cand AS (
  SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfreq.df, tot.n_docs, tot.avgdl_milli,
         CAST(CAST(dl.dl AS HUGEINT) * 1000000 // tot.avgdl_milli AS BIGINT) AS ratio_milli
  FROM tf JOIN qt USING (tok) JOIN dl USING (doc_id)
  JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN tot),
scored_terms AS (
  SELECT query_id, doc_id,
         CAST(CAST((n_docs + 1) AS HUGEINT) * 1000 // df AS BIGINT) AS idf_milli,
         CAST(CAST(tf AS HUGEINT) * 2200 * 1000000 //
              (tf * 1000 + (CAST(1200 AS HUGEINT) * (250 + (CAST(750 AS HUGEINT) * ratio_milli // 1000)) // 1000))
              AS BIGINT) AS tfpart_ppm
  FROM cand),
scored AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(idf_milli AS HUGEINT) * tfpart_ppm // 1000) AS BIGINT) AS score_micro
  FROM scored_terms GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
  FROM scored)
SELECT query_id, rank, doc_id, score_micro FROM ranked WHERE rank <= 5
"""


def q_selection_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/selection.dsir_weights — DSIR importance weights (Xie et
    al. 2023) of every document against a trusted target sample (here:
    source='src1'), over md5-hashed word-bigram buckets with add-one
    smoothing.  The log is the exact integer log2_milli (bit length +
    octave interpolation) so the oracle reproduces every weight
    bit-for-bit — ln() over doubles never survives an engine boundary.
    One partial-agg shuffle for doc features, one bucket-keyed histogram
    agg, a broadcast lambda table, one per-doc sum.  Full recomputing
    DuckDB oracle."""
    from scalpel_spark.operators.selection import dsir_weights

    docs = _t(spark, sf_dir, 'documents')
    target = docs.filter(F.col('source') == 'src1')
    return dsir_weights(docs, target, n_buckets=4096, shingle_n=2)


_DSIR_CTES = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (
  SELECT doc_id, l[i] || ' ' || l[i + 1] AS shingle
  FROM (SELECT doc_id, l, UNNEST(generate_series(1, len(l) - 1)) AS i FROM tok)),
feats AS (
  SELECT doc_id, {hash60_sql('shingle')} % 4096 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM sh GROUP BY doc_id, bucket),
tgt AS (
  SELECT {hash60_sql('shingle')} % 4096 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt_t
  FROM sh JOIN documents USING (doc_id)
  WHERE documents.source = 'src1' GROUP BY bucket),
raw AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS cnt_r FROM feats GROUP BY bucket),
tot AS (SELECT (SELECT SUM(cnt_r) FROM raw) AS total_r,
               (SELECT COALESCE(SUM(cnt_t), 0) FROM tgt) AS total_t),
lam AS (
  SELECT raw.bucket,
         ({log2_milli_sql('COALESCE(cnt_t, 0) + 1')}
          - {log2_milli_sql('total_t + 4096')})
         - ({log2_milli_sql('cnt_r + 1')}
            - {log2_milli_sql('total_r + 4096')}) AS lam_milli
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot),
scored AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_features,
         CAST(SUM(n * lam_milli) AS BIGINT) AS dsir_milli
  FROM feats JOIN lam USING (bucket) GROUP BY doc_id)
"""

ORACLE_DSIR_WEIGHTS = _DSIR_CTES + """
SELECT doc_id, n_features, dsir_milli FROM scored
"""


def q_selection_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/selection.dsir_select — rank-based DSIR selection: keep
    the top 25% of documents by importance weight (ties to the smaller
    doc_id).  The global cut is scheduling.topk_by_score's range-
    partition straddle selection, so no single task ranks the corpus;
    the oracle's flat window proves the distributed selection exact."""
    from scalpel_spark.operators.selection import dsir_select

    docs = _t(spark, sf_dir, 'documents')
    target = docs.filter(F.col('source') == 'src1')
    return dsir_select(docs, target, keep_fraction=0.25,
                       n_buckets=4096, shingle_n=2)


ORACLE_DSIR_SELECT = _DSIR_CTES + """,
ranked AS (
  SELECT doc_id, n_features, dsir_milli,
         ROW_NUMBER() OVER (ORDER BY dsir_milli DESC, doc_id ASC) AS r,
         COUNT(*) OVER () AS n_docs
  FROM scored)
SELECT doc_id, n_features, dsir_milli
FROM ranked WHERE r <= CAST(FLOOR(n_docs * 0.25) AS BIGINT)
"""


def q_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/quantiles.exact_quantiles — exact type-1 (inverse-CDF)
    per-group quantiles with NO global sort and NO approximation: one
    groupBy(group, value) shuffle, then a value-range-bucket-decomposed
    cumulative count (per-bucket windows + a tiny cross-bucket offset
    aggregate, provably independent of the bucket count), target ranks in
    integer parts-per-million.  The reference only ever derives a mean
    fetch time (core/spider.py:144); tail latencies (p90/p95/p99) are
    what a politeness scheduler actually needs.  DuckDB twin recomputes
    the identical rank rule with a flat window."""
    from scalpel_spark.operators import quantiles

    return quantiles.exact_quantiles(
        _t(spark, sf_dir, 'events'), 'value', ['event_type'])


ORACLE_LATENCY_QUANTILES = """
WITH counts AS (
  SELECT event_type, value AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM counts GROUP BY 1),
cum AS (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum
  FROM counts),
probs AS (SELECT UNNEST([500000, 900000, 950000, 990000]) AS p_ppm)
SELECT c.event_type, CAST(p.p_ppm AS BIGINT) AS p_ppm, c.v AS q_value,
       t.n_rows
FROM cum c JOIN tot t USING (event_type) CROSS JOIN probs p
WHERE (CAST(p.p_ppm AS BIGINT) * t.n_rows + 999999) // 1000000
      BETWEEN c.cum - c.cnt + 1 AND c.cum
"""


def q_quantile_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/quantiles.quantile_gate — per-language exact [p5, p95]
    length band as a document outlier gate: the band is one broadcast row
    per group, the corpus is touched map-side only, and the thresholds
    are exact (reproducible) rather than percentile_approx sketch values.
    """
    from scalpel_spark.operators import quantiles

    docs = _t(spark, sf_dir, 'documents')
    return quantiles.quantile_gate(
        docs, 'n_chars', ['lang'], low_ppm=50_000, high_ppm=950_000
    ).select('doc_id', 'lang', 'n_chars', 'q_low', 'q_high', 'keep')


ORACLE_QUANTILE_GATE = """
WITH counts AS (
  SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY 1),
cum AS (
  SELECT lang, v, cnt,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum
  FROM counts),
band AS (
  SELECT c.lang,
         MIN(CASE WHEN (50000 * t.n + 999999) // 1000000
                       BETWEEN c.cum - c.cnt + 1 AND c.cum
                  THEN c.v END) AS q_low,
         MIN(CASE WHEN (950000 * t.n + 999999) // 1000000
                       BETWEEN c.cum - c.cnt + 1 AND c.cum
                  THEN c.v END) AS q_high
  FROM cum c JOIN tot t USING (lang) GROUP BY c.lang)
SELECT d.doc_id, d.lang, d.n_chars, b.q_low, b.q_high,
       COALESCE(d.n_chars IS NOT NULL
                AND d.n_chars >= b.q_low AND d.n_chars <= b.q_high,
                FALSE) AS keep
FROM documents d LEFT JOIN band b USING (lang)
"""


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/c4rules.c4_filter — the C4 (Raffel et al. 2020 §2.2)
    page/line cleaning battery: terminal-punctuation line rule, short
    lines, javascript lines, cookie/policy boilerplate, lorem-ipsum and
    curly-brace page strikes, min-surviving-lines page verdict.  The
    synthetic corpus has no punctuation, so the query deterministically
    plants it first (mirrored in the oracle): every standalone 'the'
    gains a period (creating terminal lines mid-document), every 17th
    doc gains a lorem-ipsum tail, every 23rd-congruent-to-5 doc gains a
    brace + javascript tail.  All line flags map-side; one reassembly
    groupBy — the same plan family as line_quality_filter."""
    from scalpel_spark.operators import c4rules

    docs = _t(spark, sf_dir, 'documents')
    planted = docs.withColumn(
        'text',
        F.concat(
            F.regexp_replace('text', r'\bthe\b', 'the.'),
            F.when(F.col('doc_id') % 17 == 0, F.lit(' lorem ipsum'))
            .otherwise(F.lit('')),
            F.when(F.col('doc_id') % 23 == 5, F.lit(' { javascript'))
            .otherwise(F.lit('')),
        ),
    )
    return c4rules.c4_filter(planted, min_kept_lines=1)


ORACLE_C4_FILTER = r"""
WITH planted AS (
  SELECT doc_id,
         regexp_replace(text, '\bthe\b', 'the.', 'g')
         || CASE WHEN doc_id % 17 = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 23 = 5 THEN ' { javascript' ELSE '' END AS text
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
         FROM (SELECT doc_id, string_split(text, ' ') AS l FROM planted)),
lines AS (SELECT doc_id, (pos - 1) // 8 AS line_no,
                 string_agg(tok, ' ' ORDER BY pos) AS line
          FROM toks GROUP BY doc_id, (pos - 1) // 8),
flags AS (
  SELECT doc_id, line_no, line,
         (regexp_matches(line, '[.!?"]$')
          AND len(string_split(line, ' ')) >= 5
          AND NOT contains(lower(line), 'javascript')
          AND NOT regexp_matches(lower(line),
              '(terms of use|privacy policy|cookie policy|uses cookies)')
         ) AS line_keep
  FROM lines),
per_doc AS (
  SELECT doc_id,
         COALESCE(string_agg(CASE WHEN line_keep THEN line END,
                             chr(10) ORDER BY line_no), '') AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN line_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lines_kept
  FROM flags GROUP BY doc_id)
SELECT p.doc_id, p.clean_text, p.n_lines, p.n_lines_kept,
       contains(lower(d.text), 'lorem ipsum') AS has_lorem,
       contains(d.text, '{') AS has_brace,
       (NOT contains(lower(d.text), 'lorem ipsum')
        AND NOT contains(d.text, '{')
        AND p.n_lines_kept >= 1) AS doc_keep
FROM per_doc p JOIN planted d USING (doc_id)
"""


def q_warc_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sources/warc.warc_record_bytes — the WARC *writer* half of the
    archive interchange loop: ISO 28500 response records assembled as
    pure binary column algebra (two-layer exact Content-Length framing,
    no Python).  The oracle reconstructs every record byte-for-byte in
    SQL and md5s it — a serialization bug of even one byte flips the
    hash.  The sink (write_warc_shards) is exercised by round-trip tests;
    this query pins the distributed byte-assembly itself."""
    from scalpel_spark.sources import warc

    docs = _t(spark, sf_dir, 'documents')
    frame = docs.select(
        F.concat(F.lit('https://'), F.col('source'),
                 F.lit('.example.com/d/'),
                 F.col('doc_id').cast('string')).alias('url'),
        F.when(F.col('doc_id') % 7 == 0, F.lit(404)).otherwise(F.lit(200))
        .cast('int').alias('status'),
        F.lit('text/html').alias('content_type'),
        F.encode(F.col('text'), 'UTF-8').alias('body'),
        F.concat(F.lit('<urn:uuid:'), F.col('doc_id').cast('string'),
                 F.lit('>')).alias('record_id'),
    )
    return warc.warc_record_bytes(frame).select(
        'url', 'record_len', F.md5('record_bytes').alias('record_md5'))


# Reason-phrase CASE generated from the serializer's own HTTP_REASONS
# map (warc.http_reason_sql_case) so oracle and Spark writer cannot
# drift — closes ADVICE r4 warc.py:219 ('404 OK').
def _warc_serialize_oracle() -> str:
    from scalpel_spark.sources.warc import http_reason_sql_case
    return ORACLE_WARC_SERIALIZE_TMPL.replace(
        '{reason_case}', http_reason_sql_case('status'))


ORACLE_WARC_SERIALIZE_TMPL = """
WITH crlf AS (SELECT chr(13) || chr(10) AS c),
frame AS (
  SELECT 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
             AS url,
         CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
         text AS body,
         '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS rid
  FROM documents),
http AS (
  SELECT url, body,
         'HTTP/1.1 ' || CAST(status AS VARCHAR) || ' ' || ({reason_case}) || c
         || 'Content-Type: text/html' || c
         || 'Content-Length: ' || CAST(octet_length(encode(body)) AS VARCHAR)
         || c || c AS http_head,
         rid, c
  FROM frame CROSS JOIN crlf),
rec AS (
  SELECT url,
         'WARC/1.0' || c
         || 'WARC-Type: response' || c
         || 'WARC-Target-URI: ' || url || c
         || 'WARC-Date: 2026-01-01T00:00:00Z' || c
         || 'WARC-Record-ID: ' || rid || c
         || 'Content-Type: application/http; msgtype=response' || c
         || 'Content-Length: ' || CAST(octet_length(encode(http_head))
                                       + octet_length(encode(body)) AS VARCHAR)
         || c || c
         || http_head || body || c || c AS record
  FROM http)
SELECT url, CAST(octet_length(encode(record)) AS BIGINT) AS record_len,
       md5(record) AS record_md5
FROM rec
"""


def q_warc_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record-gzip WARC round-trip (sources/warc.write_warc_shards
    ``gzip_records=True`` -> read_warc): documents serialized as ISO
    28500 response records, written as the CommonCrawl seekable layout —
    ONE GZIP MEMBER PER RECORD, member byte offsets in the shard
    manifest — then read back via the stdlib multi-member walk and
    re-projected per URL. The oracle recomputes (status, body md5, body
    length) straight from the documents table, so a green row proves the
    gzip framing is bit-transparent end-to-end: any member-boundary or
    Content-Length slip would corrupt payload bytes and break the md5.
    Ref: reference persists items via msgpack files (any_io/files.py:
    45-84); WARC+gzip is the at-scale interchange equivalent."""
    import tempfile

    from scalpel_spark.sources import warc

    docs = _t(spark, sf_dir, 'documents').select(
        F.concat(F.lit('https://'), F.col('source'),
                 F.lit('.example.com/d/'), F.col('doc_id').cast('string')
                 ).alias('url'),
        F.when(F.col('doc_id') % 7 == 0, F.lit(404))
         .otherwise(F.lit(200)).alias('status'),
        F.lit('text/html').alias('content_type'),
        F.encode(F.col('text'), 'UTF-8').alias('body'),
        F.concat(F.lit('<urn:uuid:'), F.col('doc_id').cast('string'),
                 F.lit('>')).alias('record_id'),
    )
    d = tempfile.mkdtemp(prefix='warc_gz_rt_')
    warc.write_warc_shards(warc.warc_record_bytes(docs), d, n_shards=4,
                           gzip_records=True)
    return (
        warc.read_warc(spark, d)
        .select(F.col('target_uri').alias('url'),
                F.col('http_status').alias('status'),
                F.md5('payload').alias('body_md5'),
                F.length('payload').cast('long').alias('body_len'))
    )


ORACLE_WARC_GZIP_ROUNDTRIP = """
SELECT 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
           AS url,
       CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
       md5(text) AS body_md5,
       CAST(octet_length(encode(text)) AS BIGINT) AS body_len
FROM documents
"""


def q_epoch_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/curation.epoch_layout — deterministic per-epoch global
    shuffle + shard layout (WebDataset/Megatron training-set write):
    shard = top bits of hash60('e{epoch}|doc_id') so shards are key
    RANGES (reading shards in order replays the global permutation),
    pos_in_shard from the two-level sub-bucket rank decomposition — no
    single-task sort.  Oracle recomputes with a flat per-shard window,
    proving the decomposition exact."""
    return curation.epoch_layout(
        _t(spark, sf_dir, 'documents'), n_shards=8, epoch=2)


ORACLE_EPOCH_LAYOUT = f"""
WITH keyed AS (
  SELECT doc_id,
         {H60.format(x="'e2|' || CAST(doc_id AS VARCHAR)")} AS k
  FROM documents)
SELECT doc_id, CAST(2 AS INTEGER) AS epoch,
       CAST(k >> 57 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY k >> 57 ORDER BY k, doc_id)
            - 1 AS BIGINT) AS pos_in_shard
FROM keyed
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/layout.zorder_key — Morton-interleaved two-column sort
    key for at-rest data skipping (the Delta OPTIMIZE ZORDER / Iceberg
    z-transform semantics as plain column algebra): equal-width range
    bins from one broadcast min/max aggregate, then unrolled exact bit
    interleave — all inside whole-stage codegen.  Axes here: a uniform
    hash bin of source (the 'host' axis) x doc_id (the 'time' axis).
    The oracle recomputes bins and interleave bit-for-bit."""
    from scalpel_spark.functions.texthash import hash60
    from scalpel_spark.operators import layout

    docs = _t(spark, sf_dir, 'documents').select(
        'doc_id', (hash60(F.col('source')) % 1024).alias('src_bin'))
    return layout.zorder_key(docs, 'src_bin', 'doc_id', bits=10)


def _zorder_oracle() -> str:
    from scalpel_spark.operators.layout import morton_interleave_sql

    bin_sql = (
        "CASE WHEN {vmax} > {vmin} THEN LEAST(1023, GREATEST(0, "
        "CAST(floor(CAST({v} - {vmin} AS DOUBLE) * 1024 "
        "/ CAST({vmax} - {vmin} AS DOUBLE)) AS BIGINT))) "
        "ELSE 0 END"
    )
    xb = bin_sql.format(v='src_bin', vmin='xmin', vmax='xmax')
    yb = bin_sql.format(v='doc_id', vmin='ymin', vmax='ymax')
    return f"""
WITH b AS (
  SELECT doc_id,
         CAST({H60.format(x='source')} % 1024 AS BIGINT) AS src_bin
  FROM documents),
mm AS (
  SELECT MIN(src_bin) AS xmin, MAX(src_bin) AS xmax,
         MIN(doc_id) AS ymin, MAX(doc_id) AS ymax FROM b),
binned AS (
  SELECT doc_id, src_bin, {xb} AS xb, {yb} AS yb FROM b CROSS JOIN mm)
SELECT doc_id, src_bin,
       CAST({morton_interleave_sql('xb', 'yb', 10)} AS BIGINT) AS zkey
FROM binned
"""


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/selection.source_drift_matrix — pairwise exact-integer
    Jeffreys divergence (symmetric KL) between sources over hashed
    2-gram bucket histograms: the distribution-shape drift monitor that
    complements KMV identity overlap (sketch_kmv_matrix).  Probabilities
    are integral parts-per-billion, logs are log2_milli — every step
    64-bit integer arithmetic, recomputed bit-for-bit by the oracle over
    the full smoothing grid."""
    from scalpel_spark.operators.selection import source_drift_matrix

    return source_drift_matrix(
        _t(spark, sf_dir, 'documents'), n_buckets=512, shingle_n=2)


ORACLE_SOURCE_DRIFT = f"""
WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS l
             FROM documents),
sh AS (SELECT source, l[i] || ' ' || l[i + 1] AS shingle
       FROM (SELECT source, l, UNNEST(generate_series(1, len(l) - 1)) AS i
             FROM tok)),
counts AS (
  SELECT source AS g, {H60.format(x='shingle')} % 512 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM sh GROUP BY 1, 2),
tots AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS tot FROM counts GROUP BY 1),
grid AS (
  SELECT t.g, t.tot, b.bucket, COALESCE(c.cnt, 0) AS cnt
  FROM tots t CROSS JOIN (SELECT UNNEST(range(512)) AS bucket) b
  LEFT JOIN counts c ON c.g = t.g AND c.bucket = b.bucket),
pp AS (
  SELECT g, bucket,
         CAST(CAST(cnt + 1 AS HUGEINT) * 1000000000 // (tot + 512) AS BIGINT)
             AS p_ppb
  FROM grid),
pl AS (SELECT g, bucket, p_ppb,
              {log2_milli_sql('GREATEST(p_ppb, 1)')} AS l_milli
       FROM pp)
SELECT a.g AS src_a, b.g AS src_b,
       CAST(SUM((a.p_ppb - b.p_ppb) * (a.l_milli - b.l_milli)) AS BIGINT)
           AS jeffreys_pico
FROM pl a JOIN pl b ON a.bucket = b.bucket AND a.g < b.g
GROUP BY 1, 2
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/clustering.embedding_outliers — per-cluster noise gate:
    k-means blocks (broadcast-argmin assignment), exact integer squared
    distance to the owning centroid, and the cluster's exact p90 distance
    quantile as a reproducible keep threshold.  A composition of two
    exact primitives (kmeans_fit × exact_quantiles); the oracle replays
    the full Lloyd chain (shared _kmeans_cte), recomputes every distance,
    and applies the identical integer-ppm rank rule."""
    return clustering.embedding_outliers(
        _t(spark, sf_dir, 'embeddings'), k=4, iters=2, high_ppm=900_000)


ORACLE_EMBEDDING_OUTLIERS = f"""
WITH {_kmeans_cte(4, 2)},
dist AS (
  SELECT q.vec_id, CAST(a.cell AS BIGINT) AS cell,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
              j -> (qv[j] - cvec[j]) * (qv[j] - cvec[j]))) AS BIGINT) AS d2
  FROM q JOIN asg2 a USING (vec_id) JOIN cv2 ON a.cell = cv2.cell),
counts AS (SELECT cell, d2 AS v, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM dist GROUP BY 1, 2),
tot AS (SELECT cell, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY 1),
cum AS (SELECT cell, v, cnt,
               SUM(cnt) OVER (PARTITION BY cell ORDER BY v) AS cum
        FROM counts),
band AS (
  SELECT c.cell,
         MIN(CASE WHEN (900000 * t.n + 999999) // 1000000
                       BETWEEN c.cum - c.cnt + 1 AND c.cum
                  THEN c.v END) AS q_high
  FROM cum c JOIN tot t USING (cell) GROUP BY c.cell)
SELECT d.vec_id, d.cell, d.d2, b.q_high, (d.d2 <= b.q_high) AS keep
FROM dist d JOIN band b USING (cell)
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/asof.asof_join — temporal as-of lookup (Spark has no
    builtin; SPARK-22947 never merged): every purchase event matched to
    the same user's most recent view at-or-before it.  Implementation is
    union + carry-forward decomposed by TIME-RANGE BUCKET (per-(key,
    bucket) windows + a metadata-scale cross-bucket fallback frame), so
    a hot key's history never lands in one task; result provably
    independent of the bucket count (tests sweep 1/4/64).  The oracle is
    DuckDB's NATIVE ASOF LEFT JOIN — a fully independent implementation
    of the same semantics."""
    from scalpel_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, 'events')
    left = ev.filter(F.col('event_type') == 'purchase').select(
        'event_id', 'user_id',
        F.unix_micros(F.col('ts').cast('timestamp')).alias('t'))
    right = ev.filter(F.col('event_type') == 'view').select(
        'user_id',
        F.unix_micros(F.col('ts').cast('timestamp')).alias('vts'),
        F.col('event_id').alias('view_event'))
    return asof_join(left, right, on='user_id', left_ts='t',
                     right_ts='vts', right_cols=['view_event'])


# Right side pre-deduped per (user_id, ts) to max(event_id), mirroring
# the operator's in-operator struct-greatest tie dedupe: DuckDB's native
# ASOF picks an ARBITRARY row on duplicate (key, ts) — without the
# GROUP BY the compare would be flaky whenever the events table holds
# two views at the same instant (ADVICE r4, asof.py:29).
ORACLE_ASOF_JOIN = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS t,
       epoch_us(r.ts) AS matched_ts, r.event_id AS r_view_event
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, ts) r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/ranges.interval_join — grid-decomposed range join (the
    IP→ASN attribution lookup: politeness by network owner, not just
    host).  Narrow intervals explode into per-bucket equi-join keys
    (bucket width = mean span, one exact-integer aggregate); the few
    wide intervals broadcast through a theta join.  The oracle is the
    plain SQL containment theta join, evaluated directly by DuckDB —
    independent of the decomposition entirely."""
    from scalpel_spark.operators.ranges import interval_join

    cust = _t(spark, sf_dir, 'customer').select(
        (F.col('c_custkey') * 97 % 9500).alias('ip'), 'c_custkey')
    lo = (F.col('s_suppkey') * 137) % 9000
    iv = _t(spark, sf_dir, 'supplier').select(
        lo.alias('lo'), (lo + (F.col('s_suppkey') % 61) * 5).alias('hi'),
        F.col('s_suppkey').alias('asn'))
    return interval_join(cust, iv, 'ip', 'lo', 'hi', wide_buckets=8)


ORACLE_INTERVAL_JOIN = """
WITH pts AS (SELECT c_custkey * 97 % 9500 AS ip, c_custkey FROM customer),
iv AS (SELECT (s_suppkey * 137) % 9000 AS lo,
              (s_suppkey * 137) % 9000 + (s_suppkey % 61) * 5 AS hi,
              s_suppkey AS asn
       FROM supplier)
SELECT p.ip, p.c_custkey, i.lo, i.hi, i.asn
FROM pts p JOIN iv i ON p.ip >= i.lo AND p.ip <= i.hi
"""


def q_latency_budget_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduling.latency_budget_quantile — tail-aware politeness: the
    per-host pause scales with the host's exact p95 response time (the
    saturation signal a mean hides on bimodal servers), composed from
    exact_quantiles + the same integer delay/budget algebra as
    latency_budget.  Identical synthetic fetch log as the mean variant,
    so the two queries pin mean-vs-tail pacing side by side."""
    from scalpel_spark.operators import scheduling

    orders = _t(spark, sf_dir, 'orders')
    k = F.col('o_orderkey')
    fetches = orders.select(
        F.concat(F.lit('h'), F.pmod(F.col('o_custkey'), F.lit(20))
                 .cast('string')).alias('host'),
        ((k % 97).cast('double') / 10.0 + 1.0).alias('fetch_ms'),
    )
    return scheduling.latency_budget_quantile(
        fetches, wave_duration_ms=60_000, p_ppm=950_000,
        min_budget=1, max_budget=5000)


ORACLE_LATENCY_BUDGET_P95 = """
WITH fetches AS (
  SELECT 'h' || CAST(o_custkey % 20 AS VARCHAR) AS host,
         CAST(o_orderkey % 97 AS DOUBLE) / 10.0 + 1.0 AS fetch_ms
  FROM orders),
us AS (
  SELECT host, CAST(floor(fetch_ms * 1000) AS BIGINT) AS u FROM fetches),
counts AS (
  SELECT host, u, CAST(COUNT(*) AS BIGINT) AS cnt FROM us GROUP BY 1, 2),
tot AS (SELECT host, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY 1),
cum AS (SELECT host, u, cnt,
               SUM(cnt) OVER (PARTITION BY host ORDER BY u) AS cum
        FROM counts),
q AS (
  SELECT c.host, t.n AS n_fetches,
         MIN(CASE WHEN (950000 * t.n + 999999) // 1000000
                       BETWEEN c.cum - c.cnt + 1 AND c.cum
                  THEN c.u END) AS p_fetch_us
  FROM cum c JOIN tot t USING (host) GROUP BY c.host, t.n),
b AS (
  SELECT host, n_fetches, p_fetch_us,
         (2000000 * p_fetch_us) // 1000000 AS delay_us
  FROM q)
SELECT host, n_fetches, p_fetch_us, delay_us,
       LEAST(CAST(5000 AS BIGINT),
             GREATEST(CAST(1 AS BIGINT),
                      60000000 // GREATEST(CAST(1 AS BIGINT), delay_us)))
         AS budget
FROM b
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/substr.ngram_novelty — per-document memorization-risk
    score: the fraction of 8-gram windows that are corpus-duplicated
    (Lee et al. 2022 correlate duplication with verbatim memorization).
    Scores text the strike pass would rewrite; exact integer ppm; run
    over docs_plus so the planted duplicates exercise the dup branch."""
    return substr.ngram_novelty(_docs_plus(spark, sf_dir),
                                window_tokens=8, min_count=2)


ORACLE_NGRAM_NOVELTY = f"""
WITH {DOCS_PLUS_SQL},
t AS (SELECT doc_id, string_split(text, ' ') AS l FROM docs_plus),
wins AS (
  SELECT doc_id, {H60.format(x='win')} AS h
  FROM (SELECT doc_id, unnest(w) AS win
        FROM (SELECT doc_id, {_SUBSTR_WIN_SQL} AS w FROM t))),
dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
scored AS (
  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows
  FROM wins w LEFT JOIN dup d ON w.h = d.h GROUP BY w.doc_id)
SELECT t.doc_id,
       COALESCE(s.n_windows, 0) AS n_windows,
       COALESCE(s.n_dup_windows, 0) AS n_dup_windows,
       CAST(CASE WHEN COALESCE(s.n_windows, 0) > 0
                 THEN (s.n_windows - s.n_dup_windows) * 1000000 // s.n_windows
                 ELSE 1000000 END AS BIGINT) AS novelty_ppm
FROM t LEFT JOIN scored s USING (doc_id)
"""


def q_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation.chunk_documents_cdc — content-defined chunking: chunk
    boundaries after tokens whose hash ≡ 0 mod 64, so an edit changes
    only its own chunk and every later chunk stays byte-identical
    (dedup-friendly storage / chunk-level dedup; fixed-stride
    chunk_documents re-aligns everything after an edit).  Boundary flags
    map-side, per-doc running sum, one reassembly groupBy."""
    return curation.chunk_documents_cdc(
        _t(spark, sf_dir, 'documents'), mean_tokens=64)


ORACLE_CHUNK_CDC = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
           WHERE len(string_split(text, ' ')) > 0),
ex AS (
  SELECT doc_id, pos - 1 AS pos, tok,
         CASE WHEN {H60.format(x='tok')} % 64 = 0 THEN 1 ELSE 0 END AS b
  FROM (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
        FROM t)),
cs AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS chunk_seq
  FROM ex)
SELECT doc_id, CAST(chunk_seq AS BIGINT) AS chunk_seq,
       CAST(MIN(pos) AS BIGINT) AS start,
       CAST(COUNT(*) AS BIGINT) AS chunk_len,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM cs GROUP BY doc_id, chunk_seq
"""


_CACHE_T0 = 1_700_000_000_000_000  # fixed epoch µs for the capture log
_CACHE_NOW = _CACHE_T0 + 7_500_000_000


def q_cache_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/caching.cache_freshness — RFC 9111 declared-freshness
    revisit planning (the pre-second-visit leg of the recrawl stack,
    beside change-rate and validator planning): no-store/no-cache >
    max-age > Expires−Date > the 10% Date−Last-Modified heuristic,
    negative lifetimes clamped, strict fresh_until > now.  Deterministic
    capture log synthesized from orders with every precedence branch
    populated; map-side only."""
    from scalpel_spark.operators.caching import cache_freshness

    k = F.col('o_orderkey')
    fetched = (F.lit(_CACHE_T0) + k * 1_000_000).cast('long')
    cc = (
        F.when(k % 5 == 0, F.concat(F.lit('max-age='),
                                    (k % 900).cast('string')))
        .when(k % 5 == 1, F.lit('no-cache'))
        .when(k % 5 == 2, F.lit('no-store, max-age=60'))
        .when(k % 5 == 3, F.lit('public'))
        .otherwise(F.lit(None).cast('string'))
    )
    date_us = F.when(k % 7 != 0, fetched).otherwise(
        F.lit(None).cast('long'))
    captures = _t(spark, sf_dir, 'orders').select(
        F.concat(F.lit('u'), k.cast('string')).alias('url'),
        fetched.alias('fetched_us'),
        cc.alias('cache_control'),
        date_us.alias('date_us'),
        F.when(k % 3 == 0, date_us + ((k % 1200) - 300) * 1_000_000)
        .otherwise(F.lit(None).cast('long')).alias('expires_us'),
        F.when(k % 2 == 0, date_us - (k % 5000) * 1_000_000)
        .otherwise(F.lit(None).cast('long')).alias('last_modified_us'),
    )
    return cache_freshness(captures, now_us=_CACHE_NOW)


ORACLE_CACHE_FRESHNESS = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         {_CACHE_T0} + o_orderkey * 1000000 AS f
  FROM orders),
cap AS (
  SELECT 'u' || CAST(k AS VARCHAR) AS url, f AS fetched_us,
         CASE k % 5
           WHEN 0 THEN 'max-age=' || CAST(k % 900 AS VARCHAR)
           WHEN 1 THEN 'no-cache'
           WHEN 2 THEN 'no-store, max-age=60'
           WHEN 3 THEN 'public' END AS cache_control,
         CASE WHEN k % 7 <> 0 THEN f END AS date_us, k
  FROM base),
cap2 AS (
  SELECT url, fetched_us, cache_control, date_us,
         CASE WHEN k % 3 = 0
              THEN date_us + (k % 1200 - 300) * 1000000 END AS expires_us,
         CASE WHEN k % 2 = 0
              THEN date_us - (k % 5000) * 1000000 END AS last_modified_us
  FROM cap),
life AS (
  SELECT url, fetched_us,
         GREATEST(CAST(0 AS BIGINT), CAST(
           CASE
             WHEN regexp_matches(COALESCE(cache_control, ''),
                                 'no-store|no-cache') THEN 0
             WHEN regexp_extract(COALESCE(cache_control, ''),
                                 'max-age\\s*=\\s*(\\d+)', 1) <> ''
               THEN CAST(regexp_extract(COALESCE(cache_control, ''),
                         'max-age\\s*=\\s*(\\d+)', 1) AS BIGINT) * 1000000
             WHEN expires_us IS NOT NULL AND date_us IS NOT NULL
               THEN expires_us - date_us
             WHEN date_us IS NOT NULL AND last_modified_us IS NOT NULL
               THEN (date_us - last_modified_us) * 100000 // 1000000
             ELSE 0 END AS BIGINT)) AS lifetime_us,
         regexp_matches(COALESCE(cache_control, ''), 'no-store') AS no_store
  FROM cap2)
SELECT url, lifetime_us, fetched_us + lifetime_us AS fresh_until_us,
       no_store,
       CASE WHEN fetched_us + lifetime_us > {_CACHE_NOW}
            THEN 'fresh' ELSE 'revalidate' END AS decision
FROM life
"""


def q_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.token_spectrum — Zipf frequency spectrum
    (count-of-counts): the one-glance corpus health plot and the input
    to Good-Turing smoothing.  Two partial-agg shuffles, second over
    distinct frequencies only."""
    return textops.token_spectrum(_t(spark, sf_dir, 'documents'))


ORACLE_TOKEN_SPECTRUM = """
WITH counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok)
SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_types
FROM counts GROUP BY freq
"""


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.vocab_growth — Heaps-law vocabulary growth at 8
    checkpoints over the deterministic md5-shuffle-key prefix order:
    per-token FIRST bucket via one min-agg (no per-prefix distinct
    pass), cumulative windows over ≤ 8 rows.  The saturation signal for
    'is more crawling still buying new vocabulary?'."""
    return textops.vocab_growth(_t(spark, sf_dir, 'documents'), n_points=8)


ORACLE_VOCAB_GROWTH = f"""
WITH ex AS (
  SELECT ({H60.format(x='CAST(doc_id AS VARCHAR)')} >> 57) AS bucket,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
per_tok AS (SELECT tok, MIN(bucket) AS fb FROM ex GROUP BY tok),
fc AS (SELECT fb AS point, CAST(COUNT(*) AS BIGINT) AS n_new
       FROM per_tok GROUP BY fb),
mass AS (SELECT bucket AS point, CAST(COUNT(*) AS BIGINT) AS n_occ
         FROM ex GROUP BY bucket)
SELECT point,
       CAST(SUM(n_occ) OVER (ORDER BY point) AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY point) AS BIGINT)
           AS vocab_cum
FROM mass LEFT JOIN fc USING (point)
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation.hash_sample — consistent (deterministic) sampling: keep
    iff hash60(salt|key) mod 1e6 < rate.  Unlike df.sample()'s
    per-task-attempt RNG, membership is a pure function of the key —
    reproducible across runs/retries/datasets, so held-out splits stay
    held out and two tables' samples join.  Map-side only."""
    return curation.hash_sample(
        _t(spark, sf_dir, 'documents'), 250_000, 'doc_id')


ORACLE_HASH_SAMPLE = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE {H60.format(x="'|' || CAST(doc_id AS VARCHAR)")} % 1000000 < 250000
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.skew_report — key-skew diagnosis before a big
    groupBy/join: top-k hot keys with exact integral row shares plus a
    __total__ summary row carrying the max key share (the alert
    number).  The top-k cut is orderBy().limit(k) = TakeOrdered — no
    global sort task; exercised on a synthetic 1/3-hot key mix."""
    from scalpel_spark.operators.skew import skew_report

    f = _t(spark, sf_dir, 'orders').select(
        F.when(F.col('o_orderkey') % 3 == 0, F.lit('hot'))
        .otherwise(F.concat(F.lit('h'),
                            (F.col('o_custkey') % 50).cast('string')))
        .alias('host'))
    return skew_report(f, 'host', top_k=5)


ORACLE_SKEW_REPORT = """
WITH f AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'hot'
              ELSE 'h' || CAST(o_custkey % 50 AS VARCHAR) END AS key
  FROM orders),
counts AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM f GROUP BY key),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
               CAST(MAX(n_rows) AS BIGINT) AS mx FROM counts),
top AS (SELECT key, n_rows,
               ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rnk
        FROM counts QUALIFY rnk <= 5)
SELECT '__total__' AS key, t AS n_rows, mx * 1000000 // t AS share_ppm,
       CAST(0 AS BIGINT) AS rank
FROM tot
UNION ALL
SELECT top.key, top.n_rows, top.n_rows * 1000000 // tot.t AS share_ppm,
       CAST(top.rnk AS BIGINT) AS rank
FROM top, tot
"""


def q_url_homograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """urlfilter.homograph_flags — IDN homograph screen (UTS #39
    mixed-script labels, Cyrillic/Greek × Latin) + punycode declaration,
    per-LABEL so legitimate all-Cyrillic IDNs under a Latin TLD don't
    flag.  Deterministic URL mix planted from supplier covering every
    branch; map-side regexps in one higher-order exists."""
    from scalpel_spark.operators.urlfilter import homograph_flags

    k = F.col('s_suppkey')
    host = (
        F.when(k % 4 == 0, F.concat(F.lit('h'), k.cast('string'),
                                    F.lit('.example.com')))
        .when(k % 4 == 1, F.concat(F.lit('xn--'), k.cast('string'),
                                   F.lit('abc.test')))
        .when(k % 4 == 2, F.concat(F.lit('pаypal'), k.cast('string'),
                                   F.lit('.com')))
        .otherwise(F.concat(F.lit('αlpha'), k.cast('string'),
                            F.lit('.gr')))
    )
    urls = _t(spark, sf_dir, 'supplier').select(
        F.concat(F.lit('https://'), host, F.lit('/p')).alias('url'))
    return homograph_flags(urls)


ORACLE_URL_HOMOGRAPH = """
WITH u AS (
  SELECT CASE s_suppkey % 4
           WHEN 0 THEN 'h' || CAST(s_suppkey AS VARCHAR) || '.example.com'
           WHEN 1 THEN 'xn--' || CAST(s_suppkey AS VARCHAR) || 'abc.test'
           WHEN 2 THEN 'pаypal' || CAST(s_suppkey AS VARCHAR) || '.com'
           ELSE 'αlpha' || CAST(s_suppkey AS VARCHAR) || '.gr'
         END AS host
  FROM supplier),
c AS (SELECT 'https://' || host || '/p' AS url FROM u),
h AS (
  SELECT url,
         lower(split_part(split_part(split_part(split_part(
             url, '://', 2), '?', 1), '/', 1), ':', 1)) AS host
  FROM c),
m AS (
  SELECT url, host,
         regexp_matches(host, '(^|\\.)xn--') AS has_punycode,
         list_contains(
           list_transform(string_split(host, '.'),
             l -> regexp_matches(l, '[a-zA-Z]')
                  AND (regexp_matches(l, '[Ѐ-ӿ]')
                       OR regexp_matches(l, '[Ͱ-Ͽ]'))),
           true) AS mixed_script
  FROM h)
SELECT url, has_punycode, mixed_script, mixed_script AS suspicious FROM m
"""


def q_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation.curation_report — per-source governance rollup over the
    full curate() pipeline: survival counts by verdict and the exact
    integral kept share, the table a source-drop review reads.  The
    oracle nests the complete recursive curate oracle as a subquery and
    rolls it up identically."""
    docs = _docs_plus(spark, sf_dir)
    verdicts = curation.curate(docs, quality_threshold=0.45, n=4,
                               jaccard_threshold=0.5)
    return curation.curation_report(verdicts, docs)


def _curation_report_oracle() -> str:
    return f"""
WITH {DOCS_PLUS_SQL},
v AS ({_curate_oracle()})
SELECT d.source AS "group",
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN v.verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN v.verdict = 'low_quality' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_quality,
       CAST(SUM(CASE WHEN v.verdict = 'exact_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dup,
       CAST(SUM(CASE WHEN v.verdict = 'near_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_dup,
       CAST(SUM(CASE WHEN v.verdict = 'kept' THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS kept_ppm
FROM v JOIN docs_plus d USING (doc_id)
GROUP BY d.source
"""


def q_path_prefix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """urlfilter.path_prefix_stats — per-host path-prefix rollup (the
    hub/trap topology view: where a host's crawl budget goes, by
    directory).  Map-side prefix explode (≤ max_depth slim rows/URL),
    one groupBy.  Synthetic URL frame from orders with depths 0-3 and
    query noise; oracle replays the same string algebra."""
    from scalpel_spark.operators.urlfilter import path_prefix_stats

    k, c = F.col('o_orderkey'), F.col('o_custkey')
    url = F.concat(
        F.lit('https://h'), (c % 20).cast('string'), F.lit('.test'),
        F.when(k % 4 == 0, F.lit(''))
        .when(k % 4 == 1, F.concat(F.lit('/a'), (k % 5).cast('string')))
        .when(k % 4 == 2, F.concat(F.lit('/a'), (k % 5).cast('string'),
                                   F.lit('/b'), (k % 3).cast('string')))
        .otherwise(F.concat(F.lit('/a'), (k % 5).cast('string'),
                            F.lit('/b'), (k % 3).cast('string'),
                            F.lit('/c'), (k % 2).cast('string'))),
        F.when(k % 6 == 0, F.lit('?p=1/2')).otherwise(F.lit('')),
    )
    return path_prefix_stats(
        _t(spark, sf_dir, 'orders').select(url.alias('url')), max_depth=2)


ORACLE_PATH_PREFIX = """
WITH u AS (
  SELECT 'https://h' || CAST(o_custkey % 20 AS VARCHAR) || '.test'
         || CASE o_orderkey % 4
              WHEN 0 THEN ''
              WHEN 1 THEN '/a' || CAST(o_orderkey % 5 AS VARCHAR)
              WHEN 2 THEN '/a' || CAST(o_orderkey % 5 AS VARCHAR)
                          || '/b' || CAST(o_orderkey % 3 AS VARCHAR)
              ELSE '/a' || CAST(o_orderkey % 5 AS VARCHAR)
                   || '/b' || CAST(o_orderkey % 3 AS VARCHAR)
                   || '/c' || CAST(o_orderkey % 2 AS VARCHAR)
            END
         || CASE WHEN o_orderkey % 6 = 0 THEN '?p=1/2' ELSE '' END AS url
  FROM orders),
s AS (
  SELECT lower(split_part(split_part(split_part(split_part(
             url, '://', 2), '?', 1), '/', 1), ':', 1)) AS host,
         list_filter(
           string_split(
             CASE WHEN strpos(split_part(split_part(url, '://', 2),
                                         '?', 1), '/') > 0
                  THEN substr(split_part(split_part(url, '://', 2),
                                         '?', 1),
                              strpos(split_part(split_part(url, '://', 2),
                                                '?', 1), '/'))
                  ELSE '' END, '/'),
           x -> x <> '') AS segs
  FROM u),
ex AS (
  SELECT host,
         UNNEST(generate_series(1, LEAST(2, len(segs)))) AS d, segs
  FROM s WHERE len(segs) > 0)
SELECT host, CAST(d AS BIGINT) AS depth,
       '/' || array_to_string(list_slice(segs, 1, d), '/') AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM ex GROUP BY host, d, prefix
"""


def q_asof_next_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/asof.asof_next_join — FORWARD as-of: the earliest right
    row at-or-after each left timestamp ('which capture superseded this
    one'), implemented by axis negation over the backward join so the
    bucket decomposition is inherited, not re-proven.  Oracle: DuckDB's
    native forward ASOF LEFT JOIN (l.ts <= r.ts)."""
    from scalpel_spark.operators.asof import asof_next_join

    ev = _t(spark, sf_dir, 'events')
    left = ev.filter(F.col('event_type') == 'purchase').select(
        'event_id', 'user_id',
        F.unix_micros(F.col('ts').cast('timestamp')).alias('t'))
    right = ev.filter(F.col('event_type') == 'view').select(
        'user_id',
        F.unix_micros(F.col('ts').cast('timestamp')).alias('vts'),
        F.col('event_id').alias('view_event'))
    return asof_next_join(left, right, on='user_id', left_ts='t',
                          right_ts='vts', right_cols=['view_event'])


# Same tie-proofing as ORACLE_ASOF_JOIN: dedupe right per (key, ts).
# NOTE the forward join negates the axis internally, so its payload
# struct compares on NEGATED ts first — within one (key, ts) group ts
# is constant either way and max(event_id) is the matching tie-break.
ORACLE_ASOF_NEXT = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS t,
       epoch_us(r.ts) AS matched_ts, r.event_id AS r_view_event
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, ts) r
ON l.user_id = r.user_id AND l.ts <= r.ts
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash-LSH dedup over the sf0.001 documents table."""
    return q_dedup_minhash_lsh(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER IS THE VERIFICATION POLICY (VERDICT r3 #2, r4 Next #1):
    # the driver oracle-checks the FIRST 50 entries per round. Round-5
    # window = 5 r4-green canaries (regression tripwires spanning the
    # engine, frontier dedup, politeness window, MinHash-LSH, and
    # streaming) + 2 queries NEW this round (render-mode divergence,
    # per-record-gzip WARC round-trip) + 43 queries that have NEVER had
    # a driver row — the whole LLM-pipeline tail the r4 verdict ranked
    # first (line/substr/semantic dedup, curation, BM25 index, DSIR,
    # content extraction, BPE, sketches, WARC, quantiles, layout,
    # temporal joins). 45 first-time rows this round; union of driver
    # rows r1-r5 then covers 142/170. Entries 51+ stay ordered
    # never-checked-first (27 remain) so a future rotation picks them
    # up next; the tail is the r4/r3/earlier driver-green evidence
    # already recorded in CORRECTNESS_r0{1..4}.json.
    return {
        # -- canaries (driver-green in r4, kept in-window as tripwires) --
        'frontier_dedup_anti_join': q_frontier_dedup_anti_join,
        'politeness_dispatch_window': q_politeness_dispatch_window,
        'dedup_minhash_lsh': q_dedup_minhash_lsh,
        'crawl_golden_http': q_crawl_golden_http,
        'stream_dedup_watermark': q_stream_dedup_watermark,
        # -- NEW this round: S5 render-mode oracle + gzip WARC members --
        'crawl_render_mode': q_crawl_render_mode,
        'warc_gzip_roundtrip': q_warc_gzip_roundtrip,
        # -- first-time driver rows: LLM-pipeline tail (VERDICT r4 #1) --
        'line_dedup': q_line_dedup,
        'line_quality_filter': q_line_quality_filter,
        'dedup_substr_strike': q_substr_strike,
        'classifier_scores': q_classifier_scores,
        'semdedup': q_semdedup,
        'kmeans_assign': q_kmeans_assign,
        'embedding_outliers': q_embedding_outliers,
        'url_dust_rules': q_url_dust_rules,
        'cdx_revisit_index': q_cdx_revisit_index,
        'pipeline_decontaminate': q_decontaminate,
        'domain_cap': q_domain_cap,
        'source_reputation': q_source_reputation,
        'index_champion_postings': q_index_champion_postings,
        'index_anchor_terms': q_index_anchor_terms,
        'index_collocations': q_index_collocations,
        'index_bm25_topk': q_index_bm25_topk,
        'selection_dsir_weights': q_selection_dsir_weights,
        'selection_dsir_select': q_selection_dsir_select,
        'source_drift': q_source_drift,
        'content_media_captions': q_content_media_captions,
        'content_main_extract': q_content_main_extract,
        'content_host_templates': q_content_host_templates,
        'content_strip_templates': q_content_strip_templates,
        'content_caption_pairs': q_content_caption_pairs,
        'content_pack_interleaved': q_content_pack_interleaved,
        'vocab_bpe_merges': q_vocab_bpe_merges,
        'vocab_bpe_encode': q_vocab_bpe_encode,
        'sketch_hll_sources': q_sketch_hll_sources,
        'sketch_cms_heavy_hitters': q_sketch_cms_heavy_hitters,
        'sketch_kmv_overlap': q_sketch_kmv_overlap,
        'sketch_kmv_matrix': q_sketch_kmv_matrix,
        'warc_serialize': q_warc_serialize,
        'warc_ingest': q_warc_ingest,
        'warc_to_documents': q_warc_to_documents,
        'media_phash_dedup': q_media_phash_dedup,
        'latency_quantiles': q_latency_quantiles,
        'quantile_length_gate': q_quantile_length_gate,
        'c4_filter': q_c4_filter,
        'zorder_layout': q_zorder_layout,
        'epoch_layout': q_epoch_layout,
        'asof_join': q_asof_join,
        'asof_next_join': q_asof_next_join,
        'interval_join': q_interval_join,
        # ---- driver window ends here (50 entries above) ----
        # never-driver-checked remainder (27), first in line next round
        'media_sniff_types': q_media_sniff_types,
        'media_sniff_charset': q_media_sniff_charset,
        'latency_budget_p95': q_latency_budget_p95,
        'ngram_novelty': q_ngram_novelty,
        'chunk_cdc': q_chunk_cdc,
        'cache_freshness': q_cache_freshness,
        'token_spectrum': q_token_spectrum,
        'vocab_growth': q_vocab_growth,
        'hash_sample': q_hash_sample,
        'skew_report': q_skew_report,
        'url_homograph': q_url_homograph,
        'curation_report': q_curation_report,
        'path_prefix_stats': q_path_prefix_stats,
        'link_context': q_link_context,
        'anchor_text_profile': q_anchor_text_profile,
        'url_dust_strip': q_url_dust_strip,
        'mirror_hosts': q_mirror_hosts,
        'soft404_flags': q_soft404_flags,
        'url_rel_canonical': q_url_rel_canonical,
        'feed_discovery': q_feed_discovery,
        'url_quality_filter': q_url_quality_filter,
        'url_trap_scores': q_url_trap_scores,
        'sitemap_delta': q_sitemap_delta,
        'robots_directives': q_robots_directives,
        'host_anti_trust_rank': q_host_anti_trust_rank,
        'host_spam_mass': q_host_spam_mass,
        'link_spam_features': q_link_spam_features,
        # r4-driver-green set (CORRECTNESS_r04.json rows on record) and
        # earlier-round evidence, unchanged order
        'stream_politeness_drain': q_stream_politeness_drain,
        'fetch_mapinpandas': q_fetch_mapinpandas,
        'crawl_golden_http_mapinpandas': q_crawl_golden_http_mapinpandas,
        'crawl_golden_statistics': q_crawl_golden_statistics,
        'crawl_manyhosts_robots': q_crawl_manyhosts_robots,
        'crawl_politeness_budget': q_crawl_politeness_budget,
        'crawl_priority_frontier': q_crawl_priority_frontier,
        'crawl_synthetic_politeness': q_crawl_synthetic_politeness,
        'crawl_green_file_bypass': q_crawl_green_file_bypass,
        'crawl_canonicalized_seen': q_crawl_canonicalized_seen,
        'crawl_dust_alias': q_crawl_dust_alias,
        'crawl_opic_adaptive': q_crawl_opic_adaptive,
        'crawl_content_dedup': q_crawl_content_dedup,
        'crawl_global_budget': q_crawl_global_budget,
        'crawl_retry_requeue': q_crawl_retry_requeue,
        'crawl_ip_politeness': q_crawl_ip_politeness,
        'crawl_priority_global': q_crawl_priority_global,
        'crawl_host_budget_table': q_crawl_host_budget_table,
        'crawl_rank_recrawl': q_crawl_rank_recrawl,
        'crawl_sitemap_bootstrap': q_crawl_sitemap_bootstrap,
        'crawl_feed_bootstrap': q_crawl_feed_bootstrap,
        'crawl_score_aging': q_crawl_score_aging,
        'crawl_robots_refresh': q_crawl_robots_refresh,
        'crawl_shard_rendezvous': q_crawl_shard_rendezvous,
        'crawl_canonical_fold': q_crawl_canonical_fold,
        'crawl_host_rank': q_crawl_host_rank,
        'crawl_meta_robots': q_crawl_meta_robots,
        'crawl_snapshot_diff': q_crawl_snapshot_diff,
        'host_rank': q_host_rank,
        'host_trust_rank': q_host_trust_rank,
        'host_hits': q_host_hits,
        'host_opic': q_host_opic,
        'plan_host_budgets': q_plan_host_budgets,
        'adaptive_backoff': q_adaptive_backoff,
        'conditional_fetch_plan': q_conditional_fetch_plan,
        'retry_after_backoff': q_retry_after_backoff,
        'latency_budget': q_latency_budget,
        'change_rates': q_change_rates,
        'recrawl_selection': q_recrawl_selection,
        'similarity_quantized_topk': q_similarity_quantized_topk,
        'similarity_pq_topk': q_similarity_pq_topk,
        'similarity_ivf_pq': q_similarity_ivf_pq,
        'spans_fingerprint_golden': q_spans_fingerprint_golden,
        'spans_media_stats': q_spans_media_stats,
        'spans_parity_check': q_spans_parity_check,
        'media_frontier_dedup': q_media_frontier_dedup,
        'events_sessionize': q_events_sessionize,
        'tpch_pricing_summary': q_tpch_pricing_summary,
        'url_canonicalize_golden': q_url_canonicalize_golden,
        'robots_broadcast_join': q_robots_broadcast_join,
        'fetch_sortmerge_join': q_fetch_sortmerge_join,
        'discovery_order_posexplode': q_discovery_order_posexplode,
        'seen_union_statistics': q_seen_union_statistics,
        'crawl_statistics_agg': q_crawl_statistics_agg,
        'topk_per_group': q_topk_per_group,
        'host_extraction': q_host_extraction,
        'skew_salted_aggregation': q_skew_salted_aggregation,
        'tpch_shipping_priority': q_tpch_shipping_priority,
        'url_frontier_canonical': q_url_frontier_canonical,
        'dedup_exact': q_dedup_exact,
        'dedup_ngram_jaccard': q_dedup_ngram_jaccard,
        'dedup_cluster_canonical': q_dedup_cluster_canonical,
        'pipeline_curate': q_pipeline_curate,
        'sample_token_budget': q_sample_token_budget,
        'sample_mixture': q_mixture_sample,
        'pack_sequences': q_pack_sequences,
        'dedup_minhash_incremental': q_dedup_incremental,
        'dedup_simhash': q_dedup_simhash,
        'dedup_embedding_cosine': q_dedup_embedding_cosine,
        'similarity_topk_bruteforce': q_similarity_topk_bruteforce,
        'similarity_lsh_ann': q_similarity_lsh_ann,
        'similarity_ivf': q_similarity_ivf,
        'similarity_ivf_nprobe2': q_similarity_ivf_nprobe2,
        'dedup_containment': q_dedup_containment,
        'text_langid': q_text_langid,
        'text_quality_scores': q_text_quality_scores,
        'text_token_counts': q_text_token_counts,
        'text_normalize': q_text_normalize,
        'text_normalize_unicode': q_text_normalize_unicode,
        'text_fingerprints': q_text_fingerprints,
        'text_redact_pii': q_text_redact_pii,
        'text_repetition': q_text_repetition,
        'text_corpus_freq': q_text_corpus_freq,
        'text_tfidf_keywords': q_text_tfidf_keywords,
        'text_bigram_lm': q_text_bigram_lm,
        'sitemap_extract': q_sitemap_extract,
        'embedding_quantize': q_embedding_quantize,
        'shard_stats': q_shard_stats,
        'chunk_documents': q_chunk_documents,
        'url_registered_domain': q_url_registered_domain,
        'robots_rfc9309': q_robots_rfc9309,
        'url_resolve_redirects': q_url_resolve_redirects,
        'crawl_rfc9309': q_crawl_rfc9309,
    }


def oracle_sql() -> dict[str, str]:
    return {
        'tpch_pricing_summary': ORACLE_TPCH_Q1,
        'frontier_dedup_anti_join': ORACLE_ANTI_JOIN,
        'robots_broadcast_join': ORACLE_BROADCAST,
        'fetch_sortmerge_join': ORACLE_SORTMERGE,
        'politeness_dispatch_window': ORACLE_DISPATCH,
        'discovery_order_posexplode': ORACLE_POSEXPLODE,
        'seen_union_statistics': ORACLE_UNION,
        'crawl_statistics_agg': ORACLE_STATS,
        'topk_per_group': ORACLE_TOPK,
        'host_extraction': ORACLE_HOST,
        'skew_salted_aggregation': ORACLE_SALTED,
        'tpch_shipping_priority': ORACLE_TPCH_Q3,
        'url_canonicalize_golden': ORACLE_URL,
        'url_frontier_canonical': ORACLE_CANON,
        'dedup_exact': ORACLE_DEDUP_EXACT,
        'dedup_ngram_jaccard': ORACLE_JACCARD,
        'dedup_cluster_canonical': ORACLE_CLUSTERS,
        'pipeline_curate': _curate_oracle(),
        'sample_token_budget': ORACLE_TOKEN_BUDGET,
        'sample_mixture': ORACLE_MIXTURE,
        'pack_sequences': ORACLE_PACK_SEQUENCES,
        'dedup_minhash_lsh': ORACLE_MINHASH,
        'dedup_minhash_incremental': ORACLE_MINHASH_INCREMENTAL,
        'dedup_simhash': _simhash_oracle(),
        'dedup_embedding_cosine': ORACLE_EMB_DUP,
        'similarity_topk_bruteforce': ORACLE_SIM_TOPK,
        'similarity_lsh_ann': ORACLE_SIM_LSH,
        'similarity_ivf': ORACLE_SIM_IVF,
        'similarity_ivf_nprobe2': ORACLE_SIM_IVF_NPROBE2,
        'dedup_containment': ORACLE_CONTAINMENT,
        'text_langid': _langid_oracle(),
        'text_quality_scores': _quality_oracle(),
        'text_token_counts': ORACLE_TOKEN_COUNTS,
        'text_normalize': ORACLE_TEXT_NORMALIZE,
        'text_normalize_unicode': ORACLE_TEXT_NFC,
        'text_fingerprints': ORACLE_FINGERPRINTS,
        'text_redact_pii': _redact_oracle(),
        'text_repetition': ORACLE_REPETITION,
        'text_corpus_freq': ORACLE_CORPUS_FREQ,
        'text_tfidf_keywords': ORACLE_TFIDF,
        'text_bigram_lm': ORACLE_BIGRAM_LM,
        'sitemap_extract': ORACLE_SITEMAP,
        'embedding_quantize': ORACLE_QUANTIZE,
        'shard_stats': ORACLE_SHARD_STATS,
        'chunk_documents': ORACLE_CHUNK_DOCUMENTS,
        'url_registered_domain': ORACLE_URL_REGISTERED_DOMAIN.replace(
            '{suffixes}', _suffix_list_sql()),
        'robots_rfc9309': ORACLE_ROBOTS_RFC9309,
        'url_resolve_redirects': ORACLE_RESOLVE_REDIRECTS,
        'crawl_rfc9309': ORACLE_CRAWL_RFC9309,
        'fetch_mapinpandas': ORACLE_FETCH_MAPINPANDAS,
        'crawl_content_dedup': ORACLE_CRAWL_CONTENT_DEDUP,
        'crawl_global_budget': ORACLE_CRAWL_GLOBAL_BUDGET,
        'crawl_retry_requeue': ORACLE_CRAWL_RETRY_REQUEUE,
        'crawl_ip_politeness': ORACLE_CRAWL_IP_POLITENESS,
        'link_context': ORACLE_LINK_CONTEXT,
        'anchor_text_profile': ORACLE_ANCHOR_TEXT_PROFILE,
        'crawl_priority_global': ORACLE_CRAWL_PRIORITY_GLOBAL,
        'crawl_host_budget_table': ORACLE_CRAWL_HOST_BUDGET_TABLE,
        'crawl_rank_recrawl': ORACLE_CRAWL_RANK_RECRAWL,
        'crawl_sitemap_bootstrap': ORACLE_CRAWL_SITEMAP_BOOTSTRAP,
        'crawl_feed_bootstrap': ORACLE_CRAWL_FEED_BOOTSTRAP,
        'crawl_score_aging': ORACLE_CRAWL_SCORE_AGING,
        'crawl_robots_refresh': ORACLE_CRAWL_ROBOTS_REFRESH,
        'similarity_quantized_topk': ORACLE_QUANTIZED_TOPK,
        'similarity_pq_topk': _pq_oracle(),
        'similarity_ivf_pq': _ivf_pq_oracle(),
        'line_dedup': ORACLE_LINE_DEDUP,
        'dedup_substr_strike': ORACLE_SUBSTR_STRIKE,
        'line_quality_filter': ORACLE_LINE_QUALITY,
        'classifier_scores': ORACLE_CLASSIFIER,
        'domain_cap': _domain_cap_oracle(),
        'kmeans_assign': ORACLE_KMEANS,
        'semdedup': ORACLE_SEMDEDUP,
        'host_rank': ORACLE_HOST_RANK,
        'host_trust_rank': ORACLE_HOST_TRUST_RANK,
        'host_hits': ORACLE_HOST_HITS,
        'host_opic': ORACLE_HOST_OPIC,
        'crawl_shard_rendezvous': ORACLE_SHARD_RENDEZVOUS,
        'url_dust_rules': ORACLE_DUST_RULES,
        'url_dust_strip': ORACLE_DUST_STRIP,
        'mirror_hosts': ORACLE_MIRROR_HOSTS,
        'soft404_flags': ORACLE_SOFT404_FLAGS,
        'url_rel_canonical': ORACLE_REL_CANONICAL,
        'crawl_canonical_fold': ORACLE_CRAWL_CANONICAL_FOLD,
        'cdx_revisit_index': ORACLE_CDX_REVISIT,
        'feed_discovery': ORACLE_FEED_DISCOVERY,
        'crawl_host_rank': ORACLE_CRAWL_HOST_RANK,
        'url_quality_filter': ORACLE_URL_QUALITY,
        'url_trap_scores': ORACLE_URL_TRAPS,
        'plan_host_budgets': ORACLE_PLAN_BUDGETS,
        'adaptive_backoff': ORACLE_ADAPTIVE_BACKOFF,
        'conditional_fetch_plan': ORACLE_CONDITIONAL_FETCH,
        'sitemap_delta': ORACLE_SITEMAP_DELTA,
        'robots_directives': ORACLE_ROBOTS_DIRECTIVES,
        'retry_after_backoff': ORACLE_RETRY_AFTER,
        'latency_budget': ORACLE_LATENCY_BUDGET,
        'crawl_meta_robots': ORACLE_CRAWL_META_ROBOTS,
        'crawl_snapshot_diff': ORACLE_SNAPSHOT_DIFF,
        'change_rates': ORACLE_CHANGE_RATES,
        'recrawl_selection': ORACLE_RECRAWL,
        'pipeline_decontaminate': ORACLE_DECONTAMINATE,
        'source_reputation': _source_reputation_oracle(),
        'events_sessionize': ORACLE_SESSIONS,
        'index_champion_postings': ORACLE_CHAMPION_POSTINGS,
        'index_anchor_terms': ORACLE_ANCHOR_TERMS,
        'index_collocations': ORACLE_COLLOCATIONS,
        'index_bm25_topk': ORACLE_BM25,
        'selection_dsir_weights': ORACLE_DSIR_WEIGHTS,
        'selection_dsir_select': ORACLE_DSIR_SELECT,
        'host_anti_trust_rank': ORACLE_ANTI_TRUST,
        'host_spam_mass': ORACLE_SPAM_MASS,
        'link_spam_features': ORACLE_LINK_SPAM,
        'content_media_captions': ORACLE_CONTENT_CAPTIONS,
        'content_main_extract': ORACLE_CONTENT_MAIN,
        'content_host_templates': ORACLE_CONTENT_TEMPLATES,
        'content_strip_templates': ORACLE_CONTENT_STRIP,
        'content_caption_pairs': ORACLE_CAPTION_PAIRS,
        'content_pack_interleaved': ORACLE_PACK_INTERLEAVED,
        'vocab_bpe_merges': ORACLE_BPE_MERGES,
        'vocab_bpe_encode': ORACLE_BPE_ENCODE,
        'stream_politeness_drain': ORACLE_STREAM_POLITENESS,
        'stream_dedup_watermark': ORACLE_STREAM_DEDUP,
        'sketch_hll_sources': _oracle_hll_sources(),
        'sketch_cms_heavy_hitters': _oracle_cms_heavy_hitters(),
        'sketch_kmv_overlap': _oracle_kmv_overlap(),
        'sketch_kmv_matrix': _oracle_kmv_matrix(),
        'warc_ingest': ORACLE_WARC_INGEST,
        'warc_to_documents': ORACLE_WARC_TO_DOCS,
        'media_phash_dedup': ORACLE_MEDIA_PHASH,
        'crawl_golden_http': ORACLE_CRAWL_GOLDEN,
        'crawl_render_mode': ORACLE_CRAWL_RENDER_MODE,
        'warc_gzip_roundtrip': ORACLE_WARC_GZIP_ROUNDTRIP,
        'crawl_green_file_bypass': ORACLE_GREEN_FILE_BYPASS,
        'crawl_canonicalized_seen': ORACLE_CANONICALIZED_SEEN,
        'crawl_dust_alias': ORACLE_CRAWL_DUST,
        'crawl_opic_adaptive': ORACLE_CRAWL_OPIC,
        'crawl_golden_statistics': ORACLE_CRAWL_STATS,
        'crawl_manyhosts_robots': ORACLE_CRAWL_MANYHOSTS,
        'crawl_politeness_budget': ORACLE_POLITENESS_BUDGET,
        'crawl_priority_frontier': ORACLE_PRIORITY_FRONTIER,
        'spans_fingerprint_golden': ORACLE_SPANS_GOLDEN,
        'spans_media_stats': ORACLE_SPANS_STATS,
        'spans_parity_check': ORACLE_SPANS_PARITY,
        'media_frontier_dedup': ORACLE_MEDIA_FRONTIER,
        'media_sniff_types': ORACLE_MEDIA_SNIFF,
        'media_sniff_charset': ORACLE_MEDIA_CHARSET,
        'latency_quantiles': ORACLE_LATENCY_QUANTILES,
        'quantile_length_gate': ORACLE_QUANTILE_GATE,
        'c4_filter': ORACLE_C4_FILTER,
        'warc_serialize': _warc_serialize_oracle(),
        'epoch_layout': ORACLE_EPOCH_LAYOUT,
        'zorder_layout': _zorder_oracle(),
        'source_drift': ORACLE_SOURCE_DRIFT,
        'embedding_outliers': ORACLE_EMBEDDING_OUTLIERS,
        'asof_join': ORACLE_ASOF_JOIN,
        'interval_join': ORACLE_INTERVAL_JOIN,
        'latency_budget_p95': ORACLE_LATENCY_BUDGET_P95,
        'ngram_novelty': ORACLE_NGRAM_NOVELTY,
        'chunk_cdc': ORACLE_CHUNK_CDC,
        'cache_freshness': ORACLE_CACHE_FRESHNESS,
        'token_spectrum': ORACLE_TOKEN_SPECTRUM,
        'vocab_growth': ORACLE_VOCAB_GROWTH,
        'hash_sample': ORACLE_HASH_SAMPLE,
        'skew_report': ORACLE_SKEW_REPORT,
        'url_homograph': ORACLE_URL_HOMOGRAPH,
        'curation_report': _curation_report_oracle(),
        'path_prefix_stats': ORACLE_PATH_PREFIX,
        'asof_next_join': ORACLE_ASOF_NEXT,
        'crawl_synthetic_politeness': ORACLE_SYNTHETIC_POLITENESS,
        'crawl_golden_http_mapinpandas': ORACLE_CRAWL_GOLDEN,
    }
