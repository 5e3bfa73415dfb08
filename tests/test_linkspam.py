"""Anti-TrustRank / spam mass (`graphrank.py`) and host-level link-spam
features (`linkspam.py`).
"""

from pyspark.sql import functions as F

from scalpel_spark.operators import graphrank
from scalpel_spark.operators.linkspam import link_spam_features


def _edges(spark, rows):
    return spark.createDataFrame(rows, 'src string, dst string')


def test_anti_trust_flows_backwards_to_linkers(spark):
    # a -> spam, b -> a, c -> nothing-spammy: spam score a > b > c(=0)
    edges = _edges(spark, [
        ('a', 'spam'), ('b', 'a'), ('c', 'd'), ('spam', 'spam2'),
    ])
    spam = spark.createDataFrame([('spam',)], 'host string')
    got = {r['host']: r['spam_ppb']
           for r in graphrank.anti_trust_rank(edges, spam, iters=3).collect()}
    assert got['a'] > got['b'] > 0
    assert got['c'] == 0
    assert got['spam'] > got['a']  # the seed keeps the teleport mass


def test_anti_trust_equals_trust_on_reversed_graph(spark):
    edges = _edges(spark, [('a', 'b'), ('b', 'c'), ('c', 'a'), ('a', 'c')])
    rev = edges.select(F.col('dst').alias('src'), F.col('src').alias('dst'))
    seeds = spark.createDataFrame([('c',)], 'host string')
    anti = sorted((r['host'], r['spam_ppb']) for r in
                  graphrank.anti_trust_rank(edges, seeds, iters=2).collect())
    trust = sorted((r['host'], r['trust_ppb']) for r in
                   graphrank.trust_rank(rev, seeds, iters=2).collect())
    assert anti == trust


def test_spam_mass_flags_high_rank_low_trust(spark):
    rank = spark.createDataFrame(
        [('farm', 500_000_000), ('good', 400_000_000), ('dead', 0)],
        'host string, rank_ppb long')
    trust = spark.createDataFrame(
        [('good', 380_000_000), ('farm', 10_000_000)],
        'host string, trust_ppb long')
    got = {r['host']: r['mass_ppm']
           for r in graphrank.spam_mass(rank, trust).collect()}
    assert got['farm'] == 980_000      # (500-10)/500
    assert got['good'] == 50_000       # (400-380)/400
    assert got['dead'] == 0            # zero rank guard


def test_spam_mass_clamps_trust_above_rank(spark):
    rank = spark.createDataFrame([('h', 100)], 'host string, rank_ppb long')
    trust = spark.createDataFrame([('h', 500)], 'host string, trust_ppb long')
    assert graphrank.spam_mass(rank, trust).collect()[0]['mass_ppm'] == 0


def test_link_spam_features_reciprocity_and_self(spark):
    edges = _edges(spark, [
        # a <-> b reciprocal pair; a -> c one-way; a -> a self-citation x2
        ('a', 'b'), ('b', 'a'), ('a', 'c'), ('a', 'a'), ('a', 'a'),
    ])
    got = {r['host']: r for r in link_spam_features(edges).collect()}
    a = got['a']
    # out pairs of a: b, c, a(self) -> out_hosts 3, nonself 2, recip 1 (b)
    assert a['out_hosts'] == 3 and a['out_links'] == 4
    assert a['reciprocal_ppm'] == 500_000
    assert a['self_ppm'] == 500_000    # 2 of 4 out-links are self
    b = got['b']
    assert b['reciprocal_ppm'] == 1_000_000
    assert b['self_ppm'] == 0
    c = got['c']
    assert c['out_hosts'] == 0 and c['in_hosts'] == 1
    assert c['reciprocal_ppm'] == 0 and c['self_ppm'] == 0


def test_link_spam_features_weighted_multi_edges_collapse(spark):
    edges = spark.createDataFrame(
        [('a', 'b', 3), ('a', 'b', 2), ('b', 'a', 1)],
        'src string, dst string, n_links int')
    got = {r['host']: r
           for r in link_spam_features(edges, weight='n_links').collect()}
    assert got['a']['out_links'] == 5 and got['a']['out_hosts'] == 1
    assert got['a']['reciprocal_ppm'] == 1_000_000
    assert got['b']['in_links'] == 5
