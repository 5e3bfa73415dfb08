"""Connected-components dedup clustering: the transitive-closure step the
pair operators leave to the pipeline. Min-label propagation must merge
chained near-dups (A~B, B~C => one cluster) and pick exactly one canonical
doc per cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalpel_spark.operators import dedup


def _pairs(spark, edges):
    return spark.createDataFrame(edges, 'doc_a long, doc_b long')


def _labels(df):
    return {(r['doc_id'], r['cluster_id']) for r in df.collect()}


ALGOS = ['label', 'star']


@pytest.mark.parametrize('algo', ALGOS)
def test_path_graph_merges_transitively(spark, algo):
    # 1-2-3-4-5 chain: no (1,5) pair was ever emitted, yet all five must
    # land in cluster 1 — takes multiple propagation rounds (diameter 4)
    comp = dedup.duplicate_clusters(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), algorithm=algo)
    assert _labels(comp) == {(i, 1) for i in range(1, 6)}


@pytest.mark.parametrize('algo', ALGOS)
def test_separate_components_stay_separate(spark, algo):
    comp = dedup.duplicate_clusters(
        _pairs(spark, [(10, 11), (20, 21), (21, 22), (5, 9), (5, 7), (5, 6)]),
        algorithm=algo)
    assert _labels(comp) == {
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
        (5, 5), (6, 5), (7, 5), (9, 5),
    }


@pytest.mark.parametrize('algo', ALGOS)
def test_unordered_pairs_and_cycles(spark, algo):
    # pair order must not matter (edges are symmetrized) and a cycle must
    # terminate at the fixpoint, not loop forever
    comp = dedup.duplicate_clusters(_pairs(spark, [(3, 1), (2, 3), (1, 2)]),
                                    algorithm=algo)
    assert _labels(comp) == {(1, 1), (2, 1), (3, 1)}


def test_star_beats_label_on_adversarial_chain(spark):
    # a 30-node path has diameter 29: min-label propagation cannot finish
    # in 12 rounds, while the star transform contracts it in O(log n)
    chain = _pairs(spark, [(i, i + 1) for i in range(1, 30)])
    with pytest.raises(RuntimeError, match='did not converge'):
        dedup.duplicate_clusters(chain, max_iter=12, algorithm='label')
    comp = dedup.duplicate_clusters(chain, max_iter=12, algorithm='star')
    assert _labels(comp) == {(i, 1) for i in range(1, 31)}


def test_bad_algorithm_rejected(spark):
    with pytest.raises(ValueError, match="'label' or 'star'"):
        dedup.duplicate_clusters(_pairs(spark, [(1, 2)]), algorithm='bogus')


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match='did not converge'):
        dedup.duplicate_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]),
                                 max_iter=1)


def test_cluster_canonical_keep_one(spark):
    out = dedup.cluster_canonical(
        _pairs(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    rows = {r['doc_id']: (r['cluster_id'], r['cluster_size'], r['is_canonical'])
            for r in out}
    assert rows == {
        1: (1, 3, 1), 2: (1, 3, 0), 3: (1, 3, 0),
        10: (10, 2, 1), 11: (10, 2, 0),
    }
    # the pipeline contract: exactly one canonical per cluster
    assert sum(v[2] for v in rows.values()) == 2


def test_clusters_over_real_pairs(spark):
    # end-to-end over text: chained near-dups via sliding word windows —
    # adjacent docs share most shingles, the ends share almost none
    words = [f'w{i}' for i in range(40)]
    rows = [(i, ' '.join(words[i * 4:i * 4 + 24])) for i in range(5)]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    pairs = dedup.ngram_jaccard_pairs(docs, n=4, threshold=0.5)
    got = {(r['doc_a'], r['doc_b']) for r in pairs.collect()}
    assert (0, 4) not in got and (0, 1) in got  # a genuine chain, not a clique
    comp = dedup.duplicate_clusters(pairs)
    assert _labels(comp) == {(i, 0) for i in range(5)}
