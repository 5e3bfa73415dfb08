"""Heavy-shingle document-frequency cap (VERDICT r1 #3): a ubiquitous
boilerplate shingle must not make the shared-shingle self-join quadratic."""

from __future__ import annotations

import pytest

from scalpel_spark.operators import dedup

BOILER = 'all rights reserved contact us for terms'  # >=4 tokens everywhere


@pytest.fixture(scope='module')
def boilerplate_docs(spark):
    # 40 docs all sharing the boilerplate sentence; docs 0 and 1 are true
    # near-dups (same unique body), everything else pairwise unrelated
    rows = []
    for i in range(40):
        body = 'unique alpha beta gamma delta shared' if i < 2 else \
            f'distinct w{i}a w{i}b w{i}c w{i}d w{i}e'
        rows.append((i, f'{body} {BOILER}'))
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_cap_bounds_candidates(boilerplate_docs):
    # with the cap active (df_cap < 40), the only surviving pair is the
    # true near-dup — the 40*39/2 = 780 boilerplate-only pairs never
    # become candidates
    pairs = dedup.ngram_jaccard_pairs(boilerplate_docs, n=4, threshold=0.0, df_cap=5)
    got = {(r['doc_a'], r['doc_b']) for r in pairs.collect()}
    assert got == {(0, 1)}

    cont = dedup.containment_pairs(boilerplate_docs, n=4, threshold=0.0, df_cap=5)
    got_c = {(r['doc_contained'], r['doc_container']) for r in cont.collect()}
    assert got_c == {(0, 1), (1, 0)}


def test_uncapped_goes_quadratic(boilerplate_docs):
    # sanity contrast: without an effective cap every pair is a candidate
    pairs = dedup.ngram_jaccard_pairs(boilerplate_docs, n=4, threshold=0.0,
                                      df_cap=10_000)
    assert pairs.count() == 40 * 39 // 2


def test_all_heavy_cluster_still_detected(spark):
    """ADVICE r2: a cluster of more than df_cap near-identical docs makes
    ALL its shingles heavy — without a guaranteed blocking key the whole
    cluster (even jaccard = 1.0 pairs) escapes detection. The kept
    lexicographic-min shingle blocks the cluster together."""
    n = 20
    rows = [(i, 'same exact body text repeated verbatim everywhere') for i in range(n)]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    pairs = dedup.ngram_jaccard_pairs(docs, n=4, threshold=0.9, df_cap=5)
    got = {(r['doc_a'], r['doc_b']): r['jaccard'] for r in pairs.collect()}
    assert len(got) == n * (n - 1) // 2  # every in-cluster pair surfaces
    assert set(got.values()) == {1.0}

    cont = dedup.containment_pairs(docs, n=4, threshold=0.9, df_cap=5)
    assert cont.count() == n * (n - 1)  # both directions


def test_cap_does_not_change_scores(boilerplate_docs):
    # blocking loses heavy shingles but the Jaccard score still uses the
    # FULL shingle sets — the (0,1) pair scores identically either way
    capped = dedup.ngram_jaccard_pairs(boilerplate_docs, n=4, threshold=0.0, df_cap=5)
    uncapped = dedup.ngram_jaccard_pairs(boilerplate_docs, n=4, threshold=0.0,
                                         df_cap=10_000)
    j_capped = capped.filter('doc_a = 0 and doc_b = 1').collect()[0]['jaccard']
    j_uncapped = uncapped.filter('doc_a = 0 and doc_b = 1').collect()[0]['jaccard']
    assert j_capped == j_uncapped > 0.5
