"""Mirror-host detection (`operators/mirrors.py`)."""

from __future__ import annotations

from scalpel_spark.operators import mirrors

SCHEMA = 'host STRING, sig LONG'


def test_full_mirror_scores_million_ppm(spark):
    docs = spark.createDataFrame(
        [('a', 1), ('a', 2), ('a', 3),
         ('b', 1), ('b', 2), ('b', 3),
         ('c', 99)], SCHEMA)
    out = mirrors.mirror_pairs(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r['host_a'], r['host_b']) == ('a', 'b')
    assert r['shared'] == 3 and r['overlap_ppm'] == 1_000_000


def test_containment_small_site_absorbed(spark):
    # b's 2 sigs are both on a (which has 4): containment 10^6,
    # a jaccard would only give 2/4
    docs = spark.createDataFrame(
        [('a', s) for s in (1, 2, 3, 4)] + [('b', 1), ('b', 2)], SCHEMA)
    r = mirrors.mirror_pairs(docs).collect()[0]
    assert (r['size_a'], r['size_b'], r['shared']) == (4, 2, 2)
    assert r['overlap_ppm'] == 1_000_000


def test_threshold_filters_weak_overlap(spark):
    docs = spark.createDataFrame(
        [('a', 1), ('a', 2), ('a', 3), ('a', 4),
         ('b', 1), ('b', 5), ('b', 6), ('b', 7)], SCHEMA)
    # shared 1 of min 4 = 250000 ppm
    assert mirrors.mirror_pairs(docs, min_overlap_ppm=500_000).count() == 0
    assert mirrors.mirror_pairs(docs, min_overlap_ppm=250_000).count() == 1


def test_df_cap_drops_boilerplate_and_sizes_stay_consistent(spark):
    # sig 0 is on every host (boilerplate); with df_cap=2 it vanishes
    # from BOTH the numerator and the profile sizes
    docs = spark.createDataFrame(
        [(h, 0) for h in 'abcde'] +
        [('a', 1), ('a', 2), ('b', 1), ('b', 2)], SCHEMA)
    out = mirrors.mirror_pairs(docs, df_cap=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r['host_a'], r['host_b'], r['shared']) == ('a', 'b', 2)
    assert r['size_a'] == 2 and r['size_b'] == 2  # boilerplate not counted
    # without the cap, c/d/e pair up through boilerplate alone
    uncapped = mirrors.mirror_pairs(docs, df_cap=100)
    assert uncapped.count() == 10  # all C(5,2) pairs share sig 0


def test_duplicate_doc_rows_count_once(spark):
    docs = spark.createDataFrame(
        [('a', 1), ('a', 1), ('a', 1), ('b', 1)], SCHEMA)
    r = mirrors.mirror_pairs(docs).collect()[0]
    assert r['shared'] == 1 and r['size_a'] == 1


def test_plan_stays_jvm(spark):
    docs = spark.createDataFrame([('a', 1), ('b', 1)], SCHEMA)
    plan = mirrors.mirror_pairs(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan
