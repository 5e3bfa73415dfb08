"""Lloyd k-means assignment and SemDeDup semantic dedup over embeddings."""

from __future__ import annotations

from scalpel_spark.operators import clustering

EMB_SCHEMA = 'vec_id LONG, embedding ARRAY<FLOAT>, label INT'


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows], EMB_SCHEMA
    )


def test_kmeans_two_obvious_clusters(spark):
    # two tight groups on the x axis; init centroids = vec 0 (left) and
    # vec 1 (right), so Lloyd converges in one round and iters=2 is stable
    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 0.0]),
        (2, [0.1, 0.1]), (3, [0.2, 0.0]),
        (4, [10.1, 0.1]), (5, [9.9, 0.2]),
    ]
    out = {r['vec_id']: r['cell'] for r in
           clustering.kmeans_assign(_emb(spark, rows), k=2, iters=2).collect()}
    assert out[0] == out[2] == out[3] == 0
    assert out[1] == out[4] == out[5] == 1


def test_kmeans_centroid_moves_between_iterations(spark):
    # vec 2 sits nearer init-centroid 0 (the point at x=0) than centroid 1
    # (x=10), but after round 1 centroid 0 moves right (mean of 0, 2, 3)
    # and keeps the cluster; the assignment is the round-2 one.
    rows = [(0, [0.0]), (1, [10.0]), (2, [4.0]), (3, [5.0])]
    out = {r['vec_id']: r['cell'] for r in
           clustering.kmeans_assign(_emb(spark, rows), k=2, iters=2).collect()}
    # round 1: cell0 = {0,2,3} (4 is closer to 0 than 10? |4-0|=4 < |4-10|=6 yes),
    # centroid0 = mean(0,4,5)=3; round 2: vec 2 (x=4) now |4-3|=1 vs |4-10|=6 -> cell 0
    assert out == {0: 0, 1: 1, 2: 0, 3: 0}


def test_kmeans_tie_breaks_to_smaller_cell(spark):
    # vec 2 equidistant from both init centroids -> smaller cell id wins
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    out = {r['vec_id']: r['cell'] for r in
           clustering.kmeans_assign(_emb(spark, rows), k=2, iters=1).collect()}
    assert out[2] == 0


def test_semdedup_drops_near_identical_keeps_lowest_id(spark):
    # vecs 0/2/3 nearly parallel (cos ~ 1) in one cluster; 1 is orthogonal
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (2, [1.0, 0.001]), (3, [0.999, 0.0]),
    ]
    out = {r['vec_id']: r for r in
           clustering.semdedup(_emb(spark, rows), k=2, iters=1,
                               threshold=0.999).collect()}
    assert out[0]['keep'] is True          # lowest id of the group survives
    assert out[2]['keep'] is False and out[3]['keep'] is False
    assert out[1]['keep'] is True          # orthogonal vector untouched


def test_semdedup_threshold_respected(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.4359])]  # cos ~ 0.9
    out = {r['vec_id']: r['keep'] for r in
           clustering.semdedup(_emb(spark, rows), k=1, iters=1,
                               threshold=0.99).collect()}
    assert out == {0: True, 1: True}
    out2 = {r['vec_id']: r['keep'] for r in
            clustering.semdedup(_emb(spark, rows), k=1, iters=1,
                                threshold=0.5).collect()}
    assert out2 == {0: True, 1: False}


def test_clustering_plans_stay_jvm(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    for df in (
        clustering.kmeans_assign(_emb(spark, rows), k=2, iters=2),
        clustering.semdedup(_emb(spark, rows), k=2, iters=1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert 'Python' not in plan and 'BatchEvalPython' not in plan


def test_kmeans_init_uses_k_smallest_ids_not_id_range(spark):
    # vec_ids start at 100 — `vec_id < k` would seed ZERO centroids and
    # silently assign cell=-1 everywhere; k-smallest must still work
    rows = [
        (100, [0.0, 0.0]), (101, [10.0, 0.0]),
        (102, [0.1, 0.1]), (103, [10.1, 0.2]),
    ]
    out = {r['vec_id']: r['cell'] for r in
           clustering.kmeans_assign(_emb(spark, rows), k=2, iters=2).collect()}
    assert set(out.values()) == {100, 101}
    assert out[100] == out[102] == 100
    assert out[101] == out[103] == 101


def test_kmeans_k_exceeding_corpus_gives_singleton_cells(spark):
    rows = [(0, [0.0]), (1, [5.0])]
    out = {r['vec_id']: r['cell'] for r in
           clustering.kmeans_assign(_emb(spark, rows), k=5, iters=1).collect()}
    assert out == {0: 0, 1: 1}


# ---------------------------------------------------------------------------
# embedding_outliers: per-cluster exact-quantile distance gate
# ---------------------------------------------------------------------------


def test_embedding_outliers_drops_far_vectors(spark):
    from scalpel_spark.operators.clustering import embedding_outliers

    # two tight clusters around (0,0) and (10,10), one far outlier each;
    # vec_ids 0 and 1 anchor one cluster each (init = k smallest ids)
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    for i in range(9):
        rows.append((2 + i, [0.0 + i * 0.01, 0.0]))
        rows.append((100 + i, [10.0 + i * 0.01, 10.0]))
    rows.append((50, [3.0, 3.0]))      # far from the (0,0) cluster
    rows.append((150, [7.0, 7.0]))     # far from the (10,10) cluster
    emb = spark.createDataFrame(
        [(i, v) for i, v in rows], 'vec_id LONG, embedding ARRAY<FLOAT>')
    out = {r['vec_id']: r for r in embedding_outliers(
        emb, k=2, iters=2, high_ppm=900_000).collect()}
    assert len(out) == len(rows)
    # the two planted outliers are exactly the dropped rows
    dropped = {i for i, r in out.items() if not r['keep']}
    assert dropped == {50, 150}
    for i, r in out.items():
        assert (r['d2'] <= r['q_high']) == r['keep']


def test_embedding_outliers_threshold_is_exact_quantile(spark):
    from scalpel_spark.operators.clustering import embedding_outliers

    # one cluster, distances 0..9 squared -> d2 known; p50 keeps half
    emb = spark.createDataFrame(
        [(i, [float(i)]) for i in range(10)],
        'vec_id LONG, embedding ARRAY<FLOAT>')
    out = embedding_outliers(emb, k=1, iters=1, high_ppm=500_000).collect()
    kept = sorted(r['vec_id'] for r in out if r['keep'])
    # iters=1 assigns against the INIT centroid (vec 0 -> [0]), so
    # d2 = (1000 i)^2: 10 distinct ranks, median rank 5 -> q = (4000)^2,
    # keep exactly i in 0..4
    assert kept == [0, 1, 2, 3, 4]
