"""Plan-shape pins for the ANN operators (VERDICT r2 item #5).

``ivf_topk(nprobe>1)`` used to call ``ivf_assignments`` once per side,
recomputing the centroid aggregation for corpus and query. Now both sides
are filters over ONE ranked probe frame (``similarity._ivf_probes``), so
the physical plan holds a single centroid build — Spark's static
ReuseExchange rule collapses the second reference into a ReusedExchange.
AQE performs exchange reuse at runtime instead of in the static plan, so
the pin disables AQE for a deterministic plan string.
"""

import contextlib

import pytest

from scalpel_spark.operators import similarity

EMB = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [1.0, 0.0, 0.0, 0.0], 0),
    (2, [0.9, 0.1, 0.0, 0.0], 0),
    (3, [0.0, 1.0, 0.0, 0.0], 1),
    (4, [0.0, -1.0, 0.0, 0.0], 1),
]


@pytest.fixture(scope='module')
def emb(spark):
    return spark.createDataFrame(EMB, 'vec_id long, embedding array<float>, label int')


@contextlib.contextmanager
def _static_plans(spark):
    old = spark.conf.get('spark.sql.adaptive.enabled')
    spark.conf.set('spark.sql.adaptive.enabled', 'false')
    try:
        yield
    finally:
        spark.conf.set('spark.sql.adaptive.enabled', old)


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_nprobe2_single_centroid_aggregation(spark, emb):
    with _static_plans(spark):
        df = similarity.ivf_topk(emb, n_queries=1, k=1, nprobe=2)
        plan = _physical_plan(df)
    # ONE centroid build: each logical aggregation prints as a
    # partial + final pair, so a duplicated build would show 4 of each.
    assert plan.count('collect_list') == 2, plan
    assert plan.count('avg(') == 2, plan
    assert plan.count('Generate') == 1, plan  # the posexplode over dims
    # the second consumer of the probe frame is a reused exchange
    assert 'ReusedExchange' in plan, plan


def test_ivf_nprobe2_results_unchanged(emb):
    # the refactor must not move results: identical vector still wins
    rows = similarity.ivf_topk(emb, n_queries=1, k=1, nprobe=2).collect()
    assert [(r['query_id'], r['neighbor_id'], r['rank'], r['cosine'])
            for r in rows] == [(0, 1, 1, 1.0)]


def test_lsh_broadcast_planes_bit_identical_dim512(spark):
    """VERDICT r2 #7: at dim ≫ 64 the plane matrix rides a broadcast
    relation instead of 8×dim plan literals — buckets must stay
    bit-identical between the two consumption paths."""
    dim = 512
    rows = [(i, [((i * 31 + d * 17) % 19 - 9) / 10.0 for d in range(dim)])
            for i in range(24)]
    rows.append((24, rows[0][1]))  # exact duplicate of vec 0
    wide = spark.createDataFrame(rows, 'vec_id long, embedding array<double>')

    lit = {r['vec_id']: r['bucket']
           for r in similarity.lsh_buckets(wide, n_planes=6, broadcast_planes=False).collect()}
    bc = {r['vec_id']: r['bucket']
          for r in similarity.lsh_buckets(wide, n_planes=6, broadcast_planes=True).collect()}
    assert lit == bc
    assert bc[0] == bc[24]  # identical vectors share a bucket

    # auto mode picks broadcast at this width: plan carries no Generate of
    # 512-long sign literal arrays (smoke: it must equal the explicit path)
    auto = {r['vec_id']: r['bucket']
            for r in similarity.lsh_buckets(wide, n_planes=6).collect()}
    assert auto == bc


def test_ivf_assignments_rn_filter_matches_legacy_shape(emb):
    # ivf_assignments is now a projection of the shared probe frame —
    # nprobe=1 keeps exactly one row per vector, primary cell = own label
    # cell for this labeled corpus
    rows = similarity.ivf_assignments(emb, nprobe=1).collect()
    assert len(rows) == len(EMB)
    assert {r['vec_id'] for r in rows} == {0, 1, 2, 3, 4}
    assert set(rows[0].asDict()) == {'vec_id', 'label', 'cell'}


def test_quantize_embeddings_properties(spark):
    rows = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 0.0], 0),
         (1, [0.0, 0.0, 0.0, 0.0], 0),
         (2, [2.0, 2.0, -2.0, 2.0], 1)],
        'vec_id long, embedding array<float>, label int')
    out = {r['vec_id']: r for r in similarity.quantize_embeddings(rows).collect()}
    # max-|x| component hits +/-127, everything within [-127, 127]
    assert out[0]['qvec'] == [64, -127, 32, 0]  # floor(.5*127+.5)=64
    assert out[0]['dim'] == 4
    assert out[0]['scale_ppb'] == int(1.0 * 1e9 / 127.0)
    # all-zero vector: zero qvec, zero scale (no div-by-zero)
    assert out[1]['qvec'] == [0, 0, 0, 0] and out[1]['scale_ppb'] == 0
    assert out[2]['qvec'] == [127, 127, -127, 127]


def test_quantized_topk_recall_vs_exact(spark):
    import random
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)], 0) for i in range(120)]
    emb_df = spark.createDataFrame(rows, 'vec_id long, embedding array<float>, label int')
    exact = similarity.cosine_topk(emb_df, n_queries=8, k=5).collect()
    quant = similarity.quantized_topk(emb_df, n_queries=8, k=5).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r['query_id'], set()).add(r['neighbor_id'])
    hits = total = 0
    for r in quant:
        total += 1
        hits += r['neighbor_id'] in ex[r['query_id']]
    # int8 surrogate ranking keeps most of the exact top-5
    assert hits / total >= 0.6, (hits, total)


def test_pq_fit_codes_shape_and_duplicate_vectors_share_codes(spark):
    """One code row per (vec, subspace); codes come from the codebook;
    identical vectors encode identically."""
    rows = [
        (0, [1.0, 1.0, 9.0, 9.0]),
        (1, [1.0, 1.0, 9.0, 9.0]),    # duplicate of 0
        (2, [9.0, 9.0, 1.0, 1.0]),
        (3, [9.1, 9.1, 1.1, 1.1]),
        (4, [1.1, 1.1, 9.1, 9.1]),
        (5, [5.0, 5.0, 5.0, 5.0]),
    ]
    emb_df = spark.createDataFrame(rows, 'vec_id long, embedding array<float>')
    codes, books = similarity.pq_fit(emb_df, m=2, ksub=2, iters=2)
    got = codes.collect()
    assert len(got) == len(rows) * 2
    cmap = {(r['vec_id'], r['sub']): r['cell'] for r in got}
    assert cmap[(0, 0)] == cmap[(1, 0)] and cmap[(0, 1)] == cmap[(1, 1)]
    book_cells = {(r['sub'], r['cell']) for r in books.collect()}
    assert all((r['sub'], r['cell']) in book_cells for r in got)
    # subspace width: codebook vectors are dim/m = 2 wide
    assert all(len(r['cv']) == 2 for r in books.collect())


def test_pq_topk_cluster_order_and_code_granularity(spark):
    """ADC distance is query-to-CENTROID: same-cell vectors share one
    adc_d2 (ties break on neighbor_id), own-cluster beats the opposite
    cluster, and the plan stays JVM-side."""
    rows = [
        # ids 0/1 seed the codebooks (init = k smallest vec_ids), so the
        # seeds must span both clusters or Lloyd degenerates to one cell
        (0, [1.0, 1.0, 9.0, 9.0]),
        (1, [9.0, 9.0, 1.0, 1.0]),
        (2, [1.0, 1.0, 9.0, 9.0]),    # exact twin of query 0
        (3, [1.2, 1.2, 8.8, 8.8]),    # same cluster as 0
        (4, [8.8, 8.8, 1.2, 1.2]),
        (5, [9.2, 9.2, 0.8, 0.8]),
    ]
    emb_df = spark.createDataFrame(rows, 'vec_id long, embedding array<float>')
    out = similarity.pq_topk(emb_df, n_queries=1, k=5, m=2, ksub=2, iters=2)
    got = {r['rank']: (r['neighbor_id'], r['adc_d2']) for r in out.collect()}
    # same codes -> same ADC distance -> id ascending within the cluster
    assert [got[r][0] for r in (1, 2)] == [2, 3]
    assert got[1][1] == got[2][1]
    # the opposite cluster is strictly farther
    own = got[1][1]
    assert all(d > own for n, d in got.values() if n in (1, 4, 5))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan


def test_ivf_pq_topk_probe_bound_and_residual_codes(spark):
    """IVFADC: with nprobe=1 candidates come only from the query's
    primary cell; nprobe=2 reaches the second cell; twin vectors share
    residual codes so they tie at the same ADC distance (id order)."""
    rows = [
        (0, [1.0, 1.0, 9.0, 9.0], 0),
        (1, [1.0, 1.0, 9.0, 9.0], 0),   # twin of query 0
        (2, [1.4, 1.4, 8.6, 8.6], 0),
        (3, [9.0, 9.0, 1.0, 1.0], 1),
        (4, [8.6, 8.6, 1.4, 1.4], 1),
    ]
    emb_df = spark.createDataFrame(
        rows, 'vec_id long, embedding array<float>, label int')
    narrow = similarity.ivf_pq_topk(emb_df, n_queries=1, k=5, nprobe=1,
                                    m=2, ksub=2, iters=1)
    got1 = {r['neighbor_id'] for r in narrow.collect()}
    assert got1 == {1, 2}             # own cell only
    wide = similarity.ivf_pq_topk(emb_df, n_queries=1, k=5, nprobe=2,
                                  m=2, ksub=2, iters=1)
    rows2 = sorted((r['rank'], r['neighbor_id'], r['adc_d2'])
                   for r in wide.collect())
    assert {r[1] for r in rows2} == {1, 2, 3, 4}
    assert rows2[0][1] == 1           # twin ranks first
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan


def test_pq_and_ivfpq_recall_vs_exact(spark):
    """Quantization keeps most of the exact top-5 on gaussian data —
    the same recall floor discipline as the int8 surrogate test."""
    import random
    rng = random.Random(7)
    # clustered data — what real embeddings look like and what a
    # quantizer can exploit; isotropic gaussians are PQ's no-structure
    # worst case and would only measure noise
    centers = [[rng.gauss(0, 4) for _ in range(16)] for _ in range(4)]
    rows = [(i, [c + rng.gauss(0, 0.5) for c in centers[i % 4]], i % 4)
            for i in range(120)]
    emb_df = spark.createDataFrame(
        rows, 'vec_id long, embedding array<float>, label int')
    # exact baseline in the metric PQ actually ranks by: squared L2
    # (cosine would be a metric mismatch on unnormalized gaussians)
    vecs = {i: v for i, v, _ in rows}
    ex = {}
    for q in range(6):
        d2 = sorted(
            (sum((a - b) ** 2 for a, b in zip(vecs[q], vecs[i])), i)
            for i in vecs if i != q)
        ex[q] = {i for _, i in d2[:5]}

    def recall(df):
        hits = total = 0
        for r in df.collect():
            total += 1
            hits += r['neighbor_id'] in ex[r['query_id']]
        return hits / total

    # PQ ADC with a generous codebook keeps a useful share of the exact
    # set; IVFADC with nprobe=2 over 4 cells sees half the corpus and
    # re-ranks with residual codes — both are recall dials, not oracles
    pq = similarity.pq_topk(emb_df, n_queries=6, k=5, m=4, ksub=8, iters=2)
    assert recall(pq) >= 0.3, 'PQ recall collapsed'
    ivfpq = similarity.ivf_pq_topk(emb_df, n_queries=6, k=5, nprobe=2,
                                   m=4, ksub=8, iters=2)
    assert recall(ivfpq) >= 0.3, 'IVFADC recall collapsed'
