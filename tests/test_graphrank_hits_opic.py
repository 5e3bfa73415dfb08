"""HITS hub/authority scores and OPIC incremental importance
(`operators/graphrank.hits`, `opic_init`/`opic_update`)."""

from __future__ import annotations

from scalpel_spark.operators import graphrank

EDGE_SCHEMA = 'src LONG, dst LONG'
SCALE = graphrank.SCALE


def _hosts(spark, ids):
    return spark.createDataFrame([(h,) for h in ids], 'host LONG')


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def test_hits_one_iteration_hand_computed(spark):
    # 0->1, 2->1, 1->0: host 1 is the authority, hosts 0 and 2 the hubs
    edges = spark.createDataFrame([(0, 1), (2, 1), (1, 0)], EDGE_SCHEMA)
    out = {r['host']: (r['auth_ppb'], r['hub_ppb']) for r in
           graphrank.hits(edges, iters=1).collect()}
    # auth_raw = {1: 2*SCALE, 0: SCALE}, total 3*SCALE
    assert out[1][0] == 2 * SCALE // 3
    assert out[0][0] == SCALE // 3
    assert out[2][0] == 0
    # hub_raw = {0: auth(1), 2: auth(1), 1: auth(0)}, total 1666666665
    assert out[0][1] == 666_666_666 * SCALE // 1_666_666_665
    assert out[2][1] == out[0][1]
    assert out[1][1] == 333_333_333 * SCALE // 1_666_666_665


def test_hits_mutual_reinforcement_ordering(spark):
    # directory host 9 links to everything; 1 and 2 also point at 3
    edges = spark.createDataFrame(
        [(9, 1), (9, 2), (9, 3), (1, 3), (2, 3)], EDGE_SCHEMA)
    out = {r['host']: (r['auth_ppb'], r['hub_ppb']) for r in
           graphrank.hits(edges, iters=3).collect()}
    assert out[3][0] > out[1][0]          # 3 is the strongest authority
    assert out[9][1] > out[3][1]          # 9 is the strongest hub
    assert out[9][0] == 0                 # nothing links TO the directory


def test_hits_weighted_equals_replayed_edges(spark):
    weighted = spark.createDataFrame(
        [(0, 1, 2), (1, 0, 1), (2, 1, 1)], 'src LONG, dst LONG, n LONG')
    replayed = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0), (2, 1)], EDGE_SCHEMA)
    a = sorted(tuple(r) for r in
               graphrank.hits(weighted, iters=2, weight='n').collect())
    b = sorted(tuple(r) for r in graphrank.hits(replayed, iters=2).collect())
    assert a == b


def test_hits_l1_normalized_within_flooring(spark):
    edges = spark.createDataFrame(
        [(i, (i + 3) % 7) for i in range(7)] +
        [(i, (i + 1) % 7) for i in range(7)], EDGE_SCHEMA)
    out = graphrank.hits(edges, iters=3).collect()
    for col in ('auth_ppb', 'hub_ppb'):
        total = sum(r[col] for r in out)
        assert SCALE - 2 * len(out) <= total <= SCALE + 2 * len(out)


def test_hits_plan_stays_jvm(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], EDGE_SCHEMA)
    plan = graphrank.hits(edges, iters=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan


# ---------------------------------------------------------------------------
# opic
# ---------------------------------------------------------------------------


def test_opic_init_equal_shares(spark):
    st = {r['host']: (r['cash_ppb'], r['hist_ppb']) for r in
          graphrank.opic_init(_hosts(spark, [0, 1, 2])).collect()}
    assert st == {h: (SCALE // 3, 0) for h in range(3)}


def test_opic_update_hand_computed(spark):
    state = graphrank.opic_init(_hosts(spark, [0, 1, 2]))
    edges = spark.createDataFrame([(0, 1), (0, 2)], EDGE_SCHEMA)
    out = {r['host']: (r['cash_ppb'], r['hist_ppb']) for r in
           graphrank.opic_update(state, edges, _hosts(spark, [0])).collect()}
    c0 = SCALE // 3
    assert out[0] == (0, c0)                       # banked, fully spent
    assert out[1] == (c0 + c0 // 2, 0)
    assert out[2] == (c0 + c0 // 2, 0)


def test_opic_dangling_cash_redistributes_uniformly(spark):
    state = graphrank.opic_init(_hosts(spark, [0, 1, 2]))
    edges = spark.createDataFrame([(1, 2)], EDGE_SCHEMA)  # 0 is dangling
    out = {r['host']: (r['cash_ppb'], r['hist_ppb']) for r in
           graphrank.opic_update(state, edges, _hosts(spark, [0])).collect()}
    c0 = SCALE // 3
    share = c0 // 3
    assert out[0] == (share, c0)
    assert out[1] == (c0 + share, 0)               # 1 was NOT fetched
    assert out[2] == (c0 + share, 0)


def test_opic_new_host_enters_with_received_cash(spark):
    state = graphrank.opic_init(_hosts(spark, [0, 1]))
    edges = spark.createDataFrame([(0, 5)], EDGE_SCHEMA)
    out = {r['host']: (r['cash_ppb'], r['hist_ppb']) for r in
           graphrank.opic_update(state, edges, _hosts(spark, [0])).collect()}
    c0 = SCALE // 2
    assert out[5] == (c0, 0)                       # discovered this wave
    assert out[0] == (0, c0)
    assert out[1] == (c0, 0)


def test_opic_mass_conserved_over_waves(spark):
    state = graphrank.opic_init(_hosts(spark, range(6)))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] +
        [(i, (i + 2) % 6) for i in range(6)], EDGE_SCHEMA)
    for wave, mod in ((1, 2), (2, 3)):
        fetched = _hosts(spark, [h for h in range(6) if h % mod == 0])
        state = graphrank.opic_update(state, edges, fetched)
    rows = state.collect()
    total = sum(r['cash_ppb'] for r in rows)
    hist = sum(r['hist_ppb'] for r in rows)
    # hist counts banked cash (it is re-spent, so hist can exceed cash);
    # circulating cash only shrinks by integer flooring
    assert SCALE - 200 <= total <= SCALE
    assert hist > 0


def test_opic_importance_tracks_in_degree(spark):
    # every host links to 0; after fetching everyone twice, 0's
    # hist+cash importance dominates
    n = 5
    state = graphrank.opic_init(_hosts(spark, range(n)))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)] +
        [(i, (i + 1) % n) for i in range(n)], EDGE_SCHEMA)
    everyone = _hosts(spark, range(n))
    for _ in range(2):
        state = graphrank.opic_update(state, edges, everyone)
    imp = {r['host']: r['cash_ppb'] + r['hist_ppb'] for r in state.collect()}
    assert imp[0] == max(imp.values())
    assert imp[0] > imp[2]


def test_opic_plan_stays_jvm(spark):
    state = graphrank.opic_init(_hosts(spark, [0, 1]))
    edges = spark.createDataFrame([(0, 1)], EDGE_SCHEMA)
    plan = graphrank.opic_update(state, edges, _hosts(spark, [0]))._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan


def test_l1_normalized_is_exact_integral_quotient(spark):
    """ADVICE r3: FLOOR of a DECIMAL true division rounds HALF_UP at
    1e-6 before flooring (allowPrecisionLoss), so quotients with
    fractional part >= 1-5e-7 came out one too high — the integral
    `div` must return the exact truncated quotient instead. Pins the
    reproduced case floor(1*SCALE/(SCALE+1)) == 0 plus boundary pairs
    against Python's exact big-int // on the same values."""
    # (score, total) pairs with total >= score (the total always
    # includes the score itself); fractional parts span 0, ~0.5 and
    # >= 1-5e-7 (the HALF_UP hazard zone)
    cases = [(0, 1), (1, SCALE + 1), (7, 9), (5, 5),
             (2**40, 2**40 + 7), (SCALE - 1, SCALE)]
    for i, (c, t) in enumerate(cases):
        one = spark.createDataFrame([(f'h{i}', c)], 'host STRING, s LONG')
        # _t = max(1, sum) with a single row = max(1, c); emulate the
        # target total by padding a second row carrying the remainder
        if t > max(1, c):
            one = one.union(spark.createDataFrame(
                [('pad', t - c)], 'host STRING, s LONG'))
        got = {r['host']: r['s']
               for r in graphrank._l1_normalized(one, 's').collect()}
        assert got[f'h{i}'] == (c * SCALE) // max(1, t), (c, t)
