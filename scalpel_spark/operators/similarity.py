"""Approximate-nearest-neighbor search over an embedding column.

Two paths, as a 100 TB pipeline needs both:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, score every corpus vector, window-rank per query. One shuffle (the
  rank); scoring is JVM ``zip_with``/``aggregate`` column algebra over
  ``array<double>`` — no Python.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH (signs
  derived deterministically from md5 so the DuckDB oracle can recompute
  them), bucket join, exact re-rank inside buckets. Bucketing is computed
  on *quantized integer* dot products so the bucket assignment is
  bit-identical across engines (no float-sum-order ambiguity).

Tie-breaking is always (rounded cosine DESC, vec_id ASC) — total order,
engine-stable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import pround


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids
    (self excluded). Returns (query_id, neighbor_id, rank, cosine)."""
    v = emb.select('vec_id', F.col('embedding').cast('array<double>').alias('e'))
    q = v.filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('query_id'), F.col('e').alias('eq')
    )
    scored = (
        F.broadcast(q).crossJoin(v.select(F.col('vec_id').alias('neighbor_id'), F.col('e').alias('en')))
        .filter(F.col('query_id') != F.col('neighbor_id'))
        .select(
            'query_id', 'neighbor_id',
            pround(_dot('eq', 'en') / (_norm('eq') * _norm('en')), 6).alias('cosine'),
        )
    )
    w = Window.partitionBy('query_id').orderBy(F.col('cosine').desc(), F.col('neighbor_id'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id', F.col('rank').cast('long').alias('rank'), 'cosine')
    )


def _plane_sign_py(p: int, d: int) -> int:
    """Deterministic ±1 hyperplane weight for (plane p, dimension d):
    parity of hash60('p-d'). This is the exact Python twin of
    ``functions.texthash.hash60`` (first 15 md5 hex chars as an int) — the
    DuckDB oracle recomputes the same parity in SQL."""
    h = int(hashlib.md5(f'{p}-{d}'.encode()).hexdigest()[:15], 16)
    return (h & 1) * 2 - 1


def lsh_buckets(emb: DataFrame, n_planes: int = 8, quant: int = 1000,
                dim: int | None = None, broadcast_planes: bool | None = None) -> DataFrame:
    """(vec_id, bucket): bucket bit p = 1 iff sum_d q(v[d]) * sign(p,d) > 0,
    where q(x) = floor(x*quant + 0.5) — integer, so the sign test is exact
    and engine-portable. Shuffle-free (per-row array algebra).

    The ±1 plane matrix is a CONSTANT, so it is precomputed driver-side
    (``n_planes × dim`` ints, same md5 parity as always) and consumed in
    one of two bit-identical ways (VERDICT r2 #7):

    * ``broadcast_planes=False`` — injected as array *literals*: one
      ``zip_with``/``aggregate`` per plane. Fastest at small dims, but the
      plan carries ``n_planes × dim`` literal ints.
    * ``broadcast_planes=True`` — the matrix rides a one-row broadcast
      relation ``array<struct<bit, signs>>`` and the bucket is a single
      nested ``aggregate`` over planes; the plan stays O(1) in dim — the
      right shape at dim ≫ 64 (embedding models are 384-4096 wide).

    ``None`` auto-selects: literals while ``n_planes × dim ≤ 1024``,
    broadcast beyond. ``dim`` defaults to the length of ONE probed row
    (``limit(1)``): hyperplane LSH is only defined over a uniform
    dimensionality, so any row is authoritative and a full-corpus
    ``max(size(...))`` scan before the real query is pure overhead.
    """
    return _with_buckets(emb, n_planes, quant, dim, broadcast_planes,
                         keep_embedding=False)


def _with_buckets(emb: DataFrame, n_planes: int, quant: int,
                  dim: int | None, broadcast_planes: bool | None,
                  keep_embedding: bool) -> DataFrame:
    """Shared bucket computation for :func:`lsh_buckets` (vec_id, bucket)
    and :func:`lsh_bucket_topk` (vec_id, e, bucket). Keeping the embedding
    column here means the top-k path buckets in the SAME row it re-ranks —
    no self-join of the corpus against its own derived buckets, so the
    corpus is scanned once and the vec_id exchange disappears."""
    if dim is None:
        # one-row probe, not a corpus-wide max: hyperplane LSH requires a
        # uniform dimensionality anyway (the planes are per-dimension), and
        # a max(size(...)) here was a FULL embeddings scan before the real
        # query even started — measured at ~2-3 s of pure overhead at sf0.1
        dim = emb.select(F.size('embedding').alias('d')).limit(1).first()['d']
    if broadcast_planes is None:
        broadcast_planes = n_planes * dim > 1024
    v = emb.select('vec_id', F.col('embedding').cast('array<double>').alias('e'))
    qv = F.transform('e', lambda x: F.floor(x * quant + 0.5).cast('long'))
    carry = ['e'] if keep_embedding else []
    v = v.select('vec_id', *carry, qv.alias('q'))

    if broadcast_planes:
        rows = [(1 << p, [_plane_sign_py(p, d) for d in range(dim)])
                for p in range(n_planes)]
        pl = emb.sparkSession.createDataFrame(
            [(rows,)], 'planes array<struct<bit:long,signs:array<long>>>')
        plane_dot = lambda plane: F.aggregate(  # noqa: E731
            F.zip_with('q', plane['signs'], lambda x, s: x * s),
            F.lit(0).cast('long'), lambda acc, x: acc + x,
        )
        bucket = F.aggregate(
            'planes', F.lit(0).cast('long'),
            lambda acc, plane: acc + F.when(plane_dot(plane) > 0, plane['bit'])
                                      .otherwise(F.lit(0).cast('long')),
        )
        return (
            v.crossJoin(F.broadcast(pl))
            .select('vec_id', *carry, bucket.cast('long').alias('bucket'))
        )

    bucket = None
    for p in range(n_planes):
        signs = F.array(*[F.lit(_plane_sign_py(p, d)).cast('long') for d in range(dim)])
        dot = F.aggregate(
            F.zip_with('q', signs, lambda x, s: x * s),
            F.lit(0).cast('long'), lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return v.select('vec_id', *carry, bucket.cast('long').alias('bucket'))


def lsh_bucket_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
                    n_planes: int = 8, quant: int = 1000) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket, exact cosine re-rank within.
    Returns (query_id, neighbor_id, rank, cosine). Recall < 1 by design —
    the point is the bucket join replaces the full cross product."""
    v = _with_buckets(emb, n_planes, quant, dim=None, broadcast_planes=None,
                      keep_embedding=True)
    q = v.filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('query_id'), F.col('e').alias('eq'), 'bucket'
    )
    c = v.select(F.col('vec_id').alias('neighbor_id'), F.col('e').alias('en'), 'bucket')
    scored = (
        q.join(c, 'bucket')
        .filter(F.col('query_id') != F.col('neighbor_id'))
        .select(
            'query_id', 'neighbor_id',
            pround(_dot('eq', 'en') / (_norm('eq') * _norm('en')), 6).alias('cosine'),
        )
    )
    w = Window.partitionBy('query_id').orderBy(F.col('cosine').desc(), F.col('neighbor_id'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id', F.col('rank').cast('long').alias('rank'), 'cosine')
    )


def _ivf_quantized(emb: DataFrame, quant: int) -> DataFrame:
    return emb.select(
        'vec_id', 'label',
        F.transform(F.col('embedding').cast('array<double>'),
                    lambda x: F.floor(x * quant + 0.5).cast('long')).alias('q'),
    )


def _ivf_cent_vec(v: DataFrame) -> DataFrame:
    """Per-label mean centroid vectors (cell, cv) over quantized rows —
    the coarse quantizer shared by :func:`_ivf_probes` and
    :func:`ivf_pq_topk` (which also needs the vectors themselves for
    residual encoding)."""
    dims = v.select('vec_id', 'label', F.posexplode('q').alias('d', 'x'))
    cent = dims.groupBy('label', 'd').agg(
        F.floor(F.avg('x') + 0.5).cast('long').alias('c')
    )
    return (
        cent.groupBy('label')
        .agg(F.array_sort(F.collect_list(F.struct('d', 'c'))).alias('pairs'))
        .select(F.col('label').alias('cell'), F.transform('pairs', lambda p: p['c']).alias('cv'))
    )


def _ivf_probes(emb: DataFrame, quant: int = 1000, nprobe: int = 1) -> DataFrame:
    """Shared IVF probe ranking: (vec_id, label, cell, rn) — every vector's
    ``nprobe`` nearest centroids by squared L2 with the probe rank ``rn``
    (1 = primary cell). ONE centroid aggregation feeds every consumer:
    :func:`ivf_assignments` filters on rn, and :func:`ivf_topk` derives
    BOTH the corpus side (rn == 1) and the query side (rn <= nprobe) from
    the same ranked frame instead of recomputing the centroid aggregation
    per side. All arithmetic on floor(x*quant+0.5) integers so assignment
    is bit-exact across engines (ties break on smaller label)."""
    v = _ivf_quantized(emb, quant)
    cent_vec = _ivf_cent_vec(v)
    return _probe_rank(v, cent_vec, nprobe, carry=('label',)).select(
        'vec_id', 'label', F.col('cell').cast('long').alias('cell'), 'rn')


def _probe_rank(v: DataFrame, cent_vec: DataFrame, nprobe: int,
                carry: tuple[str, ...] = ()) -> DataFrame:
    """The ONE probe-ranking code path every IVF consumer shares
    (:func:`_ivf_probes` and :func:`ivf_pq_topk`): squared-L2 against the
    broadcast centroid frame, row_number over (d2, cell), keep the top
    ``nprobe``. Tie/quantization contract changes here change everywhere
    — and match the DuckDB oracle twins — by construction."""
    dist = F.aggregate(
        F.zip_with('q', 'cv', lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast('long'), lambda acc, x: acc + x,
    )
    scored = v.crossJoin(F.broadcast(cent_vec)).select(
        'vec_id', *carry, 'cell', dist.alias('d2'))
    w = Window.partitionBy('vec_id').orderBy('d2', 'cell')
    return (
        scored.withColumn('rn', F.row_number().over(w))
        .filter(F.col('rn') <= nprobe)
    )


def ivf_assignments(emb: DataFrame, quant: int = 1000, nprobe: int = 1) -> DataFrame:
    """IVF coarse quantizer: centroids = per-label mean vectors, every
    vector assigned to its ``nprobe`` nearest centroids by squared L2 —
    the cells it would be searched in (see :func:`_ivf_probes`).

    Returns (vec_id, label, cell) — one row per probed cell per vector
    (``nprobe=1`` keeps the classic single-cell assignment). Training-free
    here because the corpus carries labels; on unlabeled data the same
    code runs on k-means centroids computed elsewhere.
    """
    return _ivf_probes(emb, quant, nprobe).select('vec_id', 'label', 'cell')


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 3, quant: int = 1000,
             nprobe: int = 1) -> DataFrame:
    """IVF search: exact cosine top-k restricted to the query's ``nprobe``
    nearest cells (coarse quantizer from :func:`ivf_assignments`; corpus
    vectors are indexed under their single primary cell, queries probe
    ``nprobe`` cells — the standard recall/cost dial). Returns
    (query_id, neighbor_id, rank, cosine). The scale path: the cell join
    replaces the full cross product, like :func:`lsh_bucket_topk` but with
    learned (centroid) cells instead of random hyperplanes.

    The corpus side (primary cell, rn == 1) and the query side (all
    ``nprobe`` probed cells) are both filters over ONE ranked probe frame,
    so the centroid aggregation + probe window run once in the plan (AQE
    reuses the shared exchanges; pinned by
    ``tests/test_similarity_plans.py``) instead of once per side."""
    probes = _ivf_probes(emb, quant, nprobe)
    v = emb.select('vec_id', F.col('embedding').cast('array<double>').alias('e')).join(
        probes.filter(F.col('rn') == 1).select('vec_id', 'cell'), 'vec_id'
    )
    q = emb.select('vec_id', F.col('embedding').cast('array<double>').alias('e')).join(
        probes.select('vec_id', 'cell'), 'vec_id'
    ).filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('query_id'), F.col('e').alias('eq'), 'cell'
    )
    c = v.select(F.col('vec_id').alias('neighbor_id'), F.col('e').alias('en'), 'cell')
    scored = (
        q.join(c, 'cell')
        .filter(F.col('query_id') != F.col('neighbor_id'))
        .select(
            'query_id', 'neighbor_id',
            pround(_dot('eq', 'en') / (_norm('eq') * _norm('en')), 6).alias('cosine'),
        )
    )
    w = Window.partitionBy('query_id').orderBy(F.col('cosine').desc(), F.col('neighbor_id'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id', F.col('rank').cast('long').alias('rank'), 'cosine')
    )


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the memory
    lever that makes billion-vector ANN fit: 4 bytes/dim float32 becomes
    1 byte/dim plus one scale per vector (~4x smaller shuffles, scans,
    and broadcast payloads).

    q_i = floor(x_i * 127 / max|x| + 0.5) in [-127, 127];
    scale_ppb = floor(max|x| * 1e9 / 127) — the integer parts-per-billion
    dequantization factor, kept integer so downstream rankings (and the
    DuckDB oracle) are engine-exact. All-zero vectors quantize to zeros
    with scale 0. IEEE double arithmetic in the same order on both
    engines makes q bit-identical.

    Map-side only — no shuffle. Returns (vec_id, qvec, scale_ppb, dim).
    """
    x = F.col('embedding').cast('array<double>')
    mx = F.array_max(F.transform(x, F.abs))
    q = F.when(mx == 0.0, F.transform(x, lambda v: F.lit(0).cast('long'))).otherwise(
        F.transform(x, lambda v: F.floor(v * 127.0 / mx + 0.5))
    )
    return emb.select(
        'vec_id',
        q.alias('qvec'),
        F.when(mx == 0.0, F.lit(0).cast('long'))
        .otherwise(F.floor(mx * 1e9 / 127.0).cast('long')).alias('scale_ppb'),
        F.size('embedding').cast('long').alias('dim'),
    )


def quantized_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors: integer dot product
    (zip_with + aggregate over the qvecs) scaled by the corpus vector's
    integer scale_ppb. Per query the true cosine order is
    dot_q * scale_q * scale_c / (|q| |c|); with quantized norms roughly
    constant across candidates, ranking by dot_q * scale_c_ppb is the
    standard int8 retrieval surrogate — and being pure int64 it is
    engine-exact (no float accumulation order).

    Same plan shape as :func:`cosine_topk` (broadcast query side, one
    rank shuffle) at a quarter of the scan bytes. score fits int64:
    dot_q <= 127^2 * dim ~ 1e6 at dim 64; * scale_ppb (~1e7) ~ 1e13.

    Returns (query_id, neighbor_id, rank, score).
    """
    qz = quantize_embeddings(emb)
    qs = qz.filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('query_id'), F.col('qvec').alias('qq'))
    cs = qz.select(F.col('vec_id').alias('neighbor_id'),
                   F.col('qvec').alias('qc'), 'scale_ppb')
    dot_q = F.aggregate(
        F.zip_with('qq', 'qc', lambda a, b: a * b),
        F.lit(0).cast('long'), lambda acc, v: acc + v)
    scored = (
        F.broadcast(qs).crossJoin(cs)
        .filter(F.col('query_id') != F.col('neighbor_id'))
        .select('query_id', 'neighbor_id',
                (dot_q * F.col('scale_ppb')).alias('score'))
    )
    w = Window.partitionBy('query_id').orderBy(F.col('score').desc(), F.col('neighbor_id'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id', F.col('rank').cast('long').alias('rank'), 'score')
    )


# -- product quantization (IVF-PQ's compression half) -------------------------


def pq_fit(emb: DataFrame, m: int = 4, ksub: int = 4, iters: int = 2,
           quant: int = 1000, dim: int | None = None
           ) -> tuple[DataFrame, DataFrame]:
    """Product quantization (Jégou et al., PAMI 2011): split the vector
    into ``m`` contiguous subspaces, run the SAME deterministic Lloyd
    rounds as ``clustering.kmeans_fit`` on each slice, and encode every
    vector as its ``m`` nearest-subcentroid ids — ``m`` small ints in
    place of ``dim`` floats, the compression that makes billion-vector
    ANN memory-resident (``quantize_embeddings`` shrinks 4×; PQ shrinks
    ~dim·4/m bytes per vector).

    Returns ``(codes, codebooks)``:

    * ``codes`` (vec_id, sub, cell) — long form, one row per subspace,
      the shape the ADC join consumes directly;
    * ``codebooks`` (sub, cell, cv) — the quantized-integer subcentroid
      vectors used for the last assignment pass.

    Scale shape: the driver loop runs ``m`` times (m is a small constant
    — 4-16 in practice) over metadata-width frames; each subspace is one
    independent kmeans_fit plan (shuffle-free assignment, one partial-agg
    exchange per Lloyd round). ``dim`` defaults to a one-row probe (PQ is
    only defined over uniform dimensionality); the last subspace absorbs
    any remainder when ``dim % m != 0``. Determinism: same init / tie /
    integer-quantization contract as kmeans_fit, so the DuckDB oracle
    replays every subspace bit-identically.
    """
    from scalpel_spark.operators.clustering import kmeans_fit

    if dim is None:
        dim = emb.select(F.size('embedding').alias('d')).limit(1).first()['d']
    if m > dim:
        raise ValueError(f'pq: m={m} subspaces need at least m dimensions '
                         f'(embedding dim is {dim})')
    codes = codebooks = None
    for j, (start, length) in enumerate(_sub_bounds(m, dim)):
        sub = emb.select(
            'vec_id', F.slice(F.col('embedding'), start, length).alias('embedding'))
        asg_j, cb_j = kmeans_fit(sub, ksub, iters, quant)
        cj = asg_j.select('vec_id', F.lit(j).cast('long').alias('sub'), 'cell')
        bj = cb_j.select(F.lit(j).cast('long').alias('sub'), 'cell', 'cv')
        codes = cj if codes is None else codes.unionByName(cj)
        codebooks = bj if codebooks is None else codebooks.unionByName(bj)
    return codes, codebooks


def _sub_bounds(m: int, dim: int) -> list[tuple[int, int]]:
    """(1-based start, length) of each PQ subspace — the ONE copy of the
    slicing arithmetic shared by encoding (pq_fit) and both query-table
    builders; the last subspace absorbs the remainder when dim % m != 0.
    Callers guard m <= dim (pq_fit raises), so lengths are positive."""
    w = max(1, dim // m)
    return [(j * w + 1, (dim - j * w) if j == m - 1 else w)
            for j in range(m)]


def _sub_slices(col: Column, m: int, dim: int) -> Column:
    """Exploded-ready array<struct<sub, qs>> of a vector's PQ subspace
    slices, bit-identical to pq_fit's encoding slices."""
    return F.array(*[
        F.struct(F.lit(j).cast('long').alias('sub'),
                 F.slice(col, start, length).alias('qs'))
        for j, (start, length) in enumerate(_sub_bounds(m, dim))])


def pq_topk(emb: DataFrame, n_queries: int = 10, k: int = 3, m: int = 4,
            ksub: int = 4, iters: int = 2, quant: int = 1000) -> DataFrame:
    """PQ search with asymmetric distance computation (ADC): the query
    stays exact, the corpus is its codes — per query and subspace, the
    squared-L2 table to every subcentroid is ``ksub × m`` integers
    (broadcast), and a corpus vector's approximate distance is the SUM of
    its codes' table entries. The corpus is never re-scanned per query
    and never carries vectors through the ranking: the ADC join moves
    (vec_id, sub, cell) rows only, the per-(query, vector) sum is one
    partial-agg groupBy, and the top-k is the usual rank window.

    Recall < 1 by construction (quantization error) — the compression/
    recall dial is (m, ksub). Returns (query_id, neighbor_id, rank,
    adc_d2) ranked by ascending approximate distance, ties on smaller
    neighbor_id; integer-exact end to end, DuckDB-oracled.
    """
    dim = emb.select(F.size('embedding').alias('d')).limit(1).first()['d']
    codes, codebooks = pq_fit(emb, m, ksub, iters, quant, dim=dim)
    # query side: quantized slice per subspace (same slicing as pq_fit)
    qv = emb.filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('query_id'),
        F.transform(F.col('embedding').cast('array<double>'),
                    lambda x: F.floor(x * quant + 0.5).cast('long')).alias('q'))
    qsub = qv.select('query_id',
                     F.explode(_sub_slices(F.col('q'), m, dim)).alias('s')).select(
        'query_id', F.col('s.sub').alias('sub'), F.col('s.qs').alias('qs'))
    d2 = F.aggregate(
        F.zip_with('qs', 'cv', lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast('long'), lambda acc, x: acc + x)
    # ksub × m × n_queries rows — broadcast into the codes join
    dist = qsub.join(F.broadcast(codebooks), 'sub').select(
        'query_id', 'sub', 'cell', d2.alias('d2'))
    scored = (
        codes.join(F.broadcast(dist), ['sub', 'cell'])
        .groupBy('query_id', F.col('vec_id').alias('neighbor_id'))
        .agg(F.sum('d2').cast('long').alias('adc_d2'))
        .filter(F.col('query_id') != F.col('neighbor_id'))
    )
    wnd = Window.partitionBy('query_id').orderBy('adc_d2', 'neighbor_id')
    return (
        scored.withColumn('rank', F.row_number().over(wnd))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id',
                F.col('rank').cast('long').alias('rank'), 'adc_d2')
    )


def ivf_pq_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
                nprobe: int = 2, m: int = 4, ksub: int = 4, iters: int = 2,
                quant: int = 1000) -> DataFrame:
    """IVFADC (Jégou et al., PAMI 2011 §III): the canonical billion-scale
    ANN index — IVF coarse cells bound WHERE to look, PQ codes of the
    RESIDUAL (vector − its cell centroid) bound WHAT is stored, and
    search is asymmetric distance over candidates in the query's
    ``nprobe`` nearest cells only. Residual encoding is what makes the
    codebooks sharp: residuals concentrate near zero regardless of which
    cell a vector lives in, so ksub subcentroids cover them far better
    than they cover raw vectors.

    All integer: quantized vectors, integer centroid means, integer
    residuals (PQ runs with quant=1 over residuals that are already
    ints). Per query and probed cell the distance table is ksub × m
    ints; candidates never carry vectors — the scoring join moves
    (vec_id, cell, sub, code) rows and one partial-agg sum produces the
    per-(query, candidate) ADC distance. Returns (query_id, neighbor_id,
    rank, adc_d2), ascending distance, ties on smaller neighbor_id.
    """
    dim = emb.select(F.size('embedding').alias('d')).limit(1).first()['d']
    # NOT persisted: the returned plan is lazy, so a persist here could
    # never be unpersisted by this function and would leak cached blocks
    # across repeated calls (ADVICE r3); _ivf_quantized is a map-side
    # projection of the scan, cheap for AQE to recompute per join
    v = _ivf_quantized(emb, quant)
    cent_vec = _ivf_cent_vec(v)
    probes = _probe_rank(v, cent_vec, nprobe)
    primary = probes.filter(F.col('rn') == 1).select('vec_id', 'cell')

    # corpus residuals vs the primary cell -> PQ codebooks over residuals
    # (quant=1: the residuals are already quantized integers)
    res = (v.join(primary, 'vec_id')
           .join(F.broadcast(cent_vec), 'cell')
           .select('vec_id', 'cell',
                   F.zip_with('q', 'cv', lambda x, c: (x - c).cast('double'))
                   .alias('embedding')))
    codes_raw, books_raw = pq_fit(res, m=m, ksub=ksub, iters=iters, quant=1,
                                  dim=dim)
    codes = codes_raw.select('vec_id', 'sub', F.col('cell').alias('code'))
    books = books_raw.select('sub', F.col('cell').alias('code'), 'cv')

    # query residual PER PROBED CELL (the residual depends on the cell)
    qres = (v.filter(F.col('vec_id') < n_queries)
            .join(probes.select('vec_id', 'cell'), 'vec_id')
            .join(F.broadcast(cent_vec), 'cell')
            .select(F.col('vec_id').alias('query_id'), 'cell',
                    F.zip_with('q', 'cv', lambda x, c: x - c).alias('r')))
    qsub = qres.select(
        'query_id', 'cell',
        F.explode(_sub_slices(F.col('r'), m, dim)).alias('s')).select(
        'query_id', 'cell', F.col('s.sub').alias('sub'), F.col('s.qs').alias('rs'))
    d2 = F.aggregate(
        F.zip_with('rs', 'cv', lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast('long'), lambda acc, x: acc + x)
    # n_queries × nprobe × m × ksub rows — broadcast into the codes join
    dist = qsub.join(F.broadcast(books), 'sub').select(
        'query_id', 'cell', 'sub', 'code', d2.alias('d2'))
    cand = codes.join(primary, 'vec_id')
    adc = (
        cand.join(F.broadcast(dist), ['cell', 'sub', 'code'])
        .groupBy('query_id', F.col('vec_id').alias('neighbor_id'))
        .agg(F.sum('d2').cast('long').alias('adc_d2'))
        .filter(F.col('query_id') != F.col('neighbor_id'))
    )
    wnd = Window.partitionBy('query_id').orderBy('adc_d2', 'neighbor_id')
    return (
        adc.withColumn('rank', F.row_number().over(wnd))
        .filter(F.col('rank') <= k)
        .select('query_id', 'neighbor_id',
                F.col('rank').cast('long').alias('rank'), 'adc_d2')
    )
