"""Embedding clustering operators: distributed Lloyd k-means and
SemDeDup-style semantic deduplication (cluster, then drop near-identical
vectors within each cluster).

Why here: the curation stack deduplicates exact text (hash), near-dup text
(MinHash/SimHash), and near-dup *meaning* — SemDeDup (Abbas et al. 2023)
clusters embeddings with k-means and keeps one representative of every
within-cluster group whose pairwise cosine exceeds a threshold. The
cluster step bounds the pairwise comparison to cluster-sized blocks, the
same blocking discipline as the LSH/IVF paths in ``similarity.py``.

Scale shape (all pure JVM column algebra, no Python UDFs):

* **assignment is shuffle-free** — the k×dim centroid table is collapsed
  to a ONE-ROW broadcast (``array<struct<cell, cv>>``) and the argmin over
  centroids runs inside a per-row ``aggregate``; the corpus is never
  re-partitioned to be assigned.
* **update is one partial-agg shuffle per iteration** — posexplode to
  (cell, d, x) collapses map-side before the (cell, d) exchange; k×dim
  result rows, metadata-scale.
* all distances use quantized integers (``floor(x*quant+0.5)``) so
  assignments are bit-identical across engines — same discipline as
  ``similarity.ivf_assignments``.

At 10^10 vectors the driver holds nothing; centroids ride broadcasts of
k×dim longs (k ≤ ~100k at dim 768 stays well under the 8 GB broadcast
cap). Iteration count is a fixed small constant (SemDeDup uses tens);
each adds one job, not one cached lineage — callers checkpoint between
rounds if they push iters high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import pround
from scalpel_spark.operators.similarity import _dot, _norm

_BIG = 1 << 62  # > any quantized squared distance; argmin init


def _quantized(emb: DataFrame, quant: int) -> DataFrame:
    return emb.select(
        'vec_id',
        F.transform(
            F.col('embedding').cast('array<double>'),
            lambda x: F.floor(x * quant + 0.5).cast('long'),
        ).alias('q'),
    )


def kmeans_assign(
    emb: DataFrame, k: int = 4, iters: int = 2, quant: int = 1000
) -> DataFrame:
    """Lloyd k-means over the embedding column: ``iters`` rounds of
    (assign to nearest centroid by squared L2, recompute centroids as the
    per-cell rounded dimension means). Deterministic end to end: centroids
    init from the ``k`` smallest vec_ids, distances on quantized integers,
    ties broken toward the smaller cell id. Cells that lose every member
    simply vanish (no re-seeding — engine-portable).

    Returns (vec_id, cell) — the assignment AFTER the last recompute,
    i.e. the ``iters``-th assignment pass.
    """
    return kmeans_fit(emb, k, iters, quant)[0]


def kmeans_fit(
    emb: DataFrame, k: int = 4, iters: int = 2, quant: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """:func:`kmeans_assign` plus the fitted codebook: returns
    ``(assignments (vec_id, cell), codebook (cell, cv))`` where ``cv`` is
    the quantized-integer centroid vector USED FOR the last assignment
    pass — exactly the vectors a product-quantization encoder needs to
    score queries against (``similarity.pq_topk``). Same determinism
    contract as :func:`kmeans_assign`."""
    v = _quantized(emb, quant)
    # init: centroids = the k SMALLEST vec_ids' vectors (cell id = vec_id)
    # — an ordered limit, not `vec_id < k`, so id spaces that don't start
    # at 0 (hash-derived ids, filtered subsets) still seed k centroids
    init_ids = emb.select('vec_id').orderBy('vec_id').limit(k)
    cent = v.join(F.broadcast(init_ids), 'vec_id').select(
        F.col('vec_id').alias('cell'), F.posexplode('q').alias('d', 'c')
    )
    asg = cent_vec = None
    for _ in range(iters):
        cent_vec = (
            cent.groupBy('cell')
            .agg(F.array_sort(F.collect_list(F.struct('d', 'c'))).alias('pairs'))
            .select('cell', F.transform('pairs', lambda p: p['c']).alias('cv'))
        )
        cents_row = cent_vec.agg(
            F.collect_list(F.struct('cell', 'cv')).alias('cents')
        )

        def d2(cv):
            return F.aggregate(
                F.zip_with('q', cv, lambda x, c: (x - c) * (x - c)),
                F.lit(0).cast('long'),
                lambda acc, x: acc + x,
            )

        # score every centroid ONCE (transform), then fold an argmin over
        # the scored structs — HOF lambdas get no common-subexpression
        # elimination, so folding over d2(cc) directly would evaluate the
        # O(dim) distance aggregate three times per centroid
        scored = F.transform(
            'cents',
            lambda cc: F.struct(
                d2(cc['cv']).alias('d2'), cc['cell'].cast('long').alias('cell')
            ),
        )
        best = F.aggregate(
            scored,
            F.struct(
                F.lit(_BIG).cast('long').alias('d2'),
                F.lit(-1).cast('long').alias('cell'),
            ),
            lambda acc, s: F.when(
                (s['d2'] < acc['d2'])
                | ((s['d2'] == acc['d2']) & (s['cell'] < acc['cell'])),
                s,
            ).otherwise(acc),
        )
        asg = v.crossJoin(F.broadcast(cents_row)).select(
            'vec_id', 'q', best['cell'].alias('cell')
        )
        cent = (
            asg.select('cell', F.posexplode('q').alias('d', 'x'))
            .groupBy('cell', 'd')
            .agg(F.floor(F.avg('x') + 0.5).cast('long').alias('c'))
        )
    return (
        asg.select('vec_id', F.col('cell').cast('long').alias('cell')),
        cent_vec.select(F.col('cell').cast('long').alias('cell'), 'cv'),
    )


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
    quant: int = 1000,
) -> DataFrame:
    """SemDeDup: k-means the embeddings, then inside each cluster drop
    every vector that has a LOWER-id cluster-mate with cosine ≥
    ``threshold`` (the lowest id of each semantic group survives — no
    transitive closure needed, matching the paper's keep-one rule).

    Returns (vec_id, cell, keep). The pairwise pass is block-bounded by
    the cluster join — never all-pairs; at scale k is sized so clusters
    hold ~10^4 vectors (the paper's regime) and each block re-ranks
    locally, exactly like ``similarity.ivf_topk`` candidate generation.
    """
    asg = kmeans_assign(emb, k, iters, quant)
    v = emb.select(
        'vec_id', F.col('embedding').cast('array<double>').alias('e')
    ).join(asg, 'vec_id')
    a = v.select(F.col('vec_id').alias('a_id'), F.col('e').alias('ea'), 'cell')
    b = v.select(F.col('vec_id').alias('b_id'), F.col('e').alias('eb'), 'cell')
    dup = (
        a.join(b, 'cell')
        .filter(F.col('b_id') < F.col('a_id'))
        .filter(
            pround(_dot('ea', 'eb') / (_norm('ea') * _norm('eb')), 6)
            >= threshold
        )
        .select(F.col('a_id').alias('vec_id'))
        .distinct()
        .withColumn('dropped', F.lit(True))
    )
    return v.join(dup, 'vec_id', 'left').select(
        'vec_id', 'cell', F.coalesce(~F.col('dropped'), F.lit(True)).alias('keep')
    )


def embedding_outliers(emb: DataFrame, k: int = 4, iters: int = 2,
                       quant: int = 1000,
                       high_ppm: int = 900_000) -> DataFrame:
    """Per-cluster embedding outlier gate: k-means blocks, then drop the
    vectors whose squared distance to their own centroid exceeds the
    cluster's exact ``high_ppm`` quantile — the standard noise/mislabel
    pruning pass an embedding pipeline runs before SemDeDup (a far
    outlier is not a *duplicate* of anything; it is junk that poisons
    centroid updates and retrieval).

    Composition of two existing exact primitives: :func:`kmeans_fit`
    (shuffle-free broadcast-argmin assignment, integer distances) and
    ``quantiles.exact_quantiles`` (bucket-decomposed type-1 quantile per
    cluster — a reproducible threshold, unlike a sketch). The corpus
    sees one map-side distance pass + the distinct-value quantile
    machinery; the band joins back as one broadcast row per cluster.

    Returns ``(vec_id, cell, d2, q_high, keep)``.
    """
    from scalpel_spark.operators.quantiles import exact_quantiles

    asg, codebook = kmeans_fit(emb, k, iters, quant)
    v = _quantized(emb, quant)
    d2 = F.aggregate(
        F.zip_with('q', 'cv', lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast('long'),
        lambda acc, x: acc + x,
    )
    dist = (
        v.join(asg, 'vec_id')
        .join(F.broadcast(codebook), 'cell')
        .withColumn('d2', d2)
        .select('vec_id', 'cell', 'd2')
    )
    # dist feeds BOTH the quantile band and the final gate join; without
    # truncation the whole Lloyd lineage executes twice. The frame is
    # slim (24 B/row), so materializing it once is the cheap side of the
    # trade at any scale — same discipline as graphrank's matrix-power
    # checkpoints.
    dist = dist.localCheckpoint(eager=False)
    band = exact_quantiles(
        dist, 'd2', ['cell'], probs_ppm=(high_ppm,)
    ).select('cell', F.col('q_value').alias('q_high'))
    return (
        dist.join(F.broadcast(band), 'cell')
        .withColumn('keep', F.col('d2') <= F.col('q_high'))
        .select('vec_id', 'cell', 'd2', 'q_high', 'keep')
    )
