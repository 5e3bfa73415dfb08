"""Data-selection operators: DSIR importance weighting and weight-ranked
corpus selection.

DSIR (Data Selection with Importance Resampling, Xie et al. 2023,
arXiv:2302.03169) scores every raw-corpus document by how much its hashed
n-gram feature distribution looks like a small trusted *target* corpus:

    w(doc) = Σ_b  count_doc(b) · log( p_target(b) / p_raw(b) )

over hashed feature buckets ``b`` with add-one smoothing. Documents whose
features are target-like get positive weights; boilerplate/spam-like mass
gets negative weights. This is the standard pretraining-data curation
step between dedup and token-budget sampling (`operators/curation.py`).

Engine-portability: the log is :func:`~scalpel_spark.functions.texthash.
log2_milli_expr` — exact integer bit-length + octave interpolation — so
weights are bit-identical in DuckDB (``ln`` over doubles is not), and the
bucket hash is the md5-based :func:`hash60` oracle convention.

Scale shape at 100 TB:

* the target corpus is SMALL by definition (a quality sample) — its
  bucket histogram is one tiny agg;
* the raw corpus contributes ONE partial-agg shuffle for per-doc bucket
  counts and one more (bucket-keyed, ≤ ``n_buckets`` rows out) for the
  raw histogram;
* the λ table is ≤ ``n_buckets`` rows and is broadcast — scoring is a
  map-side join + one per-doc agg. No corpus×corpus anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import (
    hash60,
    log2_milli_expr,
    tokens,
    word_shingles,
)

__all__ = ['dsir_select', 'dsir_weights']


def _bucket_counts(docs: DataFrame, n_buckets: int, shingle_n: int,
                   text_col: str, id_col: str | None) -> DataFrame:
    """(doc_id?, bucket, n) — hashed-shingle bucket counts."""
    sh = word_shingles(tokens(F.col(text_col)), shingle_n)
    cols = ([F.col(id_col).alias('doc_id')] if id_col else [])
    ex = docs.select(*cols, F.explode(sh).alias('shingle'))
    ex = ex.withColumn('bucket', F.pmod(hash60(F.col('shingle')),
                                        F.lit(n_buckets)))
    keys = (['doc_id', 'bucket'] if id_col else ['bucket'])
    return ex.groupBy(*keys).agg(F.count('*').alias('n'))


def dsir_weights(corpus: DataFrame, target: DataFrame,
                 n_buckets: int = 4096, shingle_n: int = 2,
                 text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """Per-document DSIR importance weights of ``corpus`` against
    ``target``.

    Returns (doc_id, n_features, dsir_milli) where ``dsir_milli`` is

        Σ_b n_doc(b) · λ(b),
        λ(b) = [log2m(cnt_t(b)+1) − log2m(total_t + B)]
             − [log2m(cnt_r(b)+1) − log2m(total_r + B)]

    in milli-log2 units (log of a quotient as a difference of logs — no
    product can overflow, and every term is exact integer arithmetic).
    Documents with fewer than ``shingle_n`` tokens emit no features and
    are absent from the result (callers treat missing as weight 0).
    """
    feats = _bucket_counts(corpus, n_buckets, shingle_n, text_col, id_col)
    raw = feats.groupBy('bucket').agg(F.sum('n').alias('cnt_r'))
    tgt = _bucket_counts(target, n_buckets, shingle_n, text_col, None) \
        .withColumnRenamed('n', 'cnt_t')
    totals = raw.agg(F.sum('cnt_r').alias('total_r')).crossJoin(
        tgt.agg(F.coalesce(F.sum('cnt_t'), F.lit(0)).alias('total_t')))

    lam = (
        raw.join(tgt, 'bucket', 'left')
        .withColumn('cnt_t', F.coalesce('cnt_t', F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .withColumn('_t1', F.expr(log2_milli_expr('cnt_t + 1')))
        .withColumn('_t2', F.expr(log2_milli_expr(f'total_t + {n_buckets}')))
        .withColumn('_r1', F.expr(log2_milli_expr('cnt_r + 1')))
        .withColumn('_r2', F.expr(log2_milli_expr(f'total_r + {n_buckets}')))
        .select('bucket',
                (F.col('_t1') - F.col('_t2') - F.col('_r1') + F.col('_r2'))
                .alias('lam_milli'))
    )
    return (
        feats.join(F.broadcast(lam), 'bucket')
        .groupBy('doc_id')
        .agg(F.sum('n').cast('long').alias('n_features'),
             F.sum(F.col('n') * F.col('lam_milli')).cast('long')
              .alias('dsir_milli'))
    )


def dsir_select(corpus: DataFrame, target: DataFrame, keep_fraction: float,
                n_buckets: int = 4096, shingle_n: int = 2,
                text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """Rank-based DSIR selection: keep the ``keep_fraction`` of scored
    documents with the highest importance weight (ties to the smaller
    doc_id — deterministic, unlike the paper's Gumbel resampling, which
    this engine avoids for reproducibility; rank selection is the
    "top-k variant" ablation in the DSIR paper).

    Returns (doc_id, n_features, dsir_milli) for the kept documents.
    The global cut reuses :func:`scalpel_spark.operators.scheduling.
    topk_by_score` — the range-partition straddle selection — so no
    single task ever ranks the whole corpus (the global-window
    anti-pattern `plans/engine.py`'s cap exists to avoid).
    """
    from scalpel_spark.operators.scheduling import topk_by_score

    scored = dsir_weights(corpus, target, n_buckets, shingle_n,
                          text_col, id_col).persist()
    try:
        n_docs = scored.count()
        n_keep = int(n_docs * keep_fraction)
        kept, _ = topk_by_score(scored, n_keep, score_col='dsir_milli',
                                tiebreak='doc_id')
        out = kept.select('doc_id', 'n_features', 'dsir_milli')
        out = out.localCheckpoint()
    finally:
        scored.unpersist()
    return out


def source_drift_matrix(docs: DataFrame, n_buckets: int = 1024,
                        shingle_n: int = 2, text_col: str = 'text',
                        group_col: str = 'source') -> DataFrame:
    """Pairwise distribution drift between sources: exact-integer Jeffreys
    divergence (symmetric KL) over hashed-shingle bucket histograms — the
    corpus-monitoring twin of :func:`dsir_weights` (same features, but
    source-vs-source instead of corpus-vs-target).

    The production question this answers: "did crawl batch B's content
    distribution shift against batch A / source X?" — the alarm that
    catches a spam flood, a parser regression, or a language mix change
    before it pollutes a training mix. KMV overlap
    (`sketches.kmv_overlap_matrix`) measures shared *identity*; this
    measures shared *shape* (two disjoint crawls of the same site family
    have near-zero overlap but near-zero drift).

    Exactness: per-bucket probabilities are add-one-smoothed integral
    parts-per-billion (DECIMAL integral div), logs are ``log2_milli``
    (bit length + octave interpolation), so

        J(a,b) = Σ_b (p_a − p_b) · (log2m p_a − log2m p_b)   [pico units]

    is pure 64-bit integer arithmetic, non-negative, symmetric, and
    bit-identical in the DuckDB oracle. Untouched buckets still carry
    smoothing mass, so the sum runs over the FULL bucket grid (sources ×
    n_buckets rows — bounded and tiny after the one histogram shuffle;
    the pair join is grid×grid on bucket, never corpus×corpus).

    Returns (src_a, src_b, jeffreys_pico) for src_a < src_b.
    """
    counts = (
        _bucket_counts(docs.withColumnRenamed(group_col, '_g'),
                       n_buckets, shingle_n, text_col, '_g')
        .withColumnRenamed('doc_id', 'g')
        .withColumnRenamed('n', 'cnt')
    )
    tots = counts.groupBy('g').agg(F.sum('cnt').alias('tot'))
    grid = (
        tots.select('g', 'tot',
                    F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
                    .alias('bucket'))
        .join(counts, ['g', 'bucket'], 'left')
        .withColumn('cnt', F.coalesce('cnt', F.lit(0)))
    )
    p = F.expr(
        'CAST(CAST(cnt + 1 AS DECIMAL(28,0)) * 1000000000 div '
        f'CAST(tot + {n_buckets} AS DECIMAL(19,0)) AS BIGINT)')
    grid = grid.withColumn('p_ppb', p).withColumn(
        'l_milli', F.expr(log2_milli_expr('GREATEST(p_ppb, 1)')))
    a, b = grid.alias('a'), grid.alias('b')
    pair = a.join(b, (F.col('a.bucket') == F.col('b.bucket'))
                  & (F.col('a.g') < F.col('b.g')))
    return (
        pair.groupBy(F.col('a.g').alias('src_a'), F.col('b.g').alias('src_b'))
        .agg(F.sum((F.col('a.p_ppb') - F.col('b.p_ppb'))
                   * (F.col('a.l_milli') - F.col('b.l_milli')))
             .cast('long').alias('jeffreys_pico'))
    )
