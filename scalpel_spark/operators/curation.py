"""End-to-end corpus curation for LLM training data: quality gate →
exact dedup → near-dup clustering → keep-one-drop-rest, plus a
deterministic token-budget sampler for building training mixtures.

These compose the individual operators (``textops``, ``dedup``) into the
pipeline a real 100 TB curation job runs, with one verdict row per input
document so every drop is attributable.

Reference parity note: the reference dedups URLs only, with an in-memory
set (``scalpel/any_io/static_spider.py:100-106``); corpus-content curation
is part of the LLM-pipeline layer this engine adds over the crawled docs.

Scale shape (100 TB corpus, 1000 executors):

* the quality gate is map-side (one corpus scan, zero shuffles);
* exact dedup is one hash-shuffle groupBy on the 60-bit normalized
  fingerprint;
* the near-dup stage runs only over exact-canonical survivors and is the
  blocked (df-capped) shingle join from ``dedup.ngram_jaccard_pairs`` —
  never all-pairs — followed by min-label propagation over the (small)
  pair graph;
* the token sampler is two slim-projection shuffles; its per-stratum
  prefix sum is decomposed bucket-wise (range partitioning on the shuffle
  key) so no single task ever sorts a whole language — the naive
  ``Window.partitionBy(lang)`` would serialize terabytes per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60, pround, tokens
from scalpel_spark.operators import dedup
from scalpel_spark.operators.textops import norm_col, quality_feature_cols

# hash60 yields 60-bit keys; bucket = key >> (60 - log2(n_buckets)) is a
# range partition of the key space, so bucket-major order == key order
_KEY_BITS = 60


def curate(docs: DataFrame, quality_threshold: float = 0.45, n: int = 4,
           jaccard_threshold: float = 0.5, df_cap: int = 100,
           max_iter: int = 25) -> DataFrame:
    """One verdict row per input document:

    * ``low_quality`` — composite quality score (rounded at 4 digits, same
      definition as :func:`textops.quality_scores`) below the threshold;
      ``cluster_id`` is the ``-1`` not-clustered sentinel (NULL would be
      semantically cleaner but sorts differently across engines).
    * ``exact_dup`` — same normalized-text fingerprint as a lower doc_id
      that survived the quality gate; ``cluster_id`` = that canonical id.
    * ``near_dup`` — non-canonical member of an n-gram-Jaccard connected
      component over normalized text (threshold on the rounded jaccard);
      ``cluster_id`` = component min doc_id.
    * ``kept`` — survives all three stages; ``cluster_id`` = own doc_id.

    ``filter(verdict = 'kept')`` joined back to the corpus is the curated
    training set; the complement is the attributable drop list. Stages
    apply in order, so an exact duplicate of a low-quality doc can itself
    be ``kept`` (its lower-id twin never entered the exact stage) — the
    gate runs on every doc independently, mirroring how per-stage filters
    compose in a real pipeline.

    Cost note: the raw corpus is scanned twice (once for the low-quality
    branch, once for the survivor branch) — deliberate: persisting the
    enriched corpus would halve scans but cache ~corpus-size bytes;
    everything downstream of the gate reads the persisted
    quality-surviving subset only.

    Returns (doc_id, verdict, cluster_id, score).
    """
    feats = quality_feature_cols(F.col('text'))
    enriched = docs.select(
        'doc_id',
        norm_col(F.col('text')).alias('norm_text'),
        pround(feats['score'], 4).alias('score'),
    )
    lowq = enriched.filter(F.col('score') < quality_threshold).select(
        'doc_id',
        F.lit('low_quality').alias('verdict'),
        F.lit(-1).cast('long').alias('cluster_id'),
        'score',
    )
    surv = enriched.filter(F.col('score') >= quality_threshold)
    fp = surv.withColumn('fp', hash60(F.col('norm_text')))
    canon = fp.groupBy('fp').agg(F.min('doc_id').alias('exact_canonical'))
    # persisted: read by three downstream branches (exact_dup verdicts,
    # the shingle join, the kept anti-join) — recomputing would re-scan
    # and re-normalize the quality-surviving corpus three times
    joined = fp.join(canon, 'fp').persist()
    exact_dup = joined.filter(F.col('doc_id') != F.col('exact_canonical')).select(
        'doc_id',
        F.lit('exact_dup').alias('verdict'),
        F.col('exact_canonical').alias('cluster_id'),
        'score',
    )
    exact_surv = joined.filter(F.col('doc_id') == F.col('exact_canonical'))
    pairs = dedup.ngram_jaccard_pairs(
        exact_surv.select('doc_id', F.col('norm_text').alias('text')),
        n=n, threshold=jaccard_threshold, df_cap=df_cap,
    )
    labels = dedup.duplicate_clusters(pairs, max_iter=max_iter)
    near = labels.filter(F.col('doc_id') != F.col('cluster_id'))
    near_dup = near.join(exact_surv.select('doc_id', 'score'), 'doc_id').select(
        'doc_id', F.lit('near_dup').alias('verdict'), 'cluster_id', 'score')
    kept = exact_surv.join(near, 'doc_id', 'left_anti').select(
        'doc_id',
        F.lit('kept').alias('verdict'),
        F.col('doc_id').alias('cluster_id'),
        'score',
    )
    return lowq.unionByName(exact_dup).unionByName(near_dup).unionByName(kept)


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  bench_id_col: str = 'bench_id') -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any n-word
    shingle with a held-out evaluation set (the standard 8/13-gram overlap
    check run before LLM training so test data never leaks into the mix).

    ``benchmark`` is (bench_id, text). Returns one row per *contaminated*
    corpus doc: (doc_id, n_matched_shingles, first_bench_id) where
    ``n_matched_shingles`` counts distinct overlapping shingles and
    ``first_bench_id`` is the lowest-id benchmark doc hit (attribution).
    ``docs.join(result, 'doc_id', 'left_anti')`` is the clean corpus.

    Scale shape: eval sets are tiny next to a 100 TB corpus (millions of
    shingles at most), so the benchmark side collapses to a distinct
    shingle dimension that broadcast-joins — the corpus side is one
    map-side shingle explode, a broadcast hash join (no shuffle of corpus
    data on the join), and a partial-aggregated groupBy(doc_id). No
    all-pairs anything; cost is O(corpus shingles).
    """
    bsh = dedup._shingled(
        benchmark.select(F.col(bench_id_col).alias('doc_id'), 'text'), n)
    bench_grams = (
        bsh.select(F.col('doc_id').alias('bench_id'), F.explode('shingle_set').alias('s'))
        .groupBy('s').agg(F.min('bench_id').alias('first_bench_id'))
    )
    dx = dedup._shingled(docs, n).select('doc_id', F.explode('shingle_set').alias('s'))
    # shingle_set is per-doc distinct, so count(*) == distinct matched shingles
    return (
        dx.join(F.broadcast(bench_grams), 's')
        .groupBy('doc_id')
        .agg(
            F.count('*').alias('n_matched_shingles'),
            F.min('first_bench_id').alias('first_bench_id'),
        )
    )


def source_reputation(docs: DataFrame, quality_threshold: float = 0.45) -> DataFrame:
    """Per-source (domain/crawl-feed) reputation rollup: document count,
    mean composite quality score, and the low-quality share. Feeds
    source-level curation decisions (drop a spam domain wholesale instead
    of per-document) — the same two-level pattern a 100 TB pipeline uses
    because per-source verdicts amortize over millions of documents.

    Per-doc scores round at 4 digits first (same definition as
    :func:`textops.quality_scores`, one rounding boundary for engine
    parity), then aggregate. One map-side scoring pass + one partial-agg
    groupBy(source); join the (tiny) result back broadcast-wise to flag
    documents. Returns (source, n_docs, mean_score, n_low_quality,
    low_quality_frac).
    """
    feats = quality_feature_cols(F.col('text'))
    scored = docs.select('source', pround(feats['score'], 4).alias('score'))
    return scored.groupBy('source').agg(
        F.count('*').alias('n_docs'),
        pround(F.avg('score'), 4).alias('mean_score'),
        F.sum(F.when(F.col('score') < quality_threshold, 1).otherwise(0))
        .cast('long').alias('n_low_quality'),
        pround(
            F.sum(F.when(F.col('score') < quality_threshold, 1).otherwise(0))
            .cast('double') / F.count('*'), 4,
        ).alias('low_quality_frac'),
    )


def token_budget_sample(docs: DataFrame, budget_tokens: int,
                        strata_col: str = 'lang',
                        n_buckets: int = 64) -> DataFrame:
    """Deterministic stratified greedy sampler: within each stratum, visit
    documents in md5-shuffle-key order and keep each doc whose running
    token total *before* it is still under the budget (the classic greedy
    fill — the last kept doc may overshoot by a partial document).

    The prefix sum is decomposed so no single task sorts a whole stratum:
    ``bucket = shuffle_key >> (60 - log2(n_buckets))`` range-partitions
    the key space, per-(stratum, bucket) windows run in parallel, and the
    cross-bucket offsets come from a tiny per-bucket aggregate. Because
    the buckets are key *ranges*, bucket-major order equals global key
    order — the kept set is provably independent of ``n_buckets`` (must
    be a power of two). Size ``n_buckets`` so one bucket of one stratum
    fits an executor's sort buffer: ~4096 for a 100 TB corpus. The slim
    (id, stratum, tokens, key) projection is computed twice — once for
    the per-doc window, once for the per-bucket totals; both are map-side
    token counts off the pruned column scan, cheaper than caching the
    projection corpus-wide.

    Returns (doc_id, <strata_col>, n_tokens, cum_before) for kept docs.
    """
    out = _stratified_cum(docs, strata_col, n_buckets).filter(
        F.col('cum_before') < budget_tokens)
    return out.select('doc_id', F.col('stratum').alias(strata_col),
                      'n_tokens', 'cum_before')


def _stratified_cum(docs: DataFrame, strata_col: str,
                    n_buckets: int) -> DataFrame:
    """The bucket-decomposed per-stratum running token total shared by
    :func:`token_budget_sample` and :func:`mixture_sample`: (doc_id,
    stratum, n_tokens, cum_before) where ``cum_before`` is the stratum's
    token count ahead of this doc in md5-shuffle-key order."""
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f'n_buckets must be a power of two, got {n_buckets}')
    shift = _KEY_BITS - (n_buckets.bit_length() - 1)
    base = docs.select(
        'doc_id',
        F.col(strata_col).alias('stratum'),
        F.size(tokens(F.col('text'))).cast('long').alias('n_tokens'),
        hash60(F.col('doc_id').cast('string')).alias('shuffle_key'),
    ).withColumn('bucket', F.shiftright('shuffle_key', shift))
    w_in = (
        Window.partitionBy('stratum', 'bucket')
        .orderBy('shuffle_key', 'doc_id')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    doc_cum = base.withColumn(
        'in_bucket_before', F.coalesce(F.sum('n_tokens').over(w_in), F.lit(0)))
    bucket_tot = base.groupBy('stratum', 'bucket').agg(
        F.sum('n_tokens').alias('bucket_tokens'))
    w_b = (
        Window.partitionBy('stratum').orderBy('bucket')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # strata x n_buckets rows — tiny; broadcast into the per-doc join
    bucket_cum = bucket_tot.withColumn(
        'bucket_before', F.coalesce(F.sum('bucket_tokens').over(w_b), F.lit(0)))
    return (
        doc_cum.join(
            F.broadcast(bucket_cum.select('stratum', 'bucket', 'bucket_before')),
            ['stratum', 'bucket'])
        .withColumn('cum_before',
                    F.col('bucket_before') + F.col('in_bucket_before'))
    )


def mixture_sample(docs: DataFrame, budget_tokens: int,
                   weights_ppm: dict[str, int],
                   strata_col: str = 'lang',
                   n_buckets: int = 64) -> DataFrame:
    """Training-mixture sampler: fill a global token budget according to
    explicit per-stratum mixture weights (the DoReMi / The-Pile-style
    recipe where the pretraining mix is a design decision, not the crawl
    distribution). Each stratum ``s`` gets its own greedy fill of

        budget_s = (budget_tokens * weights_ppm[s]) div 1e6

    in md5-shuffle-key order — same machinery as
    :func:`token_budget_sample` (bucket-decomposed prefix sum, kept set
    independent of ``n_buckets``), with the budget joined per stratum
    from a broadcast weights table. Strata absent from ``weights_ppm``
    are dropped (weight 0); integer-ppm weights keep every budget exact
    and engine-portable. Weights need not sum to 1e6 — under-subscribed
    mixes simply keep less.

    Returns (doc_id, <strata_col>, n_tokens, cum_before, stratum_budget).
    """
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, (budget_tokens * w) // 1_000_000)
         for s, w in sorted(weights_ppm.items())],
        'stratum STRING, stratum_budget BIGINT')
    out = (
        _stratified_cum(docs, strata_col, n_buckets)
        .join(F.broadcast(wdf), 'stratum')
        .filter(F.col('cum_before') < F.col('stratum_budget'))
    )
    return out.select('doc_id', F.col('stratum').alias(strata_col),
                      'n_tokens', 'cum_before', 'stratum_budget')


def pack_sequences(docs: DataFrame, seq_tokens: int,
                   n_buckets: int = 64) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out in
    deterministic md5-shuffle-key order and cut it into consecutive
    training sequences of exactly ``seq_tokens`` tokens — the standard
    GPT-style pretraining layout where a document may straddle a sequence
    boundary rather than waste padding.

    Each document gets the sequence that contains its FIRST token:

    * ``seq_id = cum_before div seq_tokens`` — its training sequence
    * ``offset`` — token offset inside that sequence
    * ``spans_boundary`` — True when the doc's tail crosses into the next
      sequence (the consumer splits it at tokenization time)

    The global running total uses the same bucket-decomposed prefix sum
    as :func:`token_budget_sample` (range partitioning on the 60-bit key,
    per-bucket windows in parallel, cross-bucket offsets from an
    ``n_buckets``-row aggregate), so no single task ever sorts the corpus
    and the assignment is provably independent of ``n_buckets``.

    Returns (doc_id, n_tokens, cum_before, seq_id, offset, spans_boundary).
    """
    costed = docs.select(
        'doc_id',
        F.size(tokens(F.col('text'))).cast('long').alias('n_tokens'),
    )
    return packed_layout(costed, seq_tokens, n_buckets)


def packed_layout(costed: DataFrame, seq_tokens: int,
                  n_buckets: int = 64, carry: list[str] | None = None) -> DataFrame:
    """The concat-and-chunk layout shared by :func:`pack_sequences` and
    `content.pack_interleaved`: given (doc_id, n_tokens[, carry cols]),
    assign each document its training-sequence id / offset / boundary
    flag via the bucket-decomposed global prefix sum (no single-task
    sort; assignment provably independent of ``n_buckets``)."""
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f'n_buckets must be a power of two, got {n_buckets}')
    shift = _KEY_BITS - (n_buckets.bit_length() - 1)
    carry = carry or []
    base = costed.select(
        'doc_id', F.col('n_tokens').cast('long').alias('n_tokens'), *carry,
    ).withColumn(
        'shuffle_key', hash60(F.col('doc_id').cast('string')),
    ).withColumn('bucket', F.shiftright('shuffle_key', shift))
    w_in = (
        Window.partitionBy('bucket')
        .orderBy('shuffle_key', 'doc_id')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    doc_cum = base.withColumn(
        'in_bucket_before', F.coalesce(F.sum('n_tokens').over(w_in), F.lit(0)))
    w_b = Window.orderBy('bucket').rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = (
        base.groupBy('bucket').agg(F.sum('n_tokens').alias('bucket_tokens'))
        .withColumn('bucket_before',
                    F.coalesce(F.sum('bucket_tokens').over(w_b), F.lit(0)))
    )
    out = (
        doc_cum.join(F.broadcast(bucket_cum.select('bucket', 'bucket_before')),
                     'bucket')
        .withColumn('cum_before', F.col('bucket_before') + F.col('in_bucket_before'))
    )
    return out.select(
        'doc_id', 'n_tokens', *carry, 'cum_before',
        F.expr(f'cum_before div {seq_tokens}').alias('seq_id'),
        (F.col('cum_before') % seq_tokens).alias('offset'),
        ((F.col('cum_before') % seq_tokens) + F.col('n_tokens') > seq_tokens)
        .alias('spans_boundary'),
    )


def domain_cap(docs: DataFrame, max_per_source: int,
               digits: int = 4) -> DataFrame:
    """Per-domain quota — keep at most ``max_per_source`` documents per
    source, best quality first (the anti-spam rule that stops one domain
    from dominating a training mixture). Deterministic order: (rounded
    quality score DESC, doc_id ASC).

    NOT a per-source sort: a spam domain with 10^9 documents would
    serialize a ``Window.partitionBy(source)`` into one task. Instead the
    rounded score (10^digits distinct values) acts as a histogram:

    1. one groupBy(source, score_r) builds per-bucket counts — bounded by
       sources × 10^digits, metadata-scale;
    2. a window over that SMALL histogram computes how many strictly
       better docs each bucket has → whole buckets are kept or dropped
       wholesale;
    3. only the single straddling bucket per source (the one where the
       quota runs out) ranks its rows by doc_id — a window over one score
       bucket, not one domain.

    The flat ROW_NUMBER-per-source oracle is equal by construction, the
    same decomposition argument as :func:`token_budget_sample`.

    Returns (doc_id, source, score, keep).
    """
    scale = 10 ** digits
    feats = quality_feature_cols(F.col('text'))
    base = docs.select(
        'doc_id', 'source',
        pround(feats['score'], digits).alias('score'),
    ).withColumn('score_r', F.floor(F.col('score') * scale + 0.5).cast('long'))
    hist = base.groupBy('source', 'score_r').agg(F.count('*').alias('cnt'))
    w_h = (
        Window.partitionBy('source').orderBy(F.col('score_r').desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        'better', F.coalesce(F.sum('cnt').over(w_h), F.lit(0)))
    marked = base.join(hist, ['source', 'score_r'])
    straddling = (F.col('better') < max_per_source) & (
        F.col('better') + F.col('cnt') > max_per_source)
    # whole buckets decided without ranking a single row
    wholesale = marked.filter(~straddling).select(
        'doc_id', 'source', 'score',
        (F.col('better') + F.col('cnt') <= max_per_source).alias('keep'))
    # ONLY the straddling bucket's rows get a window — one score bucket
    # per source, not one domain. (Degenerate caveat: if a domain's docs
    # all share one rounded score, that bucket IS the domain; raise
    # ``digits`` for finer buckets.)
    w_tie = Window.partitionBy('source', 'score_r').orderBy('doc_id')
    ranked = marked.filter(straddling).select(
        'doc_id', 'source', 'score', 'better',
        F.row_number().over(w_tie).alias('rn'),
    ).select(
        'doc_id', 'source', 'score',
        (F.col('rn') <= max_per_source - F.col('better')).alias('keep'))
    return wholesale.unionByName(ranked)


def assign_shards(docs: DataFrame, n_shards: int) -> DataFrame:
    """Deterministic output-shard assignment for training-data export:
    shard = hash60(doc_id) mod n_shards. Hash-based (not round-robin or
    task-id based) so the assignment is reproducible across runs,
    cluster sizes, and partition layouts — re-exporting the same corpus
    always yields byte-identical shard membership, which is what makes
    training-data versioning and resumable export possible.

    Map-side only (one projection, no shuffle). Returns the input plus
    ``shard`` (long in [0, n_shards)).
    """
    return docs.withColumn(
        'shard', F.pmod(hash60(F.col('doc_id').cast('string')), F.lit(n_shards)))


def shard_stats(docs: DataFrame, n_shards: int) -> DataFrame:
    """Per-shard balance report for :func:`assign_shards`: document count,
    token total, and char total per shard — the check that no training
    shard is pathologically over- or under-filled before a multi-day run
    reads them. One partial-agg shuffle over n_shards groups.

    Returns (shard, n_docs, total_tokens, total_chars).
    """
    return (
        assign_shards(docs, n_shards)
        .select('shard',
                F.size(tokens(F.col('text'))).cast('long').alias('nt'),
                F.length('text').cast('long').alias('nc'))
        .groupBy('shard')
        .agg(F.count('*').alias('n_docs'),
             F.sum('nt').alias('total_tokens'),
             F.sum('nc').alias('total_chars'))
    )


def write_training_shards(docs: DataFrame, path: str, n_shards: int,
                          max_records_per_file: int = 1_000_000) -> None:
    """Export the corpus as n_shards hash-assigned parquet partitions:
    ``path/shard=K/part-*.parquet``. One repartition shuffle keyed on the
    shard column co-locates each shard's rows so every shard directory is
    written by exactly one task (plus ``maxRecordsPerFile`` splitting for
    bounded file sizes — readers stream files, so a shard may hold many).

    Readers that want shard K scan only ``shard=K`` via partition pruning.
    """
    (
        assign_shards(docs, n_shards)
        .repartition(n_shards, 'shard')
        .write.mode('overwrite')
        .option('maxRecordsPerFile', max_records_per_file)
        .partitionBy('shard')
        .parquet(path)
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Fixed-size token chunking with overlap — the RAG / context-window
    prep pass: each document becomes ceil(n_tokens / stride) chunks of at
    most ``chunk_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens (stride = chunk_tokens - overlap). Chunk k covers
    token offsets [k*stride, k*stride + chunk_tokens); the final chunk is
    shorter when the document tail runs out. Empty documents emit no
    chunks.

    Scale shape: pure map-side column algebra — ``split`` once per doc,
    ``posexplode`` over the stride sequence, ``slice`` + ``array_join``
    per chunk. No shuffle, no Python; output size is corpus_tokens/stride
    rows regardless of document skew, and Catalyst prunes the scan to
    (doc_id, text). The reference has no chunking (it emits whole pages,
    ``any_io/static_spider.py:143``); this is LLM-pipeline layer.

    Returns (doc_id, chunk_seq, start, chunk_len, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f'need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}')
    stride = chunk_tokens - overlap
    base = docs.select(
        'doc_id',
        tokens(F.col('text')).alias('toks'),
    ).withColumn('n_tokens', F.size('toks').cast('long')).filter(F.col('n_tokens') > 0)
    starts = F.sequence(F.lit(0).cast('long'), F.col('n_tokens') - 1, F.lit(stride).cast('long'))
    chunk = F.slice(F.col('toks'), F.col('start').cast('int') + 1, chunk_tokens)
    return (
        base.select('doc_id', 'toks', F.posexplode(starts).alias('chunk_seq', 'start'))
        .select(
            'doc_id',
            F.col('chunk_seq').cast('long').alias('chunk_seq'),
            'start',
            F.size(chunk).cast('long').alias('chunk_len'),
            F.array_join(chunk, ' ').alias('chunk_text'),
        )
    )


def epoch_layout(docs: DataFrame, n_shards: int, epoch: int = 0,
                 n_buckets: int = 64) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard layout — the final
    "write the training set" step (WebDataset / Megatron-style): every
    epoch is an independent pseudo-random permutation of the corpus, cut
    into ``n_shards`` shard files read sequentially by the loader.

    The permutation key is ``hash60('e{epoch}|' || doc_id)`` — a new
    order per epoch with no RNG state to ship. The shard is the key's
    TOP bits, so shards are key *ranges*: reading shard 0..n in order
    replays the exact global permutation (loaders need no cross-shard
    merge), and shard sizes are balanced in expectation regardless of
    doc_id distribution.

    ``pos_in_shard`` comes from the same two-level decomposition as
    :func:`pack_sequences`: per-(sub-bucket) windows rank locally
    (``n_shards * n_buckets`` ranges, each 1/(shards·buckets) of the
    corpus — no single-task sort anywhere) and a tiny
    shards×buckets-row aggregate supplies the cross-bucket offsets.
    Both bit-widths must be powers of two; the layout is provably
    independent of ``n_buckets`` (buckets subdivide shards on the same
    key order).

    Returns ``(doc_id, epoch, shard, pos_in_shard)``.
    """
    for name, v in (('n_shards', n_shards), ('n_buckets', n_buckets)):
        if v & (v - 1) or v <= 0:
            raise ValueError(f'{name} must be a power of two, got {v}')
    s_bits = n_shards.bit_length() - 1
    b_bits = n_buckets.bit_length() - 1
    if s_bits + b_bits >= _KEY_BITS:
        raise ValueError('n_shards * n_buckets exceeds the key space')

    base = docs.select('doc_id').withColumn(
        'shuffle_key',
        hash60(F.concat(F.lit(f'e{epoch}|'), F.col('doc_id').cast('string'))),
    ).withColumn(
        'shard', F.shiftright('shuffle_key', _KEY_BITS - s_bits).cast('int'),
    ).withColumn(
        'bucket', F.shiftright('shuffle_key', _KEY_BITS - s_bits - b_bits),
    )
    w_in = Window.partitionBy('bucket').orderBy('shuffle_key', 'doc_id')
    ranked = base.withColumn(
        'in_bucket_before', F.row_number().over(w_in).cast('long') - 1)
    w_b = (
        Window.partitionBy('shard').orderBy('bucket')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_cum = (
        base.groupBy('shard', 'bucket').agg(F.count(F.lit(1)).alias('bn'))
        .withColumn('bucket_before',
                    F.coalesce(F.sum('bn').over(w_b), F.lit(0)))
        .select('shard', 'bucket', 'bucket_before')
    )
    return (
        ranked.join(F.broadcast(bucket_cum), ['shard', 'bucket'])
        .select(
            'doc_id',
            F.lit(epoch).cast('int').alias('epoch'),
            'shard',
            (F.col('bucket_before') + F.col('in_bucket_before'))
            .cast('long').alias('pos_in_shard'),
        )
    )


def chunk_documents_cdc(docs: DataFrame, mean_tokens: int = 64) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall AFTER any token
    whose 60-bit hash is ≡ 0 mod ``mean_tokens`` — so boundaries are a
    function of the CONTENT, not the position. Insert or delete a token
    early in a document and only the chunk containing the edit changes;
    every later chunk is byte-identical — which is what makes CDC the
    chunking for dedup-friendly storage (restic/borg/LBFS lineage) and
    for chunk-level dedup across near-identical documents, where the
    fixed-stride :func:`chunk_documents` re-aligns every chunk after an
    edit. Expected chunk length = ``mean_tokens`` (geometric, no hard
    min/max — the plain gear-CDC contract; callers needing bounds
    compose with a split pass).

    ``mean_tokens`` must be a power of two (the boundary test is a mask,
    matching both engines' integer semantics exactly).

    Plan: map-side boundary flags (hash per token inside one higher-order
    ``transform``), a per-document running sum to number chunks (window
    partitioned by doc — bounded by document length, the same shape as
    every reassembly in this module), one groupBy(doc_id, chunk) rebuild.

    Returns (doc_id, chunk_seq, start, chunk_len, chunk_text).
    """
    if mean_tokens & (mean_tokens - 1) or mean_tokens <= 0:
        raise ValueError(f'mean_tokens must be a power of two, got {mean_tokens}')
    toks = docs.select('doc_id', tokens(F.col('text')).alias('toks')) \
               .filter(F.size('toks') > 0)
    ex = toks.select(
        'doc_id', F.posexplode('toks').alias('pos', 'tok')
    ).withColumn(
        '_b', (F.pmod(hash60(F.col('tok')), F.lit(mean_tokens)) == 0)
        .cast('long'),
    )
    # chunk id = boundaries strictly BEFORE this token (boundary token
    # ends its chunk, next token starts the new one)
    w = (
        Window.partitionBy('doc_id').orderBy('pos')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ex = ex.withColumn('chunk_seq',
                       F.coalesce(F.sum('_b').over(w), F.lit(0)).cast('long'))
    return (
        ex.groupBy('doc_id', 'chunk_seq')
        .agg(
            F.min('pos').cast('long').alias('start'),
            F.count(F.lit(1)).cast('long').alias('chunk_len'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct('pos', 'tok'))),
                    lambda s: s['tok']),
                ' ').alias('chunk_text'),
        )
    )


def hash_sample(df: DataFrame, rate_ppm: int, key_col: str,
                salt: str = '') -> DataFrame:
    """Consistent (deterministic) sampling: keep rows where
    ``hash60(salt | key) mod 1e6 < rate_ppm``.

    Unlike ``df.sample()`` (RNG per task attempt — not reproducible
    across runs, retries, or datasets), the decision is a pure function
    of the KEY: the same document is in or out of the sample in every
    run, every table it appears in, and every derived dataset — which is
    what makes held-out splits honest (a doc sampled into eval stays out
    of train even after the corpus is re-partitioned or re-crawled) and
    lets two tables' samples JOIN (both sides keep the same keys).
    ``salt`` derives independent samples from the same keys.

    Map-side only. Expected kept fraction = rate_ppm/1e6 with hash
    uniformity; exact membership is pinned, not the count.
    """
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError(f'rate_ppm must be within [0, 1e6], got {rate_ppm}')
    gate = F.pmod(
        hash60(F.concat(F.lit(salt), F.lit('|'),
                        F.col(key_col).cast('string'))),
        F.lit(1_000_000),
    ) < rate_ppm
    return df.filter(gate)


def curation_report(verdicts: DataFrame, docs: DataFrame,
                    group_col: str = 'source') -> DataFrame:
    """Per-group curation governance rollup over :func:`curate` verdicts:
    how much of each source survives, and why the rest died — the table
    a data-governance review (and the `source_reputation` drop decision)
    actually reads. One doc_id-keyed join + one tiny groupBy; the
    kept share is exact integral ppm.

    Returns (group, n_docs, n_kept, n_low_quality, n_exact_dup,
    n_near_dup, kept_ppm).
    """
    j = verdicts.join(docs.select('doc_id', group_col), 'doc_id')

    def n_of(v):
        return F.sum((F.col('verdict') == v).cast('long'))

    return (
        j.groupBy(F.col(group_col).alias('group'))
        .agg(
            F.count(F.lit(1)).cast('long').alias('n_docs'),
            n_of('kept').alias('n_kept'),
            n_of('low_quality').alias('n_low_quality'),
            n_of('exact_dup').alias('n_exact_dup'),
            n_of('near_dup').alias('n_near_dup'),
        )
        .withColumn('kept_ppm', F.expr('n_kept * 1000000L div n_docs'))
    )
