"""Large-scale document deduplication operators.

The reference engine dedups *URLs* with in-memory Python sets
(``scalpel/any_io/static_spider.py:100-106``); a 100 TB training-data
pipeline additionally needs *content* dedup. Every operator here is pure
DataFrame column algebra (JVM, whole-stage codegen) — no Python UDFs — and
every hash is engine-portable (see ``functions/texthash.py``) so the DuckDB
oracle can verify results value-for-value.

Scale notes (100 TB, 1000 executors):

* ``exact_duplicates``: one hash-shuffle on a 60-bit fingerprint; map-side
  partial aggregation kicks in automatically; output is tiny (dup groups).
* ``minhash_lsh_pairs``: the classic shingle→minhash→band→bucket-join
  pipeline. The only shuffles are (a) the groupBy building signatures and
  (b) the band-bucket self-join, whose fan-out is bounded because bucket
  keys are 4-minhash concatenations (collisions ≈ true near-dups). Candidate
  verification is a signature compare, not a document compare, so no wide
  rows travel through the join.
* ``ngram_jaccard_pairs`` / ``containment_pairs``: exact scores on shingle
  *sets*, blocked by shared-shingle with a document-frequency cap
  (``df_cap``) so one ubiquitous boilerplate shingle cannot make the
  self-join quadratic; MinHash-LSH remains the cheapest scale path.
* ``simhash_fingerprints``: 32-bit SimHash via per-bit majority vote,
  computed with generated per-bit SUM expressions in ONE aggregation pass
  (no bit-explosion shuffle).
* ``embedding_duplicates``: cosine near-dup within small blocks (label);
  the ANN path for unblocked data is ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import hash60, pround, tokens, word_shingles

SIMHASH_BITS = 32


def with_planted_duplicates(docs: DataFrame, n: int = 20, id_offset: int = 1_000_000) -> DataFrame:
    """Deterministic eval corpus: re-append the first ``n`` docs (by doc_id)
    under ``doc_id + id_offset`` so dedup operators have known positives."""
    dups = (
        docs.orderBy('doc_id').limit(n)
        .withColumn('doc_id', F.col('doc_id') + F.lit(id_offset))
    )
    return docs.unionByName(dups)


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: fingerprint = hash60(lower(text)).

    Returns one row per duplicate group: (fingerprint, n_copies,
    canonical_doc_id = min doc_id) — the keep-one-drop-rest decision.
    """
    return (
        docs.select('doc_id', hash60(F.lower(F.col('text'))).alias('fingerprint'))
        .groupBy('fingerprint')
        .agg(
            F.count('*').alias('n_copies'),
            F.min('doc_id').alias('canonical_doc_id'),
        )
        .filter(F.col('n_copies') > 1)
    )


def _shingled(docs: DataFrame, n: int = 3) -> DataFrame:
    # two-step projection on purpose: materializing `toks` keeps the n
    # slice expressions inside word_shingles sharing ONE split() — inlining
    # the split re-evaluates it per shingle inside the interpreted lambda
    # (CollapseProject keeps the split separate because it is non-cheap and
    # multiply-referenced)
    tok_df = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    return tok_df.select('doc_id', F.array_distinct(word_shingles(F.col('toks'), n)).alias('shingle_set'))


def _drop_heavy_shingles(ex: DataFrame, df_cap: int) -> DataFrame:
    """Heavy-shingle filter: drop shingles whose document frequency exceeds
    ``df_cap`` before any shared-shingle self-join. Without it one
    ubiquitous boilerplate shingle shared by 10^6 docs yields ~10^12
    candidate pairs — the classic quadratic blowup. Heavy shingles are few
    (they are, by definition, the most common ones), so the blocklist
    broadcast-joins; the Jaccard/containment *scores* still use the full
    shingle sets, only candidate *blocking* loses the heavy keys.

    Guaranteed blocking key (ADVICE r2): a doc whose shingles are ALL
    heavy — the >df_cap cluster of near-identical documents — would
    otherwise lose every blocking key and the whole cluster would escape
    near-dup detection (even jaccard = 1.0 pairs). Such a doc keeps
    exactly ONE shingle: its lexicographic-min shingle, which
    near-identical docs share, so the cluster still blocks together.
    Cost stays bounded: the exemption fires only for all-heavy docs, and
    a c-doc cluster's c² candidate pairs are the *required output* of a
    pairs API, not avoidable work."""
    heavy = (ex.groupBy('s').agg(F.count('*').alias('df'))
             .filter(F.col('df') > df_cap).select('s', F.lit(True).alias('_heavy')))
    marked = ex.join(F.broadcast(heavy), 's', 'left')
    keys = marked.groupBy('doc_id').agg(
        F.min(F.when(F.col('_heavy').isNull(), F.col('s'))).alias('nh_min'),
        F.min('s').alias('all_min'),
    )
    return (
        marked.join(keys, 'doc_id')
        .filter(F.col('_heavy').isNull()
                | (F.col('nh_min').isNull() & (F.col('s') == F.col('all_min'))))
        .select('doc_id', 's')
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        df_cap: int = 100) -> DataFrame:
    """Exact n-gram (word shingle) Jaccard near-dup pairs, blocked by shared
    shingle with a document-frequency cap (see :func:`_drop_heavy_shingles`
    — candidate count stays bounded even under ubiquitous boilerplate).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. Note: a pair whose
    only shared shingles are heavy is not a near-dup candidate UNLESS both
    docs are all-heavy (the >df_cap duplicate cluster — caught via the
    guaranteed min-shingle blocking key); a *mixed* pair whose overlap is
    pure boilerplate is exactly the pair a dedup pipeline should skip.
    """
    sh = _shingled(docs, n)
    ex = _drop_heavy_shingles(sh.select('doc_id', F.explode('shingle_set').alias('s')), df_cap)
    a, b = ex.alias('a'), ex.alias('b')
    cand = (
        a.join(b, (F.col('a.s') == F.col('b.s')) & (F.col('a.doc_id') < F.col('b.doc_id')))
        .select(F.col('a.doc_id').alias('doc_a'), F.col('b.doc_id').alias('doc_b'))
        .distinct()
    )
    sa = sh.select(F.col('doc_id').alias('doc_a'), F.col('shingle_set').alias('set_a'))
    sb = sh.select(F.col('doc_id').alias('doc_b'), F.col('shingle_set').alias('set_b'))
    inter = F.size(F.array_intersect('set_a', 'set_b'))
    union = F.size('set_a') + F.size('set_b') - inter
    return (
        cand.join(sa, 'doc_a').join(sb, 'doc_b')
        .select(
            'doc_a', 'doc_b',
            pround(inter.cast('double') / union, 4).alias('jaccard'),
        )
        .filter(F.col('jaccard') >= threshold)
    )


def minhash_signatures(docs: DataFrame, k: int = 16, n: int = 3, hash_fn=hash60) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT> length k): sig[i] = min over shingles of
    the i-th affine universal hash of ONE base hash per shingle
    (:func:`texthash.minhash_affine_constants` — k permutations of the
    31-bit space from a single md5, 16x less hashing than k independent
    hash calls). Docs with no shingles are dropped (they cannot collide
    meaningfully).

    ``hash_fn`` (the base hash) defaults to the md5-derived :func:`hash60`
    so the DuckDB oracle can replay it bit-for-bit; production deployments
    pass ``F.xxhash64`` (identical operator shape — quantified in
    bench.py's ``dedup_minhash_lsh_xxh64``).
    """
    from scalpel_spark.functions.texthash import MERSENNE31, minhash_affine_constants

    sh = _shingled(docs, n).filter(F.size('shingle_set') > 0)
    ex = sh.select('doc_id', F.explode('shingle_set').alias('s'))
    # ONE base hash per exploded row, k affine columns of the SAME rows →
    # one groupBy with k MIN aggregates (map-side partial), instead of a
    # k-way explode that multiplies the shuffle k times
    based = ex.select(
        'doc_id', F.pmod(hash_fn(F.col('s')), F.lit(MERSENNE31)).alias('hb')
    )
    hashed = based.select(
        'doc_id',
        *[F.pmod(F.lit(a) * F.col('hb') + F.lit(b), F.lit(MERSENNE31)).alias(f'h{i}')
          for i, (a, b) in enumerate(minhash_affine_constants(k))],
    )
    agg = hashed.groupBy('doc_id').agg(*[F.min(f'h{i}').alias(f'm{i}') for i in range(k)])
    return agg.select('doc_id', F.array(*[F.col(f'm{i}') for i in range(k)]).alias('sig'))


def minhash_lsh_pairs(docs: DataFrame, k: int = 16, bands: int = 4, n: int = 3,
                      min_matches: int = 8, hash_fn=hash60) -> DataFrame:
    """MinHash + LSH banding near-dup candidates.

    sig (length k) is cut into ``bands`` bands of k/bands rows; docs sharing
    any band bucket become candidates; candidates are scored by the number
    of equal minhashes (integer — exact across engines). Returns
    (doc_a, doc_b, matches) with matches >= min_matches, doc_a < doc_b.
    ``hash_fn``: see :func:`minhash_signatures`.
    """
    rows = k // bands
    sig = minhash_signatures(docs, k, n, hash_fn)
    banded = sig.select(
        'doc_id', 'sig',
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias('band'),
    ).select(
        'doc_id', 'sig', 'band',
        F.concat_ws(',', F.slice('sig', F.col('band') * rows + 1, rows)).alias('bucket'),
    )
    a = banded.select('band', 'bucket', F.col('doc_id').alias('doc_a'), F.col('sig').alias('sig_a'))
    b = banded.select('band', 'bucket', F.col('doc_id').alias('doc_b'), F.col('sig').alias('sig_b'))
    # matches is a per-PAIR constant, so it is computed on the band-join
    # output BEFORE any pair-level exchange and the sub-threshold collisions
    # are dropped right there: the pair-dedup shuffle then moves only
    # (doc_a, doc_b, matches) — 20 B/row — instead of the former
    # distinct() over rows still carrying both k-long signature arrays
    # (~270 B/row), and only for pairs that already pass min_matches.
    # groupBy/max over the duplicate band collisions replaces distinct()
    # (max of a constant = the constant; same single shuffle, slim rows).
    matches = F.size(
        F.filter(
            F.zip_with('sig_a', 'sig_b', lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        a.join(b, ['band', 'bucket'])
        .filter(F.col('doc_a') < F.col('doc_b'))
        .select('doc_a', 'doc_b', matches.alias('matches'))
        .filter(F.col('matches') >= min_matches)
        .groupBy('doc_a', 'doc_b')
        .agg(F.max('matches').alias('matches'))
    )


def minhash_pairs_against_index(new_docs: DataFrame, index_sigs: DataFrame,
                                k: int = 16, bands: int = 4, n: int = 3,
                                min_matches: int = 8, hash_fn=hash60) -> DataFrame:
    """Incremental near-dup detection: candidates between a NEW document
    batch and a persisted signature index (``minhash_signatures`` output of
    the already-ingested corpus), WITHOUT re-pairing the index against
    itself — the daily-crawl → training-corpus flow, where re-running the
    full self-join over 10^10 historical docs per increment is the classic
    scale mistake.

    Returns (new_doc_id, index_doc_id, matches) with
    ``matches >= min_matches`` equal minhash positions. Same banding and
    affine family as :func:`minhash_lsh_pairs`, so a signature table
    written once keeps serving every future increment; append the new
    batch's signatures to the index afterwards.

    Scale shape: signatures are slim (k BIGINTs), the band join shuffles
    on (band, bucket) with partial filtering before the pair-dedup
    exchange (same 20 B/row discipline as the self-join variant). Index
    re-signing cost: zero — only the new batch is shingled/hashed.
    """
    rows = k // bands

    def banded(sigs: DataFrame, id_alias: str, sig_alias: str) -> DataFrame:
        return sigs.select(
            F.col('doc_id').alias(id_alias), F.col('sig').alias(sig_alias),
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias('band'),
        ).select(
            id_alias, sig_alias, 'band',
            F.concat_ws(',', F.slice(sig_alias, F.col('band') * rows + 1, rows)).alias('bucket'),
        )

    a = banded(minhash_signatures(new_docs, k, n, hash_fn), 'new_doc_id', 'sig_a')
    b = banded(index_sigs, 'index_doc_id', 'sig_b')
    matches = F.size(
        F.filter(
            F.zip_with('sig_a', 'sig_b', lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        a.join(b, ['band', 'bucket'])
        .select('new_doc_id', 'index_doc_id', matches.alias('matches'))
        .filter(F.col('matches') >= min_matches)
        .groupBy('new_doc_id', 'index_doc_id')
        .agg(F.max('matches').alias('matches'))
    )


def simhash_fingerprints(docs: DataFrame, bits: int = SIMHASH_BITS, hash_fn=hash60) -> DataFrame:
    """32-bit SimHash per doc over distinct whitespace tokens.

    bit j of the fingerprint is 1 iff sum over tokens of
    (2*((hash_fn(tok) >> j) & 1) - 1) > 0. One explode + one groupBy with
    ``bits`` generated SUM expressions — a single shuffle, no bit blow-up.
    ``hash_fn``: see :func:`minhash_signatures` (md5-portable default,
    ``F.xxhash64`` in production).
    """
    ex = docs.select(
        'doc_id',
        F.explode(F.array_distinct(tokens(F.col('text')))).alias('tok'),
    ).select('doc_id', hash_fn(F.col('tok')).alias('h'))
    sums = [
        F.sum(F.shiftright(F.col('h'), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f'b{j}')
        for j in range(bits)
    ]
    agg = ex.groupBy('doc_id').agg(*sums)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f'b{j}') > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select('doc_id', fp.cast('long').alias('simhash'))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 8-bit bands
    (pigeonhole: distance <= 3 over 4 bands guarantees one exact band)."""
    fps = simhash_fingerprints(docs, bits)
    n_bands = 4
    width = bits // n_bands
    banded = fps.select(
        'doc_id', 'simhash',
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias('band'),
    ).withColumn(
        # python F.shiftright needs a literal count; SQL shiftright takes a column
        'bucket',
        F.expr(f'shiftright(simhash, band * {width}) & {(1 << width) - 1}'),
    )
    a = banded.select('band', 'bucket', F.col('doc_id').alias('doc_a'), F.col('simhash').alias('fp_a'))
    b = banded.select('band', 'bucket', F.col('doc_id').alias('doc_b'), F.col('simhash').alias('fp_b'))
    return (
        a.join(b, ['band', 'bucket'])
        .filter(F.col('doc_a') < F.col('doc_b'))
        .select('doc_a', 'doc_b', F.bit_count(F.col('fp_a').bitwiseXOR(F.col('fp_b'))).alias('hamming'))
        .distinct()
        .filter(F.col('hamming') <= max_hamming)
    )


def embedding_duplicates(emb: DataFrame, threshold: float = 0.98) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by the ``label`` column
    (an IVF-style coarse cell that arrives with the data — no quantization
    happens here; the integer-quantized assignment lives in
    ``similarity.lsh_buckets`` / ``similarity.ivf_assignments``). The
    cosine is double-precision, rounded at fixed precision for engine
    portability. Returns (vec_a, vec_b, cosine) with vec_a < vec_b,
    cosine >= threshold.
    """
    v = emb.select('vec_id', 'label', F.col('embedding').cast('array<double>').alias('e'))
    a = v.select(F.col('vec_id').alias('vec_a'), 'label', F.col('e').alias('ea'))
    b = v.select(F.col('vec_id').alias('vec_b'), 'label', F.col('e').alias('eb'))
    dot = F.aggregate(F.zip_with('ea', 'eb', lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform('ea', lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform('eb', lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return (
        a.join(b, 'label')
        .filter(F.col('vec_a') < F.col('vec_b'))
        .select('vec_a', 'vec_b', pround(dot / (na * nb), 6).alias('cosine'))
        .filter(F.col('cosine') >= threshold)
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 25,
                       algorithm: str = 'label') -> DataFrame:
    """Connected components over a near-dup pair list: the transitive
    closure the pair operators deliberately do not compute. A
    keep-one-drop-rest dedup decision needs *clusters*, not pairs —
    A~B and B~C must land in ONE cluster even when the A~C pair was never
    emitted (chained near-dups are the norm under boilerplate drift).

    Two interchangeable algorithms (identical output):

    * ``'label'`` (default) — min-label propagation to fixpoint. Every doc
      starts labelled with its own id; each round every doc takes the min
      of its own label and its neighbors' labels. Converges in
      O(component diameter) rounds — near-dup graphs are dense blobs with
      tiny diameters (a c-doc duplicate cluster is a near-clique,
      diameter ~1-2), so the round count is small in practice.
    * ``'star'`` — the alternating large-star/small-star edge transform
      (Kiveris et al., "Connected Components in MapReduce and Beyond"),
      which contracts the graph toward stars in O(log n) rounds
      regardless of diameter — the safe choice when the pair graph may
      contain adversarial long chains.

    Scale shape (100 TB corpus, 1000 executors): the loop runs over the
    *pair graph*, which is orders of magnitude smaller than the corpus
    (only near-dup docs appear). Per round: one shuffle join + one
    min-aggregation ('label'), or two groupBy+join star transforms
    ('star') — all on the edge list. ``localCheckpoint`` after every
    round truncates lineage so the plan stays O(1) deep instead of
    O(rounds); convergence is detected with ``limit(1).count()`` probes
    (early-exit executor-side, no full scan collected).

    Returns (doc_id, cluster_id = min doc_id of the component) for every
    doc that appears in a pair. Raises ``RuntimeError`` if not converged
    within ``max_iter`` — an unconverged labelling silently under-merges,
    which for dedup means shipping duplicates into a training set.

    Reference parity note: the reference dedups URLs only, with an
    in-memory set (``scalpel/any_io/static_spider.py:100-106``); content
    clustering is part of the LLM-pipeline layer this engine adds.
    """
    if algorithm == 'star':
        return _star_components(pairs, max_iter)
    if algorithm != 'label':
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    edges = (
        pairs.select(F.col(pairs.columns[0]).alias('src'), F.col(pairs.columns[1]).alias('dst'))
        .union(pairs.select(F.col(pairs.columns[1]), F.col(pairs.columns[0])))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col('src').alias('doc_id')).distinct()
        .withColumn('cluster_id', F.col('doc_id'))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col('dst').alias('doc_id'))
            .agg(F.min('cluster_id').alias('nbr_min'))
        )
        stepped = (
            labels.withColumnRenamed('cluster_id', 'old')
            .join(nbr_min, 'doc_id', 'left')
            .select(
                'doc_id', 'old',
                F.least('old', F.coalesce('nbr_min', 'old')).alias('cluster_id'),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col('cluster_id') != F.col('old')).limit(1).count()
        labels = stepped.select('doc_id', 'cluster_id')
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f'duplicate_clusters did not converge in {max_iter} rounds; '
            'the pair graph has a longer path than expected — raise max_iter '
            "or switch to algorithm='star'"
        )
    return labels


def _star_components(pairs: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components over directed
    large→small edges (Kiveris et al.). Each round:

    * large-star — for every node u with m(u) = min(Γ(u) ∪ {u}), rewire
      every *larger* neighbor v > u to m(u);
    * small-star — for every node u over its smaller neighbors
      Γ⁻(u), with m = min(Γ⁻(u)), rewire u and each v ∈ Γ⁻(u) \\ {m}
      to m.

    Both transforms preserve connectivity and strictly contract toward
    star graphs rooted at the component minimum; the edge set is a
    fixpoint exactly when the graph is a union of stars, so convergence
    is checked as set equality (two ``exceptAll … limit(1)`` probes).
    Rounds are O(log n) in the component size, independent of diameter.
    """
    a, b = (F.col(pairs.columns[0]), F.col(pairs.columns[1]))
    cur = (
        pairs.select(F.greatest(a, b).alias('src'), F.least(a, b).alias('dst'))
        .filter(F.col('src') != F.col('dst'))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        sym = cur.union(cur.select(F.col('dst').alias('src'), F.col('src').alias('dst')))
        m_large = sym.groupBy('src').agg(F.min('dst').alias('mn'))
        large = (
            sym.join(m_large, 'src')
            .filter(F.col('dst') > F.col('src'))
            .select(F.col('dst').alias('src'),
                    F.least('src', 'mn').alias('dst'))
            .distinct()
        )
        m_small = large.groupBy('src').agg(F.min('dst').alias('m'))
        small = (
            large.join(m_small, 'src')
            .filter(F.col('dst') != F.col('m'))
            .select(F.col('dst').alias('src'), F.col('m').alias('dst'))
            .union(m_small.select('src', F.col('m').alias('dst')))
            .distinct()
            .localCheckpoint()
        )
        changed = (small.exceptAll(cur).limit(1).count()
                   + cur.exceptAll(small).limit(1).count())
        cur = small
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f'duplicate_clusters(star) did not converge in {max_iter} rounds')
    roots = (
        cur.select('dst').distinct()
        .join(cur.select(F.col('src').alias('dst')).distinct(), 'dst', 'left_anti')
    )
    return (
        cur.select(F.col('src').alias('doc_id'), F.col('dst').alias('cluster_id'))
        .union(roots.select(F.col('dst').alias('doc_id'), F.col('dst').alias('cluster_id')))
    )


def cluster_canonical(pairs: DataFrame, max_iter: int = 25,
                      algorithm: str = 'label') -> DataFrame:
    """Keep-one-drop-rest over near-dup clusters: components from
    :func:`duplicate_clusters`, canonical doc = min doc_id (== cluster_id
    by construction, under either algorithm).

    Returns (doc_id, cluster_id, cluster_size, is_canonical) — the
    training-pipeline contract: ``filter(is_canonical = 1)`` keeps exactly
    one representative per duplicate cluster, and joining the complement
    back to the corpus drops the rest. Cluster sizes come from one extra
    aggregation over the (small) label table.
    """
    labels = duplicate_clusters(pairs, max_iter, algorithm)
    sizes = labels.groupBy('cluster_id').agg(F.count('*').alias('cluster_size'))
    return (
        labels.join(sizes, 'cluster_id')
        .select(
            'doc_id', 'cluster_id', 'cluster_size',
            (F.col('doc_id') == F.col('cluster_id')).cast('int').alias('is_canonical'),
        )
    )


def containment_pairs(docs: DataFrame, n: int = 4, threshold: float = 0.9,
                      df_cap: int = 100) -> DataFrame:
    """Asymmetric near-dup detection: containment(a ⊂ b) = |A∩B| / |A|
    over n-gram shingle sets — catches a short document wholly embedded in
    a longer one, where symmetric Jaccard stays low. Same df-capped
    shared-shingle blocking as :func:`ngram_jaccard_pairs` (see
    :func:`_drop_heavy_shingles` — bounded candidates under boilerplate);
    emits ordered (contained, container) pairs.
    Returns (doc_contained, doc_container, containment).
    """
    sh = _shingled(docs, n).filter(F.size('shingle_set') > 0)
    ex = _drop_heavy_shingles(sh.select('doc_id', F.explode('shingle_set').alias('s')), df_cap)
    a, b = ex.alias('a'), ex.alias('b')
    cand = (
        a.join(b, (F.col('a.s') == F.col('b.s')) & (F.col('a.doc_id') != F.col('b.doc_id')))
        .select(F.col('a.doc_id').alias('doc_contained'), F.col('b.doc_id').alias('doc_container'))
        .distinct()
    )
    sa = sh.select(F.col('doc_id').alias('doc_contained'), F.col('shingle_set').alias('set_a'))
    sb = sh.select(F.col('doc_id').alias('doc_container'), F.col('shingle_set').alias('set_b'))
    inter = F.size(F.array_intersect('set_a', 'set_b'))
    return (
        cand.join(sa, 'doc_contained').join(sb, 'doc_container')
        .select(
            'doc_contained', 'doc_container',
            pround(inter.cast('double') / F.size('set_a'), 4).alias('containment'),
        )
        .filter(F.col('containment') >= threshold)
    )
