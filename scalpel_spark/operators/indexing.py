"""Search-index construction operators: inverted-index champion lists,
anchor-text aggregation over the link graph, and collocation mining.

These are the index-build stages a crawl corpus feeds next — the reference
stops at item extraction (scalpel core/spider.py:92 hands parsed items to
processors and is done), but a production crawl's items flow straight into
an indexer, so the engine ships the three classic index builds as
first-class operators. All arithmetic is engine-portable integer algebra
(DuckDB-oracle-checkable): counts are exact longs, association scores are
parts-per-million via DECIMAL integral division (never FLOOR of a true
division — see graphrank._l1_normalized for why HALF_UP at 1e-6 breaks
bit parity).

Scale shape at 100 TB:

* :func:`champion_postings` — the per-term rows are produced by ONE
  partial-agg shuffle on (term, doc); the per-term top-k is computed in
  two phases (salted local top-k, then top-k of k·n_salts survivors) so
  a stopword term with billions of postings never lands in one window
  task. This is the standard "champion list" / impact-ordered index
  pruning from IR (Manning, Raghavan & Schütze ch. 7).
* :func:`anchor_terms` — one groupBy(dst, term) shuffle over the link
  rows; the per-target window ranks at most |vocabulary| rows per target.
  Anchor text is the strongest ranking signal a crawler owns (it is
  OTHER sites' descriptions of the target), which is why every web-scale
  indexer aggregates it target-side.
* :func:`collocations` — two partial-agg shuffles (unigrams, bigrams)
  plus two vocabulary-sized joins that AQE broadcasts when small; the
  Dice score is bounded in [0, 1e6] ppm so no quotient can overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import tokens, word_shingles


def champion_postings(docs: DataFrame, k: int = 5, n_salts: int = 8,
                      text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """Inverted-index champion lists: for every term, the ``k`` documents
    with the highest term frequency, plus the term's document frequency
    and collection frequency.

    Returns (tok, df, cf, rank, doc_id, tf) — one row per (term, champion),
    rank 1..k ordered by (tf DESC, doc_id ASC); ``df`` counts distinct
    docs containing the term, ``cf`` its total occurrences.

    Skew: a stopword's posting list is a constant fraction of the corpus,
    so a single ``Window.partitionBy(tok)`` would put billions of rows in
    one task at 100 TB. The top-k is therefore two-phase: rows are salted
    into ``n_salts`` sub-partitions, each ranks locally, and only the
    ≤ k·n_salts local winners reach the per-term window. The result is
    provably salt-invariant: (tf DESC, doc_id ASC) is a total order, and
    any row in the global top-k is in its own salt's local top-k. The
    salt hash never touches output values, so any partitioner works.
    """
    tf = (
        docs.select(F.col(id_col).alias('doc_id'),
                    F.explode(tokens(F.col(text_col))).alias('tok'))
        .groupBy('tok', 'doc_id')
        .agg(F.count('*').alias('tf'))
    )
    stats = tf.groupBy('tok').agg(
        F.count('*').alias('df'),
        F.sum('tf').alias('cf'),
    )
    local_w = Window.partitionBy('tok', '_salt').orderBy(
        F.col('tf').desc(), F.col('doc_id').asc())
    cand = (
        tf.withColumn('_salt', F.pmod(F.hash('doc_id'), F.lit(n_salts)))
        .withColumn('_r', F.row_number().over(local_w))
        .filter(F.col('_r') <= k)
        .drop('_salt', '_r')
    )
    global_w = Window.partitionBy('tok').orderBy(
        F.col('tf').desc(), F.col('doc_id').asc())
    top = (
        cand.withColumn('rank', F.row_number().over(global_w))
        .filter(F.col('rank') <= k)
    )
    return top.join(stats, 'tok').select(
        'tok', F.col('df').cast('long').alias('df'),
        F.col('cf').cast('long').alias('cf'),
        F.col('rank').cast('int').alias('rank'),
        'doc_id', F.col('tf').cast('long').alias('tf'),
    )


def anchor_terms(links: DataFrame, k: int = 3, dst_col: str = 'dst',
                 term_col: str = 'term') -> DataFrame:
    """Target-side anchor-text aggregation: for every link target, the
    ``k`` most frequent anchor terms pointing at it.

    Input is one row per (link, anchor term) — the parse stage's link
    spans joined with their anchor tokens. Returns
    (dst, term, n_refs, rank), rank 1..k by (n_refs DESC, term ASC).

    One partial-agg shuffle on (dst, term); the per-target window ranks
    at most |vocabulary| rows per target (anchor vocab, not corpus size),
    so no salting is needed — in-degree skew collapses map-side in the
    partial aggregation before the exchange.
    """
    agg = (
        links.groupBy(F.col(dst_col).alias('dst'),
                      F.col(term_col).alias('term'))
        .agg(F.count('*').alias('n_refs'))
    )
    w = Window.partitionBy('dst').orderBy(
        F.col('n_refs').desc(), F.col('term').asc())
    return (
        agg.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('dst', 'term', F.col('n_refs').cast('long').alias('n_refs'),
                F.col('rank').cast('int').alias('rank'))
    )


def collocations(docs: DataFrame, min_count: int = 2,
                 text_col: str = 'text') -> DataFrame:
    """Adjacent-bigram collocation mining scored by the Dice coefficient
    in exact integer ppm: dice_ppm = (2 · n_ab · 10^6) div (n_a + n_b).

    Returns (bigram, n_ab, n_a, n_b, dice_ppm) for bigrams seen at least
    ``min_count`` times; n_a / n_b are corpus unigram counts of the
    bigram's words. Dice rather than PMI because it is bounded — PMI of
    a hapax pair is T²/(B·1) which overflows int64 on a trillion-token
    corpus, while 2·n_ab/(n_a+n_b) ∈ [0, 1] always fits ppm in a long.
    The multiply runs in DECIMAL(28,0) so 2·n_ab·10^6 cannot wrap even
    with n_ab ~ 10^13; integral ``div`` gives the exact truncated
    quotient (DuckDB ``//`` twin — same convention as graphrank).
    """
    toks_df = docs.select(tokens(F.col(text_col)).alias('toks'))
    uni = (
        toks_df.select(F.explode('toks').alias('tok'))
        .groupBy('tok').agg(F.count('*').alias('n'))
    )
    bg = (
        toks_df.select(F.explode(word_shingles(F.col('toks'), 2)).alias('bigram'))
        .groupBy('bigram').agg(F.count('*').alias('n_ab'))
        .filter(F.col('n_ab') >= min_count)
        .withColumn('w1', F.element_at(F.split('bigram', ' '), 1))
        .withColumn('w2', F.element_at(F.split('bigram', ' '), 2))
    )
    dice = ('CAST(CAST(n_ab AS DECIMAL(28,0)) * 2000000'
            ' div CAST(n_a + n_b AS DECIMAL(19,0)) AS BIGINT)')
    return (
        bg.join(uni.select(F.col('tok').alias('w1'), F.col('n').alias('n_a')), 'w1')
        .join(uni.select(F.col('tok').alias('w2'), F.col('n').alias('n_b')), 'w2')
        .select('bigram', F.col('n_ab').cast('long').alias('n_ab'),
                F.col('n_a').cast('long').alias('n_a'),
                F.col('n_b').cast('long').alias('n_b'),
                F.expr(dice).alias('dice_ppm'))
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1_milli: int = 1200, b_milli: int = 750, n_salts: int = 8,
              text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """BM25 top-k retrieval over the corpus — the query-time half of the
    inverted index that :func:`champion_postings` builds (Robertson &
    Spärck Jones probabilistic relevance framework; Okapi BM25 with
    k1 = ``k1_milli``/1000, b = ``b_milli``/1000).

    ``queries`` is (query_id, query_text); scoring sums over the query's
    DISTINCT terms. All arithmetic is engine-portable scaled-integer
    algebra (the collocations/graphrank convention — DECIMAL multiply +
    integral ``div``, DuckDB ``//`` twin), so scores are bit-identical
    across engines and never see float rounding:

    * ``avgdl_milli = (Σ dl · 1000) div N``
    * ``norm_milli  = 1000 − b_milli + (b_milli · ratio_milli) div 1000``
      with ``ratio_milli = (dl · 10^6) div avgdl_milli``
    * ``tfpart_ppm  = (tf · (1000 + k1_milli) · 10^6)
      div (tf · 1000 + (k1_milli · norm_milli) div 1000)``
    * ``idf_milli   = ((N + 1) · 1000) div df`` — the same rational idf
      surrogate as ``textops.tfidf_keywords`` (monotone in 1/df; the
      logarithmic damping is irrelevant to ranking parity and ln() is
      not bit-reproducible across engines)
    * ``score_micro = Σ_t (idf_milli · tfpart_ppm) div 1000``

    Returns (query_id, rank, doc_id, score_micro), rank 1..k by
    (score_micro DESC, doc_id ASC).

    Scale shape: tf/df/dl come from the same ONE partial-agg shuffle as
    the index build; query terms are broadcast (a query workload is tiny
    next to the corpus); the per-query top-k is two-phase salted like
    :func:`champion_postings` so a stopword query never collapses its
    whole candidate set into one window task. DECIMAL(38,0) intermediates
    keep idf · tfpart exact past 10^10 docs.
    """
    tf = (
        docs.select(F.col(id_col).alias('doc_id'),
                    F.explode(tokens(F.col(text_col))).alias('tok'))
        .groupBy('doc_id', 'tok')
        .agg(F.count('*').alias('tf'))
    )
    dl = tf.groupBy('doc_id').agg(F.sum('tf').alias('dl'))
    dfreq = tf.groupBy('tok').agg(F.count('*').alias('df'))
    totals = dl.agg(
        F.count('*').alias('n_docs'),
        F.sum('dl').alias('total_dl'),
    ).select(
        'n_docs',
        F.expr('CAST(CAST(total_dl AS DECIMAL(28,0)) * 1000'
               ' div CAST(n_docs AS DECIMAL(19,0)) AS BIGINT)')
        .alias('avgdl_milli'),
    )

    qterms = (
        queries.select('query_id',
                       F.explode(tokens(F.col('query_text'))).alias('tok'))
        .distinct()
    )

    cand = (
        tf.join(F.broadcast(qterms), 'tok')
        .join(dl, 'doc_id')
        .join(dfreq, 'tok')
        .crossJoin(F.broadcast(totals))
    )
    ratio = ('CAST(CAST(dl AS DECIMAL(28,0)) * 1000000'
             ' div CAST(avgdl_milli AS DECIMAL(19,0)) AS BIGINT)')
    cand = cand.withColumn('ratio_milli', F.expr(ratio))
    cand = cand.withColumn(
        'norm_milli',
        F.lit(1000 - b_milli)
        + F.expr(f'CAST(CAST({b_milli} AS DECIMAL(28,0)) * ratio_milli'
                 ' div CAST(1000 AS DECIMAL(19,0)) AS BIGINT)'))
    tfpart = (f'CAST(CAST(tf AS DECIMAL(28,0)) * {1000 + k1_milli} * 1000000'
              f' div CAST(tf * 1000 + (CAST({k1_milli} AS DECIMAL(28,0))'
              ' * norm_milli div CAST(1000 AS DECIMAL(19,0)))'
              ' AS DECIMAL(28,0)) AS BIGINT)')
    idf = ('CAST(CAST(n_docs + 1 AS DECIMAL(28,0)) * 1000'
           ' div CAST(df AS DECIMAL(19,0)) AS BIGINT)')
    term_score = ('CAST(CAST(idf_milli AS DECIMAL(38,0)) * tfpart_ppm'
                  ' div CAST(1000 AS DECIMAL(19,0)) AS BIGINT)')
    scored = (
        cand.withColumn('tfpart_ppm', F.expr(tfpart))
        .withColumn('idf_milli', F.expr(idf))
        .withColumn('term_score', F.expr(term_score))
        .groupBy('query_id', 'doc_id')
        .agg(F.sum('term_score').alias('score_micro'))
    )
    local_w = Window.partitionBy('query_id', '_salt').orderBy(
        F.col('score_micro').desc(), F.col('doc_id').asc())
    pruned = (
        scored.withColumn('_salt', F.pmod(F.hash('doc_id'), F.lit(n_salts)))
        .withColumn('_r', F.row_number().over(local_w))
        .filter(F.col('_r') <= k)
        .drop('_salt', '_r')
    )
    global_w = Window.partitionBy('query_id').orderBy(
        F.col('score_micro').desc(), F.col('doc_id').asc())
    return (
        pruned.withColumn('rank', F.row_number().over(global_w))
        .filter(F.col('rank') <= k)
        .select('query_id', F.col('rank').cast('int').alias('rank'),
                'doc_id', F.col('score_micro').cast('long').alias('score_micro'))
    )
