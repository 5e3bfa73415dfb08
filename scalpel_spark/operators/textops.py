"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM column algebra (whole-stage codegen; no Python UDFs), with
DuckDB-oracle-portable arithmetic: integer hashes from
``functions/texthash.py``, float outputs rounded at fixed precision.
One carve-out: :func:`normalize_unicode` uses an Arrow-batched pandas
UDF (Spark has no JVM Unicode normalizer) — the same sanctioned lane as
URL canonicalization, listed in the plan auditor's PANDAS_OK set.

At 100 TB these are embarrassingly parallel map-side transforms — zero
shuffles except the final (tiny) per-language aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scalpel_spark.functions.texthash import (
    MERSENNE31,
    hash60,
    pround,
    tokens,
    word_shingles,
)

# stopword marker sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    'en': ('the', 'a', 'of'),
    'es': ('el', 'la', 'de'),
    'fr': ('le', 'la', 'de'),
    'de': ('der', 'die', 'das'),
    'zh': (),  # no-space CJK text would be detected by char-class ratio
}
STOPWORDS = ('the', 'a', 'of', 'and', 'to', 'in')


def _count_token(text: Column, tok: str) -> Column:
    """Exact occurrences of ``tok`` as a whitespace token.
    DuckDB twin: ``len(list_filter(string_split(text, ' '), t -> t = 'tok'))``."""
    return F.size(F.filter(tokens(text), lambda t: t == F.lit(tok))).cast('long')


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language heuristic: score each candidate language by
    its marker-token count; predict the best-scoring one (ties broken by
    language code order), 'und' when no marker hits.

    Returns (doc_id, lang, pred_lang).
    """
    scores = {
        lang: sum_cols([_count_token(F.col('text'), m) for m in marks])
        for lang, marks in LANG_MARKERS.items()
        if marks
    }
    ordered = sorted(scores)  # deterministic tie-break: alphabetical
    best_score = F.greatest(*[scores[lang] for lang in ordered])
    pred = F.lit('und')
    for lang in reversed(ordered):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit('und'))
    return docs.select('doc_id', 'lang', pred.alias('pred_lang'))


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def quality_feature_cols(text: Column) -> dict[str, Column]:
    """The quality feature expressions over a text column, unrounded —
    shared by :func:`quality_scores` and the curation pipeline so the
    composite score is one definition, not two.

    * n_tokens — whitespace token count
    * mean_token_len — avg token length
    * stopword_ratio — stopword tokens / tokens
    * distinct_ratio — distinct tokens / tokens (repetition penalty)
    * score = 0.4*min(n_tokens/100,1) + 0.3*distinct_ratio
              + 0.2*min(stopword_ratio*5,1) + 0.1*min(mean_token_len/8,1)
    """
    toks = tokens(text)
    n = F.size(toks).cast('double')
    mean_len = (F.length(text) - (F.size(toks) - 1)).cast('double') / n
    stop = sum_cols([_count_token(text, s) for s in STOPWORDS]).cast('double')
    distinct_ratio = F.size(F.array_distinct(toks)).cast('double') / n
    stop_ratio = stop / n
    score = (
        F.lit(0.4) * F.least(n / 100.0, F.lit(1.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.2) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.1) * F.least(mean_len / 8.0, F.lit(1.0))
    )
    return {
        'n_tokens': F.size(toks).cast('long'),
        'mean_token_len': mean_len,
        'stopword_ratio': stop_ratio,
        'distinct_ratio': distinct_ratio,
        'score': score,
    }


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + composite score (rounded, double); see
    :func:`quality_feature_cols` for the feature definitions."""
    feats = quality_feature_cols(F.col('text'))
    return docs.select(
        'doc_id',
        feats['n_tokens'].alias('n_tokens'),
        pround(feats['mean_token_len'], 4).alias('mean_token_len'),
        pround(feats['stopword_ratio'], 4).alias('stopword_ratio'),
        pround(feats['distinct_ratio'], 4).alias('distinct_ratio'),
        pround(feats['score'], 4).alias('score'),
    )


def repetition_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style repetitious-text
    rules): documents dominated by one token or by repeated n-grams are
    boilerplate/spam and get filtered before training.

    * ``top_token_frac`` — occurrences of the most frequent token / total
      tokens (rounded at 4 digits);
    * ``dup_ngram_frac`` — 1 − distinct n-grams / total n-grams, i.e. the
      share of n-gram slots occupied by a repeat (0.0 when the doc has
      fewer than ``n`` tokens);
    * ``n_tokens`` — whitespace token count.

    Scale shape: ``dup_ngram_frac`` is pure map-side array algebra; the
    token mode needs a (doc_id, token) count — explode + two partial-agg
    groupBys, then a co-partitioned join on doc_id. No all-pairs work,
    both shuffles carry slim (id, token/count) projections.
    """
    tok_df = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    grams = word_shingles(F.col('toks'), n)
    mapside = tok_df.select(
        'doc_id',
        F.when(
            F.size(grams) > 0,
            pround(
                F.lit(1.0)
                - F.size(F.array_distinct(grams)).cast('double') / F.size(grams),
                4,
            ),
        ).otherwise(F.lit(0.0)).alias('dup_ngram_frac'),
    )
    counts = (
        tok_df.select('doc_id', F.explode('toks').alias('tok'))
        .groupBy('doc_id', 'tok').agg(F.count('*').alias('c'))
    )
    top = counts.groupBy('doc_id').agg(
        F.max('c').alias('max_tok'),
        F.sum('c').alias('n_tokens'),
    )
    return top.join(mapside, 'doc_id').select(
        'doc_id',
        pround(F.col('max_tok').cast('double') / F.col('n_tokens'), 4)
        .alias('top_token_frac'),
        'dup_ngram_frac',
        F.col('n_tokens').cast('long').alias('n_tokens'),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Per-language token statistics: whitespace tokens and a BPE-ish
    subword proxy (4-char pieces, ceil(len/4) per token) — the unit budget
    a training pipeline actually meters.

    Returns (lang, n_docs, total_tokens, total_subwords, avg_tokens).
    """
    toks = tokens(F.col('text'))
    subwords = F.aggregate(
        toks, F.lit(0).cast('long'),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast('long'),
    )
    per_doc = docs.select('lang', F.size(toks).cast('long').alias('nt'), subwords.alias('ns'))
    return per_doc.groupBy('lang').agg(
        F.count('*').alias('n_docs'),
        F.sum('nt').alias('total_tokens'),
        F.sum('ns').alias('total_subwords'),
        pround(F.avg('nt'), 4).alias('avg_tokens'),
    )


def corpus_freq_scores(docs: DataFrame) -> DataFrame:
    """Corpus-frequency rarity scores — the integer-exact proxy for the
    CCNet-style LM-perplexity quality filter: documents whose tokens are
    rare corpus-wide (low mean frequency) are either high-information or
    gibberish; both ends get human/classifier review in a real pipeline.

    All arithmetic is integer (parts-per-million via ``div``) so rankings
    are bit-identical across engines — no float log whose last ulp could
    differ between libm implementations.

    * ``avg_token_freq_ppm`` — mean over the doc's token occurrences of
      floor(corpus_count(token) * 1e6 / total_tokens)
    * ``min_token_freq_ppm`` — the doc's rarest token's ppm
    * ``n_tokens``

    Scale shape: one explode + token-count aggregation (partial-agg
    collapses within-doc repeats map-side), a shuffle join back on the
    token (both sides token-partitioned), a broadcast of the single-row
    total, and a final groupBy(doc_id). No driver collects — the corpus
    total rides a broadcast cross join.
    """
    tok = docs.select('doc_id', F.explode(tokens(F.col('text'))).alias('tok'))
    counts = tok.groupBy('tok').agg(F.count('*').alias('cnt'))
    total = counts.agg(F.sum('cnt').alias('total_toks'))
    per = (
        tok.join(counts, 'tok')
        .crossJoin(F.broadcast(total))
        .withColumn('freq_ppm', F.expr('(cnt * 1000000) div total_toks'))
    )
    return per.groupBy('doc_id').agg(
        F.count('*').alias('n_tokens'),
        F.expr('sum(freq_ppm) div count(*)').alias('avg_token_freq_ppm'),
        F.min('freq_ppm').alias('min_token_freq_ppm'),
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k keywords per document by an integer tf-idf variant:
    score = tf × ((n_docs × 1e6) div df) — the unlogged inverse document
    frequency in ppm, kept in int64 so ranking is engine-exact (ties break
    on the token string). At web scale swap the score expression for
    log-idf doubles — the plan (two partial-agg shuffles, one token join,
    one per-doc window) is identical.

    Returns (doc_id, keyword, rank, score).
    """
    tok = docs.select('doc_id', F.explode(tokens(F.col('text'))).alias('tok'))
    tf = tok.groupBy('doc_id', 'tok').agg(F.count('*').alias('tf'))
    dfreq = tf.groupBy('tok').agg(F.count('*').alias('df'))
    ndocs = docs.agg(F.count('*').alias('n_docs'))
    scored = (
        tf.join(dfreq, 'tok')
        .crossJoin(F.broadcast(ndocs))
        .withColumn('score', F.expr('tf * ((n_docs * 1000000) div df)'))
    )
    w = Window.partitionBy('doc_id').orderBy(F.col('score').desc(), F.col('tok').asc())
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('doc_id', F.col('tok').alias('keyword'),
                F.col('rank').cast('long').alias('rank'), 'score')
    )


def document_fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted token-hash
    sum mod 2^31-1 (token hashes reduced mod 2^31-1 first so products stay
    far below int64 overflow in any engine), plus an order-insensitive XOR
    fold. Shuffle-free (array aggregate per row); reproducible in ANSI SQL.

    Returns (doc_id, fp_weighted, fp_xor).
    """
    # materialize the token array first: element_at(toks, i) inside the
    # interpreted aggregate lambda re-evaluates `toks` per index, and an
    # inlined split(text) expression would re-split the text once per
    # token position (O(tokens^2) string work — same pathology fixed in
    # texthash.word_shingles)
    tok_df = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    toks = F.col('toks')
    idx = F.sequence(F.lit(1), F.size(toks))
    weighted = F.aggregate(
        idx, F.lit(0).cast('long'),
        lambda acc, i: F.pmod(
            acc + i.cast('long') * F.pmod(hash60(F.element_at(toks, i)), F.lit(MERSENNE31)),
            F.lit(MERSENNE31),
        ),
    )
    xored = F.aggregate(
        toks, F.lit(0).cast('long'),
        lambda acc, t: acc.bitwiseXOR(hash60(t)),
    )
    return tok_df.select('doc_id', weighted.alias('fp_weighted'), xored.alias('fp_xor'))


# PII patterns: RE2-compatible (no lookahead/backrefs) so the Java-regex
# Spark side and the RE2 DuckDB oracle match byte-for-byte. Order matters:
# emails first (their local part could otherwise be chewed up as a phone),
# then IPv4 (dotted quads must not be half-eaten by the phone pattern),
# then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ('email', r'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>'),
    ('ipv4', r'\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>'),
    ('phone', r'\+?[0-9][0-9 ()\-]{7,}[0-9]', '<PHONE>'),
)


def redact_pii(docs: DataFrame) -> DataFrame:
    """Scrub common PII (emails, IPv4 addresses, phone-like digit runs)
    before a corpus ships to training. Counts are matched against the
    ORIGINAL text per pattern; the redaction itself applies the patterns
    sequentially in ``PII_PATTERNS`` order, so a phone number inside an
    already-redacted email never double-counts. Pure JVM regexp
    (whole-stage codegen), zero shuffles — at 100 TB this is a map-only
    pass.

    Returns (doc_id, n_emails, n_ipv4, n_phones, redacted_text).
    DuckDB twin: counts via ``len(regexp_extract_all(text, pat))``,
    redaction via chained ``regexp_replace(..., 'g')``.
    """
    counts = {name: F.regexp_count(F.col('text'), F.lit(pat)).cast('long')
              for name, pat, _ in PII_PATTERNS}
    redacted = F.col('text')
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    return docs.select(
        'doc_id',
        counts['email'].alias('n_emails'),
        counts['ipv4'].alias('n_ipv4'),
        counts['phone'].alias('n_phones'),
        redacted.alias('redacted_text'),
    )


def norm_col(text: Column) -> Column:
    """Canonical normalization expression: lowercase, strip non-alphanumeric
    characters to spaces, collapse whitespace runs, trim. Pure JVM regexp
    (whole-stage codegen). DuckDB twin:
    ``trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ',
    'g'), ' +', ' ', 'g'))``."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), '[^a-z0-9 ]', ' '),
            ' +', ' ',
        )
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text normalization for dedup/quality pipelines (see
    :func:`norm_col`). Map-side only; the usual first stage before
    exact-dup fingerprinting so cosmetic variants (case, punctuation,
    spacing) collapse to one fingerprint.

    Returns (doc_id, norm_text, n_chars_norm).
    """
    norm = norm_col(F.col('text'))
    return docs.select(
        'doc_id',
        norm.alias('norm_text'),
        F.length(norm).cast('long').alias('n_chars_norm'),
    )


def classifier_weights(spark, n_buckets: int = 1024, seed: int = 7) -> DataFrame:
    """Deterministic pseudo-weights for :func:`classifier_scores` — one
    integer weight per hash bucket in [-1000, 1000], derived from the same
    md5 hash60 family as everything else so the DuckDB oracle recomputes
    them. Real deployments replace this with trained weights loaded from a
    (bucket, weight) table; the scoring plan is identical."""
    return spark.range(n_buckets).select(
        F.col('id').alias('bucket'),
        (F.pmod(hash60(F.concat(F.lit(f'{seed}-'), F.col('id').cast('string'))),
                F.lit(2001)) - 1000).alias('weight'),
    )


def classifier_scores(docs: DataFrame, weights: DataFrame,
                      n_buckets: int = 1024) -> DataFrame:
    """Hashed bag-of-words linear quality classifier — the fasttext-style
    stage every production curation pipeline runs (CCNet / GPT-3 quality
    filtering): feature = hash60(token) mod n_buckets, document score =
    integer mean bucket weight over token occurrences, predict keep when
    positive.

    Integer end to end (weights are ints, mean uses ``div``) so the
    ranking is engine-exact. Scale shape: one map-side explode, one
    BROADCAST join against the n_buckets-row weight table (never a
    corpus shuffle), one partial-agg groupBy(doc_id). A trained model
    swaps the weights table; nothing else changes.

    Returns (doc_id, n_tokens, score_ppm, pred_keep).
    """
    tok = docs.select(
        'doc_id', F.explode(tokens(F.col('text'))).alias('tok')
    ).select(
        'doc_id',
        F.pmod(hash60(F.col('tok')), F.lit(n_buckets)).alias('bucket'),
    )
    scored = tok.join(F.broadcast(weights), 'bucket')
    return scored.groupBy('doc_id').agg(
        F.count('*').alias('n_tokens'),
        F.expr('(sum(weight) * 1000) div count(*)').alias('score_ppm'),
        (F.sum('weight') > 0).alias('pred_keep'),
    )


def bigram_model(docs: DataFrame) -> DataFrame:
    """Train a bigram frequency table over a corpus: one row per observed
    bigram with its count and the prefix-token occurrence count (how many
    bigrams start with w1). This is the model side of
    :func:`bigram_lm_scores` — train on a curated reference corpus
    (CCNet trains KenLM on Wikipedia), score the crawl against it.

    Scale shape: one map-side bigram explode, one (w1, w2) partial-agg
    shuffle, one (w1) rollup derived from the bigram counts (never a
    second pass over the corpus). Returns (w1, w2, cnt, pfx_cnt).
    """
    bg = _bigrams(docs)
    bgc = bg.groupBy('w1', 'w2').agg(F.count('*').alias('cnt'))
    pfx = bgc.groupBy('w1').agg(F.sum('cnt').alias('pfx_cnt'))
    return bgc.join(pfx, 'w1')


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent whitespace-token pair.
    The token array is materialized into a column before the slice /
    transform so the split runs once, not once per higher-order function.
    """
    d = docs.select('doc_id', tokens(F.col('text')).alias('toks'))
    pairs = F.expr(
        'transform(slice(toks, 1, greatest(size(toks) - 1, 0)),'
        ' (w, i) -> struct(w AS w1, toks[i + 1] AS w2))'
    )
    return (
        d.select('doc_id', F.explode(pairs).alias('p'))
        .select('doc_id', 'p.w1', 'p.w2')
    )


def bigram_lm_scores(docs: DataFrame, model: DataFrame | None = None) -> DataFrame:
    """Bigram language-model scoring — the Spark-native, integer-exact
    stand-in for the CCNet KenLM-perplexity quality filter
    (reference has no equivalent; this is pipeline-side curation).

    Each document is scored by the conditional likelihood of its adjacent
    token pairs under a bigram model: cond_ppm(w1, w2) =
    floor(c(w1, w2) * 1e6 / c(w1 ·)). Low mean likelihood = surprising
    text (gibberish or high-information); high = templated/boilerplate.
    All arithmetic is integer (ppm via ``div``) so rankings are
    bit-identical across engines — no float log whose last ulp could
    differ between libm implementations (swap in log-prob doubles at
    deployment; the plan is identical).

    ``model`` defaults to self-training on ``docs`` (the right default
    when no curated LM corpus ships with the engine); pass
    :func:`bigram_model` output trained elsewhere to score against a
    reference corpus — unseen bigrams then score 0 ppm (handled by the
    left join + coalesce).

    Scale shape: one bigram explode, the model's two partial-agg shuffles,
    one (w1, w2) join back (both sides bigram-partitioned), one final
    groupBy(doc_id). Docs with < 2 tokens have no bigrams and drop out.

    Returns (doc_id, n_bigrams, avg_cond_ppm, min_cond_ppm).
    """
    bg = _bigrams(docs)
    m = model if model is not None else bigram_model(docs)
    per = (
        bg.join(m, ['w1', 'w2'], 'left')
        .withColumn(
            'cond_ppm',
            F.coalesce(F.expr('(cnt * 1000000) div pfx_cnt'), F.lit(0).cast('long')),
        )
    )
    return per.groupBy('doc_id').agg(
        F.count('*').alias('n_bigrams'),
        F.expr('sum(cond_ppm) div count(*)').alias('avg_cond_ppm'),
        F.min('cond_ppm').alias('min_cond_ppm'),
    )


def normalize_unicode(docs: DataFrame, form: str = 'NFC',
                      text_col: str = 'text') -> DataFrame:
    """Unicode normalization of the text column — the step BEFORE
    :func:`normalize_text` in a real pipeline: the same word typed with
    a combining accent (``e`` + U+0301) and the precomposed form (``é``)
    are different byte strings, so every hash-based dedup operator in
    this repo treats them as different documents until they are
    normalized. Web text mixes both constantly (editors, CMSes, and
    copy-paste disagree).

    Spark has no JVM normalizer builtin, so this is one of the repo's
    few sanctioned vectorized pandas UDFs (Arrow-batched
    ``Series.str.normalize`` — same lane as URL canonicalization, never
    per-row Python). ``form='NFC'`` is byte-reproducible by DuckDB's
    ``nfc_normalize`` (the oracle); ``'NFKC'`` additionally folds
    compatibility forms (ligatures, fullwidth ASCII) — the aggressive
    pre-dedup choice.

    Map-side only. Returns (doc_id, norm_unicode, changed).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's hint inference rejects the strings; the
    # explicit returnType carries the schema
    @pandas_udf(T.StringType())
    def _norm(s):
        return s.str.normalize(form)

    # two-step projection so the UDF runs once per row (referencing the
    # same UDF expression twice in one select can evaluate it twice —
    # Python nodes get no common-subexpression elimination)
    tmp = docs.select(
        'doc_id', F.col(text_col).alias('_orig'),
        _norm(F.col(text_col)).alias('norm_unicode'))
    return tmp.select(
        'doc_id', 'norm_unicode',
        (F.col('norm_unicode') != F.col('_orig')).alias('changed'))


def token_spectrum(docs: DataFrame) -> DataFrame:
    """Zipf frequency spectrum (count-of-counts): how many distinct
    token types occur exactly ``freq`` times corpus-wide. The one-glance
    corpus health plot — a crawl batch whose spectrum bends away from
    the familiar power law signals template floods (too much mass at
    high freq) or encoding noise (too much hapax mass); also the input
    Good-Turing smoothing needs.

    Two partial-agg shuffles, the second over distinct frequencies only
    (≤ a few thousand rows at any corpus size).

    Returns (freq, n_types), freq ascending in value not order.
    """
    counts = (
        docs.select(F.explode(tokens(F.col('text'))).alias('tok'))
        .groupBy('tok').agg(F.count(F.lit(1)).alias('freq'))
    )
    return counts.groupBy('freq').agg(
        F.count(F.lit(1)).cast('long').alias('n_types'))


def vocab_growth(docs: DataFrame, n_points: int = 16) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct token types seen
    after each prefix of the corpus, at ``n_points`` checkpoints — the
    saturation signal for "is more crawling still buying new
    vocabulary?" (deduped corpora grow like n^beta; a flattening curve
    means the frontier is re-reading the same material).

    "Prefix" is defined over the deterministic md5-shuffle-key order
    (the same epoch-0 permutation ``curation.epoch_layout`` writes), cut
    into ``n_points`` key-range buckets. Exact and shuffle-cheap:

    * per-token FIRST bucket = one min-agg over the (token, bucket)
      explode — no per-prefix distinct pass;
    * vocab at checkpoint b = cumulative count of tokens whose first
      bucket ≤ b; token mass at b = cumulative occurrence counts —
      both windows run over ≤ ``n_points`` rows.

    ``n_points`` must be a power of two. Returns
    (point, tokens_cum, vocab_cum) with point in [0, n_points).
    """
    if n_points & (n_points - 1) or n_points <= 0:
        raise ValueError(f'n_points must be a power of two, got {n_points}')
    shift = 60 - (n_points.bit_length() - 1)
    ex = docs.select(
        F.shiftright(
            hash60(F.col('doc_id').cast('string')), shift).alias('bucket'),
        F.explode(tokens(F.col('text'))).alias('tok'),
    )
    per_tok = ex.groupBy('tok').agg(F.min('bucket').alias('first_bucket'))
    first_counts = per_tok.groupBy('first_bucket').agg(
        F.count(F.lit(1)).alias('n_new'))
    mass = ex.groupBy('bucket').agg(F.count(F.lit(1)).alias('n_occ'))
    from pyspark.sql.window import Window
    w = Window.orderBy('point').rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)
    grid = (
        mass.select(F.col('bucket').alias('point'), 'n_occ')
        .join(first_counts.withColumnRenamed('first_bucket', 'point'),
              'point', 'left')
        .withColumn('n_new', F.coalesce('n_new', F.lit(0)))
        .withColumn('tokens_cum', F.sum('n_occ').over(w).cast('long'))
        .withColumn('vocab_cum', F.sum('n_new').over(w).cast('long'))
        .select('point', 'tokens_cum', 'vocab_cum')
    )
    return grid
