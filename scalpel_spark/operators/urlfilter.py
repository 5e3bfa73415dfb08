"""URL-level quality filtering for the frontier — the C4/RefinedWeb URL
rules that run BEFORE a fetch is ever scheduled: a crawl at 10^10-URL
scale wins more capacity by refusing junk URLs than by any fetch-side
optimization, because a refused URL costs zero requests.

Reference parity note: the reference validates scheme and robots only
(``scalpel/any_io/static_spider.py:83-95``); content-quality URL rules are
part of the LLM-pipeline layer this engine adds in front of the frontier.

Rules (all engine-portable string algebra — no parse_url, so the DuckDB
oracle computes byte-identical flags):

* ``flag_blocked``   — host appears in a blocklist table (broadcast join;
  blocklists are 10^5-10^7 hosts — trivially broadcastable)
* ``flag_long``      — URL longer than ``max_len`` chars
* ``flag_deep``      — path depth beyond ``max_depth`` segments
* ``flag_query_heavy`` — more than ``max_params`` query parameters
  (calendar/session/faceted-navigation traps)
* ``flag_spam``      — spam keyword in the lowercased URL

Everything except the broadcast blocklist join is map-side; ``keep`` is
the conjunction. Run it on the frontier BEFORE the seen-set anti-join so
junk never even probes the bloom filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPAM_RE = 'casino|viagra|porn|xxx'


def url_host(url: Column) -> Column:
    """Normalized host: between '://' and the next '/', lowercased, port
    stripped — pure string algebra so the oracle twin (split_part/lower in
    DuckDB) is byte-identical. Matches the engine's host identity
    (``functions/urls.host_col`` = lower(parse_url HOST)) on every URL
    without userinfo; frontiers that already carry the engine host column
    should pass it via ``host_col`` instead of re-deriving."""
    # query stripped first: a no-path URL ('http://h.test?a=b') must not
    # leak its query into the authority
    authority = F.split_part(F.split_part(F.split_part(url, F.lit('://'), F.lit(2)),
                                          F.lit('?'), F.lit(1)),
                             F.lit('/'), F.lit(1))
    return F.lower(F.split_part(authority, F.lit(':'), F.lit(1)))


def _path_depth(url: Column) -> Column:
    # '/' count minus the two scheme slashes; query stripped first so
    # slashes inside parameters don't count as path depth
    base = F.split_part(url, F.lit('?'), F.lit(1))
    return (F.length(base) - F.length(F.replace(base, F.lit('/'), F.lit('')))
            - F.lit(2)).cast('long')


def _n_params(url: Column) -> Column:
    # everything after the FIRST '?' — a '?' inside a parameter value must
    # not reset the count (DuckDB twin: substr(url, strpos(url,'?')+1))
    q = F.when(
        F.instr(url, '?') > 0,
        F.substring(url, F.instr(url, '?') + 1, F.length(url)),
    )
    return F.coalesce(
        F.length(q) - F.length(F.replace(q, F.lit('&'), F.lit(''))) + 1,
        F.lit(0),
    ).cast('long')


def url_quality_flags(
    frontier: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = 'url',
    max_len: int = 300,
    max_depth: int = 8,
    max_params: int = 4,
    host_col: str | None = None,
) -> DataFrame:
    """Per-URL rule flags + ``keep``; input columns pass through.
    ``blocklist`` is a (host) table, joined with an explicit broadcast.
    ``host_col`` names an existing normalized-host column to use as the
    blocklist key (the engine passes its parse_url-derived host so the
    filter and the rest of the pipeline share ONE host identity); when
    absent the host is derived from the URL string."""
    url = F.col(url_col)
    # internal join key — deliberately NOT named 'host' so a frontier that
    # already carries an engine-computed host column is never clobbered
    key = F.lower(F.col(host_col)) if host_col else url_host(url)
    out = frontier.withColumn('_uf_host', key)
    if blocklist is not None:
        bl = blocklist.select(F.lower(F.col('host')).alias('_uf_host'),
                              F.lit(True).alias('flag_blocked'))
        out = out.join(F.broadcast(bl), '_uf_host', 'left').withColumn(
            'flag_blocked', F.coalesce('flag_blocked', F.lit(False)))
    else:
        out = out.withColumn('flag_blocked', F.lit(False))
    out = (
        out.drop('_uf_host')
        .withColumn('flag_long', F.length(url) > max_len)
        .withColumn('flag_deep', _path_depth(url) > max_depth)
        .withColumn('flag_query_heavy', _n_params(url) > max_params)
        .withColumn('flag_spam', F.lower(url).rlike(SPAM_RE))
    )
    return out.withColumn(
        'keep',
        ~(F.col('flag_blocked') | F.col('flag_long') | F.col('flag_deep')
          | F.col('flag_query_heavy') | F.col('flag_spam')),
    )


def _path(url: Column) -> Column:
    """URL path incl. leading '/', query stripped; '' when there is no
    path. Pure string algebra (strpos/substr) so the DuckDB twin is
    byte-identical."""
    # strip the query BEFORE locating the first '/': a no-path URL whose
    # query contains a slash ('http://h?a=b/c') must yield '', not '/c'
    rest = F.split_part(F.split_part(url, F.lit('://'), F.lit(2)),
                        F.lit('?'), F.lit(1))
    return F.when(F.instr(rest, '/') > 0,
                  F.substring(rest, F.instr(rest, '/'), F.length(rest))
                  ).otherwise(F.lit(''))


def trap_scores(
    frontier: DataFrame,
    url_col: str = 'url',
    max_repeat: int = 2,
    max_depth: int = 8,
    max_digit_ppm: int = 400_000,
    max_params: int = 4,
) -> DataFrame:
    """Crawler-trap heuristics — the URL-shape signals that catch infinite
    URL spaces (calendars, faceted navigation, session-id mills, symlink
    loops) BEFORE they eat the host's fetch budget. A trap host serves
    unbounded *distinct* URLs, so the seen-set never saves you; the only
    scalable defence is refusing trap-shaped URLs at the frontier.

    Signals (per URL, all map-side array/string algebra — no shuffle, no
    parse_url, every value reproducible in the DuckDB oracle):

    * ``seg_repeat``  — max multiplicity of any path segment
      (``/a/b/a/b/a`` → 3): the symlink-loop / recursive-calendar shape.
      O(segments²) lambda work; paths have ≤ ~20 segments.
    * ``depth``       — number of path segments.
    * ``digit_ppm``   — digit share of the path in parts-per-million
      (session ids, timestamps, pagination mills).
    * ``n_params``    — query-parameter count (faceted navigation).

    ``flag_trap`` is the disjunction of the thresholds. Input columns
    pass through. Composes with :func:`url_quality_flags` — that one
    scores junk *content*, this one scores unbounded *URL spaces*.
    """
    url = F.col(url_col)
    path = _path(url)
    out = frontier.withColumn('_uf_segs', F.filter(
        F.split(path, '/'), lambda s: s != F.lit('')))
    segs = F.col('_uf_segs')
    seg_repeat = F.coalesce(
        F.array_max(F.transform(
            segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))),
        F.lit(0)).cast('long')
    n_digits = F.length(path) - F.length(
        F.regexp_replace(path, '[0-9]', ''))
    # floor() explicitly: Spark's double->long cast truncates while
    # DuckDB's rounds — floor first is identical in both engines
    digit_ppm = F.when(
        F.length(path) > 0,
        F.floor((n_digits.cast('long') * 1_000_000) / F.length(path))
    ).otherwise(F.lit(0)).cast('long')
    out = (
        out.withColumn('seg_repeat', seg_repeat)
        .withColumn('depth', F.size(segs).cast('long'))
        .withColumn('digit_ppm', digit_ppm)
        .withColumn('n_params', _n_params(url))
        .drop('_uf_segs')
    )
    return out.withColumn(
        'flag_trap',
        (F.col('seg_repeat') > max_repeat) | (F.col('depth') > max_depth)
        | (F.col('digit_ppm') > max_digit_ppm)
        | (F.col('n_params') > max_params),
    )


def filter_frontier(frontier: DataFrame, blocklist: DataFrame | None = None,
                    url_col: str = 'url', **rule_kwargs) -> DataFrame:
    """The frontier rows that survive every URL rule, original columns
    only — drop-in ahead of the seen-set anti-join. Accepts the same
    ``host_col``/threshold kwargs as :func:`url_quality_flags`."""
    flagged = url_quality_flags(frontier, blocklist, url_col, **rule_kwargs)
    return flagged.filter('keep').select(*frontier.columns)


# IDN homograph heuristics (UTS #39 confusables, the cheap column-algebra
# subset): script ranges that commonly mix with Latin in spoofed hosts
CYRILLIC_RE = '[Ѐ-ӿ]'
GREEK_RE = '[Ͱ-Ͽ]'
LATIN_RE = '[a-zA-Z]'


def homograph_flags(df: DataFrame, url_col: str = 'url') -> DataFrame:
    """IDN homograph / script-spoofing flags per URL — the phishing-site
    screen a crawl frontier applies before spending fetches (and a
    training-data pipeline applies before trusting a source): a host
    whose labels mix Latin with Cyrillic or Greek renders identically to
    a brand name it is not ('раypal.com' with a Cyrillic 'р'), which is
    why UTS #39 calls mixed-script labels restricted. Flags:

    * ``has_punycode`` — any ``xn--`` label (the host declares IDN);
    * ``mixed_script`` — some single LABEL mixes Latin with Cyrillic or
      Greek. Per-label, not per-host: the TLD is always Latin, so a
      whole-host rule would flag every legitimate Cyrillic IDN
      (``дом.test``); UTS #39 restricts mixing within one label;
    * ``suspicious`` — mixed_script (punycode alone is legitimate IDN).

    Pure map-side JVM regexps (unicode-range character classes, RE2-
    compatible) inside one higher-order ``exists`` over the label array.
    Returns the input plus the three flags.
    """
    host = F.lower(F.coalesce(url_host(F.col(url_col)), F.lit('')))
    has_puny = host.rlike('(^|\\.)xn--')
    mixed = F.exists(
        F.split(host, '\\.'),
        lambda l: l.rlike(LATIN_RE)
        & (l.rlike(CYRILLIC_RE) | l.rlike(GREEK_RE)),
    )
    return (
        df.withColumn('has_punycode', has_puny)
        .withColumn('mixed_script', mixed)
        .withColumn('suspicious', mixed)
    )


def path_prefix_stats(df: DataFrame, url_col: str = 'url',
                      max_depth: int = 3) -> DataFrame:
    """Per-host PATH-PREFIX rollup: URL counts under every directory
    prefix up to ``max_depth`` — the hub/trap topology view that decides
    where a host's crawl budget actually goes (``/product/`` vs
    ``/search/``) and which subtrees :func:`trap_scores` should examine
    first. The complement of DUST's query-parameter analysis: this is
    the path axis.

    Map-side prefix explode (≤ ``max_depth`` slim rows per URL), one
    groupBy (host, depth, prefix). Prefixes are bounded by real site
    structure, never URL×URL.

    Returns (host, depth, prefix, n_urls) — depth 1 = first segment.
    """
    host = url_host(F.col(url_col))
    segs = F.filter(F.split(_path(F.col(url_col)), '/'),
                    lambda s: s != '')
    # guard the empty path: sequence(1, 0) would DESCEND in Spark and
    # fabricate depth-1/0 prefixes for segment-less URLs
    depths = F.when(
        F.size(segs) > 0,
        F.sequence(F.lit(1), F.least(F.lit(max_depth), F.size(segs))),
    ).otherwise(F.array().cast('array<int>'))
    prefixes = F.transform(
        depths,
        lambda d: F.struct(
            d.cast('long').alias('depth'),
            F.concat(F.lit('/'),
                     F.array_join(F.slice(segs, 1, d), '/')).alias('prefix'),
        ),
    )
    ex = df.select(host.alias('host'), F.explode(prefixes).alias('p')) \
           .filter(F.col('host') != '')
    return (
        ex.groupBy('host', F.col('p.depth').alias('depth'),
                   F.col('p.prefix').alias('prefix'))
        .agg(F.count(F.lit(1)).cast('long').alias('n_urls'))
    )
