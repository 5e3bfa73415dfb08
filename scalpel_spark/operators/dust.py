"""DUST — Different URLs with Similar Text (Bar-Yossef, Keidar &
Schonfeld, WWW 2007): mine per-host URL-rewrite rules from observed
content duplicates, then apply them ahead of the frontier so alias URLs
(session ids, tracking params, print-view decorations) collapse to one
canonical form BEFORE they are fetched.

The reference engine's ``canonicalize_for_frontier`` strips a fixed,
hand-curated tracking-param list (``functions/urlkit.py``); this module
LEARNS host-specific ignorable params from the crawl's own evidence — a
param is ignorable on a host only when every observed (URL, URL-minus-
param) twin pair carries identical content signatures and there are at
least ``min_support`` agreeing pairs with zero counterexamples, the
conservative rule from the paper's "valid DUST rule" definition (§3:
rules are kept only when no witness refutes them).

Scale shape (all JVM column algebra, no UDFs):

* rule mining — per URL, one row per DISTINCT param key (query strings
  are single digits of params, so the explode is a small constant
  factor), a canonical ``sorted-residual`` join key, and ONE equi-join
  of candidates against bases on (host, residual) — never URL×URL; the
  groupBy(host, param) rule rollup is host×param-sized;
* application — rules roll up to one row per host
  (``collect_set(param)``, bounded by the param vocabulary of a host),
  broadcastable against a 10^10-row frontier; the rewrite itself is a
  map-side array filter that preserves the surviving params' original
  order (the frontier key stays byte-stable for unaffected URLs).

Content signatures come from the caller — the engine's span-sequence
fingerprint (``operators/spans.span_signature_col``) is the natural
choice, matching the north rule's per-row invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _params(url: Column) -> Column:
    """Query-param entries ('k=v' or bare 'k') in original order; empty
    array when the URL has no query."""
    q = F.try_element_at(F.split(url, r'\?', 2), F.lit(2))
    return F.when(
        q.isNull() | (q == ''), F.array().cast('array<string>')
    ).otherwise(F.filter(F.split(q, '&'), lambda p: p != ''))


def _key_of(entry: Column) -> Column:
    return F.element_at(F.split(entry, '=', 2), 1)  # index 1 always exists


def mine_param_rules(docs: DataFrame, url_col: str = 'url',
                     sig_col: str = 'sig',
                     min_support: int = 2) -> DataFrame:
    """Learn (host, param) pairs that are content-irrelevant on that
    host. For every URL and every distinct param key it carries, the
    candidate's join key is the SORTED residual param list with that key
    removed; any URL whose own sorted param list equals the residual (on
    the same host + path) is the twin, and the pair votes: identical
    ``sig_col`` = support, different = counterexample. A rule survives
    only with ``support >= min_support`` and ZERO counterexamples.

    Returns (host, param, support) — consumed by :func:`strip_params`.
    """
    base = docs.select(
        F.parse_url(F.col(url_col), F.lit('HOST')).alias('host'),
        F.parse_url(F.col(url_col), F.lit('PATH')).alias('path'),
        _params(F.col(url_col)).alias('ps'),
        F.col(sig_col).alias('_sig'),
    )
    bases = base.select(
        'host', 'path',
        F.array_join(F.array_sort('ps'), '&').alias('residual'),
        F.col('_sig').alias('_sig_twin'),
    )
    cands = (
        base.filter(F.size('ps') > 0)
        .select(
            'host', 'path', '_sig', 'ps',
            F.explode(F.array_distinct(
                F.transform('ps', _key_of))).alias('param'),
        )
        .select(
            'host', 'path', 'param', '_sig',
            F.array_join(F.array_sort(F.filter(
                'ps', lambda p: _key_of(p) != F.col('param'))), '&'
            ).alias('residual'),
        )
    )
    votes = cands.join(bases, ['host', 'path', 'residual'])
    return (
        votes.groupBy('host', 'param')
        .agg(
            F.sum(F.when(F.col('_sig') == F.col('_sig_twin'), 1)
                  .otherwise(0)).alias('support'),
            F.sum(F.when(F.col('_sig') != F.col('_sig_twin'), 1)
                  .otherwise(0)).alias('counterexamples'),
        )
        .filter((F.col('support') >= min_support)
                & (F.col('counterexamples') == 0))
        .select('host', 'param', 'support')
    )


def strip_params(frontier: DataFrame, rules: DataFrame,
                 url_col: str = 'url', out_col: str | None = None) -> DataFrame:
    """Apply mined DUST rules to a frontier: for each URL, drop the
    params its host has proven ignorable, keeping the survivors in their
    ORIGINAL order (unaffected URLs stay byte-identical). Rules collapse
    to one row per host and broadcast; the rewrite is map-side.

    ``out_col`` defaults to rewriting ``url_col`` in place.
    """
    out = out_col or url_col
    per_host = rules.groupBy('host').agg(
        F.collect_set('param').alias('_drop'))
    url = F.col(url_col)
    kept = F.filter(
        _params(url), lambda p: ~F.array_contains(F.col('_drop'),
                                                  _key_of(p)))
    stripped = F.concat(
        F.element_at(F.split(url, r'\?', 2), 1),
        F.when(F.size(kept) > 0,
               F.concat(F.lit('?'), F.array_join(kept, '&'))
               ).otherwise(F.lit('')),
    )
    rewritten = F.when(F.col('_drop').isNull(), url).otherwise(stripped)
    return (
        frontier
        .withColumn('_h', F.parse_url(url, F.lit('HOST')))
        .join(F.broadcast(per_host.withColumnRenamed('host', '_h')),
              '_h', 'left')
        .withColumn(out, rewritten)
        .drop('_h', '_drop')
    )
