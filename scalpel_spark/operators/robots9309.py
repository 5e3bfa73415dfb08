"""RFC 9309 wildcard robots matching — per-URL allow/deny at corpus scale.

Beyond the reference: the reference evaluates robots with the stdlib
``RobotFileParser`` (``any_io/robots.py:29,75-77``), which implements the
original 1994 REP — no ``*`` wildcards, no ``$`` end anchor, and
first-match precedence. Production crawlers follow RFC 9309 (the REP as
published 2022, a.k.a. the Googlebot rules): ``*`` matches any byte
sequence, a trailing ``$`` anchors the end of the URL, and among all
matching rules the LONGEST pattern wins, with ``allow`` beating
``disallow`` on ties. The engine keeps the stdlib behavior for reference
parity (``operators/robots.py``); this module is the scale-grade
per-URL matcher.

Physical shape (the 100 TB plan):

* ``rules_table`` parses each host's robots.txt ONCE (Arrow-batched
  ``mapInPandas`` over the tiny per-host robots table — same shape as
  ``robots.evaluate_new_hosts``) and emits one row per host carrying the
  applicable group's rules as an ``array<struct<rx,allow,plen>>``;
* ``match_urls`` broadcast-joins that one-row-per-host table onto the
  URL set and decides each URL with higher-order functions
  (``filter`` + ``regexp_like`` + ``array_max`` on ``(plen, allow)``
  structs) — **entirely map-side, zero shuffle on the URL axis**, no
  per-row Python. Patterns compile to RE2-compatible regexes so the
  DuckDB oracle twin (``regexp_matches``) agrees byte-for-byte.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField('host', T.StringType()),
        T.StructField(
            'rep_rules',
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField('rx', T.StringType()),
                        T.StructField('allow', T.BooleanType()),
                        T.StructField('plen', T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# regex metacharacters escaped identically by Java regex and RE2 (DuckDB):
# backslash-punctuation is a literal in both engines.
_ESCAPE = re.compile(r'[.^$+?{}\[\]|()\\]')


def compile_pattern(pattern: str) -> str:
    """Robots path pattern → anchored regex, valid in Java regex AND RE2.

    ``*`` → ``.*``; a trailing ``$`` anchors the end; everything else is
    a literal. The pattern always anchors at the start (RFC 9309 §2.2.2:
    rules match from the first path byte).
    """
    ends_anchored = pattern.endswith('$')
    body = pattern[:-1] if ends_anchored else pattern
    out = ['^']
    for piece in body.split('*'):
        out.append(_ESCAPE.sub(lambda m: '\\' + m.group(0), piece))
        out.append('.*')
    out.pop()  # one trailing '.*' too many from the final split piece
    if ends_anchored:
        out.append('$')
    return ''.join(out)


def parse_robots_text(text: str, user_agent: str) -> list[tuple[str, bool, int]]:
    """Pure kernel: robots.txt → the applicable group's [(rx, allow, plen)].

    Group selection per RFC 9309 §2.2.1: the crawler matches by its
    PRODUCT TOKEN — the part of ``user_agent`` before the first ``/``
    (so a full browser string like ``Mozilla/5.0 (X11; ...)`` selects
    the ``Mozilla`` group, matching the stdlib ``RobotFileParser``
    the engine's default matcher uses). A group applies when its
    ``User-agent`` value is a case-insensitive substring of that token
    (stdlib semantics); among applicable groups the MOST SPECIFIC
    (longest UA value) wins, per the RFC's most-specific-group rule.
    Otherwise the ``*`` group; otherwise no rules (everything allowed).
    Consecutive UA lines share one group. Empty-pattern rules are ignored
    (RFC: an empty ``Disallow:`` means allow-all, i.e. no rule).
    """
    ua = user_agent.split('/')[0].strip().lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    rules_started = False
    for raw in (text or '').splitlines():
        line = raw.split('#', 1)[0].strip()
        if not line or ':' not in line:
            continue
        key, _, val = line.partition(':')
        key, val = key.strip().lower(), val.strip()
        if key == 'user-agent':
            if rules_started:
                current = []
                rules_started = False
            tok = val.lower()
            current.append(tok)
            groups.setdefault(tok, [])
        elif key in ('allow', 'disallow'):
            rules_started = True
            if not val or not current:
                continue
            for tok in current:
                groups[tok].append((val, key == 'allow'))
    applicable = [tok for tok in groups if tok != '*' and tok and tok in ua]
    chosen = groups[max(applicable, key=len)] if applicable else groups.get('*')
    if not chosen:
        return []
    return [(compile_pattern(p), allow, len(p)) for p, allow in chosen]


def rules_table(robots_df: DataFrame, user_agent: str) -> DataFrame:
    """(host, rules STRING) → (host, rep_rules array<struct<rx,allow,plen>>).

    One Python parse per HOST (Arrow-batched), never per URL — the same
    once-per-host shape as ``robots.evaluate_new_hosts``. Hosts whose
    applicable group is empty get an empty array (all URLs allowed).
    """

    def parse_batches(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    'host': pdf['host'],
                    'rep_rules': [
                        parse_robots_text(rules, user_agent)
                        for rules in pdf['rules']
                    ],
                }
            )

    return robots_df.select('host', 'rules').mapInPandas(parse_batches, RULES_SCHEMA)


def match_target_col(url: F.Column) -> F.Column:
    """The string RFC 9309 rules match against: path + ('?' + query)?,
    with the empty path normalized to '/'."""
    raw_path = F.coalesce(F.parse_url(url, F.lit('PATH')), F.lit(''))
    path = F.when(raw_path == '', F.lit('/')).otherwise(raw_path)
    query = F.parse_url(url, F.lit('QUERY'))
    return F.when(query.isNull(), path).otherwise(F.concat(path, F.lit('?'), query))


def match_urls(
    urls_df: DataFrame,
    rules_df: DataFrame,
    url_col: str = 'url',
    host_col: str = 'host',
    out_col: str = 'rep_allowed',
) -> DataFrame:
    """Decide every URL against its host's compiled rules, map-side.

    ``rules_df`` is ``rules_table`` output: ONE row per host, so the
    broadcast left join cannot fan out. Decision: among matching rules,
    ``array_max`` over ``struct(plen, allow)`` picks the longest pattern,
    and ``allow=true > allow=false`` breaks ties in allow's favor —
    exactly RFC 9309 §2.2.2 precedence. No matching rule (or no robots
    row at all) → allowed.
    """
    target = match_target_col(F.col(url_col))
    joined = urls_df.join(F.broadcast(rules_df), host_col, 'left')
    matched = F.filter(
        F.coalesce(F.col('rep_rules'), F.array()),
        lambda r: F.regexp_like(target, r['rx']),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(r['plen'].alias('plen'), r['allow'].alias('allow')),
        )
    )
    decided = F.when(F.size(matched) == 0, F.lit(True)).otherwise(best['allow'])
    return joined.withColumn(out_col, decided).drop('rep_rules')
