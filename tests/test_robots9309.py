"""RFC 9309 wildcard robots matching (operators/robots9309.py).

Beyond-reference operator: the reference's stdlib RobotFileParser
(/root/reference/scalpel/any_io/robots.py:29,75-77) has no wildcard or
precedence support; these cases come from RFC 9309 §2.2.2 and the
published Googlebot matching examples.
"""

import re

import pytest

from pyspark.sql import functions as F

from scalpel_spark.operators.robots9309 import (
    compile_pattern, match_urls, parse_robots_text, rules_table)


@pytest.mark.parametrize('pattern,hits,misses', [
    ('/fish', ['/fish', '/fish.html', '/fish/salmon', '/fishheads?id=1'],
     ['/Fish', '/catfish', '/desert/fish']),
    ('/fish*', ['/fish', '/fishheads/yummy.html'], ['/catfish']),
    ('/fish/', ['/fish/', '/fish/salmon.htm'], ['/fish', '/fish.html']),
    ('/*.php', ['/index.php', '/folder/any.php.file'], ['/', '/windows.PHP']),
    ('/*.php$', ['/filename.php', '/folder/filename.php'],
     ['/filename.php?parameters', '/filename.php5']),
    ('/fish*.php', ['/fish.php', '/fishheads/catfish.php?p=1'],
     ['/Fish.PHP']),
    ('/a+b(c)[d]{e}|f.g', ['/a+b(c)[d]{e}|f.g'], ['/a+b(c)[d]{e}|fXg']),
])
def test_compile_pattern_goldens(pattern, hits, misses):
    rx = re.compile(compile_pattern(pattern))
    for h in hits:
        assert rx.search(h), (pattern, h)
    for m in misses:
        assert not rx.search(m), (pattern, m)


ROBOTS = """
# comment
User-agent: googlebot
Disallow: /private/
Allow: /private/public*

User-agent: *
Disallow: /tmp/
Disallow: /*.bak$
Allow:
"""


def test_group_selection_specific_beats_star():
    rules = parse_robots_text(ROBOTS, 'Googlebot')
    pats = {(allow, plen) for _, allow, plen in rules}
    assert (False, len('/private/')) in pats
    assert (True, len('/private/public*')) in pats
    star = parse_robots_text(ROBOTS, 'otherbot')
    assert {plen for _, _, plen in star} == {len('/tmp/'), len('/*.bak$')}
    # empty Allow: value is ignored, not a rule
    assert all(rx for rx, _, _ in star)


def test_no_applicable_group_allows_everything():
    assert parse_robots_text('User-agent: x\nDisallow: /', 'y') == []
    assert parse_robots_text('', 'y') == []
    assert parse_robots_text(None, 'y') == []


def test_consecutive_ua_lines_share_group():
    txt = 'User-agent: a\nUser-agent: b\nDisallow: /x\n'
    assert parse_robots_text(txt, 'b') == [(compile_pattern('/x'), False, 2)]


def _decide(rules, target):
    """Pure-python twin of the match_urls decision for spot checks."""
    matched = [(plen, allow) for rx, allow, plen in rules if re.search(rx, target)]
    return max(matched)[1] if matched else True


def test_precedence_longest_wins_allow_breaks_ties():
    rules = parse_robots_text(
        'User-agent: *\nDisallow: /page\nAllow: /page', 'bot')
    # equal length -> allow wins (RFC 9309 "least restrictive")
    assert _decide(rules, '/page') is True
    rules2 = parse_robots_text(
        'User-agent: *\nAllow: /folder\nDisallow: /folder/', 'bot')
    assert _decide(rules2, '/folder/page') is False  # longer disallow wins


def test_match_urls_end_to_end(spark):
    robots = spark.createDataFrame(
        [('a.com', 'User-agent: *\nDisallow: /private/\nAllow: /private/pub*\nDisallow: /*.bak$'),
         ('b.com', 'User-agent: otherbot\nDisallow: /')],
        'host string, rules string')
    rules = rules_table(robots, 'mybot')
    urls = spark.createDataFrame(
        [('http://a.com/private/x', 'a.com'),
         ('http://a.com/private/pub/ok.html', 'a.com'),
         ('http://a.com/data.bak', 'a.com'),
         ('http://a.com/data.bak?v=1', 'a.com'),   # $ anchor: query defeats it
         ('http://a.com/open', 'a.com'),
         ('http://a.com', 'a.com'),                # empty path -> '/'
         ('http://b.com/anything', 'b.com'),       # group for another bot only
         ('http://c.com/x', 'c.com')],             # no robots row at all
        'url string, host string')
    got = {r['url']: r['rep_allowed']
           for r in match_urls(urls, rules).collect()}
    assert got == {
        'http://a.com/private/x': False,
        'http://a.com/private/pub/ok.html': True,
        'http://a.com/data.bak': False,
        'http://a.com/data.bak?v=1': True,
        'http://a.com/open': True,
        'http://a.com': True,
        'http://b.com/anything': True,
        'http://c.com/x': True,
    }


def test_match_urls_is_shuffle_free(spark):
    """The URL-axis plan must be broadcast join + map-side lambda only —
    no Exchange on the (big) URL side."""
    robots = spark.createDataFrame(
        [('a.com', 'User-agent: *\nDisallow: /x')], 'host string, rules string')
    rules = rules_table(robots, 'bot').cache()
    rules.count()
    urls = spark.range(1000).select(
        F.concat(F.lit('http://a.com/p/'), F.col('id')).alias('url'),
        F.lit('a.com').alias('host'))
    plan = match_urls(urls, rules)._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find('Exchange')
    assert 'BroadcastExchange' in plan
    # the only Exchange nodes are broadcast ones (rules side)
    for line in plan.splitlines():
        if 'Exchange' in line:
            assert 'Broadcast' in line, line


def test_group_selection_uses_product_token():
    # the engine wires its full user_agent string in; RFC 9309 crawlers
    # match by PRODUCT TOKEN (the part before '/'), like the stdlib
    # RobotFileParser the default matcher uses — a browser-style UA must
    # select the 'Mozilla' group, not silently fall through to '*'
    txt = 'User-agent: Mozilla\nDisallow: /\n\nUser-agent: *\nAllow: /'
    rules = parse_robots_text(
        txt, 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36')
    assert rules == [(compile_pattern('/'), False, 1)]


def test_group_selection_most_specific_token_wins():
    # both 'bot' and 'mybot' are substrings of the token 'mybot';
    # the longest (most specific) group applies, per RFC 9309
    txt = ('User-agent: bot\nDisallow: /a\n\n'
           'User-agent: mybot\nDisallow: /b\n\n'
           'User-agent: *\nDisallow: /c')
    assert parse_robots_text(txt, 'MyBot/2.1') == [
        (compile_pattern('/b'), False, 2)]
