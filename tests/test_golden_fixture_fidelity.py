"""Fidelity check: the span-corpus transcription of the reference's golden
3-page site (`sources/corpus.golden_site_rows`) must match the ACTUAL HTML
files at /root/reference/tests/website/ — quotes, authors, and link hrefs
in document order. Parsed with stdlib html.parser (the reference's own
parsel/httpx stack is not installed here, and the HTML is untrusted
content we only extract text from)."""

from __future__ import annotations

import os
import re
from html.parser import HTMLParser

import pytest

from scalpel_spark.sources.corpus import golden_site_rows

WEBSITE = '/root/reference/tests/website'


class _QuotesParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self._stack: list[str] = []
        self._buf: list[str] = []
        self.quotes: list[str] = []
        self.authors: list[str] = []
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        self._stack.append(tag)
        if tag in ('p', 'footer'):
            self._buf = []
        if tag == 'a':
            self.links.append(dict(attrs).get('href', ''))

    def handle_endtag(self, tag):
        if tag == 'p' and 'blockquote' in self._stack:
            self.quotes.append(re.sub(r'\s+', ' ', ''.join(self._buf)).strip())
        elif tag == 'footer':
            self.authors.append(re.sub(r'\s+', ' ', ''.join(self._buf)).strip())
        while self._stack and self._stack.pop() != tag:
            pass

    def handle_data(self, data):
        self._buf.append(data)


def _parse(page: int):
    with open(os.path.join(WEBSITE, f'page{page}.html')) as f:
        p = _QuotesParser()
        p.feed(f.read())
    return p


@pytest.mark.parametrize('page', [1, 2, 3])
def test_corpus_matches_reference_html(page):
    html = _parse(page)
    row = golden_site_rows('http')[page - 1]
    texts = [s['text'] for s in row['spans'] if s['kind'] == 'text']
    links = [s['text'] for s in row['spans'] if s['kind'] == 'link']
    # spans interleave (quote, author) pairs in document order
    assert texts[0::2] == html.quotes, f'page{page} quotes differ'
    assert texts[1::2] == html.authors, f'page{page} authors differ'
    assert links == html.links, f'page{page} hrefs differ'


def test_three_einstein_quotes_across_site():
    """The reference integration assertion: exactly 3 Albert Einstein
    quotes across the site (tests/any_io/test_static_spider.py:353-358)."""
    einstein = sum(
        1 for page in (1, 2, 3)
        for a in _parse(page).authors if a == 'Albert Einstein'
    )
    assert einstein == 3


def test_next_link_chain():
    assert _parse(1).links == ['#', 'page2.html']
    assert _parse(2).links == ['page1.html', 'page3.html']
    assert _parse(3).links == ['page2.html', '#']
