"""Pure-Python URL algebra kernel (RFC 3986) — the executable spec for the
canonicalization / absolutization / validation pandas UDFs.

Re-creates (from the RFC, not by copying) the semantics the reference gets
from the ``rfc3986`` package:

* absolutization — ``scalpel/core/response.py:103-116``: a reference that is
  *absolute* per RFC 3986 §4.3 (has a scheme AND no fragment) is returned
  unchanged; anything else is resolved against the base (§5.2), the fragment
  is stripped, and the result is recomposed with §5.3 semantics where the
  ``//`` authority marker is emitted only for a *non-empty* authority —
  which yields the reference's golden ``file:///a/x`` → ``file:/a/x``
  collapse (asserted at ``tests/any_io/test_static_spider.py:366-369``) and
  the ``#frag`` → base-sans-fragment behavior
  (``tests/core/test_response.py:73-98``).
* validation — ``scalpel/core/spider.py:15-53``: allowed schemes exactly
  ``['https', 'http', 'file']``; http(s) URLs must have a host; file URLs
  must have a path; IRIs are accepted via IDNA host encoding
  (``core/spider.py:32``, ``tests/core/test_spider.py:85-90``).
* host extraction — ``scalpel/any_io/robots.py:44-45``: lowercased host,
  userinfo/port stripped (httpx.URL(url).host semantics).

No Spark imports here: this module is used both by the vectorized pandas
UDFs (functions/urls.py) and by the pure-Python reference simulator that
serves as the crawl-order oracle in tests.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

ALLOWED_SCHEMES = ('https', 'http', 'file')

# RFC 3986 Appendix B regex, tightened so a leading scheme must be valid
# scheme syntax (ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )).
_URI_RE = re.compile(
    r'^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?'  # scheme
    r'(?://([^/?#]*))?'                   # authority (None when no '//')
    r'([^?#]*)'                           # path (always a str, may be '')
    r'(?:\?([^#]*))?'                     # query (None when no '?')
    r'(?:#(.*))?$'                        # fragment (None when no '#')
)


class SplitURI(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: str
    query: Optional[str]
    fragment: Optional[str]


def split_uri(url: str) -> SplitURI:
    m = _URI_RE.match(url)
    if m is None:  # the appendix-B regex matches any string; defensive only
        return SplitURI(None, None, url, None, None)
    scheme, authority, path, query, fragment = m.groups()
    return SplitURI(scheme.lower() if scheme else scheme, authority, path, query, fragment)


def unsplit(u: SplitURI) -> str:
    """RFC 3986 §5.3 recomposition with the reference's quirk: the ``//``
    marker is emitted only when the authority is non-empty (truthy), which
    collapses ``file:///a`` to ``file:/a``."""
    out = []
    if u.scheme:
        out.append(u.scheme)
        out.append(':')
    if u.authority:  # '' (present-but-empty) intentionally drops '//'
        out.append('//')
        out.append(u.authority)
    if u.path:
        out.append(u.path)
    if u.query is not None:
        out.append('?')
        out.append(u.query)
    if u.fragment is not None:
        out.append('#')
        out.append(u.fragment)
    return ''.join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith('../'):
            inp = inp[3:]
        elif inp.startswith('./'):
            inp = inp[2:]
        elif inp.startswith('/./'):
            inp = '/' + inp[3:]
        elif inp == '/.':
            inp = '/'
        elif inp.startswith('/../'):
            inp = '/' + inp[4:]
            if out:
                out.pop()
        elif inp == '/..':
            inp = '/'
            if out:
                out.pop()
        elif inp in ('.', '..'):
            inp = ''
        else:
            i = inp.find('/', 1)
            if i == -1:
                out.append(inp)
                inp = ''
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return ''.join(out)


def _merge_paths(base: SplitURI, ref_path: str) -> str:
    """RFC 3986 §5.3.3 (non-empty authority check mirrors rfc3986's truthy
    test, which is what produces the file:/// collapse downstream)."""
    if base.authority and not base.path:
        return '/' + ref_path
    i = base.path.rfind('/')
    if i == -1:
        return ref_path
    return base.path[: i + 1] + ref_path


def resolve(base: SplitURI, ref: SplitURI) -> SplitURI:
    """RFC 3986 §5.2.2 strict transform-references algorithm."""
    if ref.scheme is not None:
        return SplitURI(ref.scheme, ref.authority, _remove_dot_segments(ref.path), ref.query, ref.fragment)
    if ref.authority is not None:
        return SplitURI(base.scheme, ref.authority, _remove_dot_segments(ref.path), ref.query, ref.fragment)
    if ref.path == '':
        query = ref.query if ref.query is not None else base.query
        return SplitURI(base.scheme, base.authority, base.path, query, ref.fragment)
    if ref.path.startswith('/'):
        return SplitURI(base.scheme, base.authority, _remove_dot_segments(ref.path), ref.query, ref.fragment)
    merged = _merge_paths(base, ref.path)
    return SplitURI(base.scheme, base.authority, _remove_dot_segments(merged), ref.query, ref.fragment)


def is_absolute(url: str) -> bool:
    """RFC 3986 §4.3 absolute-URI: has a scheme and NO fragment — the exact
    predicate rfc3986's ``is_absolute()`` applies in the reference's
    ``_get_absolute_url`` (``core/response.py:109``)."""
    u = split_uri(url)
    return u.scheme is not None and u.fragment is None


def absolutize(base_url: str, url: str) -> str:
    """Reference ``BaseStaticResponse._get_absolute_url``
    (``core/response.py:103-116``): absolute inputs pass through verbatim
    (fragment kept!); relative inputs are resolved, fragment-stripped, and
    recomposed."""
    if is_absolute(url):
        return url
    target = resolve(split_uri(base_url), split_uri(url))
    return unsplit(target._replace(fragment=None))


# session/campaign query parameters that never change page identity —
# the classic frontier canonicalization blocklist (lowercase match)
TRACKING_PARAMS = frozenset({
    'utm_source', 'utm_medium', 'utm_campaign', 'utm_term', 'utm_content',
    'gclid', 'fbclid', 'msclkid', 'mc_cid', 'mc_eid', 'ref', 'sessionid',
    'phpsessid', 'jsessionid',
})


def canonicalize_for_frontier(url: str) -> str:
    """Frontier canonical form: drop the fragment, strip tracking/session
    query params (``TRACKING_PARAMS``), and sort the surviving params by
    key (stable for equal keys) so param order can't split one page into
    many frontier entries. Everything else — scheme case, ``file:///``
    collapse — follows the same split/unsplit rules the reference uses.
    The engine consumes this via ``CrawlConfig.canonicalize_urls``
    (OFF by default — the reference dedups the literal URL string,
    any_io/response.py:22-24): with the flag on, every seed and
    discovered link is rewritten to this form before hashing/seen-keying
    (plans/engine.py ``_canonicalized``), so the canonical form IS both
    the seen-set key and the fetched URL. Standalone it also backs the
    ``url_frontier_canonical`` query via ``canonical_frontier_udf``.
    """
    u = split_uri(url)
    query = u.query
    if query:
        kept = [p for p in query.split('&')
                if p and p.split('=', 1)[0].lower() not in TRACKING_PARAMS]
        kept.sort(key=lambda p: p.split('=', 1)[0])
        query = '&'.join(kept) if kept else None
    elif query == '':
        query = None
    return unsplit(SplitURI(u.scheme, u.authority, u.path, query, None))


def host_of(url: str) -> Optional[str]:
    """Lowercased host, userinfo and port stripped (httpx.URL(url).host
    semantics used for robots keying, ``any_io/robots.py:44-45``)."""
    auth = split_uri(url).authority
    if not auth:
        return None
    host = auth.rsplit('@', 1)[-1]
    if host.startswith('['):  # IPv6 literal
        end = host.find(']')
        return host[: end + 1].lower() if end != -1 else host.lower()
    host = host.split(':', 1)[0]
    return host.lower() if host else None


def _idna_host(host: str) -> Optional[str]:
    try:
        return host.encode('idna').decode('ascii')
    except (UnicodeError, UnicodeDecodeError):
        return None


def encode_iri(url: str) -> str:
    """IRI → URI host encoding, the part of ``iri_reference(url).encode()``
    (``core/spider.py:32``) validation depends on. Non-host components are
    left as-is (validation never inspects their encoding)."""
    u = split_uri(url)
    if not u.authority:
        return url
    host = host_of(url)
    if host is None or host.isascii():
        return url
    encoded = _idna_host(host)
    if encoded is None:
        return url
    return unsplit(u._replace(authority=u.authority.replace(host, encoded)))


def validate_url(url: str) -> Optional[str]:
    """Returns the reference's exact error message, or None when valid
    (``core/spider.py:26-53``)."""
    u = split_uri(encode_iri(url))
    if u.scheme not in ALLOWED_SCHEMES:
        return f"{url} does not have a scheme in ['https', 'http', 'file']"
    if u.scheme in ('http', 'https') and not host_of(url):
        return f'url {url} must provide a host part'
    if u.scheme == 'file' and not u.path:
        return f'url {url} must provide a path to a local file'
    return None


def scheme_of(url: str) -> Optional[str]:
    return split_uri(url).scheme
