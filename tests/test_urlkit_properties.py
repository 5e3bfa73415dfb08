"""Property-based tests of the URL algebra kernel (M0): where the
reference has no quirk, RFC 3986 resolution must agree with the stdlib's
``urllib.parse.urljoin`` on arbitrary inputs. The known divergences —
fragment-strip asymmetry and the ``file:///`` authority collapse — are the
*documented* reference behaviors and are excluded by construction here
(they have their own golden tests in test_urlkit.py)."""

from __future__ import annotations

from urllib.parse import urljoin

from hypothesis import given, settings
from hypothesis import strategies as st

from scalpel_spark.functions import urlkit

SEG = st.text(alphabet='abcXYZ019-._~', min_size=1, max_size=8)
# segments that can never be dot-segments ('.'/'..') — see authority note
SEG_NODOT = st.text(alphabet='abcXYZ019-_~', min_size=1, max_size=8)


@st.composite
def http_base(draw):
    host = draw(st.sampled_from(['example.com', 'a.org', 'x-y.net']))
    segs = draw(st.lists(SEG, min_size=0, max_size=4))
    path = '/' + '/'.join(segs)
    query = draw(st.one_of(st.none(), SEG))
    url = f'http://{host}{path}'
    if query is not None:
        url += f'?{query}'
    return url


@st.composite
def relative_ref(draw):
    kind = draw(st.sampled_from(['rel', 'abs_path', 'dotted', 'query_only', 'authority']))
    segs = draw(st.lists(SEG, min_size=1, max_size=3))
    if kind == 'rel':
        ref = '/'.join(segs)
    elif kind == 'abs_path':
        ref = '/' + '/'.join(segs)
    elif kind == 'dotted':
        dots = draw(st.lists(st.sampled_from(['..', '.']), min_size=1, max_size=3))
        ref = '/'.join(dots + segs)
    elif kind == 'query_only':
        ref = '?' + segs[0]
    else:
        # network-path reference. NOTE: no dot segments here — RFC 3986
        # §5.2.2 applies remove_dot_segments in the authority branch (as
        # our kernel and the rfc3986 package do) but stdlib urljoin does
        # not, so '//h/.' is a known stdlib deviation, not a kernel bug.
        ref = '//other.example/' + '/'.join(draw(st.lists(SEG_NODOT, min_size=1, max_size=3)))
    if draw(st.booleans()):
        ref += '?' + draw(SEG)
    return ref


@settings(max_examples=300, deadline=None)
@given(base=http_base(), ref=relative_ref())
def test_absolutize_agrees_with_stdlib_urljoin(base, ref):
    got = urlkit.absolutize(base, ref)
    expected = urljoin(base, ref)
    assert got == expected, f'absolutize({base!r}, {ref!r}) = {got!r} != urljoin {expected!r}'


@settings(max_examples=200, deadline=None)
@given(base=http_base(), ref=relative_ref())
def test_absolutize_idempotent_on_result(base, ref):
    """Resolving an already-absolute (fragment-free) URL is identity."""
    once = urlkit.absolutize(base, ref)
    assert urlkit.absolutize(base, once) == once


@settings(max_examples=200, deadline=None)
@given(base=http_base(), ref=relative_ref(), frag=SEG)
def test_fragment_always_stripped_from_relative(base, ref, frag):
    assert urlkit.absolutize(base, f'{ref}#{frag}') == urlkit.absolutize(base, ref)


@settings(max_examples=200, deadline=None)
@given(url=http_base())
def test_validate_accepts_all_generated_http(url):
    assert urlkit.validate_url(url) is None
    assert urlkit.host_of(url) is not None
