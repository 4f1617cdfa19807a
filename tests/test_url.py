"""RFC 3986 resolution edge cases (cf. /root/reference/lib/url.js tests in
tests/misc.js prependedIri cases)."""

import pytest

from jsonld_js_ray.core.url import prepend_base, remove_base

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4 reference resolution examples
CASES = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
]


@pytest.mark.parametrize("ref,expected", CASES)
def test_rfc3986_resolution(ref, expected):
    assert prepend_base(BASE, ref) == expected


def test_none_base_is_noop():
    assert prepend_base(None, "g") == "g"


def test_remove_base_roundtrip():
    base = "http://ex.org/a/b"
    for iri in ["http://ex.org/a/c", "http://ex.org/a/b#frag",
                "http://ex.org/x", "http://other.org/y"]:
        rel = remove_base(base, iri)
        if rel != iri:  # was relativized — must resolve back
            assert prepend_base(base, rel) == iri
