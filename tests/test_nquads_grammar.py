"""N-Quads grammar: full-quad round-trip properties plus DELIBERATE
tests for the documented divergences from rdf-canonize's permissive
parser (NOTES_r4 #9-11 — this port follows the W3C grammar):

  #9  comment lines are valid W3C N-Quads       -> accepted (superset)
  #10 liberal BLANK_NODE_LABEL shapes           -> accepted (superset)
  #11 IRIs containing spaces violate IRIREF     -> rejected (stricter)
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from jsonld_js_ray.core.errors import JsonLdError
from jsonld_js_ray.core.nquads import parse, serialize
from jsonld_js_ray.core.to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL

V = "http://ex.org/"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_SETTINGS = dict(max_examples=60, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# IRI path chars that are legal inside IRIREF (no space/control/<>"{}|^`\)
_iri_tail = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyz0123456789-._~!$&'()*+,;=:@/?#[]%"),
    max_size=12)
_subject = st.one_of(
    _iri_tail.map(lambda t: V + t),
    st.integers(0, 99).map(lambda i: f"_:b{i}"))
_graph = st.one_of(
    st.just(""),
    _iri_tail.map(lambda t: V + "g/" + t),
    st.integers(0, 9).map(lambda i: f"_:g{i}"))
# literal text exercises every escape class: quotes, backslashes,
# newlines, tabs, control chars, astral unicode
_literal_text = st.text(max_size=24)
_lang = st.sampled_from([None, "en", "en-US", "de-Latn-DE", "zh-Hant"])
_datatype = st.sampled_from(
    [XSD_STRING, V + "dt", "http://www.w3.org/2001/XMLSchema#integer"])


@st.composite
def _quad(draw):
    s = draw(_subject)
    p = V + draw(_iri_tail)
    g = draw(_graph)
    kind = draw(st.sampled_from([OBJ_IRI, OBJ_BNODE, OBJ_LITERAL]))
    if kind == OBJ_IRI:
        return (s, p, kind, V + draw(_iri_tail), None, None, g)
    if kind == OBJ_BNODE:
        return (s, p, kind, f"_:o{draw(st.integers(0, 99))}", None, None, g)
    lang = draw(_lang)
    if lang:
        return (s, p, kind, draw(_literal_text), LANGSTRING, lang, g)
    return (s, p, kind, draw(_literal_text), draw(_datatype), None, g)


@settings(**_SETTINGS)
@given(st.lists(_quad(), min_size=1, max_size=12, unique=True))
def test_full_quad_roundtrip(quads):
    assert parse(serialize(quads)) == quads


@settings(**_SETTINGS)
@given(st.lists(_quad(), min_size=1, max_size=8, unique=True))
def test_roundtrip_is_fixpoint(quads):
    once = serialize(parse(serialize(quads)))
    assert serialize(parse(once)) == once


@settings(**_SETTINGS)
@given(st.lists(_quad(), min_size=1, max_size=8, unique=True),
       st.sampled_from(["\r\n", "\r"]))
def test_alternate_line_endings(quads, eoln):
    """W3C EOL allows CR and CRLF; serialized output re-joined with
    either must parse identically (reference N-Quads grammar parity)."""
    # split on the serializer's own \n only — str.splitlines would
    # also split on \x85/  etc., which are LEGAL raw inside
    # STRING_LITERAL_QUOTE
    lines = serialize(quads).split("\n")
    lines = [ln for ln in lines if ln != ""]
    assert parse(eoln.join(lines) + eoln) == quads


def test_divergence_9_comment_lines_accepted():
    # rdf-canonize rejects comments; W3C N-Quads allows them — this
    # port accepts (documented superset, NOTES_r4 #9)
    text = ("# leading comment\n"
            f"<{V}s> <{V}p> \"v\" .\n"
            "   # indented comment\n"
            f"<{V}s2> <{V}p> <{V}o> <{V}g> .\n")
    quads = parse(text)
    assert len(quads) == 2
    assert quads[0][3] == "v"
    assert quads[1][6] == V + "g"


def test_divergence_10_liberal_bnode_labels_accepted():
    # W3C BLANK_NODE_LABEL allows leading digits and interior dots;
    # rdf-canonize rejects them — this port accepts (NOTES_r4 #10)
    text = (f"_:0start <{V}p> _:a.b.c .\n"
            f"_:a.b.c <{V}p> \"x\" _:9graph.z .\n")
    quads = parse(text)
    assert quads[0][0] == "_:0start"
    assert quads[0][3] == "_:a.b.c"
    assert quads[1][6] == "_:9graph.z"
    # round-trips intact
    assert parse(serialize(quads)) == quads


def test_divergence_10_trailing_dot_not_part_of_label():
    # the statement terminator dot must not be eaten by a dotted label
    quads = parse(f"_:a.b <{V}p> _:c.d .\n")
    assert quads[0][0] == "_:a.b"
    assert quads[0][3] == "_:c.d"


def test_divergence_11_iri_with_space_rejected():
    # rdf-canonize's <([^:]+:[^>]*)> accepts spaces inside IRIs; W3C
    # IRIREF forbids them — this port rejects (NOTES_r4 #11, strictness
    # catches corrupt data early at scale)
    with pytest.raises(JsonLdError):
        parse(f"<{V}bad iri> <{V}p> \"v\" .\n")
    with pytest.raises(JsonLdError):
        parse(f"<{V}s> <{V}p> <{V}bad object> .\n")
