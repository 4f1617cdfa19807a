"""Property-based kernel tests (hypothesis): algebraic invariants the
reference processor guarantees and golden tests can't cover exhaustively."""

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from jsonld_js_ray import api
from jsonld_js_ray.core.nquads import parse, serialize
from jsonld_js_ray.core.to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL

V = "http://ex.org/"

_SETTINGS = dict(max_examples=40, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# ---------------------------------------------------------------------------
# random JSON-LD documents
# ---------------------------------------------------------------------------

_terms = st.sampled_from(["name", "age", "knows", "tag", "note"])
_scalars = st.one_of(
    st.text(max_size=12),
    st.integers(min_value=-10**6, max_value=10**6),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


def _node(depth):
    children = st.one_of(
        _scalars,
        st.lists(_scalars, max_size=3),
    ) if depth <= 0 else st.one_of(
        _scalars,
        st.lists(_scalars, max_size=3),
        st.deferred(lambda: _node(depth - 1)),
        st.builds(lambda xs: {"@list": xs}, st.lists(_scalars, max_size=3)),
    )
    return st.dictionaries(_terms, children, min_size=1, max_size=4).map(
        lambda d: {**d, "@id": V + "n"} if len(d) % 2 == 0 else d)


_docs = st.builds(
    lambda node, lang: {"@context": {"@vocab": V,
                                     **({"@language": lang} if lang
                                        else {})},
                        **node},
    _node(2), st.sampled_from([None, "en", "de"]))


@settings(**_SETTINGS)
@given(_docs)
def test_expansion_idempotent(doc):
    expanded = api.expand(doc)
    assert api.expand(expanded) == expanded


@settings(**_SETTINGS)
@given(_docs)
def test_compact_expand_roundtrip(doc):
    ctx = doc["@context"]
    expanded = api.expand(doc)
    compacted = api.compact(expanded, ctx)
    assert api.expand(compacted) == expanded


@settings(**_SETTINGS)
@given(_docs)
def test_flatten_idempotent_up_to_bnode_relabel(doc):
    """flatten∘flatten equals flatten only up to blank-node relabeling:
    re-flattening renumbers bnodes in node-map traversal order of the
    (sorted) flat document, which can permute labels. The REFERENCE
    behaves identically (verified against jsonld.js on the falsifying
    example: both permute _:b2/_:b3 the same way), so compare the
    canonicalized datasets instead of raw JSON."""
    flat = api.flatten(doc)
    flat2 = api.flatten(flat)
    assert api.canonize(flat2) == api.canonize(flat)


@settings(**_SETTINGS)
@given(_docs)
def test_tordf_fromrdf_triple_preserving(doc):
    quads1 = api.to_rdf(doc)
    back = api.from_rdf(quads1)
    quads2 = api.to_rdf(back, {"skipExpansion": True})
    # label-insensitive comparison: canonize both sides
    assert api.canonize_dataset(quads1) == api.canonize_dataset(quads2)


@settings(**_SETTINGS)
@given(_docs, st.randoms())
def test_canonize_invariant_under_doc_key_order(doc, rnd):
    def shuffle_keys(v):
        if isinstance(v, dict):
            items = [(k, shuffle_keys(x)) for k, x in v.items()]
            rnd.shuffle(items)
            return dict(items)
        if isinstance(v, list):
            return [shuffle_keys(x) for x in v]
        return v

    c1 = api.canonize(doc, {"safe": False})
    c2 = api.canonize(shuffle_keys(doc), {"safe": False})
    assert c1 == c2


@settings(**_SETTINGS)
@given(_docs)
def test_input_never_mutated(doc):
    snap = json.dumps(doc, sort_keys=True)
    api.expand(doc)
    api.flatten(doc)
    api.to_rdf(doc)
    api.canonize(doc, {"safe": False})
    assert json.dumps(doc, sort_keys=True) == snap


# ---------------------------------------------------------------------------
# N-Quads roundtrip on arbitrary literals
# ---------------------------------------------------------------------------

_literal_text = st.text(max_size=40)
_lang = st.sampled_from([None, "en", "en-US", "de"])


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_literal_text, _lang), min_size=1, max_size=8))
def test_nquads_literal_roundtrip(literals):
    quads = []
    for i, (text, lang) in enumerate(literals):
        dt = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
              if lang else "http://www.w3.org/2001/XMLSchema#string")
        quads.append((f"{V}s{i}", f"{V}p", OBJ_LITERAL, text, dt, lang,
                      ""))
    text_out = serialize(quads)
    parsed = parse(text_out)
    assert parsed == quads


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 5), min_size=2, max_size=10),
       st.randoms())
def test_canonize_graph_isomorphism(edges, rnd):
    n = max(max(edges) + 1, len(edges))
    quads = [(f"_:n{i}", V + "p", OBJ_BNODE, f"_:n{e}", None, None, "")
             for i, e in enumerate(edges)]
    c1 = api.canonize_dataset(quads)
    perm = list(range(n))
    rnd.shuffle(perm)
    renamed = [(f"_:m{perm[int(s[3:])]}", p, k, f"_:m{perm[int(v[3:])]}",
                dt, lg, g) for (s, p, k, v, dt, lg, g) in quads]
    rnd.shuffle(renamed)
    assert api.canonize_dataset(renamed) == c1


# ---------------------------------------------------------------------------
# richer documents: container terms + scoped contexts (the
# context-fidelity hot spots SURVEY.md §7.4 calls out)
# ---------------------------------------------------------------------------

_RICH_CTX = {
    "@vocab": V,
    "lst": {"@id": V + "lst", "@container": "@list"},
    "st": {"@id": V + "st", "@container": "@set"},
    "lmap": {"@id": V + "lmap", "@container": "@language"},
    "imap": {"@id": V + "imap", "@container": "@index"},
    "idm": {"@id": V + "idm", "@container": "@id"},
    "typed": {"@id": V + "typed", "@type": V + "DT"},
    "ref": {"@id": V + "ref", "@type": "@id"},
    "scoped": {"@id": V + "scoped",
               "@context": {"name": V + "inner/name"}},
    "Typ": {"@id": V + "Typ",
            "@context": {"note": V + "typ/note"}},
    "gmap": {"@id": V + "gmap", "@container": ["@graph", "@index"]},
}

_rich_values = st.one_of(
    st.builds(lambda v: {"plain": v}, _scalars),
    st.builds(lambda v: {"lst": v}, st.lists(_scalars, max_size=3)),
    st.builds(lambda v: {"st": v}, st.lists(_scalars, max_size=3)),
    st.builds(lambda v: {"lmap": v},
              st.dictionaries(st.sampled_from(["en", "de", "fr"]),
                              st.text(max_size=6), min_size=1,
                              max_size=3)),
    st.builds(lambda v: {"imap": v},
              st.dictionaries(st.sampled_from(["a", "b"]),
                              st.text(max_size=6), min_size=1,
                              max_size=2)),
    st.builds(lambda v: {"typed": v}, st.text(max_size=8)),
    st.builds(lambda v: {"ref": V + v},
              st.sampled_from(["r1", "r2"])),
    st.builds(lambda v: {"scoped": {"name": v}}, st.text(max_size=6)),
    st.builds(lambda v: {"@type": "Typ", "note": v},
              st.text(max_size=6)),
    # named graph via @graph under an @id, and a graph container
    st.builds(lambda v: {"@graph": [{"name": v}]}, st.text(max_size=6)),
    st.builds(lambda v: {"gmap": {"g1": {"name": v}}},
              st.text(max_size=6)),
)

_rich_docs = st.builds(
    lambda parts, with_id: {
        "@context": _RICH_CTX,
        **({"@id": V + "rich"} if with_id else {}),
        **{k: v for part in parts for k, v in part.items()},
    },
    st.lists(_rich_values, min_size=1, max_size=4), st.booleans())


_RICH_SETTINGS = dict(_SETTINGS, max_examples=150)


@settings(**_RICH_SETTINGS)
@given(_rich_docs)
def test_rich_expansion_idempotent(doc):
    expanded = api.expand(doc)
    assert api.expand(expanded) == expanded


@settings(**_RICH_SETTINGS)
@given(_rich_docs)
def test_rich_compact_expand_roundtrip(doc):
    """compact(expand(x)) re-expands to the same expanded document."""
    expanded = api.expand(doc)
    compacted = api.compact(expanded, _RICH_CTX)
    assert api.expand(compacted) == expanded


@settings(**_RICH_SETTINGS)
@given(_rich_docs)
def test_rich_flatten_tordf_consistent(doc):
    """toRDF(flatten(x)) emits the same triples as toRDF(x) modulo
    blank-node labels (canonize-both-sides)."""
    from jsonld_js_ray.core.canonize import canonize
    q1 = canonize(api.to_rdf(doc))
    q2 = canonize(api.to_rdf(api.flatten(doc), {"skipExpansion": True}))
    assert q1 == q2
