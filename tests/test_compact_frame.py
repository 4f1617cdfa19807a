"""Compaction + framing fixtures (reference semantics:
/root/reference/lib/compact.js, lib/frame.js)."""

from jsonld_js_ray import api

V = "http://ex.org/"


def test_compact_basic_terms():
    ctx = {"name": V + "name", "knows": {"@id": V + "knows",
                                         "@type": "@id"}}
    expanded = [{"@id": V + "a",
                 V + "name": [{"@value": "Alice"}],
                 V + "knows": [{"@id": V + "b"}]}]
    out = api.compact(expanded, ctx)
    assert out == {"@context": ctx, "@id": V + "a", "knows": V + "b",
                   "name": "Alice"}


def test_compact_curie():
    ctx = {"ex": V}
    doc = [{"@id": V + "a", V + "name": [{"@value": "x"}]}]
    out = api.compact(doc, ctx)
    assert out["ex:name"] == "x"
    assert out["@id"] == "ex:a"


def test_compact_vocab_relative():
    ctx = {"@vocab": V}
    doc = [{"@id": V + "a", V + "name": [{"@value": "x"}]}]
    out = api.compact(doc, ctx)
    assert out["name"] == "x"


def test_compact_language_map():
    ctx = {"label": {"@id": V + "label", "@container": "@language"}}
    doc = [{V + "label": [{"@value": "cat", "@language": "en"},
                          {"@value": "Katze", "@language": "de"}]}]
    out = api.compact(doc, ctx)
    assert out["label"] == {"de": "Katze", "en": "cat"}


def test_compact_list_container():
    ctx = {"nums": {"@id": V + "nums", "@container": "@list"}}
    doc = [{V + "nums": [{"@list": [{"@value": 1}, {"@value": 2}]}]}]
    out = api.compact(doc, ctx)
    assert out["nums"] == [1, 2]


def test_compact_explicit_list():
    ctx = {"@vocab": V}
    doc = [{V + "nums": [{"@list": [{"@value": 1}]}]}]
    out = api.compact(doc, ctx)
    assert out["nums"] == {"@list": [1]}


def test_compact_index_container():
    ctx = {"post": {"@id": V + "post", "@container": "@index"}}
    doc = [{V + "post": [{"@id": V + "p1", "@index": "en"}]}]
    out = api.compact(doc, ctx)
    assert out["post"] == {"en": {"@id": V + "p1"}}


def test_compact_id_map():
    ctx = {"@vocab": V, "post": {"@id": V + "post", "@container": "@id"}}
    doc = [{V + "post": [
        {"@id": V + "p1", V + "title": [{"@value": "t"}]}]}]
    out = api.compact(doc, ctx)
    assert out["post"] == {V + "p1": {"title": "t"}}


def test_compact_type_coercion_scalar():
    ctx = {"age": {"@id": V + "age",
                   "@type": "http://www.w3.org/2001/XMLSchema#integer"}}
    doc = [{V + "age": [{"@value": 30,
                         "@type":
                         "http://www.w3.org/2001/XMLSchema#integer"}]}]
    out = api.compact(doc, ctx)
    assert out["age"] == 30


def test_compact_keeps_mismatched_type():
    ctx = {"@vocab": V}
    doc = [{V + "age": [{"@value": "30",
                         "@type":
                         "http://www.w3.org/2001/XMLSchema#integer"}]}]
    out = api.compact(doc, ctx)
    assert out["age"] == {"@type": "http://www.w3.org/2001/XMLSchema#integer",
                          "@value": "30"}


def test_compact_reverse():
    ctx = {"@vocab": V, "parentOf": {"@reverse": V + "childOf"}}
    doc = [{"@id": V + "a",
            "@reverse": {V + "childOf": [{"@id": V + "b"}]}}]
    out = api.compact(doc, ctx)
    assert out["parentOf"] == {"@id": V + "b"}


def test_compact_shortest_term_wins():
    ctx = {"n": V + "name", "longname": V + "name"}
    doc = [{V + "name": [{"@value": "x"}]}]
    out = api.compact(doc, ctx)
    assert out["n"] == "x"


def test_expand_compact_roundtrip_preserves_expansion():
    ctx = {"@vocab": V, "knows": {"@type": "@id"},
           "label": {"@container": "@language"}}
    doc = {"@context": ctx, "@id": V + "a", "name": "Alice",
           "knows": [V + "b", V + "c"],
           "label": {"en": "cat"}}
    expanded = api.expand(doc)
    compacted = api.compact(expanded, ctx)
    assert api.expand(compacted) == expanded


def test_frame_library():
    doc = {
        "@context": {"@vocab": V, "contains": {"@type": "@id"}},
        "@graph": [
            {"@id": V + "library", "@type": "Library",
             "contains": V + "book"},
            {"@id": V + "book", "@type": "Book", "title": "My Book",
             "contains": V + "chapter"},
            {"@id": V + "chapter", "@type": "Chapter", "title": "Ch 1"},
        ]}
    frame = {
        "@context": {"@vocab": V, "contains": {"@type": "@id"}},
        "@type": "Library",
        "contains": {"@type": "Book", "contains": {"@type": "Chapter"}},
    }
    out = api.frame(doc, frame)
    assert out["@id"] == V + "library"
    assert out["contains"]["@id"] == V + "book"
    assert out["contains"]["contains"]["title"] == "Ch 1"


def test_frame_embed_never():
    doc = {"@context": {"@vocab": V},
           "@graph": [{"@id": V + "a", "@type": "T",
                       "child": {"@id": V + "b", "name": "x"}}]}
    frame = {"@context": {"@vocab": V}, "@type": "T",
             "@embed": "@never"}
    out = api.frame(doc, frame)
    assert out["child"] == {"@id": V + "b"}


def test_frame_explicit():
    doc = {"@context": {"@vocab": V},
           "@id": V + "a", "@type": "T", "name": "x", "other": "y"}
    frame = {"@context": {"@vocab": V}, "@type": "T", "name": {},
             "@explicit": True}
    out = api.frame(doc, frame)
    assert out.get("name") == "x"
    assert "other" not in out


def test_frame_default():
    doc = {"@context": {"@vocab": V}, "@id": V + "a", "@type": "T"}
    frame = {"@context": {"@vocab": V}, "@type": "T",
             "name": {"@default": "unknown"}}
    out = api.frame(doc, frame)
    assert out["name"] == "unknown"


def test_frame_wildcard_matches_all():
    doc = {"@context": {"@vocab": V},
           "@graph": [{"@id": V + "a", "name": "x"},
                      {"@id": V + "b", "name": "y"}]}
    out = api.frame(doc, {"@context": {"@vocab": V}})
    graph = out.get("@graph", [out] if "@id" in out else [])
    ids = {n["@id"] for n in graph} if isinstance(graph, list) else set()
    assert ids == {V + "a", V + "b"}


def test_remove_embed_collapses_matching_references():
    """_removeEmbed mirrors the reference's removeValue+addValue: every
    value under the property whose @id matches is dropped and ONE
    reference is appended at the end (frame.js:645-684) — not an
    in-place per-value replacement."""
    from jsonld_js_ray.core.frame import _remove_embed
    parent = {"@id": "ex:a",
              "ex:p": [{"@id": "ex:b", "ex:x": [{"@value": 1}]},
                       {"@value": "keep"},
                       {"@id": "ex:b"}]}
    state = {"graph": "@merged", "uniqueEmbeds": {"@merged": {
        "ex:b": {"parent": parent, "property": "ex:p"}}}}
    _remove_embed(state, "ex:b")
    assert parent["ex:p"] == [{"@value": "keep"}, {"@id": "ex:b"}]


def test_compact_graph_and_skip_expansion_options():
    """Public `graph` option forces @graph wrapping (reference
    jsonld.js:196-199, 226-236); `skipExpansion` treats the input as
    already expanded (jsonld.js:168-175)."""
    from jsonld_js_ray import api
    doc = [{"@id": "http://e/a", "http://e/v": [{"@value": 1}]}]
    assert api.compact(doc, {}, {"graph": True}) == {
        "@graph": [{"@id": "http://e/a", "http://e/v": 1}]}
    assert api.compact(doc, {"v": "http://e/v"}, {"graph": True}) == {
        "@context": {"v": "http://e/v"},
        "@graph": [{"@id": "http://e/a", "v": 1}]}
    # without graph, a single node unwraps
    assert api.compact(doc, {}, {}) == {
        "@id": "http://e/a", "http://e/v": 1}
    assert api.compact(doc, {"v": "http://e/v"},
                       {"skipExpansion": True}) == {
        "@context": {"v": "http://e/v"}, "@id": "http://e/a", "v": 1}
