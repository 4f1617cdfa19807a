"""Expansion fixtures per FIXTURES.md §2 shapes; golden outputs derived
from the JSON-LD 1.1 spec examples (reference semantics:
/root/reference/lib/expand.js)."""

import json

import pytest

from jsonld_js_ray import api
from jsonld_js_ray.core.errors import JsonLdError

V = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_simple_vocab_terms():
    doc = {"@context": {"@vocab": V}, "@id": V + "x", "name": "n"}
    assert api.expand(doc) == [
        {"@id": V + "x", V + "name": [{"@value": "n"}]}]


def test_term_to_iri_mapping():
    doc = {"@context": {"name": "http://schema.org/name"}, "name": "n"}
    assert api.expand(doc) == [
        {"http://schema.org/name": [{"@value": "n"}]}]


def test_curie_expansion():
    doc = {"@context": {"schema": "http://schema.org/"},
           "schema:name": "n"}
    assert api.expand(doc) == [
        {"http://schema.org/name": [{"@value": "n"}]}]


def test_type_coercion_id():
    doc = {"@context": {"knows": {"@id": V + "knows", "@type": "@id"}},
           "knows": "http://other/bob"}
    assert api.expand(doc) == [
        {V + "knows": [{"@id": "http://other/bob"}]}]


def test_type_coercion_integer():
    doc = {"@context": {"age": {"@id": V + "age",
                                "@type": XSD + "integer"}},
           "age": 30}
    assert api.expand(doc) == [
        {V + "age": [{"@value": 30, "@type": XSD + "integer"}]}]


def test_base_resolution_of_id():
    doc = {"@id": "frag", "http://p": "v"}
    out = api.expand(doc, {"base": "http://ex.org/dir/doc"})
    assert out[0]["@id"] == "http://ex.org/dir/frag"


def test_language_default_and_override():
    doc = {"@context": {"@vocab": V, "@language": "en",
                        "plain": {"@id": V + "plain", "@language": None}},
           "label": "cat", "plain": "x"}
    out = api.expand(doc)[0]
    assert out[V + "label"] == [{"@value": "cat", "@language": "en"}]
    assert out[V + "plain"] == [{"@value": "x"}]


def test_language_map():
    doc = {"@context": {"label": {"@id": V + "label",
                                  "@container": "@language"}},
           "label": {"en": "cat", "de": "Katze"}}
    out = api.expand(doc)[0]
    assert out[V + "label"] == [
        {"@value": "Katze", "@language": "de"},
        {"@value": "cat", "@language": "en"}]


def test_list_and_set():
    doc = {"@context": {"@vocab": V,
                        "nums": {"@id": V + "nums", "@container": "@list"}},
           "nums": [1, 2], "tags": {"@set": ["a"]}}
    out = api.expand(doc)[0]
    assert out[V + "nums"] == [{"@list": [{"@value": 1}, {"@value": 2}]}]
    assert out[V + "tags"] == [{"@value": "a"}]


def test_index_container():
    doc = {"@context": {"post": {"@id": V + "post",
                                 "@container": "@index"}},
           "post": {"en": {"@id": V + "p1"}, "de": {"@id": V + "p2"}}}
    out = api.expand(doc)[0]
    assert out[V + "post"] == [
        {"@id": V + "p2", "@index": "de"},
        {"@id": V + "p1", "@index": "en"}]


def test_id_map():
    doc = {"@context": {"@vocab": V,
                        "post": {"@id": V + "post", "@container": "@id"}},
           "post": {"http://ex.org/p1": {"title": "t1"}}}
    out = api.expand(doc)[0]
    assert out[V + "post"] == [
        {"@id": "http://ex.org/p1", V + "title": [{"@value": "t1"}]}]


def test_type_map():
    doc = {"@context": {"@vocab": V,
                        "stuff": {"@id": V + "stuff",
                                  "@container": "@type"}},
           "stuff": {"Cat": {"@id": V + "felix"}}}
    out = api.expand(doc)[0]
    assert out[V + "stuff"] == [{"@id": V + "felix", "@type": [V + "Cat"]}]


def test_reverse_property():
    doc = {"@context": {"@vocab": V,
                        "parentOf": {"@reverse": V + "childOf"}},
           "@id": V + "a", "parentOf": {"@id": V + "b"}}
    out = api.expand(doc)[0]
    assert out["@reverse"] == {V + "childOf": [{"@id": V + "b"}]}


def test_nest():
    doc = {"@context": {"@vocab": V, "meta": "@nest"},
           "@id": V + "a", "meta": {"name": "x"}}
    out = api.expand(doc)[0]
    assert out[V + "name"] == [{"@value": "x"}]


def test_named_graph():
    doc = {"@context": {"@vocab": V}, "@id": V + "g1",
           "@graph": [{"@id": V + "a", "name": "x"}]}
    out = api.expand(doc)[0]
    assert out["@id"] == V + "g1"
    assert out["@graph"] == [
        {"@id": V + "a", V + "name": [{"@value": "x"}]}]


def test_json_literal():
    doc = {"@context": {"data": {"@id": V + "data", "@type": "@json"}},
           "data": {"b": 2, "a": 1}}
    out = api.expand(doc)[0]
    assert out[V + "data"] == [{"@value": {"b": 2, "a": 1},
                                "@type": "@json"}]


def test_scoped_context_property():
    doc = {"@context": {"@vocab": V,
                        "detail": {"@id": V + "detail",
                                   "@context": {"inner": V + "other"}}},
           "detail": {"inner": "x"}}
    out = api.expand(doc)[0]
    assert out[V + "detail"] == [{V + "other": [{"@value": "x"}]}]


def test_scoped_context_type():
    doc = {"@context": {"@vocab": V,
                        "Person": {"@id": V + "Person",
                                   "@context": {"name": V + "fullName"}}},
           "@type": "Person", "name": "Alice"}
    out = api.expand(doc)[0]
    assert out[V + "fullName"] == [{"@value": "Alice"}]
    assert out["@type"] == [V + "Person"]


def test_propagate_false_reversion():
    # type-scoped contexts don't propagate to nested nodes by default
    doc = {"@context": {"@vocab": V,
                        "Person": {"@id": V + "Person",
                                   "@context": {"knows": {
                                       "@id": V + "knows"}}}},
           "@type": "Person",
           "knows": {"name": "Bob"}}
    out = api.expand(doc)[0]
    nested = out[V + "knows"][0]
    # nested node expanded with reverted context: 'name' via @vocab
    assert nested[V + "name"] == [{"@value": "Bob"}]


def test_keyword_lookalike_term_dropped():
    doc = {"@context": {"@vocab": V}, "@foo": "bar", "name": "x"}
    out = api.expand(doc)[0]
    assert V + "name" in out
    assert not any("foo" in k for k in out)


def test_free_floating_scalar_dropped():
    assert api.expand(["x", 42]) == []


def test_value_null_dropped():
    doc = {"@context": {"@vocab": V}, "@id": V + "a",
           "p": {"@value": None}}
    assert api.expand(doc) == []


def test_relative_id_kept_but_node_with_only_id_dropped():
    doc = {"@id": "relative-only"}
    assert api.expand(doc) == []


def test_invalid_value_object_error():
    doc = {"@context": {"@vocab": V}, "@id": V + "a",
           "p": {"@value": "x", "@id": V + "y"}}
    with pytest.raises(JsonLdError) as e:
        api.expand(doc)
    assert e.value.code == "invalid value object"


def test_colliding_keywords_error():
    doc = {"@context": {"id1": "@id", "id2": "@id"},
           "id1": "http://a", "id2": "http://b", "http://p": "v"}
    with pytest.raises(JsonLdError) as e:
        api.expand(doc)
    assert e.value.code == "colliding keywords"


def test_protected_term_redefinition_error():
    doc = {"@context": [{"@protected": True, "name": V + "name"},
                        {"name": V + "other"}],
           "name": "x"}
    with pytest.raises(JsonLdError) as e:
        api.expand(doc)
    assert e.value.code == "protected term redefinition"


def test_remote_context_snapshot():
    snapshot = {"https://ctx.example/v1.jsonld":
                {"@context": {"name": V + "name"}}}
    doc = {"@context": "https://ctx.example/v1.jsonld", "name": "x"}
    out = api.expand(doc, {"contexts": snapshot})
    assert out == [{V + "name": [{"@value": "x"}]}]


def test_chained_remote_context():
    snapshot = {
        "https://ctx.example/a.jsonld":
            {"@context": ["https://ctx.example/b.jsonld",
                          {"extra": V + "extra"}]},
        "https://ctx.example/b.jsonld": {"@context": {"name": V + "name"}},
    }
    doc = {"@context": "https://ctx.example/a.jsonld",
           "name": "x", "extra": "y"}
    out = api.expand(doc, {"contexts": snapshot})
    assert out == [{V + "extra": [{"@value": "y"}],
                    V + "name": [{"@value": "x"}]}]


def test_cyclic_remote_context_error():
    snapshot = {"https://c/a": {"@context": "https://c/b"},
                "https://c/b": {"@context": "https://c/a"}}
    # cycle code is mode-dependent (reference ContextResolver.js:147-157)
    with pytest.raises(JsonLdError) as e:
        api.expand({"@context": "https://c/a", "http://p": 1},
                   {"contexts": snapshot})
    assert e.value.code == "context overflow"
    with pytest.raises(JsonLdError) as e:
        api.expand({"@context": "https://c/a", "http://p": 1},
                   {"contexts": snapshot,
                    "processingMode": "json-ld-1.0"})
    assert e.value.code == "recursive context inclusion"


def test_input_not_mutated():
    doc = {"@context": {"@vocab": V}, "@id": V + "a",
           "nested": {"name": "x"}, "@type": "T"}
    snap = json.dumps(doc, sort_keys=True)
    api.expand(doc)
    assert json.dumps(doc, sort_keys=True) == snap


def test_safe_mode_raises_on_dropped_property():
    doc = {"relative": "x", "@id": "http://ex.org/a"}
    with pytest.raises(JsonLdError):
        api.expand(doc, {"safe": True})
    # non-safe: silently dropped
    out = api.expand(doc)
    assert out == []


def test_context_overflow_code():
    """MAX_CONTEXT_URLS analog uses the spec's 'context overflow' code."""
    import pytest as _pytest
    from jsonld_js_ray.core.errors import JsonLdError
    ctxs = {}
    for i in range(12):
        ctxs[f"http://ctx.example/c{i}.jsonld"] = {
            "@context": [f"http://ctx.example/c{i+1}.jsonld"] if i < 11
            else {"name": "http://e/name"}}
    with _pytest.raises(JsonLdError) as ei:
        api.expand({"@context": "http://ctx.example/c0.jsonld",
                    "@id": "http://e/a", "name": "x"},
                   {"contexts": ctxs})
    assert ei.value.code == "context overflow"
