"""Context-processing / expansion edge cases SURVEY.md §7.4 flags as the
largest source of conformance failures (protected terms, @propagate,
previousContext reversion, scoped-context ordering, keyword aliases,
@graph containers, @included, @direction, @import)."""

import pytest

from jsonld_js_ray import api
from jsonld_js_ray.core.errors import JsonLdError

V = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_keyword_aliases():
    doc = {"@context": {"id": "@id", "type": "@type", "@vocab": V},
           "id": V + "a", "type": "T", "name": "x"}
    out = api.expand(doc)[0]
    assert out["@id"] == V + "a"
    assert out["@type"] == [V + "T"]


def test_protected_term_overridable_by_property_scoped():
    # property-scoped contexts may override protected terms
    doc = {"@context": {"@protected": True, "name": V + "name",
                        "detail": {"@id": V + "detail",
                                   "@context": {"name": V + "other"}}},
           "detail": {"name": "x"}}
    out = api.expand(doc)[0]
    assert out[V + "detail"] == [{V + "other": [{"@value": "x"}]}]


def test_propagate_true_type_scoped_persists():
    doc = {"@context": {"@vocab": V,
                        "Person": {"@id": V + "Person",
                                   "@context": {"@propagate": True,
                                                "alias": V + "aliased"}}},
           "@type": "Person",
           "child": {"alias": "kept"}}
    out = api.expand(doc)[0]
    nested = out[V + "child"][0]
    assert nested[V + "aliased"] == [{"@value": "kept"}]


def test_type_scoped_context_applies_in_type_lexicographic_order():
    doc = {"@context": {"@vocab": V,
                        "A": {"@id": V + "A",
                              "@context": {"p": V + "fromA"}},
                        "B": {"@id": V + "B",
                              "@context": {"p": V + "fromB"}}},
           "@type": ["B", "A"], "p": "x"}
    out = api.expand(doc)[0]
    # sorted types: A then B → B's scoped context wins (applied last)
    assert V + "fromB" in out


def test_property_scoped_then_local_context_order():
    doc = {"@context": {"@vocab": V,
                        "detail": {"@id": V + "detail",
                                   "@context": {"p": V + "scoped"}}},
           "detail": {"@context": {"p": V + "local"},
                      "p": "x"}}
    out = api.expand(doc)[0]
    # local @context processed after property-scoped → local wins
    assert out[V + "detail"] == [{V + "local": [{"@value": "x"}]}]


def test_graph_container():
    doc = {"@context": {"@vocab": V,
                        "claims": {"@id": V + "claims",
                                   "@container": "@graph"}},
           "claims": {"@id": V + "a", "name": "x"}}
    out = api.expand(doc)[0]
    item = out[V + "claims"][0]
    assert "@graph" in item
    assert item["@graph"][0]["@id"] == V + "a"


def test_included():
    doc = {"@context": {"@vocab": V},
           "@id": V + "a", "name": "x",
           "@included": [{"@id": V + "b", "name": "y"}]}
    out = api.expand(doc)[0]
    assert out["@included"] == [
        {"@id": V + "b", V + "name": [{"@value": "y"}]}]
    # flatten lifts included nodes to top level
    flat = api.flatten(doc)
    ids = {n["@id"] for n in flat}
    assert ids == {V + "a", V + "b"}


def test_direction_value_expansion():
    doc = {"@context": {"@vocab": V, "@language": "ar",
                        "@direction": "rtl"},
           "label": "x"}
    out = api.expand(doc)[0]
    assert out[V + "label"] == [
        {"@value": "x", "@language": "ar", "@direction": "rtl"}]


def test_import_context():
    snapshot = {
        "https://c/base.jsonld": {"@context": {"name": V + "name"}},
    }
    doc = {"@context": {"@import": "https://c/base.jsonld",
                        "extra": V + "extra"},
           "name": "x", "extra": "y"}
    out = api.expand(doc, {"contexts": snapshot})[0]
    assert out[V + "name"] == [{"@value": "x"}]
    assert out[V + "extra"] == [{"@value": "y"}]


def test_vocab_empty_string_resolves_to_base():
    doc = {"@context": {"@vocab": ""}, "name": "x"}
    out = api.expand(doc, {"base": "http://base.ex/doc"})
    assert out == [{"http://base.ex/docname": [{"@value": "x"}]}] or \
        out == [{"http://base.ex/name": [{"@value": "x"}]}]


def test_prefix_false_blocks_curie():
    doc = {"@context": {"pre": {"@id": V + "sub/", "@prefix": False}},
           "pre:thing": "x"}
    out = api.expand(doc)
    # without prefix flag, pre:thing is not a CURIE → treated as
    # absolute-ish IRI 'pre:thing'
    assert out == [] or "pre:thing" in out[0]


def test_type_none_keeps_value_untyped():
    doc = {"@context": {"p": {"@id": V + "p", "@type": "@none"}},
           "p": 5}
    out = api.expand(doc)[0]
    assert out[V + "p"] == [{"@value": 5}]


def test_language_map_none_key():
    doc = {"@context": {"label": {"@id": V + "label",
                                  "@container": "@language"},
                        "none": "@none"},
           "label": {"en": "cat", "@none": "plain", "none": "alias"}}
    out = api.expand(doc)[0]
    values = out[V + "label"]
    plains = [v for v in values if "@language" not in v]
    assert {p["@value"] for p in plains} == {"plain", "alias"}


def test_index_map_property_based():
    doc = {"@context": {"@vocab": V,
                        "post": {"@id": V + "post",
                                 "@container": "@index",
                                 "@index": "schema"},
                        "schema": V + "schema"},
           "post": {"v1": {"name": "a"}}}
    out = api.expand(doc)[0]
    item = out[V + "post"][0]
    assert item[V + "schema"] == [{"@value": "v1"}]
    assert "@index" not in item


def test_nested_nest():
    doc = {"@context": {"@vocab": V, "meta": "@nest"},
           "meta": {"meta": {"name": "deep"}}}
    out = api.expand(doc)[0]
    assert out[V + "name"] == [{"@value": "deep"}]


def test_reverse_with_set_container():
    doc = {"@context": {"@vocab": V,
                        "children": {"@reverse": V + "parent",
                                     "@container": "@set"}},
           "@id": V + "a", "children": [{"@id": V + "b"}]}
    out = api.expand(doc)[0]
    assert out["@reverse"][V + "parent"] == [{"@id": V + "b"}]


def test_expansion_of_null_values_removed():
    doc = {"@context": {"@vocab": V, "dropped": None},
           "@id": V + "a", "dropped": "x", "kept": "y"}
    out = api.expand(doc)[0]
    assert V + "kept" in out
    assert not any("dropped" in k for k in out)


def test_base_null_disables_resolution():
    doc = {"@context": {"@base": None}, "@id": "relative",
           "http://p": "v"}
    out = api.expand(doc, {"base": "http://doc.ex/"})
    # relative @id stays relative (warned) — node kept because it has
    # a property
    assert out[0]["@id"] == "relative"


def test_compact_keyword_aliases():
    ctx = {"id": "@id", "type": "@type", "@vocab": V}
    doc = [{"@id": V + "a", "@type": [V + "T"],
            V + "name": [{"@value": "x"}]}]
    out = api.compact(doc, ctx)
    assert out["id"] == V + "a"
    assert out["type"] == "T"


def test_compact_graph_id_container():
    ctx = {"@vocab": V,
           "graphs": {"@id": V + "graphs",
                      "@container": ["@graph", "@id"]}}
    doc = [{V + "graphs": [
        {"@id": V + "g1", "@graph": [{"@id": V + "a",
                                      V + "name": [{"@value": "x"}]}]}]}]
    out = api.compact(doc, ctx)
    assert V + "g1" in out["graphs"] or "g1" in str(out["graphs"])


def test_canonize_safe_mode_default():
    # canonize defaults safe=True (reference jsonld.js:570-575):
    # a dropped relative property must raise
    doc = {"@id": V + "a", "relative-prop": "x"}
    with pytest.raises(JsonLdError):
        api.canonize(doc)
    # expand (safe=False default) silently drops
    assert api.expand(doc) == []
