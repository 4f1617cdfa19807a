"""Flatten + fromRDF fixtures (reference semantics:
/root/reference/lib/flatten.js, lib/fromRdf.js)."""

from jsonld_js_ray import api

V = "http://ex.org/"


def test_flatten_relabels_bnodes_in_order():
    doc = {"@context": {"@vocab": V},
           "name": "a", "knows": {"name": "b", "knows": {"name": "c"}}}
    out = api.flatten(doc)
    ids = [n["@id"] for n in out]
    assert ids == ["_:b0", "_:b1", "_:b2"]
    # sorted by @id; each node carries its own properties
    assert out[0][V + "name"] == [{"@value": "a"}]


def test_flatten_merges_duplicate_subjects():
    doc = [{"@id": V + "a", V + "p": [{"@value": 1}]},
           {"@id": V + "a", V + "p": [{"@value": 1}, {"@value": 2}]}]
    out = api.flatten(doc)
    assert out == [{"@id": V + "a",
                    V + "p": [{"@value": 1}, {"@value": 2}]}]


def test_flatten_named_graphs_fold_into_default():
    doc = {"@context": {"@vocab": V}, "@id": V + "g",
           "@graph": [{"@id": V + "a", "name": "x"}]}
    out = api.flatten(doc)
    by_id = {n["@id"]: n for n in out}
    assert V + "g" in by_id
    assert by_id[V + "g"]["@graph"] == [
        {"@id": V + "a", V + "name": [{"@value": "x"}]}]


def test_flatten_with_context_compacts():
    ctx = {"@vocab": V}
    doc = {"@context": ctx, "@id": V + "a", "name": "x"}
    out = api.flatten(doc, ctx)
    assert out["@context"] == ctx
    graph = out["@graph"]
    assert graph == [{"@id": V + "a", "name": "x"}]


def test_fromrdf_roundtrip_with_lists():
    doc = {"@context": {"@vocab": V}, "@id": V + "s",
           "l": {"@list": [1, 2, 3]}, "p": "v"}
    nq = api.to_nquads(doc)
    back = api.from_rdf(nq, {"useNativeTypes": True})
    # reference quirk: under useNativeTypes the xsd:string suppression
    # is bypassed (fromRdf.js:351-377 else-branch), so plain strings
    # carry an explicit @type (verified differentially, fuzz seeds
    # 46/57)
    xsd_string = "http://www.w3.org/2001/XMLSchema#string"
    assert back == [{"@id": V + "s",
                     V + "l": [{"@list": [{"@value": 1}, {"@value": 2},
                                          {"@value": 3}]}],
                     V + "p": [{"@value": "v", "@type": xsd_string}]}]


def test_fromrdf_empty_list():
    nq = (f"<{V}s> <{V}l> "
          "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n")
    back = api.from_rdf(nq)
    assert back == [{"@id": V + "s", V + "l": [{"@list": []}]}]


def test_fromrdf_shared_list_node_not_collapsed():
    # list node referenced twice → cannot be reconstructed as @list
    nq = (
        f'_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .\n'
        f"_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n"
        f"<{V}s> <{V}p> _:l .\n"
        f"<{V}t> <{V}p> _:l .\n")
    back = api.from_rdf(nq)
    by_id = {n["@id"]: n for n in back}
    assert {"@id": "_:l"} in by_id[V + "s"][V + "p"] or \
        by_id[V + "s"][V + "p"][0].get("@id") == "_:l"


def test_fromrdf_types():
    nq = (f"<{V}s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
          f"<{V}T> .\n")
    back = api.from_rdf(nq)
    assert back == [{"@id": V + "s", "@type": [V + "T"]}]
    back2 = api.from_rdf(nq, {"useRdfType": True})
    assert back2 == [{"@id": V + "s",
                      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type":
                          [{"@id": V + "T"}]}]


def test_fromrdf_named_graph():
    nq = f'<{V}a> <{V}p> "v" <{V}g> .\n'
    back = api.from_rdf(nq)
    assert back == [{"@id": V + "g", "@graph": [
        {"@id": V + "a", V + "p": [{"@value": "v"}]}]}]


def test_fromrdf_native_types():
    nq = (f'<{V}s> <{V}i> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
          f'<{V}s> <{V}d> "2.5E0"^^'
          '<http://www.w3.org/2001/XMLSchema#double> .\n'
          f'<{V}s> <{V}b> "true"^^'
          '<http://www.w3.org/2001/XMLSchema#boolean> .\n')
    back = api.from_rdf(nq, {"useNativeTypes": True})
    node = back[0]
    assert node[V + "i"] == [{"@value": 5}]
    assert node[V + "d"] == [{"@value": 2.5}]
    assert node[V + "b"] == [{"@value": True}]


def test_full_roundtrip_expand_tordf_fromrdf():
    doc = {"@context": {"@vocab": V, "@language": "en"},
           "@id": V + "a", "label": "cat",
           "nested": {"@id": V + "b", "p": "x"}}
    expanded = api.expand(doc)
    back = api.from_rdf(api.to_nquads(doc))
    # same triples: flatten both and compare as sets of (s,p,json(v))
    flat1 = api.flatten(expanded)
    flat2 = api.flatten(back)
    assert flat1 == flat2


def test_native_type_conversion_reference_exact():
    """fromRdf useNativeTypes mirrors the reference exactly (V8-checked
    decision table): booleans accept 1/0; integers convert only when the
    ES toFixed(0) round-trips the lexical form (non-canonical numerics
    stay UNTYPED strings, the reference's quirk); NaN never converts."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    def one(lit, dt):
        out = api.from_rdf(
            f'<http://e/a> <http://e/p> "{lit}"^^<{XSD}{dt}> .\n',
            {"useNativeTypes": True})
        return out[0]["http://e/p"][0]
    assert one("1", "boolean") == {"@value": True}
    assert one("0", "boolean") == {"@value": False}
    assert one("yes", "boolean") == {"@value": "yes",
                                     "@type": XSD + "boolean"}
    assert one("30", "integer") == {"@value": 30}
    assert one("007", "integer") == {"@value": "007"}
    assert one("999999999999999999999999", "integer") == \
        {"@value": "999999999999999999999999"}
    assert one("9007199254740993", "integer") == \
        {"@value": "9007199254740993"}
    assert one("NaN", "double") == {"@value": "NaN",
                                    "@type": XSD + "double"}
    assert one("1.5E0", "double") == {"@value": 1.5}
    # JS radix-literal quirk (Number('0x10')=16 makes isNumeric true;
    # parseInt(.,10)/parseFloat both read the leading "0"): integers
    # fail the toFixed gate and stay UNTYPED strings, doubles become 0
    assert one("0x10", "integer") == {"@value": "0x10"}
    assert one("0x10", "double") == {"@value": 0.0}
    assert one("0o7", "integer") == {"@value": "0o7"}
    assert one("0b1", "double") == {"@value": 0.0}
    # a sign or bad digit makes Number() NaN -> not numeric -> typed
    assert one("-0x10", "integer") == {"@value": "-0x10",
                                       "@type": XSD + "integer"}
    assert one("0xg1", "double") == {"@value": "0xg1",
                                     "@type": XSD + "double"}
