"""toRDF / N-Quads / literal canonical-form fixtures (reference semantics:
/root/reference/lib/toRdf.js:293-367 literal typing)."""

import pytest

from jsonld_js_ray import api
from jsonld_js_ray.core.literals import (
    canonical_double, es6_number_str, jcs_canonicalize,
)
from jsonld_js_ray.core.nquads import parse, serialize

V = "http://ex.org/"


def nq(doc, **opts):
    return api.to_nquads(doc, opts or None)


def test_literal_typing_golden():
    doc = {"@context": {"@vocab": V}, "@id": V + "s",
           "b": True, "i": 5, "d": 2.5, "f": 5.0, "s": "str"}
    out = nq(doc)
    assert f'<{V}s> <{V}b> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .' in out
    assert f'<{V}s> <{V}i> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .' in out
    assert f'<{V}s> <{V}d> "2.5E0"^^<http://www.w3.org/2001/XMLSchema#double> .' in out
    # JS has no int/float distinction: 5.0 → integer (types.js:35)
    assert f'<{V}s> <{V}f> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .' in out
    assert f'<{V}s> <{V}s> "str" .' in out


@pytest.mark.parametrize("value,expected", [
    (2.5, "2.5E0"), (1.75, "1.75E0"), (0.1, "1.0E-1"),
    (1e21, "1.0E21"), (-4.2, "-4.2E0"), (123456.789, "1.23456789E5"),
    (1.0e-10, "1.0E-10"),
])
def test_canonical_double(value, expected):
    # JS: toExponential(15).replace(/(\d)0*e\+?/, '$1E') — the captured
    # digit keeps ONE fractional zero when the whole fraction was zeros
    # (V8-checked: 0.1 -> "1.0E-1", 1e21 -> "1.0E21"); toRdf.js:300-306
    assert canonical_double(value) == expected


def test_language_literal():
    doc = {"@context": {"@vocab": V, "@language": "en"},
           "@id": V + "s", "label": "cat"}
    assert f'<{V}s> <{V}label> "cat"@en .' in nq(doc)


def test_i18n_direction_datatype():
    doc = {"@context": {"@vocab": V, "@language": "ar",
                        "@direction": "rtl"},
           "@id": V + "s", "label": "x"}
    out = nq(doc, rdfDirection="i18n-datatype")
    assert ('"x"^^<https://www.w3.org/ns/i18n#ar_rtl>') in out


def test_json_literal_jcs():
    doc = {"@context": {"data": {"@id": V + "data", "@type": "@json"}},
           "@id": V + "s", "data": {"b": [2, 1.5], "a": "x"}}
    out = nq(doc)
    assert ('"{\\"a\\":\\"x\\",\\"b\\":[2,1.5]}"'
            '^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>') in out


def test_list_chain_golden():
    doc = {"@context": {"@vocab": V,
                        "l": {"@id": V + "l", "@container": "@list"}},
           "@id": V + "s", "l": ["a"]}
    out = nq(doc)
    assert f"<{V}s> <{V}l> _:b0 ." in out
    assert ('_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .'
            ) in out
    assert ("_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> "
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .") in out


def test_empty_list_is_nil():
    doc = {"@context": {"@vocab": V}, "@id": V + "s",
           "l": {"@list": []}}
    out = nq(doc)
    assert (f"<{V}s> <{V}l> "
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .") in out


def test_named_graph_quads():
    doc = {"@context": {"@vocab": V}, "@id": V + "g",
           "@graph": [{"@id": V + "a", "p": "v"}]}
    out = nq(doc)
    assert f'<{V}a> <{V}p> "v" <{V}g> .' in out


def test_bnode_predicate_dropped_by_default():
    expanded = [{"@id": V + "s", "_:p": [{"@value": "v"}]}]
    quads = api.to_rdf(expanded, {"skipExpansion": True})
    assert quads == []
    quads = api.to_rdf(expanded, {"skipExpansion": True,
                                  "produceGeneralizedRdf": True})
    assert len(quads) == 1


def test_relative_subject_dropped():
    expanded = [{"@id": "relative", "http://p": [{"@value": "v"}]}]
    assert api.to_rdf(expanded, {"skipExpansion": True}) == []


def test_escaping_roundtrip():
    doc = {"@context": {"@vocab": V}, "@id": V + "s",
           "p": 'line1\nline2\t"quoted"\\back'}
    out = nq(doc)
    assert '\\n' in out and '\\t' in out and '\\"' in out and '\\\\' in out
    quads = parse(out)
    assert quads[0][3] == 'line1\nline2\t"quoted"\\back'


def test_nquads_parse_serialize_roundtrip():
    text = (
        f'<{V}s> <{V}p> "v" .\n'
        f'<{V}s> <{V}q> <{V}o> <{V}g> .\n'
        f'_:b0 <{V}p> "x"@en-US .\n'
        f'_:b0 <{V}p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> _:b1 .\n'
    )
    quads = parse(text)
    assert serialize(quads) == text


def test_type_becomes_rdf_type():
    doc = {"@context": {"@vocab": V}, "@id": V + "s", "@type": "T"}
    out = nq(doc)
    assert (f"<{V}s> "
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
            f"<{V}T> .") in out


@pytest.mark.parametrize("v,expected", [
    (1, "1"), (1.5, "1.5"), (1e21, "1e+21"), (1e-7, "1e-7"),
    (0.000001, "0.000001"), (-2.5, "-2.5"), (100.0, "100"),
    (3.141592653589793, "3.141592653589793"),
])
def test_es6_number_str(v, expected):
    assert es6_number_str(v) == expected


def test_jcs_sorting_and_unicode():
    assert jcs_canonicalize({"b": 1, "a": 2}) == '{"a":2,"b":1}'
    assert jcs_canonicalize({"é": "ü"}) == '{"é":"ü"}'
    assert jcs_canonicalize([True, None, False]) == "[true,null,false]"


def test_canonical_integer_es_tofixed_rule():
    """ES toFixed(0): sign first, half-up on magnitude (V8-checked)."""
    from jsonld_js_ray.core.literals import canonical_integer
    assert canonical_integer(-1e-7) == "-0"
    assert canonical_integer(-1.5) == "-2"
    assert canonical_integer(2.5) == "3"
    assert canonical_integer(-0.5) == "-1"
    assert canonical_integer(-0.0) == "0"
    assert canonical_integer(1.2345678901234568e+20) == \
        "123456789012345683968"


def test_es6_number_str_above_2_53():
    """ES pads SHORTEST digits with zeros above 2^53, not the exact
    integer value (V8: JSON.stringify(1.2345678901234568e20))."""
    from jsonld_js_ray.core.literals import es6_number_str
    assert es6_number_str(1.2345678901234568e+20) == \
        "123456789012345680000"
    assert es6_number_str(9007199254740996.0) == "9007199254740996"
    assert es6_number_str(123456789012345683968.0) == \
        "123456789012345680000"


# --- rdfDirection: compound-literal (spec superset; reference v9.0.1-0
# raises "Unsupported rdfDirection value." at toRdf.js:316-321 /
# fromRdf.js:65-70 — NOTES_r4 documented divergence) ---

def test_compound_literal_emit():
    doc = {"@context": {"@vocab": V, "@language": "AR",
                        "@direction": "rtl"},
           "@id": V + "s", "label": "x"}
    out = nq(doc, rdfDirection="compound-literal")
    lines = sorted(out.strip().split("\n"))
    # fresh bnode object + rdf:value / rdf:language (lowercased) /
    # rdf:direction as plain (xsd:string) literals
    assert any(f'<{V}s> <{V}label> _:' in ln for ln in lines)
    assert '<http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .' \
        in out
    assert '<http://www.w3.org/1999/02/22-rdf-syntax-ns#language> "ar" .' \
        in out
    assert '<http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "rtl" .' \
        in out


def test_compound_literal_no_language():
    doc = {"@context": {"@vocab": V, "@direction": "ltr"},
           "@id": V + "s", "label": "y"}
    out = nq(doc, rdfDirection="compound-literal")
    assert "rdf-syntax-ns#language" not in out
    assert '<http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "ltr" .' \
        in out


def test_compound_literal_roundtrip():
    doc = {"@context": {"@vocab": V, "@language": "ar",
                        "@direction": "rtl"},
           "@id": V + "s", "label": "x"}
    out = nq(doc, rdfDirection="compound-literal")
    back = api.from_rdf(out, {"rdfDirection": "compound-literal"})
    assert back == [{"@id": V + "s", V + "label":
                     [{"@value": "x", "@language": "ar",
                       "@direction": "rtl"}]}]


def test_compound_literal_roundtrip_no_language():
    doc = {"@context": {"@vocab": V, "@direction": "ltr"},
           "@id": V + "s", "label": "y"}
    back = api.from_rdf(nq(doc, rdfDirection="compound-literal"),
                        {"rdfDirection": "compound-literal"})
    assert back == [{"@id": V + "s", V + "label":
                     [{"@value": "y", "@direction": "ltr"}]}]


def test_compound_literal_fromrdf_ignored_without_option():
    # without rdfDirection, the compound bnode stays a plain node object
    doc = {"@context": {"@vocab": V, "@direction": "ltr"},
           "@id": V + "s", "label": "y"}
    back = api.from_rdf(nq(doc, rdfDirection="compound-literal"))
    by_id = {n["@id"]: n for n in back}
    node = by_id[V + "s"]
    ref = node[V + "label"][0]
    assert "@id" in ref and ref["@id"].startswith("_:")
    cl = by_id[ref["@id"]]
    assert cl["http://www.w3.org/1999/02/22-rdf-syntax-ns#direction"] == \
        [{"@value": "ltr"}]


def test_compound_literal_twice_referenced_not_collapsed():
    # spec step 6.1.1: only once-referenced compound nodes convert
    nq_text = (
        f'<{V}a> <{V}p> _:c .\n'
        f'<{V}b> <{V}p> _:c .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "ltr" .\n'
    )
    back = api.from_rdf(nq_text, {"rdfDirection": "compound-literal"})
    ids = {n["@id"] for n in back}
    assert any(i.startswith("_:") for i in ids)  # compound node survives


def test_compound_literal_bad_direction_raises():
    nq_text = (
        f'<{V}a> <{V}p> _:c .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "up" .\n'
    )
    from jsonld_js_ray.core.errors import JsonLdError
    with pytest.raises(JsonLdError) as ei:
        api.from_rdf(nq_text, {"rdfDirection": "compound-literal"})
    assert ei.value.code == "invalid base direction"


def test_compound_literal_bad_language_raises():
    nq_text = (
        f'<{V}a> <{V}p> _:c .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#language> "9 9" .\n'
        '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "ltr" .\n'
    )
    from jsonld_js_ray.core.errors import JsonLdError
    with pytest.raises(JsonLdError) as ei:
        api.from_rdf(nq_text, {"rdfDirection": "compound-literal"})
    assert ei.value.code == "invalid language-tagged string"


def test_compound_literal_in_list():
    doc = {"@context": {"@vocab": V,
                        "p": {"@id": V + "p", "@container": "@list"}},
           "@id": V + "s",
           "p": [{"@value": "x", "@direction": "rtl",
                  "@language": "ar"}]}
    out = nq(doc, rdfDirection="compound-literal")
    back = api.from_rdf(out, {"rdfDirection": "compound-literal"})
    assert back == [{"@id": V + "s", V + "p":
                     [{"@list": [{"@value": "x", "@language": "ar",
                                  "@direction": "rtl"}]}]}]


def test_unknown_rdf_direction_still_raises():
    from jsonld_js_ray.core.errors import JsonLdError
    doc = {"@context": {"@vocab": V, "@direction": "ltr"},
           "@id": V + "s", "label": "y"}
    with pytest.raises(JsonLdError):
        nq(doc, rdfDirection="bogus")
    with pytest.raises(JsonLdError):
        api.from_rdf("", {"rdfDirection": "bogus"})


def test_type_map_null_key_yields_empty_datatype():
    """A type-map key expanding to null leaves a LIST @type on the value
    object; the reference uses it as the literal datatype via JS
    Array->string coercion with the truthy-array fallback skip: [null]
    serializes as ^^<> (toRdf.js:292-299 — `[null] || XSD` keeps the
    array; nodeMap.js:65-77 value branch is a silent Array.indexOf
    no-op). The empty datatype is invalid N-Quads, so this class is
    pinned here instead of the manifest (fuzz seed 7981)."""
    from jsonld_js_ray import api
    doc = {"@context": {"@version": 1.1,
                        "t": {"@id": "http://v/t", "@container": "@type"}},
           "@id": "http://n/s", "t": {"@foo": True}}
    quads = api.to_rdf(doc, {"base": "http://b/"})
    assert len(quads) == 1
    s, p, kind, v, dt, lang, g = quads[0]
    assert (s, p, v) == ("http://n/s", "http://v/t", "true")
    # truthy-array mirror: string value '' but JS-truthy AND never
    # strictly equal to any plain string (array === string is false)
    assert str(dt) == "" and bool(dt) is True and dt != ""


@pytest.mark.parametrize("s,expected", [
    ("leaf", "NaN"), ("3e", "3.0E0"), ("3e2", "3.0E2"),
    ("Infinity", "Infinity"), ("-Infinity", "-Infinity"),
    ("  +.5x", "5.0E-1"), ("12.5say", "1.25E1"), (".25", "2.5E-1"),
    ("", "NaN"), ("e5", "NaN"), ("+-1", "NaN"),
])
def test_js_parse_float_double_funnel(s, expected):
    # ES parseFloat semantics (longest valid decimal prefix, Infinity
    # allowed, NaN otherwise) feeding the canonical double form —
    # toRdf.js:300-306 funnels every non-double value with an exact
    # xsd:double datatype through it (V8-checked pairs)
    from jsonld_js_ray.core.literals import js_parse_float
    assert canonical_double(js_parse_float(s)) == expected
