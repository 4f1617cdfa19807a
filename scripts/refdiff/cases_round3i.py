"""Round-3 batch i: safe-mode event-code surface (warnings become
errors carrying the event code), keyword-like property drops, relative
IRI reference warnings, toRDF safe mode. Differentially validated."""

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"

_CTX = {"@vocab": EX, "ex": EX}

CASES = [
    # ---------------- safe mode: expand --------------------------------
    {"suite": "expand", "id": "t0210", "op": "expand",
     "name": "safe: free-floating scalar becomes an error",
     "options": {"safe": True},
     "input": {"@context": _CTX,
               "@graph": ["floating",
                          {"@id": "ex:a", "p": "kept"}]}},
    {"suite": "expand", "id": "t0211", "op": "expand",
     "name": "safe: object with only @id becomes an error",
     "options": {"safe": True},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:only"}]}},
    {"suite": "expand", "id": "t0212", "op": "expand",
     "name": "safe: reserved term definition becomes an error",
     "options": {"safe": True},
     "input": {"@context": {"@foo": EX + "foo"},
               EX + "p": "v"}},
    {"suite": "expand", "id": "t0213", "op": "expand",
     "name": "safe: keyword-lookalike property becomes an error",
     "options": {"safe": True},
     "input": {"@context": _CTX, "@id": "ex:a",
               "@lookalike": "v"}},
    {"suite": "expand", "id": "t0214", "op": "expand",
     "name": "safe: relative @vocab reference becomes an error",
     "options": {"safe": True},
     "input": {"@context": {"@vocab": "rel/"},
               "@id": EX + "a", "p": "v"}},
    {"suite": "expand", "id": "t0215", "op": "expand",
     "name": "unsafe default: keyword-lookalike property is dropped",
     "input": {"@context": _CTX, "@id": "ex:a",
               "@lookalike": "v", "name": "kept"}},
    {"suite": "expand", "id": "t0216", "op": "expand",
     "name": "unsafe default: reserved @id value drops the node id",
     "input": {"@context": _CTX,
               "@id": "@reservedish", "name": "kept"}},
    # ---------------- safe mode: toRDF ---------------------------------
    {"suite": "toRdf", "id": "tr050", "op": "toRDF",
     "name": "safe: relative subject IRI becomes an error",
     "options": {"safe": True, "base": None},
     "input": {"@id": "relative", EX + "p": "v"}},
    {"suite": "toRdf", "id": "tr051", "op": "toRDF",
     "name": "safe: blank node predicate becomes an error",
     "options": {"safe": True},
     "input": {"@context": {"p": "_:bpred"},
               "@id": EX + "a", "p": "v"}},
    {"suite": "toRdf", "id": "tr052", "op": "toRDF",
     "name": "safe: direction without rdfDirection becomes an error",
     "options": {"safe": True},
     "input": {"@context": _CTX, "@id": "ex:a",
               "v": {"@value": "x", "@language": "ar",
                     "@direction": "rtl"}}},
    # ---------------- remaining IRI resolution edges --------------------
    {"suite": "expand", "id": "t0217", "op": "expand",
     "name": "dot-segment resolution against base with query",
     "options": {"base": EX + "a/b/c?q=1"},
     "input": {"@id": "../up", EX + "p": "v"}},
    {"suite": "expand", "id": "t0218", "op": "expand",
     "name": "fragment-only @id resolves against full base",
     "options": {"base": EX + "doc"},
     "input": {"@id": "#frag", EX + "p": "v"}},
    {"suite": "expand", "id": "t0219", "op": "expand",
     "name": "empty-string @id resolves to the base itself",
     "options": {"base": EX + "doc"},
     "input": {"@id": "", EX + "p": "v"}},
    {"suite": "expand", "id": "t0220", "op": "expand",
     "name": "query-only @id replaces base query",
     "options": {"base": EX + "doc?old=1"},
     "input": {"@id": "?new=2", EX + "p": "v"}},
]
