"""Round-3 batch j: odd term shapes ('@', single char, scheme-like),
type compaction ordering, literal escaping through N-Quads, duplicate
triple dedup, null-@vocab overrides, @index preservation. Differential."""

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_CTX = {"@vocab": EX, "ex": EX}

CASES = [
    # ---------------- odd term shapes ----------------------------------
    {"suite": "expand", "id": "t0221", "op": "expand",
     "name": "bare '@' is a regular term (does not match keyword regex)",
     "input": {"@context": {"@": EX + "at"},
               "@id": EX + "a", "@": "v"}},
    {"suite": "expand", "id": "t0222", "op": "expand",
     "name": "single-character and digit-leading terms work",
     "input": {"@context": {"x": EX + "x", "1st": EX + "first"},
               "@id": EX + "a", "x": 1, "1st": 2}},
    {"suite": "expand", "id": "t0223", "op": "expand",
     "name": "term shaped like a URI scheme does not leak as prefix",
     "input": {"@context": {"http": EX + "httpTerm"},
               "@id": EX + "a",
               "http": "v",
               "http://absolute.example/p": "w"}},
    {"suite": "expand", "id": "t0224", "op": "expand",
     "name": "prefix that maps to a keyword cannot form a CURIE",
     "input": {"@context": {"kw": "@type", "kw:suffix": EX + "q"},
               "@id": EX + "a", "kw:suffix": "v"}},
    {"suite": "expand", "id": "t0225", "op": "expand",
     "name": "nested context nulls @vocab, properties drop",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@context": {
                                "@vocab": None}}},
               "p": {"unmapped": "dropped", "@id": EX + "b"}}},
    # ---------------- type compaction ordering -------------------------
    {"suite": "compact", "id": "c098", "op": "compact",
     "name": "multiple @type values keep expanded order after compaction",
     "input": [{"@id": EX + "a",
                "@type": [EX + "Zeta", EX + "Alpha", EX + "Mid"]}],
     "context": {"@vocab": EX}},
    {"suite": "compact", "id": "c099", "op": "compact",
     "name": "mixed term and CURIE types compact independently",
     "input": [{"@id": EX + "a",
                "@type": [EX + "Known", "http://other.example/T"]}],
     "context": {"@vocab": EX, "oth": "http://other.example/"}},
    # ---------------- literal escaping through N-Quads -----------------
    {"suite": "toRdf", "id": "tr053", "op": "toRDF",
     "name": "control characters and quotes escape canonically",
     "input": {"@context": _CTX, "@id": "ex:a",
               "v": "line1\nline2\t\"quoted\"\\backslash\r"}},
    {"suite": "toRdf", "id": "tr054", "op": "toRDF",
     "name": "astral-plane and non-ASCII text survives quad round-trip",
     "input": {"@context": _CTX, "@id": "ex:a",
               "v": "emoji \U0001F600 and ünïcode"}},
    {"suite": "fromRdf", "id": "fr049", "op": "fromRDF",
     "name": "escaped literal forms decode on parse",
     "input": (f'<{EX}a> <{EX}v> "tab\\there\\nnewline" .\n'
               f'<{EX}a> <{EX}w> "u\\u00FCber" .\n')},
    # ---------------- duplicate handling --------------------------------
    # NOTE: duplicate lines collapse at N-QUADS PARSE (a dataset is a
    # set; real rdf-canonize adds a quad only if unique in its graph).
    # Past the parser the reference KEEPS duplicates (addValue defaults
    # allowDuplicate=true, util.js:254-255) — mirrored in from_rdf.py.
    {"suite": "fromRdf", "id": "fr050", "op": "fromRDF",
     "name": "duplicate N-Quads lines collapse at parse",
     "input": (f'<{EX}a> <{EX}v> "x" .\n'
               f'<{EX}a> <{EX}v> "x" .\n')},
    {"suite": "toRdf", "id": "tr055", "op": "toRDF",
     "name": "duplicate expanded values emit one quad each",
     "input": {"@context": _CTX, "@id": "ex:a",
               "v": ["x", "x", "y"]}},
    {"suite": "expand", "id": "t0226", "op": "expand",
     "name": "duplicate values are NOT deduped at expansion",
     "input": {"@context": _CTX, "@id": "ex:a",
               "v": ["x", "x"]}},
    # ---------------- @index preservation ------------------------------
    {"suite": "compact", "id": "c100", "op": "compact",
     "name": "@index preserved as property when container lacks @index",
     "input": [{"@id": EX + "a",
                EX + "p": [{"@value": "v", "@index": "kept"}]}],
     "context": {"@vocab": EX}},
    {"suite": "compact", "id": "c101", "op": "compact",
     "name": "node @index survives compaction alongside properties",
     "input": [{"@id": EX + "a", "@index": "ndx",
                EX + "p": [{"@value": 1}]}],
     "context": {"@vocab": EX}},
    # ---------------- graph default alias ------------------------------
    {"suite": "expand", "id": "t0227", "op": "expand",
     "name": "explicit @graph alias at nested node keeps graph object",
     "input": {"@context": {"@vocab": EX, "g": "@graph"},
               "@id": EX + "a",
               "claims": {"g": {"@id": EX + "n", "v": 1}}}},
    {"suite": "frame", "id": "fm057", "op": "frame",
     "name": "frame matching on @index is ignored for matching",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@index": "i1", "name": "A"},
         {"@id": "ex:b", "name": "B"}]},
     "frame": {"@context": _CTX, "name": {}}},
    {"suite": "frame", "id": "fm058", "op": "frame",
     "name": "bnode input framed by wildcard keeps relabeled ids",
     "input": {"@context": _CTX, "@graph": [
         {"name": "anon1", "child": {"name": "anon2"}}]},
     "frame": {"@context": _CTX, "name": {}, "child": {}}},
]
