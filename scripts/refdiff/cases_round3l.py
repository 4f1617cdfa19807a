"""Round-3 batch l: frame option matrix (global omitDefault / explicit /
requireAll via API options), reverse+set containers, @none graph keys,
term @language validation, rdf:List typed nodes. Differential."""

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_CTX = {"@vocab": EX, "ex": EX}

CASES = [
    # ---------------- frame global options ------------------------------
    {"suite": "frame", "id": "fm059", "op": "frame",
     "name": "global omitDefault option suppresses @null fill-ins",
     "options": {"omitDefault": True},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T", "name": "A"},
         {"@id": "ex:b", "@type": "T"}]},
     "frame": {"@context": _CTX, "@type": "T", "name": {}}},
    {"suite": "frame", "id": "fm060", "op": "frame",
     "name": "global explicit option drops unframed properties",
     "options": {"explicit": True},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A", "extra": "E"}]},
     "frame": {"@context": _CTX, "name": {}}},
    {"suite": "frame", "id": "fm061", "op": "frame",
     "name": "global requireAll option needs every frame property",
     "options": {"requireAll": True},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A", "size": 1},
         {"@id": "ex:b", "name": "B"}]},
     "frame": {"@context": _CTX, "name": {}, "size": {}}},
    {"suite": "frame", "id": "fm062", "op": "frame",
     "name": "in-frame @requireAll false overrides global true",
     "options": {"requireAll": True},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A", "size": 1},
         {"@id": "ex:b", "name": "B"}]},
     "frame": {"@context": _CTX, "@requireAll": False,
               "name": {}, "size": {}}},
    {"suite": "frame", "id": "fm063", "op": "frame",
     "name": "global embed @always re-embeds everywhere",
     "options": {"embed": "@always"},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "child": {"@id": "ex:c"}},
         {"@id": "ex:b", "child": {"@id": "ex:c"}},
         {"@id": "ex:c", "name": "C"}]},
     "frame": {"@context": _CTX, "child": {}}},
    # ---------------- reverse + containers -------------------------------
    {"suite": "expand", "id": "t0255", "op": "expand",
     "name": "reverse term with @container @set expands normally",
     "input": {"@context": {"@vocab": EX,
                            "childOf": {"@reverse": EX + "parentOf",
                                        "@container": "@set"}},
               "@id": EX + "a",
               "childOf": [{"@id": EX + "b"}, {"@id": EX + "c"}]}},
    {"suite": "compact", "id": "c102", "op": "compact",
     "name": "reverse term with @set container keeps array",
     "input": [{"@id": EX + "a",
                "@reverse": {EX + "parentOf": [{"@id": EX + "b"}]}}],
     "context": {"childOf": {"@reverse": EX + "parentOf",
                             "@container": "@set"}}},
    # ---------------- @none graph keys -----------------------------------
    {"suite": "expand", "id": "t0256", "op": "expand",
     "name": "@none key in @graph @id container makes default-graph entry",
     "input": {"@context": {"@vocab": EX,
                            "graphs": {"@id": EX + "claims",
                                       "@container": ["@graph", "@id"]}},
               "graphs": {"@none": {"v": 1},
                          EX + "g1": {"v": 2}}}},
    {"suite": "compact", "id": "c103", "op": "compact",
     "name": "graph object without @id compacts under @none in @graph @id map",
     "input": [{"@id": EX + "a",
                EX + "claims": [
                    {"@graph": [{EX + "v": [{"@value": 1}]}]},
                    {"@graph": [{EX + "v": [{"@value": 2}]}],
                     "@id": EX + "g1"}]}],
     "context": {"@vocab": EX,
                 "graphs": {"@id": EX + "claims",
                            "@container": ["@graph", "@id"]}}},
    # ---------------- term @language validation --------------------------
    {"suite": "expand", "id": "t0257", "op": "expand",
     "name": "non-string term @language fails",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@language": 5}},
               "p": "x"}},
    {"suite": "expand", "id": "t0258", "op": "expand",
     "name": "term @language null blocks default language",
     "input": {"@context": {"@vocab": EX, "@language": "en",
                            "raw": {"@id": EX + "raw",
                                    "@language": None}},
               "raw": "untagged", "tagged": "gets-en"}},
    {"suite": "expand", "id": "t0259", "op": "expand",
     "name": "term @language uppercase normalizes in value expansion",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p",
                                  "@language": "DE-CH"}},
               "p": "hallo"}},
    # ---------------- rdf:List typed nodes -------------------------------
    {"suite": "fromRdf", "id": "fr051", "op": "fromRDF",
     "name": "list node with explicit rdf:type rdf:List still folds",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'_:l0 <{RDF}type> <{RDF}List> .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> <{RDF}nil> .\n')},
    {"suite": "fromRdf", "id": "fr052", "op": "fromRDF",
     "name": "list node with a non-List rdf:type is not folded",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'_:l0 <{RDF}type> <{EX}Other> .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> <{RDF}nil> .\n')},
    # ---------------- misc ------------------------------------------------
    {"suite": "expand", "id": "t0260", "op": "expand",
     "name": "index container value array under one key flattens",
     "input": {"@context": {"@vocab": EX,
                            "byIdx": {"@id": EX + "p",
                                      "@container": "@index"}},
               "byIdx": {"i": ["a", "b"]}}},
    {"suite": "expand", "id": "t0261", "op": "expand",
     "name": "graph container wraps each array element as its own graph",
     "input": {"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": "@graph"}},
               "claims": [{"@id": EX + "n1", "v": 1},
                          {"@id": EX + "n2", "v": 2}]}},
    {"suite": "compact", "id": "c104", "op": "compact",
     "name": "deeply aliased keywords compact through alias chain",
     "input": [{"@id": EX + "a",
                EX + "p": [{"@list": [{"@value": "x",
                                       "@language": "en"}]}]}],
     "context": {"@vocab": EX, "lst": "@list", "lang": "@language",
                 "val": "@value"}},
]
