"""Round-4 batch q: composition chaos — single documents combining
scoped contexts, containers, @reverse, graphs, @nest, protected terms
and framing in one shape, where feature interactions hide. Also full
op-chains (expand→compact round-trips via separate cases). Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BIG_CTX = {
    "@version": 1.1,
    "@vocab": EX,
    "@language": "en",
    "Person": {"@id": EX + "Person",
               "@context": {"knows": {"@id": EX + "knows",
                                      "@type": "@id"},
                            "aliases": {"@id": EX + "alias",
                                        "@container": ["@set"]}}},
    "byLang": {"@id": EX + "label", "@container": "@language"},
    "byId": {"@id": EX + "rel", "@container": "@id"},
    "meta": "@nest",
    "age": {"@id": EX + "age",
            "@type": "http://www.w3.org/2001/XMLSchema#integer",
            "@nest": "meta"},
    "childOf": {"@reverse": EX + "parentOf"},
    "claims": {"@id": EX + "claims",
               "@container": ["@graph", "@index"]},
}

_BIG_DOC = {
    "@context": _BIG_CTX,
    "@id": "urn:alice",
    "@type": "Person",
    "knows": "urn:bob",
    "aliases": ["Al", "Ali"],
    "byLang": {"en": "Alice", "fr": "Alicé"},
    "byId": {"urn:rel1": {"note": "first"}},
    "meta": {"age": 30},
    "childOf": {"@id": "urn:carol"},
    "claims": {"c1": {"statement": "s1"},
               "c2": {"statement": "s2"}},
}

c("expand", "t0466", "expand", "kitchen-sink composition expands", input=_BIG_DOC)
c("flatten", "f024", "flatten", "kitchen-sink flattens", input=_BIG_DOC)
c("toRdf", "tr092", "toRDF", "kitchen-sink to quads", input=_BIG_DOC)

_EXPANDED_SINK = [{
    "@id": "urn:alice",
    "@type": [EX + "Person"],
    EX + "knows": [{"@id": "urn:bob"}],
    EX + "alias": [{"@value": "Al", "@language": "en"},
                   {"@value": "Ali", "@language": "en"}],
    EX + "label": [{"@value": "Alice", "@language": "en"},
                   {"@value": "Alicé", "@language": "fr"}],
    EX + "rel": [{"@id": "urn:rel1",
                  EX + "note": [{"@value": "first",
                                 "@language": "en"}]}],
    EX + "age": [{"@value": 30,
                  "@type":
                  "http://www.w3.org/2001/XMLSchema#integer"}],
    "@reverse": {EX + "parentOf": [{"@id": "urn:carol"}]},
    EX + "claims": [
        {"@graph": [{EX + "statement": [{"@value": "s1",
                                         "@language": "en"}]}],
         "@index": "c1"},
        {"@graph": [{EX + "statement": [{"@value": "s2",
                                         "@language": "en"}]}],
         "@index": "c2"}],
}]

c("compact", "c198", "compact", "kitchen-sink compacts back",
  input=_EXPANDED_SINK, context=_BIG_CTX)
c("frame", "fm087", "frame", "kitchen-sink frames on @type",
  input=_BIG_DOC,
  frame={"@context": _BIG_CTX, "@type": "Person"})

# protected + scoped + propagate interplay
c("expand", "t0467", "expand",
  "protected root term reused under scoped override chain",
  input={"@context": {"@version": 1.1, "@protected": True,
                      "@vocab": EX,
                      "name": EX + "name",
                      "Org": {"@id": EX + "Org",
                              "@context": {"@propagate": True,
                                           "name": EX + "orgName"}}},
         "@id": "urn:o", "@type": "Org", "name": "Acme",
         "sub": {"@id": "urn:s", "name": "Unit"}})
c("expand", "t0468", "expand",
  "type-scoped @propagate false reverts after one level",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "T": {"@id": EX + "T",
                            "@context": {"@propagate": False,
                                         "p": EX + "scoped"}}},
         "@id": "urn:a", "@type": "T",
         "p": {"@id": "urn:b", "p": "deep"}})
c("expand", "t0469", "expand",
  "graph container inside nest inside reverse shape",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "meta": "@nest",
                      "g": {"@id": EX + "g", "@container": "@graph",
                            "@nest": "meta"}},
         "@id": "urn:a", "meta": {"g": {"p": "v"}}})
c("toRdf", "tr093", "toRDF", "reverse + graph + list in one node",
  input={"@context": {"@vocab": EX,
                      "childOf": {"@reverse": EX + "parentOf"},
                      "items": {"@id": EX + "items",
                                "@container": "@list"}},
         "@id": "urn:a",
         "childOf": {"@id": "urn:p"},
         "items": ["x", "y"],
         "@graph": [{"@id": "urn:inner", "p": "v"}]})
c("frame", "fm088", "frame", "frame inside graph-container content",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "claims": {"@id": EX + "claims",
                                 "@container": "@graph"}},
         "@id": "urn:a",
         "claims": {"@type": "Claim", "text": "t"}},
  frame={"@context": {"@version": 1.1, "@vocab": EX,
                      "claims": {"@id": EX + "claims",
                                 "@container": "@graph"}},
         "claims": {}})
