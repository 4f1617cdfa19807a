"""Round-4 batch b: kernel-corner probes not tied to a specific
reference test file — property-based @index, @prefix flag, empty
@vocab, omitGraph, expandContext, @nest/@included interactions,
list-of-lists, keyword aliases, @direction context propagation.
Differential: reference output is the truth."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# -------- property-based indexing (@index: <property> in term def) ----
c("expand", "t0316", "expand", "property-based index container",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byAuthor": {"@id": EX + "post",
                                   "@container": "@index",
                                   "@index": EX + "author"}},
         "byAuthor": {"alice": {"title": "T1"},
                      "bob": {"title": "T2"}}})
c("expand", "t0317", "expand", "property-based index with existing value",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byAuthor": {"@id": EX + "post",
                                   "@container": "@index",
                                   "@index": EX + "author"}},
         "byAuthor": {"alice": {"title": "T1",
                                EX + "author": "carol"}}})
c("expand", "t0318", "expand", "property-based index in 1.0 mode rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"byAuthor": {"@id": EX + "post",
                                   "@container": "@index",
                                   "@index": EX + "author"}},
         "byAuthor": {"alice": {EX + "title": "T1"}}}, neg=True)
c("compact", "c106", "compact", "compact into property-based index map",
  input=[{EX + "post": [
      {EX + "title": [{"@value": "T1"}],
       EX + "author": [{"@value": "alice"}]},
      {EX + "title": [{"@value": "T2"}],
       EX + "author": [{"@value": "bob"}]}]}],
  context={"@version": 1.1, "@vocab": EX,
           "byAuthor": {"@id": EX + "post", "@container": "@index",
                        "@index": EX + "author"}})
c("expand", "t0319", "expand", "property-based index term must expand to IRI",
  input={"@context": {"@version": 1.1,
                      "byX": {"@id": EX + "p", "@container": "@index",
                              "@index": "not-an-iri-term"}},
         "byX": {"k": {EX + "v": 1}}}, neg=True)

# ------------------- @prefix flag on term definitions -----------------
c("expand", "t0320", "expand", "@prefix false blocks CURIE use",
  input={"@context": {"@version": 1.1,
                      "pfx": {"@id": EX + "ns/", "@prefix": False}},
         "pfx:suffix": "v", "@id": "urn:id", "urn:p": "w"})
c("expand", "t0321", "expand", "@prefix true enables vocab-mapped prefix",
  input={"@context": {"@version": 1.1,
                      "pfx": {"@id": EX + "ns/", "@prefix": True}},
         "pfx:suffix": "v", "@id": "urn:id"})
c("expand", "t0322", "expand", "@prefix on keyword-like term",
  input={"@context": {"@version": 1.1,
                      "@foo": {"@id": EX + "ns/", "@prefix": True}},
         "@foo:suffix": "v", "@id": "urn:id", "urn:p": "w"})
c("compact", "c107", "compact", "compact never builds CURIE on prefix:false",
  input=[{"@id": "urn:id",
          EX + "ns/suffix": [{"@value": "v"}]}],
  context={"@version": 1.1,
           "pfx": {"@id": EX + "ns/", "@prefix": False}})

# --------------------------- empty @vocab -----------------------------
c("expand", "t0323", "expand", "empty-string @vocab resolves against base",
  options={"base": "http://base.example/doc"},
  input={"@context": {"@vocab": ""}, "term": "v", "@id": "urn:id"})
c("expand", "t0324", "expand", "relative @vocab against base",
  options={"base": "http://base.example/dir/doc"},
  input={"@context": {"@vocab": "sub#"}, "term": "v", "@id": "urn:id"})

# ----------------------------- omitGraph ------------------------------
c("compact", "c108", "compact", "omitGraph false wraps in @graph",
  options={"omitGraph": False},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})
c("compact", "c109", "compact", "omitGraph true unwraps single node",
  options={"omitGraph": True},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})
c("compact", "c110", "compact", "1.0 mode default omitGraph behavior",
  options={"processingMode": "json-ld-1.0"},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]},
         {"@id": "urn:b", EX + "p": [{"@value": 2}]}],
  context={"@vocab": EX})

# --------------------------- expandContext ----------------------------
c("expand", "t0325", "expand", "expandContext supplies vocab",
  options={"expandContext": {"@vocab": EX}},
  input={"term": "v", "@id": "urn:id"})
c("expand", "t0326", "expand", "expandContext wrapped in @context key",
  options={"expandContext": {"@context": {"@vocab": EX}}},
  input={"term": "v", "@id": "urn:id"})
c("expand", "t0327", "expand", "inline @context overrides expandContext",
  options={"expandContext": {"term": EX + "fromOption"}},
  input={"@context": {"term": EX + "inline"},
         "term": "v", "@id": "urn:id"})

# ------------------------ @nest interactions --------------------------
c("expand", "t0328", "expand", "double-nested @nest flattens through",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "meta": "@nest", "inner": "@nest"},
         "@id": "urn:id",
         "meta": {"inner": {"p": "v"}}})
c("expand", "t0329", "expand", "@nest with container term inside",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "meta": "@nest",
                      "tags": {"@id": EX + "tag",
                               "@container": "@set"}},
         "@id": "urn:id", "meta": {"tags": ["a", "b"]}})
c("expand", "t0330", "expand", "@nest value object rejected",
  input={"@context": {"@version": 1.1, "@vocab": EX, "meta": "@nest"},
         "@id": "urn:id", "meta": {"@value": "v"}}, neg=True)
c("compact", "c111", "compact", "compact into @nest term",
  input=[{"@id": "urn:id", EX + "p": [{"@value": "v"}]}],
  context={"@version": 1.1, "@vocab": EX, "meta": "@nest",
           "p": {"@id": EX + "p", "@nest": "meta"}})

# ------------------------ @included interactions ----------------------
c("expand", "t0331", "expand", "@included nested inside @included",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": "v",
         "@included": [{"@id": "urn:b", "p": "w",
                        "@included": [{"@id": "urn:c", "p": "x"}]}]})
c("expand", "t0332", "expand", "@included alias",
  input={"@context": {"@vocab": EX, "extra": "@included"},
         "@id": "urn:a", "p": "v",
         "extra": {"@id": "urn:b", "p": "w"}})
c("expand", "t0333", "expand", "@included with value object rejected",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "@included": [{"@value": "free"}]}, neg=True)
c("flatten", "f019", "flatten", "@included nodes join default graph",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": "v",
         "@included": [{"@id": "urn:b", "p": "w"}]})

# ------------------------- list of lists ------------------------------
c("expand", "t0334", "expand", "list of lists direct",
  input={"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@container": "@list"}},
         "p": [["a", "b"], ["c"]]})
c("toRdf", "tr069", "toRDF", "list of lists to nested rdf chains",
  input={"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@container": "@list"}},
         "@id": "urn:id", "p": [["a", "b"], ["c"]]})
c("toRdf", "tr070", "toRDF", "empty inner list in list of lists",
  input={"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@container": "@list"}},
         "@id": "urn:id", "p": [[], ["c"]]})
c("fromRdf", "fr062", "fromRDF", "nested list chain reconstruction",
  input='<urn:id> <http://example.com/p> _:l1 .\n'
        '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:i1 .\n'
        '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> '
        '<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n'
        '_:i1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .\n'
        '_:i1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:i2 .\n'
        '_:i2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .\n'
        '_:i2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> '
        '<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n')

# ----------------------- keyword alias collisions ---------------------
c("expand", "t0335", "expand", "alias for @graph",
  input={"@context": {"@vocab": EX, "data": "@graph"},
         "@id": "urn:g", "data": [{"@id": "urn:a", "p": "v"}]})
c("expand", "t0336", "expand", "two aliases for @id both usable",
  input={"@context": {"id1": "@id", "id2": "@id", "@vocab": EX},
         "id1": "urn:a", "p": {"id2": "urn:b"}})
c("expand", "t0337", "expand", "alias for @type with coercion",
  input={"@context": {"@vocab": EX, "kind": "@type"},
         "kind": ["T1", "T2"], "@id": "urn:a", "p": "v"})
c("compact", "c112", "compact", "compact prefers term over keyword alias",
  input=[{"@id": "urn:a", "@type": [EX + "T"]}],
  context={"@vocab": EX, "kind": "@type"})

# --------------------- @direction context handling --------------------
c("expand", "t0338", "expand", "term-level @direction overrides default",
  input={"@context": {"@direction": "rtl", "@language": "ar",
                      "p": {"@id": EX + "p", "@direction": "ltr"},
                      "q": EX + "q"},
         "@id": "urn:a", "p": "v", "q": "w"})
c("expand", "t0339", "expand", "term @direction null clears default",
  input={"@context": {"@direction": "rtl",
                      "p": {"@id": EX + "p", "@direction": None},
                      "q": EX + "q"},
         "@id": "urn:a", "p": "v", "q": "w"})
c("expand", "t0340", "expand", "invalid @direction in context",
  input={"@context": {"@direction": "up"},
         "@id": "urn:a", EX + "p": "v"}, neg=True)
c("compact", "c113", "compact", "compact value with direction to term",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "v", "@direction": "ltr"}]}],
  context={"p": {"@id": EX + "p", "@direction": "ltr"}})
c("compact", "c114", "compact", "direction mismatch keeps expanded form",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "v", "@direction": "rtl"}]}],
  context={"p": {"@id": EX + "p", "@direction": "ltr"}})

# ------------------------- graph containers edge ----------------------
c("expand", "t0341", "expand", "@graph+@index container",
  input={"@context": {"@version": 1.1,
                      "g": {"@id": EX + "g",
                            "@container": ["@graph", "@index"]}},
         "@id": "urn:a", "g": {"k1": {EX + "p": "v1"},
                               "k2": {EX + "p": "v2"}}})
c("expand", "t0342", "expand", "@graph+@id container",
  input={"@context": {"@version": 1.1,
                      "g": {"@id": EX + "g",
                            "@container": ["@graph", "@id"]}},
         "@id": "urn:a", "g": {"urn:g1": {EX + "p": "v1"}}})
c("compact", "c115", "compact", "compact into @graph @index container",
  input=[{"@id": "urn:a",
          EX + "g": [
              {"@graph": [{EX + "p": [{"@value": "v1"}]}],
               "@index": "k1"}]}],
  context={"@version": 1.1,
           "g": {"@id": EX + "g", "@container": ["@graph", "@index"]}})

# ----------------------- frame corner probes --------------------------
c("frame", "fm065", "frame", "frame with @embed @never keeps references",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "child": {"@id": "urn:b"}},
      {"@id": "urn:b", "name": "B"}]},
  frame={"@context": {"@vocab": EX}, "@embed": "@never", "child": {}})
c("frame", "fm066", "frame", "frame matching on @id array",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "name": "A"}, {"@id": "urn:b", "name": "B"},
      {"@id": "urn:c", "name": "C"}]},
  frame={"@context": {"@vocab": EX}, "@id": ["urn:a", "urn:c"]})
c("frame", "fm067", "frame", "frame wildcard on @type",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "@type": "T", "name": "A"},
      {"@id": "urn:b", "name": "B"}]},
  frame={"@context": {"@vocab": EX}, "@type": {}})
c("frame", "fm068", "frame", "frame match none via empty array @type",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "@type": "T", "name": "A"},
      {"@id": "urn:b", "name": "B"}]},
  frame={"@context": {"@vocab": EX}, "@type": []})
