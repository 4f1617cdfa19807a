"""Round-4 batch f: safe-mode error-code parity across toRDF drop
paths (relative subject/predicate/object/graph, bnode predicates,
rdfDirection unset), expand safe-mode paths not yet fixtured, and the
ordered/unordered processing flags. Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


S = {"safe": True}

# ----------------- toRDF safe-mode drop paths ---------------------------
c("toRdf", "tr079", "toRDF", "safe: relative subject raises",
  options=dict(S, skipExpansion=True),
  input=[{"@id": "relative-subject", "urn:p": [{"@value": "v"}]}],
  neg=True)
c("toRdf", "tr080", "toRDF", "safe: relative predicate raises",
  options=dict(S, skipExpansion=True),
  input=[{"@id": "urn:a", "relative-pred": [{"@value": "v"}]}],
  neg=True)
c("toRdf", "tr081", "toRDF", "safe: relative object reference raises",
  options=dict(S, skipExpansion=True),
  input=[{"@id": "urn:a", "urn:p": [{"@id": "relative-obj"}]}],
  neg=True)
c("toRdf", "tr082", "toRDF", "safe: relative graph name raises",
  options=dict(S, skipExpansion=True),
  input=[{"@id": "relative-graph",
          "@graph": [{"@id": "urn:a", "urn:p": [{"@value": "v"}]}]}],
  neg=True)
c("toRdf", "tr083", "toRDF", "safe: blank-node predicate raises",
  options=dict(S, skipExpansion=True),
  input=[{"@id": "urn:a", "_:bp": [{"@value": "v"}]}], neg=True)
c("toRdf", "tr084", "toRDF", "safe: @direction without rdfDirection raises",
  options=dict(S),
  input={"@context": {"@vocab": EX, "@direction": "rtl"},
         "@id": "urn:a", "p": "v"}, neg=True)
c("toRdf", "tr085", "toRDF", "unsafe: same inputs silently drop",
  options={"skipExpansion": True},
  input=[{"@id": "urn:a", "relative-pred": [{"@value": "v"}],
          "_:bp": [{"@value": "w"}], "urn:p": [{"@id": "rel-obj"},
                                               {"@value": "kept"}]}])
c("toRdf", "tr086", "toRDF", "generalized RDF keeps bnode predicate count",
  options={"skipExpansion": True, "produceGeneralizedRdf": True},
  input=[{"@id": "urn:a", "urn:p": [{"@value": "kept"}]}])

# ----------------- expand safe-mode corners -----------------------------
c("expand", "t0377", "expand", "safe: @language alone raises",
  options=dict(S),
  input={"@id": "urn:id", "ex:p": {"@language": "en"}}, neg=True)
c("expand", "t0378", "expand", "safe: invalid @language string raises",
  options=dict(S),
  input={"@id": "urn:id", "ex:p": {"@value": "v",
                                   "@language": "en_bad_"}}, neg=True)
c("expand", "t0379", "expand", "safe: invalid default language raises",
  options=dict(S),
  input={"@context": {"@language": "en_bad_"},
         "@id": "urn:id", "ex:p": "v"}, neg=True)
c("expand", "t0380", "expand", "safe: only-@id object raises",
  options=dict(S),
  input={"@set": [{"@id": "urn:only-id"},
                  {"@id": "urn:node", "urn:p": "v"}]}, neg=True)
c("expand", "t0381", "expand", "safe: relative graph reference raises",
  options=dict(S, base=""),
  input={"@id": "relativegraph",
         "@graph": [{"@id": "urn:a", "urn:p": "v"}]}, neg=True)
c("expand", "t0382", "expand", "safe: reserved term definition raises",
  options=dict(S),
  input={"@context": {"@RESERVED": "ex:r"}, "ex:p": "v"}, neg=True)
c("expand", "t0383", "expand", "safe mode ok input passes through",
  options=dict(S),
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": {"@id": "urn:b", "q": "v"}})

# ----------------- fromRDF safe-mode ------------------------------------
c("fromRdf", "fr083", "fromRDF", "safe: invalid language tag in dataset",
  options=dict(S),
  input='<urn:a> <urn:p> "v"@abcdefghi .\n', neg=True)
c("fromRdf", "fr084", "fromRDF", "unsafe: invalid language tag kept",
  input='<urn:a> <urn:p> "v"@abcdefghi .\n')

# ----------------- compact safe-mode ------------------------------------
c("compact", "c140", "compact", "safe mode ok compaction passes",
  options=dict(S),
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})

# ----------------- list inside set / nesting shapes ---------------------
c("expand", "t0384", "expand", "@list inside @set flattens",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "p": {"@set": [{"@list": ["a", "b"]}]}})
c("expand", "t0385", "expand", "@set inside @list raises",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "p": {"@list": [{"@set": ["a"]}]}}, neg=True)
c("expand", "t0386", "expand", "@list with @id alongside raises",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "p": {"@list": ["a"], "@id": "urn:l"}}, neg=True)
