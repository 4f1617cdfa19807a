"""Round-4 batch h: remote-context resolution shapes through the
`contexts` snapshot loader — arrays from remote docs, nested/relative
URL resolution, @base-in-remote-context semantics, scoped remote
contexts, cycles, malformed remote docs, protected terms from remote.
Differential (refrun reloads the reference per request so its module
caches cannot leak between cases)."""

EX = "http://example.com/"
CTX = "https://ctx.example/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


c("expand", "t0399", "expand", "remote context array applies in order",
  contexts={CTX + "arr.jsonld":
            {"@context": [{"p": EX + "first"},
                          {"p": EX + "second", "q": EX + "q"}]}},
  input={"@context": CTX + "arr.jsonld",
         "@id": "urn:a", "p": "v", "q": "w"})
c("expand", "t0400", "expand", "mixed array: remote URL then inline obj",
  contexts={CTX + "base.jsonld": {"@context": {"p": EX + "remote"}}},
  input={"@context": [CTX + "base.jsonld",
                      {"q": EX + "inline"}],
         "@id": "urn:a", "p": "v", "q": "w"})
c("expand", "t0401", "expand", "remote context referencing another remote",
  contexts={CTX + "outer.jsonld": {"@context": CTX + "inner.jsonld"},
            CTX + "inner.jsonld": {"@context": {"p": EX + "deep"}}},
  input={"@context": CTX + "outer.jsonld", "@id": "urn:a", "p": "v"})
c("expand", "t0402", "expand", "relative context URL against doc base",
  options={"base": CTX + "dir/doc.jsonld"},
  contexts={CTX + "dir/rel.jsonld": {"@context": {"p": EX + "rel"}}},
  input={"@context": "rel.jsonld", "@id": "urn:a", "p": "v"})
c("expand", "t0403", "expand",
  "nested relative context resolves against referencing context URL",
  options={"base": CTX + "toplevel/doc.jsonld"},
  contexts={CTX + "toplevel/outer.jsonld":
            {"@context": "sub/inner.jsonld"},
            CTX + "toplevel/sub/inner.jsonld":
            {"@context": {"p": EX + "nested"}}},
  input={"@context": "outer.jsonld", "@id": "urn:a", "p": "v"})
c("expand", "t0404", "expand", "context cycle raises",
  contexts={CTX + "a.jsonld": {"@context": CTX + "b.jsonld"},
            CTX + "b.jsonld": {"@context": CTX + "a.jsonld"}},
  input={"@context": CTX + "a.jsonld", "@id": "urn:a",
         "urn:p": "v"}, neg=True)
c("expand", "t0405", "expand", "remote doc without @context key raises",
  contexts={CTX + "bad.jsonld": {"p": EX + "p"}},
  input={"@context": CTX + "bad.jsonld", "@id": "urn:a",
         "urn:p": "v"}, neg=True)
c("expand", "t0406", "expand", "remote context that is a scalar raises",
  contexts={CTX + "scalar.jsonld": {"@context": 42}},
  input={"@context": CTX + "scalar.jsonld", "@id": "urn:a",
         "urn:p": "v"}, neg=True)
c("expand", "t0407", "expand", "missing remote context raises loading error",
  contexts={},
  input={"@context": CTX + "nope.jsonld", "@id": "urn:a",
         "urn:p": "v"}, neg=True)
c("expand", "t0408", "expand", "scoped remote context on a term",
  contexts={CTX + "scoped.jsonld":
            {"@context": {"inner": EX + "scoped-inner"}}},
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "wrap": {"@id": EX + "wrap",
                               "@context": CTX + "scoped.jsonld"}},
         "@id": "urn:a", "wrap": {"inner": "v"}})
c("expand", "t0409", "expand", "@base in remote context is honored",
  contexts={CTX + "withbase.jsonld":
            {"@context": {"@base": "http://frombase.example/",
                          "p": EX + "p"}}},
  input={"@context": CTX + "withbase.jsonld",
         "@id": "doc1", "p": "v"})
c("expand", "t0410", "expand", "protected terms from remote context",
  contexts={CTX + "prot.jsonld":
            {"@context": {"@version": 1.1, "@protected": True,
                          "p": EX + "p"}}},
  input={"@context": CTX + "prot.jsonld",
         "@id": "urn:a",
         EX + "sub": {"@context": {"p": EX + "other"},
                      "p": "v"}}, neg=True)
c("expand", "t0411", "expand", "same remote context twice in array ok",
  contexts={CTX + "dup.jsonld": {"@context": {"p": EX + "p"}}},
  input={"@context": [CTX + "dup.jsonld", CTX + "dup.jsonld"],
         "@id": "urn:a", "p": "v"})
c("expand", "t0412", "expand", "null in context array resets then remote",
  contexts={CTX + "after.jsonld": {"@context": {"p": EX + "after"}}},
  input={"@context": [{"p": EX + "before", "@vocab": EX},
                      None,
                      CTX + "after.jsonld"],
         "@id": "urn:a", "p": "v", "unmapped": "w"})
c("compact", "c151", "compact", "compact with remote context URL",
  contexts={CTX + "c.jsonld": {"@context": {"p": EX + "p"}}},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context=CTX + "c.jsonld")
c("frame", "fm078", "frame", "frame with remote context in frame doc",
  contexts={CTX + "f.jsonld": {"@context": {"@vocab": EX}}},
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "@type": "T", "name": "A"}]},
  frame={"@context": CTX + "f.jsonld", "@type": "T"})
