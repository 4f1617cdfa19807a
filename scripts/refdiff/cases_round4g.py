"""Round-4 batch g: @type:@vocab value coercion, compact-IRI candidate
selection (term vs CURIE vs vocab-suffix vs relative), @type-alias @set
containers, @value @index maps, @vocab values in @type coercion.
Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- @type: @vocab coercion -------------------------------
c("expand", "t0387", "expand", "@type @vocab expands value as term",
  input={"@context": {"@vocab": EX,
                      "role": {"@id": EX + "role", "@type": "@vocab"},
                      "admin": EX + "roles/admin"},
         "@id": "urn:a", "role": "admin"})
c("expand", "t0388", "expand", "@type @vocab falls back to vocab prepend",
  input={"@context": {"@vocab": EX,
                      "role": {"@id": EX + "role", "@type": "@vocab"}},
         "@id": "urn:a", "role": "unmapped-role"})
c("expand", "t0389", "expand", "@type @id does NOT use term mappings",
  input={"@context": {"@vocab": EX,
                      "role": {"@id": EX + "role", "@type": "@id"},
                      "admin": EX + "roles/admin"},
         "@id": "urn:a", "role": "admin"},
  options={"base": "http://base.example/dir/doc"})
c("compact", "c141", "compact", "@vocab-coerced IRI compacts to term",
  input=[{"@id": "urn:a",
          EX + "role": [{"@id": EX + "roles/admin"}]}],
  context={"@vocab": EX,
           "role": {"@id": EX + "role", "@type": "@vocab"},
           "admin": EX + "roles/admin"})
c("compact", "c142", "compact", "@vocab coercion strips vocab prefix",
  input=[{"@id": "urn:a",
          EX + "role": [{"@id": EX + "some-role"}]}],
  context={"@vocab": EX,
           "role": {"@id": EX + "role", "@type": "@vocab"}})

# ----------------- compact IRI candidate selection ----------------------
c("compact", "c143", "compact", "shortest CURIE wins among prefixes",
  input=[{"@id": "urn:a", EX + "ns/deep/thing": [{"@value": 1}]}],
  context={"a": EX, "b": EX + "ns/", "cc": EX + "ns/deep/"})
c("compact", "c144", "compact", "term beats CURIE beats vocab suffix",
  input=[{"@id": "urn:a", EX + "ns/x": [{"@value": 1}]}],
  context={"@vocab": EX, "pfx": EX + "ns/",
           "exact": EX + "ns/x"})
c("compact", "c145", "compact", "vocab suffix when no term or CURIE",
  input=[{"@id": "urn:a", EX + "plain": [{"@value": 1}]}],
  context={"@vocab": EX}),
c("compact", "c146", "compact", "CURIE not built from non-prefix term",
  input=[{"@id": "urn:a", EX + "ns/x": [{"@value": 1}]}],
  context={"@version": 1.1,
           "pfx": {"@id": EX + "ns/", "@prefix": False}})
c("compact", "c147", "compact", "tie between equal-length CURIEs",
  input=[{"@id": "urn:a", EX + "ns/x": [{"@value": 1}]}],
  context={"p1": EX + "ns/", "p2": EX + "ns/"})
c("compact", "c148", "compact", "@id value compacts via CURIE too",
  input=[{"@id": EX + "things/a",
          EX + "p": [{"@id": EX + "things/b"}]}],
  context={"t": EX + "things/",
           "p": {"@id": EX + "p", "@type": "@id"}})

# ----------------- @type alias with @set (1.1) --------------------------
c("compact", "c149", "compact", "@type alias with @container @set arrays",
  input=[{"@id": "urn:a", "@type": [EX + "T"]}],
  context={"@version": 1.1, "@vocab": EX,
           "type": {"@id": "@type", "@container": "@set"}})
c("expand", "t0390", "expand", "@type alias @set container accepts array",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "type": {"@id": "@type", "@container": "@set"}},
         "@id": "urn:a", "type": ["T1"]})
c("expand", "t0391", "expand", "@type @set container in 1.0 rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"type": {"@id": "@type", "@container": "@set"}},
         "@id": "urn:a", "type": ["T1"]}, neg=True)

# ----------------- @value maps with @index ------------------------------
c("expand", "t0392", "expand", "index map of scalars keeps @index",
  input={"@context": {"@vocab": EX,
                      "byIdx": {"@id": EX + "p",
                                "@container": "@index"}},
         "@id": "urn:a", "byIdx": {"i1": ["a", "b"], "i2": "c"}})
c("expand", "t0393", "expand", "index map @none key omits @index",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byIdx": {"@id": EX + "p",
                                "@container": "@index"}},
         "@id": "urn:a", "byIdx": {"@none": "x", "i1": "y"}})
c("compact", "c150", "compact", "graph index map round-trip",
  input=[{"@id": "urn:a",
          EX + "g": [{"@graph": [{EX + "v": [{"@value": 1}]}],
                      "@index": "k"}]}],
  context={"@version": 1.1,
           "g": {"@id": EX + "g",
                 "@container": ["@graph", "@index"]}})

# ----------------- misc value-object corners ---------------------------
c("expand", "t0394", "expand", "@value with @type and @language raises",
  input={"@id": "urn:a",
         "ex:p": {"@value": "v", "@type": "ex:T",
                  "@language": "en"}}, neg=True)
c("expand", "t0395", "expand", "non-string @value with @language raises",
  input={"@id": "urn:a",
         "ex:p": {"@value": 5, "@language": "en"}}, neg=True)
c("expand", "t0396", "expand", "@value array in expanded form",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": [{"@value": 1}, {"@value": "s"}]})
c("expand", "t0397", "expand", "empty string @value kept",
  input={"@context": {"@vocab": EX}, "@id": "urn:a",
         "p": {"@value": ""}})
c("expand", "t0398", "expand", "keyword-aliased @value term",
  input={"@context": {"@vocab": EX, "val": "@value",
                      "lang": "@language"},
         "@id": "urn:a", "p": {"val": "x", "lang": "en"}})
