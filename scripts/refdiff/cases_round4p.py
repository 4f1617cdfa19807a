"""Round-4 batch p: compactValue matrix (bare-string eligibility under
term language/type matches, @id-typed values), language maps carrying
@direction (lang_dir keys), flatten-with-context compaction corners.
Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- compactValue matrix ----------------------------------
c("compact", "c189", "compact", "lang-matching value compacts to bare string",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"p": {"@id": EX + "p", "@language": "en"}})
c("compact", "c190", "compact", "type-matching value compacts to bare",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "2020-01-02",
                      "@type":
                      "http://www.w3.org/2001/XMLSchema#date"}]}],
  context={"p": {"@id": EX + "p",
                 "@type": "http://www.w3.org/2001/XMLSchema#date"}})
c("compact", "c191", "compact", "@id-typed value compacts to string",
  input=[{"@id": "urn:a", EX + "p": [{"@id": "urn:target"}]}],
  context={"p": {"@id": EX + "p", "@type": "@id"}})
c("compact", "c192", "compact", "@vocab-typed value compacts via term",
  input=[{"@id": "urn:a", EX + "p": [{"@id": EX + "thing"}]}],
  context={"@vocab": EX, "p": {"@id": EX + "p", "@type": "@vocab"},
           "thing": EX + "thing"})
c("compact", "c193", "compact", "node with extra keys stays object",
  input=[{"@id": "urn:a",
          EX + "p": [{"@id": "urn:target", EX + "q": [{"@value": 1}]}]}],
  context={"p": {"@id": EX + "p", "@type": "@id"}, "@vocab": EX})
c("compact", "c194", "compact", "term @type @none forces value objects",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"},
                     {"@value": 5}]}],
  context={"@version": 1.1, "@language": "en",
           "p": {"@id": EX + "p", "@type": "@none"}})
c("compact", "c195", "compact", "default-lang match compacts bare",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"@language": "en", "@vocab": EX})
c("compact", "c196", "compact", "number value ignores term language",
  input=[{"@id": "urn:a", EX + "p": [{"@value": 7}]}],
  context={"@language": "en", "@vocab": EX})

# ----------------- language maps with direction keys ---------------------
c("expand", "t0464", "expand", "language map with term @direction",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "label": {"@id": EX + "label",
                                "@container": "@language",
                                "@direction": "rtl"}},
         "@id": "urn:a", "label": {"ar": "x", "he": "y"}})
c("compact", "c197", "compact", "direction-tagged values into lang map",
  input=[{"@id": "urn:a",
          EX + "label": [
              {"@value": "x", "@language": "ar", "@direction": "rtl"},
              {"@value": "y", "@language": "he", "@direction": "rtl"}]}],
  context={"@version": 1.1,
           "label": {"@id": EX + "label", "@container": "@language",
                     "@direction": "rtl"}})
c("expand", "t0465", "expand", "lang map under default @direction",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "@direction": "ltr",
                      "label": {"@id": EX + "label",
                                "@container": "@language"}},
         "@id": "urn:a", "label": {"en": "x"}})

# ----------------- flatten with context ----------------------------------
c("flatten", "f020", "flatten", "flatten compacts with graph wrapper",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": {"q": "v"}},
  context={"@vocab": EX})
c("flatten", "f021", "flatten", "flatten with @id-container context",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "p": "1"}, {"@id": "urn:b", "p": "2"}]},
  context={"@version": 1.1, "@vocab": EX})
c("flatten", "f022", "flatten", "flatten relabels deep bnode forests",
  input={"@context": {"@vocab": EX},
         "p": {"q": {"r": {"s": "leaf"}}}},
  context={"@vocab": EX})
c("flatten", "f023", "flatten", "flatten 1.0 mode keeps @graph wrapper",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"@vocab": EX}, "@id": "urn:a", "p": "v"},
  context={"@vocab": EX})
