"""Round-4 batch i: @json container/array shapes, 1.0-mode rejection
matrix for 1.1 features, relative @vocab forms, inverse-context
@none/default-language preferences, expanded-form @set/@value nesting,
graph compaction preferences. Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- @json shapes -----------------------------------------
c("expand", "t0413", "expand", "@json coerces arrays whole",
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a", "d": [1, {"k": "v"}, [True]]})
c("expand", "t0414", "expand", "@json with @container @index",
  input={"@context": {"@version": 1.1,
                      "d": {"@id": EX + "d", "@type": "@json",
                            "@container": "@index"}},
         "@id": "urn:a", "d": {"i1": {"x": 1}, "i2": [2]}})
c("expand", "t0415", "expand", "@json in 1.0 mode rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a", "d": {"x": 1}}, neg=True)
c("expand", "t0416", "expand", "explicit @value @type @json null inside",
  input={"@id": "urn:a",
         "ex:p": {"@value": None, "@type": "@json"}})

# ----------------- 1.0-mode rejection matrix -----------------------------
c("expand", "t0417", "expand", "1.0: @prefix rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"p": {"@id": EX + "ns/", "@prefix": True}},
         "p:x": "v"}, neg=True)
c("expand", "t0418", "expand", "1.0: @nest rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"meta": "@nest", "@vocab": EX},
         "@id": "urn:a", "meta": {"p": "v"}}, neg=True)
c("expand", "t0419", "expand", "1.0: scoped context rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"wrap": {"@id": EX + "wrap",
                               "@context": {"p": EX + "p"}}},
         "@id": "urn:a", "wrap": {"p": "v"}}, neg=True)
c("expand", "t0420", "expand", "1.0: @direction in context rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"@direction": "ltr", "@vocab": EX},
         "@id": "urn:a", "p": "v"}, neg=True)
c("expand", "t0421", "expand", "1.0: @included rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": "v",
         "@included": [{"@id": "urn:b", "p": "w"}]}, neg=True)
c("expand", "t0422", "expand", "1.0: @graph container rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"g": {"@id": EX + "g", "@container": "@graph"}},
         "@id": "urn:a", "g": {EX + "p": "v"}}, neg=True)
c("expand", "t0423", "expand", "1.0: @version 1.1 context rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"@version": 1.1, "@vocab": EX},
         "@id": "urn:a", "p": "v"}, neg=True)

# ----------------- relative @vocab forms ---------------------------------
c("expand", "t0424", "expand", "@vocab ./ resolves against base",
  options={"base": "http://base.example/dir/doc"},
  input={"@context": {"@vocab": "./"}, "term": "v", "@id": "urn:a"})
c("expand", "t0425", "expand", "@vocab ../up resolves against base",
  options={"base": "http://base.example/a/b/doc"},
  input={"@context": {"@vocab": "../v#"}, "term": "v", "@id": "urn:a"})
c("expand", "t0426", "expand", "@vocab fragment-only",
  options={"base": "http://base.example/doc"},
  input={"@context": {"@vocab": "#"}, "term": "v", "@id": "urn:a"})

# ----------------- inverse-context preferences ---------------------------
c("compact", "c152", "compact", "default language term preferred",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"@language": "en", "p": EX + "p"})
c("compact", "c153", "compact", "lang-mismatch value avoids lang term",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "fr"}]}],
  context={"@language": "en", "p": EX + "p",
           "pfr": {"@id": EX + "p", "@language": "fr"}})
c("compact", "c154", "compact", "typed value avoids default-lang term",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "2020-01-01",
                      "@type":
                      "http://www.w3.org/2001/XMLSchema#date"}]}],
  context={"@language": "en", "p": EX + "p"})
c("compact", "c155", "compact", "@none term for plain under default lang",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "plain"}]}],
  context={"@language": "en",
           "pn": {"@id": EX + "p", "@language": None},
           "p": EX + "p"})

# ----------------- expanded-form nesting ---------------------------------
c("expand", "t0427", "expand", "@set of @set flattens fully",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "p": {"@set": [{"@set": ["a", "b"]}, "c"]}})
c("expand", "t0428", "expand", "@set with @index kept",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "p": {"@set": ["a"], "@index": "i"}})
c("expand", "t0429", "expand", "@graph alongside @id and properties",
  input={"@context": {"@vocab": EX},
         "@id": "urn:g", "p": "graph-node-prop",
         "@graph": [{"@id": "urn:inner", "q": "v"}]})
c("expand", "t0430", "expand", "nested @graph inside @graph",
  input={"@context": {"@vocab": EX},
         "@id": "urn:g",
         "@graph": [{"@id": "urn:mid",
                     "@graph": [{"@id": "urn:leaf", "q": "v"}]}]})

# ----------------- graph compaction preferences --------------------------
c("compact", "c156", "compact", "simple graph term for anonymous graph",
  input=[{EX + "claims": [
      {"@graph": [{EX + "v": [{"@value": 1}]}]}],
      "@id": "urn:a"}],
  context={"@version": 1.1,
           "claims": {"@id": EX + "claims", "@container": "@graph"}})
c("compact", "c157", "compact", "graph term not used for named graph",
  input=[{EX + "claims": [
      {"@graph": [{EX + "v": [{"@value": 1}]}],
       "@id": "urn:g1"}],
      "@id": "urn:a"}],
  context={"@version": 1.1,
           "claims": {"@id": EX + "claims", "@container": "@graph"}})
c("compact", "c158", "compact", "@graph+@id+@set container for named",
  input=[{EX + "claims": [
      {"@graph": [{EX + "v": [{"@value": 1}]}],
       "@id": "urn:g1"}],
      "@id": "urn:a"}],
  context={"@version": 1.1,
           "claims": {"@id": EX + "claims",
                      "@container": ["@graph", "@id", "@set"]}})
