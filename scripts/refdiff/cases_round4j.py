"""Round-4 batch j: container fallback paths — non-object values under
map containers, scalars under @graph containers, type-map string
shortcuts, language-map nulls/arrays, @list+@set container combos,
map containers meeting @reverse. Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----- non-object values under map containers (fallback to normal) -----
c("expand", "t0431", "expand", "scalar under @index container",
  input={"@context": {"@vocab": EX,
                      "byIdx": {"@id": EX + "p",
                                "@container": "@index"}},
         "@id": "urn:a", "byIdx": "plain"})
c("expand", "t0432", "expand", "array under @language container",
  input={"@context": {"@vocab": EX,
                      "byLang": {"@id": EX + "p",
                                 "@container": "@language"}},
         "@id": "urn:a", "byLang": ["x", "y"]})
c("expand", "t0433", "expand", "scalar under @id container",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byId": {"@id": EX + "p", "@container": "@id"}},
         "@id": "urn:a", "byId": 42})
c("expand", "t0434", "expand", "scalar under @graph container wraps",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "g": {"@id": EX + "g", "@container": "@graph"}},
         "@id": "urn:a", "g": "scalar"})

# ----- type-map string shortcut ----------------------------------------
c("expand", "t0435", "expand", "type map string value becomes @id node",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byType": {"@id": EX + "p",
                                 "@container": "@type",
                                 "@type": "@id"}},
         "@id": "urn:a", "byType": {"T1": "urn:x"}})
c("expand", "t0436", "expand", "type map array of strings",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byType": {"@id": EX + "p",
                                 "@container": "@type",
                                 "@type": "@id"}},
         "@id": "urn:a", "byType": {"T1": ["urn:x", "urn:y"]}})

# ----- language-map nulls and arrays ------------------------------------
c("expand", "t0437", "expand", "language map array values flatten",
  input={"@context": {"@vocab": EX,
                      "label": {"@id": EX + "label",
                                "@container": "@language"}},
         "@id": "urn:a", "label": {"en": ["a", "b"], "fr": "c"}})
c("expand", "t0438", "expand", "language map null values dropped",
  input={"@context": {"@vocab": EX,
                      "label": {"@id": EX + "label",
                                "@container": "@language"}},
         "@id": "urn:a", "label": {"en": None, "fr": "c"}})
c("expand", "t0439", "expand", "language map @none key plain value",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "label": {"@id": EX + "label",
                                "@container": "@language"}},
         "@id": "urn:a", "label": {"@none": "plain", "en": "x"}})
c("expand", "t0440", "expand", "language map non-string value raises",
  input={"@context": {"@vocab": EX,
                      "label": {"@id": EX + "label",
                                "@container": "@language"}},
         "@id": "urn:a", "label": {"en": 5}}, neg=True)

# ----- @list + @set combos ----------------------------------------------
c("expand", "t0441", "expand", "@container [@list] with @set value object",
  input={"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@container": "@list"}},
         "@id": "urn:a", "p": {"@set": ["a", "b"]}})
c("expand", "t0442", "expand", "explicit @list object under @list container",
  input={"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@container": "@list"}},
         "@id": "urn:a", "p": {"@list": ["a"]}})
c("compact", "c159", "compact", "@set inside list term array compacts",
  input=[{"@id": "urn:a",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
  context={"p": {"@id": EX + "p", "@container": ["@list"]}})

# ----- map containers + @reverse -----------------------------------------
c("expand", "t0443", "expand", "reverse term with @id container map",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "childOf": {"@reverse": EX + "parentOf",
                                  "@container": "@id"}},
         "@id": "urn:a",
         "childOf": {"urn:p1": {EX + "note": "n"}}}, neg=True)
c("expand", "t0444", "expand", "reverse term with @index container",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "childOf": {"@reverse": EX + "parentOf",
                                  "@container": "@index"}},
         "@id": "urn:a",
         "childOf": {"i": {"@id": "urn:p1"}}})

# ----- graph container value shapes --------------------------------------
c("expand", "t0445", "expand", "@graph container array of nodes",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "g": {"@id": EX + "g", "@container": "@graph"}},
         "@id": "urn:a", "g": [{"p": "v1"}, {"p": "v2"}]})
c("expand", "t0446", "expand", "@graph @set container single node",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "g": {"@id": EX + "g",
                            "@container": ["@graph", "@set"]}},
         "@id": "urn:a", "g": {"p": "v"}})
c("compact", "c160", "compact", "double-nested graphs compact stepwise",
  input=[{"@id": "urn:g",
          "@graph": [{"@id": "urn:mid",
                      "@graph": [{"@id": "urn:leaf",
                                  EX + "q": [{"@value": "v"}]}]}]}],
  context={"@vocab": EX})
