"""Round-4 batch d: compaction-side corners — @json value compaction,
@container @id/@type maps with aliases, @language+@direction term
selection, @graph container round-trips, compactArrays matrix, @index
preservation, type-scoped contexts on compaction, @any keyword.
Differential: reference output is the truth."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- @json compaction ------------------------------------
c("compact", "c124", "compact", "@json value compacts to term with @type @json",
  input=[{"@id": "urn:a",
          EX + "d": [{"@value": {"b": 2, "a": [1, True]},
                      "@type": "@json"}]}],
  context={"d": {"@id": EX + "d", "@type": "@json"}})
c("compact", "c125", "compact", "@json value without matching term",
  input=[{"@id": "urn:a",
          EX + "d": [{"@value": [None, 1.5], "@type": "@json"}]}],
  context={"@vocab": EX})
c("expand", "t0356", "expand", "scalar under @type @json term wraps as JSON",
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a", "d": 42})

# ----------------- container maps with aliased keys --------------------
c("compact", "c126", "compact", "@id map with aliased @none key",
  input=[{"@id": "urn:a",
          EX + "p": [{"@id": "urn:k1", EX + "v": [{"@value": 1}]},
                     {EX + "v": [{"@value": 2}]}]}],
  context={"@version": 1.1, "@vocab": EX, "nil": "@none",
           "byId": {"@id": EX + "p", "@container": "@id"}})
c("compact", "c127", "compact", "@type map compacts type key via term",
  input=[{"@id": "urn:a",
          EX + "p": [{"@type": [EX + "T1"],
                      EX + "v": [{"@value": 1}]}]}],
  context={"@version": 1.1, "@vocab": EX,
           "T1term": EX + "T1",
           "byType": {"@id": EX + "p", "@container": "@type"}})
c("expand", "t0357", "expand", "@id map with @none and aliased keys",
  input={"@context": {"@version": 1.1, "@vocab": EX, "nil": "@none",
                      "byId": {"@id": EX + "p", "@container": "@id"}},
         "@id": "urn:a",
         "byId": {"urn:k1": {"v": 1}, "nil": {"v": 2}}})
c("expand", "t0358", "expand", "@type map value gets key as extra type",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "byType": {"@id": EX + "p",
                                 "@container": "@type"}},
         "@id": "urn:a",
         "byType": {"T1": {"@type": "T2", "v": 1}}})

# ----------------- language+direction term selection --------------------
c("compact", "c128", "compact", "term with lang en beats plain for en value",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"plain": EX + "p",
           "en": {"@id": EX + "p", "@language": "en"}})
c("compact", "c129", "compact", "language map with direction values",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en",
                      "@direction": "ltr"},
                     {"@value": "y", "@language": "he",
                      "@direction": "rtl"}]}],
  context={"@version": 1.1,
           "byLang": {"@id": EX + "p", "@container": "@language",
                      "@direction": "ltr"}})
c("compact", "c130", "compact", "null @language term matches no-lang value",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x"},
                     {"@value": "y", "@language": "en"}]}],
  context={"@language": "en",
           "nolang": {"@id": EX + "p", "@language": None},
           "lang": EX + "p"})

# ----------------- compactArrays matrix --------------------------------
c("compact", "c131", "compact", "compactArrays false keeps singletons",
  options={"compactArrays": False},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}],
          "@type": [EX + "T"]}],
  context={"@vocab": EX})
c("compact", "c132", "compact", "compactArrays false keeps @graph array",
  options={"compactArrays": False},
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})
c("compact", "c133", "compact", "compactArrays true collapses @set values",
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX, "p": {"@id": EX + "p", "@container": "@set"}})

# ----------------- @index preservation ---------------------------------
c("compact", "c134", "compact", "@index map groups by index",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": 1, "@index": "i1"},
                     {"@value": 2, "@index": "i1"},
                     {"@value": 3, "@index": "i2"}]}],
  context={"byIdx": {"@id": EX + "p", "@container": "@index"}})
c("compact", "c135", "compact", "node @index survives plain compaction",
  input=[{"@id": "urn:a",
          EX + "p": [{"@id": "urn:b", "@index": "keep"}]}],
  context={"@vocab": EX})
c("expand", "t0359", "expand", "value @index kept through expansion",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": {"@value": 1, "@index": "i"}})

# ----------------- type-scoped ctx on compaction ------------------------
c("compact", "c136", "compact", "type-scoped context applies to node",
  input=[{"@id": "urn:a", "@type": [EX + "T"],
          EX + "inner": [{"@value": "v"}]}],
  context={"@version": 1.1, "@vocab": EX,
           "T": {"@id": EX + "T",
                 "@context": {"inner": {"@id": EX + "inner"}}}})
c("compact", "c137", "compact", "type order: lexicographically least first",
  input=[{"@id": "urn:a", "@type": [EX + "B", EX + "A"],
          EX + "p": [{"@value": "v"}]}],
  context={"@version": 1.1, "@vocab": EX,
           "A": {"@id": EX + "A", "@context": {"p": EX + "pa"}},
           "B": {"@id": EX + "B", "@context": {"p": EX + "pb"}}})

# ----------------- @graph container round-trips -------------------------
c("compact", "c138", "compact", "named graph compacts under term",
  input=[{"@id": "urn:g1",
          "@graph": [{"@id": "urn:a", EX + "p": [{"@value": 1}]}]}],
  context={"@vocab": EX})
c("compact", "c139", "compact", "@graph @id container collects graphs",
  input=[{"@id": "urn:a",
          EX + "claims": [
              {"@graph": [{EX + "v": [{"@value": 1}]}],
               "@id": "urn:g1"},
              {"@graph": [{EX + "v": [{"@value": 2}]}],
               "@id": "urn:g2"}]}],
  context={"@version": 1.1, "@vocab": EX,
           "claims": {"@id": EX + "claims",
                      "@container": ["@graph", "@id"]}})

# ----------------- frame @any / miscellany -----------------------------
c("frame", "fm075", "frame", "nested frame with inner @embed @never",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "child": {"@id": "urn:b"}},
      {"@id": "urn:b", "leaf": {"@id": "urn:c"}, "name": "B"},
      {"@id": "urn:c", "name": "C"}]},
  frame={"@context": {"@vocab": EX},
         "child": {"leaf": {"@embed": "@never"}}})
c("frame", "fm076", "frame", "reverse property in frame",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:parent", "knows": {"@id": "urn:kid"}},
      {"@id": "urn:kid", "name": "K"}]},
  frame={"@context": {"@vocab": EX,
                      "knownBy": {"@reverse": EX + "knows"}},
         "@id": "urn:kid", "knownBy": {}})
c("frame", "fm077", "frame", "frame on named graph via @graph key",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:g", "@graph": [
          {"@id": "urn:a", "@type": "T", "name": "A"}]},
      {"@id": "urn:b", "@type": "T", "name": "B"}]},
  frame={"@context": {"@vocab": EX}, "@type": "T"})

# ----------------- expansion numerics / value coercion ------------------
c("expand", "t0360", "expand", "double coerced to integer type kept raw",
  input={"@context": {"p": {"@id": EX + "p",
                            "@type":
                            "http://www.w3.org/2001/XMLSchema#integer"}},
         "@id": "urn:a", "p": 4.5})
c("expand", "t0361", "expand", "native special doubles in value objects",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": [1e100, 5e-324]})
c("toRdf", "tr074", "toRDF", "huge and tiny doubles canonical form",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a", "p": [1e100, 5e-324, -2.5e-10]})
