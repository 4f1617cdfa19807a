"""Round-4 batch m: frame preservation corners — @preserve cleanup,
omitDefault + @default interplay, @embed @first/@last legacy modes,
frames matching value objects in maps, graph-frame recursion, @nest
compaction round-trips, insideIndex graph shapes. Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


c("frame", "fm079", "frame", "@embed @first keeps first embed only",
  options={"embed": "@first"},
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "child": {"@id": "urn:c"}},
      {"@id": "urn:b", "child": {"@id": "urn:c"}},
      {"@id": "urn:c", "name": "C"}]},
  frame={"@context": {"@vocab": EX}, "child": {}})
c("frame", "fm080", "frame", "@embed @last moves embed to last reference",
  options={"embed": "@last"},
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "child": {"@id": "urn:c"}},
      {"@id": "urn:b", "child": {"@id": "urn:c"}},
      {"@id": "urn:c", "name": "C"}]},
  frame={"@context": {"@vocab": EX}, "child": {}})
c("frame", "fm081", "frame", "default fills under requireAll",
  options={"requireAll": True},
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "name": "A", "size": 1},
      {"@id": "urn:b", "name": "B"}]},
  frame={"@context": {"@vocab": EX},
         "name": {}, "size": {"@default": 0}})
c("frame", "fm082", "frame", "frame list subframe filters items",
  input={"@context": {"@vocab": EX,
                      "items": {"@id": EX + "items",
                                "@container": "@list"}},
         "@graph": [
             {"@id": "urn:a", "items": ["x", "y"]},
             {"@id": "urn:b", "items": ["z"]}]},
  frame={"@context": {"@vocab": EX,
                      "items": {"@id": EX + "items",
                                "@container": "@list"}},
         "items": {"@list": [{"@value": "z"}]}})
c("frame", "fm083", "frame", "named graph recursion with @graph subframe",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:g", "@graph": [
          {"@id": "urn:a", "@type": "T", "name": "A"},
          {"@id": "urn:x", "name": "X"}]}]},
  frame={"@context": {"@vocab": EX},
         "@id": "urn:g",
         "@graph": {"@type": "T"}})
c("frame", "fm084", "frame", "reverse-term frame output compacts reverse",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:p", "knows": {"@id": "urn:k"}},
      {"@id": "urn:k", "name": "K"}]},
  frame={"@context": {"@vocab": EX,
                      "knownBy": {"@reverse": EX + "knows"}},
         "@id": "urn:k"})
c("frame", "fm085", "frame", "type-matching with multiple frame types",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "@type": "T1", "name": "A"},
      {"@id": "urn:b", "@type": "T2", "name": "B"},
      {"@id": "urn:c", "@type": "T3", "name": "C"}]},
  frame={"@context": {"@vocab": EX}, "@type": ["T1", "T2"]})
c("compact", "c172", "compact", "@nest round-trip groups nested terms",
  input=[{"@id": "urn:a",
          EX + "p1": [{"@value": 1}],
          EX + "p2": [{"@value": 2}],
          EX + "top": [{"@value": 3}]}],
  context={"@version": 1.1, "@vocab": EX,
           "meta": "@nest",
           "p1": {"@id": EX + "p1", "@nest": "meta"},
           "p2": {"@id": EX + "p2", "@nest": "meta"}})
c("compact", "c173", "compact", "@nest alias via @nest keyword itself",
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context={"@version": 1.1, "@vocab": EX,
           "p": {"@id": EX + "p", "@nest": "@nest"}})
c("expand", "t0458", "expand", "graph+index map with @none and nodes",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "g": {"@id": EX + "g",
                            "@container": ["@graph", "@index"]}},
         "@id": "urn:a",
         "g": {"@none": {"p": "v0"}, "k1": {"p": "v1"}}})
c("expand", "t0459", "expand", "graph+id map entry carrying inner @id",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "g": {"@id": EX + "g",
                            "@container": ["@graph", "@id"]}},
         "@id": "urn:a",
         "g": {"urn:gname": {"@id": "urn:node", "p": "v"}}})
c("frame", "fm086", "frame", "@omitDefault global with missing property",
  options={"omitDefault": True},
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "name": "A"}]},
  frame={"@context": {"@vocab": EX}, "name": {}, "other": {}})
