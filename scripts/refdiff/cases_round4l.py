"""Round-4 batch l: value compaction corners — @index on values in and
out of index containers, compactValue with type coercion mismatches,
@reverse compaction through nested nodes, keyword aliases in output,
@none map keys on compaction side, expansion of numeric-keyed maps.
Differential."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


c("compact", "c161", "compact", "value with @index outside index container",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": 1, "@index": "k"}]}],
  context={"@vocab": EX})
c("compact", "c162", "compact", "value @index dropped inside index map",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": 1, "@index": "k"}]}],
  context={"byIdx": {"@id": EX + "p", "@container": "@index"}})
c("compact", "c163", "compact", "coercion mismatch keeps expanded value",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x",
                      "@type": EX + "OtherType"}]}],
  context={"p": {"@id": EX + "p",
                 "@type": "http://www.w3.org/2001/XMLSchema#date"}})
c("compact", "c164", "compact", "boolean/number natives compact bare",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": True}, {"@value": 4.5},
                     {"@value": 7}]}],
  context={"@vocab": EX}),
c("compact", "c165", "compact", "string with language when term has none",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"@vocab": EX})
c("compact", "c166", "compact", "@reverse nested node compacts recursively",
  input=[{"@id": "urn:a",
          "@reverse": {EX + "parentOf": [
              {"@id": "urn:b",
               EX + "name": [{"@value": "B"}]}]}}],
  context={"@vocab": EX, "childOf": {"@reverse": EX + "parentOf"}})
c("compact", "c167", "compact", "@reverse without matching term keeps key",
  input=[{"@id": "urn:a",
          "@reverse": {EX + "parentOf": [{"@id": "urn:b"}]}}],
  context={"@vocab": EX})
c("compact", "c168", "compact", "aliased keywords used in output",
  input=[{"@id": "urn:a", "@type": [EX + "T"],
          EX + "p": [{"@value": "x", "@language": "en"}]}],
  context={"@vocab": EX, "id": "@id", "type": "@type",
           "lang": "@language", "value": "@value"})
c("compact", "c169", "compact", "value object kept when no term fits",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "x", "@direction": "rtl"}]}],
  context={"@vocab": EX})
c("expand", "t0455", "expand", "index map numeric-string keys",
  input={"@context": {"@vocab": EX,
                      "byIdx": {"@id": EX + "p",
                                "@container": "@index"}},
         "@id": "urn:a", "byIdx": {"1": "a", "02": "b"}})
c("expand", "t0456", "expand", "id map keys expand as IRIs (CURIE keys)",
  input={"@context": {"@version": 1.1, "@vocab": EX, "ex": EX,
                      "byId": {"@id": EX + "p", "@container": "@id"}},
         "@id": "urn:a", "byId": {"ex:k1": {"v": 1}}})
c("expand", "t0457", "expand", "type map keys use type-scoped contexts",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "T1": {"@id": EX + "T1",
                             "@context": {"inner": EX + "scoped"}},
                      "byType": {"@id": EX + "p",
                                 "@container": "@type"}},
         "@id": "urn:a", "byType": {"T1": {"inner": "v"}}})
c("compact", "c170", "compact", "empty-array property compacts to []",
  input=[{"@id": "urn:a", EX + "p": []}],
  context={"@vocab": EX})
c("compact", "c171", "compact", "null context compacts to expanded-ish",
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}]}],
  context=None)
