"""Round-4 batch o: IRI relativization matrix (compactToRelative) —
fragments, queries, sibling/parent paths, authority mismatches, and
@reverse value @index retention. Differential."""

EX = "http://example.com/"
B = "http://base.example/a/b/doc"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


def rel(cid, iri, name):
    c("compact", cid, "compact", "relativize: " + name,
      options={"base": B},
      input=[{"@id": iri, EX + "p": [{"@value": 1}]}],
      context={"@vocab": EX})


rel("c177", B, "identical to base")
rel("c178", B + "#frag", "fragment on base")
rel("c179", B + "?q=1", "query on base")
rel("c180", "http://base.example/a/b/sibling", "sibling file")
rel("c181", "http://base.example/a/other", "parent dir file")
rel("c182", "http://base.example/x/y", "different branch")
rel("c183", "http://base.example/", "authority root")
rel("c184", "http://other.example/a/b/doc", "different authority")
rel("c185", "https://base.example/a/b/doc", "different scheme")
rel("c186", "http://base.example/a/b/doc/deeper", "base as directory")

c("compact", "c187", "compact", "reverse value keeps @index",
  input=[{"@id": "urn:a",
          "@reverse": {EX + "parentOf": [
              {"@id": "urn:b", "@index": "k"}]}}],
  context={"@vocab": EX, "childOf": {"@reverse": EX + "parentOf"}})
c("expand", "t0463", "expand", "@reverse node with @index kept",
  input={"@context": {"@vocab": EX,
                      "childOf": {"@reverse": EX + "parentOf"}},
         "@id": "urn:a",
         "childOf": {"@id": "urn:b", "@index": "k"}})
c("compact", "c188", "compact", "base-relative id inside @reverse",
  options={"base": B},
  input=[{"@id": "http://base.example/a/b/kid",
          "@reverse": {EX + "parentOf": [
              {"@id": "http://base.example/a/b/parent"}]}}],
  context={"@vocab": EX, "childOf": {"@reverse": EX + "parentOf"}})
