"""Round-4 batch n: N-Quads serializer escapes (via toRDF), unicode
IRIs/literals, bnode @id compaction, useRdfType with node/literal mixes,
invalid-IRI @id retention, numeric keys. Differential."""

EX = "http://example.com/"
CASES = [
 {"suite": "toRdf", "id": "tr087", "op": "toRDF",
  "name": "literal escapes: quote backslash newline tab CR",
  "input": {"@context": {"@vocab": EX}, "@id": "urn:a",
            "p": "line1\nline2\ttab \"quoted\" back\\slash\rcr"}},
 {"suite": "toRdf", "id": "tr088", "op": "toRDF",
  "name": "unicode literal BMP and astral",
  "input": {"@context": {"@vocab": EX}, "@id": "urn:a",
            "p": "café 中文 \U0001F600"}},
 {"suite": "toRdf", "id": "tr089", "op": "toRDF",
  "name": "unicode IRI path segment",
  "input": {"@context": {"@vocab": EX}, "@id": "urn:café",
            "p": {"@id": EX + "café/中"}}},
 {"suite": "toRdf", "id": "tr090", "op": "toRDF",
  "name": "control characters in literal",
  "input": {"@context": {"@vocab": EX}, "@id": "urn:a",
            "p": "bell null-ish formfeed"}},
 {"suite": "fromRdf", "id": "fr085", "op": "fromRDF",
  "name": "useRdfType true keeps rdf:type as property",
  "options": {"useRdfType": True},
  "input": '<urn:a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
           '<urn:T> .\n'
           '<urn:a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
           '"literal-type" .\n'},
 {"suite": "fromRdf", "id": "fr086", "op": "fromRDF",
  "name": "rdf:type literal object always property",
  "input": '<urn:a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
           '"literal-type" .\n'
           '<urn:a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
           '<urn:T> .\n'},
 {"suite": "compact", "id": "c174", "op": "compact",
  "name": "bnode @id values pass through compaction",
  "input": [{"@id": "_:b0", EX + "p": [{"@id": "_:b1"}]},
            {"@id": "_:b1", EX + "q": [{"@value": 1}]}],
  "context": {"@vocab": EX}},
 {"suite": "expand", "id": "t0460", "op": "expand",
  "name": "bnode @type value kept",
  "input": {"@context": {"@vocab": EX},
            "@id": "_:subject", "@type": "_:btype", "p": "v"}},
 {"suite": "toRdf", "id": "tr091", "op": "toRDF",
  "name": "bnode @type emits bnode object quad",
  "input": {"@context": {"@vocab": EX},
            "@id": "_:subject", "@type": "_:btype", "p": "v"}},
 {"suite": "expand", "id": "t0461", "op": "expand",
  "name": "@id with internal spaces kept raw",
  "input": {"@id": "urn:has space", "urn:p": "v"}},
 {"suite": "expand", "id": "t0462", "op": "expand",
  "name": "numeric-looking term names",
  "input": {"@context": {"123": EX + "num", "@vocab": EX},
            "123": "v", "@id": "urn:a"}},
 {"suite": "compact", "id": "c175", "op": "compact",
  "name": "compact IRI equal to term @id uses term",
  "input": [{"@id": "urn:a", EX + "exact": [{"@value": 1}]}],
  "context": {"exact": EX + "exact"}},
 {"suite": "compact", "id": "c176", "op": "compact",
  "name": "IRI equal to a prefix @id does not CURIE to empty suffix",
  "input": [{"@id": "urn:a", EX + "ns/": [{"@value": 1}]}],
  "context": {"pfx": EX + "ns/"}},
]
