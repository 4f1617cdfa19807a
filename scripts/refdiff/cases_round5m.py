"""Round-5 batch m: the null-type-map-key compaction class
(16-op campaign seed 19397).

A @type-container map key whose term is explicitly NULLED expands to a
node with "@type": [null]. On re-compaction the reference destructures
`_asArray(compactedItem[typeKey] || [])` (compact.js:595-607): the JS-
FALSY compacted @type becomes [], so the map key stays undefined (->
@none alias) AND the @type key is deleted via the case-0 switch arm —
which then lets the single-entry + @id recompact (compact.js:610-620)
collapse the entry to its bare IRI. The shared `if(!key) key = @none`
guard (compact.js:622-625) applies JS falsiness in every map branch.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name,
                  **kw})


_BASE = "https://fuzz.example/doc.jsonld"
V = "http://fuzz.example/"
_CTX = {"@version": 1.1, "@vocab": V, "delta": None,
        "beta": {"@id": V + "beta", "@container": "@type",
                 "@type": "@id"}}

c("expand", "t0493", "expand",
  "a @type-map key whose term is explicitly nulled expands to a "
  "node carrying @type [null]",
  input={"@context": _CTX, "@id": "urn:n1", "beta": {"delta": "leaf"}},
  options={"base": _BASE})

c("compact", "c214", "compact",
  "null type-map key round-trip: the JS-falsy compacted @type empties "
  "the destructuring, the entry lands under @none with @type deleted, "
  "and the single-@id recompact collapses it to a bare IRI",
  input={"@context": _CTX, "@id": "urn:n1", "beta": {"delta": "leaf"}},
  context=_CTX, options={"base": _BASE})

c("compact", "c215", "compact",
  "same under compactArrays=false (the seed-19397 shape): the @none "
  "entry still collapses to its IRI string inside the map",
  input={"@context": _CTX, "@id": "urn:n1",
         "beta": {"delta": "leaf", "alpha": "leaf2"}},
  context=_CTX, options={"base": _BASE, "compactArrays": False})

c("compact", "c216", "compact",
  "a nulled type-map key entry that keeps other properties: @type is "
  "deleted but the node stays an object (no single-@id recompact)",
  input={"@context": _CTX, "@id": "urn:n1",
         "beta": {"delta": {"@id": "urn:n2",
                            "alpha": "kept"}}},
  context=_CTX, options={"base": _BASE})
