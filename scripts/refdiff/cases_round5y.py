"""Round-5 batch y: richer @default shapes (grammar wave 17).

Reference frame.js:287-293 + :702-703: the @default payload is
arrayified only when NOT already an array, and _cleanupPreserve takes
['@preserve'][0] — so a multi-element @default keeps only its FIRST
value and an EMPTY @default becomes JS undefined (the property drops
from the framed output).
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
_CTX = {"@vocab": V}
_DOC = {"@context": _CTX, "@id": "urn:a", "@type": "T1", "alpha": "x"}

c("frame", "fm133", "frame",
  "a multi-element @default fills only its FIRST value "
  "(cleanupPreserve takes ['@preserve'][0])",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1",
         "beta": {"@default": ["d1", "d2"]}},
  options={"base": _BASE})

c("frame", "fm134", "frame",
  "an EMPTY-array @default becomes undefined and the property drops "
  "from the framed output",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1", "beta": {"@default": []}},
  options={"base": _BASE})

c("frame", "fm135", "frame",
  "empty @default under compactArrays=false on a nulled term: the "
  "property still drops (no [[]] artifact)",
  input={"@context": {"@vocab": V, "gamma": None}, "@id": "urn:a",
         "@type": "T1", "alpha": "x"},
  frame={"@context": {"@vocab": V, "gamma": None}, "@type": "T1",
         "beta": {"@default": []}},
  options={"base": _BASE, "compactArrays": False,
           "omitGraph": False})

c("frame", "fm136", "frame",
  "falsy scalar defaults (0, false) fill verbatim",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1",
         "beta": {"@default": 0}, "gamma": {"@default": False}},
  options={"base": _BASE})

c("frame", "fm137", "frame",
  "a node-object @default fills as an embedded object",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1",
         "beta": {"@default": {"@id": "urn:default"}}},
  options={"base": _BASE})
