"""Round-5 batch i: eager scoped-context validation, found by the
context-corruption arm of the error-agreement leg (seeds 0/13/315).

Reference context.js:407-440: after each term definition, any
`@context` on the term is VALIDATED by processing it against a clone
of the active context — an invalid scoped context raises at
DEFINITION time even when the term is never used.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

c("expand", "t0475", "expand",
  "a term's boolean scoped context raises invalid scoped context at "
  "DEFINITION time even though the term is never used",
  input={"@context": {"@vocab": "http://fuzz.example/",
                      "unused": {"@id": "http://fuzz.example/unused",
                                 "@context": True}},
         "alpha": "x"},
  options={"base": _BASE}, neg=True)

c("expand", "t0476", "expand",
  "a scoped context whose CONTENT is invalid (bad term definition) "
  "also raises eagerly, wrapped as invalid scoped context",
  input={"@context": {"@vocab": "http://fuzz.example/",
                      "unused": {"@id": "http://fuzz.example/unused",
                                 "@context": {"bad": 5}}},
         "alpha": "x"},
  options={"base": _BASE}, neg=True)
