"""Round-5 batch n: language-map key expansion classes (16-op
campaign seed 24211, old-grammar reproduction).

The reference expands each language-map key with vocab under the TERM
context and suppresses @language ONLY when the expansion is exactly
'@none' (expand.js:1141-1188): a key whose term is explicitly NULLED
expands to null — which is !== '@none' — so its @language is KEPT
(lowercased, with the BCP47 warning event). Keys like '@id' are kept
verbatim as (invalid-BCP47) languages too.
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

c("expand", "t0494", "expand",
  "language-map key with a NULLED term keeps its @language (null !== "
  "'@none'); '@id' and uppercase keys kept lowercased; @none drops",
  input={"@context": {"@version": 1.1, "@vocab": V, "zeta": None,
                      "beta": {"@id": V + "beta",
                               "@container": "@language"}},
         "@id": "urn:n1",
         "beta": {"zeta": "a", "@id": "b", "EN": "c", "@none": "d"}},
  options={"base": _BASE})

c("expand", "t0495", "expand",
  "a language-map key that is a mapped TERM still expands to its IRI "
  "(not @none), so @language is kept as the raw key lowercased",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "gamma": V + "gamma",
                      "beta": {"@id": V + "beta",
                               "@container": "@language"}},
         "@id": "urn:n1", "beta": {"gamma": "x"}},
  options={"base": _BASE})

c("expand", "t0496", "expand",
  "a language-map key aliased TO @none via a term drops @language",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "nolang": "@none",
                      "beta": {"@id": V + "beta",
                               "@container": "@language"}},
         "@id": "urn:n1", "beta": {"nolang": "x", "en": "y"}},
  options={"base": _BASE})
