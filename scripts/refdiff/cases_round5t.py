"""Round-5 batch t: type-map scoped-context ACCUMULATION (grammar
wave 13, fuzz seed 2386).

Reference _expandIndexMap (expand.js:1196-1234): when a @type-map key
has a scoped context, _processContext REASSIGNS the loop's activeCtx —
the scoped context (here a scoped @vocab) stays active for every
LATER sorted key and its values, not just the carrying entry.
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
_CTX = {"@version": 1.1, "@vocab": V,
        "delta": {"@id": V + "delta", "@container": ["@type", "@set"],
                  "@type": "@id"},
        "alpha": {"@id": V + "alpha",
                  "@context": {"@vocab": V + "scvocab/",
                               "inneralpha": V + "scoped/a"}}}

c("expand", "t0504", "expand",
  "a type-map key's scoped @vocab accumulates into the loop context: "
  "the LATER sorted key 'id' vocab-expands under it",
  input={"@context": _CTX, "@id": "urn:n1",
         "delta": {"alpha": {"@id": "_:b1"},
                   "id": "urn:via"}},
  options={"base": _BASE})

c("expand", "t0505", "expand",
  "keys sorting BEFORE the scoped-context key are untouched; values "
  "after it expand under the accumulated context too",
  input={"@context": _CTX, "@id": "urn:n1",
         "delta": {"aa": "urn:a",
                   "alpha": {"@id": "_:b1"},
                   "zz": {"inneralpha": "x"}}},
  options={"base": _BASE})
