"""Round-5 batch v: addValue's unconditional element-wise array
recursion (grammar wave 14, fuzz seed 11).

Reference util.js:263-274: the array branch of addValue runs FIRST,
regardless of whether the property already exists — nested arrays
flatten to any depth and EMPTY arrays at any level vanish. Observable
when an array-valued compacted item (a @json payload) is addValue'd
into a container map.
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
        "epsilon": {"@id": V + "epsilon", "@container": "@index",
                    "@type": "@json"}}

c("compact", "c223", "compact",
  "an array-valued @json payload addValue'd into an index map "
  "flattens recursively: empty arrays at any depth vanish, nested "
  "arrays splice element-wise",
  input={"@context": _CTX, "@id": "urn:n1",
         "epsilon": {"k1": {"@value": [[], {"a": 1}, [[], [2, []]],
                                       1.0, -7e-22],
                            "@type": "@json"}}},
  context=_CTX,
  options={"base": _BASE})
