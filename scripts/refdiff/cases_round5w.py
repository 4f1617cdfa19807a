"""Round-5 batch w: @included framing (grammar wave 15).

Reference frame.js:197-202: when the (expanded) frame carries
@included, framing recurses over its sub-frame with the SAME candidate
subject list and embedded=false; matches land under '@included' on
each matched node's output.
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
_DOC = {"@context": _CTX, "@graph": [
    {"@id": "urn:a", "@type": "T1", "alpha": "x"},
    {"@id": "urn:b", "@type": "T2", "beta": "y"},
    {"@id": "urn:c", "@type": "T2", "beta": "z"}]}

c("frame", "fm130", "frame",
  "@included subframe: every T1 match gains an @included block "
  "holding the T2 matches from the same subject list",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1",
         "@included": [{"@type": "T2"}]},
  options={"base": _BASE})

c("frame", "fm131", "frame",
  "wildcard @included subframe embeds every subject",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1", "@included": [{}]},
  options={"base": _BASE})

c("frame", "fm132", "frame",
  "@included with no matches default-behaves (empty include list "
  "prunes away)",
  input=_DOC,
  frame={"@context": _CTX, "@type": "T1",
         "@included": [{"@type": "T3"}]},
  options={"base": _BASE})
