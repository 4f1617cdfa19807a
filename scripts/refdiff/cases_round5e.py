"""Round-5 batch e: regressions from the OPTIONS-MATRIX fuzz leg
(processingMode 1.0, compactArrays=false, graph wrapping,
produceGeneralizedRdf, rdfDirection, frame flag options).

Kernel fixes covered:
  - graph-container map adds consult compactArrays — singles stay
    arrays under compactArrays=false (compact.js:479-481)
  - the top-level empty-/single-array collapse is gated on
    compactArrays: an empty compaction wraps as {"@graph": []}
    (jsonld.js:190-195)
  - graph wrapping checks _isObject, not truthiness: an empty {}
    framed match still wraps as [{}] (jsonld.js:196-199)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import fuzz  # noqa: E402

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

for _seed, _cid, _name in [
        (7, "c199", "graph-id map values stay arrays under "
                    "compactArrays=false"),
        (38, "c200", "nested index-map values stay arrays under "
                     "compactArrays=false"),
        (164, "c201", "empty expansion compacts to {'@graph': []} "
                      "under compactArrays=false")]:
    _doc = fuzz.gen_doc(_seed)
    c("compact", _cid, "compact", f"fuzz seed {_seed}: {_name}",
      input=_doc, context=_doc["@context"],
      options={"base": _BASE, "compactArrays": False})

_doc848 = fuzz.gen_doc(848)
c("frame", "fm111", "frame",
  "fuzz seed 848: empty framed match wraps as [{}] under "
  "omitGraph=false (graph wrap checks _isObject, not truthiness)",
  input=_doc848, frame=fuzz.gen_frame(848, _doc848),
  options={"base": _BASE, "omitDefault": True, "omitGraph": False})
