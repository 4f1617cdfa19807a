"""Round-5 batch c: regressions from the WIDENED fuzz grammar (@nest,
@included, keyword aliases, @prefix terms, @propagate) — the second
wave of strict-parity fixes. Expected outputs are differential.

Kernel fixes covered:
  - @graph-container wrapping is UNCONDITIONAL (expand.js:971): a
    value that already looks like a graph object double-wraps
  - keyword-alias shortcut in compactIri is not vocab-gated and FALLS
    THROUGH to ordinary term selection on a miss (compact.js:692-699)
  - "IRI confused with prefix" throw after CURIE selection fails
    (compact.js:913-922)
  - node-map @type/@index merge at their SORTED key positions —
    "@included" < "@type", so included copies contribute types first
    (nodeMap.js:110-166)
  - string @id frame patterns are SUBSTRING matches
    (frame.js:533-535 String.prototype.includes)
  - @included compaction flows through the generic item path with the
    graph-object unwrap-then-rewrap (compact.js:334-344, 407-424)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import fuzz  # noqa: E402

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

# fuzz-derived documents (deterministic from seed)
_FUZZ = [
    ("expand", "t0467", 900, "expand",
     "graph container double-wraps a value that is already a graph"),
    ("flatten", "f025", 900, "flatten",
     "double-wrapped graph flattens through two graph levels"),
    ("frame", "fm103", 76, "frame",
     "keyword-alias compaction of an @id VALUE that is literally @id"),
    ("flatten", "f026", 910, "flatten",
     "@included types merge before the host node's own @type"),
    ("frame", "fm104", 4419, "frame",
     "string @id pattern in a subframe is a SUBSTRING match"),
    ("compact", "c150", 6336, "compact",
     "@included graph-object compaction: unwrap single, keep inner "
     "@graph array"),
]

for _suite, _cid, _seed, _op, _name in _FUZZ:
    _doc = fuzz.gen_doc(_seed)
    case = {"input": _doc, "options": {"base": _BASE}}
    if _op == "compact":
        case["context"] = _doc["@context"]
    elif _op == "frame":
        case["frame"] = fuzz.gen_frame(_seed, _doc)
    c(_suite, _cid, _op, f"fuzz seed {_seed}: {_name}", **case)

# hand-minimized: prefix-confusion hard error (string form)
c("compact", "c151", "compact",
  "absolute IRI confused with a @prefix term raises",
  input={"@id": EX + "s",
         "http://other.example/p": [{"@id": "px:not-a-curie"}]},
  context={"@version": 1.1,
           "px": {"@id": EX + "px/", "@prefix": True}},
  neg=True)

# (seed 402 — array-valued IRI TypeError parity — stays fuzz-only: the
# reference throws a RAW TypeError with no JsonLdError code, so a
# manifest NegativeEvaluationTest cannot express it; fuzz.py compares
# error presence and keeps it green)
