"""Round-5 batch d: regressions from the WIDENED frame-pattern
generator (@id patterns, @requireAll/@omitDefault, nested subframes,
value patterns, list frames, @reverse frames). Differential.

Kernel fixes covered:
  - every value object in the frame output loop is gated through
    _valueMatch(subframe[0], o): node-shaped subframes read as value
    patterns whose non-empty @type never matches a typeless literal,
    so the value drops and the property default-fills
    (frame.js:260-263)
  - _valueMatch reads @value/@type/@language off ANY object — a node
    reference has all three undefined, so an all-wildcard pattern
    matches it (frame.js:794-812)
  - frame mode expands an explicit @id KEY to an ARRAY
    (expand.js:552-560 propertyIsArray: isFrame), so @id matching is
    exact membership — only id-map-synthesized string @ids use the
    substring quirk
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import fuzz  # noqa: E402

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

_FRAME_SEEDS = [
    (26, "fm105", "node-shaped subframe vetoes typeless literal values "
                  "-> default fill"),
    (1622, "fm106", "{} @value wildcard pattern matches node "
                    "references too"),
    (1782, "fm107", "explicit @id key expands to an array in frame "
                    "mode: exact match, no substring"),
    (4098, "fm108", "array @id + property pattern: no match on "
                    "unrelated ids"),
    (2778, "fm109", "nested node-pattern subframe recursion"),
    (4875, "fm110", "list/value pattern interplay with embedded nodes"),
]

for _seed, _cid, _name in _FRAME_SEEDS:
    _doc = fuzz.gen_doc(_seed)
    c("frame", _cid, "frame", f"fuzz seed {_seed}: {_name}",
      input=_doc, frame=fuzz.gen_frame(_seed, _doc),
      options={"base": _BASE})

# (seeds 943/1715 — empty-index-map subframe reaching _valueMatch —
# stay fuzz-only: the reference throws a RAW TypeError with no
# JsonLdError code, so a manifest NegativeEvaluationTest cannot
# express it)
