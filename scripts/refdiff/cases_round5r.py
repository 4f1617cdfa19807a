"""Round-5 batch r: options-side @embed coercion/validation.

Reference _getFrameFlag (frame.js:419-439) runs the embed
coercion/validation on the RESOLVED value — frame OR options — so
options.embed=true coerces to @once, false to @never, and an invalid
string throws 'invalid @embed value' even with no @embed in the frame.
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
_DOC = {"@context": _CTX,
        "@graph": [{"@id": "urn:a", "@type": "T1",
                    "alpha": {"@id": "urn:b"}},
                   {"@id": "urn:b", "@type": "T1", "beta": "x"}]}
_FRAME = {"@context": _CTX, "@type": "T1"}

c("frame", "fm126", "frame",
  "options.embed=true coerces to @once (legacy boolean embed)",
  input=_DOC, frame=_FRAME, options={"base": _BASE, "embed": True})

c("frame", "fm127", "frame",
  "options.embed=false coerces to @never",
  input=_DOC, frame=_FRAME, options={"base": _BASE, "embed": False})

c("frame", "fm128", "frame",
  "invalid options.embed string throws invalid @embed value even "
  "with no @embed in the frame",
  input=_DOC, frame=_FRAME, options={"base": _BASE, "embed": "@bogus"},
  neg=True)

c("frame", "fm129", "frame",
  "options.embed=@last: the 1.0 last-match-stays-embedded mode via "
  "options",
  input=_DOC, frame=_FRAME, options={"base": _BASE, "embed": "@last"})
