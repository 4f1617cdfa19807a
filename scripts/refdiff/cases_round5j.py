"""Round-5 batch j: regressions from the corrupted-FRAME arm (frameC)
of the error-agreement leg, plus the @type default-object surface it
exposed.

Kernel fixes covered:
  - validateTypeValue (util.js:154-181) gates the WHOLE @type value
    before per-item expansion: in frame mode only a string, an
    all-string array, an empty object, or a {"@default": strings}
    object is valid — a MIXED array like [{}, "urn:t"] is invalid
    (frameC seed 249);
  - frame-mode @type storage is addValue with propertyIsArray=true
    (expand.js:632-658): even a singleton @type stores as an ARRAY,
    so a frame @type beside an @list key reaches the set/list-object
    validation (frameC seed 571);
  - a frame @type default object transforms at expansion
    (expand.js:622-630; keys vocab-expand, values base+vocab-expand)
    and participates in the framing defaults fill (frame.js:271-277)
    with matching always true (frame.js:556-558); the
    {'@preserve': [types]} wrapper it leaves in @type is unwrapped
    before compaction (frame.js:62-64 cleanup-order parity).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"
_CTX = {"@vocab": "http://fuzz.example/"}

c("frame", "fm113", "frame",
  "mixed @type pattern [{}ildcard, IRI] in a property subframe is an "
  "invalid type value",
  input={"@context": _CTX, "@id": "urn:a", "alpha": {"@id": "urn:b"}},
  frame={"@context": _CTX, "alpha": {"@type": [{}, "urn:t"]}},
  options={"base": _BASE}, neg=True)

c("frame", "fm114", "frame",
  "a frame @type beside an @list key is an invalid set or list "
  "object (frame-mode @type always stores as an array)",
  input={"@context": _CTX, "@id": "urn:a", "beta": "x"},
  frame={"@context": _CTX,
         "beta": {"@list": [{}], "@type": "urn:t"}},
  options={"base": _BASE}, neg=True)

c("frame", "fm115", "frame",
  "@type default object: matches any node and default-fills the "
  "frame's @type when the node has none",
  input={"@context": _CTX, "@id": "urn:a", "alpha": "x"},
  frame={"@context": _CTX, "@type": {"@default": "T1"}},
  options={"base": _BASE})

c("frame", "fm116", "frame",
  "@type default object does NOT override a node's existing @type",
  input={"@context": _CTX, "@id": "urn:a", "@type": "T9",
         "alpha": "x"},
  frame={"@context": _CTX, "@type": {"@default": "T1"}},
  options={"base": _BASE})

c("frame", "fm117", "frame",
  "@type default fill respects omitDefault",
  input={"@context": _CTX, "@id": "urn:a", "alpha": "x"},
  frame={"@context": _CTX, "@type": {"@default": "T1"}},
  options={"base": _BASE, "omitDefault": True})

c("frame", "fm118", "frame",
  "a non-empty object @value pattern with @language is an invalid "
  "language-tagged value (only strings and {} wildcards may be "
  "language-tagged; no frame exemption)",
  input={"@context": _CTX, "@id": "urn:a", "zeta": "x"},
  frame={"@context": _CTX,
         "zeta": {"@value": {"@default": 5}, "@language": "ar"}},
  options={"base": _BASE}, neg=True)

c("frame", "fm119", "frame",
  "a blank-node @type in a value pattern is an invalid typed value "
  "(absolute non-bnode IRI or {} wildcard only, both modes)",
  input={"@context": _CTX, "@id": "urn:a", "zeta": "s1"},
  frame={"@context": _CTX,
         "zeta": {"@value": "s1", "@type": ["_:b0"]}},
  options={"base": _BASE}, neg=True)
