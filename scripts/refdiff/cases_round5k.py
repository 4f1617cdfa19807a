"""Round-5 batch k: regressions from the seventh-wave grammar
(relative IRIs, explicit @list/@set objects, @direction value objects,
@json value objects) and the link leg.

Kernel fixes covered:
  - {"@set": null}: a null expansion drops the KEY only
    (expand.js:936-942), leaving an empty {} node object that
    SURVIVES expansion as [{}] (fuzz seed 152);
  - the relative-@type-reference event exempts '@json' exactly
    (expand.js:639 `ve !== '@json'`): under safe mode a
    {"@value": ..., "@type": "@json"} literal must NOT error
    (fuzz seed 142);
  - a null-expanded @type (keyword-like string) DOES emit the event
    (the reference checks isAbsolute(null) = false, no null guard).

The @link identity topology fixes from the same wave (root/inner
`is`-sharing through cleanupNull's in-place walk) are pinned in
tests/test_api_surface.py — object identity is not expressible in a
JSON manifest fixture.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"
_CTX = {"@vocab": "http://fuzz.example/"}

c("expand", "t0477", "expand",
  "a null @set value drops the key only; the empty object survives "
  "as a node object",
  input={"@context": _CTX, "@id": "urn:n1",
         "gamma": {"@set": None},
         "delta": {"@set": None, "@index": "i0"}},
  options={"base": _BASE})

c("expand", "t0478", "expand",
  "safe mode: a @json-typed value object does not trip the relative "
  "@type reference event ('@json' is exempt, expand.js:639)",
  input={"@context": _CTX, "@id": "urn:n1",
         "alpha": {"@list": {"@value": 42, "@type": "@json"}}},
  options={"base": _BASE, "safe": True})

c("expand", "t0479", "expand",
  "safe mode: a keyword-like @type that expands to null DOES trip "
  "the relative @type reference event (no null guard in the "
  "reference's isAbsolute check)",
  input={"@context": _CTX, "@id": "urn:n1", "@type": "@bogus",
         "alpha": "x"},
  options={"base": _BASE, "safe": True}, neg=True)

c("expand", "t0480", "expand",
  "relative @id forms resolve against the document base through "
  "expansion (dot segments, fragment, query, network-path, empty)",
  input={"@context": _CTX, "@id": "rel/../dot#f",
         "alpha": [{"@id": "../up"}, {"@id": "#frag"}, {"@id": ""},
                   {"@id": "//net.example/x"}, {"@id": "?q=1"}]},
  options={"base": _BASE})
