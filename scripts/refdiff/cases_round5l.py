"""Round-5 batch l: manifest-expressible regressions from the
seventh-wave 13-op campaign over seeds 0-9999.

Kernel fixes covered:
  - set/list-object validation is a pure COUNT check
    (expand.js:337-345): at most one other property and it must be
    @index, so {"@set": ..., "@list": ...} is invalid even though
    both keys are set/list keywords (corrupt seeds 1949/2627/6099);
  - the language-map BCP47 safe-mode event fires PER ITEM
    (expand.js:1163-1180): a malformed key whose value array is
    EMPTY emits nothing (link seed 4859);
  - the @type-map single-entry recompact checks ONLY single-entry +
    @id-in-expandedItem (compact.js:610-620; the comment says "key
    maps to @id" but the code never inspects the key), so a list
    object carrying an id-map-injected @id collapses to its subject
    reference (compactX seed 9227).

Fuzz-only classes from the same sweep (reference side is a raw
TypeError with no manifest error code, so they stay campaign-pinned):
a non-string literal value (null/object/array @value with an ARRAY
@type that defeats the '@json' check) reaching N-Quads serialization
(toRdf.js:343-345 + NQuads escape; seeds 2964/4656/5024/6683), and a
null-compacted @json value reaching index/id/type-map packing
(compact.js:563; seed 5382).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"
_CTX = {"@vocab": "http://fuzz.example/"}

c("expand", "t0481", "expand",
  "an object with both @set and @list is an invalid set or list "
  "object (count rule: at most one other property, @index only)",
  input={"@context": _CTX, "@id": "urn:n1",
         "alpha": {"@set": [], "@list": "x"}},
  options={"base": _BASE}, neg=True)

c("expand", "t0482", "expand",
  "@set plus @list plus @index is still invalid (the @index "
  "exemption only applies at exactly two properties)",
  input={"@context": _CTX, "@id": "urn:n1",
         "alpha": {"@set": ["v"], "@list": ["w"], "@index": "i"}},
  options={"base": _BASE}, neg=True)

c("expand", "t0483", "expand",
  "safe mode: a malformed language-map key with an EMPTY value "
  "array emits no BCP47 event (the check runs per item)",
  input={"@context": {"@vocab": "http://fuzz.example/",
                      "gamma": {"@id": "http://fuzz.example/gamma",
                                "@container": "@language"}},
         "@id": "urn:n1", "alpha": "keep",
         "gamma": {"@list": [], "not a tag!": None}},
  options={"base": _BASE, "safe": True})

c("expand", "t0484", "expand",
  "safe mode: the same malformed language-map key WITH a value does "
  "emit the BCP47 event",
  input={"@context": {"@vocab": "http://fuzz.example/",
                      "gamma": {"@id": "http://fuzz.example/gamma",
                                "@container": "@language"}},
         "@id": "urn:n1",
         "gamma": {"not a tag!": "v"}},
  options={"base": _BASE, "safe": True}, neg=True)

c("compact", "c208", "compact",
  "@type-map packing: a single-entry compacted item whose expanded "
  "item carries an @id recompacts to its subject reference even when "
  "the single entry is @list (id-map-injected @id on a list object)",
  input={"@context": {"@vocab": "http://fuzz.example/",
                      "epsilon": {"@id": "http://fuzz.example/epsilon",
                                  "@container": "@id", "@type": "@id"}},
         "@id": "urn:n0",
         "epsilon": {"beta": {"@list": []},
                     "px:suffix2": {"@list": ["leaf"]}}},
  context={"@vocab": "http://fuzz.example/",
           "epsilon": {"@id": "http://fuzz.example/epsilon",
                       "@container": "@type", "@type": "@vocab"}},
  options={"base": _BASE})
