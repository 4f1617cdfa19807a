"""Round-5 batch h: regressions from the ERROR-AGREEMENT fuzz leg
(`corrupt`: a valid doc with one injected invalid shape — both engines
must agree on error-vs-result).

Kernel fixes covered (corrupt fuzz seed 149 and friends):
  - free-floating-scalar drop is gated on `!insideList`
    (expand.js:90-110): a scalar under a top-level @list expands to a
    value object instead of nulling out;
  - @type storage follows addValue's propertyIsArray=false semantics
    (expand.js:632-658, util.js:261-282): a ONE-element @type array
    collapses to a scalar and an EMPTY @type array stores nothing —
    so the post-process @type-arrayification branch (expand.js:334-336)
    preempts the set/list-object validation (:337-345) exactly when
    the reference's does: a node carrying BOTH a single @type and a
    sibling @list is silently DROPPED at top level ('object with only
    @list' covers any top-level object containing @list), while the
    same node without @type is a hard 'invalid set or list object';
  - a null @list expansion drops the entry before validation
    (expand.js:936-942).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"
_CTX = {"@vocab": "http://fuzz.example/"}

c("expand", "t0470", "expand",
  "node with a single @type AND a sibling @list: the @type "
  "arrayification branch preempts set/list validation; the node then "
  "drops at top level as an object containing @list",
  input={"@context": _CTX, "@id": "urn:n3", "@type": ["T2"],
         "alpha": "x", "@list": 5},
  options={"base": _BASE})

c("expand", "t0471", "expand",
  "same node WITHOUT @type is a hard error: set/list validation "
  "sees count > 1",
  input={"@context": _CTX, "@id": "urn:n3", "@list": 5},
  options={"base": _BASE}, neg=True)

c("expand", "t0472", "expand",
  "TWO @type entries stay an array, so set/list validation fires "
  "even with @type present",
  input={"@context": _CTX, "@id": "urn:n3", "@type": ["T1", "T2"],
         "@list": 5},
  options={"base": _BASE}, neg=True)

c("expand", "t0473", "expand",
  "empty @type array stores nothing (addValue with "
  "propertyIsArray=false): output node carries no @type",
  input={"@context": _CTX, "@id": "urn:n3", "@type": [],
         "alpha": "x"},
  options={"base": _BASE})

c("expand", "t0474", "expand",
  "scalar inside a nested @list under @graph survives the "
  "free-floating-scalar drop (insideList gate)",
  input={"@context": _CTX, "@id": "urn:n0",
         "@graph": [{"@id": "urn:n1",
                     "alpha": {"@list": ["s", 5, True]}}]},
  options={"base": _BASE})
