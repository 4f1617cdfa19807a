"""Round-5 batch p: NULLED property-index fallback (wave-11 fuzz
seed 3551).

A property-based index container whose @index TERM is explicitly
nulled gives a JS-falsy propertyIndex (expand.js:868-870), so the
injection arm is skipped and the verbatim `item[indexKey] = key`
fallback stores the RAW key string under the RAW index-term key
(expand.js:1270-1272). Downstream: createNodeMap iterates that bare
string's CHARACTERS (nodeMap.js:168-182, `for(let o of objects)`),
and compaction hard-errors code-less ('expanded value must be an
array', compact.js:348-353).
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
_CTX = {"@version": 1.1, "@vocab": V, "alpha": None,
        "eps": {"@id": V + "eps",
                "@container": ["@graph", "@index"], "@index": "alpha"}}

c("expand", "t0497", "expand",
  "nulled property-index term: falsy propertyIndex skips the value "
  "injection and stores the RAW key under the RAW term key verbatim",
  input={"@context": _CTX, "@id": "urn:n1",
         "eps": {"@none": "a", "k1": "b"}},
  options={"base": _BASE})

c("flatten", "f029", "flatten",
  "the verbatim raw-string property iterates as CHARACTERS in the "
  "node map (for..of on a bare string)",
  input={"@context": _CTX, "@id": "urn:n1",
         "eps": {"kk1": "b"}},
  options={"base": _BASE})

c("compact", "c217", "compact",
  "compacting a node with the verbatim raw-string property is a hard "
  "code-less SyntaxError (expanded value must be an array)",
  input={"@context": _CTX, "@id": "urn:n1", "eps": {"k1": "b"}},
  context=_CTX, options={"base": _BASE}, neg=True)
