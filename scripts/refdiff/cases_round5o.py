"""Round-5 batch o: xsd:double-coerced non-double values go through
ES parseFloat (grammar wave 11).

The reference funnels EVERY value whose datatype is exactly
XSD_DOUBLE through `parseFloat` + toExponential(15)
(toRdf.js:300-306): a non-numeric string becomes "NaN"^^xsd:double,
'3e' parses its longest valid prefix 3, 'Infinity' survives as the
JS string 'Infinity'. Booleans don't reach it (the isBoolean arm is
first), and an ARRAY @type is never === XSD_DOUBLE.
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
XD = "http://www.w3.org/2001/XMLSchema#double"
_CTX = {"@vocab": V, "d": {"@id": V + "d", "@type": XD}}

c("toRdf", "tdi12", "toRDF",
  "xsd:double-coerced strings go through ES parseFloat: garbage is "
  "NaN, '3e' is 3, 'Infinity' and '-Infinity' survive, '  +.5x' is .5",
  input={"@context": _CTX, "@id": "urn:n1",
         "d": ["leaf", "3e", "Infinity", "-Infinity", "  +.5x",
               "12.5say", ".25"]},
  options={"base": _BASE})

c("toRdf", "tdi13", "toRDF",
  "a NUMBER under xsd:double coercion uses the canonical exponential "
  "form; an explicit non-double typed value keeps its lexical form",
  input={"@context": _CTX, "@id": "urn:n1",
         "d": [5, 0.1, {"@value": "leaf",
                        "@type": V + "other"}]},
  options={"base": _BASE})
