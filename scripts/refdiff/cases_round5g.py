"""Round-5 batch g: regression from the FOREIGN-FRAME leg (frameX:
frame each fuzz doc with a frame generated against an independent doc,
so patterns misalign and non-match/default paths drive the output).

Kernel fix covered: a subject reference whose ACTIVE PROPERTY expands
to @graph — i.e. an entry of a raw/aliased "@graph" key kept on a
non-simple graph object — scalar-compacts to its document-relative
IRI (compact.js:1049-1062: `expandedProperty === '@graph'` joins the
`type === '@id' / '@vocab'` scalar clause). Found at fuzz seed 4379.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

c("frame", "fm112", "frame",
  "subject reference under a kept raw @graph key scalar-compacts to "
  "its IRI (active property expands to @graph)",
  input={"@context": {"@base": "http://base.example/dir/",
                      "epsilon": "http://fuzz.example/epsilon",
                      "delta": {"@id": "http://fuzz.example/delta",
                                "@container": ["@index", "@set"],
                                "@type": "@vocab"}},
         "delta": [{"@id": "_:b0",
                    "gamma": "leaf",
                    "epsilon": "leaf",
                    "@graph": [{"@id": "http://fuzz.example/n1",
                                "@type": "T1",
                                "delta": "leaf",
                                "beta": "leaf",
                                "@index": "idx0"}]}]},
  frame={"@context": {"delta": {"@id": "http://fuzz.example/delta",
                                "@container": ["@graph", "@index"],
                                "@type": "@vocab"}},
         "delta": {"@list": [{"@value": "s1"}]}},
  options={"base": _BASE})
