"""Round-5 batch q: aliased-@graph framed-output wrapping (grammar
wave 12, fuzz seed 113 class).

Kernel fix covered: frame's output wrap/unwrap is the COMPACT
algorithm's own collapse/wrap driven by opts.graph = !omitGraph
(jsonld.js:484, 188-245) — the wrapper key is the @graph ALIAS from
the frame context, and with omitGraph the 0/1-element collapse is
gated on compactArrays. An earlier port-side rewrap keyed on the
literal "@graph" string and so missed aliased wrappers entirely.
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
_CTX = {"@version": 1.1, "@vocab": V, "gr": "@graph"}

c("frame", "fm121", "frame",
  "aliased @graph + omitGraph (1.1 default): a single match collapses "
  "to the node itself — no wrapper key, aliased or raw",
  input={"@context": _CTX, "@id": "urn:a", "@type": "T1",
         "alpha": "x"},
  frame={"@context": _CTX, "@type": "T1"},
  options={"base": _BASE})

c("frame", "fm122", "frame",
  "aliased @graph + omitGraph: ZERO matches collapse to {} and emit "
  "just the context (no empty aliased @graph key)",
  input={"@context": _CTX, "@id": "urn:a", "alpha": "x"},
  frame={"@context": _CTX, "@type": "T9"},
  options={"base": _BASE})

c("frame", "fm123", "frame",
  "aliased @graph + omitGraph=false: the graph wrap uses the ALIAS "
  "as its key",
  input={"@context": _CTX, "@id": "urn:a", "@type": "T1",
         "alpha": "x"},
  frame={"@context": _CTX, "@type": "T1"},
  options={"base": _BASE, "omitGraph": False})

c("frame", "fm124", "frame",
  "aliased @graph + omitGraph: TWO matches stay an array and wrap "
  "under the alias",
  input={"@context": _CTX, "@graph": [
      {"@id": "urn:a", "@type": "T1", "alpha": "x"},
      {"@id": "urn:b", "@type": "T1", "alpha": "y"}]},
  frame={"@context": _CTX, "@type": "T1"},
  options={"base": _BASE})

c("frame", "fm125", "frame",
  "omitGraph + compactArrays=false: the single-match collapse is "
  "GATED on compactArrays, so the match stays wrapped under @graph",
  input={"@context": _CTX, "@id": "urn:a", "@type": "T1",
         "alpha": "x"},
  frame={"@context": _CTX, "@type": "T1"},
  options={"base": _BASE, "compactArrays": False})
