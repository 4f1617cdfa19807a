"""Round-5 batch x: default-port stripping in URL parsing.

Reference url.js:44-49: api.parse strips ':443' (https) / ':80' (http)
from the authority (a first-occurrence string replace), so base
resolution and relativization treat 'https://h.example:443/' and
'https://h.example/' as the same root.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name,
                  **kw})


V = "http://fuzz.example/"

c("expand", "t0510", "expand",
  "a base carrying the default https port resolves relative @ids "
  "with the port STRIPPED",
  input={"@context": {"@vocab": V}, "@id": "x", "alpha": "v"},
  options={"base": "https://h.example:443/dir/doc"})

c("compact", "c224", "compact",
  "relativization roots ignore the default port: an IRI without "
  ":443 relativizes against a base that carries it",
  input={"@context": {"@vocab": V},
         "@id": "https://h.example/dir/y", "alpha": "v"},
  context={"@vocab": V},
  options={"base": "https://h.example:443/dir/doc"})
