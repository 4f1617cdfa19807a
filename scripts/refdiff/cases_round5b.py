"""Round-5 batch b: fromRDF strict-parity regressions found by adding
the fromRDF leg to the differential fuzzer (N-Quads transport generated
by this kernel's serializer, consumed by BOTH engines).

Kernel fixes covered:
  - useNativeTypes bypasses the xsd:string suppression, so plain
    strings carry an explicit @type xsd:string (fromRdf.js:351-377
    else-branch; fuzz seeds 46/57)
  - a blank-node GRAPH NAME is keyed by its raw RDF/JS term value, so
    the "_:" prefix is lost in the output ("b1" as a relative-looking
    @id — fromRdf.js:79-80 uses quad.graph.value without _nodeId;
    fuzz seed 32)
"""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


c("fromRdf", "fr056", "fromRDF",
  "useNativeTypes keeps explicit xsd:string on plain literals",
  input=(f'<{EX}s> <{EX}plain> "leaf" .\n'
         f'<{EX}s> <{EX}empty> "" .\n'
         f'<{EX}s> <{EX}typed> '
         '"7"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'),
  options={"useNativeTypes": True})

c("fromRdf", "fr057", "fromRDF",
  "blank-node graph name loses its _: prefix in the default graph",
  input=(f'_:b0 <{EX}p> _:b1 .\n'
         f'_:b2 <{EX}q> "v" _:b1 .\n'))

c("fromRdf", "fr058", "fromRDF",
  "bnode graph name prefix loss composes with useNativeTypes strings",
  input=(f'_:b2 <{EX}q> "v" _:b1 .\n'
         f'_:b2 <{EX}r> '
         '"true"^^<http://www.w3.org/2001/XMLSchema#boolean> _:b1 .\n'),
  options={"useNativeTypes": True})
