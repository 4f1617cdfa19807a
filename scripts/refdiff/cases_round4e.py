"""Round-4 batch e: context-definition pathology (term cycles, keyword
redefinition, empty-string terms, null @vocab/@base clearing, IRI-shaped
terms), expansion of free-floating @reverse, fromRDF list-shape edge
cases (cycles, shared tails, typed nodes, broken chains), and JS number
formatting through toRDF. Differential: reference output is the truth."""

EX = "http://example.com/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- term definition pathology ----------------------------
c("expand", "t0362", "expand", "term cycle a->b->a raises",
  input={"@context": {"a": "b:x", "b": "a:y"},
         "a:p": "v", "@id": "urn:id"}, neg=True)
c("expand", "t0363", "expand", "self-referential term a->a:x raises",
  input={"@context": {"a": "a:x"}, "a:p": "v"}, neg=True)
c("expand", "t0364", "expand", "keyword cannot be redefined",
  input={"@context": {"@id": EX + "id"}, "@id": "urn:a",
         EX + "p": "v"}, neg=True)
c("expand", "t0365", "expand", "empty-string term raises",
  input={"@context": {"": EX + "empty"}, "": "v",
         "@id": "urn:a"}, neg=True)
c("expand", "t0366", "expand", "IRI-shaped term maps consistently",
  input={"@context": {"http://term.example/x": EX + "mapped"},
         "http://term.example/x": "v", "@id": "urn:a"})
c("expand", "t0367", "expand", "IRI-shaped term with MISmatched @id raises",
  input={"@context": {"http://term.example/x":
                      {"@id": EX + "different"}},
         "http://term.example/x": "v", "@id": "urn:a"}, neg=True)
c("expand", "t0368", "expand", "null @vocab clears inherited vocab",
  input={"@context": [{"@vocab": EX},
                      {"@vocab": None}],
         "term": "dropped", "@id": "urn:a", EX + "p": "kept"})
c("expand", "t0369", "expand", "null @base clears document base",
  options={"base": "http://base.example/doc"},
  input={"@context": {"@base": None},
         "@id": "relative", "urn:p": "v"})
c("expand", "t0370", "expand", "@base relative to outer @base chains",
  options={"base": "http://base.example/a/doc"},
  input={"@context": [{"@base": "sub/"},
                      {"@base": "deeper/"}],
         "@id": "leaf", "urn:p": "v"})
c("expand", "t0371", "expand", "term mapping to null blocks property",
  input={"@context": [{"p": EX + "p"}, {"p": None}],
         "p": "dropped", "@id": "urn:a", "urn:q": "kept"})
c("expand", "t0372", "expand", "single @ as term name",
  input={"@context": {"@": EX + "at"}, "@": "v", "@id": "urn:a"})
c("expand", "t0373", "expand", "term looks like CURIE of defined prefix",
  input={"@context": {"ex": EX, "ex:pre": {"@id": EX + "override"}},
         "ex:pre": "v", "@id": "urn:a"})

# ----------------- free-floating @reverse -------------------------------
c("expand", "t0374", "expand", "top-level only-@reverse node",
  input={"@reverse": {EX + "p": [{"@id": "urn:b"}]}})
c("expand", "t0375", "expand", "@reverse with value object raises",
  input={"@context": {"rev": {"@reverse": EX + "p"}},
         "@id": "urn:a", "rev": "scalar"}, neg=True)
c("expand", "t0376", "expand", "@reverse of @reverse double inversion",
  input={"@context": {"@vocab": EX},
         "@id": "urn:a",
         "@reverse": {"parent": {"@id": "urn:b",
                                 "@reverse": {"child":
                                              {"@id": "urn:c"}}}}})

# ----------------- fromRDF list-shape edges -----------------------------
c("fromRdf", "fr073", "fromRDF", "list cycle back to head stays nodes",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}rest> _:l2 .\n'
        f'_:l2 <{RDF}first> "b" .\n'
        f'_:l2 <{RDF}rest> _:l1 .\n')
c("fromRdf", "fr074", "fromRDF", "shared tail keeps second list unmerged",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'<urn:b> <{EX}p> _:l2 .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}rest> _:t .\n'
        f'_:l2 <{RDF}first> "b" .\n'
        f'_:l2 <{RDF}rest> _:t .\n'
        f'_:t <{RDF}first> "tail" .\n'
        f'_:t <{RDF}rest> <{RDF}nil> .\n')
c("fromRdf", "fr075", "fromRDF", "list node with extra property not a list",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}rest> <{RDF}nil> .\n'
        f'_:l1 <{EX}extra> "x" .\n')
c("fromRdf", "fr076", "fromRDF", "list node with rdf:List type still list",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}type> <{RDF}List> .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}rest> <{RDF}nil> .\n')
c("fromRdf", "fr077", "fromRDF", "list node with foreign type not a list",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}type> <{EX}T> .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}rest> <{RDF}nil> .\n')
c("fromRdf", "fr078", "fromRDF", "double rdf:first breaks list shape",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}first> "a" .\n'
        f'_:l1 <{RDF}first> "a2" .\n'
        f'_:l1 <{RDF}rest> <{RDF}nil> .\n')
c("fromRdf", "fr079", "fromRDF", "IRI-subject list node not folded",
  input=f'<urn:a> <{EX}p> <urn:l1> .\n'
        f'<urn:l1> <{RDF}first> "a" .\n'
        f'<urn:l1> <{RDF}rest> <{RDF}nil> .\n')
c("fromRdf", "fr080", "fromRDF", "rdf:nil as plain object value",
  input=f'<urn:a> <{EX}p> <{RDF}nil> .\n')
c("fromRdf", "fr081", "fromRDF", "rdf:nil with own properties",
  input=f'<urn:a> <{EX}p> <{RDF}nil> .\n'
        f'<{RDF}nil> <{EX}note> "odd but legal" .\n')
c("fromRdf", "fr082", "fromRDF", "list head in named graph, ref in default",
  input=f'<urn:a> <{EX}p> _:l1 .\n'
        f'_:l1 <{RDF}first> "a" <urn:g> .\n'
        f'_:l1 <{RDF}rest> <{RDF}nil> <urn:g> .\n')

# ----------------- JS number formatting through toRDF -------------------
c("toRdf", "tr075", "toRDF", "integer-valued double over 1e21 exponent form",
  input={"@context": {"@vocab": EX}, "@id": "urn:a",
         "p": [1e21, 1e22]})
c("toRdf", "tr076", "toRDF", "max-precision doubles survive round-trip",
  input={"@context": {"@vocab": EX}, "@id": "urn:a",
         "p": [0.30000000000000004, 9007199254740993.0]})
c("toRdf", "tr077", "toRDF", "coerced double from integer value",
  input={"@context": {"p": {"@id": EX + "p",
                            "@type":
                            "http://www.w3.org/2001/XMLSchema#double"}},
         "@id": "urn:a", "p": 7})
c("toRdf", "tr078", "toRDF", "boolean coerced to xsd:integer keeps bool form",
  input={"@context": {"p": {"@id": EX + "p",
                            "@type":
                            "http://www.w3.org/2001/XMLSchema#integer"}},
         "@id": "urn:a", "p": True})
