"""Round-3 frame + fromRDF candidates (framing match semantics, embed
modes, list folding edge cases, native-type conversion quirks) —
differentially validated via diffgen.py against the reference."""

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_CTX = {"@vocab": EX, "ex": EX}

CASES = [
    # ---------------- frame ----------------
    {"suite": "frame", "id": "fm017", "op": "frame",
     "name": "frame matches by property presence (empty-object wildcard)",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A", "extra": "e"},
         {"@id": "ex:b", "other": "B"}]},
     "frame": {"@context": _CTX, "name": {}}},
    {"suite": "frame", "id": "fm018", "op": "frame",
     "name": "match-none [] requires the property to be absent",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A"},
         {"@id": "ex:b", "other": "B"}]},
     "frame": {"@context": _CTX, "name": []}},
    {"suite": "frame", "id": "fm019", "op": "frame",
     "name": "@embed: @always re-embeds at every reference",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "child": {"@id": "ex:c"}},
         {"@id": "ex:b", "child": {"@id": "ex:c"}},
         {"@id": "ex:c", "name": "C"}]},
     "frame": {"@context": _CTX, "@embed": "@always", "child": {}}},
    {"suite": "frame", "id": "fm020", "op": "frame",
     "name": "@embed: @once embeds first, references after",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "child": {"@id": "ex:c"}},
         {"@id": "ex:b", "child": {"@id": "ex:c"}},
         {"@id": "ex:c", "name": "C"}]},
     "frame": {"@context": _CTX, "@embed": "@once", "child": {}}},
    {"suite": "frame", "id": "fm021", "op": "frame",
     "name": "value pattern matches by @language",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "label": {"@value": "hi", "@language": "en"}},
         {"@id": "ex:b", "label": {"@value": "salut", "@language": "fr"}}]},
     "frame": {"@context": _CTX,
               "label": {"@value": {}, "@language": "en"}}},
    {"suite": "frame", "id": "fm022", "op": "frame",
     "name": "value pattern with array of allowed @values",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "n": 1}, {"@id": "ex:b", "n": 2},
         {"@id": "ex:c", "n": 3}]},
     "frame": {"@context": _CTX, "n": {"@value": [1, 3]}}},
    {"suite": "frame", "id": "fm023", "op": "frame",
     "name": "@default: @null omits the property from output",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T", "name": "A"},
         {"@id": "ex:b", "@type": "T"}]},
     "frame": {"@context": _CTX, "@type": "T",
               "name": {"@default": "@null"}}},
    {"suite": "frame", "id": "fm024", "op": "frame",
     "name": "reverse framing embeds referencing nodes under @reverse",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:parent", "child": {"@id": "ex:kid"}},
         {"@id": "ex:kid", "name": "K"}]},
     "frame": {"@context": _CTX, "@id": "ex:kid",
               "@reverse": {"child": {}}}},
    {"suite": "frame", "id": "fm025", "op": "frame",
     "name": "list values are framed and embedded",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "items": {"@list": [
             {"@id": "ex:x"}, {"@id": "ex:y"}]}},
         {"@id": "ex:x", "name": "X"}, {"@id": "ex:y", "name": "Y"}]},
     "frame": {"@context": _CTX, "@id": "ex:a"}},
    {"suite": "frame", "id": "fm026", "op": "frame",
     "name": "nested frame restricts embedded node pattern",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "child": {"@id": "ex:c1"}},
         {"@id": "ex:b", "child": {"@id": "ex:c2"}},
         {"@id": "ex:c1", "@type": "Good", "name": "C1"},
         {"@id": "ex:c2", "@type": "Bad", "name": "C2"}]},
     "frame": {"@context": _CTX, "child": {"@type": "Good"}}},
    {"suite": "frame", "id": "fm027", "op": "frame",
     "name": "@explicit: false inherited by nested frames",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T",
          "child": {"@id": "ex:c"}},
         {"@id": "ex:c", "name": "C", "extra": "E"}]},
     "frame": {"@context": _CTX, "@explicit": False, "@type": "T",
               "child": {"@explicit": True, "name": {}}}},
    {"suite": "frame", "id": "fm028", "op": "frame",
     "name": "unreferenced blank node ids pruned in 1.1",
     "input": {"@context": _CTX, "@graph": [
         {"name": "anon", "child": {"name": "inner"}}]},
     "frame": {"@context": _CTX, "name": {}}},
    {"suite": "frame", "id": "fm029", "op": "frame",
     "name": "referenced blank node keeps its id after pruning",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "_:shared", "name": "S"},
         {"@id": "ex:a", "child": {"@id": "_:shared"}},
         {"@id": "ex:b", "child": {"@id": "_:shared"}}]},
     "frame": {"@context": _CTX, "@embed": "@never", "child": {}}},
    {"suite": "frame", "id": "fm030", "op": "frame",
     "name": "invalid @embed value fails",
     "input": {"@context": _CTX, "@graph": [{"@id": "ex:a", "name": "A"}]},
     "frame": {"@context": _CTX, "@embed": "@bogus"},
     "neg": True},
    {"suite": "frame", "id": "fm031", "op": "frame",
     "name": "frame @id with relative IRI resolves against base",
     "options": {"base": EX + "dir/doc"},
     "input": {"@context": _CTX, "@graph": [
         {"@id": EX + "dir/a", "name": "A"},
         {"@id": EX + "dir/b", "name": "B"}]},
     "frame": {"@context": _CTX, "@id": "a"}},
    {"suite": "frame", "id": "fm032", "op": "frame",
     "name": "requireAll with @default still matches",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "name": "A"},
         {"@id": "ex:b", "name": "B", "size": 2}]},
     "frame": {"@context": _CTX, "@requireAll": True,
               "name": {}, "size": {"@default": 0}}},
    {"suite": "frame", "id": "fm033", "op": "frame",
     "name": "framing a named graph via @graph in the frame",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:g", "@graph": [
             {"@id": "ex:a", "name": "inA"}]},
         {"@id": "ex:a", "name": "outA"}]},
     "frame": {"@context": _CTX, "@id": "ex:g",
               "@graph": {"@id": "ex:a"}}},
    {"suite": "frame", "id": "fm034", "op": "frame",
     "name": "frame matching typed values by @type pattern",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a",
          "when": {"@value": "2024-01-01", "@type": XSD + "date"}},
         {"@id": "ex:b", "when": {"@value": "x", "@type": XSD + "string"}}]},
     "frame": {"@context": _CTX,
               "when": {"@value": {}, "@type": XSD + "date"}}},
    {"suite": "frame", "id": "fm035", "op": "frame",
     "name": "@null default serialization removed from final output",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T"}]},
     "frame": {"@context": _CTX, "@type": "T",
               "name": {"@default": "@null"}, "size": {"@default": 7}}},
    {"suite": "frame", "id": "fm036", "op": "frame",
     "name": "@omitDefault inside the frame overrides the option",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T"}]},
     "frame": {"@context": _CTX, "@type": "T", "@omitDefault": True,
               "name": {"@default": "gone?"}}},
    {"suite": "frame", "id": "fm037", "op": "frame",
     "name": "@included nodes are framed alongside the tree",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T", "name": "A",
          "@included": [{"@id": "ex:side", "@type": "S", "name": "Side"}]}]},
     "frame": {"@context": _CTX, "@type": "T"}},
    {"suite": "frame", "id": "fm038", "op": "frame",
     "name": "frame with embedded @id-only child keeps reference shape",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "child": {"@id": "ex:missing"}}]},
     "frame": {"@context": _CTX, "@id": "ex:a"}},
    {"suite": "frame", "id": "fm039", "op": "frame",
     "name": "two top-level matches stay wrapped in @graph (1.0)",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:a", "@type": "T"}, {"@id": "ex:b", "@type": "T"}]},
     "frame": {"@context": _CTX, "@type": "T"}},
    {"suite": "frame", "id": "fm040", "op": "frame",
     "name": "frame with explicit @graph: @merged wildcard",
     "input": {"@context": _CTX, "@graph": [
         {"@id": "ex:g", "@graph": [{"@id": "ex:a", "name": "inA"}]},
         {"@id": "ex:b", "name": "B"}]},
     "frame": {"@context": _CTX, "name": {}}},

    # ---------------- fromRDF ----------------
    {"suite": "fromRdf", "id": "fr015", "op": "fromRDF",
     "name": "hex lexical integer with useNativeTypes (JS Number quirk)",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "0x10"^^<{XSD}integer> .\n'},
    {"suite": "fromRdf", "id": "fr016", "op": "fromRDF",
     "name": "hex lexical double with useNativeTypes (parseFloat quirk)",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "0x10"^^<{XSD}double> .\n'},
    {"suite": "fromRdf", "id": "fr017", "op": "fromRDF",
     "name": "non-canonical double lexical 1.0E1 with useNativeTypes",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "1.0E1"^^<{XSD}double> .\n'},
    {"suite": "fromRdf", "id": "fr018", "op": "fromRDF",
     "name": "invalid integer lexical stays a typed string",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "abc"^^<{XSD}integer> .\n'},
    {"suite": "fromRdf", "id": "fr019", "op": "fromRDF",
     "name": "integer above 2^53 fails the toFixed round-trip gate",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "9007199254740993"^^<{XSD}integer> .\n'},
    {"suite": "fromRdf", "id": "fr020", "op": "fromRDF",
     "name": "boolean lexical variants 1/0/TRUE under useNativeTypes",
     "options": {"useNativeTypes": True},
     "input": (f'<{EX}a> <{EX}v1> "1"^^<{XSD}boolean> .\n'
               f'<{EX}a> <{EX}v2> "0"^^<{XSD}boolean> .\n'
               f'<{EX}a> <{EX}v3> "TRUE"^^<{XSD}boolean> .\n')},
    {"suite": "fromRdf", "id": "fr021", "op": "fromRDF",
     "name": "NaN and INF double lexicals stay typed strings",
     "options": {"useNativeTypes": True},
     "input": (f'<{EX}a> <{EX}v1> "NaN"^^<{XSD}double> .\n'
               f'<{EX}a> <{EX}v2> "INF"^^<{XSD}double> .\n')},
    {"suite": "fromRdf", "id": "fr022", "op": "fromRDF",
     "name": "explicit xsd:string literal has no @type",
     "input": f'<{EX}a> <{EX}v> "plain"^^<{XSD}string> .\n'},
    {"suite": "fromRdf", "id": "fr023", "op": "fromRDF",
     "name": "rdf:JSON literal becomes @json value",
     "input": (f'<{EX}a> <{EX}v> '
               f'"{{\\"b\\":[1,true,null]}}"^^<{RDF}JSON> .\n')},
    {"suite": "fromRdf", "id": "fr024", "op": "fromRDF",
     "name": "invalid JSON in rdf:JSON literal fails",
     "input": f'<{EX}a> <{EX}v> "{{oops"^^<{RDF}JSON> .\n',
     "neg": True},
    {"suite": "fromRdf", "id": "fr025", "op": "fromRDF",
     "name": "list node with extra property is not folded",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> <{RDF}nil> .\n'
               f'_:l0 <{EX}extra> "e" .\n')},
    {"suite": "fromRdf", "id": "fr026", "op": "fromRDF",
     "name": "list tail referenced from two heads folds only once",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'<{EX}b> <{EX}v> _:l1 .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> _:shared .\n'
               f'_:l1 <{RDF}first> "y" .\n'
               f'_:l1 <{RDF}rest> _:shared .\n'
               f'_:shared <{RDF}first> "z" .\n'
               f'_:shared <{RDF}rest> <{RDF}nil> .\n')},
    {"suite": "fromRdf", "id": "fr027", "op": "fromRDF",
     "name": "cyclic rdf:rest chain is left unfolded",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> _:l1 .\n'
               f'_:l1 <{RDF}first> "y" .\n'
               f'_:l1 <{RDF}rest> _:l0 .\n')},
    # fr028 "blank node graph name" is a DOCUMENTED DIVERGENCE, not a
    # fixture: the reference's fromRdf uses the raw RDF/JS graph value as
    # the graph name (fromRdf.js:80-86 — no '_:' re-added, unlike _nodeId
    # for subjects/objects), so a quad in graph `_:g` yields a node with
    # "@id": "g" — a relative IRI that loses bnode-ness on round-trip.
    # This port keeps the spec-correct "_:g". See NOTES_r3.md.
    {"suite": "fromRdf", "id": "fr029", "op": "fromRDF",
     "name": "same subject in default and named graph stays separate",
     "input": (f'<{EX}a> <{EX}v> "default" .\n'
               f'<{EX}a> <{EX}v> "named" <{EX}g> .\n')},
    {"suite": "fromRdf", "id": "fr030", "op": "fromRDF",
     "name": "i18n datatype without rdfDirection stays a typed string",
     "input": (f'<{EX}a> <{EX}v> '
               f'"hello"^^<https://www.w3.org/ns/i18n#en_rtl> .\n')},
    {"suite": "fromRdf", "id": "fr031", "op": "fromRDF",
     "name": "i18n datatype with direction only (no language)",
     "options": {"rdfDirection": "i18n-datatype"},
     "input": (f'<{EX}a> <{EX}v> '
               f'"hello"^^<https://www.w3.org/ns/i18n#_rtl> .\n')},
    {"suite": "fromRdf", "id": "fr032", "op": "fromRDF",
     "name": "rdf:type with literal value is kept as a property",
     "input": f'<{EX}a> <{RDF}type> <{EX}T> <{EX}g> .\n'},
    {"suite": "fromRdf", "id": "fr033", "op": "fromRDF",
     "name": "list of lists reconstructs nested @list",
     "input": (f'<{EX}a> <{EX}v> _:outer .\n'
               f'_:outer <{RDF}first> _:inner .\n'
               f'_:outer <{RDF}rest> <{RDF}nil> .\n'
               f'_:inner <{RDF}first> "x" .\n'
               f'_:inner <{RDF}rest> <{RDF}nil> .\n')},
    {"suite": "fromRdf", "id": "fr034", "op": "fromRDF",
     "name": "list head also used as a subject elsewhere is not folded",
     "input": (f'<{EX}a> <{EX}v> _:l0 .\n'
               f'_:l0 <{RDF}first> "x" .\n'
               f'_:l0 <{RDF}rest> <{RDF}nil> .\n'
               f'<{EX}b> <{EX}w> _:l0 .\n')},
    {"suite": "fromRdf", "id": "fr035", "op": "fromRDF",
     "name": "useNativeTypes double with exponent round-trips to number",
     "options": {"useNativeTypes": True},
     "input": f'<{EX}a> <{EX}v> "5.3E0"^^<{XSD}double> .\n'},
]
