"""Round-4 batch c: @protected/@propagate/@import context machinery,
inverse-context compaction corners, frame sub-option matrices, N-Quads
parser escape/lexical forms (differential THROUGH the fromRDF op: the
reference side parses with rdf-canonize's NQuads, this port with
core/nquads.py — a direct two-parser differential), and @json JCS
number canonicalization via toRDF."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ----------------- @protected interactions ----------------------------
c("expand", "t0343", "expand", "protected term override in nested ctx raises",
  input={"@context": {"@version": 1.1, "@protected": True,
                      "p": EX + "p"},
         "@id": "urn:a",
         "sub": {"@context": {"p": EX + "other"},
                 "p": "v"}}, neg=True)
c("expand", "t0344", "expand", "protected term same definition allowed",
  input={"@context": {"@version": 1.1, "@protected": True, "p": EX + "p"},
         "@id": "urn:a",
         EX + "sub": {"@context": {"p": EX + "p"}, "p": "v"}})
c("expand", "t0345", "expand", "property-scoped ctx may override protected",
  input={"@context": {"@version": 1.1, "@protected": True,
                      "p": EX + "p",
                      "wrap": {"@id": EX + "wrap",
                               "@context": {"p": EX + "inner"}}},
         "@id": "urn:a", "wrap": {"p": "v"}})
c("expand", "t0346", "expand", "null context cannot clear protected terms",
  input={"@context": {"@version": 1.1, "@protected": True, "p": EX + "p"},
         "@id": "urn:a",
         EX + "sub": {"@context": None, "p": "v"}}, neg=True)
c("expand", "t0347", "expand", "term-level @protected false exempts term",
  input={"@context": {"@version": 1.1, "@protected": True,
                      "p": {"@id": EX + "p", "@protected": False}},
         "@id": "urn:a",
         EX + "sub": {"@context": {"p": EX + "other"}, "p": "v"}})

# ----------------- @propagate ------------------------------------------
c("expand", "t0348", "expand", "type-scoped ctx does not propagate by default",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "T": {"@id": EX + "T",
                            "@context": {"alias": EX + "scoped"}}},
         "@type": "T", "@id": "urn:a",
         "child": {"@id": "urn:b", "alias": "v"}})
c("expand", "t0349", "expand", "type-scoped ctx with @propagate true persists",
  input={"@context": {"@version": 1.1, "@vocab": EX,
                      "T": {"@id": EX + "T",
                            "@context": {"@propagate": True,
                                         "alias": EX + "scoped"}}},
         "@type": "T", "@id": "urn:a",
         "child": {"@id": "urn:b", "alias": "v"}})
c("expand", "t0350", "expand", "@propagate false on embedded inline ctx",
  input={"@context": {"@version": 1.1, "@vocab": EX},
         "@id": "urn:a",
         "child": {"@context": {"@propagate": False,
                                "alias": EX + "scoped"},
                   "alias": "top",
                   "grand": {"@id": "urn:c", "alias": "deep"}}})
c("expand", "t0351", "expand", "@propagate in 1.0 mode rejected",
  options={"processingMode": "json-ld-1.0"},
  input={"@context": {"@propagate": True, "p": EX + "p"},
         "@id": "urn:a", "p": "v"}, neg=True)

# ----------------- @import ---------------------------------------------
c("expand", "t0352", "expand", "@import merges imported context under local",
  contexts={"https://ctx.example/base.jsonld":
            {"@context": {"p": EX + "imported"}}},
  input={"@context": {"@version": 1.1,
                      "@import": "https://ctx.example/base.jsonld",
                      "q": EX + "q"},
         "@id": "urn:a", "p": "v", "q": "w"})
c("expand", "t0353", "expand", "local term wins over @import term",
  contexts={"https://ctx.example/base.jsonld":
            {"@context": {"p": EX + "imported"}}},
  input={"@context": {"@version": 1.1,
                      "@import": "https://ctx.example/base.jsonld",
                      "p": EX + "local"},
         "@id": "urn:a", "p": "v"})
c("expand", "t0354", "expand", "@import of context containing @import raises",
  contexts={"https://ctx.example/a.jsonld":
            {"@context": {"@version": 1.1,
                          "@import": "https://ctx.example/b.jsonld"}},
            "https://ctx.example/b.jsonld":
            {"@context": {"p": EX + "p"}}},
  input={"@context": {"@version": 1.1,
                      "@import": "https://ctx.example/a.jsonld"},
         "@id": "urn:a", "p": "v"}, neg=True)
c("expand", "t0355", "expand", "@import non-string value raises",
  input={"@context": {"@version": 1.1, "@import": {"p": EX + "p"}},
         "@id": "urn:a"}, neg=True)

# ----------------- inverse-context compaction corners ------------------
c("compact", "c116", "compact", "@none language selection in language map",
  input=[{"@id": "urn:a",
          EX + "label": [{"@value": "x", "@language": "en"},
                         {"@value": "plain"}]}],
  context={"label": {"@id": EX + "label", "@container": "@language"}})
c("compact", "c117", "compact", "type map with @none for untyped node",
  input=[{"@id": "urn:a",
          EX + "p": [{"@id": "urn:b", "@type": [EX + "T"]},
                     {"@id": "urn:c"}]}],
  context={"@version": 1.1, "@vocab": EX,
           "byType": {"@id": EX + "p", "@container": "@type"}})
c("compact", "c118", "compact", "most-specific term wins: type over plain",
  input=[{"@id": "urn:a",
          EX + "p": [{"@value": "2000-01-01",
                      "@type": "http://www.w3.org/2001/XMLSchema#date"}]}],
  context={"plain": EX + "p",
           "typed": {"@id": EX + "p",
                     "@type": "http://www.w3.org/2001/XMLSchema#date"}})
c("compact", "c119", "compact", "@set container term preferred for arrays",
  input=[{"@id": "urn:a", EX + "p": [{"@value": 1}, {"@value": 2}]}],
  context={"single": EX + "p",
           "multi": {"@id": EX + "p", "@container": "@set"}})
c("compact", "c120", "compact", "reverse property chooses @reverse term",
  input=[{"@id": "urn:a",
          "@reverse": {EX + "parentOf": [{"@id": "urn:b"}]}}],
  context={"childOf": {"@reverse": EX + "parentOf"}})
c("compact", "c121", "compact", "list term only used for @list values",
  input=[{"@id": "urn:a",
          EX + "p": [{"@list": [{"@value": 1}]},
                     {"@value": 2}]}],
  context={"lst": {"@id": EX + "p", "@container": "@list"},
           "plain": EX + "p"})
c("compact", "c122", "compact", "compactToRelative false keeps absolute ids",
  options={"base": "http://base.example/dir/", "compactToRelative": False},
  input=[{"@id": "http://base.example/dir/thing",
          EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})
c("compact", "c123", "compact", "compactToRelative default makes relative",
  options={"base": "http://base.example/dir/"},
  input=[{"@id": "http://base.example/dir/thing",
          EX + "p": [{"@value": 1}]}],
  context={"@vocab": EX})

# ----------------- frame sub-option matrix ------------------------------
c("frame", "fm069", "frame", "@default fills missing property",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "name": "A"}, {"@id": "urn:b"}]},
  frame={"@context": {"@vocab": EX},
         "name": {"@default": "unnamed"}})
c("frame", "fm070", "frame", "@omitDefault true in sub-frame",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "name": "A"},
      {"@id": "urn:b", "other": "x"}]},
  frame={"@context": {"@vocab": EX},
         "name": {"@omitDefault": True}})
c("frame", "fm071", "frame", "@explicit true in sub-frame drops extras",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "child": {"@id": "urn:c"}},
      {"@id": "urn:c", "keep": "k", "drop": "d"}]},
  frame={"@context": {"@vocab": EX},
         "child": {"@explicit": True, "keep": {}}})
c("frame", "fm072", "frame", "framing a @list property",
  input={"@context": {"@vocab": EX,
                      "items": {"@id": EX + "items",
                                "@container": "@list"}},
         "@id": "urn:a", "items": ["x", "y"]},
  frame={"@context": {"@vocab": EX,
                      "items": {"@id": EX + "items",
                                "@container": "@list"}},
         "items": {}})
c("frame", "fm073", "frame", "value pattern matching on @value",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "p": "match"},
      {"@id": "urn:b", "p": "other"}]},
  frame={"@context": {"@vocab": EX}, "p": {"@value": "match"}})
c("frame", "fm074", "frame", "value pattern with wildcard @language",
  input={"@context": {"@vocab": EX}, "@graph": [
      {"@id": "urn:a", "p": {"@value": "x", "@language": "en"}},
      {"@id": "urn:b", "p": {"@value": "y"}}]},
  frame={"@context": {"@vocab": EX},
         "p": {"@value": {}, "@language": {}}})

# ----------------- N-Quads parser differential (via fromRDF) -----------
c("fromRdf", "fr063", "fromRDF", "escaped quotes/backslash/newline literal",
  input='<urn:a> <urn:p> "say \\"hi\\" \\\\ back\\n" .\n')
c("fromRdf", "fr064", "fromRDF", "uchar escapes in literal and IRI",
  input='<urn:a> <urn:p> "\\u00e9\\U0001F600" .\n'
        '<urn:a> <urn:q> <urn:x\\u00e9> .\n')
c("fromRdf", "fr065", "fromRDF", "tabs and CRLF whitespace between terms",
  input='<urn:a>\t<urn:p>\t"v"\t.\r\n')
c("fromRdf", "fr068", "fromRDF", "literal with datatype and escapes",
  input='<urn:a> <urn:p> "1\\t2"^^<urn:dt#x> .\n')
c("fromRdf", "fr069", "fromRDF", "langtag with region and variant",
  input='<urn:a> <urn:p> "v"@en-Latn-US .\n')
c("fromRdf", "fr070", "fromRDF", "xsd:string datatype normalizes away",
  input='<urn:a> <urn:p> '
        '"v"^^<http://www.w3.org/2001/XMLSchema#string> .\n')

# ----------------- @json JCS number canonicalization via toRDF ---------
c("toRdf", "tr071", "toRDF", "JCS double/int forms in @json literal",
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a",
         "d": {"big": 1e21, "tiny": 1e-7, "neg": -0.0, "int": 42,
               "f": 0.1, "e": 123456789012345680000.0}})
c("toRdf", "tr072", "toRDF", "JCS object key ordering incl. unicode",
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a",
         "d": {"é": 1, "e": 2, "a": [True, False, None],
               "€": {"n": [1.5]}}})
c("toRdf", "tr073", "toRDF", "JCS string escapes control chars",
  input={"@context": {"d": {"@id": EX + "d", "@type": "@json"}},
         "@id": "urn:a",
         "d": {"s": "tab\there  and \"quote\""}})
