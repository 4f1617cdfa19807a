"""Round-4 batch a: mined from reference tests/misc.js (4,376 LoC) —
JS-keyword terms, reserved @RESERVED values, free-floating value
emission shapes, relativeIri/prependedIri matrices, toRDF/fromRDF
@direction option matrix, skipExpansion paths. Differential: the
reference's OWN output is the fixture truth; safe-mode variants check
error-code parity."""

EX = "http://example.com/"
CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


# ---------------- js keywords (misc.js:317-456) -----------------------
c("expand", "t0262", "expand", "js valueOf/toString keyword terms (top ctx)",
  input={"@context": {"valueOf": "http://example.org/valueOf",
                      "toString": "http://example.org/toString"},
         "valueOf": "first", "toString": "second"})
c("expand", "t0263", "expand", "js keyword terms in property-scoped ctx",
  input={"@context": {"@version": 1.1,
                      "ex:thing": {"@context": {
                          "valueOf": "http://example.org/valueOf",
                          "toString": "http://example.org/toString"}}},
         "ex:thing": {"valueOf": "first", "toString": "second"}})
c("expand", "t0265", "expand", "js keyword term as prefix",
  input={"@context": {"valueOf": "http://example.org/vo#"},
         "valueOf:x": "v", "@id": "urn:id"})
c("compact", "c105", "compact", "compact onto js keyword terms",
  input=[{"http://example.org/valueOf": [{"@value": "first"}],
          "http://example.org/toString": [{"@value": "second"}]}],
  context={"valueOf": "http://example.org/valueOf",
           "toString": "http://example.org/toString"})
c("frame", "fm064", "frame", "frame with js keyword property names",
  input={"@context": {"@vocab": "http://example.org/"},
         "toString": {"valueOf": "thing"}},
  frame={"@context": {"@vocab": "http://example.org/"}, "toString": {}})

# ---------------- reserved @RESERVED (misc.js:1088-1489) --------------
c("expand", "t0266", "expand", "reserved context @id value in term def map",
  input={"@context": {"resId": {"@id": "@RESERVED"}},
         "@id": "ex:id", "resId": "resIdValue", "ex:p": "v"})
c("expand", "t0267", "expand", "reserved context @id value as plain string",
  input={"@context": {"resId": "@RESERVED"},
         "@id": "ex:id", "resId": "resIdValue", "ex:p": "v"})
c("expand", "t0268", "expand", "reserved content @id value",
  input={"@id": "@RESERVED", "ex:p": "v"})
c("expand", "t0269", "expand", "reserved id value via @type:@id term",
  input={"@context": {"p": {"@id": "ex:idp", "@type": "@id"}},
         "p": "@RESERVED", "ex:p": "v"})
c("expand", "t0270", "expand", "reserved id in nested node reference",
  input={"ex:p": {"@id": "@RESERVED", "ex:q": "v2"}, "@id": "ex:id"})
c("expand", "t0271", "expand", "reserved term name in context is dropped",
  input={"@context": {"@RESERVED": "ex:reserved"},
         "@RESERVED": "v", "ex:p": "w"})
c("expand", "t0272", "expand", "reserved content term usage",
  input={"@RESERVED": "v", "ex:p": "w"})
c("expand", "t0273", "expand", "reserved @id value safe mode raises",
  options={"safe": True},
  input={"@id": "@RESERVED", "ex:p": "v"}, neg=True)
c("expand", "t0274", "expand", "reserved context @id value safe mode",
  options={"safe": True},
  input={"@context": {"resId": {"@id": "@RESERVED"}},
         "@id": "ex:id", "resId": "resIdValue", "ex:p": "v"}, neg=True)

# ------------- values: free-floating shapes (misc.js:1489-2450) -------
c("expand", "t0275", "expand", "@set with ok node keeps node",
  input={"@set": [{"@id": "http://example.com/node",
                   "urn:property": "nodes with properties are not removed"}]})
c("expand", "t0276", "expand", "@set free-floating scalar + only-@id drop",
  input={"@set": ["free-floating strings in set objects are removed",
                  {"@id": "http://example.com/free-floating-node"},
                  {"@id": "http://example.com/node",
                   "urn:property": "nodes with properties are not removed"}]})
c("expand", "t0277", "expand", "only @list at top level drops",
  input={"@list": [{"@id": "http://example.com/node",
                    "urn:property": "nodes are removed with the @list"}]})
c("expand", "t0278", "expand", "@list free-floating scalar drops all",
  input={"@list": ["free-floating strings in list objects are removed",
                   {"@id": "http://example.com/free-floating-node"},
                   {"@id": "http://example.com/node",
                    "urn:property": "nodes are removed with the @list"}]})
c("expand", "t0279", "expand", "@graph with free-floating scalar/value/list",
  input={"@graph": ["free-floating string", {}, {"@value": "v"},
                    {"@list": [{"urn:p": "lv"}]},
                    {"@id": "http://example.com/node", "urn:p": "np"}]})
c("expand", "t0280", "expand", "@graph with empty object member",
  input={"@graph": [{}]})
c("expand", "t0281", "expand", "@id plus @graph with empty array",
  input={"@id": "http://example.com/id", "@graph": []})
c("expand", "t0282", "expand", "@graph member with only @id",
  input={"@graph": [{"@id": "http://example.com/only-id"}]})
c("expand", "t0283", "expand", "named graph node with only inner @id",
  input={"@id": "ex:outer", "@graph": [{"@id": "http://example.com/x"}]})
c("expand", "t0284", "expand", "null @value drops entry",
  input={"@id": "urn:id", "ex:p": {"@value": None}})
c("expand", "t0285", "expand", "@language alone in value object",
  input={"@id": "urn:id", "ex:p": {"@language": "en"}})
c("expand", "t0286", "expand", "invalid @language value shape",
  input={"@id": "urn:id", "ex:p": {"@value": "v", "@language": "en_bad_"}})
c("expand", "t0287", "expand", "invalid default @language in ctx",
  input={"@context": {"@language": "en_bad_"},
         "@id": "urn:id", "ex:p": "v"})
c("expand", "t0288", "expand", "invalid @language map key",
  input={"@context": {"p": {"@id": "ex:p", "@container": "@language"}},
         "@id": "urn:id", "p": {"en_bad_": "v", "en": "w"}})
c("expand", "t0289", "expand", "empty object in safe mode",
  options={"safe": True}, input={}, neg=True)
c("expand", "t0290", "expand", "free-floating scalar safe mode",
  options={"safe": True},
  input={"@set": ["free-floating string"]}, neg=True)
c("expand", "t0291", "expand", "null @value safe mode",
  options={"safe": True},
  input={"@id": "urn:id", "ex:p": {"@value": None}}, neg=True)

# ------------- properties: unmapped terms (misc.js:2453-2716) ---------
c("expand", "t0292", "expand", "unmapped term dropped with no context",
  input={"unmappedTerm": "v", "urn:p": "w", "@id": "urn:id"})
c("expand", "t0293", "expand", "only top term unmapped",
  input={"@context": {"definedTerm": "https://example.com#definedTerm"},
         "unmapped": {"definedTerm": "v"}, "@id": "urn:id",
         "definedTerm": "w"})
c("expand", "t0294", "expand", "sub-level unmapped term",
  input={"@context": {"definedTerm": "https://example.com#definedTerm"},
         "@id": "urn:id",
         "definedTerm": {"@id": "urn:sub", "unmapped": "v"}})
c("expand", "t0295", "expand", "nested unmapped term drops whole subtree",
  input={"unmapped1": {"unmapped2": "v"}, "urn:p": "w"})
c("expand", "t0296", "expand", "unmapped term safe mode raises",
  options={"safe": True},
  input={"unmappedTerm": "v", "urn:p": "w", "@id": "urn:id"}, neg=True)

# ------------- relativeIri matrix (misc.js:2717-3340) -----------------
_B = {"base": ""}
c("expand", "t0297", "expand", "relative @id alone drops (no base)",
  options=_B, input={"@id": "relativeiri"})
c("expand", "t0298", "expand", "relative @id with property kept raw",
  options=_B, input={"@id": "relativeiri", "urn:test": "value"})
c("expand", "t0299", "expand", "relative @id with defined term",
  options=_B,
  input={"@context": {"definedTerm": "https://example.com#definedTerm"},
         "@id": "relativeiri", "definedTerm": "is defined"})
c("expand", "t0300", "expand", "scheme-like relative @id 34:relativeiri",
  options=_B, input={"@id": "34:relativeiri", "urn:test": "value"})
c("expand", "t0301", "expand", "nested relative @id reference",
  options=_B,
  input={"@context": {"definedTerm": "https://example.com#definedTerm"},
         "@id": "urn:absoluteIri", "definedTerm": {"@id": "relativeiri"}})
c("expand", "t0302", "expand", "aliased id with relative value",
  options=_B,
  input={"@context": {"id": "@id",
                      "definedTerm": "https://example.com#definedTerm"},
         "id": "relativeiri", "definedTerm": "is defined"})
c("expand", "t0303", "expand", "relative @type value",
  options=_B,
  input={"@id": "urn:id", "@type": "relativeiri", "urn:p": "v"})
c("expand", "t0304", "expand", "relative @type via term with relative @id",
  options=_B,
  input={"@context": {"t": {"@id": "relativeiri"}},
         "@id": "urn:id", "@type": "t", "urn:p": "v"})
c("expand", "t0305", "expand", "relative property IRI dropped",
  options=_B,
  input={"@context": {"p": {"@id": "relativeiri"}},
         "@id": "urn:id", "p": "v", "urn:q": "w"})
c("expand", "t0306", "expand", "relative graph name",
  options=_B,
  input={"@id": "relativegraph", "@graph": [{"@id": "urn:a",
                                             "urn:p": "v"}]})
c("expand", "t0307", "expand", "relative @id safe mode raises",
  options={"base": "", "safe": True},
  input={"@id": "relativeiri", "urn:test": "value"}, neg=True)

# ------------- prependedIri matrix (misc.js:3342-3690) ----------------
c("expand", "t0308", "expand", "@vocab prepend on property",
  input={"@context": {"@vocab": EX}, "term": "termValue"})
c("expand", "t0309", "expand", "@vocab prepend on @type",
  input={"@context": {"@vocab": EX}, "@type": "relativeIri"})
c("expand", "t0310", "expand", "@vocab prepend on aliased @type",
  input={"@context": {"@vocab": EX, "type": "@type"},
         "type": "relativeIri"})
c("expand", "t0311", "expand", "scoped relative @vocab concatenates",
  input={"@context": {"@vocab": "urn:abs/"}, "@type": "ta",
         "e:a": {"@context": {"@vocab": "rel/"}, "@type": "tb"}})
c("expand", "t0312", "expand", "@base prepend on @id then only-@id drop",
  options=_B,
  input={"@context": {"@base": EX}, "@id": "relativeIri"})
c("expand", "t0313", "expand", "@base prepend via aliased @id",
  options=_B,
  input={"@context": {"@base": EX, "id": "@id"}, "id": "relativeIri"})
c("expand", "t0314", "expand", "@base prepend on @type",
  options=_B,
  input={"@context": {"@base": EX}, "@type": "relativeIri"})
c("expand", "t0315", "expand", "@base prepend on aliased @type",
  options=_B,
  input={"@context": {"@base": EX, "type": "@type"},
         "type": "relativeIri"})

# ------------- toRDF option matrix (misc.js:3861-4270) ----------------
_dir_doc = lambda lang, dr: {  # noqa: E731
    "@id": "urn:id",
    "ex:p": {k: v for k, v in
             (("@value", "v"),
              ("@language", lang) if lang else (None, None),
              ("@direction", dr) if dr else (None, None))
             if k}}
c("toRdf", "tr056", "toRDF", "no lang no dir rdfDirection absent",
  input=_dir_doc(None, None))
c("toRdf", "tr057", "toRDF", "no lang no dir rdfDirection i18n",
  options={"rdfDirection": "i18n-datatype"}, input=_dir_doc(None, None))
c("toRdf", "tr058", "toRDF", "dir only no rdfDirection drops direction",
  input=_dir_doc(None, "ltr"))
c("toRdf", "tr059", "toRDF", "dir only rdfDirection i18n",
  options={"rdfDirection": "i18n-datatype"}, input=_dir_doc(None, "ltr"))
c("toRdf", "tr060", "toRDF", "lang only rdfDirection i18n stays langString",
  options={"rdfDirection": "i18n-datatype"}, input=_dir_doc("en-us", None))
c("toRdf", "tr061", "toRDF", "lang+dir rdfDirection i18n",
  options={"rdfDirection": "i18n-datatype"}, input=_dir_doc("en-us", "ltr"))
c("toRdf", "tr062", "toRDF", "lang+dir no rdfDirection drops direction",
  input=_dir_doc("en-us", "ltr"))
c("toRdf", "tr064", "toRDF", "ctx default lang+dir with i18n",
  options={"rdfDirection": "i18n-datatype"},
  input={"@context": {"@language": "en-us", "@direction": "rtl"},
         "@id": "urn:id", "ex:p": "v"})
c("toRdf", "tr065", "toRDF", "skipExpansion with null @id makes bnode",
  options={"skipExpansion": True},
  input=[{"@id": None, "ex:p": [{"@value": "v"}]}])
c("toRdf", "tr066", "toRDF", "skipExpansion relative object dropped",
  options={"skipExpansion": True},
  input=[{"@id": "urn:id", "@type": ["urn:ex#type"],
          "urn:ex#prop": [{"@id": "value"}]}])
c("toRdf", "tr067", "toRDF", "expand non-IRI @type:@id value then toRDF",
  input={"@context": {"ex": "urn:ex#", "ex:prop": {"@type": "@id"}},
         "@id": "urn:id", "@type": "ex:type", "ex:prop": "value"})

# ------------- fromRDF i18n matrix (misc.js:3693-3860) ----------------
c("fromRdf", "fr056", "fromRDF", "plain literal rdfDirection i18n",
  options={"rdfDirection": "i18n-datatype"},
  input='<urn:id> <ex:p> "v" .\n')
c("fromRdf", "fr057", "fromRDF", "i18n datatype no lang",
  options={"rdfDirection": "i18n-datatype"},
  input='<urn:id> <ex:p> "v"^^<https://www.w3.org/ns/i18n#_ltr> .\n')
c("fromRdf", "fr058", "fromRDF", "langString rdfDirection i18n",
  options={"rdfDirection": "i18n-datatype"},
  input='<urn:id> <ex:p> "v"@en-us .\n')
c("fromRdf", "fr059", "fromRDF", "i18n datatype lang+dir",
  options={"rdfDirection": "i18n-datatype"},
  input='<urn:id> <ex:p> "v"^^<https://www.w3.org/ns/i18n#en-us_ltr> .\n')
c("fromRdf", "fr061", "fromRDF", "i18n datatype ignored without option",
  input='<urn:id> <ex:p> "v"^^<https://www.w3.org/ns/i18n#en-us_ltr> .\n')

# ------------- @id:null node-map behavior (flatten side) --------------
c("flatten", "f017", "flatten", "top-level null @id gets fresh bnode",
  input={"@id": "@RESERVED", "ex:p": "v"})
c("flatten", "f018", "flatten", "embedded null-@id object skipped",
  input={"@id": "urn:a",
         "ex:p": {"@id": "@RESERVED", "ex:q": "v"}})
c("toRdf", "tr068", "toRDF", "reserved @id end-to-end to bnode quad",
  input={"@id": "@RESERVED", "ex:p": "v"})
