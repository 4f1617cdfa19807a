"""Round-3 batch k: @container validation matrix (which combinations
are legal, per mode), invalid term-definition combos (@type+@language,
@reverse+@container, bad @container types). Differential."""

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _tc(id_, container, mode=None, ok_value="v"):
    c = {"suite": "expand", "id": id_, "op": "expand",
         "name": f"@container {container!r}"
                 + (f" in {mode}" if mode else ""),
         "input": {"@context": {"@vocab": EX,
                                "p": {"@id": EX + "p",
                                      "@container": container}},
                   "p": ok_value}}
    if mode:
        c["options"] = {"processingMode": mode}
    return c


CASES = [
    # ---- valid combinations --------------------------------------------
    _tc("t0228", ["@list"]),
    _tc("t0229", ["@set"]),
    _tc("t0230", ["@index", "@set"], ok_value={"i": "v"}),
    _tc("t0231", ["@language", "@set"], ok_value={"en": "v"}),
    _tc("t0232", ["@graph", "@id", "@set"],
        ok_value={EX + "g": {"@id": EX + "n"}}),
    _tc("t0233", ["@graph", "@index", "@set"],
        ok_value={"i": {"@id": EX + "n"}}),
    _tc("t0234", ["@type", "@set"], ok_value={"T": {"@id": EX + "n"}}),
    # ---- invalid combinations ------------------------------------------
    _tc("t0235", ["@list", "@set"]),
    _tc("t0236", ["@id", "@index"]),
    _tc("t0237", ["@language", "@index"]),
    _tc("t0238", ["@list", "@index"]),
    _tc("t0239", ["@graph", "@language"]),
    _tc("t0240", ["@id", "@type"]),
    _tc("t0241", "@unknown"),
    # t0242 (@container: 7, a non-string/array) is a DOCUMENTED
    # DIVERGENCE, not a fixture: the reference crashes with a raw
    # TypeError ('container.includes is not a function',
    # context.js:808-866 normalizes only string/array) while this port
    # raises the proper 'invalid container mapping'. See NOTES_r3.md.
    _tc("t0243", ["@set"], mode="json-ld-1.0"),
    _tc("t0244", ["@index", "@set"], mode="json-ld-1.0"),
    _tc("t0245", "@graph", mode="json-ld-1.0"),
    _tc("t0246", "@type", mode="json-ld-1.0"),
    _tc("t0247", "@id", mode="json-ld-1.0"),
    # ---- invalid term-definition member combos -------------------------
    {"suite": "expand", "id": "t0248", "op": "expand",
     "name": "term with both @type @id and @language fails? (allowed check)",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p",
                                  "@type": "@id",
                                  "@language": "en"}},
               "p": "x"}},
    {"suite": "expand", "id": "t0249", "op": "expand",
     "name": "term with @type xsd and @language combination",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p",
                                  "@type": XSD + "date",
                                  "@language": "en"}},
               "p": "2024-01-01"}},
    {"suite": "expand", "id": "t0250", "op": "expand",
     "name": "non-string @type in term definition fails",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@type": 5}},
               "p": "x"}},
    {"suite": "expand", "id": "t0251", "op": "expand",
     "name": "@type @json in term definition (1.1)",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@type": "@json"}},
               "p": {"any": ["shape", 1]}}},
    {"suite": "expand", "id": "t0252", "op": "expand",
     "name": "@type @json in 1.0 mode fails",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@type": "@json"}},
               "p": {"any": "shape"}}},
    {"suite": "expand", "id": "t0253", "op": "expand",
     "name": "@type @none in term definition requires 1.1",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@type": "@none"}},
               "p": "x"}},
    {"suite": "expand", "id": "t0254", "op": "expand",
     "name": "keyword other than allowed set as @type value fails",
     "input": {"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@type": "@list"}},
               "p": "x"}},
]
