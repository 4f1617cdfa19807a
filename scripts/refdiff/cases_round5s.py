"""Round-5 batch s: wave-12 kernel parity classes.

Covered fixes:
  - relative @base resolves through prependBase whose null-base arm
    returns the relative string VERBATIM as the new base
    (context.js:195-210, url.js:65-67, url.js:301 isRelative=isString;
    wave-12 seed 1892);
  - a graph item compacted by the graph else-arm makes nestResult[prop]
    an ARRAY; later map-packed siblings go through _addValue(array,
    key, ...) which sets an invisible string property — they silently
    drop from output (compact.js:522-560; wave-12 seed 7390);
  - language-map simplification runs on the COMPACTED item via
    graphTypes.isValue (literal '@value' key, compact.js:549-552): an
    ALIASED @value stays an object, and {@value, @index} simplifies to
    the bare @value dropping the preserved index (wave-12 seed 7172);
  - @import is processed AFTER @base/@vocab/@language/@direction/
    @propagate (context.js:329-390): the @vocab validation precedes
    the @import one, and an imported KEYWORD merges too late for the
    keyword handlers — it reaches createTermDefinition and throws
    keyword redefinition (wave-12 corrupt seed 5361);
  - a FALSY top-level @protected leaves '@protected' un-skipped for
    the term loop (defined.set('@protected', ctx['@protected'] ||
    false), context.js:395) — createTermDefinition's defined-map cycle
    check throws 'cyclic IRI mapping';
  - the falsy-@id skip lives only in the property-value loop: a
    {"@id": ""} item under a @reverse property becomes a verbatim ""
    subject (nodeMap.js:120-133 vs :189-191; wave-12 seed 9114).
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

c("expand", "t0498", "expand",
  "relative @base over a null base: prependBase(null, rel) returns "
  "the relative string verbatim as the new base",
  input={"@context": [{"@base": None},
                      {"@base": "sub/dir/", "@vocab": V}],
         "@id": "x", "alpha": "v"},
  options={"base": _BASE})

c("expand", "t0499", "expand",
  "relative @base chain: resolves against the current base per "
  "RFC 3986 at each layer",
  input={"@context": [{"@base": "sub/dir/"}, {"@base": "../up/"},
                      {"@vocab": V}],
         "@id": "leaf", "alpha": "v"},
  options={"base": _BASE})

c("compact", "c218", "compact",
  "a graph item under a plain @index container takes the graph "
  "else-arm (array append); later map-packed siblings land on the "
  "array as invisible JS string properties and drop from output",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "beta": {"@id": V + "beta",
                               "@container": "@index"}},
         "@id": V + "n4",
         "beta": [{"@id": "urn:g1",
                   "@graph": [{"@id": "urn:n2", "alpha": "in"}]},
                  "s1", "s2"]},
  context={"@version": 1.1, "@vocab": V,
           "beta": {"@id": V + "beta", "@container": "@index"}},
  options={"base": _BASE})

c("compact", "c219", "compact",
  "language-map simplification checks the COMPACTED item for a "
  "literal @value key: an aliased @value stays an object keyed by "
  "its language",
  input={"@context": {"@version": 1.1, "@vocab": V, "val": "@value",
                      "delta": {"@id": V + "delta",
                                "@container": "@language",
                                "@type": "@none"}},
         "@id": "urn:a",
         "delta": [{"@value": "leaf", "@language": "de"},
                   {"@value": 7}]},
  context={"@version": 1.1, "@vocab": V, "val": "@value",
           "delta": {"@id": V + "delta", "@container": "@language",
                     "@type": "@none"}},
  options={"base": _BASE})

c("compact", "c220", "compact",
  "a kept {@value,@index} object in a language map simplifies to the "
  "bare @value, dropping the preserved @index",
  input=[{"@id": "urn:a",
          V + "delta": [{"@value": 5, "@index": "i1"}]}],
  context={"@version": 1.1, "@vocab": V,
           "delta": {"@id": V + "delta", "@container": "@language"}},
  options={"base": _BASE, "skipExpansion": True})

c("expand", "t0500", "expand",
  "@vocab validation precedes @import: a safe-mode relative @vocab "
  "event fires before the invalid @import is reached",
  input={"@context": {"@version": 1.1, "@vocab": "", "@base": None,
                      "@import": 5},
         "alpha": "v"},
  options={"base": _BASE, "safe": True}, neg=True)

c("expand", "t0501", "expand",
  "an imported keyword (@vocab) merges after keyword handling and "
  "throws keyword redefinition in the term loop",
  input={"@context": {"@version": 1.1,
                      "@import": "https://ctx.example/imp"},
         "alpha": "v"},
  contexts={"https://ctx.example/imp":
            {"@vocab": V, "alpha": V + "alpha"}},
  options={"base": _BASE}, neg=True)

c("expand", "t0502", "expand",
  "importing context's own @vocab wins and the imported one never "
  "merges (hasOwnProperty guard): terms from the import still define",
  input={"@context": {"@version": 1.1, "@vocab": V + "own/",
                      "@import": "https://ctx.example/imp2"},
         "alpha": "v", "beta": "w"},
  contexts={"https://ctx.example/imp2":
            {"@vocab": V + "imported/", "beta": V + "impbeta"}},
  options={"base": _BASE})

c("expand", "t0503", "expand",
  "top-level @protected: false throws 'cyclic IRI mapping' (the "
  "defined map stores the raw falsy value and the term loop has no "
  "skip-list)",
  input={"@context": {"@vocab": V, "@protected": False,
                      "alpha": V + "alpha"}, "alpha": "v"},
  options={"base": _BASE}, neg=True)

c("flatten", "f030", "flatten",
  "a {'@id': ''} item under a @reverse property becomes a verbatim "
  "empty-string subject (the falsy-@id skip lives only in the "
  "property-value loop)",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "zeta": {"@reverse": V + "rev/zeta",
                               "@type": "@id"}},
         "@id": V + "n5", "zeta": ""},
  options={"base": None})
