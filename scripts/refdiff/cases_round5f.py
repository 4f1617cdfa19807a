"""Round-5 batch f: regressions from the FOREIGN-CONTEXT compact leg
(compactX: compact each fuzz doc onto an independently generated
context, so terms/containers don't align with the data shape).

Kernel fixes covered:
  - term-selection prefs are JS object keys: an ARRAY
    typeOrLanguageValue (garbage value object with "@type": [...])
    coerces to its comma-join instead of crashing
    (compact.js:1103-1110)
  - a @list value wrapped with the @list alias FALLS THROUGH to the
    map-packing section (compact.js:426-457 has no continue): under
    an @index-container term it packs into the index map at @none
  - id/type-map container candidates apply to ALL non-graph non-value
    objects — including @list wrappers — BEFORE the @list push
    (compact.js:716-740)
  - graph-value container candidates: '@index','@index@set' sit
    directly after the @graph@index pair, before @graph@id
    (compact.js:717-740)
  - "@type": "@none" terms register under the '@none' key of both
    inverse-context value maps, competing at shortest-least priority
    (context.js:1312-1315)
  - default-direction inverse key is direction-only "_dir"
    (context.js:1343-1346)
  - prefs direction-only fallback "_dir" is pushed BEFORE '@none'
    (compact.js:1117-1123)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import fuzz  # noqa: E402

CASES = []


def c(suite, cid, op, name, **kw):
    CASES.append({"suite": suite, "id": cid, "op": op, "name": name, **kw})


_BASE = "https://fuzz.example/doc.jsonld"

# seed 402 (array @type pref → JS comma-join object key) stays
# fuzz-only: the reference side crashes with a raw TypeError
# ("iri.startsWith is not a function"), which has no manifest error
# code — mirrored as a typed error and compared by error PRESENCE in
# the campaign
for _seed, _cid, _name in [
        (405, "c203", "@list value under @index-container term packs "
                      "into the index map at @none"),
        (756, "c204", "array @type pref under @type-map term")]:
    _doc = fuzz.gen_doc(_seed)
    _xctx = fuzz.gen_doc(2 * _seed + 1)["@context"]
    c("compact", _cid, "compact", f"fuzz compactX seed {_seed}: {_name}",
      input=_doc, context=_xctx,
      options={"base": _BASE, **fuzz.gen_op_options(_seed, "compactX")})

# hand-built: inverse-context priority of "@type": "@none" terms vs
# plain terms ('@none' key, shortest-least), direction-only default
# key, and the "_dir" pref fallback ordering before '@none'
c("compact", "c205", "compact",
  '"@type": "@none" term registers at @none and outranks a LONGER '
  "plain term for language-less lookups",
  input={"@context": {"@version": 1.1,
                      "aa": {"@id": "http://ex.org/p", "@type": "@none"},
                      "zzz": "http://ex.org/p"},
         "http://ex.org/p": [{"@value": 1}]},
  context={"@version": 1.1,
           "aa": {"@id": "http://ex.org/p", "@type": "@none"},
           "zzz": "http://ex.org/p"},
  options={"base": _BASE})

c("compact", "c206", "compact",
  "default @direction registers terms under direction-only '_dir'; "
  "a direction-tagged value prefers them via the '_dir' pref fallback "
  "over a plain term's @none entry",
  input={"@context": {"@version": 1.1, "@direction": "ltr",
                      "aa": "http://ex.org/p"},
         "http://ex.org/p": [
             {"@value": "x", "@language": "en", "@direction": "ltr"}]},
  context={"@version": 1.1, "@direction": "ltr",
           "aa": "http://ex.org/p",
           "bb": {"@id": "http://ex.org/p", "@language": None}},
  options={"base": _BASE})

c("compact", "c207", "compact",
  "indexed GRAPH value: plain @index-container term beats @graph@id "
  "(container candidates '@index' sit before '@graph@id')",
  input={"@context": {"@version": 1.1,
                      "g": {"@id": "http://ex.org/g",
                            "@container": "@graph"}},
         "http://ex.org/g": [{"@graph": [{"http://ex.org/a": "v"}],
                              "@index": "i0"}]},
  context={"@version": 1.1,
           "ix": {"@id": "http://ex.org/g", "@container": "@index"},
           "gg": {"@id": "http://ex.org/g",
                  "@container": ["@graph", "@id"]}},
  options={"base": _BASE})
