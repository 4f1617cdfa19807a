"""Round-5 batch u: wave-13 kernel parity classes.

Covered fixes:
  - EVERY property value expands under the key's TERM context
    (expand.js:846-858 computes termCtx unconditionally): a full
    object value then RE-applies the property-scoped context at its
    own expand entry (expand.js:202-209) — twice, so a relative
    scoped @base chains over itself — while a scalar value gets it
    exactly once via termCtx (seeds 24836/24899);
  - removeBase roots on the raw string (protocol||'')+'//'+(authority
    ||'') with a plain prefix test (url.js:155-171): a RELATIVE base
    (root '//') leaves IRIs whole — observable under
    compactToRelative=false where expansion used the empty-base-
    resolved scoped @base but compaction gets base=null;
  - type-scoped reversion is the DEFAULT (expand.js:169-196); the
    value/subject-reference exception is only checked for elements
    with <= 2 keys and no raw '@context' key (seed 22713).
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
_SCTX = {"@version": 1.1, "@vocab": V,
         "gamma": {"@id": V + "gamma",
                   "@context": {"@base": "sub/sc/",
                                "inner": V + "scoped/g"}}}

c("expand", "t0506", "expand",
  "an OBJECT value applies the property-scoped context twice (termCtx "
  "+ object-entry re-application): a relative scoped @base chains "
  "over itself",
  input={"@context": _SCTX, "@id": "urn:n1",
         "gamma": {"@id": "leaf"}},
  options={"base": _BASE})

c("expand", "t0507", "expand",
  "a SCALAR value gets the property-scoped context exactly once (via "
  "termCtx; the scalar path never re-applies)",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "gamma": {"@id": V + "gamma", "@type": "@id",
                                "@context": {"@base": "sub/sc/"}}},
         "@id": "urn:n1", "gamma": "leaf"},
  options={"base": _BASE})

c("compact", "c221", "compact",
  "compactToRelative=false + relative scoped @base: expansion "
  "empty-base-resolves the slot but compaction's removeBase gets a "
  "RELATIVE base (root '//') and leaves the IRI whole",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "alpha": {"@id": V + "alpha",
                                "@container": ["@type", "@set"],
                                "@type": "@id",
                                "@context": {"@base": "sub/sc/"}}},
         "@id": "urn:n1", "alpha": {"@none": "unicode-x"}},
  context={"@version": 1.1, "@vocab": V,
           "alpha": {"@id": V + "alpha",
                     "@container": ["@type", "@set"], "@type": "@id",
                     "@context": {"@base": "sub/sc/"}}},
  options={"base": _BASE, "compactToRelative": False})

c("expand", "t0508", "expand",
  "type-scoped reversion is the default: a 3-key node carrying "
  "@value still REVERTS, and its inline @context applies over the "
  "reverted context (vocab from the inline layer wins)",
  input={"@context": {"@version": 1.1,
                      "alpha": {"@id": V + "alpha",
                                "@container": "@list"},
                      "T3": {"@id": V + "type/T3",
                             "@context": {"scopedT3": V + "ts/T3"}}},
         "@type": "T3",
         "alpha": {"@context": [{"@vocab": V + "a/"}],
                   "gamma": {"k0": "leaf"},
                   "@id": "_:b1"}},
  options={"base": _BASE})

c("expand", "t0509", "expand",
  "a 2-key element with @value among its expanded keys does NOT "
  "revert (the exception window)",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "T1": {"@id": V + "type/T1",
                             "@context": {"val2": "@value"}}},
         "@type": "T1",
         "alpha": {"val2": "x", "@language": "en"}},
  options={"base": _BASE})


c("flatten", "f031", "flatten",
  "a @list wrapper's @type ([null] from a nulled type-map key) never "
  "reaches the node-map type scan: the property loop re-wraps lists "
  "discarding extra keys",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "delta": {"@id": V + "delta",
                                "@container": ["@type", "@set"],
                                "@type": "@none"},
                      "nulled": None,
                      "lst": {"@id": V + "lst", "@container": "@list"}},
         "@id": "urn:n1",
         "delta": {"nulled": {"lst": [9007199254740991, 1.0]}}},
  options={"base": _BASE})


c("compact", "c222", "compact",
  "full-object compaction applies the property-scoped context at "
  "entry AND again after the (no-op) revert: a relative scoped @base "
  "chains twice, so relativization climbs out with ../..",
  input={"@context": {"@version": 1.1, "@vocab": V,
                      "gamma": {"@id": V + "gamma",
                                "@type": "@id",
                                "@context": {"@base": "sub/sc/",
                                             "inner": V + "sg"}}},
         "@id": "urn:n1",
         "gamma": {"@id": "leaf", "alpha": "x"}},
  context={"@version": 1.1, "@vocab": V,
           "gamma": {"@id": V + "gamma", "@type": "@id",
                     "@context": {"@base": "sub/sc/",
                                  "inner": V + "sg"}}},
  options={"base": _BASE})
