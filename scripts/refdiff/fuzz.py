"""Seeded differential fuzzer: generate structured random JSON-LD
documents from a feature grammar, run expand/flatten/toRDF through BOTH
this kernel and the reference (refrun.js), and report divergences.

Usage:
    python scripts/refdiff/fuzz.py [N] [start-seed]

Every case is reproducible from its seed. Known documented divergences
are excluded by construction (no Object.prototype term names, no
rdfDirection=compound-literal, no N-Quads-side shapes). A divergence
prints the seed + op + both outputs; exit code 1 if any diverge.
"""

from __future__ import annotations

import json
import random
import subprocess
import sys
import pathlib

HERE = pathlib.Path(__file__).parent
REPO = HERE.parent.parent
sys.path.insert(0, str(REPO))

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.canonize import canonize as canonize_nquads  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402
from jsonld_js_ray.core.nquads import parse as parse_nquads  # noqa: E402

EX = "http://fuzz.example/"
TERMS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
LANGS = ["en", "fr", "de", "ar", "en-US", "EN", "zh-Hant-x-priv"]
TYPES = ["T1", "T2", "T3"]
CONTAINERS = [None, "@set", "@list", "@index", "@language", "@id",
              "@type", "@graph", ["@graph", "@index"],
              ["@graph", "@id"], ["@index", "@set"],
              ["@id", "@set"], ["@type", "@set"],
              ["@language", "@set"], ["@graph", "@set"],
              ["@graph", "@id", "@set"], ["@graph", "@index", "@set"]]
COERCIONS = [None, "@id", "@vocab", "@json", "@none",
             "http://www.w3.org/2001/XMLSchema#integer",
             "http://www.w3.org/2001/XMLSchema#date",
             "http://www.w3.org/2001/XMLSchema#double",
             "http://www.w3.org/2001/XMLSchema#boolean"]


def gen_context(rng: random.Random) -> dict:
    ctx: dict = {"@version": 1.1}
    if rng.random() < 0.7:
        # "" = vocab mapping resolves to the document base (1.1);
        # "#frag" = vocab-relative-to-base
        ctx["@vocab"] = EX if rng.random() < 0.9 else \
            rng.choice(["", "#v-"])
    if rng.random() < 0.3:
        ctx["@language"] = rng.choice(LANGS)
    if rng.random() < 0.15:
        ctx["@direction"] = rng.choice(["ltr", "rtl"])
    if rng.random() < 0.2:
        # null @base suppresses document-relative relativization /
        # resolution entirely
        ctx["@base"] = "http://base.example/dir/" \
            if rng.random() < 0.8 else None
    if rng.random() < 0.08:
        # @-prefixed non-keyword term: ignored with a warning event
        # (safe mode turns it into an error — both engines must agree)
        ctx["@keywordish"] = EX + "kw"
    if rng.random() < 0.12:
        # explicitly NULLED term: blocks the vocab fallback
        ctx[rng.choice(TERMS)] = None
    if rng.random() < 0.07:
        # wave-16: {"@id": null} term definition (nulls like a bare
        # null term, but via the object form)
        ctx[rng.choice(TERMS)] = {"@id": None}
    if rng.random() < 0.05:
        # wave-16: a term whose @id is keyword-LIKE (reserved-shaped
        # IRI value) — dropped with a 'reserved @id value' event
        ctx[rng.choice(TERMS)] = {"@id": "@gotcha"}
    if rng.random() < 0.1:
        # term-chain @id: a term whose @id is ANOTHER term name
        # (resolves through the term, then vocab)
        a, b = rng.sample(TERMS, 2)
        ctx[a] = EX + "chain/"
        ctx[b] = a
    for term in rng.sample(TERMS, rng.randint(2, len(TERMS))):
        if rng.random() < 0.35:
            ctx[term] = EX + term
            continue
        td: dict = {"@id": EX + term}
        container = rng.choice(CONTAINERS)
        if container:
            td["@container"] = container
        # property-based index container (1.1): the map key becomes a
        # VALUE of the named property on each entry
        if rng.random() < 0.25 and (
                container == "@index"
                or (isinstance(container, list)
                    and "@index" in container)):
            td["@index"] = rng.choice(["alpha", EX + "ip"])
        coerce = rng.choice(COERCIONS)
        # @json cannot combine with @container @language/@id/@type here
        if coerce and not (coerce == "@json" and container not in
                           (None, "@set", "@index")):
            td["@type"] = coerce
        if rng.random() < 0.15 and "@type" not in td:
            td["@language"] = rng.choice(LANGS + [None])
        if rng.random() < 0.08 and "@type" not in td:
            # wave-13: term-level @direction (with/without @language)
            td["@direction"] = rng.choice(["ltr", "rtl", None])
        if rng.random() < 0.1:
            td["@context"] = {"inner" + term: EX + "scoped/" + term}
            if rng.random() < 0.12:
                # wave-16: @version inside a scoped context (pins 1.1
                # per scope; conflicts under a 1.0 processing mode)
                td["@context"]["@version"] = 1.1
            if rng.random() < 0.35:
                # wave-13: scoped contexts carrying KEYWORD state —
                # @base/@vocab/@language/@direction layered over the
                # outer context for the term's subtree
                kw = rng.random()
                if kw < 0.3:
                    td["@context"]["@base"] = rng.choice(
                        ["http://scoped.example/b/", "sub/sc/", None])
                elif kw < 0.55:
                    td["@context"]["@vocab"] = rng.choice(
                        [EX + "scvocab/", "", None])
                elif kw < 0.8:
                    td["@context"]["@language"] = rng.choice(
                        LANGS + [None])
                else:
                    td["@context"]["@direction"] = rng.choice(
                        ["ltr", "rtl", None])
        if rng.random() < 0.1 and container in (None, "@set", "@index"):
            # wave-18: @reverse terms may carry @set/@index containers
            # (the only legal combos, context.js invalid reverse
            # property gate); @type must be @id/@vocab or absent
            td.pop("@id")
            td["@reverse"] = EX + "rev/" + term
            if td.get("@type") not in (None, "@id", "@vocab"):
                td.pop("@type", None)
        ctx[term] = td
    for t in TYPES:
        if rng.random() < 0.3:
            ctx[t] = {"@id": EX + "type/" + t}
            if rng.random() < 0.5:
                ctx[t]["@context"] = {"scoped" + t: EX + "ts/" + t}
    # round-5 grammar widening: @nest routing, keyword aliases,
    # prefix terms, @propagate on a scoped context
    if rng.random() < 0.2:
        ctx["meta"] = "@nest"
        ctx["nested" + rng.choice(TERMS)] = {
            "@id": EX + "nested", "@nest": "meta"}
        if rng.random() < 0.25:
            # wave-13: a SECOND nest alias whose routed term points at
            # the FIRST alias's name (nest-through-nest shapes)
            ctx["meta2"] = "@nest"
            ctx["nested2" + rng.choice(TERMS)] = {
                "@id": EX + "nested2", "@nest": "meta2"}
    if rng.random() < 0.15:
        ctx["id"] = "@id"
    if rng.random() < 0.1:
        ctx["type"] = "@type"
    if rng.random() < 0.15:
        ctx["px"] = {"@id": EX + "px/", "@prefix": True}
    if rng.random() < 0.1 and isinstance(ctx.get(TYPES[0]), dict) \
            and "@context" in ctx.get(TYPES[0], {}):
        ctx[TYPES[0]]["@context"]["@propagate"] = True
    # wave-12 grammar: BROADER keyword aliases (beyond id/type) that
    # gen_node uses as data keys — when the alias is absent the same
    # key is an ordinary vocab term, so both readings get fuzzed
    for alias, kw in rng.sample(list(_KW_ALIASES.items()),
                                rng.randint(0, 2)):
        if rng.random() < 0.45:
            ctx[alias] = kw
    if rng.random() < 0.08:
        # CURIE-shaped TERM name: an explicit term definition takes
        # precedence over prefix expansion of the same string
        # (context.js createTermDefinition; expand-iri term-first)
        ctx["px:special"] = EX + "curie-term"
    if rng.random() < 0.06 and isinstance(ctx.get("@vocab"), str):
        # vocab-relative @vocab (1.1): a relative @vocab resolves
        # against the CURRENT vocab mapping / document base
        ctx["@vocab"] = rng.choice(["sub/", "alpha", "px:vv/"])
    return ctx


# wave-12: alias names gen_node uses as DATA keys; values here are the
# keywords the context maps them to (when the per-seed roll defines
# them). "val"+"lang" together form an aliased value object.
_KW_ALIASES = {"val": "@value", "lst": "@list", "st": "@set",
               "gr": "@graph", "lang": "@language", "rev": "@reverse",
               "idx": "@index", "nst": "@nest", "incl": "@included",
               "dir": "@direction"}


# round-5 seventh-wave grammar: RELATIVE IRI references (resolve
# against options.base / context @base per RFC 3986 through expand),
# including rootless paths, dot segments, fragments, queries,
# network-path references and the empty string (= the base itself)
REL_IRIS = ["rel/path", "../up", "./same", "#frag", "?q=1", "",
            "//net.example/x", "b:weird", "rel/../dot#f"]


def gen_value(rng: random.Random, depth: int):
    r = rng.random()
    if r < 0.25:
        return rng.choice(["s1", "s2", "ünïcode", ""])
    if r < 0.35:
        # ints stay within JS's exact range (<= 2^53 - 1): beyond it
        # JSON round-trip precision is host-language-defined, not a
        # kernel parity question (JS doubles vs Python bigints)
        return rng.choice([0, 1, -5, 3.25, 1e21, True, False,
                           1.0, -0.0, 2 ** 53 - 1, 5.5e-7])
    if r < 0.45:
        vo = {"@value": rng.choice(["v", 7, True])}
        if rng.random() < 0.5 and isinstance(vo["@value"], str):
            vo["@language"] = rng.choice(LANGS)
            if rng.random() < 0.3:
                vo["@direction"] = rng.choice(["ltr", "rtl"])
        elif rng.random() < 0.3:
            vo["@type"] = EX + "DT"
        elif rng.random() < 0.2 and isinstance(vo["@value"], str):
            vo["@direction"] = rng.choice(["ltr", "rtl"])
        return vo
    if r < 0.55:
        return {"@id": rng.choice(["urn:x", "urn:y", EX + "node",
                                   "_:b" + str(rng.randint(0, 2))])}
    if r < 0.58:
        return {"@id": rng.choice(REL_IRIS)}
    if r < 0.62:
        # explicit list/set objects in data (not container-made)
        kw = "@list" if rng.random() < 0.7 else "@set"
        inner = [gen_value(rng, 0) for _ in range(rng.randint(0, 2))]
        if rng.random() < 0.15:
            inner.append(None)  # null members drop from lists/sets
        out = {kw: inner if rng.random() < 0.8 else
               (inner[0] if inner else None)}
        if kw == "@list" and rng.random() < 0.25 and depth > 0:
            out["@list"] = [{"@list": [gen_value(rng, 0)]}]  # nested list
        return out
    if r < 0.65:
        # explicit @json literal (raw JSON payload survives verbatim;
        # toRDF serializes it JCS-canonically — wave-14 adds ES-number
        # and unicode-key corners to stress the canonical form)
        return {"@value": rng.choice(
            [{"k": [1, "s", None]}, [True, {"x": 0.5}], None, 42,
             {"n": [0.1, 1e21, -0.0, 1e-7, 2 ** 53 - 1, -1e300]},
             {"üñ": {"": [1e100, 5.5e-10, 333.333]},
              "b\"q\\": "\t\n"},
             [[], {}, [[]], 1.0, -7e-22]]),
            "@type": "@json"}
    if depth <= 0:
        return "leaf"
    return gen_node(rng, depth - 1)


def gen_node(rng: random.Random, depth: int) -> dict:
    node: dict = {}
    if rng.random() < 0.7:
        node["@id"] = rng.choice(
            ["urn:n" + str(rng.randint(0, 5)),
             EX + "n" + str(rng.randint(0, 5)),
             "_:b" + str(rng.randint(0, 3))]) \
            if rng.random() < 0.9 else rng.choice(REL_IRIS)
    if rng.random() < 0.4:
        node["@type"] = rng.sample(TYPES, rng.randint(1, 2)) \
            if rng.random() < 0.3 else rng.choice(TYPES)
        if rng.random() < 0.1:
            node["@type"] = rng.choice(REL_IRIS[:6])  # vocab-relative
    for term in rng.sample(TERMS, rng.randint(1, 3)):
        r = rng.random()
        if r < 0.15 and depth > 0:
            # map keys: plain strings (index/lang/id/type map keys per
            # the term's container) plus the explicit @none bucket
            keys = ["k0", "k1", "k2", "@none"]
            node[term] = {rng.choice(keys): gen_value(rng, depth - 1)
                          for _ in range(rng.randint(1, 2))}
        elif r < 0.3:
            node[term] = [gen_value(rng, depth - 1)
                          for _ in range(rng.randint(1, 3))]
        else:
            node[term] = gen_value(rng, depth - 1)
    if rng.random() < 0.15 and depth > 0:
        node["@graph"] = [gen_node(rng, depth - 1)]
    if rng.random() < 0.1 and depth > 0:
        # wave-18: richer reverse maps — multiple properties, node
        # ARRAYS, term-named reverse keys
        r3 = rng.random()
        if r3 < 0.5:
            node["@reverse"] = {EX + "rp": {"@id": "urn:rev"}}
        elif r3 < 0.75:
            node["@reverse"] = {
                EX + "rp": [{"@id": "urn:rev"},
                            {"@id": "urn:rev2",
                             rng.choice(TERMS): gen_value(rng, 0)}],
                rng.choice(TERMS): {"@id": "urn:rev3"}}
        else:
            node["@reverse"] = {rng.choice(TERMS): {"@id": "urn:rev4"}}
    if rng.random() < 0.1:
        node["@index"] = "idx" + str(rng.randint(0, 2))
    # round-5 grammar widening: @included blocks, nest-alias routing,
    # prefix-term CURIEs, keyword-alias usage
    if rng.random() < 0.08 and depth > 0:
        node["@included"] = [gen_node(rng, depth - 1)]
    if rng.random() < 0.08 and depth > 0:
        node["meta"] = {"nested" + rng.choice(TERMS):
                        gen_value(rng, depth - 1)}
    if rng.random() < 0.08:
        node["px:suffix" + str(rng.randint(0, 2))] = \
            gen_value(rng, 0)
    if rng.random() < 0.06:
        node["id"] = "urn:via-alias" + str(rng.randint(0, 3))
    # wave-12: alias-shaped DATA keys (aliased keyword when the
    # context roll defined them, ordinary vocab term otherwise)
    if rng.random() < 0.12:
        ar = rng.random()
        if ar < 0.3:
            # aliased value object (or a 2-property node)
            node2 = {"val": rng.choice(["av", 7, True])}
            if rng.random() < 0.6:
                node2["lang"] = rng.choice(LANGS)
            elif rng.random() < 0.3:
                node2["dir"] = rng.choice(["ltr", "rtl"])
            node[rng.choice(TERMS)] = node2
        elif ar < 0.45 and depth > 0:
            node["gr"] = [gen_node(rng, depth - 1)]
        elif ar < 0.6:
            node["rev"] = {EX + "rp2": {"@id": "urn:rev2"}}
        elif ar < 0.7:
            node["idx"] = "ai" + str(rng.randint(0, 2))
        elif ar < 0.8:
            node[rng.choice(TERMS)] = {
                rng.choice(["lst", "st"]):
                    [gen_value(rng, 0) for _ in range(rng.randint(0, 2))]}
        elif ar < 0.9 and depth > 0:
            node["incl"] = [gen_node(rng, depth - 1)]
        else:
            node["nst"] = {"alpha": gen_value(rng, 0)}
    if rng.random() < 0.05:
        node["px:special"] = gen_value(rng, 0)
    if rng.random() < 0.05:
        node[rng.choice(TERMS)] = []  # empty-array property value
    # eighth-wave grammar: INLINE node-level contexts — an embedded
    # @context layered over the active context at this node (expand
    # processes it before any key; propagates into the subtree), an
    # ARRAY of contexts applied in sequence, or null (full reset to
    # the initial context, dropping @vocab/@base/terms)
    if rng.random() < 0.1:
        r2 = rng.random()
        if r2 < 0.2:
            node["@context"] = None
        elif r2 < 0.3:
            # wave-12: RELATIVE @base in an inline context resolves
            # against the CURRENT base (RFC 3986 merge)
            node["@context"] = {"@base": rng.choice(
                ["sub/dir/", "../up/", "//net.example/nb/"])}
        elif r2 < 0.45:
            node["@context"] = [None, {"@vocab": EX + "inline/"}]
        elif r2 < 0.7:
            t = rng.choice(TERMS)
            node["@context"] = {t: {"@id": EX + "redef/" + t,
                                    "@container": "@set"}
                                if rng.random() < 0.5
                                else EX + "redef/" + t}
        else:
            node["@context"] = [
                {"@vocab": EX + "a/"},
                {rng.choice(TERMS): EX + "b/t",
                 "@language": rng.choice(LANGS + [None])}]
    return node


_CORRUPTIONS = [
    lambda rng: ("@id", rng.choice([5, True, ["urn:a"], {"x": 1}])),
    lambda rng: ("@type", rng.choice([7, {"a": 1}, [3], [None]])),
    lambda rng: ("@index", rng.choice([7, ["i"], {"k": "v"}])),
    lambda rng: ("@reverse", rng.choice(["str", 5, ["x"]])),
    lambda rng: ("@list", rng.choice(["notalist-ok-actually", 5])),
    lambda rng: ("@value", {"@value": "v", "@language": "en",
                            "@type": "http://ex/DT"}),
    lambda rng: ("@graph", rng.choice([5, "str"])),
    lambda rng: ("@context", rng.choice([5, True])),
    lambda rng: ("@language", rng.choice([5, ["en"], {"l": 1}])),
    lambda rng: ("@direction", rng.choice(["diagonal", 5, ["ltr"]])),
    lambda rng: ("@included", rng.choice([5, "str",
                                          {"@value": "v"}])),
    lambda rng: ("@nest", rng.choice([5, "str"]))]


_CTX_CORRUPTIONS = [
    lambda rng: ("@version", rng.choice([1.2, "1.1", True])),
    lambda rng: ("@vocab", rng.choice([5, True, ["v"]])),
    lambda rng: ("@base", rng.choice([5, True, ["b"]])),
    lambda rng: ("@language", rng.choice([5, ["en"]])),
    lambda rng: ("@direction", rng.choice(["x", 5, ["ltr"]])),
    lambda rng: ("@propagate", rng.choice(["yes", 5])),
    lambda rng: ("@import", rng.choice([5, {"a": 1}])),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@container": "@bogus"}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@container": ["@list", "@set"]}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@type": rng.choice([5, ["x"], True])}),
    lambda rng: ("alpha", {"@id": rng.choice([5, True, ["x"]])}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@reverse": "http://c.example/r"}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@prefix": "yes"}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@nest": rng.choice(["@id", 5])}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@language": rng.choice([5, ["en"]])}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@direction": "diag"}),
    lambda rng: ("alpha", rng.choice([5, True])),
    lambda rng: ("", "http://c.example/empty-term"),
    lambda rng: ("@id", "http://c.example/redefine-keyword"),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@context": rng.choice([5, True])}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@index": rng.choice([5, "notiri-rel"])}),
    lambda rng: ("alpha", {"@id": "http://c.example/a",
                           "@protected": "yes"}),
    # '@context' KEY inside a context object: the wrapper DEREFERENCES
    # to that value at the top level (array / JS-truthy) or per element
    # (unconditional, must then be a plain object) — context.js:57-61,
    # 148-157, ContextResolver.js:35-37
    lambda rng: ("@context", rng.choice(
        [5, None, 0, "", False, True, [],
         {"inner": "http://c.example/inner"},
         [{"inner2": "http://c.example/inner2"}],
         {"@context": {"deep": "http://c.example/deep"}},
         "http://nonexistent.example/ctx"]))]


_FRAME_CORRUPTIONS = [
    lambda rng: ("@embed", rng.choice(["@bogus", 5, ["@once"],
                                       {"e": 1}])),
    lambda rng: ("@explicit", rng.choice(["yes", 5])),
    lambda rng: ("@requireAll", rng.choice(["yes", 5])),
    lambda rng: ("@omitDefault", rng.choice(["yes", 5])),
    lambda rng: ("@id", rng.choice([5, [5], ["_:b0"],
                                    "relative-id", [{}, "urn:x"]])),
    lambda rng: ("@type", rng.choice([5, [5], ["_:b0"],
                                      [{}, "urn:t"], "relative-t"])),
    lambda rng: ("@default", rng.choice([{"@list": 5}, 5]))]


def corrupt_frame(seed: int, frame: dict) -> dict:
    """Inject one invalid pattern into a generated frame — frame
    validation runs per recursion and per property subframe
    (frame.js:78,574,446-476), so placement depth matters."""
    rng = random.Random(seed * 131 + 7)
    target = frame
    for _ in range(rng.randint(0, 2)):
        dict_children = [v for k, v in target.items()
                         if isinstance(v, dict) and k != "@context"]
        if not dict_children:
            break
        target = rng.choice(dict_children)
    key, bad = rng.choice(_FRAME_CORRUPTIONS)(rng)
    target[key] = bad
    return frame


def corrupt_doc(seed: int) -> dict:
    """Deliberately INVALID shapes injected into a valid fuzz doc:
    both engines must agree on error-vs-result (error presence is the
    compare for error outcomes). Exercises every validation predicate
    the happy-path grammar never trips."""
    rng = random.Random(seed * 77 + 29)
    doc = gen_doc(seed)
    # walk to a random nested node (or stay top-level)
    target = doc
    for _ in range(rng.randint(0, 2)):
        dict_children = [v for v in target.values()
                         if isinstance(v, dict) and v is not
                         target.get("@context")]
        if not dict_children:
            break
        target = rng.choice(dict_children)
    if rng.random() < 0.45:
        # context corruption: invalid term definitions / keyword abuse
        # exercise the context-validation predicates
        key, bad = rng.choice(_CTX_CORRUPTIONS)(rng)
        ctx = doc["@context"]
        if isinstance(ctx, dict):
            ctx[key] = bad
        else:
            doc["@context"] = bad
        return doc
    key, bad = rng.choice(_CORRUPTIONS)(rng)
    if key == "@context":
        doc["@context"] = bad
    else:
        target[key] = bad
    return doc


def gen_doc(seed: int) -> dict:
    rng = random.Random(seed)
    doc = gen_node(rng, rng.randint(1, 3))
    ctx = gen_context(rng)
    if rng.random() < 0.12:
        # document-level context ARRAY: layered in sequence (later
        # entries override), optionally null-first (reset then build)
        overlay = {rng.choice(TERMS): EX + "layer2/t"}
        if rng.random() < 0.5:
            overlay["@language"] = rng.choice(LANGS + [None])
        doc["@context"] = [None, ctx, overlay] \
            if rng.random() < 0.3 else [ctx, overlay]
    else:
        doc["@context"] = ctx
    return doc


def run_reference(reqs: list) -> list:
    proc = subprocess.run(
        ["node", str(HERE / "refrun.js")],
        input=json.dumps(reqs).encode(),
        env={"NODE_PATH": str(HERE / "node_modules"),
             "PATH": "/usr/bin:/bin"},
        capture_output=True, check=True)
    return [json.loads(line) for line in proc.stdout.splitlines()]


def gen_frame(seed: int, doc: dict) -> dict:
    """A deterministic frame derived from the document's own shapes.
    Round-5 widening: @id patterns (string/array/wildcard),
    @requireAll/@omitDefault, nested property subframes, value
    patterns, list frames, @reverse frames."""
    rng = random.Random(seed * 31 + 7)
    frame: dict = {"@context": doc["@context"]}
    r = rng.random()
    if r < 0.3:
        frame["@type"] = rng.choice(TYPES)
    elif r < 0.6:
        frame[rng.choice(TERMS)] = {}
    elif r < 0.8:
        frame["@type"] = {}
    # else: wildcard frame (context only)
    if rng.random() < 0.3:
        frame["@embed"] = rng.choice(["@once", "@always", "@never"])
    if rng.random() < 0.2:
        frame["@explicit"] = True
    if rng.random() < 0.2:
        # wave-17: richer @default shapes — the explicit "@null"
        # sentinel (compacts to null via @preserve/cleanupNull), empty
        # and non-empty arrays, and node-object defaults
        frame[rng.choice(TERMS)] = {"@default": rng.choice(
            ["filled", "@null", [], ["d1", "d2"],
             {"@id": "urn:default"}, 0, False])}
    # widened pattern families (each independent, deterministic)
    wr = rng.random()
    if wr < 0.15:
        frame["@id"] = rng.choice(
            ["urn:n" + str(rng.randint(0, 5)), EX + "n0",
             [EX + "n1", "urn:n2"], {}])
    elif wr < 0.25:
        frame["@requireAll"] = True
    elif wr < 0.35:
        frame["@omitDefault"] = True
    elif wr < 0.5:
        # nested subframe: match through a property into a node pattern
        inner: dict = {}
        ir = rng.random()
        if ir < 0.4:
            inner["@type"] = rng.choice(TYPES + [{}])  # type: ignore
        elif ir < 0.7:
            inner[rng.choice(TERMS)] = {}
        else:
            inner["@id"] = rng.choice(["urn:x", "urn:y", {}])
        # wave-13: per-SUBFRAME flags override the top-level/options
        # ones for that recursion (frame.js:84-86 reads flags off each
        # frame object)
        if rng.random() < 0.3:
            inner["@embed"] = rng.choice(["@once", "@always", "@never",
                                          "@link", True, False])
        if rng.random() < 0.2:
            inner["@explicit"] = rng.choice([True, False])
        if rng.random() < 0.15:
            inner["@requireAll"] = rng.choice([True, False])
        frame[rng.choice(TERMS)] = inner
    elif wr < 0.6:
        # value pattern
        vp: dict = {"@value": rng.choice(["s1", "v", {}, ["s1", "s2"]])}
        if rng.random() < 0.4:
            vp["@language"] = rng.choice(LANGS + [{}])  # type: ignore
        frame[rng.choice(TERMS)] = vp
    elif wr < 0.68:
        # list frame
        frame[rng.choice(TERMS)] = {
            "@list": [rng.choice([{}, {"@value": "s1"},
                                  {"@id": "urn:x"}])]}
    elif wr < 0.75:
        frame["@reverse"] = {EX + "rp": rng.choice([{}, {"@type": {}}])}
    elif wr < 0.83:
        # named-graph framing: @graph subframe selects the default
        # graph when top-level (jsonld.js:474-479) and recurses into
        # named graphs per node
        g: dict = {"@graph": [rng.choice(
            [{}, {"@type": rng.choice(TYPES)},
             {rng.choice(TERMS): {}}])]}
        if rng.random() < 0.5:
            frame["@graph"] = g["@graph"]
        else:
            frame[rng.choice(TERMS)] = g
    elif wr < 0.9:
        # wave-15: @included subframes (frame.js handles @included
        # blocks in matching and output)
        frame["@included"] = [rng.choice(
            [{}, {"@type": rng.choice(TYPES)},
             {rng.choice(TERMS): {}}])]
    return frame


def gen_op_options(seed: int, op: str) -> dict:
    """Deterministic per-seed per-op OPTION variations — the big
    behavioral switches (processing mode, compactArrays, graph
    wrapping, generalized RDF, rdfDirection, frame flags) that the
    default-options campaign never exercises."""
    rng = random.Random(seed * 53 + {"expand": 1, "flatten": 2,
                                     "toRDF": 3, "compact": 4,
                                     "frame": 5, "compactX": 7,
                                     "flattenC": 8, "frameX": 9,
                                     "merge": 10,
                                     "frameC": 11,
                                     "compactE": 12,
                                     "canonize": 13}.get(op, 6))
    opts: dict = {}
    # NO document base: relative IRI references have nothing to resolve
    # against (dropped subjects/objects, kept relative @ids under
    # @base-less contexts — a distinct kernel path). Decided PER SEED,
    # not per op: jsonld.js's shared inline-context LRU caches
    # PROCESSED contexts across API calls in one process, pinning
    # base-dependent resolutions (@vocab: "") to the FIRST request's
    # base — mixing bases across ops of one seed in one node process
    # replays the first op's base into later ops (a cache artifact of
    # the batch harness, not kernel semantics)
    _base_r = random.Random(seed * 97 + 13).random()
    if _base_r < 0.08:
        opts["base"] = None
    elif _base_r < 0.14:
        # OMITTED base: the reference default is the EMPTY base ''
        # (empty-base RESOLUTION — 'rel/../dot' -> 'dot'), a third
        # state besides an explicit null and a string
        # (jsonld.js:149,312,371,421; _omit_base is stripped by main
        # on BOTH sides so no 'base' key reaches either engine)
        opts["_omit_base"] = True
    if rng.random() < 0.15:
        opts["processingMode"] = "json-ld-1.0"
    # safe mode promotes lossy-event warnings to errors (events.js:
    # 8-33). Decided PER SEED, not per op (like the base options):
    # jsonld.js's shared inline-context LRU caches processed contexts
    # ACROSS ops in one node process and replays captured events on
    # hits — mixing safe across a seed's ops makes a scoped-context
    # error surface wrapped on first processing but raw on a replay
    # (wave-13 seed 372), a batch-harness artifact, not semantics
    if random.Random(seed * 89 + 31).random() < 0.1:
        opts["safe"] = True
    if rng.random() < 0.15:
        # expandContext is resolved and layered under the document's
        # own context at every API's internal expansion
        # (jsonld.js:283-292, expand.js:120-128)
        opts["expandContext"] = rng.choice([
            {"@vocab": "http://ec.example/vocab/"},
            {"ecterm": "http://ec.example/ecterm",
             "gamma": {"@id": "http://ec.example/gamma-override",
                       "@container": "@set"}},
            {"@context": {"@base": "http://ec.example/base/",
                          "beta": {"@id": "http://ec.example/beta",
                                   "@type": "@id"}}},
        ])
    if op in ("compact", "compactX", "flattenC", "compactE"):
        if rng.random() < 0.3:
            opts["compactArrays"] = False
        if op != "flattenC" and rng.random() < 0.2:
            opts["graph"] = True
        if op != "flattenC" and rng.random() < 0.12:
            # keep IRIs absolute: the reference DELETES options.base
            # before expand+compact (jsonld.js:164-165)
            opts["compactToRelative"] = False
    elif op == "toRDF":
        if rng.random() < 0.25:
            opts["produceGeneralizedRdf"] = True
        if rng.random() < 0.25:
            opts["rdfDirection"] = "i18n-datatype"
    elif op == "merge":
        if rng.random() < 0.35:
            opts["mergeNodes"] = False
    elif op == "canonize":
        # nested canonizeOptions surface (jsonld.js:577-580); the
        # digest choice flows into every first/n-degree hash
        if rng.random() < 0.25:
            opts["canonizeOptions"] = {
                "messageDigestAlgorithm": rng.choice(
                    ["sha384", "sha512", "SHA-256"])}
    elif op in ("frame", "frameX", "frameC"):
        if rng.random() < 0.2:
            opts["omitDefault"] = True
        if rng.random() < 0.2:
            opts["requireAll"] = True
        if rng.random() < 0.2:
            opts["omitGraph"] = False
        if rng.random() < 0.15:
            opts["embed"] = rng.choice(["@always", "@never", "@once"])
        if rng.random() < 0.15:
            # gates the framed-output 0/1-element collapse
            # (jsonld.js:188-195 via opts.graph=!omitGraph)
            opts["compactArrays"] = False
        if rng.random() < 0.12:
            # wave-15: global explicit flag (default @explicit)
            opts["explicit"] = True
    return opts


def gen_from_rdf_options(seed: int) -> dict:
    """Deterministic fromRDF option mix per seed."""
    rng = random.Random(seed * 97 + 13)
    opts: dict = {}
    if rng.random() < 0.5:
        opts["useNativeTypes"] = True
    if rng.random() < 0.3:
        opts["useRdfType"] = True
    if rng.random() < 0.3:
        opts["rdfDirection"] = "i18n-datatype"
    return opts


def expanded_for_seed(doc) -> list | None:
    """Expand the fuzz doc with THIS kernel as shared transport for the
    skipExpansion leg (both engines compact the same expanded array;
    expansion parity is already proven by the campaign). None when the
    doc errors."""
    try:
        return api.expand(doc,
                          {"base": "https://fuzz.example/doc.jsonld"})
    except (JsonLdError, RecursionError):
        return None


def nquads_for_seed(doc) -> str | None:
    """Serialize the fuzz doc to N-Quads with THIS kernel as shared
    transport for fromRDF comparisons (both engines read the same
    string; the 5-op campaign already proves serializer parity).
    Returns None when the doc errors or emits fuzz-garbage (e.g.
    malformed language tags) that a strict parser would reject."""
    try:
        nq = api.to_nquads(doc, {"base": "https://fuzz.example/doc.jsonld"})
        parse_nquads(nq)
        return nq
    except (JsonLdError, RecursionError):
        return None


CTX_BASE = "https://ctx.example/"


def gen_remote_case(seed: int) -> tuple[dict, dict]:
    """--remote mode: a document whose context chain crosses REMOTE
    boundaries (snapshot-backed): a leaf context URL, optional @import
    composition, optional @protected terms, an optional term-scoped
    remote context, and an optional inline override layered on top.
    Returns (doc, contexts-snapshot)."""
    rng = random.Random(seed * 131 + 29)
    snapshot: dict = {}

    leaf: dict = {"@version": 1.1}
    if rng.random() < 0.6:
        leaf["@vocab"] = EX
    for t in rng.sample(TERMS, rng.randint(2, 4)):
        if rng.random() < 0.3:
            td: dict = {"@id": EX + "r/" + t}
            if rng.random() < 0.5:
                # strict-boolean semantics: only the literal true
                # protects; "yes"/1 are silently ignored
                td["@protected"] = rng.choice([True, True, "yes", 1,
                                               False])
            container = rng.choice(CONTAINERS)
            if container:
                td["@container"] = container
            leaf[t] = td
        else:
            leaf[t] = EX + "r/" + t
    if rng.random() < 0.15:
        leaf["@protected"] = rng.choice([True, "yes"])
    snapshot[CTX_BASE + f"leaf{seed % 7}"] = {"@context": leaf}

    mid: dict = {"@version": 1.1}
    if rng.random() < 0.5:
        # @import pulls a 1.0-shaped context into a 1.1 wrapper
        imported = {t + "Imp": EX + "imp/" + t
                    for t in rng.sample(TERMS, 2)}
        if rng.random() < 0.3:
            # wave-16: RELATIVE @import URL — resolves against
            # OPTIONS.BASE (the document base), NOT the enclosing
            # remote context's URL (context.js:347-352; the fetch-time
            # context-URL rewrite does not cover @import)
            snapshot["https://fuzz.example/rel-imported"] = {
                "@context": imported}
            mid["@import"] = "rel-imported"
        else:
            snapshot[CTX_BASE + "imported"] = {"@context": imported}
            mid["@import"] = CTX_BASE + "imported"
    if rng.random() < 0.4:
        # term-scoped REMOTE context; 30% RELATIVE — rewritten at
        # FETCH time against the remote doc's URL (ContextResolver.js:
        # 120-122/_resolveContextUrls), unlike @import
        if rng.random() < 0.3:
            mid["scopedRemote"] = {
                "@id": EX + "scopedRemote",
                "@context": f"leaf{seed % 7}"}
        else:
            mid["scopedRemote"] = {
                "@id": EX + "scopedRemote",
                "@context": CTX_BASE + f"leaf{seed % 7}"}
    for t in rng.sample(TERMS, rng.randint(1, 2)):
        mid[t] = (EX + "mid/" + t if rng.random() < 0.7
                  else {"@id": EX + "mid/" + t,
                        "@protected": rng.random() < 0.4})
    snapshot[CTX_BASE + f"mid{seed % 5}"] = {"@context": mid}

    if rng.random() < 0.25:
        # Link-header contextUrl protocol: dereferencing `linked`
        # yields a doc whose @context is wrapped as an array with the
        # contextUrl APPENDED and resolved in turn
        # (ContextResolver.js:202-207); 30% of these also redirect the
        # documentUrl (alternate), changing the _context_base for
        # RELATIVE nested references
        linked_url = CTX_BASE + f"linked{seed % 3}"
        entry: dict = {
            "documentUrl": linked_url,
            "document": {"@context": {"lk" + str(seed % 2):
                                      EX + "lk/term"}},
            "contextUrl": CTX_BASE + f"leaf{seed % 7}"}
        if rng.random() < 0.3:
            entry["documentUrl"] = CTX_BASE + "moved/" + f"l{seed % 3}"
        snapshot[linked_url] = entry
        mid["viaLink"] = EX + "viaLink"
        snapshot[CTX_BASE + f"mid{seed % 5}"] = {"@context": mid}

    # context reference the document actually uses
    r = rng.random()
    if r < 0.27:
        ctx_ref: object = CTX_BASE + f"mid{seed % 5}"
    elif r < 0.3:
        ctx_ref = (CTX_BASE + f"linked{seed % 3}"
                   if (CTX_BASE + f"linked{seed % 3}") in snapshot
                   else CTX_BASE + f"mid{seed % 5}")
    elif r < 0.6:
        ctx_ref = [CTX_BASE + f"leaf{seed % 7}",
                   CTX_BASE + f"mid{seed % 5}"]
    elif r < 0.85:
        # inline override on top of the remote chain — may clash with
        # @protected terms (error-presence comparison covers both)
        override = {rng.choice(TERMS): EX + "override"}
        if rng.random() < 0.3:
            override["@version"] = 1.1
        ctx_ref = [CTX_BASE + f"mid{seed % 5}", override]
    else:
        # NULL RESET inside / after a remote chain: nullification of
        # remote-declared @protected terms must error identically, and
        # a null-first array re-derives everything from scratch
        ctx_ref = rng.choice([
            [CTX_BASE + f"leaf{seed % 7}", None,
             {"@vocab": EX + "post/"}],
            [None, CTX_BASE + f"mid{seed % 5}"],
            [CTX_BASE + f"mid{seed % 5}", None]])

    doc = gen_node(rng, rng.randint(1, 2))
    if rng.random() < 0.3:
        doc["scopedRemote"] = gen_node(rng, 1)
    if rng.random() < 0.12:
        # inline node-level context on top of the remote chain
        doc["inlinenode"] = {
            "@context": rng.choice(
                [None, {"@vocab": EX + "inline/"}]),
            rng.choice(TERMS): "v"}
    doc["@context"] = ctx_ref
    return doc, snapshot


def gen_remote_doc_case(seed: int):
    """remote-INPUT-document leg: the API input is a URL string; the
    snapshot carries the document — plain, documentUrl-REDIRECTED
    (jsonld.expand's default base follows the redirect,
    jsonld.js:295-314), Link-header contextUrl on the DOCUMENT itself
    (processed as a context before the doc), or a STRING payload
    (jsonld.get JSON-parses it, jsonld.js:902-906).
    Returns (url, doc, frame_ref, snapshot, withbase)."""
    rng = random.Random(seed * 163 + 41)
    doc, snapshot = gen_remote_case(seed)
    if rng.random() < 0.6:
        # a relative @id makes the base semantics observable
        doc["@id"] = rng.choice(
            ["rel/x", "../up", "#frag", "./", "b:c"])
    url = f"https://fuzz.example/docs/d{seed}.jsonld"
    r = rng.random()
    if r < 0.35:
        snapshot[url] = doc
    elif r < 0.6:
        snapshot[url] = {
            "document": doc,
            "documentUrl": f"https://moved.example/m{seed % 5}/doc"}
    elif r < 0.8:
        snapshot[url] = {
            "document": doc, "documentUrl": url,
            "contextUrl": CTX_BASE + f"leaf{seed % 7}"}
    else:
        snapshot[url] = {"document": json.dumps(doc),
                         "documentUrl": url}
    # frame input may itself be a URL (jsonld.js:431-449): 50% direct
    # dict, 35% plain URL, 15% URL with a Link-header contextUrl
    frame = gen_frame(seed, doc)
    fr = rng.random()
    if fr < 0.5:
        frame_ref: object = frame
    else:
        frame_url = f"https://fuzz.example/frames/f{seed}.jsonld"
        if fr < 0.85:
            snapshot[frame_url] = frame
        else:
            snapshot[frame_url] = {
                "document": frame, "documentUrl": frame_url,
                "contextUrl": CTX_BASE + f"leaf{seed % 7}"}
        frame_ref = frame_url
    # half the seeds pin an explicit base (documentUrl must NOT win);
    # 25% add a REMOTE expandContext URL (resolved via the context
    # resolver and layered under every op's own context,
    # jsonld.js:283-292)
    extra_opts = {}
    if rng.random() < 0.25:
        extra_opts["expandContext"] = CTX_BASE + f"leaf{seed % 7}"
    return url, doc, frame_ref, snapshot, rng.random() < 0.5, extra_opts


def decycle(v, path: set):
    """Mirror of refrun.js decycle: replace any value that is its own
    ancestor (a @link cycle) with a marker carrying its raw '@id'
    (True when absent). The cut condition is structural (ancestor
    revisit), so both engines cut at the same places given parity;
    shared non-ancestor references serialize fully at each site."""
    if isinstance(v, list):
        if id(v) in path:
            return {"__cycle__": True}
        path.add(id(v))
        out = [decycle(x, path) for x in v]
        path.discard(id(v))
        return out
    if isinstance(v, dict):
        if id(v) in path:
            return {"__cycle__": v.get("@id", True)}
        path.add(id(v))
        out = {k: decycle(x, path) for k, x in v.items()}
        path.discard(id(v))
        return out
    return v


def link_ctx(seed: int, docs, xctx):
    """link leg per-seed context mix: none / own / foreign."""
    rng = random.Random(seed * 53 + 7)
    r = rng.random()
    if r < 0.4:
        return None
    if r < 0.7:
        return docs[seed]["@context"]
    return xctx[seed]


def run_mine(op: str, doc, options: dict):
    try:
        if op == "expand":
            return {"result": api.expand(doc, dict(options))}
        if op == "corrupt":
            return {"result": api.expand(
                corrupt_doc(options["_seed"]), dict(options))}
        if op == "flatten":
            return {"result": api.flatten(doc, None, dict(options))}
        if op == "flattenC":
            return {"result": api.flatten(doc, options["_ctx"],
                                          dict(options))}
        if op == "toRDF":
            return {"result": api.to_nquads(doc, dict(options))}
        if op in ("compact", "compactX"):
            return {"result": api.compact(doc, options["_ctx"],
                                          dict(options))}
        if op == "compactE":
            return {"result": api.compact(options["_expanded"],
                                          options["_ctx"],
                                          dict(options))}
        if op in ("frame", "frameX", "frameC"):
            # a per-subframe @embed:@link makes the framed output a
            # shared/cyclic structure — cut cycles like the link op
            return {"result": decycle(api.frame(doc, options["_frame"],
                                                dict(options)), set())}
        if op == "merge":
            return {"result": api.merge(options["_docs"],
                                        options.get("_ctx"),
                                        dict(options))}
        if op == "fromRDF":
            opts = {k: v for k, v in options.items()
                    if not k.startswith("_")}
            return {"result": api.from_rdf(
                parse_nquads(options["_nquads"]), opts)}
        if op == "link":
            return {"result": decycle(
                api.link(doc, options.get("_ctx"), dict(options)),
                set())}
        if op == "nodeMap":
            return {"result": api.create_node_map_api(doc,
                                                      dict(options))}
        if op == "canonize":
            opts = {k: v for k, v in options.items()
                    if not k.startswith("_")}
            inp = options["_nquads"] if opts.get("inputFormat") else doc
            return {"result": api.canonize(inp, opts)}
        raise ValueError(op)
    except JsonLdError as e:
        return {"errorCode": e.code}
    except RecursionError:
        return {"errorCode": "recursion"}


def compare(op, ref, mine, strict_codes: bool = True):
    if "errorCode" in ref or "errorCode" in mine:
        if ("errorCode" in ref) != ("errorCode" in mine):
            return False
        if not strict_codes:
            return True
        rc, mc = ref["errorCode"], mine["errorCode"]
        if mc == "TypeError parity" or mc == "recursion":
            # mirrored raw crashes carry the reference's free-text
            # message, not a spec code; recursion depth differs by host
            return True
        if "Maximum call stack size exceeded" in str(rc):
            # the reference blew its stack (cyclic link output inside
            # compaction) — a raw V8 crash with no spec code; which
            # error surfaces first on a cycle is traversal-order
            # dependent, so any error on this side agrees (wave-12
            # link seed 1913: ref overflows, mine raises the genuine
            # 'IRI confused with prefix' it meets on the way)
            return True
        if op == "merge":
            # jsonld.merge expands all docs under Promise.all
            # (jsonld.js:791-795): when SEVERAL docs error, the code
            # that surfaces is whichever rejection lands first in V8
            # microtask order — a scheduling artifact, not semantics
            return True
        # spec error CODES must agree, not just presence
        return rc == mc
    if op == "toRDF":
        try:
            return (canonize_nquads(parse_nquads(mine["result"]))
                    == canonize_nquads(parse_nquads(ref["result"])))
        except JsonLdError:
            # both serializers emit fuzz-made garbage language tags
            # verbatim (reference behavior); when the strict parser
            # rejects them, fall back to exact line-set comparison
            return (sorted(set(mine["result"].splitlines()))
                    == sorted(set(ref["result"].splitlines())))
    return ref["result"] == mine["result"]


def main_remote(n: int, start: int):
    """--remote mode: remote-context composition fuzzing (snapshot
    loader on both sides), plus the remote-INPUT-document arm (the API
    input is a URL; expand's default base follows documentUrl
    redirects, every other op bases on the INPUT url)."""
    ops = ["expand", "flatten", "toRDF", "compact", "frame"]
    # merge: jsonld.merge expands every entry, so a URL entry in the
    # docs ARRAY dereferences like any string input (jsonld.js:791-795)
    doc_ops = ["expand", "flatten", "toRDF", "compact", "frame",
               "merge"]
    base = "https://fuzz.example/doc.jsonld"
    seeds = list(range(start, start + n))
    cases = {s: gen_remote_case(s) for s in seeds}
    doc_cases = {s: gen_remote_doc_case(s) for s in seeds}
    reqs = []
    for s in seeds:
        doc, snapshot = cases[s]
        for op in ops:
            req = {"op": op, "input": doc, "options": {"base": base},
                   "contexts": snapshot}
            if op == "compact":
                req["context"] = doc["@context"]
            elif op == "frame":
                req["frame"] = gen_frame(s, doc)
            reqs.append(req)
        url, ddoc, frame_ref, dsnap, withbase, extra = doc_cases[s]
        for op in doc_ops:
            req = {"op": op, "input": url,
                   "options": {**({"base": base} if withbase else {}),
                               **extra},
                   "contexts": dsnap}
            if op == "compact":
                req["context"] = ddoc["@context"]
            elif op == "frame":
                req["frame"] = frame_ref
            elif op == "merge":
                req["input"] = [url, gen_doc(3 * s + 2)]
            reqs.append(req)
    refs = run_reference(reqs)
    n_match = n_diff = 0
    i = 0
    for s in seeds:
        doc, snapshot = cases[s]
        for op in ops:
            ref = refs[i]; i += 1
            opts = {"base": base, "contexts": snapshot}
            if op == "compact":
                opts["_ctx"] = doc["@context"]
            elif op == "frame":
                opts["_frame"] = gen_frame(s, doc)
            mine = run_mine(op, doc, opts)
            if compare(op, ref, mine):
                n_match += 1
            else:
                n_diff += 1
                print(f"DIVERGE seed={s} op={op} (remote)")
                print("  ref :", json.dumps(ref, sort_keys=True)[:400])
                print("  mine:", json.dumps(mine, sort_keys=True)[:400])
        url, ddoc, frame_ref, dsnap, withbase, extra = doc_cases[s]
        for op in doc_ops:
            ref = refs[i]; i += 1
            opts = {"contexts": dsnap, **extra}
            if withbase:
                opts["base"] = base
            if op == "compact":
                opts["_ctx"] = ddoc["@context"]
            elif op == "frame":
                opts["_frame"] = frame_ref
            elif op == "merge":
                opts["_docs"] = [url, gen_doc(3 * s + 2)]
            mine = run_mine(op, url, opts)
            if compare(op, ref, mine):
                n_match += 1
            else:
                n_diff += 1
                print(f"DIVERGE seed={s} op={op} (remote-doc"
                      f"{' +base' if withbase else ''})")
                print("  ref :", json.dumps(ref, sort_keys=True)[:400])
                print("  mine:", json.dumps(mine, sort_keys=True)[:400])
    print(f"{n_match} match, {n_diff} diverge "
          f"({n} docs x {len(ops)}+{len(doc_ops)} remote ops, "
          f"seeds {start}..{start + n - 1})")
    sys.exit(1 if n_diff else 0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 200
    start = int(args[1]) if len(args) > 1 else 0
    if "--remote" in sys.argv:
        main_remote(n, start)
        return
    ops = ["expand", "flatten", "toRDF", "compact", "frame", "fromRDF",
           "compactX", "flattenC", "frameX", "merge", "corrupt",
           "frameC", "link", "compactE", "nodeMap", "canonize"]
    base = "https://fuzz.example/doc.jsonld"
    seeds = list(range(start, start + n))
    docs = {s: gen_doc(s) for s in seeds}
    # compactX: compact onto a FOREIGN context (an independently
    # generated document's context) — exercises term selection where
    # terms/containers don't align with the data shape
    xctx = {s: gen_doc(2 * s + 1)["@context"] for s in seeds}
    # shared N-Quads transport for the fromRDF round-trip leg; None
    # when the doc itself errors (those seeds skip the fromRDF op)
    nqs = {s: nquads_for_seed(docs[s]) for s in seeds}
    # shared EXPANDED transport for the skipExpansion compact leg
    exps = {s: expanded_for_seed(docs[s]) for s in seeds}

    def merge_case(s):
        """merge leg: this doc + an independent doc, with a per-seed
        compaction context (none / own / foreign)."""
        rng = random.Random(s * 41 + 17)
        pair = [docs[s], gen_doc(3 * s + 2)]
        r = rng.random()
        mctx = None if r < 0.5 else (
            docs[s]["@context"] if r < 0.75 else xctx[s])
        return pair, mctx
    reqs = []
    for s in seeds:
        for op in ops:
            op_opts = {"base": base, **gen_op_options(s, op)}
            if op_opts.pop("_omit_base", False):
                op_opts.pop("base", None)
            if op == "compact":
                # round-trip: compact the document back onto its own
                # context (reference compact expands internally)
                req = {"op": op, "input": docs[s],
                       "context": docs[s]["@context"],
                       "options": op_opts}
                if op_opts.get("compactToRelative") is False:
                    req["fresh"] = True  # base-state change: isolate
                reqs.append(req)
            elif op == "compactX":
                req = {"op": "compact", "input": docs[s],
                       "context": xctx[s], "options": op_opts}
                if op_opts.get("compactToRelative") is False:
                    req["fresh"] = True
                reqs.append(req)
            elif op == "compactE":
                # skipExpansion: both engines compact the SAME
                # pre-expanded array (this kernel's expansion —
                # parity proven by the expand leg) onto an
                # own/foreign context (jsonld.js:168-175)
                if exps[s] is None:
                    continue
                ectx = docs[s]["@context"] if s % 2 == 0 else xctx[s]
                req = {"op": "compact", "input": exps[s],
                       "context": ectx,
                       "options": {**op_opts, "skipExpansion": True}}
                if op_opts.get("compactToRelative") is False:
                    req["fresh"] = True
                reqs.append(req)
            elif op == "flattenC":
                # flatten WITH a context exercises the reference's
                # flatten->compact composition (jsonld.js:150-205);
                # alternate own/foreign context per seed
                fctx = docs[s]["@context"] if s % 2 == 0 else xctx[s]
                reqs.append({"op": "flatten", "input": docs[s],
                             "context": fctx, "options": op_opts})
            elif op == "frameX":
                # frame with a FOREIGN frame (patterns generated
                # against an independent doc) — misaligned patterns
                # drive the default-fill / non-match paths
                reqs.append({"op": "frame", "input": docs[s],
                             "frame": gen_frame(s, gen_doc(2 * s + 1)),
                             "options": op_opts})
            elif op == "merge":
                pair, mctx = merge_case(s)
                req = {"op": "merge", "input": pair,
                       "options": op_opts}
                if mctx is not None:
                    req["context"] = mctx
                reqs.append(req)
            elif op == "corrupt":
                # error-agreement leg: an injected invalid shape —
                # both engines must agree on error-vs-result
                reqs.append({"op": "expand", "input": corrupt_doc(s),
                             "options": op_opts})
            elif op == "frameC":
                # corrupted-FRAME error agreement
                reqs.append({"op": "frame", "input": docs[s],
                             "frame": corrupt_frame(
                                 s, gen_frame(s, docs[s])),
                             "options": op_opts})
            elif op == "link":
                # in-memory node linking (cycle-cut on both sides)
                req = {"op": "link", "input": docs[s],
                       "options": op_opts}
                lctx = link_ctx(s, docs, xctx)
                if lctx is not None:
                    req["context"] = lctx
                reqs.append(req)
            elif op == "frame":
                reqs.append({"op": op, "input": docs[s],
                             "frame": gen_frame(s, docs[s]),
                             "options": op_opts})
            elif op == "fromRDF":
                if nqs[s] is None:
                    continue
                reqs.append({"op": op, "input": nqs[s],
                             "options": gen_from_rdf_options(s)})
            elif op == "canonize":
                # RDFC-1.0 cross-implementation differential: the
                # reference runs its toRDF + the shim's spec-derived
                # JS canonizer (jsonld.js:564-604); every 4th seed
                # takes the inputFormat=application/n-quads parse path
                # over the shared N-Quads transport
                if s % 4 == 0 and nqs[s] is not None:
                    op_opts["inputFormat"] = "application/n-quads"
                    reqs.append({"op": op, "input": nqs[s],
                                 "options": op_opts})
                else:
                    # canonize forces safe:true internally
                    # (jsonld.js:571) — isolate it from the shared
                    # inline-context LRU, whose cached event REPLAY
                    # would surface a scoped-context safe error with
                    # the raw event code instead of the first-run
                    # 'invalid scoped context' wrap (seed 27526; a
                    # batch artifact like the base/safe stickiness)
                    reqs.append({"op": op, "input": docs[s],
                                 "options": op_opts, "fresh": True})
            else:
                reqs.append({"op": op, "input": docs[s],
                             "options": op_opts})
    refs = run_reference(reqs)
    n_match = n_diff = 0
    i = 0
    for s in seeds:
        for op in ops:
            if op == "fromRDF" and nqs[s] is None:
                continue
            if op == "compactE" and exps[s] is None:
                continue
            ref = refs[i]; i += 1
            opts = {"base": base, **gen_op_options(s, op)}
            if opts.pop("_omit_base", False):
                opts.pop("base", None)
            if op == "compact":
                opts["_ctx"] = docs[s]["@context"]
            elif op == "compactX":
                opts["_ctx"] = xctx[s]
            elif op == "compactE":
                opts["_ctx"] = (docs[s]["@context"] if s % 2 == 0
                                else xctx[s])
                opts["_expanded"] = exps[s]
                opts["skipExpansion"] = True
            elif op == "flattenC":
                opts["_ctx"] = (docs[s]["@context"] if s % 2 == 0
                                else xctx[s])
            elif op == "frameX":
                opts["_frame"] = gen_frame(s, gen_doc(2 * s + 1))
            elif op == "merge":
                pair, mctx = merge_case(s)
                opts["_docs"] = pair
                if mctx is not None:
                    opts["_ctx"] = mctx
            elif op == "corrupt":
                opts["_corrupt"] = True
            elif op == "frameC":
                opts["_frame"] = corrupt_frame(s, gen_frame(s, docs[s]))
            elif op == "link":
                opts["_ctx"] = link_ctx(s, docs, xctx)
            elif op == "frame":
                opts["_frame"] = gen_frame(s, docs[s])
            elif op == "fromRDF":
                opts = dict(gen_from_rdf_options(s))
                opts["_nquads"] = nqs[s]
            elif op == "canonize":
                if s % 4 == 0 and nqs[s] is not None:
                    opts["inputFormat"] = "application/n-quads"
                    opts["_nquads"] = nqs[s]
            opts["_seed"] = s
            mine = run_mine(op, docs[s], opts)
            if compare(op, ref, mine):
                n_match += 1
            else:
                n_diff += 1
                print(f"DIVERGE seed={s} op={op}")
                print("  ref :", json.dumps(ref, sort_keys=True)[:400])
                print("  mine:", json.dumps(mine, sort_keys=True)[:400])
    print(f"{n_match} match, {n_diff} diverge "
          f"({n} docs x {len(ops)} ops, seeds {start}..{start + n - 1})")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
