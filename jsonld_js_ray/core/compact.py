"""JSON-LD 1.1 Compaction.

Implements Inverse Context Creation, Term Selection, IRI Compaction,
Value Compaction and the Compaction Algorithm (W3C JSON-LD 1.1 API §4.3,
§4.4, §4.5, §4.6, §6.1) from the public spec. Behavioral parity target:
/root/reference/lib/compact.js (:58-655 compaction, :671-941 compactIri,
:954-1071 compactValue, term selection :1085-1145) and the inverse-context
builder at lib/context.js:1238-1398."""

from __future__ import annotations

from typing import Any, Optional

from .context import ActiveContext, expand_iri, process_context
from .errors import JsonLdError
from .keywords import (
    KEYWORD_LIKE_RE, is_graph, is_keyword, is_list, is_simple_graph,
    is_subject_reference, is_value,
)
from .node_map import add_value
from .url import DeletedBase, prepend_base, remove_base


def _shortest_least(a: str) -> tuple:
    return (len(a), a)


def _curie_candidates(active_ctx: "ActiveContext", iri: str):
    """Candidate (term-@id, term) pairs whose @id is a strict prefix of
    ``iri``, for CURIE generation.

    Plays the role of the reference's lazily built "fast CURIE map"
    character trie (context.js:1372-1398): instead of an O(#terms) scan
    per IRI, a per-active-context index {term @id -> [terms]} plus the
    sorted set of distinct @id lengths turns lookup into one hash probe
    per distinct prefix length (a handful even for schema.org-sized
    contexts). Cached on the context like the inverse context."""
    idx = active_ctx._curie_index
    if idx is None:
        by_tid: dict[str, list] = {}
        for term, td in active_ctx.mappings.items():
            if td is None or not td.get("_prefix"):
                continue
            tid = td.get("@id")
            if not tid:
                continue
            by_tid.setdefault(tid, []).append(term)
        idx = (by_tid, sorted({len(t) for t in by_tid}))
        active_ctx._curie_index = idx
    by_tid, lengths = idx
    out = []
    n = len(iri)
    for ln in lengths:
        if ln >= n:  # strict prefix only: iri == @id never forms a CURIE
            break
        terms = by_tid.get(iri[:ln])
        if terms:
            tid = iri[:ln]
            out.extend((tid, term) for term in terms)
    return out


def inverse_context(active_ctx: ActiveContext) -> dict:
    """Inverse Context Creation (spec §4.3.2)."""
    if active_ctx._inverse is not None:
        return active_ctx._inverse
    result: dict[str, dict] = {}
    for term in sorted(active_ctx.mappings.keys(), key=_shortest_least):
        td = active_ctx.mappings[term]
        if td is None or td.get("@id") is None:
            continue
        container = "".join(sorted(td.get("@container") or [])) or "@none"
        var = td["@id"]
        container_map = result.setdefault(var, {})
        tl_map = container_map.setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}})
        tl_map["@any"].setdefault("@none", term)
        type_map = tl_map["@type"]
        lang_map = tl_map["@language"]
        if td.get("reverse"):
            type_map.setdefault("@reverse", term)
        elif td.get("@type") == "@none":
            # "@type": "@none" terms register under the '@none' KEY of
            # both value maps (context.js:1312-1315) — competing with
            # plain terms at shortest-least priority, not via a
            # separate low-priority slot
            lang_map.setdefault("@none", term)
            type_map.setdefault("@none", term)
        elif td.get("@type") is not None:
            type_map.setdefault(td["@type"], term)
        elif td.get("_has_language") and td.get("_has_direction"):
            lang = td.get("@language")
            direction = td.get("@direction")
            if lang and direction:
                key = f"{lang}_{direction}".lower()
            elif lang:
                key = lang.lower()
            elif direction:
                key = f"_{direction}"
            else:
                key = "@null"
            lang_map.setdefault(key, term)
        elif td.get("_has_language"):
            lang = td.get("@language")
            lang_map.setdefault(lang.lower() if lang else "@null", term)
        elif td.get("_has_direction"):
            direction = td.get("@direction")
            lang_map.setdefault(f"_{direction}" if direction else "@none",
                                term)
        elif active_ctx.default_direction is not None:
            # default-direction key is DIRECTION-ONLY "_dir"
            # (context.js:1343-1346), not a combined lang_dir
            lang_map.setdefault(f"_{active_ctx.default_direction}", term)
            lang_map.setdefault("@none", term)
            type_map.setdefault("@none", term)
        else:
            lang_map.setdefault(
                (active_ctx.default_language or "@none").lower(), term)
            lang_map.setdefault("@none", term)
            type_map.setdefault("@none", term)
    active_ctx._inverse = result
    return result


def _js_falsy(v) -> bool:
    """JS falsiness for scalars: null/undefined, false, 0, NaN, ''.
    (Objects and arrays — even empty — are truthy.)"""
    if v is None or v is False:
        return True
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return v == 0 or v != v
    return v == ""


def _js_property_key(v):
    """JS object-key coercion: `pref in valueMap` stringifies the pref
    (compact.js:1103-1110 reached with an ARRAY typeOrLanguageValue
    when a garbage value object carries `"@type": [...]`) — arrays
    join with "," mapping null/undefined to '' (Array.prototype
    toString)."""
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x is None else _js_property_key(x)
                        for x in v)
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def select_term(active_ctx, iri, value, containers, type_language,
                preferred_values):
    """Term Selection (spec §4.4.2; cf. reference compact.js:1085-1145)."""
    inv = inverse_context(active_ctx)
    container_map = inv.get(iri, {})
    for container in containers:
        if container not in container_map:
            continue
        tl_map = container_map[container]
        value_map = tl_map[type_language]
        for item in preferred_values:
            if not isinstance(item, str):
                item = _js_property_key(item)
            if item in value_map:
                return value_map[item]
    return None


def compact_iri(active_ctx: ActiveContext, iri: Optional[str],
                value=None, relative_to_vocab: bool = False,
                reverse: bool = False, base=None,
                _select_only: bool = False) -> Optional[str]:
    """IRI Compaction (spec §4.5.2; cf. reference compact.js:671-941)."""
    if iri is None:
        return iri
    if not isinstance(iri, str):
        # garbage-shape tolerance mirroring the reference: a LIST "IRI"
        # (e.g. the @type a @type-map key leaves on a value object) is
        # coerced JS-style for the inverse-context lookup — a
        # single-element array behaves as its element ("a,b" joining
        # otherwise) — and anything unresolved falls through unchanged
        if isinstance(iri, list) and relative_to_vocab:
            joined = ",".join(str(x) for x in iri)
            term = None
            if joined in inverse_context(active_ctx):
                # term selection on the coerced key ONLY — the
                # reference's post-selection string ops (vocab suffix,
                # CURIE trie walk) are no-ops on arrays
                term = compact_iri(active_ctx, joined, value=value,
                                   relative_to_vocab=True,
                                   reverse=reverse, base=base,
                                   _select_only=True)
            if term is not None:
                return term
            # ...until the prefix-confusion scan, where the reference
            # CRASHES (`iri.startsWith is not a function`) whenever any
            # prefix-capable term exists (compact.js:916; fuzz seed
            # 402) — mirrored as a typed error; else the array falls
            # through unchanged
            if any(td and td.get("_prefix")
                   for td in active_ctx.mappings.values()):
                raise JsonLdError(
                    "iri.startsWith is not a function (reference "
                    "TypeError: array-valued IRI reached the "
                    "prefix-confusion scan)", "TypeError parity")
            return iri
        else:
            return iri
    if is_keyword(iri):
        # keyword aliases resolve through the SIMPLE-alias slot of the
        # inverse context (e.g. a term "id" mapped to "@id") — NOT
        # gated on vocab mode: even an @id VALUE that is literally
        # "@id" compacts to the alias (compact.js:692-699 precedes the
        # vocab branch; fuzz seed 76). On a miss the keyword falls
        # THROUGH to the ordinary selection below — a container-bearing
        # alias like {"@id": "@type", "@container": "@set"} is found by
        # term selection, not by this shortcut (fixture c149).
        inv = inverse_context(active_ctx)
        entry = inv.get(iri)
        if entry is not None:
            tl = entry.get("@none")
            if tl is not None:
                term = tl["@type"].get("@none")
                if term is not None:
                    return term
    # non-vocab mode: keyword-LIKE strings (e.g. a garbage @id of
    # "@graph") fall through to base relativization, whose ./ guard
    # disambiguates them (compact.js:930-933)

    if relative_to_vocab and iri in inverse_context(active_ctx):
        # build preferred containers / type-language from value shape
        containers = []
        type_language = "@language"
        type_language_value = "@null"

        if isinstance(value, dict) and "@index" in value \
                and "@graph" not in value:
            containers.extend(["@index", "@index@set"])
        # a @preserve wrapper (framing) selects terms by its WRAPPED
        # value — unwrapped AFTER the @index check above, so a string
        # "@null" payload gets no index/id/type-map candidates and can
        # fall through to IRI compaction (compact.js:711-713)
        if isinstance(value, dict) and "@preserve" in value:
            # JS `[][0]` is undefined, not a crash — an EMPTY preserve
            # behaves like no wrapped value at all
            pv = value["@preserve"]
            value = pv[0] if pv else None
        # most-specific container candidates come BEFORE the
        # type/language chain (compact.js:716-740): graph values get
        # the @graph family; every OTHER non-value object — including
        # @list wrappers and reverse values — gets the id/type map
        # candidates here
        if is_graph(value):
            if "@index" in value:
                containers.extend(["@graph@index", "@graph@index@set",
                                   "@index", "@index@set"])
            if "@id" in value:
                containers.extend(["@graph@id", "@graph@id@set"])
            containers.extend(["@graph", "@graph@set", "@set"])
            if "@index" not in value:
                containers.extend(["@graph@index", "@graph@index@set",
                                   "@index", "@index@set"])
            if "@id" not in value:
                containers.extend(["@graph@id", "@graph@id@set"])
        elif isinstance(value, dict) and not is_value(value):
            containers.extend(["@id", "@id@set", "@type", "@set@type"])
        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif is_list(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type = None
            common_language = "@none" if not lst else None
            for item in lst:
                item_language, item_type = "@none", "@none"
                if is_value(item):
                    if "@direction" in item:
                        item_language = (f"{item.get('@language', '')}_"
                                         f"{item['@direction']}").lower()
                    elif "@language" in item:
                        item_language = item["@language"].lower()
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_language = "@null"
                else:
                    item_type = "@id"
                if common_language is None:
                    common_language = item_language
                elif common_language != item_language and is_value(item):
                    common_language = "@none"
                if common_type is None:
                    common_type = item_type
                elif common_type != item_type:
                    common_type = "@none"
                if common_language == "@none" and common_type == "@none":
                    break
            common_language = common_language or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_language
        else:
            # graph values also land here (not reverse/list/value):
            # the generic else assigns @type/@id and pushes @set
            # (compact.js:811-831)
            if is_value(value):
                if "@language" in value and "@index" not in value:
                    containers.extend(["@language", "@language@set"])
                    type_language_value = value["@language"].lower()
                    if "@direction" in value:
                        type_language_value += "_" + value["@direction"]
                elif "@direction" in value and "@index" not in value:
                    type_language_value = f"_{value['@direction']}"
                elif "@type" in value:
                    type_language = "@type"
                    type_language_value = value["@type"]
            else:
                type_language = "@type"
                type_language_value = "@id"
            containers.append("@set")
        containers.append("@none")
        # @index-less OBJECT values can use index containers
        # (compact.js:838-841: gated on _isObject — an IRI compacted
        # with NO value, e.g. a @type value, never matches index maps)
        if isinstance(value, dict) and "@index" not in value:
            containers.extend(["@index", "@index@set"])
        if is_value(value) and len(value) == 1:
            containers.extend(["@language", "@language@set"])

        preferred = []
        if type_language_value is None:
            type_language_value = "@null"
        if type_language_value in ("@id", "@reverse") and \
                isinstance(value, dict) and "@id" in value:
            if type_language_value == "@reverse":
                preferred.append("@reverse")
            # prefer @vocab vs @id depending on compacted id shape
            cid = compact_iri(active_ctx, value["@id"],
                             relative_to_vocab=True)
            td = active_ctx.mappings.get(cid)
            if td is not None and td.get("@id") == value["@id"]:
                preferred.extend(["@vocab", "@id"])
            else:
                preferred.extend(["@id", "@vocab"])
        else:
            preferred.append(type_language_value)
            if is_list(value) and not value["@list"]:
                type_language = "@any"
            # direction-only fallback: the FIRST pref containing "_"
            # re-pushes with its language part stripped, BEFORE @none
            # (compact.js:1117-1123); JS .includes is substring on
            # string prefs, element MEMBERSHIP on array prefs
            lang_dir = next(
                (p for p in preferred
                 if isinstance(p, (str, list)) and "_" in p), None)
            if lang_dir is not None:
                if isinstance(lang_dir, str):
                    preferred.append("_" + lang_dir.split("_", 1)[1])
                else:
                    preferred.append(lang_dir)
        preferred.append("@none")
        term = select_term(active_ctx, iri, value, containers,
                           type_language, preferred)
        if term is not None:
            return term
    if _select_only:
        # coerced-list caller: selection miss, no string fallbacks
        return None

    if relative_to_vocab and active_ctx.vocab is not None:
        if iri.startswith(active_ctx.vocab) and iri != active_ctx.vocab:
            suffix = iri[len(active_ctx.vocab):]
            if suffix not in active_ctx.mappings:
                return suffix

    # compact IRI via prefix candidates, found through the fast CURIE
    # index instead of scanning every term (the reference builds a
    # character trie for the same purpose: context.js:1372-1398, walked
    # at compact.js:874-906; here a per-context {term-@id -> terms} map
    # probed at each distinct prefix length gives the same candidate set)
    candidate = None
    for tid, term in _curie_candidates(active_ctx, iri):
        curie = term + ":" + iri[len(tid):]
        curie_td = active_ctx.mappings.get(curie)
        if curie_td is not None and curie_td.get("@id") != iri:
            continue
        if candidate is None or _shortest_least(curie) < \
                _shortest_least(candidate):
            candidate = curie
    if candidate is not None:
        return candidate

    # no CURIE chosen: an IRI that still LOOKS like a CURIE of a
    # prefix-capable term is ambiguous on re-expansion — hard error
    # (compact.js:913-922)
    for pterm, ptd in active_ctx.mappings.items():
        if ptd and ptd.get("_prefix") and iri.startswith(pterm + ":"):
            raise JsonLdError(
                f'Absolute IRI "{iri}" confused with prefix "{pterm}".',
                "IRI confused with prefix")

    # direct term match even without inverse hit (e.g. keyword aliases)
    if not relative_to_vocab:
        # three modes keyed on whether a LOCAL context set @base
        # (compact.js:926-936, `'@base' in activeCtx`):
        if active_ctx.has_ctx_base:
            if not active_ctx.ctx_base:
                # explicit @base null (or a slot that chained to '') —
                # keep potentially-relative IRIs
                return iri
            # the reference re-resolves the raw context-@base SLOT
            # against compactIri's base PARAM — options.base, which is
            # null via the destructuring default in the DELETED-base
            # state (compact.js:931, :677) so the slot applies verbatim
            # there, unlike expansion's empty-base resolution
            ob = active_ctx.original_base
            pb = None if isinstance(ob, DeletedBase) else ob
            rel = remove_base(prepend_base(pb, active_ctx.ctx_base), iri)
            # only THIS branch guards keyword-like relativizations with
            # ./ so they can't be mistaken for keywords on re-expansion
            if KEYWORD_LIKE_RE.match(rel):
                rel = "./" + rel
            return rel
        eff = active_ctx.base if active_ctx.base is not None else base
        if isinstance(eff, DeletedBase):
            # the DELETED-base sentinel (compactToRelative=false):
            # the reference's compactIri receives base=null via its
            # destructuring default when options.base is undefined
            # (compact.js:677), so relativization is a no-op — even
            # though context processing above ran in empty-base mode.
            # A genuinely EMPTY base ('' — the omitted-base default)
            # instead falls through and RELATIVIZES via remove_base
            # ('//net.example/x' -> 'x'; fuzz seed 225)
            return iri
        if eff is not None:
            return remove_base(eff, iri)
    return iri


def compact_value(active_ctx, active_property, value, options):
    """Value Compaction (spec §4.6.2; cf. reference compact.js:954-1071)."""
    td = active_ctx.mappings.get(active_property) or {}
    if is_value(value):
        type_mapping = td.get("@type")
        language = value.get("@language")
        direction = value.get("@direction")
        container = td.get("@container") or []
        preserve_index = "@index" in value and "@index" not in container

        # a term typed @type: @none never collapses values
        # (cf. reference compact.js:968, :996-999)
        if not preserve_index and type_mapping != "@none":
            # the reference's FOUR collapse clauses, in order
            # (compact.js:969-984): type match; language AND direction
            # match; language match ALONE; direction match ALONE — the
            # last collapses even when a (garbage) @language disagrees
            eff_lang = (td.get("@language") if td.get("_has_language")
                        else active_ctx.default_language)
            eff_dir = (td.get("@direction") if td.get("_has_direction")
                       else active_ctx.default_direction)
            if ("@type" in value and isinstance(value["@type"], str)
                    and type_mapping is not None
                    and value["@type"] == type_mapping):
                return value["@value"]
            if ("@language" in value and language == eff_lang
                    and "@direction" in value and direction == eff_dir):
                return value["@value"]
            if "@language" in value and language == eff_lang:
                return value["@value"]
            if "@direction" in value and direction == eff_dir:
                return value["@value"]
        # bare-@value rule, mirrored EXACTLY from compact.js:986-999:
        # value-only (or value+unpreserved-@index), term not @none, and
        # (no DEFAULT language | non-string value | term @language:null).
        # NOTE the reference never consults @direction here — a plain
        # string compacts bare even under a default @direction (lossy
        # on re-expansion, but it is the parity target)
        key_count = len(value)
        is_value_only = (key_count == 1
                         or (key_count == 2 and "@index" in value
                             and not preserve_index))
        has_default_language = active_ctx.default_language is not None
        is_value_string = isinstance(value["@value"], str)
        has_null_mapping = (active_property in active_ctx.mappings
                            and td.get("_has_language")
                            and td.get("@language") is None)
        if (is_value_only and type_mapping != "@none"
                and (not has_default_language or not is_value_string
                     or has_null_mapping)):
            return value["@value"]
        # keep as object, compacting keys. @language is copied ONLY
        # when there is no @type (compact.js:1011-1026: else-if) —
        # garbage values carrying both drop the language
        rval = {}
        for k, v in value.items():
            if k == "@type":
                v = compact_iri(active_ctx, v, relative_to_vocab=True)
            elif k == "@language" and "@type" in value:
                continue
            elif k == "@index" and not preserve_index:
                # an unpreserved @index (the active property has an
                # @index container — property-based or not) is silently
                # DROPPED from the kept object: the reference's build
                # only copies @index under preserveIndex
                # (compact.js:1005-1011; fuzz seed 6001)
                continue
            alias = compact_iri(active_ctx, k, relative_to_vocab=True)
            rval[alias] = v
        return rval

    if is_subject_reference(value):
        type_mapping = td.get("@type")
        if type_mapping == "@id":
            return compact_iri(active_ctx, value["@id"])
        if type_mapping == "@vocab":
            return compact_iri(active_ctx, value["@id"],
                               relative_to_vocab=True)
        # a subject reference whose ACTIVE PROPERTY expands to @graph
        # (a raw/aliased @graph key of a non-simple graph object)
        # scalar-compacts document-relative (compact.js:1049-1062)
        if active_property is not None and expand_iri(
                active_ctx, active_property, vocab_mode=True,
                options=options) == "@graph":
            return compact_iri(active_ctx, value["@id"])
    return value


def compact(active_ctx: ActiveContext, active_property: Optional[str],
            element, options: dict):
    """Compaction Algorithm (spec §6.1.2)."""
    compact_arrays = options.get("compactArrays", True)

    if isinstance(element, list):
        result = []
        for item in element:
            compacted = compact(active_ctx, active_property, item, options)
            if compacted is not None:
                result.append(compacted)
        td = active_ctx.mappings.get(active_property) or {}
        container = td.get("@container") or []
        if (compact_arrays and len(result) == 1
                and not container
                and active_property not in ("@graph", "@set")):
            return result[0]
        return result

    if not isinstance(element, dict):
        return element

    # framing @link memo (cf. reference compact.js:105-113): when framing
    # produced shared/cyclic node objects (@embed: @link), reuse the
    # already-compacted object for the identical expanded object so shared
    # structure survives and cycles terminate.
    # the memo keys on the expanded OBJECT itself (identity via ``is``),
    # keeping it alive for the memo's lifetime — an id()-keyed memo can
    # alias a freed temporary's recycled address (reference compact.js
    # stores the expanded object in its link entries for the same reason)
    link = options.get("link")
    if link is not None and "@id" in element:
        for exp_obj, compacted in link.get(element["@id"], []):
            if exp_obj is element:
                return compacted

    # ENTRY application of the property-scoped context (compact.js:92;
    # presence matters: "@context": null nullifies rather than being
    # skipped) — value objects and subject references compact with
    # exactly this ONE application
    td0 = active_ctx.mappings.get(active_property) or {}
    if "@context" in td0:
        active_ctx = process_context(active_ctx, td0["@context"], options,
                                     override_protected=True)
        td0 = active_ctx.mappings.get(active_property) or {}

    if is_value(element) or is_subject_reference(element):
        rval = compact_value(active_ctx, active_property, element, options)
        if not isinstance(rval, (dict, list)):
            if link is not None and is_subject_reference(element):
                link.setdefault(element["@id"], []).append(
                    (element, rval))
            return rval
        if is_value(element):
            return rval

    # a list object under a @list-container property compacts to a bare
    # array, recursively — nested lists become arrays of arrays
    # (cf. reference compact.js:130-141; the container is read off the
    # POST-entry-application context)
    if is_list(element):
        container = td0.get("@container") or []
        if "@list" in container:
            return compact(active_ctx, active_property, element["@list"],
                           options)

    # full objects: revert any type-scoped context, then apply the
    # property-scoped context AGAIN over the reverted context
    # (compact.js:150-170: inputCtx is the post-entry-application ctx,
    # the scoped ctx is READ from it, and with no previous context the
    # revert is a no-op — so the scoped context composes with ITSELF,
    # chaining a relative scoped @base twice exactly like expansion's
    # object-entry re-application; wave-13 seed 33558)
    input_ctx = active_ctx
    if active_ctx.previous_context is not None:
        active_ctx = active_ctx.previous_context
    td_in = input_ctx.mappings.get(active_property) or {}
    if "@context" in td_in:
        active_ctx = process_context(active_ctx, td_in["@context"], options,
                                     override_protected=True)
    td0 = active_ctx.mappings.get(active_property) or {}

    inside_reverse = active_property == "@reverse"
    result: dict[str, Any] = {}
    # register in the link memo BEFORE recursing into properties so a
    # cyclic @link structure hits the memo instead of recursing forever
    # (cf. reference compact.js:172-178)
    if link is not None and "@id" in element:
        link.setdefault(element["@id"], []).append((element, result))

    # type-scoped contexts, applied in compacted-term sorted order
    if "@type" in element:
        compacted_types = sorted(
            compact_iri(active_ctx, t, relative_to_vocab=True)
            for t in element["@type"])
        for ct in compacted_types:
            td = active_ctx.mappings.get(ct)
            if td and "@context" in td:
                active_ctx = process_context(active_ctx, td["@context"],
                                             options, propagate=False)

    for expanded_property in sorted(element.keys()):
        expanded_value = element[expanded_property]

        if expanded_property in ("@id",):
            v = expanded_value
            if isinstance(v, str):
                compacted = compact_iri(active_ctx, v)
            else:
                compacted = v
            alias = compact_iri(active_ctx, "@id", relative_to_vocab=True)
            result[alias] = compacted
            continue

        if expanded_property == "@type":
            types = expanded_value
            if isinstance(types, str):
                types = [types]
            compacted = [compact_iri(active_ctx, t, relative_to_vocab=True)
                         for t in types]
            if len(compacted) == 1:
                # singleton @type ALWAYS collapses to a string — even
                # under compactArrays=false (compact.js:233-257 has no
                # compactArrays check here) — unless the @type alias
                # term carries @container @set in 1.1 mode
                type_td = active_ctx.mappings.get(
                    compact_iri(active_ctx, "@type",
                                relative_to_vocab=True)) or {}
                if "@set" not in (type_td.get("@container") or []):
                    compacted = compacted[0]
            alias = compact_iri(active_ctx, "@type", relative_to_vocab=True)
            result[alias] = compacted
            continue

        if expanded_property == "@reverse":
            compacted = compact(active_ctx, "@reverse", expanded_value,
                                options)
            if isinstance(compacted, dict):
                for prop in list(compacted.keys()):
                    td = active_ctx.mappings.get(prop) or {}
                    if td.get("reverse"):
                        value = compacted.pop(prop)
                        container = td.get("@container") or []
                        use_array = ("@set" in container
                                     or not compact_arrays)
                        add_value_compact(result, prop, value, use_array)
                if compacted:
                    alias = compact_iri(active_ctx, "@reverse",
                                        relative_to_vocab=True)
                    result[alias] = compacted
            continue

        if expanded_property == "@preserve":
            compacted = compact(active_ctx, active_property,
                                expanded_value, options)
            # keep an EMPTY @preserve too: this port cleans @preserve
            # AFTER compaction, and the cleanup must see the wrapper to
            # mirror the reference's `['@preserve'][0]` → undefined →
            # property-drops semantics (wave-17 seeds 113/790, an
            # empty @default)
            result["@preserve"] = compacted
            continue

        if expanded_property == "@index":
            container = td0.get("@container") or []
            if "@index" in container:
                continue
            alias = compact_iri(active_ctx, "@index",
                                relative_to_vocab=True)
            result[alias] = expanded_value
            continue

        if (is_keyword(expanded_property)
                and expanded_property not in ("@graph", "@list",
                                              "@included")):
            # ALL remaining keywords (@value/@language/@direction, the
            # frame flags, @none and other generically-expanded
            # keywords) are aliased and added VERBATIM with addValue
            # semantics (compact.js:334-346): a 1-item array collapses
            # to its element, an empty array adds nothing. @included
            # instead flows through the generic item path below, where
            # graph-object items take the unwrap-then-rewrap shortcut
            # (fuzz seed 6336)
            alias = compact_iri(active_ctx, expanded_property,
                                relative_to_vocab=True)
            add_value_compact(result, alias, expanded_value, False)
            continue

        if expanded_property == "@graph":
            # handled below via generic path with active property '@graph'
            pass

        if not isinstance(expanded_value, list):
            # reference compact.js:348-353: a non-array property value
            # (e.g. the nulled-property-index fallback's raw string) is
            # a hard code-less SyntaxError
            raise JsonLdError(
                "JSON-LD expansion error; expanded value must be an "
                "array.", "jsonld.SyntaxError")

        if len(expanded_value) == 0:
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_value,
                relative_to_vocab=True, reverse=inside_reverse)
            nest_result, nest_prop = _nest_target(
                active_ctx, item_active_property, result)
            add_value_compact(nest_result, nest_prop, [], True)
            continue

        for expanded_item in expanded_value:
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_item,
                relative_to_vocab=True, reverse=inside_reverse)
            nest_result, nest_prop = _nest_target(
                active_ctx, item_active_property, result)
            td = active_ctx.mappings.get(item_active_property) or {}
            container = td.get("@container") or []
            # reference compact.js:630-640: array if compactArrays off,
            # container has @set OR @LIST, the compacted item is an
            # empty array, or the EXPANDED property is @list/@graph
            # (the raw keyword, not the compacted alias; @list-container
            # case found by fuzz seed 29192 via a relative property
            # name that collides with a foreign @list term)
            as_array = ("@set" in container or "@list" in container
                        or not compact_arrays
                        or expanded_property in ("@graph", "@list"))

            inner = expanded_item
            if is_list(expanded_item):
                inner = expanded_item["@list"]
            elif is_graph(expanded_item):
                inner = expanded_item["@graph"]

            compacted_item = compact(
                active_ctx, item_active_property,
                inner if (is_list(expanded_item) or is_graph(expanded_item))
                else expanded_item, options)

            if is_list(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    # wrap with the @list alias, then FALL THROUGH to
                    # the map-packing section (compact.js:426-457 has
                    # no continue here): a list value under an e.g.
                    # @index-container term still packs into the map
                    # under @none
                    alias = compact_iri(active_ctx, "@list",
                                        relative_to_vocab=True)
                    wrapper = {alias: compacted_item}
                    if "@index" in expanded_item:
                        idx_alias = compact_iri(active_ctx, "@index",
                                                relative_to_vocab=True)
                        wrapper[idx_alias] = expanded_item["@index"]
                    compacted_item = wrapper
                else:
                    nest_result[nest_prop] = compacted_item
                    continue

            if is_graph(expanded_item):
                if "@graph" in container and "@id" in container:
                    map_object = nest_result.setdefault(nest_prop, {})
                    if isinstance(map_object, list):
                        # JS parity: a preceding graph-else item made
                        # nestResult[prop] an ARRAY; _addValue(array,
                        # key, ...) sets a string PROPERTY on it that
                        # JSON.stringify never emits (wave-12 seed
                        # 7390) — the map-packed value silently drops
                        continue
                    # the RAW expanded graph name is the map key — no
                    # compaction/relativization (compact.js:472-475).
                    # GRAPH-map adds consult compactArrays
                    # (compact.js:479-481), unlike plain value maps
                    key = expanded_item.get("@id") or compact_iri(
                        active_ctx, "@none", relative_to_vocab=True)
                    add_value_compact(map_object, key, compacted_item,
                                      "@set" in container
                                      or not compact_arrays)
                elif "@graph" in container and "@index" in container \
                        and is_simple_graph(expanded_item):
                    map_object = nest_result.setdefault(nest_prop, {})
                    if isinstance(map_object, list):
                        # JS parity: a preceding graph-else item made
                        # nestResult[prop] an ARRAY; _addValue(array,
                        # key, ...) sets a string PROPERTY on it that
                        # JSON.stringify never emits (wave-12 seed
                        # 7390) — the map-packed value silently drops
                        continue
                    key = expanded_item.get("@index") or compact_iri(
                        active_ctx, "@none", relative_to_vocab=True)
                    add_value_compact(map_object, key, compacted_item,
                                      "@set" in container
                                      or not compact_arrays)
                elif "@graph" in container and \
                        is_simple_graph(expanded_item):
                    if isinstance(compacted_item, list) and \
                            len(compacted_item) > 1:
                        compacted_item = {"@included": compacted_item}
                    add_value_compact(nest_result, nest_prop,
                                      compacted_item,
                                      "@set" in container
                                      or not compact_arrays)
                else:
                    wrapper = {}
                    alias = compact_iri(active_ctx, "@graph",
                                        relative_to_vocab=True)
                    # inner @graph value singleton-collapses under
                    # compactArrays (named graph in a @graph-container
                    # term compacts as {"@graph": {...}, "@id": ...})
                    if isinstance(compacted_item, list) \
                            and len(compacted_item) == 1 and compact_arrays:
                        compacted_item = compacted_item[0]
                    elif not isinstance(compacted_item, list) \
                            and not compact_arrays:
                        compacted_item = [compacted_item]
                    wrapper[alias] = compacted_item
                    if "@id" in expanded_item:
                        id_alias = compact_iri(active_ctx, "@id",
                                               relative_to_vocab=True)
                        # raw expanded graph name (compact.js:518-520)
                        wrapper[id_alias] = expanded_item["@id"]
                    if "@index" in expanded_item:
                        idx_alias = compact_iri(active_ctx, "@index",
                                                relative_to_vocab=True)
                        wrapper[idx_alias] = expanded_item["@index"]
                    # graph objects use the plain propertyIsArray
                    # rule (compact.js:530-535) — no @graph forcing
                    add_value_compact(nest_result, nest_prop, wrapper,
                                      "@set" in container
                                      or not compact_arrays)
                continue

            # NOTE: no @graph exclusion — the graph-compaction cases
            # above are gated on isGraph (compact.js:460) and this map
            # packing is their else-chain, so a NON-graph item under a
            # @graph+@id/@index container still packs into the map
            # (reachable via foreign-context compaction; fuzz seed
            # 19343)
            if ("@language" in container or "@index" in container
                    or "@id" in container or "@type" in container):
                map_object = nest_result.setdefault(nest_prop, {})
                if compacted_item is None and "@language" not in container:
                    # a null compacted value (a @json literal with a
                    # null payload compacted by a matching @json-typed
                    # term) CRASHES the reference in every map-packing
                    # branch except @language: `delete null[key]` /
                    # property reads on null (compact.js:563,566,587,
                    # 595: 'Cannot convert undefined or null to
                    # object') — mirror as a typed error (fuzz seed
                    # 5382, ops compact/frame/flattenC)
                    raise JsonLdError(
                        "Cannot convert undefined or null to object "
                        "(reference TypeError: null compacted value "
                        "reached index/id/type-map packing)",
                        "TypeError parity")
                if isinstance(map_object, list):
                    # JS parity: a preceding graph-else item made
                    # nestResult[prop] an ARRAY; _addValue(array, key,
                    # ...) sets a string PROPERTY on it that
                    # JSON.stringify never emits (wave-12 seed 7390) —
                    # the map-packed value silently drops (the null
                    # TypeError mirror above still fires first, as the
                    # reference crashes on the null compactedItem
                    # regardless of the map target's type)
                    continue
                if "@language" in container:
                    key = expanded_item.get("@language") if \
                        is_value(expanded_item) else None
                    # the reference simplifies the COMPACTED item when
                    # it has a literal '@value' key (graphTypes.isValue
                    # on compactedItem, compact.js:549-552) — an
                    # ALIASED @value key stays an object, and a kept
                    # object with {@value, @index} simplifies to the
                    # bare @value, dropping the preserved @index
                    # (wave-12 seed 7172)
                    if isinstance(compacted_item, dict) \
                            and "@value" in compacted_item:
                        compacted_item = compacted_item["@value"]
                elif "@index" in container:
                    idx_key = td.get("@index", "@index")
                    if idx_key == "@index":
                        key = expanded_item.get("@index")
                        if isinstance(compacted_item, dict):
                            idx_alias = compact_iri(
                                active_ctx, "@index",
                                relative_to_vocab=True)
                            # the reference ONLY deletes the index key
                            # (compact.js:561-563) — a leftover
                            # {"@id": x} singleton stays an OBJECT,
                            # never collapsing to a bare string
                            compacted_item.pop(idx_alias, None)
                    else:
                        # property-based index: the RAW term-definition
                        # @index value is used as the key into the
                        # compacted item (reference compact.js:566-583 —
                        # so an IRI-form @index that compacts to a term
                        # misses and falls back to @none, quirk included)
                        key = None
                        if isinstance(compacted_item, dict):
                            kv = compacted_item.get(idx_key)
                            kvl = (kv if isinstance(kv, list)
                                   else [] if kv is None else [kv])
                            key = kvl[0] if kvl else None
                            if not isinstance(key, str):
                                key = None  # @none; value left in place
                            else:
                                others = kvl[1:]
                                if not others:
                                    compacted_item.pop(idx_key, None)
                                elif len(others) == 1:
                                    compacted_item[idx_key] = others[0]
                                else:
                                    compacted_item[idx_key] = others
                elif "@id" in container:
                    id_alias = compact_iri(active_ctx, "@id",
                                           relative_to_vocab=True)
                    key = None
                    if isinstance(compacted_item, dict):
                        key = compacted_item.pop(id_alias, None)
                else:  # @type
                    type_alias = compact_iri(active_ctx, "@type",
                                             relative_to_vocab=True)
                    key = None
                    if isinstance(compacted_item, dict):
                        # reference: [key, ...types] =
                        # _asArray(compactedItem[typeKey] || []) — a JS-
                        # FALSY compacted @type (a null from a nulled
                        # type-map key term) becomes [], so key stays
                        # undefined AND the @type key is still deleted
                        # via the case-0 switch arm (compact.js:595-607;
                        # fuzz seed 19397)
                        types = compacted_item.get(type_alias)
                        if isinstance(types, str):
                            types = [types]
                        elif not isinstance(types, list):
                            types = [] if _js_falsy(types) else [types]
                        if types:
                            key = types.pop(0)
                        if len(types) == 1:
                            compacted_item[type_alias] = types[0]
                        elif not types:
                            compacted_item.pop(type_alias, None)
                        else:
                            compacted_item[type_alias] = types
                        # the reference checks ONLY single-entry +
                        # @id-in-expandedItem (compact.js:610-620) —
                        # its comment says "whose key maps to @id" but
                        # the code never inspects the key, so a LIST
                        # object carrying an id-map-injected @id
                        # collapses to its subject reference too
                        # (compactX fuzz seed 9227)
                        if (len(compacted_item) == 1
                                and "@id" in expanded_item):
                            compacted_item = compact(
                                active_ctx, item_active_property,
                                {"@id": expanded_item["@id"]}, options)
                # reference: `if(!key) key = @none` (compact.js:622-625)
                # — JS-FALSY keys ('' / false / 0) fall back to @none in
                # EVERY map branch, and a truthy non-string key becomes
                # a JS object key (string coercion)
                if _js_falsy(key):
                    key = compact_iri(active_ctx, "@none",
                                      relative_to_vocab=True)
                elif not isinstance(key, str):
                    key = _js_property_key(key)
                add_value_compact(map_object, key, compacted_item,
                                  "@set" in container)
            else:
                # reference's isArray also covers a compacted EMPTY
                # array (compact.js:633-634)
                add_value_compact(nest_result, nest_prop, compacted_item,
                                  as_array
                                  or (isinstance(compacted_item, list)
                                      and not compacted_item))

    return result


def _nest_target(active_ctx, item_active_property, result):
    """Resolve @nest redirection (spec §6.1.2 step 12.7)."""
    td = active_ctx.mappings.get(item_active_property) or {}
    nest = td.get("@nest")
    if nest is None:
        return result, item_active_property
    if nest != "@nest":
        nd = active_ctx.mappings.get(nest) or {}
        if nd.get("@id") != "@nest":
            raise JsonLdError("@nest term must map to @nest.",
                              "invalid @nest value")
    nest_obj = result.setdefault(nest, {})
    return nest_obj, item_active_property


def add_value_compact(obj: dict, key: str, value, as_array: bool):
    # array values add ELEMENT-WISE and RECURSIVELY, like the
    # reference's addValue (util.js:263-274) — the array branch runs
    # first regardless of key presence, so nested arrays flatten to
    # any depth and EMPTY arrays at any level vanish (wave-14 seed 11:
    # a @json payload [[], {}, [[]], 1.0] addValue'd into an index map
    # becomes [{}, 1.0]); a single-element array thus collapses to its
    # element when as_array is False
    if isinstance(value, list):
        if len(value) == 0 and as_array and key not in obj:
            obj[key] = []
        for v in value:
            add_value_compact(obj, key, v, as_array)
        return
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            existing = [existing]
            obj[key] = existing
        existing.append(value)
    else:
        if as_array and not isinstance(value, list):
            value = [value]
        obj[key] = value


def compact_document(expanded, ctx, options: dict, from_flatten=False):
    """Top-level compact API (cf. reference jsonld.js:131-248)."""
    from .context import initial_context
    active_ctx = initial_context(options)
    ctx_value = ctx
    if isinstance(ctx, dict) and "@context" in ctx:
        ctx_value = ctx["@context"]
    if ctx_value is not None:
        active_ctx = process_context(active_ctx, ctx_value, options)

    compacted = compact(active_ctx, None, expanded, options)

    # the public `graph` option forces @graph wrapping exactly like the
    # flatten/frame path (cf. reference jsonld.js:196-199)
    from_flatten = from_flatten or bool(options.get("graph"))

    # graph=true semantics (used by flatten/frame): always emit @graph
    if from_flatten and not isinstance(compacted, list):
        # graph-wrap checks _isObject, not truthiness: an empty {}
        # node still wraps as [{}] (jsonld.js:196-199; fuzz seed 848)
        compacted = [compacted] if isinstance(compacted, dict) else []
    if from_flatten:
        alias = compact_iri(active_ctx, "@graph", relative_to_vocab=True)
        compacted = {alias: compacted}
    # top-level array: the empty-/single-element collapse is gated on
    # compactArrays (jsonld.js:190-195); with compactArrays=false even
    # an EMPTY array wraps as {"@graph": []} (fuzz seed 164)
    elif isinstance(compacted, list):
        if options.get("compactArrays", True):
            if len(compacted) == 0:
                compacted = {}
            elif len(compacted) == 1:
                compacted = compacted[0]
        if isinstance(compacted, list):
            alias = compact_iri(active_ctx, "@graph",
                                relative_to_vocab=True)
            compacted = {alias: compacted}
    # output-context assembly (jsonld.js:205-245): arrayify, drop
    # EMPTY OBJECT entries (null/string entries are KEPT), then
    # collapse a single-entry array back to its element — so a
    # wrapper ctx {'@context': [X]} emits X, and [{}] emits nothing
    if ctx_value is not None and isinstance(compacted, dict):
        entries = (ctx_value if isinstance(ctx_value, list)
                   else [ctx_value])
        entries = [e for e in entries
                   if not isinstance(e, dict) or len(e) > 0]
        if entries:
            out_ctx = entries[0] if len(entries) == 1 else entries
            compacted = {"@context": out_ctx, **compacted}
    return compacted
