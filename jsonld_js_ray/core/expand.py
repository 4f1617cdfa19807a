"""JSON-LD 1.1 Expansion.

Implements the Expansion Algorithm and Value Expansion (W3C JSON-LD 1.1
Processing Algorithms and API §5.1–§5.3) from the public spec. Behavioral
parity target: /root/reference/lib/expand.js (:69-385 main walk,
:452-1040 object expansion, :1053-1129 value expansion, :1141-1281
language/index maps). Fresh implementation — per-document pure function
suitable for `map_batches` over Arrow batches.
"""

from __future__ import annotations

from typing import Any, Optional

from .context import (
    ActiveContext, emit_event, expand_iri, process_context,
)
from .errors import JsonLdError
from .keywords import (
    BCP47_RE, is_absolute_iri, is_graph, is_keyword, is_keyword_like,
    is_list, is_scalar, is_value,
)

_FRAME_KEYWORDS = {"@default", "@embed", "@explicit", "@omitDefault",
                   "@requireAll"}


def _drop_unsafe_object(v, options, frame_expansion=False):
    """Reference _dropUnsafeObject (expand.js:396-437): empty objects,
    @value/@list objects, and only-@id objects are unsafe outside
    lists; returns None when dropped (with the reference's per-shape
    event codes), else the value."""
    if not isinstance(v, dict) or frame_expansion:
        return v
    if len(v) == 0:
        emit_event(options, "empty object", "Dropping empty object.")
        return None
    if "@value" in v:
        emit_event(options, "object with only @value",
                   "Dropping object with only @value.")
        return None
    if "@list" in v:
        emit_event(options, "object with only @list",
                   "Dropping object with only @list.")
        return None
    if len(v) == 1 and "@id" in v:
        # keepFreeFloatingNodes gates the CALL SITE (expand.js:372-381),
        # not this check — the graph-wrap filter (expand.js:961-964)
        # drops @id-only items even under keepFreeFloatingNodes
        emit_event(options, "object with only @id",
                   "Dropping object with only @id.")
        return None
    return v


def expand(active_ctx: ActiveContext, active_property: Optional[str],
           element, options: dict, inside_list: bool = False,
           from_map: bool = False) -> Any:
    """Expansion Algorithm (spec §5.1.2)."""
    if element is None:
        return None

    frame_expansion = options.get("isFrame", False)
    if active_property == "@default":
        frame_expansion = False
        options = dict(options)
        options["isFrame"] = False

    term_def = (active_ctx.mappings.get(active_property)
                if active_property else None)
    # presence matters: a stored ``"@context": null`` scoped context must
    # APPLY (nullify, with override_protected) rather than be skipped
    has_property_scoped_ctx = bool(term_def) and "@context" in term_def
    property_scoped_ctx = (term_def.get("@context")
                           if has_property_scoped_ctx else None)

    # --- scalars -----------------------------------------------------------
    if is_scalar(element):
        # scalars INSIDE lists survive even with a null/@graph active
        # property (expand.js:90-110: `!insideList &&` guards the drop)
        if not inside_list and (
                active_property is None
                or active_property == "@graph"
                or expand_iri(active_ctx, active_property,
                              vocab_mode=True,
                              options=options) == "@graph"):
            emit_event(options, "free-floating scalar",
                       "Dropping free-floating scalar during expansion.")
            return None
        # NO property-scoped application here: the reference's scalar
        # path (expand.js:90-115) goes straight to _expandValue — the
        # key loop already expanded this value under the term context
        # (termCtx, expand.js:846-858), so scalars carry the scoped
        # context exactly ONCE while full objects re-apply it at their
        # own expand entry and get it twice (wave-13 seeds 24899/24836)
        return _expand_value(active_ctx, active_property, element, options)

    # --- arrays ------------------------------------------------------------
    if isinstance(element, list):
        rval = []
        container = (term_def or {}).get("@container", [])
        inside_list = inside_list or "@list" in container
        for item in element:
            # from_map survives the array hop (reference propagates
            # insideIndex through array recursion) so an index-map
            # item's type-scoped context is not reverted
            expanded = expand(active_ctx, active_property, item, options,
                              inside_list=False, from_map=from_map)
            if inside_list and isinstance(expanded, list):
                expanded = {"@list": expanded}
            if expanded is None:
                continue
            if isinstance(expanded, list):
                rval.extend(expanded)
            else:
                rval.append(expanded)
        return rval

    if not isinstance(element, dict):
        return None

    # --- maps --------------------------------------------------------------
    # 7) revert type-scoped context unless value of an id/index map entry or
    #    a value object / lone @id reference
    if active_ctx.previous_context is not None and not from_map:
        # reference expand.js:169-196: reversion is the DEFAULT; the
        # value/subject-reference exception only even gets CHECKED for
        # elements with <= 2 keys and no raw '@context' key — a larger
        # node carrying @value still reverts here (its deferred @value
        # validation then runs under the reverted ctx; wave-13 fuzz
        # seed 22713, where the inline @context of a corrupted 5-key
        # node must apply over the REVERTED type-scoped context)
        must_revert = True
        keys_sorted = sorted(element.keys())
        if len(keys_sorted) <= 2 and "@context" not in keys_sorted:
            for k in keys_sorted:
                ek = expand_iri(active_ctx, k, vocab_mode=True,
                                options=options)
                if ek == "@value":
                    must_revert = False
                    break
                if ek == "@id" and len(keys_sorted) == 1:
                    must_revert = False
                    break
        if must_revert:
            active_ctx = active_ctx.previous_context

    # 8) property-scoped context (override protected)
    if has_property_scoped_ctx:
        active_ctx = process_context(
            active_ctx, property_scoped_ctx, options,
            override_protected=True)

    # 9) local @context
    if "@context" in element:
        active_ctx = process_context(active_ctx, element["@context"], options)

    # 10/11) type-scoped contexts
    type_scoped_ctx = active_ctx
    type_key = None
    for key in sorted(element.keys()):
        if expand_iri(type_scoped_ctx, key, vocab_mode=True,
                      options=options) == "@type":
            if type_key is None:
                type_key = key
            values = element[key]
            values = values if isinstance(values, list) else [values]
            for t in sorted(v for v in values if isinstance(v, str)):
                tdef = type_scoped_ctx.mappings.get(t)
                if tdef and "@context" in tdef:
                    active_ctx = process_context(
                        active_ctx, tdef["@context"], options,
                        propagate=False)

    # 12) input type (for @json detection): the reference's isJsonType
    # expands the FIRST member of a @type array, not the last
    # (expand.js:468-475), and gates on JS truthiness of the raw value
    input_type = None
    if type_key is not None:
        tv = element[type_key]
        first = (tv[0] if tv else None) if isinstance(tv, list) else tv
        if first and isinstance(first, str):
            input_type = expand_iri(active_ctx, first, vocab_mode=True,
                                    options=options)

    result: dict[str, Any] = {}
    nests: list[str] = []
    _expand_object(active_ctx, active_property, element, result, nests,
                   options, input_type, type_scoped_ctx, frame_expansion)

    # 14) nests — each entry is (source_object, key) so nested @nest keys
    # resolve against the object that contains them, not the outer element
    while nests:
        nest_src, nest_key = nests.pop(0)
        nested_values = nest_src[nest_key]
        if not isinstance(nested_values, list):
            nested_values = [nested_values]
        for nv in nested_values:
            if not isinstance(nv, dict):
                raise JsonLdError("@nest value must be a node object.",
                                  "invalid @nest value")
            for k in nv.keys():
                if expand_iri(active_ctx, k, vocab_mode=True,
                              options=options) == "@value":
                    raise JsonLdError("@nest value must not be a value "
                                      "object.", "invalid @nest value")
            sub_nests: list[str] = []
            _expand_object(active_ctx, active_property, nv, result,
                           sub_nests, options, input_type, type_scoped_ctx,
                           frame_expansion)
            # note: nested nests handled by appending
            nests.extend(sub_nests)

    # 15+) post-processing
    return _post_process(active_ctx, active_property, element, result,
                         options, frame_expansion, inside_list)


def _post_process(active_ctx, active_property, element, result, options,
                  frame_expansion, inside_list):
    keys = set(result.keys())

    if "@value" in result:
        allowed = {"@value", "@language", "@direction", "@type", "@index"}
        if not keys <= allowed:
            raise JsonLdError(
                "value object has disallowed entries: "
                f"{sorted(keys - allowed)}", "invalid value object")
        if "@language" in result and "@type" in result and \
                result.get("@type") != "@json":
            raise JsonLdError(
                "value object must not have both @type and @language.",
                "invalid value object")
        value = result["@value"]
        if result.get("@type") == "@json":
            pass  # any JSON value is fine
        elif value is None or (isinstance(value, list) and not value):
            emit_event(options, "null @value value",
                       "Dropping null @value object.")
            return None
        elif "@language" in result and not all(
                isinstance(v, str) or (isinstance(v, dict) and not v)
                for v in (value if isinstance(value, list) else [value])):
            # only strings (or frame {} wildcards — the sole reason an
            # object can appear here) may be language-tagged
            # (expand.js:318-325: `isString(v) || isEmptyObject(v)` with
            # NO isFrame exemption; frameC fuzz seed 3540)
            raise JsonLdError(
                "@language used on a non-string @value.",
                "invalid language-tagged value")
        elif "@type" in result and result["@type"] != "@json":
            # one clause for BOTH modes (expand.js:326-333): every type
            # is an absolute non-blank-node IRI or a {} wildcard —
            # bnode @types in value patterns are invalid even in frame
            # mode (frameC fuzz seed 6346)
            t = result["@type"]
            ts = t if isinstance(t, list) else [t]
            ok = all((isinstance(x, str) and is_absolute_iri(x)
                      and not x.startswith("_:"))
                     or (isinstance(x, dict) and not x)
                     for x in ts)
            if not ok:
                raise JsonLdError("invalid @type in value object.",
                                  "invalid typed value")
        return_val = result
    elif "@type" in result and not isinstance(result["@type"], list):
        result["@type"] = [result["@type"]]
        return_val = result
    elif "@set" in result or "@list" in result:
        # reference rule is a pure COUNT check (expand.js:337-345):
        # at most one other property, and it must be @index — so
        # {"@set": ..., "@list": ...} is invalid even though both keys
        # are set/list keys (corrupt fuzz seeds 1949/2627/6099)
        if len(keys) > 1 and not (len(keys) == 2 and "@index" in keys):
            raise JsonLdError(
                "set/list object has disallowed entries.",
                "invalid set or list object")
        if "@set" in result:
            set_val = result["@set"]
            if "@index" in result and len(keys) > 1:
                # @set plus @index: keep as object minus @set promotion only
                # when no other entries; the spec promotes @set regardless
                pass
            return set_val
        return_val = result
    else:
        return_val = result

    if isinstance(return_val, dict):
        if (len(return_val) == 1 and "@language" in return_val):
            emit_event(options, "object with only @language",
                       "Dropping object with only @language.")
            return None
        # the drop applies at top level, under @graph (including via an
        # alias), AND under a term whose @container includes @graph —
        # graph-container map values that reduce to unsafe objects drop
        # (cf. reference expand.js:372-379)
        _ap_container = []
        if active_property is not None:
            _ap_container = (active_ctx.mappings.get(active_property)
                             or {}).get("@container") or []
        # the whole check is additionally gated on NOT being inside a
        # list and on keepFreeFloatingNodes being unset
        # (expand.js:372-381): a @value/@list item INSIDE a list under
        # a @graph-container property survives this site — the
        # graph-wrap filter is the one that drops the outer list object
        # (fuzz seed 9643: one 'object with only @list' event, not an
        # inner 'only @value' + 'empty object' pair)
        if (not inside_list
                and not options.get("keepFreeFloatingNodes")
                and (active_property is None or active_property == "@graph"
                     or expand_iri(active_ctx, active_property,
                                   vocab_mode=True,
                                   options=options) == "@graph"
                     or "@graph" in _ap_container)):
            if not frame_expansion:
                return _drop_unsafe_object(return_val, options)
    return return_val


def _expand_object(active_ctx, active_property, element, result, nests,
                   options, input_type, type_scoped_ctx, frame_expansion):
    """Inner key loop of the Expansion Algorithm (spec §5.1.2 step 13;
    cf. reference _expandObject expand.js:452-1040)."""
    unexpanded_value = None  # raw @value, for the deferred shape check
    for key in sorted(element.keys()):
        if key == "@context":
            continue
        value = element[key]
        expanded_property = expand_iri(active_ctx, key, vocab_mode=True,
                                       options=options)
        if expanded_property is None or not (
                is_absolute_iri(expanded_property)
                or is_keyword(expanded_property)):
            # scheme-validated absoluteness, not just "contains a colon"
            # (expand.js:488-490 via url.js isAbsolute): '@foo:suffix'
            # from an undefined keyword-like prefix must drop
            emit_event(options, "invalid property",
                       f"Dropping property {key!r} that expands to "
                       f"{expanded_property!r}.")
            continue

        if is_keyword(expanded_property):
            if active_property == "@reverse":
                raise JsonLdError(
                    "Keywords cannot be used in a reverse property map.",
                    "invalid reverse property map")
            if (expanded_property in result
                    and expanded_property not in ("@included", "@type")):
                raise JsonLdError(
                    f"Colliding keyword {expanded_property!r}.",
                    "colliding keywords")

        # ---- keyword handling -------------------------------------------
        if expanded_property == "@id":
            if isinstance(value, str):
                if is_keyword_like(value) and not is_keyword(value):
                    # reference keeps the null expansion in the output
                    # ("@id": null — expand.js:558-594 maps ve straight
                    # into _addValue); spec edge case w3c/json-ld-api#480
                    emit_event(options, "reserved @id value",
                               f"@id value {value!r} is reserved.")
                    result["@id"] = None
                    continue
                expanded = expand_iri(active_ctx, value, base_mode=True,
                                      options=options)
                if (expanded is not None and not is_absolute_iri(expanded)
                        and not expanded.startswith("_:")):
                    # NO isFrame gate (expand.js:595-608): a relative
                    # frame @id pattern emits the event too — under
                    # safe mode it errors BEFORE _validateFrame gets to
                    # reject the pattern (fuzz seed 9394)
                    emit_event(options, "relative @id reference",
                               f"Relative @id reference: {expanded!r}")
                # frame mode: the explicit @id KEY expands to an ARRAY
                # (expand.js:552-560, propertyIsArray: options.isFrame)
                # — downstream @id matching is exact membership for
                # arrays, substring for the strings id-map containers
                # synthesize
                result["@id"] = [expanded] if frame_expansion \
                    else expanded
            elif frame_expansion and isinstance(value, dict) and not value:
                result["@id"] = [value]
            elif frame_expansion and isinstance(value, list):
                ids = []
                for v in value:
                    if not isinstance(v, str):
                        raise JsonLdError("@id must be a string (frame).",
                                          "invalid @id value")
                    ve = expand_iri(active_ctx, v, base_mode=True,
                                    options=options)
                    # same per-item event logic as the scalar branch
                    # (the reference maps _asArray(value) uniformly,
                    # expand.js:558-614)
                    if is_keyword_like(v) and not is_keyword(v):
                        emit_event(options, "reserved @id value",
                                   f"@id value {v!r} is reserved.")
                        ve = None
                    elif (ve is not None and not is_absolute_iri(ve)
                          and not ve.startswith("_:")):
                        emit_event(options, "relative @id reference",
                                   f"Relative @id reference: {ve!r}")
                    ids.append(ve)
                result["@id"] = ids
            else:
                raise JsonLdError("@id value must be a string.",
                                  "invalid @id value")
            continue

        if expanded_property == "@type":
            _expand_type(type_scoped_ctx, value, result, options,
                         frame_expansion)
            continue

        if expanded_property == "@graph":
            if not isinstance(value, (dict, list)):
                raise JsonLdError("@graph value must be an object or array.",
                                  "invalid @graph value")
            ev = expand(active_ctx, "@graph", value, options)
            if not isinstance(ev, list):
                ev = [ev] if ev is not None else []
            result["@graph"] = ev
            continue

        if expanded_property == "@included":
            if active_ctx.processing_mode == "json-ld-1.0":
                # 1.0 mode: NOT rejected and NOT dropped — the 1.1 guard
                # (expand.js:666) just fails, so @included falls through
                # to the generic property path: value expands normally
                # with no node-object validation
                inc = expand(active_ctx, key, value, options)
                if inc is None:
                    continue
                if not isinstance(inc, list):
                    inc = [inc]
                result.setdefault("@included", []).extend(inc)
                continue
            # expand with the CURRENT active property (reference
            # expand.js:666-672) — with activeProperty None a scalar
            # would be dropped as free-floating instead of failing the
            # node-object validation below
            inc = expand(active_ctx, active_property, value, options)
            if not isinstance(inc, list):
                # a dropped (None) result must STAY in the array so the
                # node-object validation below rejects it — the reference
                # wraps the raw expand result (expand.js:667-680), so a
                # free-floating @value dropped to null fails _isSubject
                inc = [inc]
            for node in inc:
                # exact _isSubject test (reference graphTypes.js:18-29):
                # an object that is not @value/@list/@set and has more
                # than one key or no @id (a bare node reference fails)
                if (not isinstance(node, dict) or "@value" in node
                        or "@list" in node or "@set" in node
                        or (len(node) == 1 and "@id" in node)):
                    raise JsonLdError(
                        "@included values must be node objects.",
                        "invalid @included value")
            if "@included" in result:
                result["@included"].extend(inc)
            else:
                result["@included"] = inc
            continue

        if expanded_property == "@value":
            # capture the RAW value; shape validation is DEFERRED to
            # the end of the key loop (expand.js:695-709 just stores,
            # expand.js:1002-1014 validates) so a later key — e.g. a
            # reverse property with a bad item — throws FIRST with its
            # own code (fuzz seed 808). In 1.0 mode @type:@json is not
            # special: the stored '@json' fails the absolute-IRI test
            # later as 'invalid typed value' (expand.js:326-333)
            unexpanded_value = value
            if (input_type == "@json"
                    and active_ctx.processing_mode != "json-ld-1.0"):
                # no array coercion, retain all values
                result["@value"] = value
            else:
                _add_value_js(result, "@value", value,
                              property_is_array=frame_expansion)
            continue

        if expanded_property == "@language":
            if value is None:
                # null @language drops as if absent (expand.js:713-716)
                continue
            if not isinstance(value, str) and not frame_expansion:
                raise JsonLdError("@language value must be a string.",
                                  "invalid language-tagged string")
            # frame mode admits ANY shape: arrays, wildcard dicts, even
            # numbers (expand.js:717-748 gates the throw on !isFrame and
            # lowercases/validates only the string items)
            vs = value if isinstance(value, list) else [value]
            vs = [v.lower() if isinstance(v, str) else v for v in vs]
            for v in vs:
                if isinstance(v, str) and not BCP47_RE.match(v):
                    emit_event(options, "invalid @language value",
                               f"@language value {v!r} is not "
                               "well-formed BCP47.")
            # addValue propertyIsArray=isFrame (expand.js:746-747)
            result["@language"] = vs if frame_expansion else vs[0]
            continue

        if expanded_property == "@direction":
            if not isinstance(value, str) and not frame_expansion:
                raise JsonLdError('@direction must be "ltr" or "rtl".',
                                  "invalid base direction")
            vs = value if isinstance(value, list) else [value]
            for v in vs:
                # string items must be ltr/rtl in BOTH modes; frame
                # mode passes non-strings through (expand.js:755-775)
                if isinstance(v, str) and v not in ("ltr", "rtl"):
                    raise JsonLdError(
                        '@direction must be "ltr" or "rtl".',
                        "invalid base direction")
            result["@direction"] = vs if frame_expansion else vs[0]
            continue

        if expanded_property == "@index":
            if not isinstance(value, str):
                raise JsonLdError("@index value must be a string.",
                                  "invalid @index value")
            result["@index"] = value
            continue

        if expanded_property == "@reverse":
            if not isinstance(value, dict):
                raise JsonLdError("@reverse value must be an object.",
                                  "invalid @reverse value")
            expanded = expand(active_ctx, "@reverse", value, options)
            if isinstance(expanded, dict) and "@reverse" in expanded:
                for prop, items in expanded["@reverse"].items():
                    result.setdefault(prop, []).extend(items)
            if isinstance(expanded, dict):
                # create the reverse map LAZILY: a map whose entries all
                # flipped back to forward properties (reverse term inside
                # @reverse) must not leave an empty "@reverse": {} behind
                # (cf. reference expand.js reverse handling)
                reverse_map = None
                for prop, items in expanded.items():
                    if prop == "@reverse":
                        continue
                    if reverse_map is None:
                        reverse_map = result.setdefault("@reverse", {})
                    for item in items:
                        if is_value(item) or is_list(item):
                            raise JsonLdError(
                                "Reverse value must be a node object.",
                                "invalid reverse property value")
                        reverse_map.setdefault(prop, []).append(item)
            continue

        if expanded_property == "@nest":
            nests.append((element, key))
            continue

        if expanded_property == "@list":
            # no early drop: items expand first (scalars under a
            # top-level/graph-level @list emit their own free-floating
            # events), and the resulting {"@list": []} object is
            # dropped by the top-level unsafe filter with code
            # 'object with only @list' (expand.js:906-916 + :396-437)
            next_ap = active_property
            if active_property == "@graph" or (
                    active_property is not None
                    and expand_iri(active_ctx, active_property,
                                   vocab_mode=True,
                                   options=options) == "@graph"):
                next_ap = None
            ev = expand(active_ctx, next_ap, value, options,
                        inside_list=True)
            if ev is None:
                # a null expansion (e.g. a free-floating scalar under
                # a top-level @list) DROPS the whole entry before the
                # set/list-object validation (expand.js:936-942) —
                # the result never carries the @list key
                continue
            if not isinstance(ev, list):
                ev = [ev]
            result["@list"] = ev
            continue

        if expanded_property == "@set":
            ev = expand(active_ctx, active_property, value, options)
            if ev is None:
                # a null expansion drops the KEY only (expand.js:936-
                # 942): {"@set": null} leaves an empty {} node object
                # that survives expansion (fuzz seed 152)
                continue
            result["@set"] = ev if isinstance(ev, list) else [ev]
            continue

        if frame_expansion and expanded_property in _FRAME_KEYWORDS:
            ev = expand(active_ctx, expanded_property, value, options)
            if expanded_property != "@default":
                # keep raw scalars for frame flags
                ev = value
            result[expanded_property] = ev if isinstance(ev, list) else [ev]
            continue

        # an unhandled keyword (@none, @preserve, frame keywords outside
        # frame mode, context-only keywords used as node keys) FALLS
        # THROUGH to the generic property path and is kept as a property
        # under its keyword name — the reference's keyword dispatch has
        # no default case and its key loop ends in _addValue(parent,
        # expandedProperty, ..., propertyIsArray: true)
        # (expand.js:510-524 guard, 996-1000 generic add; scalar values
        # survive VERBATIM via the keyword check in expand.js:1101-1102)

        # ---- regular property -------------------------------------------
        term_def = active_ctx.mappings.get(key) or {}
        container = term_def.get("@container", [])

        # EVERY value expands under the key's TERM context
        # (expand.js:846-858 computes termCtx unconditionally and
        # passes it to all branches): a full object value then
        # RE-applies the property-scoped context at its own expand
        # entry (expand.js:202-209) — legitimately twice, so a
        # relative scoped @base chains over itself — while a scalar
        # value gets it exactly once, here (wave-13 seed 24836)
        term_ctx = active_ctx
        if "@context" in term_def:
            term_ctx = process_context(
                active_ctx, term_def["@context"], options,
                override_protected=True)
        term_def_scoped = term_ctx.mappings.get(key) or {}

        if "@language" in container and isinstance(value, dict):
            expanded_value = _expand_language_map(term_ctx, key, value,
                                                  term_def_scoped, options)
        elif (isinstance(value, dict)
              and any(c in container for c in ("@index", "@type", "@id"))):
            # container maps take precedence over @json coercion
            # (expand.js:860-918: the @json branch is the FALLBACK else;
            # an index map under a @json term expands per entry, with
            # @json applying to each scalar entry value). The @index
            # term name is read off the TERM context (expand.js:868)
            # while propertyIndex expands under the OUTER one
            expanded_value = _expand_index_map(
                term_ctx, key, value, term_def_scoped, container, options,
                outer_ctx=active_ctx)
        elif term_def.get("@type") == "@json":
            # the @json gate reads the OUTER context (expand.js:919)
            expanded_value = {"@value": value, "@type": "@json"}
        else:
            is_list_container = "@list" in container
            if is_list_container and (active_property == "@graph"
                                      or active_property is None):
                is_list_container = False
            expanded_value = expand(term_ctx, key, value, options,
                                    inside_list=is_list_container)

        if expanded_value is None and expanded_property != "@value":
            continue

        # wrap in list object if needed
        if "@list" in container and not is_list(expanded_value):
            if not isinstance(expanded_value, list):
                expanded_value = [expanded_value]
            expanded_value = {"@list": expanded_value}

        # graph container wrapping (simple @graph container only):
        # unsafe items (scalars-turned-values, empty, only-@id) drop
        # BEFORE wrapping, and an all-dropped property is skipped
        # entirely (expand.js:955-971)
        if ("@graph" in container and "@id" not in container
                and "@index" not in container):
            ev = expanded_value if isinstance(expanded_value, list) \
                else [expanded_value]
            if not frame_expansion:
                ev = [v for v in ev
                      if _drop_unsafe_object(v, options) is not None]
            if not ev:
                continue
            # UNCONDITIONAL wrap (expand.js:971 maps every item into a
            # fresh {"@graph": [...]}, its "if not itself a graph"
            # comment notwithstanding) — a value that already looks
            # like a graph object gets double-wrapped (fuzz seed 900)
            expanded_value = [
                {"@graph": v if isinstance(v, list) else [v]}
                for v in ev]

        if term_def.get("reverse"):
            reverse_map = result.setdefault("@reverse", {})
            ev = expanded_value if isinstance(expanded_value, list) \
                else [expanded_value]
            for item in ev:
                if is_value(item) or is_list(item):
                    raise JsonLdError(
                        "Reverse property value must be a node object.",
                        "invalid reverse property value")
                reverse_map.setdefault(expanded_property, []).append(item)
        else:
            ev = expanded_value if isinstance(expanded_value, list) \
                else [expanded_value]
            result.setdefault(expanded_property, []).extend(ev)

    # deferred @value shape check (expand.js:1002-1014): runs AFTER the
    # whole key loop; any value is allowed under 1.1 @type:@json (the
    # stored @type is a SCALAR '@json' per addValue collapse), frames
    # allow objects/arrays
    if "@value" in result:
        if (result.get("@type") == "@json"
                and active_ctx.processing_mode != "json-ld-1.0"):
            pass
        elif (isinstance(unexpanded_value, (dict, list))
              and not frame_expansion):
            raise JsonLdError(
                '"@value" value must not be an object or an array.',
                "invalid value object value")


def _add_value_js(subject: dict, prop: str, value,
                  property_is_array: bool = False):
    """util.js addValue with allowDuplicate=true defaults
    (util.js:246-298): arrays add element-wise (an empty array under
    propertyIsArray pins []), an existing entry converts to an array
    and appends, a fresh scalar stores bare unless propertyIsArray."""
    if isinstance(value, list):
        if not value and property_is_array and prop not in subject:
            subject[prop] = []
        for v in value:
            _add_value_js(subject, prop, v, property_is_array)
    elif prop in subject:
        if not isinstance(subject[prop], list):
            subject[prop] = [subject[prop]]
        subject[prop].append(value)
    else:
        subject[prop] = [value] if property_is_array else value


def _expand_type(type_scoped_ctx, value, result, options, frame_expansion):
    # frame-mode default objects transform FIRST (expand.js:622-630):
    # keys vocab-expand, values base+vocab-expand, arrays preserved —
    # {"@default": "T"} becomes {"@default": ["<expanded T>"]} and is
    # stored as-is
    if frame_expansion and isinstance(value, dict) and value:
        def _exp(v, *, vocab_only=False):
            if not isinstance(v, str):
                return v
            return expand_iri(type_scoped_ctx, v,
                              base_mode=not vocab_only, vocab_mode=True,
                              options=options)
        value = {
            _exp(k, vocab_only=True):
                [_exp(vv) for vv in (v if isinstance(v, list) else [v])]
            for k, v in value.items()}
    # validateTypeValue (util.js:154-181) gates the WHOLE value before
    # any per-item expansion: a string, an array of ALL strings, or —
    # frame mode only — an empty object / a {"@default": strings}
    # object. A mixed array like [{}, "urn:t"] is invalid even in
    # frame mode (frameC fuzz seed 249).
    valid = (isinstance(value, str)
             or (isinstance(value, list)
                 and all(isinstance(v, str) for v in value)))
    if not valid and frame_expansion and isinstance(value, dict):
        if len(value) == 0:
            valid = True
        elif len(value) == 1 and "@default" in value:
            dv = value["@default"]
            dv = dv if isinstance(dv, list) else [dv]
            valid = all(isinstance(v, str) for v in dv)
    if not valid:
        raise JsonLdError(
            '"@type" value must be a string, an array of strings, an '
            "empty object, or a default object.", "invalid type value")

    def one(v):
        if isinstance(v, str):
            expanded = expand_iri(type_scoped_ctx, v, base_mode=True,
                                  vocab_mode=True, options=options)
            # exactly expand.js:639: '@json' is exempt, blank nodes
            # count as absolute via the reference's isAbsolute regex,
            # and a null expansion DOES emit the event
            if expanded != "@json" and not is_absolute_iri(expanded):
                emit_event(options, "relative @type reference",
                           f"Relative @type reference: {expanded!r}")
            return expanded
        if frame_expansion and isinstance(v, dict) and not v:
            return v
        raise JsonLdError("@type value must be a string.",
                          "invalid type value")

    # addValue with propertyIsArray=isFrame (expand.js:632-658,
    # util.js:261-282). The scalar/array distinction is live
    # downstream: the post-process @type-arrayification branch preempts
    # the set/list-object validation only for non-array @type
    # (expand.js:334-336 vs :337-345; corrupt fuzz seed 149).
    if frame_expansion:
        # frame mode: @type is ALWAYS stored as an array, even a
        # singleton/empty — so a frame @type beside an @list key DOES
        # reach the set/list validation (frameC fuzz seed 571)
        if isinstance(value, list):
            expanded = [e for e in (one(v) for v in value)
                        if e is not None]
        elif isinstance(value, dict):
            expanded = [value]
        else:
            e = one(value)
            expanded = [] if e is None else [e]
    elif isinstance(value, list):
        # non-frame: a ONE-element array collapses to the scalar and
        # an EMPTY array stores nothing
        items = [e for e in (one(v) for v in value) if e is not None]
        if not items:
            return
        expanded = items[0] if len(items) == 1 else items
    else:
        expanded = one(value)
        if expanded is None:
            return
    existing = result.get("@type")
    if existing is not None:
        existing = existing if isinstance(existing, list) else [existing]
        new = expanded if isinstance(expanded, list) else [expanded]
        result["@type"] = existing + new
    else:
        result["@type"] = expanded


def _expand_language_map(active_ctx, key, value, term_def, options):
    """Language map expansion (spec §5.1.2 step 13.7;
    cf. reference expand.js:1141-1188)."""
    rval = []
    # direction comes from the TERM context (expand.js:861-862 passes
    # getContextValue(termCtx, ...)): when the term carries a scoped
    # context, processing it goes through the reference's
    # direction-dropping clone, so the DEFAULT direction never reaches
    # language-map entries of scoped terms
    term_ctx = active_ctx
    if "@context" in term_def:
        term_ctx = process_context(active_ctx, term_def["@context"],
                                   options, override_protected=True)
    direction = (term_def.get("@direction")
                 if term_def.get("_has_direction")
                 else term_ctx.default_direction)
    for lang in sorted(value.keys()):
        items = value[lang]
        if not isinstance(items, list):
            items = [items]
        # key expands under the TERM context (expand.js:864 passes
        # termCtx into _expandLanguageMap); ONLY an expansion of
        # exactly '@none' suppresses @language — a NULLED term key
        # expands to null, which is !== '@none' in the reference, so
        # its @language is KEPT (16-op campaign seed 24211)
        exp_lang = expand_iri(term_ctx, lang, vocab_mode=True,
                              options=options)
        for item in items:
            if item is None:
                continue
            if not isinstance(item, str):
                raise JsonLdError(
                    "Language map values must be strings.",
                    "invalid language map value")
            v = {"@value": item}
            if exp_lang != "@none":
                # the BCP47 event fires PER ITEM, inside the loop
                # (expand.js:1163-1180) — a key whose value array is
                # EMPTY emits nothing (link fuzz seed 4859: {"@list":
                # []} under a @language container is silently empty
                # even in safe mode)
                if isinstance(lang, str) and not BCP47_RE.match(lang):
                    emit_event(options, "invalid @language value",
                               f"Language map key {lang!r} is not "
                               "well-formed BCP47.")
                v["@language"] = lang.lower()
            if direction is not None:
                v["@direction"] = direction
            rval.append(v)
    return rval


def _expand_index_map(active_ctx, key, value, term_def, container, options,
                      outer_ctx=None):
    """Index/id/type map expansion (spec §5.1.2 step 13.8;
    cf. reference expand.js:1190-1281)."""
    rval = []
    as_graph = "@graph" in container
    index_key = term_def.get("@index", "@index")
    # propertyIndex expands under the OUTER active context, not the
    # term context (expand.js:868-870), and is used through JS
    # truthiness: a nulled/unmappable index term gives propertyIndex
    # null, so the injection arm is SKIPPED and the raw
    # `item[indexKey] = key` fallback applies (expand.js:1263-1273;
    # wave-11 fuzz seed 3551)
    property_index = None
    if index_key != "@index":
        property_index = expand_iri(outer_ctx or active_ctx, index_key,
                                    vocab_mode=True, options=options)
    if ("@type" in container and "@index" not in container
            and "@id" not in container
            and active_ctx.previous_context is not None):
        # type maps expand under the REVERTED term context
        # (expand.js:896-906: activeCtx: termCtx.revertToPreviousContext()
        # — the revert CLONES, dropping @direction like every clone)
        active_ctx = active_ctx.previous_context.clone()
    for idx in sorted(value.keys()):
        items = value[idx]
        if "@type" in container:
            # a type-map key's scoped context is processed INTO the
            # loop's active context (expand.js:1198-1207 REASSIGNS
            # activeCtx) — it accumulates for every later sorted key
            # and its values, not just this entry (wave-13 seed 2386:
            # a scoped @vocab from key "alpha" re-vocabs key "id")
            idx_def = active_ctx.mappings.get(idx)
            if idx_def and "@context" in idx_def:
                active_ctx = process_context(active_ctx,
                                             idx_def["@context"],
                                             options, propagate=False)
        if not isinstance(items, list):
            items = [items]
        expanded_items = expand(active_ctx, key, items, options,
                                from_map=True)
        expanded_idx = expand_iri(active_ctx, idx, vocab_mode=True,
                                  options=options)
        for item in expanded_items:
            if as_graph and not is_graph(item):
                item = {"@graph": [item]}
            if "@index" in container:
                if index_key != "@index":
                    # property-based indexing: a VALUE item is an
                    # immediate error — the reference's isValue check
                    # (expand.js:1248-1254) runs before the property
                    # injection, is not exempt for property indexes,
                    # and fires even under "@none" keys (fuzz seed 153)
                    if is_value(item):
                        raise JsonLdError(
                            "Attempt to add illegal key to value "
                            f'object: "{index_key}".',
                            "invalid value object")
                    if property_index:
                        # @none-ness is the LITERAL key here, not a
                        # vocab expansion (expand.js:1226-1233:
                        # expandedKey is '@none' only when the raw key
                        # is '@none')
                        if idx != "@none":
                            # re-expand idx as a VALUE of index_key
                            # (the raw term: its own @type/@language
                            # coercions apply) and PREPEND it
                            idx_val = _expand_value(
                                active_ctx, index_key, idx, options)
                            item.setdefault(property_index, [])
                            item[property_index] = \
                                [idx_val] + item[property_index]
                    elif expanded_idx != "@none" \
                            and index_key not in item:
                        # falsy propertyIndex (nulled index term): the
                        # reference's `else if` chain falls through to
                        # the verbatim `item[indexKey] = key` arm —
                        # RAW key string under the RAW index-term key
                        # (expand.js:1270-1272)
                        item[index_key] = idx
                elif expanded_idx != "@none" and "@index" not in item:
                    # value objects get @index too (reference
                    # expand.js:1274-1276 has no isValue guard;
                    # @index is legal on value objects)
                    item["@index"] = idx
            elif "@id" in container:
                if is_value(item):
                    # value objects cannot take an @id from the map key
                    # (expand.js:1248-1254 — thrown even for @none keys)
                    raise JsonLdError(
                        'Attempt to add illegal key to value object: '
                        '"@id".', "invalid value object")
                if expanded_idx != "@none" and "@id" not in item:
                    item["@id"] = expand_iri(active_ctx, idx,
                                             base_mode=True, options=options)
            elif "@type" in container:
                if expanded_idx != "@none":
                    types = item.get("@type", [])
                    types = types if isinstance(types, list) else [types]
                    item["@type"] = [expanded_idx] + types
            rval.append(item)
    return rval


def _expand_value(active_ctx, active_property, value, options):
    """Value Expansion (spec §5.3.2; cf. reference expand.js:1053-1129)."""
    if value is None:
        return None
    # the property drives dispatch through its EXPANDED form
    # (expand.js:1060-1061): a term aliased to a keyword behaves as
    # that keyword here
    expanded_ap = expand_iri(active_ctx, active_property, vocab_mode=True,
                             options=options)
    if expanded_ap == "@id":
        return expand_iri(active_ctx, value, base_mode=True, options=options)
    if expanded_ap == "@type":
        return expand_iri(active_ctx, value, base_mode=True, vocab_mode=True,
                          options=options)
    term_def = active_ctx.mappings.get(active_property) or {}
    type_mapping = term_def.get("@type")
    # @id expansion is AUTOMATIC for string values under @graph
    # (expand.js:1073): a scalar graph entry becomes a node reference
    if ((type_mapping == "@id" or expanded_ap == "@graph")
            and isinstance(value, str)):
        ev = expand_iri(active_ctx, value, base_mode=True, options=options)
        if ev is None and is_keyword_like(value):
            # spec edge case w3c/json-ld-api#480
            # (cf. reference expand.js:1073-1091)
            emit_event(options, "reserved @id value",
                       f"@id value {value!r} is reserved.")
        return {"@id": ev}
    if type_mapping == "@vocab" and isinstance(value, str):
        return {"@id": expand_iri(active_ctx, value, base_mode=True,
                                  vocab_mode=True, options=options)}
    if is_keyword(expanded_ap):
        return value
    rval = {"@value": value}
    if type_mapping not in (None, "@id", "@vocab", "@none"):
        rval["@type"] = type_mapping
    elif isinstance(value, str):
        if term_def.get("_has_language"):
            language = term_def.get("@language")
        else:
            language = active_ctx.default_language
        if term_def.get("_has_direction"):
            direction = term_def.get("@direction")
        else:
            direction = active_ctx.default_direction
        if language is not None:
            rval["@language"] = language
        if direction is not None:
            rval["@direction"] = direction
    return rval


def expand_document(document, options: dict) -> list:
    """Top-level expand API (cf. reference jsonld.js:265-343).

    Returns the expanded form as a list.
    """
    from .context import initial_context
    options = dict(options)
    # the omitted-base default is the EMPTY base (empty-base
    # resolution), matching the reference's '' defaults — not None,
    # which models a user's explicit base: null
    options.setdefault("base", "")
    remote_context_url = None
    if isinstance(document, str):
        # remote-document input (jsonld.js:295-314): dereference via
        # the loader; the retrieved documentUrl becomes the default
        # base (redirect-sensitive) UNLESS base was already pinned, and
        # a Link-header contextUrl is processed as a context AFTER
        # expandContext and BEFORE the document
        from .resolver import load_remote_document
        remote = load_remote_document(document, options)
        if not options.get("_base_set"):
            options["base"] = remote["documentUrl"] or ""
        remote_context_url = remote["contextUrl"]
        document = remote["document"]
    active_ctx = initial_context(options)
    if options.get("expandContext") is not None:
        ec = options["expandContext"]
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        active_ctx = process_context(active_ctx, ec, options)
    if remote_context_url is not None:
        active_ctx = process_context(active_ctx, remote_context_url,
                                     options)
    expanded = expand(active_ctx, None, document, options)
    # post: unwrap lone @graph, normalize to array
    if isinstance(expanded, dict) and "@graph" in expanded \
            and len(expanded) == 1:
        expanded = expanded["@graph"]
    if expanded is None:
        expanded = []
    if not isinstance(expanded, list):
        expanded = [expanded]
    return expanded
