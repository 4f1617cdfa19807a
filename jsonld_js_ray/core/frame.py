"""JSON-LD 1.1 Framing.

Implements the Framing Algorithm from the public W3C JSON-LD 1.1 Framing
spec (§3: frame matching, value matching, embed control @once/@always/
@never, @explicit, @requireAll, @default fill-in, @preserve cleanup,
blank-node pruning). Behavioral parity target: /root/reference/lib/frame.js
(:29-65 state, :76-323 recursion, :489-637/:771-826 matching,
:333-367/:694-746 cleanup). Framing is per-document / per-group work in
the Ray pipeline (SURVEY.md §7.4) — it is never distributed internally."""

from __future__ import annotations

import copy
from typing import Any

from .compact import _js_property_key, compact_document
from .context import expand_iri, initial_context, process_context
from .errors import JsonLdError
from .expand import expand_document
from .keywords import is_absolute_iri, is_keyword, is_list, is_value
from .node_map import (IdentifierIssuer, create_node_map,
                       merge_node_map_graphs)


def frame_document(document, frame_doc, options: dict):
    """Top-level frame API (cf. reference jsonld.js:414-495)."""
    options = dict(options)
    options.setdefault("embed", "@once")
    options.setdefault("explicit", False)
    options.setdefault("requireAll", False)
    options.setdefault("omitDefault", False)
    frame_ctx = frame_doc.get("@context", {}) if isinstance(frame_doc, dict)\
        else {}
    # mode-specific defaults derive from the PROCESSED frame context,
    # not the raw option (jsonld.js:455-464: _processingMode(activeCtx,
    # 1.1) after processContext) — a null reset inside the frame's
    # context array unpins an explicit json-ld-1.0 option
    _mode_ctx = process_context(initial_context(options), frame_ctx,
                                options)
    is11 = _mode_ctx.processing_mode != "json-ld-1.0"
    options.setdefault("pruneBlankNodeIdentifiers", is11)
    options.setdefault("omitGraph", is11)

    expanded = expand_document(document, options)
    frame_opts = dict(options)
    frame_opts["isFrame"] = True
    expanded_frame = expand_document(frame_doc, frame_opts)

    # if the unexpanded frame includes a key expanding to @graph, frame
    # the default graph, otherwise the merged graph
    # (cf. reference jsonld.js:474-479)
    active_ctx = _mode_ctx
    frame_keys = [expand_iri(active_ctx, k, vocab_mode=True)
                  for k in (frame_doc.keys()
                            if isinstance(frame_doc, dict) else [])]
    merged = "@graph" not in frame_keys

    issuer = IdentifierIssuer("_:b")
    graph_map: dict[str, Any] = {"@default": {}}
    create_node_map(expanded, graph_map, "@default", issuer)
    if merged:
        graph_map["@merged"] = merge_node_map_graphs(graph_map)

    state = {
        "options": options,
        "graph": "@merged" if merged else "@default",
        "graphMap": graph_map,
        "subjectStack": [],
        "link": {},
        "bnodeMap": {},
    }
    # node-pattern matching resolves against the INITIAL graph's
    # subject map even inside named-graph recursion (frame.js:50)
    state["subjects"] = graph_map[state["graph"]]

    # frame validation runs AFTER node-map construction: the reference
    # validates inside api.frame (frame.js:77-78), which
    # frameMergedOrDefault only reaches once _createNodeMap succeeded —
    # a 'conflicting indexes' document preempts an invalid frame
    # (fuzz seed 4954)
    if len(expanded_frame) != 1:
        raise JsonLdError(
            "Invalid JSON-LD syntax; a JSON-LD frame must be a single "
            "object.", "jsonld.SyntaxError")
    _validate_frame_object(expanded_frame[0])

    results: list = []
    _match_frame(state, sorted(state["graphMap"][state["graph"]].keys()),
                 expanded_frame, results, None)

    # prune blank node identifiers used only once
    if options["pruneBlankNodeIdentifiers"]:
        to_prune = [bid for bid, uses in state["bnodeMap"].items()
                    if len(uses) == 1]
        _prune_bnodes(results, set(to_prune))

    # compact with the frame's context; the link memo keeps @link-shared
    # (possibly cyclic) structures shared through compaction
    # (cf. reference jsonld.js:487-489 opts.link = {})
    compact_opts = dict(options)
    compact_opts["link"] = {}
    # the reference sets opts.graph = !omitGraph and lets compact's own
    # collapse/wrap logic run (jsonld.js:484, 188-245): with graph on,
    # any object wraps as a one-element array under the @graph ALIAS;
    # with graph off, a 0/1-element array collapses (gated on
    # compactArrays) and a longer one wraps under the alias. The
    # collapse keeps the single node ITSELF (no copy — @link cycles to
    # the root stay `is`-identical, link fuzz seed 1104) while the
    # ctx-prepend shallow-copies (jsonld.js:239-245), and cleanupNull
    # after forks shared property arrays. An earlier port-side rewrap
    # here keyed on the literal "@graph" and missed aliased wrappers
    # (wave-12 fuzz seed 113: {"gr": "@graph"} + omitGraph).
    compact_opts["graph"] = not options["omitGraph"]
    # the reference cleans @preserve on the EXPANDED output before
    # compaction (frame.js:62-64); this port cleans after — the one
    # place the order is observable is @type, where a default-object
    # fill leaves {'@preserve': [types]} wrappers that compaction's
    # IRI handling can't digest: unwrap just those here
    _unwrap_type_preserve(results)
    compacted = compact_document(results, frame_ctx, compact_opts)

    # cleanup @preserve / null (reference jsonld.js:491-492)
    compacted = _cleanup_preserve(compacted)
    compacted = _cleanup_null(compacted)
    return compacted


def _get_frame_flag(frame, options, name):
    """Reference _getFrameFlag (frame.js:419-439): the embed
    coercion/validation (true->@once, false->@never, else must be a
    known mode) runs on the resolved value — whether it came from the
    frame OR from options — so an options.embed of true/false coerces
    and an invalid options.embed throws exactly like an in-frame one."""
    key = "@" + name
    if key in frame:
        v = frame[key]
        if isinstance(v, list) and v:
            v = v[0]
        if isinstance(v, dict) and "@value" in v:
            v = v["@value"]
        from_frame = True
    else:
        v = options.get(name)
        from_frame = False
    if name == "embed":
        if v is True:
            return "@once"
        if v is False:
            return "@never"
        if v in ("@always", "@never", "@link", "@once", "@first",
                 "@last"):
            return v
        raise JsonLdError(f"Invalid @embed value: {v!r}",
                          "invalid @embed value")
    return bool(v) if from_frame else v


def _validate_frame_object(tf) -> None:
    """Reference _validateFrame (frame.js:446-476), applied per property
    subframe from the subject filter (frame.js:574): @id values must be
    wildcards or absolute IRIs (never blank nodes), @type values must be
    wildcards, absolute IRIs, or @json."""
    if not isinstance(tf, dict):
        raise JsonLdError(
            "Invalid JSON-LD syntax; a JSON-LD frame must be a single "
            "object.", "jsonld.SyntaxError")
    if "@id" in tf:
        ids = tf["@id"]
        for i in (ids if isinstance(ids, list) else [ids]):
            if not (isinstance(i, dict) or is_absolute_iri(i)) or \
                    (isinstance(i, str) and i.startswith("_:")):
                raise JsonLdError(
                    "Invalid JSON-LD syntax; invalid @id in frame.",
                    "invalid frame")
    if "@type" in tf:
        ts = tf["@type"]
        for t in (ts if isinstance(ts, list) else [ts]):
            if not (isinstance(t, dict) or is_absolute_iri(t)
                    or t == "@json") or \
                    (isinstance(t, str) and t.startswith("_:")):
                raise JsonLdError(
                    "Invalid JSON-LD syntax; invalid @type in frame.",
                    "invalid frame")


def _node_matches_frame(state, subject: dict, frame: dict, options) -> bool:
    """Frame Matching (framing spec §3.2): match on @id / @type, otherwise
    duck-typing where the node must have the frame's properties. Observable
    semantics mirror the reference's subject filter
    (/root/reference/lib/frame.js:489-637)."""
    require_all = _get_frame_flag(frame, options, "requireAll")
    wildcard = True
    matches_some = False
    for key in frame.keys():
        match_this = False
        v = frame[key]
        frame_values = v if isinstance(v, list) else [v]
        node_values = subject.get(key, [])
        if not isinstance(node_values, list):
            node_values = [node_values]
        is_empty = len(frame_values) == 0

        if key == "@id":
            # the raw (unwrapped) pattern shape matters: the reference
            # runs `frame['@id'].includes(nodeId)` (frame.js:533-535),
            # which is EXACT membership for arrays but SUBSTRING match
            # when frame expansion left @id a plain string — a node
            # reference pattern {"@id": ".../filled"} matches any node
            # whose id is a substring of it (fuzz seed 4419). And
            # `frame['@id'][0] || {}` makes a non-array, non-string
            # pattern (dict wildcard) always match.
            raw = v
            sid = subject.get("@id")
            if isinstance(raw, list):
                first = raw[0] if raw else {}
                if isinstance(first, dict) and not first:
                    match_this = True
                else:
                    match_this = _js_strict_in(sid, raw)
            elif isinstance(raw, str):
                match_this = isinstance(sid, str) and sid in raw
            else:
                match_this = True
            if not require_all:
                return match_this
        elif key == "@type":
            wildcard = False
            if is_empty:
                if node_values:
                    return False
                match_this = True
            elif (len(frame_values) == 1
                  and isinstance(frame_values[0], dict)
                  and not frame_values[0]):
                match_this = len(node_values) > 0
            else:
                for t in frame_values:
                    if isinstance(t, dict) and "@default" in t:
                        match_this = True
                    elif t in node_values:
                        match_this = True
            if not require_all:
                return match_this
        elif is_keyword(key):
            continue
        else:
            this_frame = frame_values[0] if frame_values else None
            # each property subframe is validated on use — JS-truthy
            # gate (frame.js:572-576)
            if _js_truthy(this_frame):
                _validate_frame_object(this_frame)
            has_default = (isinstance(this_frame, dict)
                           and "@default" in this_frame)
            wildcard = False
            if not node_values and has_default:
                continue
            if node_values and is_empty:
                return False
            if this_frame is None:
                if node_values:
                    return False
                match_this = True
            elif is_list(this_frame):
                # list frames match through their FIRST inner pattern:
                # value patterns value-match each list item, node
                # patterns (incl. the empty {} — isSubject({}) is true)
                # node-match each item against the subject map; any
                # other inner shape matches nothing (frame.js:600-612)
                list_value = (this_frame["@list"][0]
                              if this_frame["@list"] else None)
                if node_values and is_list(node_values[0]):
                    node_list_values = node_values[0]["@list"]
                    if is_value(list_value):
                        match_this = any(
                            _value_pattern_match(list_value, lv)
                            for lv in node_list_values)
                    elif (isinstance(list_value, dict)
                          and not any(k in list_value for k in
                                      ("@value", "@set", "@list"))):
                        match_this = any(
                            _node_pattern_match(state, list_value, lv,
                                                options)
                            for lv in node_list_values)
            elif is_value(this_frame):
                match_this = any(_value_pattern_match(this_frame, nv)
                                 for nv in node_values)
            elif isinstance(this_frame, dict) and len(this_frame) == 1 \
                    and "@id" in this_frame:
                # subject-reference pattern: recursive node match
                # (frame.js:617-619 → _nodeMatch), inheriting the
                # string-pattern substring quirk of the @id branch
                match_this = any(
                    _node_pattern_match(state, this_frame, nv, options)
                    for nv in node_values)
            elif isinstance(this_frame, dict):
                match_this = len(node_values) > 0
            else:
                match_this = False

        if not match_this and require_all:
            return False
        matches_some = matches_some or match_this
    return wildcard or matches_some


def _js_strict_in(needle, hay: list) -> bool:
    """JS Array.includes semantics: === comparison, so bool never
    equals number (Python's True == 1 must not count)."""
    for h in hay:
        if isinstance(needle, bool) != isinstance(h, bool):
            continue
        if needle == h:
            return True
    return False


def _value_pattern_match(pattern: dict, value) -> bool:
    """Exact mirror of reference _valueMatch (frame.js:719-752):
    an all-empty pattern is a wildcard; otherwise EVERY dimension is
    constrained — a pattern without @type only matches values without
    @type, and a {} wildcard in @type/@language requires the value to
    HAVE that dimension. Falsy pattern entries (null) count as empty.
    Non-dict patterns read every key as undefined — wildcard (JS
    property access on scalars). The VALUE side is equally ungated:
    the reference reads @value/@type/@language off whatever object
    arrives — a node reference has all three undefined, so an
    all-wildcard pattern matches it (frame.js:794-812; fuzz seed
    1622)."""
    if not isinstance(pattern, dict):
        return True
    if isinstance(value, dict):
        v1 = value.get("@value")
        t1 = value.get("@type")
        l1 = value.get("@language")
    else:
        v1 = t1 = l1 = None

    def plist(k):
        pv = pattern.get(k)
        # JS truthiness: absent/null/''/0/false are empty, but {} and
        # [] are TRUTHY ({} is the @value wildcard — fuzz seed 767)
        if not _js_truthy(pv):
            return []
        return pv if isinstance(pv, list) else [pv]

    v2, t2, l2 = plist("@value"), plist("@type"), plist("@language")
    if not v2 and not t2 and not l2:
        return True

    def wild(lst):
        return bool(lst) and isinstance(lst[0], dict) and not lst[0]

    if not (_js_strict_in(v1, v2) or wild(v2)):
        return False
    if not ((not t1 and not t2) or _js_strict_in(t1, t2)
            or (t1 and wild(t2))):
        return False
    if not ((not l1 and not l2) or _js_strict_in(l1, l2)
            or (l1 and wild(l2))):
        return False
    return True


def _node_pattern_match(state, pattern: dict, value, options) -> bool:
    """Reference _nodeMatch (frame.js:754-765): the value must be a
    node reference resolving in the TOP-LEVEL subject map (the
    reference's `state.subjects` is pinned to the initial graph before
    recursion, frame.js:50 — graph recursion does not rebind it); the
    pattern then re-enters subject filtering against that node."""
    if not isinstance(value, dict) or "@id" not in value:
        return False
    subjects = state.get("subjects")
    if subjects is None:
        subjects = state["graphMap"][state["graph"]]
    node = subjects.get(value["@id"])
    return bool(node) and _node_matches_frame(state, node, pattern,
                                              options)


def _match_frame(state, subjects, frame, parent, active_property,
                 embedded=False):
    """Frame recursion (framing spec §3.1; cf. reference frame.js:76-323).

    ``embedded`` is False only for top-level matches: embed flags
    (@never/@once) control whether *referenced* nodes are embedded, never
    whether a top-level match is emitted, and the unique-embed set resets
    per top-level match (frame.js:103-141)."""
    options = state["options"]
    # every recursion validates its frame on entry (frame.js:76-79):
    # a single object, with legal @id/@type patterns
    if isinstance(frame, list):
        if len(frame) != 1:
            raise JsonLdError(
                "Invalid JSON-LD syntax; a JSON-LD frame must be a "
                "single object.", "jsonld.SyntaxError")
        _validate_frame_object(frame[0])
        frame_obj = frame[0]
    else:
        frame_obj = frame if isinstance(frame, dict) else {}
        _validate_frame_object(frame_obj)
    embed = _get_frame_flag(frame_obj, options, "embed")
    explicit = _get_frame_flag(frame_obj, options, "explicit")

    graph = state["graphMap"][state["graph"]]
    # link map is per graph (cf. reference frame.js:89-93)
    link = state["link"].setdefault(state["graph"], {})
    matched = {}
    for sid in subjects:
        subject = graph.get(sid)
        if subject is None:
            continue
        if _node_matches_frame(state, subject, frame_obj, options):
            matched[sid] = subject

    for sid in sorted(matched.keys()):
        subject = matched[sid]
        if active_property is None:
            # each top-level match is a compartmentalized result
            state["uniqueEmbeds"] = {state["graph"]: {}}
        else:
            state.setdefault("uniqueEmbeds", {}).setdefault(
                state["graph"], {})
        unique_embeds = state["uniqueEmbeds"][state["graph"]]

        if embed == "@link" and sid in link:
            _add_frame_output(parent, active_property, link[sid])
            continue

        output: dict[str, Any] = {"@id": sid}
        if sid.startswith("_:"):
            state["bnodeMap"].setdefault(sid, []).append(output)
        link[sid] = output

        # @first/@last are the JSON-LD 1.0 embed modes. The reference's
        # 1.1 rejection (frame.js:130-135) NEVER fires: it reads
        # `state.is11` but the flag is only ever set on `state.options`
        # (jsonld.js:479 sets opts.is11; the frame state object has no
        # is11 member) — so the reference accepts these modes in every
        # processing mode, and so do we (differential fm079/fm080).

        if not embedded and sid in unique_embeds:
            # already embedded inside another top-level node
            continue
        on_stack = any(s == sid and g == state["graph"]
                       for s, g in state["subjectStack"])
        if embedded and (embed == "@never" or on_stack):
            _add_frame_output(parent, active_property, output)
            continue
        if embedded and embed in ("@once", "@first") \
                and sid in unique_embeds:
            _add_frame_output(parent, active_property, output)
            continue
        if embed == "@last" and sid in unique_embeds:
            # replace the earlier embed with a node reference; only the
            # last match stays embedded (cf. reference frame.js:162-167)
            _remove_embed(state, sid)
        unique_embeds[sid] = {"parent": parent,
                              "property": active_property}
        state["subjectStack"].append((sid, state["graph"]))

        # subject is also the name of a graph (cf. frame.js:174-193)
        if sid in state["graphMap"]:
            if "@graph" not in frame_obj:
                recurse = state["graph"] != "@merged"
                subframe: Any = {}
            else:
                subframe = frame_obj["@graph"]
                if isinstance(subframe, list):
                    subframe = subframe[0] if subframe else {}
                if not isinstance(subframe, dict):
                    subframe = {}
                recurse = sid not in ("@merged", "@default")
            if recurse:
                sub_state = dict(state)
                sub_state["graph"] = sid
                _match_frame(
                    sub_state,
                    sorted(state["graphMap"][sid].keys()),
                    [subframe], output, "@graph", embedded=False)

        # if the frame has @included, recurse over its sub-frame
        # (frame.js:197-202): candidates are the SAME subject list this
        # level was called with; matches land under '@included'
        if "@included" in frame_obj:
            _match_frame(dict(state), subjects, frame_obj["@included"],
                         output, "@included", embedded=False)

        for prop in sorted(subject.keys()):
            objects = subject[prop]
            if is_keyword(prop):
                if prop in ("@id", "@type"):
                    if prop == "@type":
                        output["@type"] = list(objects)
                        for t in objects:
                            if isinstance(t, str) and t.startswith("_:"):
                                state["bnodeMap"].setdefault(
                                    t, []).append(output)
                    continue
                if prop == "@graph":
                    continue
                output[prop] = copy.deepcopy(objects)
                continue
            if explicit and prop not in frame_obj:
                continue
            implicit = {"@embed": [embed], "@explicit": [explicit]}
            for o in objects:
                # the subframe stays a RAW array through recursion so
                # entry validation sees multi-pattern / garbage shapes
                # the way the reference does (frame.js:228-231,258-260)
                raw_sub = frame_obj.get(prop)
                if raw_sub is None:
                    sub_frame_arr: list = [implicit]
                elif isinstance(raw_sub, list):
                    sub_frame_arr = raw_sub
                else:
                    sub_frame_arr = [raw_sub]
                sub_frame = sub_frame_arr[0] if sub_frame_arr else None

                if is_list(o):
                    list_out = {"@list": []}
                    # frame[prop][0]['@list'] is used whole when JS-
                    # truthy (empty array INCLUDED — [] is truthy),
                    # else an implicit frame (frame.js:234-238)
                    lf = None
                    if raw_sub is not None and sub_frame_arr \
                            and isinstance(sub_frame_arr[0], dict):
                        lf = sub_frame_arr[0].get("@list")
                    if isinstance(lf, (list, dict)) or _js_truthy(lf):
                        list_frame_arr = lf if isinstance(lf, list) \
                            else [lf]
                    else:
                        list_frame_arr = [implicit]
                    for item in o["@list"]:
                        if isinstance(item, dict) and "@id" in item \
                                and not is_value(item):
                            _match_frame(state, [item["@id"]],
                                         list_frame_arr,
                                         list_out, "@list",
                                         embedded=True)
                        else:
                            list_out["@list"].append(copy.deepcopy(item))
                    _add_frame_output(output, prop, list_out)
                elif isinstance(o, dict) and "@id" in o \
                        and not is_value(o):
                    _match_frame(state, [o["@id"]], sub_frame_arr, output,
                                 prop, embedded=True)
                else:
                    # the reference gates EVERY value object through
                    # _valueMatch(subframe[0], o) — a node-shaped
                    # subframe (e.g. {"@type": [...]}) reads as a value
                    # pattern whose non-empty @type list never matches
                    # a typeless literal, so the value DROPS and the
                    # property default-fills (frame.js:260-263; fuzz
                    # seed 26). An EMPTY explicit subframe (a frame
                    # property expanding to [] — e.g. an empty index
                    # map) crashes the reference outright:
                    # `_valueMatch(undefined, o)` reads '@value' of
                    # undefined (frame.js:261,798; fuzz seed 943)
                    if raw_sub is not None and not sub_frame_arr:
                        raise JsonLdError(
                            "Cannot read properties of undefined "
                            "(reading '@value') (reference TypeError: "
                            "empty property subframe reaches "
                            "_valueMatch)", "TypeError parity")
                    if _value_pattern_match(sub_frame, o):
                        _add_frame_output(output, prop, copy.deepcopy(o))

        # defaults
        for prop in sorted(frame_obj.keys()):
            if prop == "@type":
                # a DEFAULT-OBJECT @type pattern participates in the
                # defaults fill like a regular property
                # (frame.js:271-277): output gains
                # {'@preserve': [default types]} when unmatched
                tfv = frame_obj[prop]
                tf0 = tfv[0] if isinstance(tfv, list) and tfv else tfv
                if not (isinstance(tf0, dict) and "@default" in tf0):
                    continue
                if prop in output:
                    continue
            elif is_keyword(prop) or prop in output:
                continue
            pf = frame_obj[prop]
            if isinstance(pf, list):
                pf = pf[0] if pf else {}
            if not isinstance(pf, dict):
                pf = {}
            if _get_frame_flag(pf, options, "omitDefault"):
                continue
            default = pf.get("@default", "@null")
            if isinstance(default, list) and len(default) == 1:
                default = default[0]
            if default == "@null" or (isinstance(default, dict)
                                      and default.get("@value") == "@null"):
                output[prop] = [{"@preserve": ["@null"]}]
            else:
                # reference frame.js:287-293: the preserve payload is
                # arrayified ONLY when not already an array — an EMPTY
                # @default stays [], so cleanup's ['@preserve'][0] is
                # undefined and the property drops (wave-17 seed 1026)
                preserve = copy.deepcopy(default)
                if not isinstance(preserve, list):
                    preserve = [preserve]
                output[prop] = [{"@preserve": preserve}]

        # @reverse framing: find nodes referencing this subject
        # (cf. frame.js:297-315)
        for rprop in sorted((frame_obj.get("@reverse") or [{}])[0].keys()
                            if isinstance(frame_obj.get("@reverse"), list)
                            else (frame_obj.get("@reverse") or {}).keys()):
            rframe_src = frame_obj["@reverse"]
            if isinstance(rframe_src, list):
                rframe_src = rframe_src[0]
            rsub_frame = rframe_src.get(rprop, [{}])
            for other_id in sorted(graph.keys()):
                other = graph[other_id]
                vals = other.get(rprop, [])
                if any(isinstance(v, dict) and v.get("@id") == sid
                       for v in vals):
                    rev = output.setdefault("@reverse", {})
                    target = rev.setdefault(rprop, [])
                    _match_frame(state, [other_id],
                                 rsub_frame if isinstance(rsub_frame, list)
                                 else [rsub_frame],
                                 target, active_property, embedded=True)

        _add_frame_output(parent, active_property, output)
        state["subjectStack"].pop()


def _add_frame_output(parent, prop, output):
    if isinstance(parent, dict):
        parent.setdefault(prop, []).append(output)
    else:
        parent.append(output)


def _remove_embed(state, sid):
    """Replace a previously embedded node with a node reference and drop
    dependent dangling embeds (cf. reference frame.js:645-684; used by
    the 1.0 ``@embed: @last`` mode)."""
    embeds = state["uniqueEmbeds"][state["graph"]]
    embed = embeds[sid]
    parent, prop = embed["parent"], embed["property"]
    subject_ref = {"@id": sid}
    if isinstance(parent, list):
        for i, e in enumerate(parent):
            if isinstance(e, dict) and e.get("@id") == sid:
                parent[i] = subject_ref
                break
    else:
        vals = parent.get(prop)
        if isinstance(vals, list):
            # mirror removeValue+addValue: drop EVERY value whose @id
            # matches, then append ONE reference at the end — several
            # references collapse into one, position moves to the tail
            parent[prop] = [
                v for v in vals
                if not (isinstance(v, dict) and not is_value(v)
                        and v.get("@id") == sid)] + [subject_ref]
        elif vals is not None:
            parent[prop] = subject_ref

    def remove_dependents(dep_id):
        for next_id in list(embeds.keys()):
            e = embeds.get(next_id)
            if e is not None and isinstance(e.get("parent"), dict) \
                    and e["parent"].get("@id") == dep_id:
                del embeds[next_id]
                remove_dependents(next_id)
    remove_dependents(sid)


def _prune_bnodes(element, to_prune: set, _seen: set | None = None):
    # _seen guards against @link cycles (shared in-memory structures)
    if _seen is None:
        _seen = set()
    if isinstance(element, list):
        for item in element:
            _prune_bnodes(item, to_prune, _seen)
    elif isinstance(element, dict):
        if id(element) in _seen:
            return
        _seen.add(id(element))
        # @value objects are skipped whole — an "@id" key inside a
        # @json literal's payload is DATA, not a node id
        # (frame.js:707-709; fuzz seed 3216)
        if is_value(element):
            return
        # unconditional: a once-used bnode keeps NO @id even when the
        # node has no other keys (frame.js:736-740 deletes in-place
        # without a key-count guard; fuzz seed 20 — @explicit strips
        # the properties, leaving {} in the output)
        if "@id" in element and element["@id"] in to_prune:
            del element["@id"]
        for v in element.values():
            _prune_bnodes(v, to_prune, _seen)


def _unwrap_type_preserve(element, _seen: set | None = None):
    """Unwrap {'@preserve': [..]} wrappers inside @type arrays, in
    place (the pre-compaction slice of the reference's
    _cleanupPreserve, frame.js:694-745)."""
    if _seen is None:
        _seen = set()
    if isinstance(element, list):
        for e in element:
            _unwrap_type_preserve(e, _seen)
    elif isinstance(element, dict):
        if id(element) in _seen:
            return
        _seen.add(id(element))
        ts = element.get("@type")
        if isinstance(ts, list):
            flat = []
            for t in ts:
                if isinstance(t, dict) and "@preserve" in t:
                    pv = t["@preserve"]
                    flat.extend(pv if isinstance(pv, list) else [pv])
                else:
                    flat.append(t)
            element["@type"] = flat
        for k, v in element.items():
            if k != "@type":
                _unwrap_type_preserve(v, _seen)


_UNDEF = object()  # JS `undefined`: dropped from objects, null in arrays


def _cleanup_preserve(element, _memo: dict | None = None):
    # _memo maps original dict identity -> rebuilt dict so @link-shared
    # (possibly cyclic) structures stay shared and the walk terminates
    if _memo is None:
        _memo = {}
    if isinstance(element, list):
        # a JS `undefined` element (an EMPTY @preserve) vanishes with
        # the surrounding machinery — mirror by dropping it
        out_l = [_cleanup_preserve(e, _memo) for e in element]
        return [e for e in out_l if e is not _UNDEF]
    if isinstance(element, dict):
        if id(element) in _memo:
            return _memo[id(element)]
        if "@preserve" in element and len(element) == 1:
            v = element["@preserve"]
            if isinstance(v, list):
                # the reference ALWAYS takes element [0]
                # (frame.js:702-703: `return input['@preserve'][0]`) —
                # a multi-element @default keeps only its first value,
                # an EMPTY one becomes JS undefined and the property
                # drops (wave-17 fuzz seed 44)
                v = v[0] if v else _UNDEF
            if v is _UNDEF:
                return _UNDEF
            if v == "@null":
                return None
            return _cleanup_preserve(v, _memo)
        out: dict[str, Any] = {}
        _memo[id(element)] = out
        for k, v in element.items():
            cleaned = _cleanup_preserve(v, _memo)
            if cleaned is not _UNDEF:
                out[k] = cleaned
        return out
    if element == "@null":
        return None
    return element


def _js_truthy(v) -> bool:
    """JS truthiness for scalars; containers (even empty) are truthy."""
    if v is None or v is False:
        return False
    if isinstance(v, str):
        return v != ""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or v != v)  # 0, -0, NaN
    return True


def _cleanup_null(element, _link: dict | None = None):
    """Mirror of the reference's cleanupNull (frame.js:333-366)
    INCLUDING its identity behavior, which is observable through
    @embed:@link shared structures: objects are mutated IN PLACE and
    returned (so inner references to a node stay `is`-identical to
    it), arrays are rebuilt fresh at each reference site (so a shared
    array forks into per-site copies), and the circular-visitation
    guard is the @id-keyed link list — a revisited @id-bearing object
    returns as-is without reprocessing (link fuzz seed 1104)."""
    if _link is None:
        _link = {}
    if isinstance(element, list):
        out = [_cleanup_null(e, _link) for e in element]
        # the reference's array compaction is `filter(v => v)` — JS
        # TRUTHINESS, so "", 0, false, NaN fall out of framed arrays
        # alongside null (frame.js:336-337; fuzz seed 44)
        return [e for e in out if _js_truthy(e)]
    if isinstance(element, dict):
        if "@preserve" in element:
            v = element["@preserve"]
            if v == "@null" or v == ["@null"]:
                return None
            return _cleanup_null(v if not isinstance(v, list) or
                                 len(v) != 1 else v[0], _link)
        if "@id" in element:
            key = _js_property_key(element["@id"])
            seen = _link.setdefault(key, [])
            for o in seen:
                if o is element:
                    return element
            seen.append(element)
        for k in list(element.keys()):
            element[k] = _cleanup_null(element[k], _link)
        return element
    return element
