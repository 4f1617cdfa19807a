"""RDF dataset → expanded JSON-LD.

Implements the Serialize RDF as JSON-LD algorithm (W3C JSON-LD 1.1 API
§8.2–§8.3) from the public spec, including ``rdf:List`` reconstruction via
single-reference tracking. Behavioral parity target:
/root/reference/lib/fromRdf.js:51-293 (list logic :117-140, 222-257;
literal conversion :305-407)."""

from __future__ import annotations

import json

from .context import emit_event
from .errors import JsonLdError
from .keywords import (
    BCP47_RE, I18N_NS, RDF_DIRECTION, RDF_FIRST, RDF_JSON_LITERAL,
    RDF_LANGSTRING, RDF_LANGUAGE, RDF_LIST, RDF_NIL, RDF_REST, RDF_TYPE,
    RDF_VALUE, XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, XSD_STRING,
)
from .to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL, Quad


import re as _re

# unsigned radix literals Number() accepts ('0x10' -> 16, '0o7' -> 7,
# '0b1' -> 1; a sign or bad digit makes Number() NaN). parseFloat on
# these yields 0 (parses the leading "0"), so isNumeric is true while
# both parseInt(v, 10) and parseFloat(v) evaluate to 0.
_JS_RADIX_RE = _re.compile(
    r"^\s*(?:0[xX][0-9a-fA-F]+|0[oO][0-7]+|0[bB][01]+)\s*$")


def _is_js_numeric(v: str) -> bool:
    """JS isNumeric (types.js:64): !isNaN(parseFloat(v)) && isFinite(v).
    Python quirks excluded: underscores and inf/nan spellings are not
    JS-numeric; JS quirk included: unsigned hex/octal/binary forms ARE
    (Number coerces them, parseFloat reads their leading 0)."""
    if not isinstance(v, str) or "_" in v:
        return False
    if _JS_RADIX_RE.match(v):
        return True
    try:
        f = float(v)
    except ValueError:
        return False
    import math as _m
    return _m.isfinite(f)


def _js_parse_int(v: str):
    """parseInt(v, 10) to double precision, with the ES toFixed(0)
    comparison done by the caller. Returns None when toFixed would use
    exponential form (|i| >= 1e21, never equal to a digit string)."""
    if _JS_RADIX_RE.match(v):
        return 0  # parseInt('0x10', 10) parses the leading "0"
    f = float(v)
    i = int(f)  # truncates toward zero like parseInt on numeric strings
    if abs(i) >= 10 ** 21:
        return None
    return i


def _js_parse_float(v: str) -> float:
    """parseFloat(v) for strings isNumeric accepted: radix forms parse
    their leading "0"; everything else is a full float literal."""
    if _JS_RADIX_RE.match(v):
        return 0.0
    return float(v)


def _rdf_to_object(o_kind, o_value, datatype, language, options):
    """RDF term → JSON-LD value (spec §8.3; cf. fromRdf.js:305-407)."""
    if o_kind in (OBJ_IRI, OBJ_BNODE):
        return {"@id": o_value}
    use_native = options.get("useNativeTypes", False)
    rdf_direction = options.get("rdfDirection")
    rval: dict = {"@value": o_value}
    if datatype == RDF_JSON_LITERAL and \
            options.get("processingMode") != "json-ld-1.0":
        try:
            rval["@value"] = json.loads(o_value)
        except ValueError as e:
            raise JsonLdError(f"JSON literal could not be parsed: {e}",
                              "invalid JSON literal")
        rval["@type"] = "@json"
        return rval
    if language:
        if not BCP47_RE.match(language):
            # warning event, tag still kept (fromRdf.js:316-333)
            emit_event(options, "invalid @language value",
                       "@language value must be valid BCP47.")
        rval["@language"] = language
        return rval
    if rdf_direction == "i18n-datatype" and datatype and \
            datatype.startswith(I18N_NS):
        lang_dir = datatype[len(I18N_NS):]
        lang, _, direction = lang_dir.partition("_")
        if lang:
            rval["@language"] = lang
        if direction:
            rval["@direction"] = direction
        return rval
    if use_native:
        # exact reference semantics (fromRdf.js:351-377):
        # booleans accept "1"/"0"; integers convert ONLY when the ES
        # toFixed(0) of the parsed value round-trips the lexical form
        # (so "007", "9007199254740993" and huge values stay strings —
        # and, reference quirk, WITHOUT @type when numeric); doubles
        # convert for any finite numeric string; NaN/INF never convert
        if datatype == XSD_BOOLEAN:
            if o_value in ("true", "1"):
                return {"@value": True}
            if o_value in ("false", "0"):
                return {"@value": False}
        elif datatype == XSD_INTEGER:
            if _is_js_numeric(o_value):
                i = _js_parse_int(o_value)
                if i is not None and str(i) == o_value:
                    return {"@value": i}
                return {"@value": o_value}  # numeric, non-canonical:
                # the reference leaves the string untyped here
        elif datatype == XSD_DOUBLE:
            if _is_js_numeric(o_value):
                return {"@value": _js_parse_float(o_value)}
        # reference quirk (fromRdf.js:351-377): the xsd:string
        # suppression lives only in the NON-native path, so under
        # useNativeTypes plain strings carry an explicit
        # @type xsd:string (fuzz seeds 46/57)
        rval["@type"] = datatype or XSD_STRING
        return rval
    if datatype not in (None, XSD_STRING):
        rval["@type"] = datatype
    return rval


def from_rdf_quads(quads: list[Quad], options: dict) -> list:
    """Quads → expanded JSON-LD (spec §8.2)."""
    use_rdf_type = options.get("useRdfType", False)

    # upfront rdfDirection validation (cf. reference fromRdf.js:64-75).
    # NOTE documented superset: the reference raises "Unsupported
    # rdfDirection value." for compound-literal; this port implements the
    # public spec (W3C JSON-LD 1.1 API §Serialize RDF as JSON-LD steps
    # 3.5.1 + 6.1) instead (NOTES_r4 divergence).
    rdf_direction = options.get("rdfDirection")
    if rdf_direction and rdf_direction not in ("i18n-datatype",
                                               "compound-literal"):
        raise JsonLdError("Unknown rdfDirection value.",
                          "invalid rdfDirection", {"value": rdf_direction})
    compound_mode = rdf_direction == "compound-literal"

    graph_map: dict[str, dict] = {"@default": {}}
    referenced_once: dict[str, object] = {}
    nil_usages_by_graph: dict[str, list] = {}
    # graph name -> ordered set of compound-literal subject bnode labels
    compound_subjects: dict[str, dict] = {}

    for q in quads:
        s, p, o_kind, o_value, datatype, language, graph = q
        # reference quirk (fromRdf.js:79-80): the graph NAME is the raw
        # RDF/JS term value — a blank-node graph label loses its "_:"
        # prefix in the output ("b1", a relative-looking @id), because
        # the reference never re-adds it via _nodeId there (fuzz seed 32)
        name = graph if graph else "@default"
        if name.startswith("_:"):
            name = name[2:]
        node_map = graph_map.setdefault(name, {})
        if compound_mode and p == RDF_DIRECTION:
            compound_subjects.setdefault(name, {})[s] = True
        if name != "@default":
            graph_map.setdefault("@default", {}).setdefault(
                name, {"@id": name})
        node = node_map.setdefault(s, {"@id": s})

        is_node_object = o_kind in (OBJ_IRI, OBJ_BNODE)
        if is_node_object:
            node_map.setdefault(o_value, {"@id": o_value})

        # duplicates are KEPT: the reference's addValue defaults
        # allowDuplicate=true (util.js:254-255; fromRdf.js:107,113), so
        # a dataset containing the same quad twice yields repeated
        # values/@type entries
        if p == RDF_TYPE and not use_rdf_type and is_node_object:
            node.setdefault("@type", []).append(o_value)
            continue

        value = _rdf_to_object(o_kind, o_value, datatype, language, options)
        values = node.setdefault(p, [])
        values.append(value)

        # list-usage tracking: referencedOnce records EVERY node object
        # (IRI-identified too, fromRdf.js:130-139) — the list fold can
        # consume an IRI-identified tail cell; only CONTINUING up the
        # chain requires blank referrers
        if is_node_object:
            usage = {"node": node, "property": p, "value": value,
                     "graph": name}
            if o_value == RDF_NIL:
                nil_usages_by_graph.setdefault(name, []).append(usage)
            elif o_value in referenced_once:
                referenced_once[o_value] = False
            else:
                referenced_once[o_value] = usage

    # compound-literal reconstruction per graph (spec §8.2 step 6.1):
    # each once-referenced compound node is removed from the node map and
    # its referencing {@id} value rewritten in place to a value object
    for name, cl_map in compound_subjects.items():
        node_map = graph_map.get(name, {})
        for cl in cl_map:
            cl_entry = referenced_once.get(cl)
            if not isinstance(cl_entry, dict):
                continue
            node, prop = cl_entry["node"], cl_entry["property"]
            cl_node = node_map.pop(cl, None)
            if cl_node is None:
                continue
            for cl_ref in node.get(prop, []):
                if not isinstance(cl_ref, dict) or cl_ref.get("@id") != cl:
                    continue
                cl_ref.pop("@id", None)
                values = cl_node.get(RDF_VALUE) or [{}]
                cl_ref["@value"] = values[0].get("@value")
                if RDF_LANGUAGE in cl_node:
                    lang = cl_node[RDF_LANGUAGE][0].get("@value")
                    if not isinstance(lang, str) or not BCP47_RE.match(lang):
                        raise JsonLdError(
                            "Invalid RDF syntax; rdf:language must be "
                            "well-formed BCP47.",
                            "invalid language-tagged string",
                            {"value": lang})
                    cl_ref["@language"] = lang
                direction = cl_node.get(RDF_DIRECTION,
                                        [{}])[0].get("@value")
                if direction is not None:
                    if direction not in ("ltr", "rtl"):
                        raise JsonLdError(
                            "Invalid RDF syntax; rdf:direction must be "
                            '"ltr" or "rtl".',
                            "invalid base direction",
                            {"value": direction})
                    cl_ref["@direction"] = direction

    # list reconstruction per graph (spec §8.2 step 4; fromRdf.js:117-140)
    for name, usages in nil_usages_by_graph.items():
        node_map = graph_map[name]
        for usage in usages:
            node, prop, head = usage["node"], usage["property"], \
                usage["value"]
            lst, lst_nodes = [], []
            # the ENTRY cell may be IRI-identified (no bnode check before
            # the first fold, fromRdf.js:233-246); walking backwards
            # stops once the referrer is not a blank node (:252-255)
            while (prop == RDF_REST
                   and isinstance(referenced_once.get(node["@id"]), dict)
                   and isinstance(node.get(RDF_FIRST), list)
                   and len(node.get(RDF_FIRST, [])) == 1
                   and isinstance(node.get(RDF_REST), list)
                   and len(node.get(RDF_REST, [])) == 1
                   and (len(node) == 3
                        or (len(node) == 4
                            and node.get("@type") == [RDF_LIST]))):
                lst.append(node[RDF_FIRST][0])
                lst_nodes.append(node["@id"])
                usage_ref = referenced_once[node["@id"]]
                node, prop, head = (usage_ref["node"],
                                    usage_ref["property"],
                                    usage_ref["value"])
                if not node["@id"].startswith("_:"):
                    break
            # convert: replace head value {@id: ...} with {@list: [...]}
            head.pop("@id", None)
            lst.reverse()
            head["@list"] = lst
            for nid in lst_nodes:
                node_map.pop(nid, None)

    result = []
    default_graph = graph_map["@default"]
    for subject in sorted(default_graph.keys()):
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            node = dict(node)
            graph_nodes = []
            inner = graph_map[subject]
            for s2 in sorted(inner.keys()):
                n2 = inner[s2]
                if len(n2) == 1 and "@id" in n2:
                    continue
                graph_nodes.append(n2)
            node["@graph"] = graph_nodes
        if len(node) == 1 and "@id" in node:
            continue
        result.append(node)
    return result
