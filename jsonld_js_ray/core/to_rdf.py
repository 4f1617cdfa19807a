"""Expanded JSON-LD → RDF dataset (quads).

Implements the Deserialize JSON-LD to RDF algorithm (W3C JSON-LD 1.1 API
§8.1) from the public spec. Behavioral parity target:
/root/reference/lib/toRdf.js (graph walk :102-197, list conversion
:211-262, object/literal conversion :276-401).

Quad representation (Arrow-friendly; see FIXTURES.md §4):
    (subject, predicate, object_kind, object_value, datatype, language, graph)
with object_kind 0=IRI, 1=blank node, 2=literal; graph '' = default graph.
Blank nodes keep their ``_:`` prefix in subject/object_value/graph.
"""

from __future__ import annotations

from typing import Optional

from .errors import JsonLdError
from .context import emit_event
from .keywords import (
    RDF_DIRECTION, RDF_FIRST, RDF_JSON_LITERAL, RDF_LANGSTRING, RDF_LANGUAGE,
    RDF_NIL, RDF_REST, RDF_TYPE, RDF_VALUE,
    I18N_NS, XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, XSD_STRING,
    is_absolute_iri, is_bool, is_double, is_keyword, is_list, is_number,
    is_value,
)
from .literals import (canonical_double, canonical_integer,
                       jcs_canonicalize, js_parse_float)
from .node_map import IdentifierIssuer, create_node_map

OBJ_IRI = 0
OBJ_BNODE = 1
OBJ_LITERAL = 2

Quad = tuple  # (s, p, o_kind, o_value, datatype, language, graph)


def to_rdf(expanded, options: Optional[dict] = None) -> list[Quad]:
    """Expanded document → list of quads (cf. reference toRdf.js:53-89)."""
    options = options or {}
    issuer = options.get("issuer") or IdentifierIssuer("_:b")
    graph_map: dict = {"@default": {}}
    create_node_map(expanded, graph_map, "@default", issuer)

    quads: list[Quad] = []
    for graph_name in sorted(graph_map.keys()):
        if graph_name == "@default":
            graph_term = ""
        elif graph_name.startswith("_:"):
            graph_term = graph_name
        elif is_absolute_iri(graph_name):
            graph_term = graph_name
        else:
            emit_event(options, "relative graph reference",
                       f"Dropping relative graph name {graph_name!r}.")
            continue
        _graph_to_rdf(quads, graph_map[graph_name], graph_term, issuer,
                      options)
    return quads


def _graph_to_rdf(quads, node_map, graph_term, issuer, options):
    """cf. reference toRdf.js:102-197. The relative-subject/-predicate
    checks run INSIDE the per-item loop (toRdf.js:115-158): a node with
    only an @id — e.g. the map entry auto-created for a relative object
    reference — never trips the subject check, so safe mode reports the
    OBJECT event for that shape, not a subject event."""
    produce_generalized = options.get("produceGeneralizedRdf", False)
    for subject_id in sorted(node_map.keys()):
        node = node_map[subject_id]
        subject_ok = subject_id.startswith("_:") or is_absolute_iri(
            subject_id)
        for prop in sorted(node.keys()):
            values = node[prop]
            if prop == "@type":
                predicate = RDF_TYPE
            elif is_keyword(prop):
                continue
            else:
                predicate = prop

            if not isinstance(values, list):
                values = [values]
            for item in values:
                if not subject_ok:
                    emit_event(options, "relative subject reference",
                               f"Dropping relative subject "
                               f"{subject_id!r}.")
                    continue
                if predicate.startswith("_:"):
                    if not produce_generalized:
                        emit_event(options, "blank node predicate",
                                   f"Dropping blank-node predicate "
                                   f"{predicate!r}.")
                        continue
                elif not is_absolute_iri(predicate):
                    emit_event(options, "relative predicate reference",
                               f"Dropping relative predicate "
                               f"{predicate!r}.")
                    continue
                if prop == "@type":
                    item = {"@id": item}
                if is_list(item):
                    head = _list_to_rdf(quads, item["@list"], issuer,
                                        graph_term, options)
                    if head is not None:
                        quads.append((subject_id, predicate, head[0],
                                      head[1], head[2], head[3], graph_term))
                else:
                    obj = _object_to_rdf(item, options, issuer=issuer,
                                         quads=quads, graph_term=graph_term)
                    if obj is not None:
                        quads.append((subject_id, predicate, obj[0], obj[1],
                                      obj[2], obj[3], graph_term))


def _list_to_rdf(quads, items, issuer, graph_term, options):
    """@list → rdf:first/rest/nil chain (cf. reference toRdf.js:211-262):
    the head blank node is issued BEFORE the chain is walked (so labels
    match the reference exactly) and nested @list items recurse through
    _object_to_rdf, yielding a sub-chain whose head becomes the item.

    Returns the head object tuple (kind, value, datatype, language)."""
    items = list(items)
    last = items.pop() if items else None
    if last is None:
        return (OBJ_IRI, RDF_NIL, None, None)
    result = (OBJ_BNODE, issuer.get_id(), None, None)
    subject = result[1]
    for item in items:
        obj = _object_to_rdf(item, options, issuer=issuer, quads=quads,
                             graph_term=graph_term)
        nxt = issuer.get_id()
        if obj is None:
            # the reference's _listToRDF has NO null guard (unlike the
            # regular property site): a dropped object (relative-IRI
            # node reference under @base null) is pushed into the
            # dataset and N-Quads serialization crashes reading
            # `.termType` of null (toRdf.js:224-233; fuzz seed 4398) —
            # mirrored as a typed error
            raise JsonLdError(
                "Cannot read properties of null (reading 'termType') "
                "(reference TypeError: dropped object inside @list)",
                "TypeError parity")
        quads.append((subject, RDF_FIRST, obj[0], obj[1], obj[2],
                      obj[3], graph_term))
        quads.append((subject, RDF_REST, OBJ_BNODE, nxt, None, None,
                      graph_term))
        subject = nxt
    obj = _object_to_rdf(last, options, issuer=issuer, quads=quads,
                         graph_term=graph_term)
    if obj is None:
        raise JsonLdError(
            "Cannot read properties of null (reading 'termType') "
            "(reference TypeError: dropped object inside @list)",
            "TypeError parity")
    quads.append((subject, RDF_FIRST, obj[0], obj[1], obj[2], obj[3],
                  graph_term))
    quads.append((subject, RDF_REST, OBJ_IRI, RDF_NIL, None, None,
                  graph_term))
    return result


class _ArrayDatatype(str):
    """A datatype string coerced from a JS-array @type: always truthy
    (a JS array is truthy even when its toString() is ''), so the
    `datatype or XSD_*` fallbacks must never fire for it — and never
    strictly EQUAL to any string (`['…#double'] === XSD_DOUBLE` is
    false in JS), so the `datatype === '@json'` / `=== XSD_DOUBLE`
    dispatch checks must not fire for it either."""

    def __bool__(self):
        return True

    def __eq__(self, other):
        return self is other

    def __ne__(self, other):
        return self is not other

    __hash__ = str.__hash__


def _object_to_rdf(item, options, issuer=None, quads=None, graph_term=None):
    """Value/node → object term (cf. reference toRdf.js:276-401).

    Returns (kind, value, datatype, language) or None (dropped)."""
    if isinstance(item, dict) and "@id" in item and not is_value(item):
        oid = item["@id"]
        if not isinstance(oid, str):
            return None
        if oid.startswith("_:"):
            return (OBJ_BNODE, oid, None, None)
        if not is_absolute_iri(oid):
            emit_event(options, "relative object reference",
                       f"Dropping relative object reference {oid!r}.")
            return None
        return (OBJ_IRI, oid, None, None)

    # nested @list becomes a sub-chain; its head is the object
    # (cf. reference toRdf.js:369-375)
    if is_list(item) and issuer is not None:
        return _list_to_rdf(quads, item["@list"], issuer, graph_term,
                            options)

    if not is_value(item):
        return None

    value = item["@value"]
    datatype = item.get("@type")
    if isinstance(datatype, list):
        # a @type-container map key prepended onto a VALUE object leaves
        # a LIST @type (both engines, expand.js:1240-1246 has no isValue
        # guard); the reference then uses it as the literal datatype via
        # implicit JS Array→string coercion: null joins as EMPTY, and
        # the `datatype || XSD_*` fallback never fires because the
        # ARRAY itself is truthy — `[null]` yields `^^<>` verbatim
        # (fuzz seed 7981)
        datatype = ",".join("" if d is None else str(d)
                            for d in datatype)
        datatype = _ArrayDatatype(datatype)
    language = item.get("@language")
    direction = item.get("@direction")
    rdf_direction = options.get("rdfDirection")

    if datatype == "@json":
        return (OBJ_LITERAL, jcs_canonicalize(value), RDF_JSON_LITERAL, None)
    if is_bool(value):
        return (OBJ_LITERAL, "true" if value else "false",
                datatype or XSD_BOOLEAN, None)
    if is_double(value) or datatype == XSD_DOUBLE:
        # a NON-double value under an xsd:double datatype goes through
        # ES parseFloat (toRdf.js:300-303): 'leaf' -> "NaN"^^xsd:double
        v = value if is_number(value) and not is_bool(value) \
            else js_parse_float(value)
        return (OBJ_LITERAL, canonical_double(v),
                datatype or XSD_DOUBLE, None)
    if is_number(value):
        return (OBJ_LITERAL, canonical_integer(value),
                datatype or XSD_INTEGER, None)
    if direction is not None and rdf_direction == "i18n-datatype":
        dt = f"{I18N_NS}{(language or '').lower()}_{direction}"
        return (OBJ_LITERAL, str(value), dt, None)
    if direction is not None and rdf_direction == "compound-literal":
        # Compound-literal serialization per the public spec (W3C JSON-LD
        # 1.1 API, Object to RDF Conversion step 12): a fresh blank node
        # carrying rdf:value / rdf:language (lowercased, optional) /
        # rdf:direction as xsd:string literals becomes the object term.
        # NOTE: documented superset — the reference v9.0.1-0 does NOT
        # implement this mode and raises "Unsupported rdfDirection value."
        # (toRdf.js:316-321); we implement the spec (NOTES_r4 divergence).
        literal = issuer.get_id()
        quads.append((literal, RDF_VALUE, OBJ_LITERAL, str(value),
                      XSD_STRING, None, graph_term))
        if language is not None:
            quads.append((literal, RDF_LANGUAGE, OBJ_LITERAL,
                          str(language).lower(), XSD_STRING, None,
                          graph_term))
        quads.append((literal, RDF_DIRECTION, OBJ_LITERAL, str(direction),
                      XSD_STRING, None, graph_term))
        return (OBJ_BNODE, literal, None, None)
    if direction is not None and rdf_direction:
        raise JsonLdError("Unknown rdfDirection value.",
                          "invalid rdfDirection",
                          {"value": rdf_direction})
    if direction is not None:
        # direction dropped because rdfDirection is unset
        # (cf. reference toRdf.js:328-342)
        emit_event(options, "rdfDirection not set",
                   "rdfDirection not set for @direction.")
    if language is not None:
        return (OBJ_LITERAL, str(value), datatype or RDF_LANGSTRING,
                language)
    if not isinstance(value, str):
        # Only a null / object / array @value can reach the final
        # string branch (numbers and booleans are caught above; an
        # @json payload only lands here when a @type-container map key
        # turned the value object's @type into an ARRAY, defeating the
        # `datatype === '@json'` check). The reference passes the raw
        # JS value through (toRdf.js:343-345) and CRASHES serializing
        # the quad (NQuads.js escape: `s.replace is not a function` /
        # `Cannot read properties of null`) — mirror as a typed error
        # (fuzz seeds 2964/4656/5024/6683).
        raise JsonLdError(
            "s.replace is not a function (reference TypeError: "
            "non-string literal value reached N-Quads serialization)",
            "TypeError parity")
    return (OBJ_LITERAL, value, datatype or XSD_STRING, None)
