"""Node Map Generation and flattening.

Implements the JSON-LD 1.1 Node Map Generation / Merge Node Maps /
Flattening algorithms (W3C JSON-LD 1.1 API §7) from the public spec.
Behavioral parity target: /root/reference/lib/nodeMap.js:24-290 and
lib/flatten.js:24-38. Unlike the reference this implementation never
mutates its input (expanded documents are reused by later stages in the
Ray pipeline)."""

from __future__ import annotations

from typing import Any, Optional

from .errors import JsonLdError
from .keywords import is_keyword, is_list, is_value


class IdentifierIssuer:
    """Deterministic, order-preserving blank-node relabeler
    (public rdf-canonize semantics; cf. SURVEY.md §2.3)."""

    __slots__ = ("prefix", "counter", "issued")

    def __init__(self, prefix: str = "_:b"):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict[str, str] = {}

    def get_id(self, old: Optional[str] = None) -> str:
        if old is not None and old in self.issued:
            return self.issued[old]
        new_id = f"{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.issued[old] = new_id
        return new_id

    def has_id(self, old: str) -> bool:
        return old in self.issued

    def clone(self) -> "IdentifierIssuer":
        c = IdentifierIssuer(self.prefix)
        c.counter = self.counter
        c.issued = dict(self.issued)
        return c


def _js_eq(a, b) -> bool:
    """JS === semantics for scalars: booleans never equal numbers
    (Python's 0 == False must not count as a duplicate)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def _js_strict_eq(a, b) -> bool:
    """JS === on arbitrary members: scalars by value (bool/number kept
    distinct), dicts/lists by object IDENTITY."""
    if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
        return a is b
    return _js_eq(a, b)


def _compare_values(v1, v2) -> bool:
    """Value equality for dedup inside node merge
    (cf. reference util.js:376-400; scalar compare is JS ===)."""
    if _js_eq(v1, v2) and not (isinstance(v1, (dict, list))
                               or isinstance(v2, (dict, list))):
        return True
    if v1 is v2:
        return True
    if is_value(v1) and is_value(v2):
        # every member compare is JS === (util.js:383-389): scalars by
        # value, but a non-scalar member (e.g. a garbage ARRAY @type)
        # only equals ITSELF — two structurally equal arrays are
        # different objects, so such value objects never dedupe
        # (merge fuzz seed 6726)
        return (_js_strict_eq(v1.get("@value"), v2.get("@value"))
                and _js_strict_eq(v1.get("@type"), v2.get("@type"))
                and _js_strict_eq(v1.get("@language"), v2.get("@language"))
                and _js_strict_eq(v1.get("@index"), v2.get("@index")))
    if (isinstance(v1, dict) and "@id" in v1
            and isinstance(v2, dict) and "@id" in v2):
        return _js_strict_eq(v1["@id"], v2["@id"])
    return False


def add_value(subject: dict, prop: str, value, allow_duplicate=False):
    """cf. reference util.js:246-298 (propertyIsArray=True semantics)."""
    values = subject.setdefault(prop, [])
    if allow_duplicate or not any(_compare_values(value, v) for v in values):
        values.append(value)


def create_node_map(element, graph_map: dict, active_graph: str,
                    issuer: IdentifierIssuer,
                    active_subject=None, active_property: Optional[str] = None,
                    list_: Optional[dict] = None):
    """Node Map Generation (spec §7.4.2)."""
    if isinstance(element, list):
        for item in element:
            create_node_map(item, graph_map, active_graph, issuer,
                            active_subject, active_property, list_)
        return

    if not isinstance(element, dict):
        return

    graph = graph_map.setdefault(active_graph, {})
    subject_node = (graph.get(active_subject)
                    if isinstance(active_subject, str) else None)

    # relabel blank-node @type values (node objects carry a list; value
    # objects carry a scalar like "@json" or a datatype IRI)
    el_types = element.get("@type")
    if isinstance(el_types, list) and is_value(element):
        # the VALUE branch (nodeMap.js:65-77) runs Array.prototype
        # .indexOf on the whole array — a silent no-op — so a value
        # object's LIST @type survives VERBATIM: no member rename, no
        # crash (fuzz seed 7981 reaches toRDF with @type [null])
        pass
    elif isinstance(el_types, list):
        if is_list(element):
            # a @list WRAPPER's @type never reaches any scan: the
            # property loop re-wraps lists as a fresh {'@list': _list},
            # discarding extra keys (nodeMap.js:207-214) — no crash,
            # no member rename, no issuer side-effect (wave-13 fuzz
            # seed 10154: a type-map key expanding to null leaves
            # "@type": [null] on a prepended list object)
            el_types = None
        elif not is_value(element):
            # the SUBJECT path's early bnode-type scan calls
            # type.indexOf on every member (nodeMap.js:86-92): a null
            # @type member (injected by a type-map key that expanded to
            # null) crashes with a raw TypeError — mirrored (fuzz seed
            # 6465). The VALUE branch (nodeMap.js:65-77) instead runs
            # Array.prototype.indexOf on the whole array — a silent
            # no-op — so value objects with list @type survive
            # (fuzz seed 7981 reaches toRDF with @type [null]).
            for t in el_types:
                if not isinstance(t, str):
                    raise JsonLdError(
                        "Cannot read properties of null (reading "
                        "'indexOf') (reference TypeError: non-string "
                        "@type member in node map)", "TypeError parity")
        if el_types is not None:
            el_types = [issuer.get_id(t) if isinstance(t, str)
                        and t.startswith("_:") else t for t in el_types]
    elif isinstance(el_types, str):
        el_types = [issuer.get_id(el_types)] \
            if el_types.startswith("_:") else [el_types]

    if is_value(element):
        out = dict(element)
        if el_types is not None:
            out["@type"] = el_types if isinstance(
                element.get("@type"), list) else el_types[0]
        if list_ is None:
            if subject_node is not None and active_property is not None:
                add_value(subject_node, active_property, out)
        else:
            list_["@list"].append(out)
        return

    if is_list(element):
        result = {"@list": []}
        create_node_map(element["@list"], graph_map, active_graph, issuer,
                        active_subject, active_property, result)
        if list_ is None:
            if subject_node is not None and active_property is not None:
                add_value(subject_node, active_property, result)
        else:
            list_["@list"].append(result)
        return

    # node object
    if "@id" in element:
        el_id = element["@id"]
        if (not el_id and not isinstance(el_id, (dict, list))
                and list_ is None
                and active_property is not None
                and not isinstance(active_subject, dict)):
            # embedded FALSY-@id objects are skipped (nodeMap.js:189-191:
            # `if('@id' in o && !o['@id']) continue`) — that includes
            # the EMPTY STRING, not just null. The skip lives ONLY in
            # the property-value loop: LIST items recurse straight into
            # createNodeMap's node branch, and the @REVERSE item loop
            # (nodeMap.js:120-133, active_subject = the referenced-node
            # dict here) has no falsy check either — a {"@id": ""}
            # under a reverse property becomes a verbatim "" subject
            # (wave-12 fuzz seed 9114); non-string → fresh blank label
            # (fuzz seed 1973)
            return
        if not isinstance(el_id, str):
            # a TOP-LEVEL node with a non-string @id is a blank node
            # and gets a fresh label (nodeMap.js:97-100 via isBlankNode
            # on non-string @id) — the @RESERVED path produces exactly
            # this shape
            node_id = issuer.get_id()
        elif el_id.startswith("_:"):
            node_id = issuer.get_id(el_id)
        else:
            # the empty string is NOT a blank node (graphTypes.js:
            # isBlankNode requires non-string or '_:' prefix): a
            # top-level "@id": "" (kept verbatim under "@base": null)
            # keys the node map verbatim (fuzz seed 276)
            node_id = el_id
    else:
        node_id = issuer.get_id()

    node = graph.setdefault(node_id, {"@id": node_id})

    if isinstance(active_subject, dict):
        # reverse-property linkage handled AFTER the property loop —
        # the reference recurses into the item FIRST and appends the
        # referenced node afterwards (nodeMap.js:129-133), so the
        # reverse-derived reference lands after the item's own values
        # (wave-18 fuzz seed 12909)
        pass
    elif active_property is not None:
        reference = {"@id": node_id}
        if list_ is None:
            if subject_node is not None:
                add_value(subject_node, active_property, reference)
        else:
            list_["@list"].append(reference)

    # ONE lexicographic pass over every key (nodeMap.js:120+ iterates
    # Object.keys(input).sort() with @reverse/@graph/@included handled at
    # their sorted positions) — the blank-node issuer order, and thus
    # the flattened labels, depend on this exact interleaving. @type and
    # @index merge AT their sorted positions too: "@included" < "@type",
    # so an @included copy of a node contributes its types FIRST
    # (nodeMap.js:110,149-166,181-184; fuzz seed 910) — only the bnode
    # NAMING of @type values happens early, above.
    for prop in sorted(element.keys()):
        if prop == "@id":
            continue
        if prop == "@type":
            for t in (el_types or []):
                add_value(node, "@type", t)
            continue
        if prop == "@index":
            if "@index" in node and node["@index"] != element["@index"]:
                raise JsonLdError("Conflicting @index values for node "
                                  f"{node_id!r}.", "conflicting indexes")
            node["@index"] = element["@index"]
            continue
        if prop == "@reverse":
            referenced = {"@id": node_id}
            for rprop, values in element["@reverse"].items():
                if not isinstance(values, list):
                    # relabelBlankNodes treats a @reverse MAP as an
                    # anonymous bnode and injects "@id" into it
                    # (util.js:431-455, graphTypes.js:106-120); the
                    # reference then iterates that string's characters
                    # and crashes in addValue on an undefined subject
                    # (nodeMap.js:123-135, util.js:275) — mirrored as
                    # a typed error (merge fuzz seed 142)
                    raise JsonLdError(
                        "Cannot read properties of undefined (reading "
                        "'hasOwnProperty') (reference TypeError: "
                        f"non-array @reverse map entry {rprop!r})",
                        "TypeError parity")
                for value in values:
                    create_node_map(value, graph_map, active_graph,
                                    issuer, referenced, rprop)
            continue
        if prop == "@graph":
            graph_map.setdefault(node_id, {})
            create_node_map(element["@graph"], graph_map, node_id, issuer)
            continue
        if prop == "@included":
            create_node_map(element["@included"], graph_map, active_graph,
                            issuer)
            continue
        if is_keyword(prop):
            if prop == "@value":
                continue
            # keep other keywords (e.g. frame artifacts) as-is
            node[prop] = element[prop]
            continue
        values = element[prop]
        if prop.startswith("_:"):
            prop = issuer.get_id(prop)
        if not isinstance(values, list):
            # the reference runs `for(let o of objects)` on the RAW
            # property value (nodeMap.js:168-182): a bare STRING — the
            # nulled-property-index fallback stores one verbatim —
            # iterates its CHARACTERS, each addValue'd with dedupe
            # (wave-11 fuzz seed 3551: "k1" becomes ["k","1"]); the
            # empty string hits the length-0 arm; anything else
            # non-iterable crashes raw — mirrored as a typed error
            if isinstance(values, str):
                if not values:
                    node.setdefault(prop, [])
                    continue
                for ch in values:
                    add_value(node, prop, ch)
                continue
            raise JsonLdError(
                "objects is not iterable (reference TypeError: "
                "non-array property value in node map)",
                "TypeError parity")
        if isinstance(values, list) and not values:
            # property added ONLY for literally-empty arrays
            # (nodeMap.js:177-180); when values exist but every one is
            # skipped (e.g. null @id), the property stays absent so an
            # otherwise-empty node collapses to only-@id and is pruned
            node.setdefault(prop, [])
            continue
        create_node_map(values, graph_map, active_graph, issuer, node_id,
                        prop)

    if isinstance(active_subject, dict):
        # reverse-property linkage: the referenced node appends under
        # the reverse property AFTER the item's own properties
        # (nodeMap.js:129-133 addValue follows createNodeMap)
        add_value(node, active_property, active_subject)


def merge_node_map_graphs(graph_map: dict) -> dict:
    """Merge every graph's subjects into one flat node map (used for
    framing the @merged graph; cf. reference nodeMap.js:233-260): node
    properties are unioned across graphs with duplicate suppression,
    keywords other than @type copied."""
    import copy as _copy
    merged: dict = {}
    for name in sorted(graph_map.keys()):
        for node_id in sorted(graph_map[name].keys()):
            node = graph_map[name][node_id]
            merged_node = merged.setdefault(node_id, {"@id": node_id})
            for prop in sorted(node.keys()):
                if is_keyword(prop) and prop != "@type":
                    merged_node[prop] = _copy.deepcopy(node[prop])
                else:
                    for value in node[prop]:
                        add_value(merged_node, prop, _copy.deepcopy(value))
    return merged


def merge_node_maps(graph_map: dict) -> dict:
    """Merge Node Maps (spec §7.4.4; cf. reference nodeMap.js:262-290):
    fold named graphs into the default graph."""
    default_graph = graph_map.get("@default", {})
    for graph_name in sorted(graph_map.keys()):
        if graph_name == "@default":
            continue
        node_map = graph_map[graph_name]
        graph_entry = default_graph.setdefault(
            graph_name, {"@id": graph_name, "@graph": []})
        graph_list = graph_entry.setdefault("@graph", [])
        for node_id in sorted(node_map.keys()):
            node = node_map[node_id]
            if not (len(node) == 1 and "@id" in node):
                graph_list.append(node)
    return default_graph


def flatten_expanded(expanded, issuer: Optional[IdentifierIssuer] = None
                     ) -> list:
    """Flattening (spec §7.1; cf. reference flatten.js:24-38): expanded
    document → node-map → sorted node array."""
    issuer = issuer or IdentifierIssuer("_:b")
    graph_map: dict[str, Any] = {"@default": {}}
    create_node_map(expanded, graph_map, "@default", issuer)
    default_graph = merge_node_maps(graph_map)
    flattened = []
    for node_id in sorted(default_graph.keys()):
        node = default_graph[node_id]
        if len(node) == 1 and "@id" in node:
            continue
        flattened.append(node)
    return flattened


def relabel_blank_nodes(element, issuer: IdentifierIssuer):
    """Relabel all blank nodes in expanded JSON-LD in place
    (cf. reference util.js:431-455 _labelBlankNodes): a blank NODE is
    an object whose @id is missing, non-string, or ``_:``-prefixed and
    that is not a @value/@set/@list (graphTypes.js:106-120) — an
    anonymous node is ASSIGNED a fresh id; keys recurse in sorted
    order (issuance order is observable); bnode strings outside @id
    (e.g. in @type arrays) are intentionally NOT relabeled."""
    if isinstance(element, list):
        for i, item in enumerate(element):
            element[i] = relabel_blank_nodes(item, issuer)
    elif is_list(element):
        element["@list"] = relabel_blank_nodes(element["@list"], issuer)
    elif isinstance(element, dict):
        if "@id" in element:
            bid = element["@id"]
            is_bnode = not isinstance(bid, str) or bid.startswith("_:")
        else:
            is_bnode = (len(element) == 0
                        or not ("@value" in element or "@set" in element
                                or "@list" in element))
        if is_bnode:
            old = element.get("@id")
            element["@id"] = issuer.get_id(
                old if isinstance(old, str) else None)
        for key in sorted(element.keys()):
            if key != "@id":
                element[key] = relabel_blank_nodes(element[key], issuer)
    return element
