"""Public per-document API.

Mirrors the reference's public surface (/root/reference/lib/jsonld.js:
expand :265-343, flatten :345-411, toRDF :679-712, canonize :564-604,
fromRDF :606-677, compact :108-248, frame :395-495) as pure Python
functions over parsed JSON values. These are the per-document kernels the
Ray stages wrap; they never touch Ray."""

from __future__ import annotations

from typing import Any, Optional

from .core.canonize import canonical_id_map, canonize as _canonize_quads
from .core.canonize import canonize_quads
from .core.context import (
    initial_context, process_context, safe_event_handler,
    set_default_event_handler, unhandled_event_handler,
)
from .core.expand import expand_document
from .core.node_map import IdentifierIssuer, flatten_expanded
from .core.nquads import parse as parse_nquads
from .core.nquads import serialize as serialize_nquads
from .core.resolver import ContextResolver
from .core.to_rdf import to_rdf as _to_rdf


def _opts(options: Optional[dict], default_base: str = "") -> dict:
    o = dict(options or {})
    # the reference's OMITTED-base default is the EMPTY base '' (every
    # public fn sets `base: _isString(input) ? input : ''`,
    # jsonld.js:149,312,371,421,737) — empty-base RESOLUTION, not the
    # null short-circuit a user gets with an explicit base: null.
    # _base_set records whether base was pinned (by the user or by a
    # string-input URL default): only a fully-unset base lets a remote
    # document's redirected documentUrl take over in expand
    # (jsonld.js:311-314)
    o["_base_set"] = "base" in o or default_base != ""
    o.setdefault("base", default_base)
    o.setdefault("processingMode", "json-ld-1.1")
    if "context_resolver" not in o:
        # reference option surface (jsonld.js:81-108): ``documentLoader``
        # is the public hook; ``contextResolver`` overrides wholesale
        if "contextResolver" in o:
            o["context_resolver"] = o["contextResolver"]
        else:
            o["context_resolver"] = ContextResolver(
                o.get("contexts") or {},
                document_loader=o.get("documentLoader"))
    return o


def expand(document, options: Optional[dict] = None) -> list:
    return expand_document(document, _opts(options))


def flatten(document, ctx=None, options: Optional[dict] = None):
    options = _opts(options,
                    document if isinstance(document, str) else "")
    expanded = expand_document(document, options)
    flattened = flatten_expanded(expanded)
    if ctx is None:
        return flattened
    from .core.compact import compact_document
    return compact_document(flattened, ctx, options, from_flatten=True)


def to_rdf(document, options: Optional[dict] = None) -> list:
    """Document → quads. Pass ``skipExpansion`` to treat input as expanded."""
    # toRDF/canonize do NOT pin a base default (jsonld.js:679-689) —
    # they delegate to expand, so a redirected documentUrl wins
    options = _opts(options)
    if options.get("skipExpansion"):
        expanded = document
    else:
        expanded = expand_document(document, options)
    return _to_rdf(expanded, options)


def to_nquads(document, options: Optional[dict] = None) -> str:
    return serialize_nquads(to_rdf(document, options))


def _canonize_kwargs(options: dict) -> dict:
    """Surface parity with the reference's nested ``canonizeOptions``
    (jsonld.js:551-559): messageDigestAlgorithm and maxDeepIterations are
    read from there, with top-level fallbacks kept for compatibility."""
    copts = options.get("canonizeOptions") or {}
    return {
        "max_deep_iterations": copts.get(
            "maxDeepIterations", options.get("maxDeepIterations", 2000)),
        "message_digest_algorithm": copts.get(
            "messageDigestAlgorithm",
            options.get("messageDigestAlgorithm", "sha256")),
    }


def canonize(document, options: Optional[dict] = None) -> str:
    """RDFC-1.0 canonical N-Quads (safe mode on by default, matching the
    reference's canonize defaults, jsonld.js:570-575)."""
    options = _opts(options)
    options.setdefault("safe", True)
    if options.get("inputFormat") == "application/n-quads":
        quads = parse_nquads(document)
    else:
        quads = to_rdf(document, options)
    return _canonize_quads(quads, **_canonize_kwargs(options))


def canonize_dataset(quads, options: Optional[dict] = None) -> str:
    options = _opts(options)
    return _canonize_quads(quads, **_canonize_kwargs(options))


def from_rdf(dataset, options: Optional[dict] = None):
    from .core.from_rdf import from_rdf_quads
    options = _opts(options)
    if isinstance(dataset, str):
        dataset = parse_nquads(dataset)
    return from_rdf_quads(dataset, options)


def get(url: str, options: Optional[dict] = None) -> dict:
    """Dereference a remote document (reference jsonld.get,
    jsonld.js:888-918): returns the RemoteDocument shape
    ``{document, documentUrl, contextUrl}`` with string payloads
    JSON-parsed and failures wrapped as 'loading document failed'."""
    from .core.resolver import load_remote_document
    return load_remote_document(url, _opts(options))


def process_context_api(active_ctx, local_ctx,
                        options: Optional[dict] = None):
    """Public processContext (reference jsonld.js:920-941): a null
    local context returns a fresh initial context; anything else is
    wrapped as {'@context': ...} and processed against ``active_ctx``.
    The omitted-base default is '' like the reference's."""
    options = _opts(options)
    if active_ctx is None:
        active_ctx = initial_context(options)
    if local_ctx is None:
        return initial_context(options)
    if not (isinstance(local_ctx, dict) and "@context" in local_ctx):
        local_ctx = {"@context": local_ctx}
    return process_context(active_ctx, local_ctx, options)


def create_node_map_api(document, options: Optional[dict] = None) -> dict:
    """Public createNodeMap (reference jsonld.js:730-748 →
    nodeMap.js:24-35 createMergedNodeMap): expand, build the graph
    map with a fresh ``_:b`` issuer (or ``options['issuer']``), and
    merge all named graphs into the default graph."""
    from .core.node_map import create_node_map, merge_node_maps
    options = _opts(options,
                    document if isinstance(document, str) else "")
    expanded = expand_document(document, options)
    issuer = options.get("issuer") or IdentifierIssuer("_:b")
    graph_map: dict = {"@default": {}}
    create_node_map(expanded, graph_map, "@default", issuer)
    return merge_node_maps(graph_map)


def merge(docs: list, ctx=None, options: Optional[dict] = None):
    """Merge multiple JSON-LD documents into one flattened document
    (cf. reference jsonld.js:770-857): expand each, relabel blank nodes
    with a per-document ``_:b<i>-`` prefix so they never collide, build a
    shared node map, fold named graphs, sort by @id, optionally compact.

    ``mergeNodes=False`` keeps only the first complete definition of each
    node id (later documents may still add to @graph entries)."""
    from .core.node_map import (create_node_map, merge_node_maps,
                                relabel_blank_nodes)
    options = _opts(options)
    merge_nodes = options.get("mergeNodes", True)
    graph_map: dict = {"@default": {}}
    # TWO-step relabeling (jsonld.js:800-830): each expanded document's
    # bnodes first get a collision-proof per-doc "_:b{i}-" prefix, then
    # the node map reissues through ONE shared "_:b" issuer in
    # first-encounter order — so merged output carries _:b0.._:bN
    shared_issuer = IdentifierIssuer("_:b")
    for i, doc in enumerate(docs):
        # deep-copy before the in-place relabel: expansion output can
        # alias sub-structures of the INPUT document (the reference is
        # immune because jsonld.js clones input at the API boundary) —
        # without this, relabeling leaks @ids into the caller's doc
        # (found by the fuzz campaign as cross-op state leakage at
        # seed 5874: merge corrupted the doc a later frame op read)
        import copy as _copy
        expanded = relabel_blank_nodes(
            _copy.deepcopy(expand_document(doc, options)),
            IdentifierIssuer(f"_:b{i}-"))
        if merge_nodes or i == 0:
            create_node_map(expanded, graph_map, "@default", shared_issuer)
        else:
            # keep-first semantics: build this doc's node map fresh
            # (same shared issuer), then fold in only MISSING keys —
            # an existing subject-reference stub is NOT replaced by a
            # later full definition (jsonld.js:815-829)
            staging: dict = {"@default": {}}
            create_node_map(expanded, staging, "@default", shared_issuer)
            for g, m in staging.items():
                if g not in graph_map:
                    graph_map[g] = m
                    continue
                target = graph_map[g]
                for node_id, node in m.items():
                    if node_id not in target:
                        target[node_id] = node
    default_graph = merge_node_maps(graph_map)
    flattened = []
    for node_id in sorted(default_graph.keys()):
        node = default_graph[node_id]
        if len(node) == 1 and "@id" in node:
            continue
        flattened.append(node)
    if ctx is None:
        return flattened
    from .core.compact import compact_document
    return compact_document(flattened, ctx, options, from_flatten=True)


def link(document, ctx=None, options: Optional[dict] = None):
    """Link a document's node references in-memory: frame with a
    wildcard frame and ``@embed: '@link'``
    (cf. reference jsonld.js:513-522)."""
    from .core.frame import frame_document
    options = _opts(options,
                    document if isinstance(document, str) else "")
    # mirror jsonld.js:513-522 exactly: the @embed flag rides IN the
    # wildcard frame (not options.embed), and the ctx check is JS
    # truthiness (`if(ctx)`) — note {} is TRUTHY in JS
    frame_doc: dict = {}
    if ctx or isinstance(ctx, (dict, list)):
        frame_doc["@context"] = ctx
    frame_doc["@embed"] = "@link"
    return frame_document(document, frame_doc, options)


def compact(document, ctx, options: Optional[dict] = None):
    from .core.compact import compact_document
    from .core.errors import JsonLdError
    if ctx is None:
        # reference jsonld.js:136-140
        raise JsonLdError("The compaction context must not be null.",
                          "invalid local context")
    options = _opts(options,
                    document if isinstance(document, str) else "")
    if options.get("compactToRelative") is False:
        # the reference DELETES options.base (jsonld.js:164-165) — and
        # the deleted state lands DIFFERENTLY on the two phases:
        # - EXPANSION inside compact resolves per-IRI with
        #   prependBase(undefined, iri) = the EMPTY-base mode
        #   ('' -> './', 'rel/../dot' -> 'dot'; context.js:1145);
        # - COMPACTION's relativization gets NULL via compactIri's
        #   destructuring default (`base = null`, compact.js:677 —
        #   `base: options.base` with undefined falls back), so IRIs
        #   stay whole — while the compaction context STILL processes
        #   under the empty-base mode (@vocab: "" resolves to './',
        #   symmetrically with expansion; fuzz seeds 240, 542, 1332).
        #   compact_iri encodes the null-relativization rule for the
        #   "" sentinel.
        from .core.url import DELETED_BASE
        options["base"] = DELETED_BASE
    if options.get("skipExpansion"):
        # input is already expanded (cf. reference jsonld.js:168-175);
        # used by frame/flatten to avoid a redundant expansion pass
        expanded = document
    else:
        expanded = expand_document(document, options)
    return compact_document(expanded, ctx, options)


def frame(document, frame_doc, options: Optional[dict] = None):
    from .core.frame import frame_document
    from .core.resolver import load_remote_document
    options = _opts(options,
                    document if isinstance(document, str) else "")
    if isinstance(frame_doc, str):
        # remote FRAME input (jsonld.js:431-449): dereference, and
        # inject a Link-header contextUrl into the frame's @context
        remote = load_remote_document(frame_doc, options)
        frame_doc = remote["document"]
        if remote["contextUrl"]:
            ctx = (frame_doc.get("@context")
                   if isinstance(frame_doc, dict) else None)
            if not ctx:
                ctx = remote["contextUrl"]
            elif isinstance(ctx, list):
                ctx = ctx + [remote["contextUrl"]]
            else:
                ctx = [ctx, remote["contextUrl"]]
            frame_doc["@context"] = ctx
    return frame_document(document, frame_doc, options)


class JsonLdProcessor:
    """WebIDL JsonLdProcessor facade (cf. reference
    lib/JsonLdProcessor.js:6-52): static expand/compact/flatten with the
    interface's required-argument arity checks; `str()` mirrors the
    JS toString tag. Functional semantics live in this module's
    free functions."""

    def __str__(self):  # pragma: no cover - trivial
        return "[object JsonLdProcessor]"

    @staticmethod
    def expand(*args):
        if len(args) < 1:
            raise TypeError("Could not expand, too few arguments.")
        return expand(args[0])

    @staticmethod
    def compact(*args):
        if len(args) < 2:
            raise TypeError("Could not compact, too few arguments.")
        return compact(args[0], args[1])

    @staticmethod
    def flatten(*args):
        if len(args) < 1:
            raise TypeError("Could not flatten, too few arguments.")
        return flatten(args[0])


__all__ = [
    "JsonLdProcessor",
    "expand", "flatten", "to_rdf", "to_nquads", "canonize",
    "canonize_dataset", "canonize_quads", "canonical_id_map", "from_rdf",
    "compact", "frame", "parse_nquads", "serialize_nquads",
    "ContextResolver", "IdentifierIssuer", "process_context",
    "initial_context",
    "set_default_event_handler", "safe_event_handler",
    "unhandled_event_handler",
]
