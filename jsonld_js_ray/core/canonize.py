"""RDF Dataset Canonicalization (RDFC-1.0 / URDNA2015).

Implemented from the public W3C RDF Dataset Canonicalization spec
(hash-first-degree-quads, hash-related-blank-node, hash-n-degree-quads with
permutation search, canonical issuer ``_:c14n<n>``, code-point-sorted
canonical N-Quads). The reference delegates this to the external
rdf-canonize package (/root/reference/lib/jsonld.js:592,603; SURVEY.md
header note) — this is a fresh implementation, with a work-factor bound
analogous to the reference's ``maxWorkFactor`` option to survive
adversarial ("poison") graphs."""

from __future__ import annotations

import hashlib
from itertools import permutations

from .errors import JsonLdError
from .node_map import IdentifierIssuer
from .nquads import serialize_quad
from .to_rdf import OBJ_BNODE, Quad


_DIGESTS = {"sha256": hashlib.sha256, "sha384": hashlib.sha384,
            "sha512": hashlib.sha512}


def _digest_fn(name: str):
    """RDFC-1.0 message digest choice (the spec requires SHA-256 default
    and SHA-384 support; rdf-canonize also accepts SHA-512 — reference
    surface lib/jsonld.js:551-559 passes messageDigestAlgorithm through)."""
    try:
        return _DIGESTS[name.lower().replace("-", "")]
    except (KeyError, AttributeError):
        raise JsonLdError(
            f"Unsupported message digest algorithm: {name!r}.",
            "invalid message digest algorithm")


class _CanonState:
    __slots__ = ("bnode_to_quads", "hash_to_bnodes", "canonical_issuer",
                 "work_budget", "_digest")

    def __init__(self, max_deep_iterations: int,
                 message_digest_algorithm: str = "sha256"):
        self.bnode_to_quads: dict[str, list[Quad]] = {}
        self.hash_to_bnodes: dict[str, list[str]] = {}
        self.canonical_issuer = IdentifierIssuer("_:c14n")
        self.work_budget = max_deep_iterations
        self._digest = _digest_fn(message_digest_algorithm)

    def hash(self, s: str) -> str:
        return self._digest(s.encode("utf-8")).hexdigest()


def _quad_bnodes(q: Quad):
    if q[0].startswith("_:"):
        yield q[0]
    if q[2] == OBJ_BNODE:
        yield q[3]
    if q[6].startswith("_:"):
        yield q[6]


def _serialize_for_hash(q: Quad, ref: str) -> str:
    s, p, o_kind, o_value, dt, lang, g = q
    if s.startswith("_:"):
        s = "_:a" if s == ref else "_:z"
    if o_kind == OBJ_BNODE:
        o_value = "_:a" if o_value == ref else "_:z"
    if g.startswith("_:"):
        g = "_:a" if g == ref else "_:z"
    return serialize_quad((s, p, o_kind, o_value, dt, lang, g)) + "\n"


def _hash_first_degree(state: _CanonState, bnode: str) -> str:
    nquads = sorted(_serialize_for_hash(q, bnode)
                    for q in state.bnode_to_quads[bnode])
    return state.hash("".join(nquads))


def _hash_related(state: _CanonState, related: str, quad: Quad,
                  issuer: IdentifierIssuer, position: str,
                  fdh_cache: dict) -> str:
    if state.canonical_issuer.has_id(related):
        ident = state.canonical_issuer.issued[related]
    elif issuer.has_id(related):
        ident = issuer.issued[related]
    else:
        if related not in fdh_cache:
            fdh_cache[related] = _hash_first_degree(state, related)
        ident = fdh_cache[related]
    inp = position
    if position != "g":
        inp += "<" + quad[1] + ">"
    inp += ident
    return state.hash(inp)


def _hash_n_degree(state: _CanonState, bnode: str,
                   issuer: IdentifierIssuer, fdh_cache: dict,
                   depth: int = 0):
    """Hash N-Degree Quads (RDFC-1.0 §4.8). Returns (hash, issuer)."""
    if state.work_budget is not None:
        state.work_budget -= 1
        if state.work_budget < 0:
            raise JsonLdError(
                "Maximum deep iterations exceeded during "
                "canonicalization (poison graph?).",
                "canonicalization work factor exceeded")

    hash_to_related: dict[str, list[str]] = {}
    for quad in state.bnode_to_quads[bnode]:
        positions = []
        if quad[0].startswith("_:") and quad[0] != bnode:
            positions.append(("s", quad[0]))
        if quad[2] == OBJ_BNODE and quad[3] != bnode:
            positions.append(("o", quad[3]))
        if quad[6].startswith("_:") and quad[6] != bnode:
            positions.append(("g", quad[6]))
        for position, related in positions:
            h = _hash_related(state, related, quad, issuer, position,
                              fdh_cache)
            hash_to_related.setdefault(h, []).append(related)

    data_to_hash = []
    for related_hash in sorted(hash_to_related.keys()):
        data_to_hash.append(related_hash)
        chosen_path = ""
        chosen_issuer = None
        bnode_list = hash_to_related[related_hash]
        if state.work_budget is not None and len(bnode_list) > 8:
            raise JsonLdError(
                "Too many interchangeable blank nodes for permutation "
                "search.", "canonicalization work factor exceeded")
        for perm in permutations(bnode_list):
            issuer_copy = issuer.clone()
            path_parts = []
            recursion_list = []
            skip = False
            for related in perm:
                if state.canonical_issuer.has_id(related):
                    path_parts.append(state.canonical_issuer.issued[related])
                else:
                    if not issuer_copy.has_id(related):
                        recursion_list.append(related)
                    path_parts.append(issuer_copy.get_id(related))
                path = "".join(path_parts)
                if chosen_path and len(path) >= len(chosen_path) \
                        and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            for related in recursion_list:
                result_hash, result_issuer = _hash_n_degree(
                    state, related, issuer_copy, fdh_cache, depth + 1)
                path_parts.append(issuer_copy.get_id(related))
                path_parts.append("<" + result_hash + ">")
                issuer_copy = result_issuer
                path = "".join(path_parts)
                if chosen_path and len(path) >= len(chosen_path) \
                        and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            path = "".join(path_parts)
            if not chosen_path or path < chosen_path:
                chosen_path = path
                chosen_issuer = issuer_copy
        data_to_hash.append(chosen_path)
        if chosen_issuer is not None:
            issuer = chosen_issuer

    return state.hash("".join(data_to_hash)), issuer


def _compute_mapping(quads: list[Quad],
                     max_deep_iterations: int | None,
                     message_digest_algorithm: str = "sha256"
                     ) -> dict[str, str]:
    """Canonical Issuance (RDFC-1.0 §4.4): input bnode label → c14n label."""
    # An RDF dataset is a SET of quads (RDFC-1.0 §2; the reference's
    # rdf-canonize NQuads.parse likewise only adds a quad if unique in
    # its graph) — dedupe before hashing so a repeated quad in a raw
    # quad ARRAY can't skew first/n-degree hashes; found by the
    # canonize campaign's fixpoint oracle (canonize(parse(out)) == out)
    # at seeds 275/998/1566/1830.
    quads = list(dict.fromkeys(quads))
    state = _CanonState(max_deep_iterations, message_digest_algorithm)
    for q in quads:
        for b in _quad_bnodes(q):
            state.bnode_to_quads.setdefault(b, []).append(q)

    fdh_cache: dict[str, str] = {}
    for bnode in state.bnode_to_quads:
        h = _hash_first_degree(state, bnode)
        fdh_cache[bnode] = h
        state.hash_to_bnodes.setdefault(h, []).append(bnode)

    non_unique: list[list[str]] = []
    for h in sorted(state.hash_to_bnodes.keys()):
        members = state.hash_to_bnodes[h]
        if len(members) == 1:
            state.canonical_issuer.get_id(members[0])
        else:
            non_unique.append(members)

    for members in non_unique:
        hash_path_list = []
        for bnode in members:
            if state.canonical_issuer.has_id(bnode):
                continue
            temp_issuer = IdentifierIssuer("_:b")
            temp_issuer.get_id(bnode)
            result = _hash_n_degree(state, bnode, temp_issuer, fdh_cache)
            hash_path_list.append((result[0], result[1]))
        for _, issuer in sorted(hash_path_list, key=lambda x: x[0]):
            for old in issuer.issued:
                state.canonical_issuer.get_id(old)

    return dict(state.canonical_issuer.issued)


def canonize_quads(quads: list[Quad],
                   max_deep_iterations: int | None = 2000,
                   message_digest_algorithm: str = "sha256"
                   ) -> list[Quad]:
    """Return quads relabeled with canonical ``_:c14n<n>`` blank-node ids."""
    mapping = _compute_mapping(quads, max_deep_iterations,
                               message_digest_algorithm)

    def relabel(q: Quad) -> Quad:
        s, p, o_kind, o_value, dt, lang, g = q
        if s.startswith("_:"):
            s = mapping.get(s, s)
        if o_kind == OBJ_BNODE:
            o_value = mapping.get(o_value, o_value)
        if g.startswith("_:"):
            g = mapping.get(g, g)
        return (s, p, o_kind, o_value, dt, lang, g)

    return [relabel(q) for q in quads]


def canonize(quads: list[Quad],
             max_deep_iterations: int | None = 2000,
             message_digest_algorithm: str = "sha256") -> str:
    """Canonical N-Quads document: relabel + code-point sort + dedup."""
    relabeled = canonize_quads(quads, max_deep_iterations,
                               message_digest_algorithm)
    lines = sorted(set(serialize_quad(q) + "\n" for q in relabeled))
    return "".join(lines)


def canonical_id_map(quads: list[Quad],
                     max_deep_iterations: int | None = 2000,
                     message_digest_algorithm: str = "sha256") -> dict:
    """Expose the issued canonical-label map (input label → c14n label),
    mirroring the reference's ``canonicalIdMap`` option
    (/root/reference/lib/jsonld.js:577-580)."""
    return _compute_mapping(quads, max_deep_iterations,
                            message_digest_algorithm)
