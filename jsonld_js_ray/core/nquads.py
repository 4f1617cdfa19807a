"""N-Quads serialization and parsing.

Implements N-Quads (W3C RDF 1.1 N-Quads grammar) with the canonical
escaping used by the reference's serializer (the public rdf-canonize
semantics delegated at /root/reference/lib/NQuads.js:7): backslash, tab,
newline, carriage return, and double quote escaped; everything else
emitted raw (UTF-8)."""

from __future__ import annotations

import re

from .errors import JsonLdError
from .keywords import RDF_LANGSTRING, XSD_STRING
from .to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL, Quad

_ESCAPES = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r",
            '"': '\\"'}
_ESCAPE_RE = re.compile(r'[\\\t\n\r"]')
_UNESCAPE_RE = re.compile(
    r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\(.)")
_UNESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                 '"': '"', "'": "'", "\\": "\\"}


def _escape(s: str) -> str:
    return _ESCAPE_RE.sub(lambda m: _ESCAPES[m.group(0)], s)


def _unescape(s: str) -> str:
    def sub(m):
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        c = m.group(3)
        if c in _UNESCAPE_MAP:
            return _UNESCAPE_MAP[c]
        raise JsonLdError(f"Invalid escape \\{c} in N-Quads literal.",
                          "invalid N-Quads")
    return _UNESCAPE_RE.sub(sub, s)


def serialize_quad(q: Quad) -> str:
    s, p, o_kind, o_value, datatype, language, graph = q
    parts = []
    parts.append(s if s.startswith("_:") else f"<{s}>")
    parts.append(p if p.startswith("_:") else f"<{p}>")
    if o_kind == OBJ_LITERAL:
        lit = f'"{_escape(o_value)}"'
        # language prints ONLY for rdf:langString datatypes; a literal
        # carrying both a datatype and a language (garbage value
        # objects from @type-map keys) serializes as a typed literal
        # (rdf-canonize NQuads serializeQuad semantics)
        if language and (datatype is None or datatype == RDF_LANGSTRING):
            lit += f"@{language}"
        elif datatype and datatype != XSD_STRING:
            lit += f"^^<{datatype}>"
        parts.append(lit)
    elif o_kind == OBJ_BNODE:
        parts.append(o_value)
    else:
        parts.append(f"<{o_value}>")
    if graph:
        parts.append(graph if graph.startswith("_:") else f"<{graph}>")
    return " ".join(parts) + " ."


def serialize(quads: list[Quad], sort: bool = False) -> str:
    lines = [serialize_quad(q) + "\n" for q in quads]
    if sort:
        lines = sorted(set(lines))
    return "".join(lines)


# N-Quads line grammar
_IRI = r"<([^:]+:[^\s>]*)>"
_BNODE = r"(_:(?:[A-Za-z0-9_.\-]+))"
_PLAIN = r'"((?:[^"\\\n\r]|\\.)*)"'
_DATATYPE = rf"\^\^{_IRI}"
_LANGUAGE = r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)"
_LITERAL = rf"(?:{_PLAIN}(?:{_DATATYPE}|{_LANGUAGE})?)"
_WS = r"[ \t]+"
_WSO = r"[ \t]*"
_SUBJECT = rf"(?:{_IRI}|{_BNODE}){_WS}"
_PREDICATE = rf"(?:{_IRI}|{_BNODE}){_WS}"
_OBJECT = rf"(?:{_IRI}|{_BNODE}|{_LITERAL}){_WSO}"
_GRAPH = rf"(?:\.|(?:(?:{_IRI}|{_BNODE}){_WSO}\.))"
_QUAD_RE = re.compile(
    rf"^{_WSO}{_SUBJECT}{_PREDICATE}{_OBJECT}{_GRAPH}{_WSO}$")
_EMPTY_RE = re.compile(r"^[ \t]*(#.*)?$")


def parse(text: str) -> list[Quad]:
    """Parse N-Quads text into quads (line-oriented; comments allowed)."""
    quads: list[Quad] = []
    # eoln = \r\n | \n | \r (matches rdf-canonize's line splitting)
    for line_no, line in enumerate(re.split(r"\r\n|\n|\r", text), 1):
        if _EMPTY_RE.match(line):
            continue
        m = _QUAD_RE.match(line)
        if m is None:
            raise JsonLdError(
                f"Error while parsing N-Quads at line {line_no}: {line!r}",
                "invalid N-Quads")
        g = m.groups()
        # group layout: 0 s-iri, 1 s-bnode, 2 p-iri, 3 p-bnode,
        # 4 o-iri, 5 o-bnode, 6 o-lit, 7 o-datatype, 8 o-lang,
        # 9 g-iri, 10 g-bnode
        subject = g[0] if g[0] is not None else g[1]
        predicate = g[2] if g[2] is not None else g[3]
        if g[4] is not None:
            o = (OBJ_IRI, g[4], None, None)
        elif g[5] is not None:
            o = (OBJ_BNODE, g[5], None, None)
        else:
            value = _unescape(g[6] if g[6] is not None else "")
            if g[8] is not None:
                o = (OBJ_LITERAL, value, RDF_LANGSTRING, g[8])
            elif g[7] is not None:
                o = (OBJ_LITERAL, value, g[7], None)
            else:
                o = (OBJ_LITERAL, value, XSD_STRING, None)
        graph = g[9] if g[9] is not None else (g[10] or "")
        quads.append((subject, predicate, o[0], o[1], o[2], o[3], graph))
    # exact-duplicate removal, preserving first occurrence (dataset = set)
    seen = set()
    out = []
    for q in quads:
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out
