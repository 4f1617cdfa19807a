"""RFC 3986 IRI parsing and reference resolution.

Implements the algorithms of RFC 3986 §5.2 (resolution, merge paths,
remove_dot_segments) to match the observable behavior of the reference's
URL handling (/root/reference/lib/url.js:16-274), including its edge cases:
empty base paths, network-path references, and keeping a lone trailing
slash. Written from the RFC, not translated from the reference.
"""

from __future__ import annotations

import re
from functools import lru_cache

# RFC 3986 appendix B regex
# scheme per the reference's FULL parser (url.js:31): letter-first,
# then [a-zA-Z0-9+-.] — a JS char-class RANGE from '+' (0x2B) to '.'
# (0x2E), i.e. + , - . — so digit-first "schemes" like '34:x' parse as
# PATH and resolve against the base verbatim (fixture t0300; a latent
# mismatch the simple [^:/?#]+ pattern hid until the empty-base mode)
_URL_RE = re.compile(
    r"^(([a-zA-Z][a-zA-Z0-9+,\-.]*):)?(//([^/?#]*))?([^?#]*)"
    r"(\?([^#]*))?(#(.*))?$")


class DeletedBase(str):
    """Sentinel for the reference's DELETED ``options.base``
    (compactToRelative=false, jsonld.js:164-165). It compares equal to
    ``""`` so every empty-base RESOLUTION path treats it as the empty
    base, but compaction's relativization distinguishes it: a deleted
    base reaches compactIri as undefined -> null (compact.js:677,
    no-op), while a genuinely EMPTY base ('' — the omitted-base default
    of compact/flatten/frame) actively relativizes via removeBase."""


DELETED_BASE = DeletedBase("")


class ParsedUrl:
    __slots__ = ("scheme", "authority", "path", "query", "fragment",
                 "has_authority", "has_query", "has_fragment")

    def __init__(self, scheme, authority, path, query, fragment,
                 has_authority, has_query, has_fragment):
        self.scheme = scheme
        self.authority = authority
        self.path = path
        self.query = query
        self.fragment = fragment
        self.has_authority = has_authority
        self.has_query = has_query
        self.has_fragment = has_fragment


@lru_cache(maxsize=4096)
def parse_url(url: str) -> ParsedUrl:
    m = _URL_RE.match(url)
    scheme = m.group(2)
    has_authority = m.group(3) is not None
    authority = m.group(4) if has_authority else None
    # the reference's parser strips DEFAULT PORTS (url.js:44-49:
    # https:443 / http:80 — a first-occurrence string replace on the
    # authority), so base resolution and relativization treat
    # 'https://h.example:443/' and 'https://h.example/' as the same
    # root (wave-16 probe)
    if authority:
        if scheme == "https" and authority.endswith(":443"):
            authority = authority.replace(":443", "", 1)
        elif scheme == "http" and authority.endswith(":80"):
            authority = authority.replace(":80", "", 1)
    path = m.group(5) or ""
    has_query = m.group(6) is not None
    query = m.group(7) if has_query else None
    has_fragment = m.group(8) is not None
    fragment = m.group(9) if has_fragment else None
    return ParsedUrl(scheme, authority, path, query, fragment,
                     has_authority, has_query, has_fragment)


def remove_dot_segments(path: str) -> str:
    """The reference's REWORKED RFC 3986 §5.2.4 (url.js:96-140), not
    the literal RFC algorithm: segments split on '/', '..' pops the
    previous segment unconditionally. The two agree on every absolute
    path, but differ on RELATIVE paths where '..' consumes a preceding
    segment — 'rel/../dot' yields 'dot' here vs the RFC's '/dot'
    (reachable only through the empty-base mode; fuzz seed 240)."""
    if not path:
        return ""
    segments = path.split("/")
    output: list[str] = []
    for i, nxt in enumerate(segments):
        done = i == len(segments) - 1
        if nxt == ".":
            if done:
                output.append("")  # trailing /
            continue
        if nxt == "..":
            if output:
                output.pop()
            if done:
                output.append("")  # trailing /
            continue
        output.append(nxt)
    if path.startswith("/") and output and output[0] != "":
        output.insert(0, "")
    if output == [""]:
        return "/"
    return "/".join(output)


def _merge_paths(base: ParsedUrl, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base.has_authority and not base.path:
        return "/" + ref_path
    i = base.path.rfind("/")
    if i == -1:
        return ref_path
    return base.path[: i + 1] + ref_path


def _recompose(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


def prepend_base(base, iri: str) -> str:
    """Resolve ``iri`` against ``base`` per RFC 3986 §5.2.2.

    ``base`` may be None (no-op) or a string.
    """
    if base is None:
        return iri
    if iri is None:
        return iri
    b = parse_url(base) if isinstance(base, str) else base
    r = parse_url(iri)

    # a scheme'd reference counts as absolute ONLY when it passes the
    # strict no-whitespace absolute-IRI test — the reference's
    # prependBase (url.js:63-71) gates on isAbsolute and otherwise
    # resolves RELATIVE with the base's scheme, discarding the parsed
    # scheme (so "urn:has space" resolves to <base-dir>/has space)
    from .keywords import is_absolute_iri
    if r.scheme is not None and is_absolute_iri(iri):
        scheme = r.scheme
        authority = r.authority if r.has_authority else None
        path = remove_dot_segments(r.path)
        query = r.query if r.has_query else None
    elif r.has_authority:
        scheme = b.scheme
        authority = r.authority
        path = remove_dot_segments(r.path)
        query = r.query if r.has_query else None
    else:
        scheme = b.scheme
        authority = b.authority if b.has_authority else None
        if r.path == "":
            path = b.path
            query = (r.query if r.has_query
                     else (b.query if b.has_query else None))
        else:
            if r.path.startswith("/"):
                path = remove_dot_segments(r.path)
            else:
                path = remove_dot_segments(_merge_paths(b, r.path))
            query = r.query if r.has_query else None
    fragment = r.fragment if r.has_fragment else None
    rv = _recompose(scheme, authority, path, query, fragment)
    if rv == "":
        return "./"
    return rv


def remove_base(base, iri: str) -> str:
    """Make ``iri`` relative to ``base`` where possible (compaction helper).

    Faithful mirror of the reference removeBase (url.js:155-223): the
    root is the RAW STRING (protocol||'')+'//'+(authority||'') of the
    parsed base and membership is a plain string-prefix test — so a
    RELATIVE base (root '//') leaves almost every IRI whole (wave-13
    seed 24899: a scoped relative @base under compactToRelative=false),
    a scheme-only base like 'urn:x' never relativizes anything (root
    'urn://'), and prefix-colliding authorities DO relativize
    ('https://x/y' vs 'https://xyz/w' -> 'yz/w' — reference quirk).
    Segment matching runs on normalizedPath (dot segments removed);
    the last-segment rule uses JS truthiness, so an EMPTY query or
    fragment counts as absent (url.js:186)."""
    if base is None:
        return iri
    b = parse_url(base)
    if base != "":
        root = (((b.scheme + ":") if b.scheme is not None else "")
                + "//"
                + (b.authority if b.has_authority and b.authority
                   is not None else ""))
    else:
        # empty base (url.js:168-171): root stays '' only for
        # network-path references; every other IRI gets root '//',
        # fails the prefix test, and returns unchanged
        root = "" if iri.startswith("//") else "//"
    if not iri.startswith(root):
        return iri
    rel = parse_url(iri[len(root):])
    base_segments = remove_dot_segments(b.path).split("/")
    iri_segments = remove_dot_segments(rel.path).split("/")
    # the final segment may also be consumed when the IRI carries a
    # NON-EMPTY fragment or query (url.js:186 JS truthiness:
    # `last = (rel.fragment || rel.query) ? 0 : 1`)
    last = 0 if (rel.fragment or rel.query) else 1
    while (len(base_segments) > 0 and len(iri_segments) > last
           and base_segments[0] == iri_segments[0]):
        base_segments.pop(0)
        iri_segments.pop(0)

    rval = ""
    if base_segments:
        # up-dirs: ignore the trailing filename segment of the base
        base_segments.pop()
        rval += "../" * len(base_segments)
    rval += "/".join(iri_segments)
    if rel.has_query:
        rval += "?" + (rel.query or "")
    if rel.has_fragment:
        rval += "#" + (rel.fragment or "")
    if rval == "":
        rval = "./"
    return rval
