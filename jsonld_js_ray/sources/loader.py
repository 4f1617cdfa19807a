"""Link-header parsing + an offline, loader-shaped snapshot adapter.

Mirrors the semantics of the reference's HTTP document loader
(/root/reference/lib/documentLoaders/node.js:34-199) and Link-header
parser (lib/util.js:105-147) without any network: snapshot entries are
either plain parsed documents (the fast path used by the cluster
pipelines) or response dicts ``{"status": int, "headers": {...},
"document": ...}`` that model what an HTTP server would have returned —
status errors, ``Link`` context discovery, ``alternate`` redirects,
``Location`` chains. That closes the API gap for users whose pipelines
feed URL inputs while keeping the sandbox fully offline."""

from __future__ import annotations

import re

from ..core.errors import JsonLdError
from ..core.url import prepend_base

LINK_HEADER_CONTEXT = "http://www.w3.org/ns/json-ld#context"

# split a Link header on commas that are outside <...> and "..."
_LINK_ENTRIES_RE = re.compile(r'(?:<[^>]*?>|"[^"]*?"|[^,])+')
_LINK_HEADER_RE = re.compile(r'\s*<([^>]*?)>\s*(?:;\s*(.*))?')
_LINK_PARAMS_RE = re.compile(
    r'(.*?)=(?:(?:"([^"]*?)")|([^"]*?))\s*(?:(?:;\s*)|$)')

_JSON_CONTENT_TYPE_RE = re.compile(r"^application/(\w*\+)?json$")


def parse_link_header(header: str) -> dict:
    """Parse an HTTP ``Link`` header into a dict keyed by ``rel``.

    ``Link: <http://e/ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context";
    type="application/ld+json"`` parses to ``{rel: {"target": ...,
    "type": ...}}``; several entries sharing a rel collapse into a list
    (reference util.js:123-147)."""
    rval: dict = {}
    for entry in _LINK_ENTRIES_RE.findall(header):
        m = _LINK_HEADER_RE.search(entry)
        if not m:
            continue
        result = {"target": m.group(1)}
        params = m.group(2) or ""
        for pm in _LINK_PARAMS_RE.finditer(params):
            result[pm.group(1)] = (pm.group(3) if pm.group(2) is None
                                   else pm.group(2))
        rel = result.get("rel", "")
        existing = rval.get(rel)
        if isinstance(existing, list):
            existing.append(result)
        elif existing is not None:
            rval[rel] = [existing, result]
        else:
            rval[rel] = result
    return rval


def _header(headers: dict, name: str):
    for k, v in headers.items():
        if k.lower() == name:
            return v
    return None


class SnapshotDocumentLoader:
    """Offline document loader with node-loader semantics.

    ``snapshot`` maps absolute URL → either a parsed document (returned
    directly) or a response dict ``{"status": int, "headers": {...},
    "document": ...}``. Returns the reference's RemoteDocument shape
    ``{"contextUrl", "documentUrl", "document"}``."""

    def __init__(self, snapshot: dict, secure: bool = False,
                 max_redirects: int = -1):
        self.snapshot = snapshot
        self.secure = secure
        self.max_redirects = max_redirects

    def __call__(self, url: str) -> dict:
        return self._load(url, [])

    def _load(self, url: str, redirects: list) -> dict:
        is_http = url.startswith("http:")
        is_https = url.startswith("https:")
        if not is_http and not is_https:
            raise JsonLdError(
                'URL could not be dereferenced; only "http" and "https" '
                "URLs are supported.", "loading document failed",
                {"url": url})
        if self.secure and not is_https:
            raise JsonLdError(
                "URL could not be dereferenced; secure mode is enabled "
                'and the URL\'s scheme is not "https".',
                "loading document failed", {"url": url})

        entry = self.snapshot.get(url)
        if entry is None:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: not in the '
                "offline snapshot.", "loading document failed",
                {"url": url, "httpStatusCode": 404})
        if not (isinstance(entry, dict)
                and ("status" in entry or "headers" in entry)):
            return {"contextUrl": None, "documentUrl": url,
                    "document": entry}

        status = entry.get("status", 200)
        headers = entry.get("headers", {})
        doc = {"contextUrl": None, "documentUrl": url,
               "document": entry.get("document")}
        if status >= 400:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: HTTP {status}.',
                "loading document failed",
                {"url": url, "httpStatusCode": status})

        link = _header(headers, "link")
        location = _header(headers, "location")
        content_type = _header(headers, "content-type")
        alternate = None
        if link and content_type != "application/ld+json":
            link_headers = parse_link_header(link)
            linked_context = link_headers.get(LINK_HEADER_CONTEXT)
            if isinstance(linked_context, list):
                raise JsonLdError(
                    "URL could not be dereferenced, it has more than one "
                    "associated HTTP Link Header.",
                    "multiple context link headers", {"url": url})
            if linked_context:
                doc["contextUrl"] = linked_context["target"]
            # an "alternate" application/ld+json link is a redirect
            # when the body itself is not some flavor of JSON; NOTE the
            # reference treats ANY alternate link + Location header as a
            # redirect trigger below, matching that exactly
            alternate = link_headers.get("alternate")
            if (isinstance(alternate, dict)
                    and alternate.get("type") == "application/ld+json"
                    and not _JSON_CONTENT_TYPE_RE.match(
                        content_type or "")):
                location = prepend_base(url, alternate["target"])

        if (alternate or 300 <= status < 400) and location:
            if len(redirects) == self.max_redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; there were too many "
                    "redirects.", "loading document failed",
                    {"url": url, "httpStatusCode": status,
                     "redirects": list(redirects)})
            if url in redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; infinite redirection "
                    "was detected.", "recursive context inclusion",
                    {"url": url, "httpStatusCode": status,
                     "redirects": list(redirects)})
            redirects.append(url)
            return self._load(prepend_base(url, location), redirects)

        return doc
