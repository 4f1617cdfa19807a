"""Link-header parsing + offline snapshot loader semantics, mirroring
the reference's tests/node-document-loader-tests.js cases (link header,
link context header, alternate redirect, secure mode, bad status) with
snapshot-backed responses instead of a live HTTP server."""

import pytest

from jsonld_js_ray import api
from jsonld_js_ray.core.errors import JsonLdError
from jsonld_js_ray.core.resolver import ContextResolver
from jsonld_js_ray.sources.loader import (
    LINK_HEADER_CONTEXT, SnapshotDocumentLoader, parse_link_header)

CTX_URL = "https://site.example/ctx.jsonld"
DOC_URL = "https://site.example/doc"


def test_parse_link_header_docstring_example():
    h = ('<http://json-ld.org/contexts/person.jsonld>; '
         'rel="http://www.w3.org/ns/json-ld#context"; '
         'type="application/ld+json"')
    out = parse_link_header(h)
    assert out == {LINK_HEADER_CONTEXT: {
        "target": "http://json-ld.org/contexts/person.jsonld",
        "rel": LINK_HEADER_CONTEXT,
        "type": "application/ld+json"}}


def test_parse_link_header_multiple_same_rel_collapse_to_list():
    h = ('<http://a.example/one>; rel="next", '
         '<http://a.example/two>; rel="next", '
         '<http://a.example/alt>; rel="alternate"')
    out = parse_link_header(h)
    assert [e["target"] for e in out["next"]] == [
        "http://a.example/one", "http://a.example/two"]
    assert out["alternate"]["target"] == "http://a.example/alt"


def test_parse_link_header_unquoted_params_and_commas_in_brackets():
    h = '<http://a.example/x,y>; rel=alternate; type=text/html'
    out = parse_link_header(h)
    assert out["alternate"] == {"target": "http://a.example/x,y",
                                "rel": "alternate",
                                "type": "text/html"}


def test_loader_plain_snapshot_entry_is_remote_document():
    loader = SnapshotDocumentLoader({CTX_URL: {"@context": {"a": "b"}}})
    doc = loader(CTX_URL)
    assert doc == {"contextUrl": None, "documentUrl": CTX_URL,
                   "document": {"@context": {"a": "b"}}}


def test_loader_link_context_header_discovery():
    loader = SnapshotDocumentLoader({
        DOC_URL: {
            "status": 200,
            "headers": {
                "Content-Type": "application/json",
                "Link": f'<{CTX_URL}>; rel="{LINK_HEADER_CONTEXT}"'},
            "document": {"name": "x"}},
    })
    doc = loader(DOC_URL)
    assert doc["contextUrl"] == CTX_URL
    assert doc["document"] == {"name": "x"}


def test_loader_link_header_ignored_for_ld_json():
    loader = SnapshotDocumentLoader({
        DOC_URL: {
            "status": 200,
            "headers": {
                "Content-Type": "application/ld+json",
                "Link": f'<{CTX_URL}>; rel="{LINK_HEADER_CONTEXT}"'},
            "document": {"name": "x"}},
    })
    assert loader(DOC_URL)["contextUrl"] is None


def test_loader_multiple_context_links_error():
    loader = SnapshotDocumentLoader({
        DOC_URL: {
            "status": 200,
            "headers": {
                "Content-Type": "application/json",
                "Link": (f'<{CTX_URL}>; rel="{LINK_HEADER_CONTEXT}", '
                         f'<{CTX_URL}2>; rel="{LINK_HEADER_CONTEXT}"')},
            "document": {}},
    })
    with pytest.raises(JsonLdError) as e:
        loader(DOC_URL)
    assert e.value.code == "multiple context link headers"


def test_loader_alternate_redirect():
    alt = "https://site.example/alt.jsonld"
    loader = SnapshotDocumentLoader({
        DOC_URL: {
            "status": 200,
            "headers": {
                "Content-Type": "text/html",
                "Link": '<alt.jsonld>; rel="alternate"; '
                        'type="application/ld+json"'},
            "document": "<html></html>"},
        alt: {"@context": {}, "@id": "https://site.example/me"},
    })
    doc = loader(DOC_URL)
    assert doc["documentUrl"] == alt
    assert doc["document"]["@id"] == "https://site.example/me"


def test_loader_redirect_chain_and_loop_detection():
    a, b = "https://site.example/a", "https://site.example/b"
    loader = SnapshotDocumentLoader({
        a: {"status": 301, "headers": {"Location": b}},
        b: {"status": 200, "headers": {}, "document": {"ok": 1}},
    })
    assert loader(a)["document"] == {"ok": 1}

    looping = SnapshotDocumentLoader({
        a: {"status": 301, "headers": {"Location": b}},
        b: {"status": 302, "headers": {"Location": a}},
    })
    with pytest.raises(JsonLdError) as e:
        looping(a)
    assert e.value.code == "recursive context inclusion"

    capped = SnapshotDocumentLoader({
        a: {"status": 301, "headers": {"Location": b}},
        b: {"status": 200, "headers": {}, "document": {"ok": 1}},
    }, max_redirects=0)
    with pytest.raises(JsonLdError):
        capped(a)


def test_loader_bad_status_and_secure_mode():
    loader = SnapshotDocumentLoader(
        {DOC_URL: {"status": 404, "headers": {}}})
    with pytest.raises(JsonLdError) as e:
        loader(DOC_URL)
    assert e.value.code == "loading document failed"

    secure = SnapshotDocumentLoader({}, secure=True)
    with pytest.raises(JsonLdError):
        secure("http://insecure.example/doc")
    with pytest.raises(JsonLdError):
        SnapshotDocumentLoader({})("ftp://no.example/x")


def test_resolver_appends_link_discovered_context():
    """A Link-discovered contextUrl is appended for resolution in turn
    (reference ContextResolver.js:202-207), so expansion picks up the
    linked context."""
    linked = "https://site.example/linked-ctx.jsonld"
    loader = SnapshotDocumentLoader({
        CTX_URL: {
            "status": 200,
            "headers": {
                "Content-Type": "application/json",
                "Link": f'<{linked}>; rel="{LINK_HEADER_CONTEXT}"'},
            "document": {}},
        linked: {"@context": {"name": "http://x.example/name"}},
    })
    resolver = ContextResolver(snapshot={}, document_loader=loader)
    out = api.expand({"@context": CTX_URL, "name": "alice"},
                     {"contextResolver": resolver})
    assert out == [{"http://x.example/name": [{"@value": "alice"}]}]


# ---- remote-document INPUT (jsonld.js:295-314, 888-918) ----------------

DOCS_URL = "https://site.example/docs/input.jsonld"


def test_expand_remote_document_input_documentUrl_base():
    """A string input dereferences via the loader; with NO base option
    the redirected documentUrl becomes the base (jsonld.js:311-314)."""
    snap = {DOCS_URL: {
        "document": {"@id": "child", "http://v/p": "v"},
        "documentUrl": "https://moved.example/dir/doc"}}
    out = api.expand(DOCS_URL, {"contexts": snap})
    assert out == [{"@id": "https://moved.example/dir/child",
                    "http://v/p": [{"@value": "v"}]}]
    # an explicit base PINS: documentUrl must not win
    out = api.expand(DOCS_URL, {"contexts": snap,
                                "base": "https://pin.example/b/"})
    assert out[0]["@id"] == "https://pin.example/b/child"


def test_compact_remote_input_bases_on_input_url_not_redirect():
    """compact/flatten/frame default base to the INPUT url
    (jsonld.js:149,371,421), so a redirect does NOT change the base."""
    snap = {DOCS_URL: {
        "document": {"@id": "child", "http://v/p": "v"},
        "documentUrl": "https://moved.example/dir/doc"}}
    out = api.compact(DOCS_URL, {}, {"contexts": snap})
    assert out["@id"] == "child"  # relativized against the input url
    flat = api.flatten(DOCS_URL, None, {"contexts": snap})
    assert flat[0]["@id"] == "https://site.example/docs/child"


def test_remote_document_string_payload_and_link_context():
    """String payloads JSON-parse (jsonld.get, jsonld.js:902-906); a
    Link-header contextUrl on the DOCUMENT is processed as a context
    before the document's own."""
    import json as _json
    ctx_url = "https://site.example/linkctx.jsonld"
    snap = {
        DOCS_URL: {
            "document": _json.dumps({"name": "alice"}),
            "documentUrl": DOCS_URL, "contextUrl": ctx_url},
        ctx_url: {"@context": {"name": "http://x.example/name"}},
    }
    out = api.expand(DOCS_URL, {"contexts": snap})
    assert out == [{"http://x.example/name": [{"@value": "alice"}]}]


def test_remote_frame_input_with_link_context():
    """A string FRAME dereferences too; its Link contextUrl is injected
    into the frame's @context (jsonld.js:431-449)."""
    frame_url = "https://site.example/frame.jsonld"
    ctx_url = "https://site.example/fctx.jsonld"
    snap = {
        frame_url: {
            "document": {"@type": "http://t.example/T"},
            "documentUrl": frame_url, "contextUrl": ctx_url},
        ctx_url: {"@context": {"nm": "http://x.example/nm"}},
    }
    doc = {"@id": "urn:a", "@type": "http://t.example/T",
           "http://x.example/nm": "z"}
    out = api.frame(doc, frame_url, {"contexts": snap})
    assert out["nm"] == "z"  # linked context compacted the property


def test_remote_document_load_failures():
    with pytest.raises(JsonLdError) as e:
        api.expand("https://nowhere.example/x", {"contexts": {}})
    assert e.value.code == "loading document failed"
    # unparseable string payload
    snap = {DOCS_URL: {"document": "{not json", "documentUrl": DOCS_URL}}
    with pytest.raises(JsonLdError) as e:
        api.expand(DOCS_URL, {"contexts": snap})
    assert e.value.code == "loading document failed"


def test_omitted_base_is_empty_base_not_null():
    """The omitted-base default is the EMPTY base: dot segments
    resolve ('rel/../dot' -> 'dot') and compaction RELATIVIZES
    network-path references — unlike an explicit base: null, which
    keeps IRIs verbatim (jsonld.js:149,312; url.js empty-base mode)."""
    assert api.expand({"@id": "rel/../dot#f", "http://x/p": "v"})[0][
        "@id"] == "dot#f"
    assert api.expand({"@id": "rel/../dot#f", "http://x/p": "v"},
                      {"base": None})[0]["@id"] == "rel/../dot#f"
    # '' relativization at compaction: //net -> authority stripped
    out = api.compact({"@id": "//net.example/x", "http://x/p": "v"}, {})
    assert out["@id"] == "x"
    # compactToRelative=false is the DELETED state: resolution still
    # runs in empty-base mode but relativization is a no-op
    out = api.compact({"@id": "//net.example/x", "http://x/p": "v"}, {},
                      {"compactToRelative": False})
    assert out["@id"] == "//net.example/x"
