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
