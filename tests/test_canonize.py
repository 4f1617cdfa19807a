"""RDFC-1.0 canonicalization tests: invariance properties, poison guard,
canonical-id-map (reference delegates to rdf-canonize; see SURVEY.md
header note and /root/reference/lib/jsonld.js:564-604)."""

import random

import pytest

from jsonld_js_ray import api
from jsonld_js_ray.core.canonize import canonical_id_map, canonize
from jsonld_js_ray.core.errors import JsonLdError
from jsonld_js_ray.core.to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL

V = "http://ex.org/"
XS = "http://www.w3.org/2001/XMLSchema#string"


def _random_graph(rng, nb):
    bnodes = [f"_:x{i}" for i in range(nb)]
    quads = []
    for _ in range(rng.randint(3, 14)):
        s = rng.choice(bnodes + [V + "s"])
        p = rng.choice([V + "p", V + "q"])
        r = rng.random()
        if r < 0.6:
            o = (OBJ_BNODE, rng.choice(bnodes), None, None)
        elif r < 0.8:
            o = (OBJ_IRI, V + "o", None, None)
        else:
            o = (OBJ_LITERAL, "v", XS, None)
        quads.append((s, p, *o, ""))
    return bnodes, list(dict.fromkeys(quads))


def test_invariance_under_relabeling_and_order():
    rng = random.Random(42)
    for _ in range(25):
        nb = rng.randint(2, 6)
        bnodes, quads = _random_graph(rng, nb)
        c1 = canonize(quads)
        perm = list(range(nb))
        rng.shuffle(perm)
        ren = {f"_:x{i}": f"_:y{perm[i]}" for i in range(nb)}

        def rn(q):
            s, p, k, v, dt, lg, g = q
            return (ren.get(s, s), p, k,
                    ren.get(v, v) if k == OBJ_BNODE else v, dt, lg, g)

        quads2 = [rn(q) for q in quads]
        rng.shuffle(quads2)
        assert canonize(quads2) == c1


def test_symmetric_cycle():
    # two interchangeable bnodes in a cycle — needs hash-n-degree
    quads = [
        ("_:a", V + "p", OBJ_BNODE, "_:b", None, None, ""),
        ("_:b", V + "p", OBJ_BNODE, "_:a", None, None, ""),
    ]
    out = canonize(quads)
    assert out == ("_:c14n0 <http://ex.org/p> _:c14n1 .\n"
                   "_:c14n1 <http://ex.org/p> _:c14n0 .\n")


def test_canonize_document():
    doc = {"@context": {"@vocab": V}, "@id": V + "a",
           "knows": [{"name": "Bob"}, {"name": "Bob"}]}
    out = api.canonize(doc)
    # two distinct-but-identical bnodes get distinct stable labels
    assert out.count("_:c14n0") >= 1 and out.count("_:c14n1") >= 1
    # sorted by code point
    lines = out.splitlines()
    assert lines == sorted(lines)


def test_poison_graph_bounded():
    # complete bipartite-ish interchangeable bnode mess
    n = 12
    quads = []
    for i in range(n):
        for j in range(n):
            if i != j:
                quads.append((f"_:x{i}", V + "p", OBJ_BNODE, f"_:x{j}",
                              None, None, ""))
    with pytest.raises(JsonLdError) as e:
        canonize(quads, max_deep_iterations=50)
    assert "work factor" in e.value.code


def test_canonical_id_map():
    quads = [
        ("_:z", V + "p", OBJ_LITERAL, "1", XS, None, ""),
        ("_:y", V + "p", OBJ_LITERAL, "2", XS, None, ""),
    ]
    m = canonical_id_map(quads)
    assert set(m.keys()) == {"_:z", "_:y"}
    assert set(m.values()) == {"_:c14n0", "_:c14n1"}


def test_nquads_input():
    nq = f'_:b1 <{V}p> "v" .\n_:b0 <{V}p> _:b1 .\n'
    out = api.canonize(nq, {"inputFormat": "application/n-quads"})
    assert "_:c14n" in out
    lines = out.splitlines()
    assert lines == sorted(lines)


def test_message_digest_algorithm():
    """messageDigestAlgorithm reaches the RDFC-1.0 hash steps: the
    canonical label order of hash-distinct bnodes follows the sorted
    FIRST-degree hashes, re-derived here independently per digest."""
    import hashlib

    quads = [("_:a", "http://e/p", OBJ_LITERAL, "x", None, None, ""),
             ("_:b", "http://e/p", OBJ_LITERAL, "y", None, None, "")]

    for alg, fn in (("sha256", hashlib.sha256),
                    ("sha384", hashlib.sha384),
                    ("sha512", hashlib.sha512)):
        h_a = fn(b'_:a <http://e/p> "x" .\n').hexdigest()
        h_b = fn(b'_:a <http://e/p> "y" .\n').hexdigest()
        first = "_:a" if h_a < h_b else "_:b"
        m = canonical_id_map(quads, message_digest_algorithm=alg)
        assert m[first] == "_:c14n0", alg
    # default is sha256
    assert canonical_id_map(quads) == canonical_id_map(
        quads, message_digest_algorithm="sha256")
    # the reference's nested canonizeOptions surface
    doc = '_:a <http://e/p> "x" .\n_:b <http://e/p> "y" .\n'
    out384 = api.canonize(doc, {
        "inputFormat": "application/n-quads",
        "canonizeOptions": {"messageDigestAlgorithm": "SHA-384"}})
    out256 = api.canonize(doc, {"inputFormat": "application/n-quads"})
    assert sorted(out384.splitlines()) != [] and out256 != ""
    with pytest.raises(JsonLdError):
        canonical_id_map(quads, message_digest_algorithm="md5-ish")
