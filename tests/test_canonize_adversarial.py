"""Adversarial RDFC-1.0 invariance families (round-4 verdict item #4).

The reference delegates canonicalization to the unvendored rdf-canonize
package, so no differential oracle exists; these families rely on two
TRUE oracles that need no hand-computed expected output:

1. **Isomorphism invariance** — the canonical N-Quads string depends
   only on the isomorphism class, so it must be identical under any
   random blank-node relabeling + quad shuffle.
2. **Idempotence / fixpoint** — parsing the canonical output (labels
   ``_:c14nK`` become plain bnodes again) and re-canonizing must
   reproduce the exact same string.

Graph shapes follow the complexity classes named by the public W3C
rdf-canon suite (cf. /root/reference/tests/test.js:652-666): cycles,
k-regular/bipartite graphs, grids, vertex-transitive graphs (Petersen),
duplicated components, deep paths with late symmetry breaking, and
near-poison automorphism-rich cases just under the work bound.
"""

import random

import pytest

from jsonld_js_ray.core.canonize import canonize
from jsonld_js_ray.core.errors import JsonLdError
from jsonld_js_ray.core.nquads import parse
from jsonld_js_ray.core.to_rdf import OBJ_BNODE, OBJ_IRI, OBJ_LITERAL

P = "http://ex.org/p"
Q = "http://ex.org/q"
XS = "http://www.w3.org/2001/XMLSchema#string"


def b(i):
    return f"_:n{i}"


def edge(i, j, pred=P, graph=""):
    return (b(i), pred, OBJ_BNODE, b(j), None, None, graph)


def lit(i, value, pred=Q, graph=""):
    return (b(i), pred, OBJ_LITERAL, value, XS, None, graph)


def assert_invariant(quads, rounds=4, seed=7, **kw):
    """The two true oracles: relabel+shuffle invariance and fixpoint."""
    rng = random.Random(seed)
    base = canonize(quads, **kw)
    names = sorted({t for q in quads for t in (q[0], q[3], q[6])
                    if isinstance(t, str) and t.startswith("_:")})
    for r in range(rounds):
        perm = list(range(len(names)))
        rng.shuffle(perm)
        ren = {nm: f"_:r{r}x{perm[i]}" for i, nm in enumerate(names)}

        def rn(qd):
            s, p, k, v, dt, lg, g = qd
            return (ren.get(s, s), p, k,
                    ren.get(v, v) if k == OBJ_BNODE else v, dt, lg,
                    ren.get(g, g))

        shuffled = [rn(qd) for qd in quads]
        rng.shuffle(shuffled)
        assert canonize(shuffled, **kw) == base, \
            f"relabeling round {r} changed canonical form"
    # fixpoint: canonical output re-parsed re-canonizes to itself
    assert canonize(parse(base), **kw) == base
    return base


# ---------------------------------------------------------------- cycles

@pytest.mark.parametrize("n", [3, 4, 5, 6, 7, 8, 10, 12])
def test_directed_cycle(n):
    """C_n: cyclic automorphism group; every node same first-degree
    hash, HNDQ permutation search must break the tie."""
    quads = [edge(i, (i + 1) % n) for i in range(n)]
    out = assert_invariant(quads)
    assert len(out.splitlines()) == n
    assert all(f"_:c14n{i}" in out for i in range(n))


@pytest.mark.parametrize("n", [3, 4, 5, 6, 8])
def test_bidirectional_cycle(n):
    """Dihedral symmetry: edges both ways double the automorphisms."""
    quads = [edge(i, (i + 1) % n) for i in range(n)] + \
            [edge((i + 1) % n, i) for i in range(n)]
    out = assert_invariant(quads)
    assert len(out.splitlines()) == 2 * n


@pytest.mark.parametrize("n,k", [(5, 2), (7, 2), (7, 3), (9, 4)])
def test_circulant(n, k):
    """Circulant graph C_n(1,k): vertex-transitive, regular."""
    quads = [edge(i, (i + 1) % n) for i in range(n)] + \
            [edge(i, (i + k) % n) for i in range(n)]
    assert_invariant(quads)


# ------------------------------------------------- regular / bipartite

@pytest.mark.parametrize("m", [2, 3])
def test_complete_bipartite_near_poison(m):
    """K_{m,m}: the poison shape at small scale — completes under the
    default work bound but exercises deep permutation branching."""
    quads = [edge(i, m + j) for i in range(m) for j in range(m)]
    out = assert_invariant(quads)
    assert len(out.splitlines()) == m * m


def test_complete_bipartite_poison_guard():
    """K_{6,6} under a tiny budget must hit the work-factor guard, and
    the guard must trigger BEFORE unbounded blowup."""
    m = 6
    quads = [edge(i, m + j) for i in range(m) for j in range(m)]
    with pytest.raises(JsonLdError) as e:
        canonize(quads, max_deep_iterations=30)
    assert "work factor" in e.value.code


@pytest.mark.parametrize("m", [3, 4])
def test_bipartite_minus_matching(m):
    """K_{m,m} minus a perfect matching: still biregular, fewer
    automorphisms; orbits must split correctly."""
    quads = [edge(i, m + j)
             for i in range(m) for j in range(m) if i != j]
    assert_invariant(quads)


def test_cube_graph():
    """Q3 (3-cube): 3-regular, 48 automorphisms."""
    verts = range(8)
    quads = []
    for v in verts:
        for bit in (1, 2, 4):
            w = v ^ bit
            if v < w:
                quads.append(edge(v, w))
                quads.append(edge(w, v))
    assert_invariant(quads)


def test_petersen_graph():
    """Petersen graph: 3-regular, vertex-transitive, girth 5 — a
    classic hard case for refinement-based canonical labeling."""
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, 5 + i) for i in range(5)]
    quads = []
    for i, j in outer + inner + spokes:
        quads.append(edge(i, j))
        quads.append(edge(j, i))
    out = assert_invariant(quads)
    assert len(out.splitlines()) == 30


# ------------------------------------------------------------- grids

@pytest.mark.parametrize("rows,cols", [(2, 2), (2, 3), (3, 3), (2, 5)])
def test_grid(rows, cols):
    """Grid quads: automorphism group = rectangle symmetries."""
    def idx(r, c):
        return r * cols + c
    quads = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                quads.append(edge(idx(r, c), idx(r, c + 1)))
            if r + 1 < rows:
                quads.append(edge(idx(r, c), idx(r + 1, c)))
    assert_invariant(quads)


# ------------------------------------------- duplicated components

@pytest.mark.parametrize("copies", [2, 3, 4])
def test_disjoint_identical_triangles(copies):
    """Identical components are interchangeable wholesale: the
    automorphism group contains the full symmetric group on copies."""
    quads = []
    for c in range(copies):
        o = 3 * c
        quads += [edge(o, o + 1), edge(o + 1, o + 2), edge(o + 2, o)]
    out = assert_invariant(quads)
    assert len(out.splitlines()) == 3 * copies


def test_disjoint_copies_with_one_marked():
    """One copy carries a literal: its orbit must split from the
    others while the unmarked copies stay interchangeable."""
    quads = []
    for c in range(3):
        o = 3 * c
        quads += [edge(o, o + 1), edge(o + 1, o + 2), edge(o + 2, o)]
    quads.append(lit(0, "marked"))
    assert_invariant(quads)


# ------------------------------------- deep paths / late tie-breaking

@pytest.mark.parametrize("depth", [4, 8, 16])
def test_twin_paths_distinguished_at_tail(depth):
    """Two parallel bnode chains identical until the LAST node's
    literal differs — distinguishing info only at distance `depth`,
    forcing hashing to propagate the full length."""
    quads = []
    for chain, tag in ((0, "left"), (100, "right")):
        for i in range(depth - 1):
            quads.append(edge(chain + i, chain + i + 1))
        quads.append(lit(chain + depth - 1, tag))
    assert_invariant(quads)


@pytest.mark.parametrize("depth", [4, 10])
def test_twin_paths_identical(depth):
    """Same shape but NO distinguishing literal: the two chains are
    isomorphic copies, canonical form must still be stable."""
    quads = []
    for chain in (0, 100):
        for i in range(depth - 1):
            quads.append(edge(chain + i, chain + i + 1))
    assert_invariant(quads)


# ----------------------------------------------- binary trees

@pytest.mark.parametrize("depth", [2, 3])
def test_complete_binary_tree(depth):
    """All leaves interchangeable under subtree swaps: 2^(2^depth - 1)
    -ish automorphisms."""
    quads = []
    n = 2 ** (depth + 1) - 1
    for i in range(n // 2):
        quads.append(edge(i, 2 * i + 1))
        quads.append(edge(i, 2 * i + 2))
    assert_invariant(quads)


# ------------------------------------------------- named-graph variants

def test_cycle_in_named_bnode_graph():
    """Blank node as GRAPH label participates in canonicalization."""
    quads = [
        (b(0), P, OBJ_BNODE, b(1), None, None, b(2)),
        (b(1), P, OBJ_BNODE, b(0), None, None, b(2)),
        (b(2), P, OBJ_LITERAL, "g", XS, None, ""),
    ]
    assert_invariant(quads)


def test_same_cycle_two_graphs():
    """The same symmetric cycle duplicated across two bnode-named
    graphs: graph-term position must keep them distinct."""
    quads = []
    for g in (10, 11):
        quads += [
            (b(g * 2), P, OBJ_BNODE, b(g * 2 + 1), None, None, b(g)),
            (b(g * 2 + 1), P, OBJ_BNODE, b(g * 2), None, None, b(g)),
        ]
    assert_invariant(quads)


def test_graph_label_symmetry():
    """Two bnode graph labels whose graphs are isomorphic — the labels
    themselves are interchangeable."""
    quads = []
    for g in (0, 1):
        quads.append((b(10 + g), P, OBJ_IRI, "http://ex.org/o",
                      None, None, b(g)))
    assert_invariant(quads)


# ------------------------------------------ mixed IRI/literal anchors

def test_cycle_with_one_iri_anchor():
    """An IRI subject hanging off one cycle node splits orbits."""
    n = 6
    quads = [edge(i, (i + 1) % n) for i in range(n)]
    quads.append(("http://ex.org/s", P, OBJ_BNODE, b(0), None, None, ""))
    assert_invariant(quads)


@pytest.mark.parametrize("n", [4, 6])
def test_cycle_alternating_literals(n):
    """Alternating literal marks halve the rotation group."""
    quads = [edge(i, (i + 1) % n) for i in range(n)]
    for i in range(0, n, 2):
        quads.append(lit(i, "even"))
    assert_invariant(quads)


def test_language_and_datatype_distinguish():
    """Nodes identical except literal language/datatype must NOT be
    conflated."""
    quads = [
        (b(0), Q, OBJ_LITERAL, "v", None,
         "en", ""),
        (b(1), Q, OBJ_LITERAL, "v", None, "fr", ""),
        (b(2), Q, OBJ_LITERAL, "v", XS, None, ""),
    ]
    base = assert_invariant(quads)
    assert len({ln.split(" ")[0] for ln in base.splitlines()}) == 3


# -------------------------------------------- randomized regular graphs

@pytest.mark.parametrize("seed", range(8))
def test_random_3_regular(seed):
    """Random 3-regular multigraph on 8 nodes via union of three random
    perfect matchings — regular, so first-degree hashes collide."""
    rng = random.Random(seed)
    n = 8
    quads = []
    for _ in range(3):
        perm = list(range(n))
        rng.shuffle(perm)
        for i in range(0, n, 2):
            quads.append(edge(perm[i], perm[i + 1]))
    assert_invariant(list(dict.fromkeys(quads)))


@pytest.mark.parametrize("seed", range(6))
def test_random_shared_structure(seed):
    """Random graph + a disjoint relabeled copy of itself: the
    components are isomorphic twins."""
    rng = random.Random(100 + seed)
    n = 5
    edges = {(rng.randrange(n), rng.randrange(n))
             for _ in range(rng.randint(4, 9))}
    quads = [edge(i, j) for i, j in edges] + \
            [edge(50 + i, 50 + j) for i, j in edges]
    assert_invariant(quads)


# ------------------------------------------------ budget boundary

def test_near_poison_under_default_budget():
    """K_{3,3} plus satellite chains: automorphism-rich but must
    complete under the DEFAULT work bound (no raise)."""
    m = 3
    quads = [edge(i, m + j) for i in range(m) for j in range(m)]
    for i in range(2 * m):
        quads.append(edge(20 + i, i))
    out = assert_invariant(quads)
    assert len(out.splitlines()) == m * m + 2 * m


# ------------------------------------------- two-sided iso differential

def _brute_isomorphic(n, e1, e2):
    """Exhaustive permutation isomorphism check for <=7-node digraphs —
    an independent TRUE oracle for the 'different structure must yield
    different canonical form' direction (soundness), which the
    invariance families above cannot test."""
    from itertools import permutations
    if len(e1) != len(e2):
        return False
    s2 = set(e2)
    for p in permutations(range(n)):
        if all((p[i], p[j]) in s2 for i, j in e1):
            return True
    return False


def _edge_quads(edges):
    return [edge(i, j) for i, j in edges]


@pytest.mark.parametrize("seed", range(30))
def test_canonical_form_iff_isomorphic(seed):
    """canonize(G1) == canonize(G2)  <=>  G1 ~ G2, with the RHS decided
    by brute force. Catches both unsoundness (hash collisions merging
    distinct structures) and over-distinction (labeling leaking input
    order) on random digraphs up to 6 nodes."""
    rng = random.Random(seed)
    n = rng.randint(3, 6)
    all_pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    m = rng.randint(n - 1, min(len(all_pairs), 2 * n))
    e1 = rng.sample(all_pairs, m)
    if seed % 2:
        # relabeled copy: MUST canonize identically
        perm = list(range(n))
        rng.shuffle(perm)
        e2 = [(perm[i], perm[j]) for i, j in e1]
        rng.shuffle(e2)
    else:
        # perturbed copy: usually non-isomorphic, brute force decides
        e2 = list(e1)
        swap = rng.sample(all_pairs, 2)
        for ed in swap:
            if ed in e2:
                e2.remove(ed)
            else:
                e2.append(ed)
    iso = _brute_isomorphic(n, e1, e2)
    same = canonize(_edge_quads(e1)) == canonize(_edge_quads(e2))
    assert same == iso, (n, sorted(e1), sorted(e2), iso)


def test_duplicate_quads_are_set_semantics():
    """An RDF dataset is a SET: a quad repeated in the input array must
    not skew hashing (RDFC-1.0 §2; rdf-canonize NQuads.parse dedupes).
    Found by scripts/canonize_campaign.py's fixpoint oracle (seeds
    275/998/1566/1830): duplicate multiplicity fed first-degree hashes,
    so canonize(parse(output)) relabeled differently than the original
    duplicated input."""
    quads = [edge(0, 1), edge(1, 2), edge(2, 0),
             lit(1, "x"), lit(1, "x")]  # duplicate literal quad
    assert canonize(quads) == canonize(list(dict.fromkeys(quads)))
    assert_invariant(quads)
