"""Large-N randomized RDFC-1.0 soundness campaign.

The public W3C rdf-canon eval vectors aren't fetchable in this sandbox
(no network), so this is the scale arm of the canonize oracle: the two
properties that fully characterize a canonicalization —

  1. invariance — canonize(G) is identical under random blank-node
     relabeling + quad shuffling (thousands of random datasets mixing
     bnode edges, IRI anchors, literals with datatypes/languages, and
     named graphs with bnode labels);
  2. iff-isomorphism — on small digraphs (<= 7 bnodes), canonical
     forms are equal exactly when a brute-force permutation search
     finds an isomorphism (catches both collision-unsoundness and
     input-order leaks).

plus the fixpoint property (re-canonizing the parsed canonical output
is the identity). The pytest suite (tests/test_canonize_adversarial.py)
runs the structured families and a small slice of this; the campaign
runs wide. Usage: python scripts/canonize_campaign.py [N] [START]
(exits 1 on any violation).

Reference parity target: rdf-canonize (delegated by jsonld.js
lib/index.js canonize; not vendored there either — the reference
tests it with the same fetched suite we can't reach).
"""

import random
import sys
from itertools import permutations

sys.path.insert(0, ".")

from jsonld_js_ray.core.canonize import canonize  # noqa: E402
from jsonld_js_ray.core.nquads import parse  # noqa: E402
from jsonld_js_ray.core.to_rdf import (  # noqa: E402
    OBJ_BNODE, OBJ_IRI, OBJ_LITERAL)

P = "http://ex.org/p"
XS = "http://www.w3.org/2001/XMLSchema#string"
LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
PREDS = [f"http://ex.org/p{k}" for k in range(3)]
IRIS = [f"http://ex.org/node/{k}" for k in range(3)]


def gen_dataset(seed: int):
    """Random RDF dataset: bnode core + optional IRI anchors, literals,
    and named graphs (IRI- or bnode-labeled)."""
    rng = random.Random(seed * 9176 + 11)
    n = rng.randint(3, 10)
    graphs = [""]
    if rng.random() < 0.3:
        graphs.append("http://ex.org/g1")
    if rng.random() < 0.25:
        graphs.append(f"_:n{n}")  # bnode graph label joins the orbit
    quads = []
    n_edges = rng.randint(n - 1, min(3 * n, n * (n - 1)))
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    for i, j in rng.sample(pairs, min(n_edges, len(pairs))):
        quads.append((f"_:n{i}", rng.choice(PREDS), OBJ_BNODE,
                      f"_:n{j}", None, None, rng.choice(graphs)))
    for _ in range(rng.randint(0, n // 2)):
        i = rng.randrange(n)
        r = rng.random()
        if r < 0.4:
            quads.append((f"_:n{i}", rng.choice(PREDS), OBJ_LITERAL,
                          str(rng.randint(0, 3)), XS, None,
                          rng.choice(graphs)))
        elif r < 0.7:
            quads.append((f"_:n{i}", rng.choice(PREDS), OBJ_LITERAL,
                          "x", LS, rng.choice(["en", "fr"]),
                          rng.choice(graphs)))
        else:
            quads.append((f"_:n{i}", rng.choice(PREDS), OBJ_IRI,
                          rng.choice(IRIS), None, None,
                          rng.choice(graphs)))
    if rng.random() < 0.3:
        quads.append((rng.choice(IRIS), rng.choice(PREDS), OBJ_BNODE,
                      f"_:n{rng.randrange(n)}", None, None,
                      rng.choice(graphs)))
    return quads


def check_invariance(quads, seed, rounds=3):
    rng = random.Random(seed)
    base = canonize(quads)
    names = sorted({t for q in quads for t in (q[0], q[3], q[6])
                    if isinstance(t, str) and t.startswith("_:")})
    for r in range(rounds):
        perm = list(range(len(names)))
        rng.shuffle(perm)
        ren = {nm: f"_:z{r}q{perm[i]}" for i, nm in enumerate(names)}

        def rn(qd):
            s, p, k, v, dt, lg, g = qd
            return (ren.get(s, s), p, k,
                    ren.get(v, v) if k == OBJ_BNODE else v, dt, lg,
                    ren.get(g, g))

        shuffled = [rn(qd) for qd in quads]
        rng.shuffle(shuffled)
        if canonize(shuffled) != base:
            return False
    return canonize(parse(base)) == base


def _brute_isomorphic(n, e1, e2):
    if len(e1) != len(e2):
        return False
    s2 = set(e2)
    for p in permutations(range(n)):
        if all((p[i], p[j]) in s2 for i, j in e1):
            return True
    return False


def check_iff_isomorphic(seed):
    rng = random.Random(seed * 31 + 5)
    n = rng.randint(3, 7)
    all_pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    m = rng.randint(n - 1, min(len(all_pairs), 2 * n))
    e1 = rng.sample(all_pairs, m)
    if seed % 2:
        perm = list(range(n))
        rng.shuffle(perm)
        e2 = [(perm[i], perm[j]) for i, j in e1]
        rng.shuffle(e2)
    else:
        e2 = list(e1)
        for ed in rng.sample(all_pairs, 2):
            if ed in e2:
                e2.remove(ed)
            else:
                e2.append(ed)

    def qs(edges):
        return [(f"_:n{i}", P, OBJ_BNODE, f"_:n{j}", None, None, "")
                for i, j in edges]

    same = canonize(qs(e1)) == canonize(qs(e2))
    return same == _brute_isomorphic(n, e1, e2)


def main_cross(n: int, start: int):
    """--x mode: cross-implementation differential. Serialize each
    random dataset (plus the dense iff-isomorphism digraphs, the most
    automorphism-rich inputs we generate) to N-Quads and canonize it
    through BOTH the Python kernel and the JS RDFC-1.0 implementation
    in scripts/refdiff/node_modules/rdf-canonize (a second fresh
    spec derivation, reached through the reference's whole
    jsonld.canonize wrapper, jsonld.js:564-604). Outputs must be
    byte-identical; errors must agree on code."""
    import json
    import pathlib
    import subprocess

    from jsonld_js_ray.core.errors import JsonLdError
    from jsonld_js_ray.core.nquads import serialize_quad

    here = pathlib.Path(__file__).parent / "refdiff"
    reqs, mine = [], []
    for s in range(start, start + n):
        cases = [gen_dataset(s)]
        rng = random.Random(s * 31 + 5)
        nn = rng.randint(3, 7)
        all_pairs = [(i, j) for i in range(nn) for j in range(nn)
                     if i != j]
        m = rng.randint(nn - 1, min(len(all_pairs), 2 * nn))
        cases.append([(f"_:n{i}", P, OBJ_BNODE, f"_:n{j}", None, None,
                       "") for i, j in rng.sample(all_pairs, m)])
        for quads in cases:
            nq = "".join(serialize_quad(q) + "\n" for q in quads)
            reqs.append({"op": "canonize", "input": nq,
                         "options": {"inputFormat":
                                     "application/n-quads"}})
            try:
                mine.append({"result": canonize(parse(nq))})
            except JsonLdError as e:
                mine.append({"errorCode": e.code})
    proc = subprocess.run(
        ["node", str(here / "refrun.js")],
        input=json.dumps(reqs).encode(),
        env={"NODE_PATH": str(here / "node_modules"),
             "PATH": "/usr/bin:/bin:/usr/local/bin"},
        capture_output=True, check=True)
    refs = [json.loads(line) for line in
            proc.stdout.decode().splitlines() if line.strip()]
    bad = 0
    for i, (r, m2) in enumerate(zip(refs, mine)):
        if r != m2:
            bad += 1
            print(f"CROSS DIVERGE case={i}")
            print("  ref :", json.dumps(r)[:300])
            print("  mine:", json.dumps(m2)[:300])
    print(f"{len(refs) - bad} ok, {bad} divergences "
          f"(cross-implementation, {len(refs)} datasets, "
          f"seeds {start}..{start + n - 1})")
    sys.exit(1 if bad else 0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 500
    start = int(args[1]) if len(args) > 1 else 0
    if "--x" in sys.argv:
        main_cross(n, start)
        return
    bad = 0
    for s in range(start, start + n):
        if not check_invariance(gen_dataset(s), s):
            print(f"INVARIANCE VIOLATION seed={s}")
            bad += 1
        if not check_iff_isomorphic(s):
            print(f"IFF-ISOMORPHISM VIOLATION seed={s}")
            bad += 1
    print(f"{2 * n - bad} ok, {bad} violations "
          f"(seeds {start}..{start + n - 1}, "
          f"{n} invariance datasets x 3 relabelings + fixpoint, "
          f"{n} iff-isomorphism digraph pairs)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
