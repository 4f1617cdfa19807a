"""Dedup family: exact, MinHash+LSH candidate pairs, distributed
Jaccard verify, SimHash, Dataset-native connected components.

Verify path is checked against a single-process Python reference
(same shingle/Jaccard algorithm, no Ray) so the distributed join is
oracled, not just smoke-tested."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from jsonld_js_ray.functions.dedup_text import (
    _bucket_all_pairs, _shingles, connected_components, exact_dedup,
    jaccard_verify, minhash_candidate_pairs, simhash_signatures)


def _docs_ds():
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: base,
        2: base,                                   # exact dup of 1
        3: base + " with a tiny suffix",           # near dup of 1/2
        4: "completely different content about ray data pipelines",
        5: "completely different content about ray data pipeline",
        6: "unrelated third topic entirely, nothing shared here at all",
    }
    return texts, rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": list(texts.values())}))


def _ref_jaccard(ta: str, tb: str, k: int = 5) -> float:
    sa, sb = _shingles(ta, k), _shingles(tb, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return round(inter / union, 6) if union else 1.0


def test_exact_dedup_groups():
    _, ds = _docs_ds()
    out = exact_dedup(ds).to_pandas()
    assert len(out) == 5  # 1&2 collapse
    dup = out[out["n_docs"] == 2]
    assert len(dup) == 1 and dup["keep_id"].iloc[0] == 1


def test_minhash_pairs_and_distributed_verify_match_reference():
    texts, ds = _docs_ds()
    pairs = minhash_candidate_pairs(ds, pair_mode="all")
    verified = jaccard_verify(ds, pairs, threshold=0.5).to_pandas()
    assert len(verified) > 0
    # exact dup pair must be found with jaccard 1.0
    assert ((verified["a"] == 1) & (verified["b"] == 2)).any()
    # every emitted jaccard matches the single-process reference
    for _, r in verified.iterrows():
        ref = _ref_jaccard(texts[int(r["a"])], texts[int(r["b"])])
        assert r["jaccard"] == pytest.approx(ref, abs=1e-6)
        assert r["jaccard"] >= 0.5


def test_bucket_all_pairs_complete_and_capped():
    g = pd.DataFrame({"doc_id": [3, 1, 2]})
    out = _bucket_all_pairs(g)
    got = set(zip(out["a"], out["b"]))
    assert got == {(1, 2), (1, 3), (2, 3)}  # includes non-min pair (2,3)
    big = pd.DataFrame({"doc_id": range(100)})
    capped = _bucket_all_pairs(big, cap=10)
    assert len(capped) == 99  # star fallback, not 4950


def test_connected_components_dataset_native():
    # two components: {1,2,3} via chain, {7,8}
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": [1, 2, 7], "b": [2, 3, 8]}))
    out = connected_components(pairs).to_pandas()
    lab = dict(zip(out["a"], out["label"]))
    assert lab == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_connected_components_long_chain():
    # chain 10-20-30-40-50 needs multiple propagation rounds
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": [20, 30, 40, 50], "b": [10, 20, 30, 40]}))
    out = connected_components(pairs).to_pandas()
    assert set(out["label"]) == {10}
    assert len(out) == 5


def test_simhash_components_matches_union_find(ray_session):
    # the driver query composes simhash_near_dup(md5) -> connected
    # components; re-derive the expected labels with an independent
    # union-find over the SAME pair set (itself oracled vs a scalar
    # reference / DuckDB) and demand exact equality
    import __ray_entry__ as entry
    from jsonld_js_ray.functions.dedup_text import simhash_near_dup

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet")
    pairs = simhash_near_dup(docs, max_hamming=8,
                             hash_mode="md5").to_pandas()

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    out = entry.queries()["doc_simhash_components"](sf).to_pandas()
    got = dict(zip(out["doc_id"].astype(int),
                   out["component"].astype(int)))
    assert got == expect


def test_simhash_close_docs_close_hashes():
    _, ds = _docs_ds()
    out = simhash_signatures(ds).to_pandas()
    h = dict(zip(out["doc_id"], out["simhash"]))
    assert h[1] == h[2]  # identical text, identical simhash
    ham_near = bin(h[4] ^ h[5]).count("1")
    ham_far = bin(h[1] ^ h[6]).count("1")
    assert ham_near < ham_far


# ---------------------------------------------------------------------------
# n-gram Jaccard + embedding-cosine near-dup
# ---------------------------------------------------------------------------

def test_ngram_jaccard_pairs_exact(ray_session):
    import ray
    from jsonld_js_ray.functions.dedup_text import ngram_jaccard_pairs
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",   # near-dup of 1
        3: "completely different words here in this one",
        4: "the quick brown fox jumps over the lazy dog",   # exact dup of 1
        5: "too short",                                     # <3 tokens: no grams
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in out.itertuples()}
    assert pairs[(1, 4)] == 1.0
    # 1 vs 2: grams differ only in the last trigram windows
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert pairs[(1, 2)] == pairs[(2, 4)]
    assert not any(3 in p or 5 in p for p in pairs)
    # python-reference oracle for the (1, 2) value
    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i+3]) for i in range(len(toks)-2)}
    g1, g2 = grams(texts[1]), grams(texts[2])
    expect = round(len(g1 & g2) / len(g1 | g2), 6)
    assert pairs[(1, 2)] == expect


def test_embedding_cosine_pairs(ray_session):
    import numpy as np
    import ray
    from jsonld_js_ray.functions.ann import embedding_cosine_pairs
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    vecs[7] = vecs[3] + rng.normal(scale=0.01, size=16).astype("float32")
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)])
    out = embedding_cosine_pairs(ds, threshold=0.9).to_pandas()
    assert ((out.vec_a == 3) & (out.vec_b == 7)).any()
    got = out[(out.vec_a == 3) & (out.vec_b == 7)].cosine.iloc[0]
    a, b = vecs[3].astype("float64"), vecs[7].astype("float64")
    expect = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
    assert got == expect
    assert (out.vec_a < out.vec_b).all()

    # the multi-tile groupby path (n_blocks > 1) must emit the exact
    # same pair set as the single-tile coalesce fast path
    tiled = embedding_cosine_pairs(ds, threshold=0.9, n_blocks=3
                                   ).to_pandas()
    key = ["vec_a", "vec_b", "cosine"]
    assert (tiled[key].sort_values(key).reset_index(drop=True)
            .equals(out[key].sort_values(key).reset_index(drop=True)))


# ---------------------------------------------------------------------------
# python-reference oracles for simhash / fingerprint (independent
# single-process re-derivations of the algorithm definitions, checked
# against the distributed pipelines; converts these rows-only queries
# into value-verified ones)
# ---------------------------------------------------------------------------

def _ref_simhash(text: str) -> int:
    """SimHash-64 per Charikar: per-token 64-bit hash, signed bit vote,
    positive bits set. Deliberately written scalar-python (loops, no
    vectorization) so it is an independent derivation of the ALGORITHM;
    the 64-bit token hash primitive (pd.util.hash_array's deterministic
    siphash) is shared with the pipeline, called one token at a time."""
    import re as _re

    import numpy as _np
    import pandas as _pd
    toks = set(_re.findall(r"\w+", text.lower()))
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = int(_pd.util.hash_array(
            _np.array([t], dtype=object))[0])
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    sim = 0
    for j in range(64):
        if votes[j] > 0:
            sim |= 1 << j
    return sim % (1 << 63)


def _ref_fingerprint(text: str, window: int = 8) -> int:
    """Winnowing fingerprint: FNV-ish byte 4-gram hashes, min per sliding
    window, summed — scalar-python re-derivation."""
    data = text.encode("utf-8")
    if len(data) < 4:
        return sum(data)
    M = (1 << 64) - 1
    grams = [((data[i] * 16777619) & M ^ (data[i+1] * 31) & M
              ^ (data[i+2] * 131) & M ^ data[i+3]) & M
             for i in range(len(data) - 3)]
    if len(grams) <= window:
        return min(grams)
    mins = [min(grams[i:i+window]) for i in range(len(grams) - window + 1)]
    return sum(mins) % (1 << 63)


def test_simhash_matches_python_reference(ray_session):
    import ray
    from jsonld_js_ray.functions.dedup_text import simhash_signatures
    texts = {1: "the quick brown Fox", 2: "", 3: "a b c a b",
             4: "unicode café naïve test tokens here"}
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    out = simhash_signatures(ds).to_pandas().set_index("doc_id")
    for k, t in texts.items():
        assert int(out.loc[k, "simhash"]) == _ref_simhash(t), k


def test_fingerprint_matches_python_reference(ray_session):
    import ray
    from jsonld_js_ray.functions.text import fingerprint_batch
    texts = {1: "abc", 2: "abcd", 3: "the quick brown fox " * 5,
             4: "x" * 100}
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    out = ds.map_batches(fingerprint_batch,
                         batch_format="pyarrow").to_pandas()
    out = out.set_index("doc_id")
    for k, t in texts.items():
        assert int(out.loc[k, "fingerprint"]) == _ref_fingerprint(t), k


def test_hash_join_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray
    from jsonld_js_ray.functions.relational import hash_join
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300),
                         "lv": np.arange(300, dtype="int64")})
    right = pd.DataFrame({"k": rng.integers(0, 50, 200),
                          "rv": np.arange(200, dtype="int64") * 10})
    out = hash_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right), "k").to_pandas()
    expect = left.merge(right, on="k")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    want = expect[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got.dtypes.to_dict() == want.dtypes.to_dict()


def test_simhash_near_dup(ray_session):
    import ray
    from jsonld_js_ray.functions.dedup_text import simhash_near_dup
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight") * 3
    texts = {
        1: base,
        2: base.replace("green", "blue"),     # near-dup of 1
        3: "completely different content with other words entirely",
        4: base,                               # identical to 1
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    out = simhash_near_dup(ds, max_hamming=6).to_pandas()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out.itertuples()}
    assert pairs.get((1, 4)) == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert pairs[(1, 2)] == pairs[(2, 4)]
    assert not any(3 in p for p in pairs)
    # cross-check hamming against the scalar python reference
    h1, h2 = _ref_simhash(texts[1]), _ref_simhash(texts[2])
    assert pairs[(1, 2)] == bin(h1 ^ h2).count("1")


def test_new_ops_partition_invariant(ray_session):
    """Same results at any block partitioning (determinism claim)."""
    import ray
    from jsonld_js_ray.functions.dedup_text import ngram_jaccard_pairs
    from jsonld_js_ray.functions.relational import (
        events_sliding_window, hash_join)
    import pandas as pd
    import numpy as np

    texts = [{"doc_id": i,
              "text": f"alpha beta gamma delta epsilon zeta {i % 7} "
                      f"eta theta iota kappa"} for i in range(60)]

    def norm(df, cols):
        return df[cols].sort_values(cols).reset_index(drop=True)

    outs = []
    for parts in (1, 7):
        ds = ray.data.from_items(texts).repartition(parts)
        outs.append(norm(ngram_jaccard_pairs(ds, threshold=0.3)
                         .to_pandas(), ["doc_a", "doc_b", "jaccard"]))
    pd.testing.assert_frame_equal(outs[0], outs[1])

    rng = np.random.default_rng(8)
    ev = [{"event_id": i, "user_id": int(rng.integers(0, 9)),
           "ts": pd.Timestamp("2024-01-01")
           + pd.Timedelta(seconds=int(rng.integers(0, 20000))),
           "value": float(rng.normal())} for i in range(500)]
    outs = []
    for parts in (1, 5):
        ds = ray.data.from_items(ev).repartition(parts)
        outs.append(norm(events_sliding_window(ds).to_pandas(),
                         ["event_id", "sliding_sum", "n_window"]))
    pd.testing.assert_frame_equal(outs[0], outs[1])

    left = pd.DataFrame({"k": np.arange(100) % 11,
                         "lv": np.arange(100, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(40) % 11,
                          "rv": np.arange(40, dtype="int64")})
    outs = []
    for parts in (1, 6):
        out = hash_join(ray.data.from_pandas(left).repartition(parts),
                        ray.data.from_pandas(right).repartition(parts),
                        "k").to_pandas()
        outs.append(norm(out, ["k", "lv", "rv"]))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_ivf_topk_recall(ray_session):
    import numpy as np
    import ray
    from jsonld_js_ray.functions.ann import brute_force_topk, ivf_topk
    rng = np.random.default_rng(4)
    vecs = _normalize_rows(rng.normal(size=(400, 24)))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(400)])
    qids = [0, 5, 9]
    Q = vecs[qids]
    exact = brute_force_topk(ds, qids, Q, k=10).to_pandas()
    approx = ivf_topk(ds, qids, Q, k=10, n_centroids=8,
                      n_probe=4).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    # a query probes half the lists; its own vector must be found and
    # aggregate recall should be well above chance
    assert all((approx[approx.query_id == q].vec_id == q).any()
               for q in qids)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def _normalize_rows(m):
    import numpy as np
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def test_connected_components_vs_union_find(ray_session):
    """Randomized graphs: distributed min-label propagation must agree
    with a scalar union-find on the same edges."""
    import numpy as np
    import pandas as pd
    import ray
    from jsonld_js_ray.functions.dedup_text import connected_components
    rng = np.random.default_rng(17)
    n_nodes, n_edges = 200, 260
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    m = a != b
    edges = pd.DataFrame({"a": a[m].astype("int64"),
                          "b": b[m].astype("int64")}).drop_duplicates()

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.itertuples():
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # expected label of node = min node id in its component
    comp: dict = {}
    touched = set(edges["a"]) | set(edges["b"])
    for x in touched:
        comp.setdefault(find(x), []).append(x)
    expect = {x: min(members) for root, members in comp.items()
              for x in members}

    out = connected_components(
        ray.data.from_pandas(edges)).to_pandas()
    got = dict(zip(out["a"], out["label"]))
    assert got == expect


def _ref_simhash_md5(text: str) -> int:
    """md5-mode scalar re-derivation: token hash = last 8 md5 digest
    bytes little-endian (DuckDB md5_number_lower), rest identical."""
    import hashlib as _hl
    import re as _re
    toks = set(_re.findall(r"\w+", text.lower()))
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = int.from_bytes(_hl.md5(t.encode("utf-8")).digest()[8:],
                           "little")
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    sim = 0
    for j in range(64):
        if votes[j] > 0:
            sim |= 1 << j
    return sim % (1 << 63)


def test_simhash_md5_mode_matches_python_reference(ray_session):
    import ray
    from jsonld_js_ray.functions.dedup_text import simhash_signatures
    texts = {1: "the quick brown Fox", 2: "", 3: "a b c a b",
             4: "unicode café naïve test tokens here"}
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    out = simhash_signatures(ds, hash_mode="md5").to_pandas() \
        .set_index("doc_id")
    for k, t in texts.items():
        assert int(out.loc[k, "simhash"]) == _ref_simhash_md5(t), k


def _ref_minhash_md5_bands(text: str, num_perm=64, bands=16):
    """Independent scalar re-derivation of the md5-mode MinHash band
    keys: md5_number_lower token hashes and permutation params reduced
    mod p = 2^61-1, (a*x+b) wrapped mod 2^64 then mod p, min per perm,
    band key = md5_number_lower of the comma-joined chunk % 2^62."""
    import hashlib as _hl
    import re as _re
    P = (1 << 61) - 1
    M64 = 1 << 64

    def md5n(s):
        return int.from_bytes(_hl.md5(s.encode()).digest()[8:], "little")

    toks = set(_re.findall(r"\w+", text.lower()))
    if not toks:
        return None
    hs = sorted({md5n(t) % P for t in toks})
    sig = []
    for j in range(num_perm):
        a = md5n(f"minhash-a-{j}") % P
        b = md5n(f"minhash-b-{j}") % P
        sig.append(min(((a * x + b) % M64) % P for x in hs))
    rpb = num_perm // bands
    return [md5n(",".join(str(v) for v in sig[i * rpb:(i + 1) * rpb]))
            % (1 << 62) for i in range(bands)]


def test_minhash_md5_mode_matches_python_reference(ray_session):
    from jsonld_js_ray.functions.dedup_text import MinHasher
    import pyarrow as pa
    texts = {1: "the quick brown Fox jumps", 2: "", 3: "a b c a b",
             4: "unicode café naïve test tokens here"}
    mh = MinHasher(hash_mode="md5")
    out = mh(pa.table({"doc_id": list(texts),
                       "text": list(texts.values())})).to_pandas()
    for k, t in texts.items():
        ref = _ref_minhash_md5_bands(t)
        rows = out[out["doc_id"] == k].sort_values("band_id")
        if ref is None:
            assert rows.empty, k  # token-less doc emits no bands
            continue
        assert list(rows["band_hash"]) == ref, k


def test_minhash_md5_near_dup_matches_duckdb(ray_session):
    """The full md5-mode pipeline (signature -> banded LSH -> capped
    pairing -> raw-IEEE Jaccard verify) against the driver's DuckDB
    value oracle on an in-memory corpus — exact, including doubles."""
    import duckdb
    import ray
    import __ray_entry__ as entry
    from jsonld_js_ray.functions.dedup_text import (
        connected_components, jaccard_verify, minhash_candidate_pairs)

    texts, _ = _docs_ds()
    texts[7] = texts[1] + " again"   # more near-dups
    texts[8] = "token soup " * 20
    texts[9] = "token soup " * 20 + "tail"
    df = pd.DataFrame({"doc_id": list(texts),
                       "text": list(texts.values())})
    ds = ray.data.from_pandas(df)

    pairs = minhash_candidate_pairs(ds, pair_mode="all",
                                    global_dedup=False, hash_mode="md5")
    mine = jaccard_verify(ds, pairs, threshold=0.5, hash_mode="md5") \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    sql = entry.oracle_sql()["doc_minhash_near_dup"]
    oracle = con.sql(sql).df().sort_values(["a", "b"]) \
        .reset_index(drop=True)
    assert len(mine) == len(oracle) > 0
    assert (mine[["a", "b"]].values == oracle[["a", "b"]].values).all()
    # raw IEEE doubles: bit-exact, no tolerance
    assert (mine["jaccard"].values == oracle["jaccard"].values).all()

    star = minhash_candidate_pairs(ds, global_dedup=False,
                                   hash_mode="md5")
    comps = connected_components(star).to_pandas() \
        .sort_values("a").reset_index(drop=True)
    csql = entry.oracle_sql()["doc_near_dup_components"]
    coracle = con.sql(csql).df().sort_values("a").reset_index(drop=True)
    assert len(comps) == len(coracle) > 0
    assert (comps[["a", "label"]].values
            == coracle[["a", "label"]].values).all()


def test_lsh_topk_md5_matches_duckdb(ray_session):
    """md5-plane LSH ANN: the full pipeline (md5-derived hyperplanes →
    sign buckets → bucket-restricted cosine top-k) must be value-exact
    against an independent DuckDB re-derivation (the ann_lsh_topk
    oracle)."""
    import duckdb
    import numpy as np
    import ray
    from jsonld_js_ray.functions.ann import _md5_planes, lsh_topk

    rng = np.random.default_rng(7)
    vecs = _normalize_rows(rng.normal(size=(300, 16)))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(300)])
    qids = [0, 1, 2]
    out = lsh_topk(ds, qids, vecs[qids], k=5, n_planes=6,
                   hash_mode="md5").to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, "
                "embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)",
                    [(i, vecs[i].tolist()) for i in range(300)])
    sql = """
        WITH planes AS (
            SELECT j, list(
                md5_number_lower('lshplane:' || d || ':' || j)
                    / 18446744073709551616.0 * 2 - 1 ORDER BY d) AS pw
            FROM (SELECT unnest(range(16)) AS d) dd
            CROSS JOIN (SELECT unnest(range(6)) AS j) jj GROUP BY j),
        vb AS (
            SELECT e.vec_id, CAST(sum(
                CASE WHEN list_dot_product(e.embedding, p.pw) > 0
                     THEN 1 << p.j ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
        q AS (SELECT vec_id AS query_id, embedding FROM embeddings
              WHERE vec_id IN (0, 1, 2)),
        qb AS (SELECT vb.vec_id AS query_id, vb.bucket
               FROM vb JOIN q ON q.query_id = vb.vec_id),
        cands AS (
            SELECT qb.query_id, vb.vec_id,
                   round(list_cosine_similarity(
                       e.embedding, q.embedding), 6) AS cosine
            FROM qb JOIN q ON q.query_id = qb.query_id
            JOIN vb ON vb.bucket = qb.bucket
            JOIN embeddings e ON e.vec_id = vb.vec_id),
        ranked AS (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC)
            AS rank FROM cands)
        SELECT query_id, vec_id, cosine, rank
        FROM ranked WHERE rank <= 5
    """
    odf = con.execute(sql).df().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert len(out) == len(odf)
    assert (out["vec_id"].to_numpy() == odf["vec_id"].to_numpy()).all()
    assert (out["cosine"].to_numpy() == odf["cosine"].to_numpy()).all()

    # plane weights themselves match DuckDB's md5_number_lower formula
    w = _md5_planes(3, 2)
    ww = con.execute("""
        SELECT d, j, md5_number_lower('lshplane:' || d || ':' || j)
                   / 18446744073709551616.0 * 2 - 1 AS w
        FROM (SELECT unnest(range(3)) AS d) dd
        CROSS JOIN (SELECT unnest(range(2)) AS j) jj
        ORDER BY d, j""").df()
    for _, row in ww.iterrows():
        assert w[int(row.d), int(row.j)] == row.w
