"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Patterns per the Ray guide / SURVEY.md §2.7: exact dedup is a
hash-partitioned groupby; near-dup is shingle→minhash per batch →
explode to (band, band_hash) rows → groupby buckets → candidate pairs →
vectorized Jaccard verify. Connected components resolve with iterative
min-label propagation (groupby rounds), never a driver-side union-find
over big data."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util_ray import default_concurrency, pool_share

_MERSENNE = (1 << 61) - 1


def md5_batch(batch: pa.Table) -> pa.Table:
    df = batch.select(["doc_id", "text"]).to_pandas()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]]
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "text_md5": pa.array(h, pa.string())})


def exact_dedup(docs_ds):
    """Exact dedup groups: md5(text) → (keep_id = min doc_id, n)."""
    from ray.data.aggregate import Count, Min
    hashed = docs_ds.map_batches(md5_batch, batch_format="pyarrow")
    return (hashed.groupby("text_md5")
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Count(alias_name="n_docs")))


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle 64-bit hashes (numpy rolling hash)."""
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return np.array([int.from_bytes(data.tobytes(), "little")],
                        dtype=np.uint64)
    mult = np.uint64(1099511628211)
    out = np.zeros(len(data) - k + 1, dtype=np.uint64)
    for i in range(k):
        out = out * mult ^ data[i:len(data) - k + 1 + i].astype(np.uint64)
    return np.unique(out)


class MinHasher:
    """Actor-pool stage: doc → minhash signature + LSH band hashes.

    Permutation parameters generated once per actor in __init__
    (num_perm × (a, b) over a Mersenne prime)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5,
                 seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm,
                              dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm,
                              dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k).astype(np.uint64)
        # (a*x + b) mod p, min over shingles, per permutation
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) \
            % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into one row per LSH band."""
        df = batch.select(["doc_id", "text"]).to_pandas()
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:
                            (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8)
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(int.from_bytes(h.digest(), "little")
                                   % (1 << 62))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        })


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    # pair every doc with the bucket minimum — enough for connected
    # components, avoids O(n^2) blowup in giant buckets
    lo = ids[0]
    return pd.DataFrame({"a": np.full(len(ids) - 1, lo, dtype="int64"),
                         "b": ids[1:].astype("int64")})


def minhash_candidate_pairs(docs_ds, num_perm=64, bands=16, k=5):
    """LSH candidate pairs (a < b), deduplicated."""
    banded = docs_ds.map_batches(
        MinHasher, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow", concurrency=pool_share(0.5, cap=12),
        num_cpus=1)
    pairs = (banded.groupby(["band_id", "band_hash"])
             .map_groups(_bucket_pairs, batch_format="pandas"))

    def drop_dup_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # global pair dedup via coarse-bucket shuffle
    def add_bucket(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["pb"] = ((df["a"] * 1000003 + df["b"]) % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = pairs.map_batches(drop_dup_pairs, batch_format="pyarrow")
    pairs = pairs.map_batches(add_bucket, batch_format="pyarrow")
    pairs = pairs.groupby("pb").map_groups(
        lambda g: g.drop_duplicates(subset=["a", "b"]),
        batch_format="pandas")
    return pairs.drop_columns(["pb"])


def jaccard_verify(docs_ds, pairs_ds, threshold: float = 0.8, k: int = 5):
    """Verify candidate pairs with exact shingle Jaccard.

    The documents side is broadcast as an id→text dict (small side —
    fine at test scale; at 100 TB this becomes a hash join on doc_id,
    see functions/joins.py)."""
    import ray
    texts = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(
            batch_format="pyarrow"):
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            texts[i] = t
    ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            sims = []
            for a, b_ in zip(df["a"], df["b"]):
                sa = _shingles(self.texts[int(a)], k)
                sb = _shingles(self.texts[int(b_)], k)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                sims.append(inter / union if union else 1.0)
            df["jaccard"] = np.round(sims, 6)
            out = df[df["jaccard"] >= threshold]
            return pa.Table.from_pandas(out, preserve_index=False)

    return pairs_ds.map_batches(Verify, batch_format="pyarrow",
                                concurrency=pool_share(0.25, cap=4),
                                num_cpus=1)


class SimHasher:
    """Actor-pool SimHash (64-bit) over word tokens."""

    def __init__(self, seed: int = 11):
        import re
        self.tok = re.compile(r"\w+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        out = []
        for text in df["text"]:
            toks = self.tok.findall(text.lower())
            if not toks:
                out.append(0)
                continue
            hs = np.array([int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(),
                "little") for t in set(toks)], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32)
            v = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(0)
            for j in np.nonzero(v > 0)[0]:
                sim |= np.uint64(1) << np.uint64(j)
            out.append(int(sim % (1 << 63)))
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "simhash": pa.array(out, pa.int64())})


def simhash_signatures(docs_ds):
    return docs_ds.map_batches(SimHasher, batch_format="pyarrow",
                               concurrency=2, num_cpus=1)


def connected_components(pairs_ds, max_rounds: int = 10):
    """Min-label propagation over candidate-pair edges (groupby rounds).

    Returns (node, component) with component = min doc_id reachable.
    Each round is a groupby-min shuffle; rounds are O(log(diameter))
    because edges always include the bucket minimum."""
    from ray.data.aggregate import Min

    # undirected edges both ways
    def both_dirs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        rev = df.rename(columns={"a": "b", "b": "a"})
        out = pd.concat([df[["a", "b"]], rev[["a", "b"]]])
        return pa.Table.from_pandas(out, preserve_index=False)

    labels = None
    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow")
    edges_mat = edges.materialize()
    # initial label: min neighbor (including self via union below)
    labels = (edges_mat.groupby("a").aggregate(Min("b", alias_name="label")))

    def self_min(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["label"] = np.minimum(df["a"], df["label"])
        return pa.Table.from_pandas(df, preserve_index=False)

    labels = labels.map_batches(self_min, batch_format="pyarrow")
    for _ in range(max_rounds):
        labels_mat = labels.materialize()
        # join edges with neighbor labels via broadcast (labels are small:
        # one row per node in any candidate pair)
        lab = {int(r["a"]): int(r["label"])
               for r in labels_mat.iter_rows()}

        def prop(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df["label"] = np.minimum(
                df["a"].map(lab).fillna(df["a"]),
                df["b"].map(lab).fillna(df["b"])).astype("int64")
            return pa.Table.from_pandas(df[["a", "label"]],
                                        preserve_index=False)

        new_labels = (edges_mat.map_batches(prop, batch_format="pyarrow")
                      .groupby("a").aggregate(Min("label",
                                                  alias_name="label")))
        new_mat = new_labels.materialize()
        new_lab = {int(r["a"]): int(r["label"])
                   for r in new_mat.iter_rows()}
        if new_lab == lab:
            labels = new_mat
            break
        labels = new_mat
    return labels
