"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once, read per actor, never
re-shipped per batch). Scale path: LSH-bucketed variant (random
hyperplane signs → bucket groupby → per-bucket brute force)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util_ray import default_concurrency


def _matrix(batch_df: pd.DataFrame, col: str = "embedding") -> np.ndarray:
    return np.stack(batch_df[col].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Actor-pool stage: per batch, cosine of all rows vs the broadcast
    query matrix; emits per-(query, row) candidates. A downstream
    groupby(query).map_groups keeps global top-k."""

    def __init__(self, queries_ref, k: int = 10):
        import ray
        q = (ray.get(queries_ref) if not isinstance(queries_ref, dict)
             else queries_ref)
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        M = _normalize(_matrix(df))
        sims = M @ self.Q.T                       # (rows, queries)
        vec_ids = df["vec_id"].to_numpy(dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.append(np.full(k, self.query_ids[qi], dtype=np.int64))
            out_v.append(vec_ids[idx])
            out_s.append(col[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def _topk_group(k):
    def inner(g: pd.DataFrame) -> pd.DataFrame:
        # rank on ROUNDED cosine with vec_id tie-break so Ray and the SQL
        # oracle order identically regardless of last-ulp float noise
        g = g.copy()
        g["cosine"] = g["cosine"].round(6)
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g
    return inner


def brute_force_topk(embeddings_ds, query_ids, query_vectors, k: int = 10):
    """Global top-k per query: per-batch partial top-k (combiner) →
    groupby(query_id) final top-k. Returns (query_id, vec_id, cosine,
    rank)."""
    import ray
    ref = ray.put({"ids": list(query_ids), "vectors": query_vectors})
    cands = embeddings_ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", concurrency=default_concurrency(8), num_cpus=1)
    return cands.groupby("query_id").map_groups(_topk_group(k),
                                                batch_format="pandas")


class HyperplaneLsh:
    """Scale path: random-hyperplane LSH bucketing. Vectors land in
    sign-pattern buckets; queries search only their own bucket (and the
    pipeline can probe neighboring buckets for recall)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, M: np.ndarray) -> np.ndarray:
        signs = (M @ self.planes) > 0
        return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        M = _matrix(df)
        return batch.append_column(
            "lsh_bucket", pa.array(self.bucket_of(M), pa.int64()))


def lsh_topk(embeddings_ds, query_ids, query_vectors, k: int = 10,
             n_planes: int = 6, seed: int = 5):
    """IVF/LSH-style ANN: bucket the corpus, search per-bucket only."""
    Q = np.asarray(query_vectors, dtype=np.float64)
    dim = Q.shape[1]
    lsh = HyperplaneLsh(dim, n_planes, seed)
    q_buckets = lsh.bucket_of(Q)

    bucketed = embeddings_ds.map_batches(
        HyperplaneLsh,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                               "seed": seed},
        batch_format="pyarrow", concurrency=default_concurrency(8), num_cpus=1)

    by_bucket: dict[int, list[int]] = {}
    for qid, qb in zip(query_ids, q_buckets):
        by_bucket.setdefault(int(qb), []).append(int(qid))
    qmap = {int(qid): Q[i] for i, qid in enumerate(query_ids)}

    import ray
    ref = ray.put((by_bucket, qmap))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # broadcast read: object-store get per task, not per row
        bb, qm = ray.get(ref)
        bucket = int(g["lsh_bucket"].iloc[0])
        qids = bb.get(bucket, [])
        if not qids:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64")})
        M = _normalize(_matrix(g))
        vec_ids = g["vec_id"].to_numpy(dtype=np.int64)
        rows = []
        for qid in qids:
            qv = qm[qid]
            qv = qv / (np.linalg.norm(qv) or 1.0)
            sims = M @ qv
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            rows.append(pd.DataFrame({
                "query_id": np.full(kk, qid, dtype="int64"),
                "vec_id": vec_ids[idx],
                "cosine": np.round(sims[idx], 6)}))
        return pd.concat(rows, ignore_index=True)

    cands = bucketed.groupby("lsh_bucket").map_groups(
        per_bucket, batch_format="pandas")
    return cands.groupby("query_id").map_groups(_topk_group(k),
                                                batch_format="pandas")


class CosinePairsVsMatrix:
    """Actor-pool stage: one float64 matmul per batch against the
    broadcast corpus matrix; emits only above-threshold pairs a < b."""

    def __init__(self, matrix_ref, threshold: float):
        import ray
        side = ray.get(matrix_ref)
        self.ids = side["ids"]                    # int64 (n,)
        self.mat = side["matrix"]                 # float64 (n, d)
        self.norms = np.linalg.norm(self.mat, axis=1)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        emb = np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in batch.column("embedding").to_pylist()])
        # cosine = dot / (|a| * |b|), matching the oracle's formula so
        # float64 results agree to well under the 1e-6 rounding grid
        dots = emb @ self.mat.T
        bn = np.linalg.norm(emb, axis=1)
        sims = dots / np.outer(bn, self.norms)
        a_less_b = vid[:, None] < self.ids[None, :]
        ia, ib = np.nonzero((sims >= self.threshold) & a_less_b)
        return pa.table({
            "vec_a": pa.array(vid[ia], pa.int64()),
            "vec_b": pa.array(self.ids[ib], pa.int64()),
            "cosine": pa.array(np.round(sims[ia, ib], 6), pa.float64()),
        })


def embedding_cosine_pairs(embeddings_ds, threshold: float = 0.35):
    """Embedding-cosine near-duplicate pairs (brute-force baseline).

    The corpus matrix is assembled once by streaming batches on the
    driver, broadcast via ray.put, and every batch does a single float64
    matmul against it — the same broadcast-small-side shape as
    brute_force_topk. This is the exact baseline; the scale path once the
    matrix no longer fits a node is the LSH-bucketed variant (lsh_topk's
    bucketing), which trades recall for a bounded bucket join."""
    import ray
    ids, chunks = [], []
    for b in embeddings_ds.select_columns(["vec_id", "embedding"]) \
            .iter_batches(batch_format="pyarrow", batch_size=4096):
        ids.append(b.column("vec_id").to_numpy())
        chunks.append(np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in b.column("embedding").to_pylist()]))
    side = {"ids": np.concatenate(ids),
            "matrix": np.concatenate(chunks, axis=0)}
    ref = ray.put(side)
    return embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        CosinePairsVsMatrix,
        fn_constructor_kwargs={"matrix_ref": ref, "threshold": threshold},
        batch_format="pyarrow", concurrency=default_concurrency(8),
        num_cpus=1)


def _kmeans(sample: np.ndarray, n_centroids: int, seed: int = 13,
            iters: int = 8) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (coarse
    quantizer training only — the corpus itself is never materialized)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = sample[rng.choice(n, size=min(n_centroids, n),
                              replace=False)].copy()
    for _ in range(iters):
        d = sample @ cents.T
        assign = np.argmax(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


class IvfTopK:
    """Actor-pool stage: per batch, score rows against ONLY the queries
    that probe the row's centroid list (inverted-file restriction) —
    compute scales with the probed fraction, not the full corpus."""

    def __init__(self, side_ref, k: int = 10):
        import ray
        side = ray.get(side_ref)
        self.query_ids = side["ids"]            # (q,)
        self.Q = side["Q"]                      # (q, d) normalized
        self.cents = side["cents"]              # (c, d) normalized
        self.probes = side["probes"]            # (q, n_probe) centroid ids
        self.k = k
        # centroid -> list of query indices probing it
        self.by_cent: dict[int, np.ndarray] = {}
        for qi, ps in enumerate(self.probes):
            for c in ps:
                self.by_cent.setdefault(int(c), []).append(qi)
        self.by_cent = {c: np.asarray(v, dtype=np.int64)
                        for c, v in self.by_cent.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        M = _normalize(_matrix(df))
        vec_ids = df["vec_id"].to_numpy(dtype=np.int64)
        cids = np.argmax(M @ self.cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for c, q_idx in self.by_cent.items():
            rows = np.nonzero(cids == c)[0]
            if not len(rows):
                continue
            sims = M[rows] @ self.Q[q_idx].T    # (rows_c, probing queries)
            k = min(self.k, len(rows))
            for j, qi in enumerate(q_idx):
                col = sims[:, j]
                idx = np.argpartition(-col, k - 1)[:k]
                out_q.append(np.full(k, self.query_ids[qi],
                                     dtype=np.int64))
                out_v.append(vec_ids[rows[idx]])
                out_s.append(col[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def ivf_topk(embeddings_ds, query_ids, query_vectors, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 13,
             train_sample: int = 2048):
    """IVF ANN: train a coarse quantizer on a bounded sample, assign
    rows to inverted lists on the fly, and score each query only inside
    its ``n_probe`` nearest lists. Recall < 1 by design; the brute-force
    path is the exact baseline (see ann_brute_force_topk)."""
    import ray
    sample_rows = embeddings_ds.limit(train_sample) \
        .select_columns(["embedding"]).take_all()
    sample = _normalize(np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in sample_rows]))
    cents = _kmeans(sample, n_centroids, seed)
    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probes = np.argsort(-(Q @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "Q": Q, "cents": cents, "probes": probes})
    cands = embeddings_ds.map_batches(
        IvfTopK, fn_constructor_kwargs={"side_ref": ref, "k": k},
        batch_format="pyarrow", concurrency=default_concurrency(8),
        num_cpus=1)
    return cands.groupby("query_id").map_groups(_topk_group(k),
                                                batch_format="pandas")
