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


def _md5_planes(dim: int, n_planes: int) -> np.ndarray:
    """DuckDB-reproducible hyperplanes: weight(d, j) =
    ``md5_number_lower('lshplane:' || d || ':' || j) / 2^64 * 2 - 1``
    (uniform in [-1, 1) — any symmetric-about-zero distribution gives
    valid sign-LSH buckets, and md5 derivation lets the SQL oracle
    rebuild the identical plane matrix)."""
    from .dedup_text import _md5_u64
    w = np.empty((dim, n_planes), dtype=np.float64)
    for d in range(dim):
        for j in range(n_planes):
            w[d, j] = _md5_u64(f"lshplane:{d}:{j}") / 2.0**64 * 2.0 - 1.0
    return w


class HyperplaneLsh:
    """Scale path: random-hyperplane LSH bucketing. Vectors land in
    sign-pattern buckets; queries search only their own bucket (and the
    pipeline can probe neighboring buckets for recall).

    ``hash_mode="md5"`` derives the planes from md5 instead of a seeded
    Gaussian so the whole pipeline has a DuckDB value oracle (same
    precedent as the SimHash/MinHash md5 modes)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 5,
                 hash_mode: str = "gauss"):
        if hash_mode == "md5":
            self.planes = _md5_planes(dim, n_planes)
        else:
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
             n_planes: int = 6, seed: int = 5, hash_mode: str = "gauss"):
    """IVF/LSH-style ANN: bucket the corpus, search per-bucket only."""
    Q = np.asarray(query_vectors, dtype=np.float64)
    dim = Q.shape[1]
    lsh = HyperplaneLsh(dim, n_planes, seed, hash_mode)
    q_buckets = lsh.bucket_of(Q)

    bucketed = embeddings_ds.map_batches(
        HyperplaneLsh,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                               "seed": seed, "hash_mode": hash_mode},
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
            # round BEFORE the top-k cut and break ties by vec_id (the
            # same (cosine DESC, vec_id ASC) order the final rank and
            # the SQL oracle use) so the per-bucket combiner can never
            # drop a candidate the global ranking would have kept
            sims = np.round(M @ qv, 6)
            kk = min(k, len(sims))
            idx = np.lexsort((vec_ids, -sims))[:kk]
            rows.append(pd.DataFrame({
                "query_id": np.full(kk, qid, dtype="int64"),
                "vec_id": vec_ids[idx],
                "cosine": sims[idx]}))
        return pd.concat(rows, ignore_index=True)

    cands = bucketed.groupby("lsh_bucket").map_groups(
        per_bucket, batch_format="pandas")
    return cands.groupby("query_id").map_groups(_topk_group(k),
                                                batch_format="pandas")


def _pair_explode(n_blocks: int):
    """1→B explode: a vector in block b (= vec_id % B) is replicated into
    every tile (min(b,o), max(b,o)) for o in 0..B-1, so each unordered
    block pair — and hence each vector pair — meets in exactly one tile."""
    B = n_blocks

    def explode(batch: pa.Table) -> pa.Table:
        blk = (batch.column("vec_id").to_numpy() % B).astype(np.int64)
        out = []
        for other in range(B):
            i = np.minimum(blk, other)
            j = np.maximum(blk, other)
            t = batch.append_column("pair_key",
                                    pa.array(i * B + j, pa.int64()))
            out.append(t.append_column("blk", pa.array(blk, pa.int64())))
        return pa.concat_tables(out)

    return explode


def _pair_tile_kernel(n_blocks: int, threshold: float):
    """Per-tile exact cosine join. Tile (i, j) compares block-i rows
    against block-j rows (upper triangle when i == j). cosine is
    dot / (|a| * |b|), the oracle's formula, so float64 results agree to
    well under the 1e-6 rounding grid."""
    B = n_blocks
    empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                          "vec_b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        # normalize rows FIRST (n·d work) instead of dividing the n×n
        # dot matrix by an outer-product of norms: same cosine to ~1e-15
        # (rounded to 1e-6 downstream) with two fewer n² temporaries —
        # large fresh allocations are where this host's memory-compaction
        # stalls land, and at scale it is strictly less work
        i, j = divmod(int(g["pair_key"].iloc[0]), B)
        if i == j:
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            M = _matrix(g)
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ M.T
            ia, ib = np.nonzero(sims >= threshold)
            m = ids[ia] < ids[ib]
            ia, ib = ia[m], ib[m]
            a, b = ids[ia], ids[ib]
        else:
            left = g["blk"].to_numpy() == i
            gi, gj = g[left], g[~left]
            if not len(gi) or not len(gj):
                return empty
            ida = gi["vec_id"].to_numpy(dtype=np.int64)
            idb = gj["vec_id"].to_numpy(dtype=np.int64)
            A, Bm = _matrix(gi), _matrix(gj)
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bm = Bm / np.linalg.norm(Bm, axis=1, keepdims=True)
            sims = A @ Bm.T
            ia, ib = np.nonzero(sims >= threshold)
            # blocks are vec_id % B, so orient each cross pair a < b
            a = np.minimum(ida[ia], idb[ib])
            b = np.maximum(ida[ia], idb[ib])
        if not len(a):
            return empty
        return pd.DataFrame({"vec_a": a, "vec_b": b,
                             "cosine": np.round(sims[ia, ib], 6)})

    return per_tile


def embedding_cosine_pairs(embeddings_ds, threshold: float = 0.35,
                           n_blocks: int | None = None,
                           target_block_rows: int = 4096):
    """Embedding-cosine near-duplicate pairs — exact, fully distributed.

    Block-nested-loop join expressed in Ray Data: vectors are tiled into
    B = ceil(n / target_block_rows) hash blocks, each vector is exploded
    into the B tiles (i ≤ j) that contain its block, and a
    groupby(pair_key) shuffle co-locates each tile for one vectorized
    matmul. Every vector pair is compared exactly once; nothing is ever
    materialized on the driver and per-tile memory is bounded by
    2 × target_block_rows rows. Total compute is the inherent O(n²) of an
    exact all-pairs join (shuffle volume n·B scales with it); the scale
    path that trades recall for sub-quadratic cost is the LSH/IVF
    bucketing in lsh_topk / ivf_topk."""
    if n_blocks is None:
        # count BEFORE projecting: on a fresh read_parquet this is the
        # parquet-metadata fast path (no data read); a Project op in
        # between would force a full execution pass just to size blocks
        n_blocks = max(1, -(-embeddings_ds.count() // target_block_rows))
    ds = embeddings_ds.select_columns(["vec_id", "embedding"])
    if n_blocks == 1:
        # the whole corpus is one tile: a coalesce replaces the sort
        # shuffle (same kernel, same output; the groupby below would
        # spend seconds of fixed all-to-all overhead to co-locate a
        # single group)
        kern = _pair_tile_kernel(1, threshold)

        def single_tile(df: pd.DataFrame) -> pd.DataFrame:
            return kern(df.assign(pair_key=0, blk=0))

        return ds.repartition(1).map_batches(
            single_tile, batch_format="pandas", batch_size=None)
    tiled = ds.map_batches(_pair_explode(n_blocks), batch_format="pyarrow",
                           num_cpus=1)
    return tiled.groupby("pair_key").map_groups(
        _pair_tile_kernel(n_blocks, threshold), batch_format="pandas")


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
