"""The flagship KG-construction pipeline (BASELINE.json north_star).

read_parquet(repo files) → extract/sha256 (stateless mb) →
expand+toRDF (actor pool, broadcast context snapshot) → exact quad dedup
(map-side combine + hash shuffle) → entity-link aggregation (partial
per-batch combine + small groupby) → partitioned (subj, pred, obj)
Parquet with a per-partition resume manifest.

Every stage streams: nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..sources.contexts import build_context_snapshot
from ..sources.repo_files import repo_files_path, sf_from_dir
from ..stages.dedup import dedup_quads, dedup_quads_per_partition
from ..stages.expand_quads import DocStatus, ExpandToQuads
from ..stages.extract import extract_batch
from ..state import checkpoint

DEFAULT_PARTITIONS = 64


from ..util_ray import default_concurrency as _cap_concurrency


def read_repo_files(input_path: str):
    import ray
    # all five input columns are needed downstream; prune nothing here but
    # keep the explicit list so accidental extra columns never ship
    return ray.data.read_parquet(
        input_path, columns=["repo", "path", "commit", "lang", "content"])


def build_quads(ds, snapshot=None, num_partitions: int = DEFAULT_PARTITIONS,
                concurrency: Optional[int] = None, batch_size: int = 1024,
                skip_partitions: Optional[set] = None):
    """repo-files Dataset → quad Dataset (lazy, streaming)."""
    import ray
    if snapshot is None:
        snapshot = build_context_snapshot()
    snapshot_ref = ray.put(snapshot)
    concurrency = _cap_concurrency(concurrency)

    ds = ds.map_batches(
        lambda b: extract_batch(b, num_partitions=num_partitions),
        batch_format="pyarrow")
    if skip_partitions:
        skip = pa.array(sorted(skip_partitions), pa.int32())
        ds = ds.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("partition_id"),
                                   value_set=skip))),
            batch_format="pyarrow")
    ds = ds.map_batches(
        ExpandToQuads,
        fn_constructor_kwargs={"snapshot_ref": snapshot_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
    return ds


def run_kg_pipeline(input_path: str, out_dir: str,
                    num_partitions: int = DEFAULT_PARTITIONS,
                    concurrency: Optional[int] = None,
                    batch_size: int = 1024,
                    dedup="partition",
                    write_mode: str = "stream",
                    resume: bool = True) -> dict:
    """End-to-end run with resumable partitioned output. Returns metrics."""
    completed = checkpoint.completed_partitions(out_dir) if resume else set()
    data_dir = os.path.join(out_dir, "quads")

    # crash hygiene: a killed run may leave partition files without
    # manifest entries; those partitions will be recomputed, so their
    # orphaned files must go first or the readback would double-count
    if resume and os.path.isdir(data_dir):
        import shutil as _shutil
        for name in os.listdir(data_dir):
            if not name.startswith("partition_id="):
                continue
            pid = int(name.split("=", 1)[1])
            if pid not in completed:
                _shutil.rmtree(os.path.join(data_dir, name),
                               ignore_errors=True)

    ds = read_repo_files(input_path)
    if completed:
        # cheap pre-scan (read + vectorized extract only — no expansion) to
        # decide whether any partition remains; avoids an empty all-to-all
        # shuffle + empty partitioned write on a fully-resumed job
        probe = ds.map_batches(
            lambda b: extract_batch(b, num_partitions=num_partitions),
            batch_format="pyarrow")
        skip = pa.array(sorted(completed), pa.int32())
        probe = probe.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("partition_id"),
                                   value_set=skip))),
            batch_format="pyarrow")
        if probe.count() == 0:
            summary = {"n_quads": 0, "n_partitions": 0,
                       "resumed_skipped": sorted(completed)}
            checkpoint.write_job_summary(out_dir, summary)
            return summary

    if write_mode == "stream":
        # streaming hash exchange into writer actors: no all-to-all
        # barrier; the sort-shuffle reduce did not scale on this box
        # (see stages/partition_sink.py)
        from ..stages.dedup import add_quad_hash, partial_dedup_batch
        from ..stages.partition_sink import WriterPool, make_router
        from ..util_ray import cluster_cpus
        cpus = cluster_cpus()
        num_writers = max(2, min(16, cpus // 4))
        expand_conc = _cap_concurrency(concurrency)
        # leave a full slot per writer plus headroom: oversubscribing
        # the expand pool starves the router/read tasks (measured: 27
        # expanders + 8 writers = 83 s vs 23 expanders = 46 s at 4M rows)
        quads = build_quads(ds, num_partitions=num_partitions,
                            concurrency=min(expand_conc,
                                            max(1, cpus - num_writers
                                                - 1)),
                            batch_size=batch_size,
                            skip_partitions=completed)
        if dedup:
            quads = quads.map_batches(partial_dedup_batch,
                                      batch_format="pyarrow")
            quads = quads.map_batches(
                lambda b: add_quad_hash(b, None), batch_format="pyarrow")
        pool = WriterPool(data_dir, num_writers, dedup=bool(dedup))
        routed = quads.map_batches(
            make_router(pool.handles(), num_writers),
            batch_format="pyarrow")
        import time as _time
        _t0 = _time.time()
        routed.count()  # drive the stream to completion
        _stream_sec = _time.time() - _t0
        _t0 = _time.time()
        merged = pool.finalize()
        _finalize_sec = _time.time() - _t0
        pool.shutdown()
        counts = {pid: e["n_quads"] for pid, e in merged.items()}
        ndocs = {pid: e["n_docs"] for pid, e in merged.items()}
        phase_timings = {"stream_sec": round(_stream_sec, 2),
                         "finalize_sec": round(_finalize_sec, 2)}
    else:
        quads = build_quads(ds, num_partitions=num_partitions,
                            concurrency=concurrency,
                            batch_size=batch_size,
                            skip_partitions=completed)
        # One groupby(partition_id) shuffle serves double duty: dedup
        # scope AND output co-location (one block → one file per hive
        # partition; without it every block × partition pair becomes its
        # own tiny file — observed 1700+ files for 21k rows).
        # dedup="global" adds a quad-hash shuffle first for strict
        # cross-partition dedup.
        if dedup == "global":
            quads = dedup_quads(quads)
            quads = quads.groupby("partition_id").map_groups(
                lambda df: df, batch_format="pandas")
        elif dedup:
            quads = dedup_quads_per_partition(quads)
        else:
            quads = quads.groupby("partition_id").map_groups(
                lambda df: df, batch_format="pandas")
        quads.write_parquet(data_dir, partition_cols=["partition_id"])

        # per-partition metrics: quad counts from parquet metadata only
        # (no data read); doc counts via a distributed two-stage
        # distinct — never materialize the written quads on the driver
        dataset = pads.dataset(data_dir, partitioning="hive")
        counts = {}
        for frag in dataset.get_fragments():
            part = _hive_partition_id(frag.path)
            counts[part] = counts.get(part, 0) + frag.count_rows()
        ndocs = _distinct_docs_per_partition(data_dir)

    for part, n in counts.items():
        if part in completed:
            continue
        checkpoint.write_partition_entry(
            out_dir, part, n_quads=n,
            n_docs=int(ndocs.get(part, 0)),
            input_fingerprint=os.path.basename(str(input_path)))
    total = {"n_quads": int(sum(counts.values())),
             "n_partitions": len(counts),
             "resumed_skipped": sorted(completed)}
    if write_mode == "stream":
        total["phases"] = phase_timings
    checkpoint.write_job_summary(out_dir, total)
    return total


def _distinct_docs_per_partition(data_dir: str) -> dict:
    """Distinct content_sha256 per partition_id over a written hive
    dataset — two-stage distinct (batch-local dedup → global pair
    groupby → per-partition count), all distributed; the driver only
    receives one row per partition."""
    import ray
    from ray.data.aggregate import Count, Sum

    mds = ray.data.read_parquet(data_dir,
                                columns=["content_sha256"],
                                partitioning="hive")

    def local_pairs(b: pa.Table) -> pa.Table:
        df = (b.select(["partition_id", "content_sha256"]).to_pandas()
              .drop_duplicates())
        df["partition_id"] = df["partition_id"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    pair = (mds.map_batches(local_pairs, batch_format="pyarrow")
            .groupby(["partition_id", "content_sha256"])
            .aggregate(Count(alias_name="_c")))

    def local_counts(b: pa.Table) -> pa.Table:
        df = b.select(["partition_id"]).to_pandas()
        g = (df.groupby("partition_id").size()
             .rename("n_docs").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (pair.map_batches(local_counts, batch_format="pyarrow")
           .groupby("partition_id")
           .aggregate(Sum("n_docs", alias_name="n_docs")))
    return {int(r["partition_id"]): int(r["n_docs"])
            for r in out.take_all()}


def _hive_partition_id(path: str) -> int:
    for seg in path.split(os.sep):
        if seg.startswith("partition_id="):
            return int(seg.split("=", 1)[1])
    return -1


def entity_summary(quads_ds):
    """Entity-linking aggregate: per canonical subject IRI, triple count and
    referencing-doc count. Skew-safe: partial per-batch combine (vectorized
    pandas groupby) before the small global groupby-sum (SURVEY.md §2.5).

    n_docs is a TRUE distinct count via two-stage groupby — a per-batch
    ``nunique`` summed globally would count a document once per block it
    spans, making the result vary with partitioning. Stage 1 reduces to
    one row per (subject, doc) pair (carrying partial quad counts);
    stage 2 counts those rows per subject.
    """
    import pandas as pd

    n_buckets = 128

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["subject", "content_sha256"]).to_pandas()
        g = (df.groupby(["subject", "content_sha256"])
               .agg(n_quads=("subject", "size"))
               .reset_index())
        # coarse bucket of the pair key: per-(subject, doc) Ray groups
        # would pay per-group overhead at one group per pair
        g["_pb"] = ((pd.util.hash_array(g["subject"].to_numpy(
            dtype=object)) ^ pd.util.hash_array(
            g["content_sha256"].to_numpy(dtype=object)))
            % n_buckets).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["subject", "content_sha256"], as_index=False)
               ["n_quads"].sum())
        out["n_quads"] = out["n_quads"].astype("int64")
        out["_sb"] = (pd.util.hash_array(out["subject"].to_numpy(
            dtype=object)) % n_buckets).astype("int64")
        return out

    pair = (quads_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pb").map_groups(sum_pairs, batch_format="pandas"))

    def per_subject(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("subject")
               .agg(n_quads=("n_quads", "sum"),
                    n_docs=("content_sha256", "size"))
               .reset_index())
        out["n_quads"] = out["n_quads"].astype("int64")
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return (pair.groupby("_sb")
            .map_groups(per_subject, batch_format="pandas"))


def doc_status(ds, snapshot=None, concurrency: Optional[int] = None,
               batch_size: int = 128,
               num_partitions: int = DEFAULT_PARTITIONS):
    """Per-document status/metrics Dataset (quarantine accounting)."""
    import ray
    if snapshot is None:
        snapshot = build_context_snapshot()
    snapshot_ref = ray.put(snapshot)
    ds = ds.map_batches(
        lambda b: extract_batch(b, num_partitions=num_partitions),
        batch_format="pyarrow")
    return ds.map_batches(
        DocStatus,
        fn_constructor_kwargs={"snapshot_ref": snapshot_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_cap_concurrency(concurrency), num_cpus=1)


def repo_files_for_sf_dir(sf_dir: str) -> str:
    """Resolve (materializing if needed) the synthetic repo-files corpus
    matching a testdata sf directory (TESTDATA.md scale tiers)."""
    return repo_files_path(sf_from_dir(sf_dir))
