"""Per-partition checkpoint manifest → resumable output.

Ray task retries cover task-level failure; this manifest covers job-level
restart (SURVEY.md §4.3.5): output is partitioned Parquet keyed by
``partition_id = hash(repo) % P``, and each completed partition gets a
JSON manifest entry with its input fingerprint and row/triple counts. A
rerun loads the manifest and filters already-completed partitions out of
the input at the read, so only unfinished work is recomputed."""

from __future__ import annotations

import json
import os
import time
from typing import Iterable


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("partition-") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as fh:
                    entry = json.load(fh)
                if entry.get("status") == "complete":
                    done.add(int(entry["partition_id"]))
            except (ValueError, KeyError, OSError):
                continue
    return done


def write_partition_entry(out_dir: str, partition_id: int,
                          n_quads: int, n_docs: int,
                          input_fingerprint: str = ""):
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    entry = {
        "partition_id": int(partition_id),
        "status": "complete",
        "n_quads": int(n_quads),
        "n_docs": int(n_docs),
        "input_fingerprint": input_fingerprint,
        "completed_at": time.time(),
    }
    path = os.path.join(mdir, f"partition-{partition_id:05d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, path)


def write_job_summary(out_dir: str, summary: dict):
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, "job.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(summary, fh, indent=1)
    os.replace(tmp, path)


def read_entries(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("partition-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                out.append(json.load(fh))
    return out
