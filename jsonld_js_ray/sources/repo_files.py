"""Deterministic synthetic repo-files table.

Per BASELINE.json ``input_hint`` the pipeline's input is a Parquet table
``(repo, path, commit, lang, content)`` of source-code repository files at
10^12-file scale. This module synthesizes that table deterministically
(seeded; FIXTURES.md §1-2 document shapes) at small scale for tests and
benchmarks, caches it as Parquet under /tmp, and returns the path — the
pipeline then genuinely ``read_parquet``s it like any other source.

Zipf-ish repo skew: repo r gets ~1/(r+1) of the files, so a handful of
repos are hot — exercising the salted-partitioning path at scale."""

from __future__ import annotations

import hashlib
import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .contexts import CHAIN, SCHEMA_LIKE, SMALL1, SMALL2

SEED = 42
CACHE_ROOT = "/tmp/graft_repo_files"

_LANG_OTHER = ["py", "md", "txt", "yaml"]


def _make_doc(rng: random.Random, repo: str, k: int):
    """One JSON-LD document; shape mirrors FIXTURES.md §2 families."""
    iri = f"https://ex.org/{repo}/{k}"
    shape = rng.randrange(12)
    if shape == 0:  # simple vocab terms
        return {"@context": {"@vocab": "http://ex.org/v/"},
                "@id": iri, "name": f"item {k}",
                "rank": rng.randrange(100)}
    if shape == 1:  # typed/coerced values via hot remote context
        return {"@context": SCHEMA_LIKE, "@id": iri, "type": "Person",
                "name": f"person {k}", "age": rng.randrange(90),
                "weight": round(rng.uniform(40, 120), 2),
                "active": rng.random() < 0.5,
                "knows": f"https://ex.org/{repo}/{k + 1}"}
    if shape == 2:  # language map + defaults
        return {"@context": SCHEMA_LIKE, "@id": iri,
                "label": {"en": f"thing {k}", "de": f"ding {k}"}}
    if shape == 3:  # @list container
        return {"@context": SCHEMA_LIKE, "@id": iri,
                "steps": [f"s{j}" for j in range(rng.randrange(1, 5))]}
    if shape == 4:  # nested bnodes + reverse
        return {"@context": SCHEMA_LIKE, "@id": iri,
                "author": {"name": f"anon {k}",
                           "memberOf": {"name": f"org {k % 7}"}},
                "parentOf": {"@id": f"https://ex.org/{repo}/{k}/child"}}
    if shape == 5:  # named graph
        return {"@context": {"@vocab": "http://ex.org/v/"},
                "@id": iri + "/g",
                "@graph": [{"@id": iri, "name": f"in-graph {k}"}]}
    if shape == 6:  # scoped contexts (type-scoped via Person)
        return {"@context": SCHEMA_LIKE, "@id": iri, "@type": "Person",
                "fullName": f"Full Name {k}"}
    if shape == 7:  # chained remote context
        return {"@context": CHAIN, "@id": iri,
                "title": f"t{k}", "extra": "e",
                "ref": f"https://ex.org/{repo}/{k - 1}"}
    if shape == 8:  # small remote context w/ default language
        return {"@context": SMALL2, "@id": iri, "caption": f"cap {k}"}
    if shape == 9:  # @json literal + index container
        return {"@context": SCHEMA_LIKE, "@id": iri,
                "payload": {"b": k, "a": [1.5, None, True]},
                "reviews": {"r1": {"name": "rev one"},
                            "r2": {"name": "rev two"}}}
    if shape == 10:  # warning cases: relative ids, keyword-lookalikes
        return {"@context": {"@vocab": "http://ex.org/v/"},
                "@id": iri, "@fake": "dropped", "name": f"warny {k}",
                "rel": {"@id": f"rel/{k}", "name": "kept-node"}}
    # shape 11: interchangeable bnode cycle (canonicalization workout)
    return {"@context": {"@vocab": "http://ex.org/v/"}, "@id": iri,
            "ring": {"p": {"p": {"p": {"name": "deep"}}}},
            "twin1": {"t": "same"}, "twin2": {"t": "same"}}


def _non_jsonld_content(rng: random.Random, lang: str, i: int) -> str:
    if lang == "py":
        return f"def f_{i}():\n    return {i}\n"
    if lang == "md":
        return f"# doc {i}\n\nsome prose line {rng.randrange(10)}\n"
    if lang == "yaml":
        return f"key_{i}: value\nlist:\n  - {i}\n"
    return f"plain text file {i}\n"


def generate_repo_files(n_rows: int, seed: int = SEED) -> pa.Table:
    """Deterministic table of n_rows repo files (~60% JSON-LD)."""
    rng_repo = np.random.default_rng(seed)
    n_repos = max(4, n_rows // 50)
    # Zipf-ish skew over repos
    zipf_weights = 1.0 / np.arange(1, n_repos + 1)
    zipf_weights /= zipf_weights.sum()
    repo_idx = rng_repo.choice(n_repos, size=n_rows, p=zipf_weights)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        rng = random.Random(seed * 1_000_003 + i)
        r = int(repo_idx[i])
        repo = f"org{r % 13}/repo{r}"
        commit = hashlib.sha1(f"{repo}@{seed}".encode()).hexdigest()
        if rng.random() < 0.6:
            doc = _make_doc(rng, repo, i)
            content = json.dumps(doc, separators=(",", ":"))
            lang = "jsonld" if rng.random() < 0.7 else "json"
            path = f"data/item-{i}.{'jsonld' if lang == 'jsonld' else 'json'}"
        else:
            lang = rng.choice(_LANG_OTHER)
            content = _non_jsonld_content(rng, lang, i)
            path = f"src/file_{i}.{lang}"
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a testdata dir name (sf0.01 → 0.01)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def n_rows_for_sf(sf: float) -> int:
    # sf0.001 → 1k rows (t1), sf0.01 → 10k (t2), sf0.1 → 100k (bench)
    return max(200, int(sf * 1_000_000))


def repo_files_path(sf: float, seed: int = SEED,
                    num_shards: int = 8) -> str:
    """Materialize (once) and return the cached Parquet directory.

    Written as ``num_shards`` row-grouped files so Ray's read produces
    well-sized parallel blocks, mirroring how a real corpus would arrive
    sharded."""
    n = n_rows_for_sf(sf)
    out_dir = os.path.join(CACHE_ROOT, f"n{n}-seed{seed}")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    tmp_dir = out_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_repo_files(n, seed)
    shard_size = (n + num_shards - 1) // num_shards
    for s in range(num_shards):
        shard = table.slice(s * shard_size, shard_size)
        if shard.num_rows:
            pq.write_table(shard, os.path.join(tmp_dir,
                                               f"part-{s:05d}.parquet"))
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(tmp_dir):
        os.replace(os.path.join(tmp_dir, f), os.path.join(out_dir, f))
    os.rmdir(tmp_dir)
    with open(done, "w") as fh:
        fh.write(str(n))
    return out_dir
