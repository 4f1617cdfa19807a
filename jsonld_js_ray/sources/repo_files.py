"""Deterministic synthetic repo-files table.

Per BASELINE.json ``input_hint`` the pipeline's input is a Parquet table
``(repo, path, commit, lang, content)`` of source-code repository files at
10^12-file scale. This module synthesizes that table deterministically
(seeded; FIXTURES.md §1-2 document shapes) at small scale for tests and
benchmarks, caches it as Parquet under /tmp, and returns the path — the
pipeline then genuinely ``read_parquet``s it like any other source.

Every row is generated independently from ``hash(seed, i)`` (including its
Zipf-ish repo assignment via inverse-CDF sampling), so shards can be
generated in parallel Ray tasks for large benchmark corpora."""

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
CACHE_ROOT = "/tmp/graft_repo_files_v2"

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


def _zipf_cdf(n_repos: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n_repos + 1)
    return np.cumsum(w / w.sum())


def generate_rows(lo: int, hi: int, n_rows_total: int,
                  seed: int = SEED) -> pa.Table:
    """Rows [lo, hi) of the deterministic corpus of n_rows_total rows."""
    n_repos = max(4, n_rows_total // 50)
    cdf = _zipf_cdf(n_repos)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(lo, hi):
        rng = random.Random(seed * 1_000_003 + i)
        r = int(np.searchsorted(cdf, rng.random()))
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


def generate_repo_files(n_rows: int, seed: int = SEED) -> pa.Table:
    return generate_rows(0, n_rows, n_rows, seed)


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


def repo_files_path_n(n: int, seed: int = SEED,
                      num_shards: int | None = None) -> str:
    """Materialize (once) and return the cached Parquet directory.

    Written as sharded files so Ray's read produces well-sized parallel
    blocks. Generation parallelizes over Ray tasks when a Ray session is
    up (each shard is independently derivable)."""
    if num_shards is None:
        num_shards = max(8, min(64, n // 10_000))
    out_dir = os.path.join(CACHE_ROOT, f"n{n}-seed{seed}")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    tmp_dir = out_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    shard_size = (n + num_shards - 1) // num_shards
    bounds = [(s, min(n, s + shard_size))
              for s in range(0, n, shard_size)]

    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized() and n >= 50_000
    except ImportError:
        pass

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _gen(lo, hi, idx):
            t = generate_rows(lo, hi, n, seed)
            pq.write_table(t, os.path.join(tmp_dir,
                                           f"part-{idx:05d}.parquet"))
            return t.num_rows

        ray.get([_gen.remote(lo, hi, idx)
                 for idx, (lo, hi) in enumerate(bounds)])
    else:
        for idx, (lo, hi) in enumerate(bounds):
            t = generate_rows(lo, hi, n, seed)
            pq.write_table(t, os.path.join(tmp_dir,
                                           f"part-{idx:05d}.parquet"))

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(tmp_dir):
        os.replace(os.path.join(tmp_dir, f), os.path.join(out_dir, f))
    os.rmdir(tmp_dir)
    with open(done, "w") as fh:
        fh.write(str(n))
    return out_dir


def repo_files_path(sf: float, seed: int = SEED,
                    num_shards: int | None = None) -> str:
    return repo_files_path_n(n_rows_for_sf(sf), seed, num_shards)
