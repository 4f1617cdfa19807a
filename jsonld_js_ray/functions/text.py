"""Text analysis over the ``documents`` table (training-data ops).

All stages are vectorized ``map_batches`` bodies (pandas string kernels /
numpy); stateful pieces (compiled regexes, stopword tables) live in
actor classes built once per worker. Each op has a ``queries()`` entry in
__ray_entry__.py; SQL-expressible ones carry DuckDB oracles."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS_RE = r"\s+"

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (public-knowledge word lists, deliberately small)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu",
           "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "para"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace tokenization, matching the SQL oracle
    ``length(string_split_regex(trim(text), '\\s+'))``)."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    stripped = df["text"].str.strip()
    n = stripped.str.split(_WS_RE, regex=True).str.len()
    n = n.where(stripped.str.len() > 0, 1)  # DuckDB: split('') → ['']
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "n_tokens": pa.array(n.astype("int64"), pa.int64())})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality scoring: length + punctuation/digit/space ratios, rounded to
    6 decimals so Ray and the DuckDB oracle hash identically."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    text = df["text"]
    n_chars = text.str.len().astype("int64")
    denom = n_chars.where(n_chars > 0, 1)
    punct = text.str.count(r"[^\w\s]").astype("float64")
    digit = text.str.count(r"[0-9]").astype("float64")
    space = text.str.count(r"\s").astype("float64")
    return pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "punct_ratio": pa.array((punct / denom).round(6), pa.float64()),
        "digit_ratio": pa.array((digit / denom).round(6), pa.float64()),
        "space_ratio": pa.array((space / denom).round(6), pa.float64()),
    })


class LangId:
    """Actor-pool language ID: stopword-profile scoring (setup once per
    actor: compiled tokenizer + profiles; SURVEY.md actor-pool pattern)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-ZäöüÄÖÜßéèêàâçñ]+")
        self.profiles = {lang: frozenset(words)
                         for lang, words in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        langs, hits_out, toks_out = [], [], []
        for text in df["text"]:
            toks = [t.lower() for t in self.word_re.findall(text)[:200]]
            best_lang, best = "und", 0
            # denominators are equal across languages per doc, so the
            # strictly-greater HIT comparison is the score argmax with
            # first-profile tie-break; integer outputs keep the DuckDB
            # oracle exact (no float rounding-mode hazards)
            for lang, prof in self.profiles.items():
                h = sum(1 for t in toks if t in prof)
                if h > best:
                    best_lang, best = lang, h
            langs.append(best_lang)
            hits_out.append(best)
            toks_out.append(len(toks))
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "lang_pred": pa.array(langs, pa.string()),
            "lang_hits": pa.array(hits_out, pa.int64()),
            "lang_toks": pa.array(toks_out, pa.int64()),
        })


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Document fingerprinting: winnowed rolling (Rabin-Karp style) hash —
    min hash over each sliding window of byte 4-grams (numpy-vectorized)."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    fps = []
    for text in df["text"]:
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(data) < 4:
            fps.append(int(data.sum()))
            continue
        a = data[:-3].astype(np.uint64)
        b = data[1:-2].astype(np.uint64)
        c = data[2:-1].astype(np.uint64)
        d = data[3:].astype(np.uint64)
        grams = (a * np.uint64(16777619) ^ b * np.uint64(31)
                 ^ c * np.uint64(131) ^ d)
        if len(grams) <= window:
            fps.append(int(grams.min()))
        else:
            view = np.lib.stride_tricks.sliding_window_view(grams, window)
            fps.append(int(view.min(axis=1).sum() % (1 << 63)))
    return pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "fingerprint": pa.array(fps, pa.int64()),
    })


_BPE_RE = None


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-style pre-tokenizer count: letter runs, digit runs, and
    punctuation runs count separately (an ASCII-safe simplification of
    the GPT-2 pre-tokenizer split, chosen so RE2-based SQL oracles and
    Python agree byte-for-byte). Compiled once per process."""
    global _BPE_RE
    if _BPE_RE is None:
        import re
        _BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+")
    df = batch.select(["doc_id", "text"]).to_pandas()
    counts = [len(_BPE_RE.findall(t)) for t in df["text"]]
    return pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "n_bpe_tokens": pa.array(counts, pa.int64()),
    })
