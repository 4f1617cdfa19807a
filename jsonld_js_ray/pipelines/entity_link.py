"""Corpus-level entity linking / node merge.

The corpus analog of the reference's node-map merge (SURVEY.md §2.5:
"group by (graph, @id), merge property lists, drop dup values",
/root/reference/lib/nodeMap.js + util.addValue semantics) expressed
skew-safely: node merge is ASSOCIATIVE (value-set union with the
reference's compareValues equality), so each batch first combines its
rows into partial nodes (map-side combine — the hot schema.org-style
subject never ships row-by-row), and a single bucketed groupby merges
partials. Hot keys therefore cost O(batches) partials instead of
O(occurrences) rows — the salting SURVEY.md §4.3 calls for, achieved
with a combiner."""

from __future__ import annotations

import json
import zlib

import pandas as pd
import pyarrow as pa

from ..core.node_map import add_value
from ..core.to_rdf import OBJ_BNODE, OBJ_IRI

NUM_BUCKETS = 64


def _rows_to_nodes(df: pd.DataFrame) -> dict:
    """(graph, subject, predicate, object...) rows → node dicts keyed by
    (graph, subject), using the reference's duplicate-value semantics."""
    nodes: dict = {}
    for row in df.itertuples(index=False):
        key = (row.graph, row.subject)
        node = nodes.get(key)
        if node is None:
            node = {"@id": row.subject}
            nodes[key] = node
        if row.object_kind in (OBJ_IRI, OBJ_BNODE):
            value = {"@id": row.object_value}
        else:
            value = {"@value": row.object_value}
            if row.datatype and row.datatype != \
                    "http://www.w3.org/2001/XMLSchema#string":
                value["@type"] = row.datatype
            if row.language:
                value["@language"] = row.language
        add_value(node, row.predicate, value)
    return nodes


def _merge_nodes(a: dict, b: dict) -> dict:
    for prop, values in b.items():
        if prop == "@id":
            continue
        for v in values:
            add_value(a, prop, v)
    return a


def partial_nodes_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine: one partial node per (graph, subject) per batch."""
    df = batch.select(["graph", "subject", "predicate", "object_kind",
                       "object_value", "datatype", "language"]).to_pandas()
    nodes = _rows_to_nodes(df)
    graphs, subjects, node_json, counts, buckets = [], [], [], [], []
    for (g, s), node in nodes.items():
        graphs.append(g)
        subjects.append(s)
        node_json.append(json.dumps(node, sort_keys=True,
                                    separators=(",", ":")))
        counts.append(sum(len(v) for k, v in node.items() if k != "@id"))
        # deterministic cross-process hash (Python's str hash is salted
        # per process and would scatter one key across buckets)
        buckets.append(zlib.crc32(f"{g}\x00{s}".encode()) % NUM_BUCKETS)
    return pa.table({
        "graph": pa.array(graphs, pa.string()),
        "subject": pa.array(subjects, pa.string()),
        "node_json": pa.array(node_json, pa.large_string()),
        "n_values": pa.array(counts, pa.int64()),
        "bucket": pa.array(buckets, pa.int32()),
    })


def _merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
    merged: dict = {}
    # deterministic merge order regardless of arrival
    group = group.sort_values(["graph", "subject", "node_json"],
                              kind="stable")
    for row in group.itertuples(index=False):
        key = (row.graph, row.subject)
        node = json.loads(row.node_json)
        if key in merged:
            _merge_bucket_node = merged[key]
            _merge_nodes(_merge_bucket_node, node)
        else:
            merged[key] = node
    out = {"graph": [], "subject": [], "node_json": [], "n_values": []}
    for (g, s), node in sorted(merged.items()):
        out["graph"].append(g)
        out["subject"].append(s)
        out["node_json"].append(json.dumps(node, sort_keys=True,
                                           separators=(",", ":")))
        out["n_values"].append(
            sum(len(v) for k, v in node.items() if k != "@id"))
    return pd.DataFrame(out)


def merge_entities(quads_ds):
    """Quad Dataset → merged node Dataset (graph, subject, node_json,
    n_values). The only shuffle moves partial nodes, not quad rows."""
    partials = quads_ds.map_batches(partial_nodes_batch,
                                    batch_format="pyarrow")
    merged = partials.groupby("bucket").map_groups(_merge_bucket,
                                                   batch_format="pandas")
    return merged
