"""Relational / stream-shaped operators over the TPC-H-ish tables.

Demonstrates the scale patterns on generic tables: pre-aggregated
groupby (map-side combine before the shuffle), broadcast hash join
(``ray.put`` the dimension side once), sort + limit top-k, tumbling
windows and gap sessionization over the ``events`` log."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util_ray import default_concurrency


def lineitem_pricing_summary(lineitem_ds):
    """TPC-H Q1-shaped aggregate with map-side partial aggregation:
    one partial row per (flag, status) per batch, then a tiny global
    groupby-sum — the shuffle moves O(groups × batches), not O(rows)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  sum_base_price=("l_extendedprice", "sum"),
                  sum_disc_price=("disc_price", "sum"),
                  count_order=("l_quantity", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    out = (partials.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_price", alias_name="sum_base_price"),
                      Sum("sum_disc_price", alias_name="sum_disc_price"),
                      Sum("count_order", alias_name="count_order")))

    def round_cols(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            df[c] = df[c].round(2)
        df["count_order"] = df["count_order"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return out.map_batches(round_cols, batch_format="pyarrow")


def customer_nation_revenue(orders_ds, customer_ds, nation_df,
                            broadcast_threshold: int = 5_000_000):
    """Revenue per nation over orders ⋈ customer ⋈ nation.

    nation is tiny forever (25 rows) and ships as a plain dict via
    ``ray.put``; customer is only "small" until it isn't, so the
    custkey→n_name side is built DISTRIBUTED (customer batches map to
    (o_custkey, n_name) in tasks; the driver holds only object refs)
    and broadcast while under ``broadcast_threshold`` rows — beyond
    that the orders⋈customer side flips to the bucketed ``hash_join``
    (same strategy as :func:`region_revenue` / Q3)."""
    import ray
    from ray.data.aggregate import Sum

    n2name = dict(zip(nation_df["n_nationkey"], nation_df["n_name"]))
    n2name_ref = ray.put(n2name)

    class CustNation:
        def __init__(self, n2name_ref):
            self.n2name = ray.get(n2name_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            return pa.table({
                "o_custkey": pa.array(df["c_custkey"], pa.int64()),
                "n_name": pa.array(df["c_nationkey"].map(self.n2name),
                                   pa.string()),
            })

    cust_nation = customer_ds.map_batches(
        CustNation, fn_constructor_kwargs={"n2name_ref": n2name_ref},
        batch_format="pyarrow", concurrency=default_concurrency(8),
        num_cpus=1)

    cn_refs = _small_side_refs(cust_nation, broadcast_threshold)
    if cn_refs is None:
        # scale fallback: customer no longer broadcastable
        joined = hash_join(orders_ds, cust_nation, "o_custkey")

        def partial(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            g = (df.groupby("n_name", as_index=False)
                 .agg(revenue=("o_totalprice", "sum"),
                      n_orders=("o_orderkey", "size")))
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = joined.map_batches(partial, batch_format="pyarrow")
    else:
        class JoinDim:
            def __init__(self, cn_refs):
                t = pa.concat_tables(ray.get(cn_refs))
                self.map = pd.Series(
                    t.column("n_name").to_pandas().values,
                    index=t.column("o_custkey").to_numpy(
                        zero_copy_only=False))

            def __call__(self, batch: pa.Table) -> pa.Table:
                df = batch.to_pandas()
                df["n_name"] = df["o_custkey"].map(self.map)
                g = (df.dropna(subset=["n_name"])
                     .groupby("n_name", as_index=False)
                     .agg(revenue=("o_totalprice", "sum"),
                          n_orders=("o_orderkey", "size")))
                return pa.Table.from_pandas(g, preserve_index=False)

        partials = orders_ds.map_batches(
            JoinDim, fn_constructor_kwargs={"cn_refs": cn_refs},
            batch_format="pyarrow", concurrency=default_concurrency(8),
            num_cpus=1)

    out = (partials.groupby("n_name")
           .aggregate(Sum("revenue", alias_name="revenue"),
                      Sum("n_orders", alias_name="n_orders")))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["revenue"].round(2)
        df["n_orders"] = df["n_orders"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return out.map_batches(finish, batch_format="pyarrow")


def top_orders(orders_ds, k: int = 10):
    """Top-k by price: per-batch partial top-k combiner, then a single
    tiny global sort — never a full global sort of the fact table."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            df[["o_orderkey", "o_custkey", "o_totalprice"]],
            preserve_index=False)

    partials = orders_ds.map_batches(partial, batch_format="pyarrow")
    top = partials.sort(["o_totalprice", "o_orderkey"],
                        descending=[True, False]).limit(k)
    return top


def events_tumbling_window(events_ds, window_s: int = 3600):
    """Tumbling-window aggregate per (user, window): partial combine per
    batch then global groupby-sum (stream-shaped; guide §streaming)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        epoch = df["ts"].astype("int64") // 1_000_000
        df["window_start"] = (epoch // window_s) * window_s
        g = (df.groupby(["user_id", "window_start"], as_index=False)
             .agg(n_events=("event_id", "size"),
                  sum_value=("value", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    out = (partials.groupby(["user_id", "window_start"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value", alias_name="sum_value")))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = df["sum_value"].round(6)
        return pa.Table.from_pandas(df, preserve_index=False)

    return out.map_batches(finish, batch_format="pyarrow")


def events_sessionize(events_ds, gap_s: int = 1800,
                      n_buckets: int = 64):
    """Gap-based sessionization.

    The shuffle key is a coarse bucket of user_id (one Python call per
    BUCKET, not per user — per-user map_groups pays Ray's per-group
    overhead); inside a bucket ALL users sessionize vectorized: one sort
    by (user, ts), per-user gap detection via groupby-shift, cumsum
    session ids, one groupby-agg. Assumes one user's events fit one
    bucket alongside its peers (true for any realistic per-user volume;
    hot users would be range-split by day)."""
    def add_bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_ub", pa.array(u % np.int64(n_buckets), pa.int64()))

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        epoch = g["ts"].astype("int64") // 1_000_000
        prev = epoch.groupby(g["user_id"]).shift()
        new_session = (epoch - prev).fillna(gap_s + 1) > gap_s
        session_idx = new_session.cumsum()  # global across bucket: ok,
        # a new user always starts a new session id
        out = (g.assign(_sid=session_idx, epoch=epoch)
               .groupby("_sid")
               .agg(user_id=("user_id", "first"),
                    session_start=("epoch", "min"),
                    session_end=("epoch", "max"),
                    n_events=("event_id", "size"),
                    sum_value=("value", "sum"))
               .reset_index(drop=True))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_ub").map_groups(bucket_sessions,
                                       batch_format="pandas"))


def hash_join(left_ds, right_ds, key: str, n_buckets: int = 64,
              how: str = "inner"):
    """Generic large×large distributed hash join on ``key``.

    Neither side is materialized on the driver: both are tagged, unioned,
    and shuffled once on ``hash(key) % n_buckets``; inside each bucket a
    vectorized pandas merge joins all contained key groups at once (the
    coarse-bucket pattern — one Python call per bucket, not per key).
    Column overlap besides ``key`` is suffixed pandas-style (_x/_y).

    At 100 TB this is the fallback when neither side fits a broadcast
    (cf. customer_nation_revenue for the broadcast-small-side shape);
    skewed keys split across blocks within a bucket still co-locate,
    and n_buckets should scale with cluster size."""
    lschema, rschema = left_ds.schema(), right_ds.schema()
    left_cols = set(lschema.names)
    right_cols = set(rschema.names)
    overlap = (left_cols & right_cols) - {key}

    def _pd_dtypes(schema):
        out = {}
        for name, typ in zip(schema.names, schema.types):
            try:
                # typ is None for pandas extension dtypes Ray cannot
                # express in Arrow — leave those columns untouched
                if typ is not None:
                    out[name] = typ.to_pandas_dtype()
            except NotImplementedError:
                pass
        return out

    # the union of two differently-shaped sides null-fills the other
    # side's columns, silently promoting ints to float64 — restore each
    # side's original dtypes after splitting the bucket
    ldtypes, rdtypes = _pd_dtypes(lschema), _pd_dtypes(rschema)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df["_side"] = np.int8(side)
            k = df[key].to_numpy()
            df["_jb"] = (pd.util.hash_array(k) % n_buckets).astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        # a genuinely-null value in a nullable int column arrives as
        # float64 NaN after the union's to_pandas; plain astype(int64)
        # would raise, so such columns restore to pandas' nullable
        # Int64 (same Arrow int64 type, so blocks stay consistent)
        cast = {}
        for c, d in dtypes.items():
            if c not in df.columns:
                continue
            if (np.issubdtype(np.dtype(d), np.integer)
                    and df[c].isna().any()):
                cast[c] = pd.Int64Dtype()
            else:
                cast[c] = d
        return df.astype(cast)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        le = g.loc[g["_side"] == 0,
                   [c for c in g.columns if c in left_cols]]
        ri = g.loc[g["_side"] == 1,
                   [c for c in g.columns if c in right_cols]]
        le = _restore(le, ldtypes)
        ri = _restore(ri, rdtypes)
        return le.merge(ri, on=key, how=how, suffixes=("_x", "_y"))

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow"))
    out = tagged.groupby("_jb").map_groups(join_bucket,
                                           batch_format="pandas")
    if overlap:
        return out
    return out.map_batches(lambda t: t, batch_format="pyarrow")


def _small_side_refs(ds, threshold: int):
    """Distributed build of a broadcast side: the rows stay in the
    object store end-to-end — per-block work happens in tasks, the
    driver holds only block REFS (never the data) and a row count.

    Returns the list of Arrow block refs, or None when the side exceeds
    ``threshold`` rows (the caller flips to the shuffle ``hash_join``).
    Readers ``ray.get`` the refs once per actor in __init__ — zero-copy
    reads from the local object store, not a per-batch reship."""
    mat = ds.materialize()
    if mat.count() > threshold:
        return None
    return mat.to_arrow_refs()


def _sorted_lookup(tables, key: str, val: str | None = None):
    """Concatenate broadcast blocks into a sorted key array (plus an
    optional aligned value array) for vectorized searchsorted probes."""
    t = pa.concat_tables(tables)
    k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    k = k[order]
    if val is None:
        return k
    v = t.column(val).to_numpy(zero_copy_only=False)[order]
    return k, v


def _member_mask(sorted_keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if not len(sorted_keys):
        return np.zeros(len(vals), dtype=bool)
    idx = np.searchsorted(sorted_keys, vals)
    idx = np.clip(idx, 0, len(sorted_keys) - 1)
    return sorted_keys[idx] == vals


def q3_shipping_priority(customer_ds, orders_ds, lineitem_ds,
                         segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10,
                         broadcast_threshold: int = 5_000_000):
    """TPC-H Q3 shape: σ(customer) ⋈ σ(orders) ⋈ σ(lineitem) → groupby
    orderkey sum(revenue) → global top-k.

    Join strategy by size: the filtered customer key set is built
    DISTRIBUTED (per-block distinct in tasks, driver keeps only object
    refs) and broadcast while it is under ``broadcast_threshold`` rows;
    beyond that the customer⋈orders side flips to the bucketed
    ``hash_join`` — no unbounded driver-side or per-actor state.
    orders×lineitem is always the large×large bucketed hash_join.
    Revenue is pre-aggregated per orderkey inside lineitem batches
    BEFORE the join shuffle (map-side combine), and top-k runs as
    per-block partial top-k → single final merge."""
    import pyarrow.compute as pc
    import ray

    cut = np.datetime64(cutoff)

    cust = customer_ds.map_batches(
        lambda b: pa.table({"c_custkey": pc.unique(
            b.filter(pc.equal(b.column("c_mktsegment"), segment))
            .column("c_custkey"))}),
        batch_format="pyarrow")

    def order_cols(df: pd.DataFrame) -> pa.Table:
        # unit-safe epoch seconds (parquet timestamps arrive as
        # datetime64[us] in pandas 2.x, not [ns])
        df = df.copy()
        df["o_epoch"] = (df["o_orderdate"]
                         .astype("datetime64[s]")
                         .astype("int64"))
        return pa.Table.from_pandas(
            df[["o_orderkey", "o_epoch", "o_orderpriority"]],
            preserve_index=False)

    key_refs = _small_side_refs(cust, broadcast_threshold)
    if key_refs is None:
        # scale fallback: filtered-customer side too big to broadcast
        def date_filter(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df = df[df["o_orderdate"].to_numpy() < cut]
            df["o_epoch"] = (df["o_orderdate"]
                             .astype("datetime64[s]").astype("int64"))
            return pa.Table.from_pandas(
                df[["o_orderkey", "o_custkey", "o_epoch",
                    "o_orderpriority"]], preserve_index=False)

        keys_ds = cust.map_batches(
            lambda b: b.rename_columns(["o_custkey"]),
            batch_format="pyarrow")
        orders = hash_join(
            orders_ds.map_batches(date_filter, batch_format="pyarrow"),
            keys_ds, "o_custkey").drop_columns(["o_custkey"])
    else:
        class FilterOrders:
            def __init__(self, key_refs):
                self.keys = _sorted_lookup(ray.get(key_refs),
                                           "c_custkey")

            def __call__(self, b: pa.Table) -> pa.Table:
                df = b.to_pandas()
                m = (df["o_orderdate"].to_numpy() < cut) \
                    & _member_mask(self.keys,
                                   df["o_custkey"].to_numpy())
                return order_cols(df.loc[m])

        orders = orders_ds.map_batches(
            FilterOrders, fn_constructor_kwargs={"key_refs": key_refs},
            batch_format="pyarrow", concurrency=default_concurrency(8),
            num_cpus=1)

    def li_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        m = df["l_shipdate"].to_numpy() > cut
        df = df.loc[m, ["l_orderkey", "l_extendedprice", "l_discount"]]
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = (df.groupby("l_orderkey", as_index=False)["rev"].sum()
             .rename(columns={"l_orderkey": "o_orderkey"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")

    joined = hash_join(orders, li, "o_orderkey")

    # global per-orderkey revenue sum + partial top-k, bucketed on the
    # orderkey so every partial of a key lands in ONE group (a per-block
    # partial top-k would be wrong if a key's rows span blocks)
    def add_kb(b: pa.Table) -> pa.Table:
        kcol = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_kb", pa.array(kcol % np.int64(64), pa.int64()))

    def sum_topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["o_orderkey", "o_epoch", "o_orderpriority"],
                       as_index=False)["rev"].sum())
        return s.sort_values(["rev", "o_epoch", "o_orderkey"],
                             ascending=[False, True, True]).head(k)

    part = (joined.map_batches(add_kb, batch_format="pyarrow")
            .groupby("_kb").map_groups(sum_topk_bucket,
                                       batch_format="pandas"))

    def topk_final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rev", "o_epoch", "o_orderkey"],
                          ascending=[False, True, True]).head(k)
        out = g.rename(columns={"rev": "revenue"})
        out["revenue"] = out["revenue"].round(2)
        out["l_orderkey"] = out["o_orderkey"].astype("int64")
        return out[["l_orderkey", "revenue", "o_epoch",
                    "o_orderpriority"]].reset_index(drop=True)

    def one_group(b: pa.Table) -> pa.Table:
        return b.append_column("_g", pa.array([0] * b.num_rows,
                                              pa.int8()))

    return (part.map_batches(one_group, batch_format="pyarrow")
            .groupby("_g").map_groups(topk_final, batch_format="pandas"))


def region_revenue(region_df, nation_df, customer_ds, orders_ds,
                   lineitem_ds, broadcast_threshold: int = 5_000_000):
    """Q5-shape revenue per region over the full 5-table chain.

    region and nation are tiny forever (25/5 rows) and stay a driver
    dict; customer is only "small" until it isn't, so the
    custkey→region side is built DISTRIBUTED (customer batches map to
    (c_custkey, r_name) in tasks; the driver holds object refs, never
    rows) and broadcast while under ``broadcast_threshold`` rows —
    beyond that orders⋈customer flips to the bucketed ``hash_join``.
    lineitem revenue is pre-combined per orderkey per batch; the
    orders×lineitem shuffle joins on orderkey via hash_join, and the
    final per-region rollup is a 5-group aggregate."""
    import ray
    from ray.data.aggregate import Sum

    n2r = dict(zip(nation_df["n_nationkey"],
                   nation_df["n_regionkey"].map(
                       dict(zip(region_df["r_regionkey"],
                                region_df["r_name"])))))
    n2r_ref = ray.put(n2r)

    class CustRegion:
        def __init__(self, n2r_ref):
            self.n2r = ray.get(n2r_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            return pa.table({
                "o_custkey": pa.array(df["c_custkey"], pa.int64()),
                "r_name": pa.array(df["c_nationkey"].map(self.n2r),
                                   pa.string()),
            })

    cust_region = customer_ds.map_batches(
        CustRegion, fn_constructor_kwargs={"n2r_ref": n2r_ref},
        batch_format="pyarrow", concurrency=default_concurrency(8),
        num_cpus=1)

    cr_refs = _small_side_refs(cust_region, broadcast_threshold)
    if cr_refs is None:
        # scale fallback: customer no longer broadcastable
        orders = hash_join(orders_ds, cust_region, "o_custkey") \
            .drop_columns(["o_custkey"])
    else:
        class TagOrders:
            def __init__(self, cr_refs):
                self.keys, self.names = _sorted_lookup(
                    ray.get(cr_refs), "o_custkey", "r_name")

            def __call__(self, b: pa.Table) -> pa.Table:
                df = b.to_pandas()
                ck = df["o_custkey"].to_numpy()
                if not len(self.keys):
                    names = np.full(len(ck), None, dtype=object)
                else:
                    m = _member_mask(self.keys, ck)
                    idx = np.clip(np.searchsorted(self.keys, ck), 0,
                                  len(self.keys) - 1)
                    names = np.where(m, self.names[idx], None)
                return pa.table({
                    "o_orderkey": pa.array(df["o_orderkey"],
                                           pa.int64()),
                    "r_name": pa.array(names, pa.string()),
                })

        orders = orders_ds.map_batches(
            TagOrders, fn_constructor_kwargs={"cr_refs": cr_refs},
            batch_format="pyarrow", concurrency=default_concurrency(8),
            num_cpus=1)

    def li_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = (df.groupby("l_orderkey", as_index=False)
             .agg(rev=("rev", "sum"), n_items=("rev", "size"))
             .rename(columns={"l_orderkey": "o_orderkey"}))
        g["n_items"] = g["n_items"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(orders, li, "o_orderkey")

    def region_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = (df.groupby("r_name", as_index=False)
             .agg(rev=("rev", "sum"), n_items=("n_items", "sum")))
        g["n_items"] = g["n_items"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(region_partial, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Sum("rev", alias_name="rev"),
                      Sum("n_items", alias_name="n_items")))

    def finish(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["revenue"] = df["rev"].round(2)
        df["n_items"] = df["n_items"].astype("int64")
        return pa.Table.from_pandas(
            df[["r_name", "revenue", "n_items"]], preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def events_sliding_window(events_ds, window_s: int = 3600,
                          n_buckets: int = 64):
    """Per-event sliding-window aggregate: for every event, the sum and
    count of the same user's events in [ts - window_s, ts] (SQL RANGE
    BETWEEN window_s PRECEDING AND CURRENT ROW semantics, ties included).

    One coarse user-bucket shuffle; inside a bucket every user is
    processed in a single vectorized pass: rows sort by (user, epoch),
    a composite key (user_idx * span + epoch) makes one prefix-sum +
    two np.searchsorted calls compute every window bound at once —
    cross-user keys differ by more than the window so frames never leak
    across users."""
    def add_bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_ub", pa.array(u % np.int64(n_buckets), pa.int64()))

    def bucket_windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ep = (g["ts"].astype("datetime64[s]").astype("int64")).to_numpy()
        user = g["user_id"].to_numpy()
        vals = g["value"].to_numpy(dtype="float64")
        # composite key: per-user epoch offsets separated by > window
        base = ep - ep.min()
        span = np.int64(base.max() + window_s + 2) if len(base) else 1
        _, user_idx = np.unique(user, return_inverse=True)
        key = user_idx.astype("int64") * span + base
        lo = np.searchsorted(key, key - window_s, side="left")
        hi = np.searchsorted(key, key, side="right")
        csum = np.concatenate([[0.0], np.cumsum(vals)])
        out = pd.DataFrame({
            "user_id": user,
            "event_id": g["event_id"].to_numpy(),
            "ep": ep,
            "sliding_sum": np.round(csum[hi] - csum[lo], 6),
            "n_window": (hi - lo).astype("int64"),
        })
        return out

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_ub").map_groups(bucket_windows,
                                       batch_format="pandas"))


def topk_per_group(part_ds, k: int = 3):
    """Per-group top-k (window-rank shape): map-side partial top-k per
    brand inside each batch (the only rows that can survive globally),
    then one small groupby over the per-batch survivors — the shuffle
    moves O(k × brands × batches), never the full table."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["p_retailprice", "p_partkey"],
                            ascending=[False, True], kind="stable")
        return pa.Table.from_pandas(df.groupby("p_brand").head(k),
                                    preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (part_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("p_brand")
            .map_groups(final, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


def stratified_sample(docs_ds, rate_en: int = 30, rate_other: int = 10):
    """Deterministic hash-stratified sampling: keep a doc when
    md5(str(doc_id)) % 100 falls under its language's rate. The
    decision is a pure row function — no shuffle, no RNG state, same
    sample at any parallelism (and resumable for free)."""
    import hashlib

    def sample(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        buckets = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
             for d in df["doc_id"]),
            dtype=np.int64, count=len(df))
        rates = np.where(df["lang"].to_numpy() == "en",
                         rate_en, rate_other)
        out = df.loc[buckets < rates, ["doc_id", "lang", "n_chars"]]
        out = out.copy()
        out["bucket"] = buckets[buckets < rates]
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs_ds.map_batches(sample, batch_format="pyarrow")
