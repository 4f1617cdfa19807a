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


def customer_nation_revenue(orders_ds, customer_df, nation_df):
    """Revenue per nation: broadcast join (customer & nation dims shipped
    once via ray.put, looked up per batch with a pandas merge — no
    shuffle join for the big fact side)."""
    import ray
    from ray.data.aggregate import Sum

    cust = customer_df[["c_custkey", "c_nationkey"]]
    nat = nation_df[["n_nationkey", "n_name"]]
    dim = cust.merge(nat, left_on="c_nationkey",
                     right_on="n_nationkey")[["c_custkey", "n_name"]]
    ref = ray.put(dim)

    class JoinDim:
        def __init__(self):
            d = ray.get(ref)
            self.map = d.set_index("c_custkey")["n_name"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["n_name"] = df["o_custkey"].map(self.map)
            g = (df.dropna(subset=["n_name"])
                 .groupby("n_name", as_index=False)
                 .agg(revenue=("o_totalprice", "sum"),
                      n_orders=("o_orderkey", "size")))
            return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders_ds.map_batches(JoinDim, batch_format="pyarrow",
                                     concurrency=default_concurrency(8), num_cpus=1)
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


def events_sessionize(events_ds, gap_s: int = 1800):
    """Gap-based sessionization: groupby(user) shuffle co-locates each
    user's events; per-group pandas does the ts-sorted gap logic.
    Assumes one user's events fit one group (true for any realistic
    per-user event volume; hot users would be range-split by day)."""
    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        epoch = g["ts"].astype("int64") // 1_000_000
        new_session = (epoch.diff().fillna(gap_s + 1) > gap_s)
        session_idx = new_session.cumsum()
        out = (g.assign(session_idx=session_idx, epoch=epoch)
               .groupby("session_idx")
               .agg(user_id=("user_id", "first"),
                    session_start=("epoch", "min"),
                    session_end=("epoch", "max"),
                    n_events=("event_id", "size"),
                    sum_value=("value", "sum"))
               .reset_index(drop=True))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return events_ds.groupby("user_id").map_groups(
        per_user, batch_format="pandas")
