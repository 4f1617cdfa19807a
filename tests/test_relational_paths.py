"""Join-strategy tests: the broadcast path and the hash_join fallback
must agree (the size threshold only changes the plan, never the rows),
and hash_join must survive genuinely-null nullable-int columns
(ADVICE round 2: astype(int64) on NaN crashed the restore)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_hash_join_nullable_int_with_nulls(ray_session):
    import pyarrow as pa
    import ray
    from jsonld_js_ray.functions.relational import hash_join
    # Arrow int64 with nulls — the shape parquet nullable ints arrive in
    left_t = pa.table({
        "k": pa.array(list(np.arange(20) % 5), pa.int64()),
        "lv": pa.array([None if i % 4 == 0 else i for i in range(20)],
                       pa.int64())})
    right = pd.DataFrame({"k": np.arange(10, dtype="int64") % 5,
                          "rv": np.arange(10, dtype="int64")})
    out = hash_join(ray.data.from_arrow(left_t),
                    ray.data.from_pandas(right), "k").to_pandas()
    expect = left_t.to_pandas().astype({"lv": "Int64"}) \
        .merge(right, on="k")
    got = _norm(out.astype({"lv": "Int64"}), ["k", "lv", "rv"])
    want = _norm(expect, ["k", "lv", "rv"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q3_broadcast_and_fallback_agree():
    import ray
    from jsonld_js_ray.functions.relational import q3_shipping_priority

    def run(threshold):
        cust = ray.data.read_parquet(
            f"{SF_DIR}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"])
        orders = ray.data.read_parquet(
            f"{SF_DIR}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"])
        li = ray.data.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])
        return q3_shipping_priority(
            cust, orders, li, broadcast_threshold=threshold).to_pandas()

    cols = ["l_orderkey", "revenue", "o_epoch", "o_orderpriority"]
    broadcast = _norm(run(5_000_000), cols)
    fallback = _norm(run(1), cols)  # forces the hash_join plan
    assert len(broadcast) == 10
    pd.testing.assert_frame_equal(broadcast, fallback)


@pytest.mark.usefixtures("ray_session")
def test_region_revenue_broadcast_and_fallback_agree():
    import pyarrow.parquet as pq
    import ray
    from jsonld_js_ray.functions.relational import region_revenue

    region = pq.read_table(f"{SF_DIR}/region.parquet").to_pandas()
    nation = pq.read_table(f"{SF_DIR}/nation.parquet").to_pandas()

    def run(threshold):
        cust = ray.data.read_parquet(
            f"{SF_DIR}/customer.parquet",
            columns=["c_custkey", "c_nationkey"])
        orders = ray.data.read_parquet(
            f"{SF_DIR}/orders.parquet",
            columns=["o_orderkey", "o_custkey"])
        li = ray.data.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"])
        return region_revenue(region, nation, cust, orders, li,
                              broadcast_threshold=threshold).to_pandas()

    cols = ["r_name", "revenue", "n_items"]
    broadcast = _norm(run(5_000_000), cols)
    fallback = _norm(run(1), cols)
    assert len(broadcast) == 5
    pd.testing.assert_frame_equal(broadcast, fallback)
