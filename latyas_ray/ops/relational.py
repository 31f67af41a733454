"""Relational demos over the TPC-H-ish tables — showing the engine's
partial-aggregation and broadcast-join patterns on non-document data.

Outputs are integer-valued (cents / counts) so the DuckDB oracle matches
exactly — float accumulation order never enters the comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

import ray.data as rd

from .common import merge_partials, read_table, round_half_away


def lineitem_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped rollup with exact integer math:
    (l_returnflag, l_linestatus, n_rows, sum_qty, sum_base_cents)."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            qty=batch["l_quantity"].astype("int64"),
            cents=round_half_away(batch["l_extendedprice"] * 100).astype("int64"),
            one=1,
        )
        return (
            batch.groupby(["l_returnflag", "l_linestatus"])[["one", "qty", "cents"]]
            .sum()
            .reset_index()
        )

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["l_returnflag", "l_linestatus"],
        agg={"one": "sum", "qty": "sum", "cents": "sum"},
    ).rename(columns={"one": "n_rows", "qty": "sum_qty", "cents": "sum_base_cents"})
    return out.astype(
        {"n_rows": "int64", "sum_qty": "int64", "sum_base_cents": "int64"}
    )


def orders_by_nation(sf_dir: str) -> pd.DataFrame:
    """Orders ⋈ customer ⋈ nation rollup: (n_name, n_orders).

    Only nation (25 rows) is a genuine broadcast side; customer is a big
    table (1.5 M × SF rows), so the r2 driver-side custkey→nation dict was
    a scale-killer.  Scale shape now: orders are partially counted per
    custkey inside ``map_batches`` (the shuffle carries one row per
    (custkey, batch), never raw orders), customer streams through as
    (custkey, nationkey) rows, and BOTH sides shuffle by the same coarse
    hash of custkey — every custkey's partial counts co-locate with its
    one customer row, so each of the ``N_PARTS`` partitions does one
    vectorized pandas merge and emits ≤25 (n_name, n_orders) rows.  The
    nation dict rides along via ``ray.put`` (J3 broadcast pattern)."""
    N_PARTS = 64

    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nat_name_ref = ray.put(
        dict(zip(nation["n_nationkey"].astype("int64"), nation["n_name"]))
    )

    def _part_of(key: pd.Series) -> pd.Series:
        uh = pd.util.hash_array(key.to_numpy(dtype=np.int64)).astype(np.uint64)
        return pd.Series((uh % np.uint64(N_PARTS)).astype("int64"), index=key.index)

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def orders_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch["o_custkey"].astype("int64")
            .value_counts().rename_axis("custkey").rename("n_orders").reset_index()
        )
        g["nationkey"] = np.int64(-1)  # marker: orders side
        g["part"] = _part_of(g["custkey"])
        return g[["custkey", "n_orders", "nationkey", "part"]]

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "custkey": batch["c_custkey"].astype("int64"),
                "n_orders": np.int64(0),
                "nationkey": batch["c_nationkey"].astype("int64"),
            }
        )
        g["part"] = _part_of(g["custkey"])
        return g

    both = orders.map_batches(
        orders_partial, batch_format="pandas", batch_size=65536
    ).union(cust.map_batches(cust_rows, batch_format="pandas", batch_size=65536))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        nat_name = ray.get(nat_name_ref)
        counts = (
            g[g["nationkey"] < 0]
            .groupby("custkey", as_index=False)["n_orders"].sum()
        )
        members = g[g["nationkey"] >= 0][["custkey", "nationkey"]]
        m = counts.merge(members, on="custkey")
        m["n_name"] = m["nationkey"].map(nat_name)
        return m.groupby("n_name", as_index=False)["n_orders"].sum()

    out = merge_partials(
        both.groupby("part").map_groups(per_part, batch_format="pandas"),
        keys=["n_name"],
        agg={"n_orders": "sum"},
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def top_suppliers_by_revenue(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Distributed top-k: per-batch partial aggregation over the (bounded)
    supplier key space, coalesce-merge, then a driver-side top-k and a
    small-side name join — no global sort, no shuffle join.  Revenue uses
    pure integer math (cents × integer discount percent) so the DuckDB
    oracle matches bit-for-bit regardless of accumulation order.
    Output: (s_suppkey, s_name, revenue_c100)."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(batch["l_extendedprice"] * 100).astype("int64")
        disc = round_half_away(batch["l_discount"] * 100).astype("int64")
        df = pd.DataFrame(
            {
                "l_suppkey": batch["l_suppkey"].astype("int64"),
                "rev": cents * (100 - disc),
            }
        )
        return df.groupby("l_suppkey", as_index=False)["rev"].sum()

    agg = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["l_suppkey"],
        agg={"rev": "sum"},
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.sort_values(["rev", "s_suppkey"], ascending=[False, True]).head(k)
    return pd.DataFrame(
        {
            "s_suppkey": out["s_suppkey"].astype("int64").values,
            "s_name": out["s_name"].values,
            "revenue_c100": out["rev"].astype("int64").values,
        }
    )


def customers_by_region(sf_dir: str) -> pd.DataFrame:
    """Two-level broadcast-join chain (customer→nation→region): both small
    sides collapse into one driver-built dict shipped once via ``ray.put``;
    the big side streams through ``map_batches`` with a vectorized map —
    no shuffle join anywhere.  Output: (r_name, n_customers)."""
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    nat_to_region = dict(
        zip(
            nation["n_nationkey"].astype("int64"),
            nation["n_regionkey"].map(
                dict(zip(region["r_regionkey"], region["r_name"]))
            ),
        )
    )
    lookup_ref = ray.put(nat_to_region)

    cust = read_table(sf_dir, "customer", columns=["c_nationkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        r = batch["c_nationkey"].astype("int64").map(lookup)
        return (
            r.value_counts().rename_axis("r_name").rename("n_customers").reset_index()
        )

    out = merge_partials(
        cust.map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["r_name"],
        agg={"n_customers": "sum"},
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Partial aggregation over the part table: count + exact-integer
    retail-price cents by brand.  Output: (p_brand, n_parts,
    sum_retail_cents)."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "p_brand": batch["p_brand"],
                "one": 1,
                "cents": round_half_away(batch["p_retailprice"] * 100).astype("int64"),
            }
        )
        return df.groupby("p_brand", as_index=False).sum()

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["p_brand"],
        agg={"one": "sum", "cents": "sum"},
    ).rename(columns={"one": "n_parts", "cents": "sum_retail_cents"})
    return out.astype({"n_parts": "int64", "sum_retail_cents": "int64"})
