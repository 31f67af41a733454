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

from .common import merge_partials, read_table


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
            cents=np.round(batch["l_extendedprice"] * 100).astype("int64"),
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
    """Broadcast join: customer→nation lookup shipped once via ``ray.put``
    and applied inside ``map_batches`` — no shuffle join (the small-side
    broadcast pattern, SURVEY.md §2.4/J3).  Output: (n_name, n_orders)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust_to_nation = dict(
        zip(
            cust["c_custkey"].astype("int64"),
            cust["c_nationkey"].map(
                dict(zip(nation["n_nationkey"], nation["n_name"]))
            ),
        )
    )
    lookup_ref = ray.put(cust_to_nation)

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        n = batch["o_custkey"].astype("int64").map(lookup)
        return n.value_counts().rename_axis("n_name").rename("n_orders").reset_index()

    out = merge_partials(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
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
        cents = np.round(batch["l_extendedprice"] * 100).astype("int64")
        disc = np.round(batch["l_discount"] * 100).astype("int64")
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
                "cents": np.round(batch["p_retailprice"] * 100).astype("int64"),
            }
        )
        return df.groupby("p_brand", as_index=False).sum()

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        keys=["p_brand"],
        agg={"one": "sum", "cents": "sum"},
    ).rename(columns={"one": "n_parts", "cents": "sum_retail_cents"})
    return out.astype({"n_parts": "int64", "sum_retail_cents": "int64"})
