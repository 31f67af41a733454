"""Stream-shaped ops over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
stream-shaped semantics are expressed as sorted-group computations
(ray_guide: windows = ``groupby(key).map_groups`` over ts-sorted groups).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from .common import merge_partials, read_table, round_half_away


def events_window_counts(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event_type: (event_type, window_start,
    n_events).  Partial-agg per batch → groupby over partials (the
    shuffle carries one row per (type, hour, batch))."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h")
        g = (
            batch.assign(window_start=w)
            .groupby(["event_type", "window_start"])
            .size()
            .rename("n_events")
            .reset_index()
        )
        return g

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384),
        keys=["event_type", "window_start"],
        agg={"n_events": "sum"},
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap:
    (user_id, n_sessions, n_events).

    Scale shape: grouping directly on ``user_id`` would pay one Python
    ``map_groups`` callback per user (~0.2 ms each — hours at 10^8 users),
    so the shuffle key is a coarse hash of user_id (``% N_PARTS``); every
    user's events land whole in one partition, and inside each partition
    ONE vectorized pandas sort + shift/diff computes all session breaks at
    C speed.  Same partition-then-vectorize pattern as ``word_counts`` and
    ``events_top_users_by_value``."""
    import numpy as np

    N_PARTS = 64  # coarse shuffle width; raise with cluster size, not users

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        uh = pd.util.hash_array(
            batch["user_id"].to_numpy(dtype=np.int64)
        ).astype(np.uint64)
        return batch.assign(part=(uh % np.uint64(N_PARTS)).astype("int64"))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same_user = g["user_id"].eq(g["user_id"].shift())
        within_gap = g["ts"].diff() <= gap
        new_session = ~(same_user & within_gap)
        out = (
            g.assign(ns=new_session)
            .groupby("user_id")
            .agg(n_sessions=("ns", "sum"), n_events=("ns", "size"))
            .reset_index()
        )
        return out.astype(
            {"user_id": "int64", "n_sessions": "int64", "n_events": "int64"}
        )

    return (
        ds.map_batches(add_part, batch_format="pandas", batch_size=16384)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def events_hopping_counts(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) windows: width 1 h, hop 30 min — each event lands
    in exactly two windows.  The window explosion happens inside
    ``map_batches`` (vectorized: floor + one shifted copy), then the same
    partial-agg → coalesce-merge as the tumbling variant, so the shuffle
    carries one row per (type, window, batch).  Output: (event_type,
    window_start, n_events)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])
    hop = pd.Timedelta(minutes=30)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w1 = batch["ts"].dt.floor("30min")
        exploded = pd.concat(
            [
                batch.assign(window_start=w1),
                batch.assign(window_start=w1 - hop),
            ]
        )
        return (
            exploded.groupby(["event_type", "window_start"])
            .size()
            .rename("n_events")
            .reset_index()
        )

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384),
        keys=["event_type", "window_start"],
        agg={"n_events": "sum"},
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def events_top_users_by_value(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-``k`` users per event_type by total value (integer cents —
    exact).  Scale shape: per-batch partial sums, then a shuffle keyed by
    a coarse hash of (event_type, user_id) — every (type, user) total is
    complete inside its partition, so each partition emits only its local
    top-``k`` per type and the driver merges O(partitions × types × k)
    rows.  No global sort, no unbounded driver state."""
    import numpy as np

    from ..ops.dedup import _mix_step

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            batch["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        g = (
            batch.assign(cents=cents)
            .groupby(["event_type", "user_id"], as_index=False)["cents"]
            .sum()
        )
        uh = _mix_step(
            g["user_id"].to_numpy(dtype=np.int64).astype(np.uint64),
            pd.util.hash_array(g["event_type"].to_numpy(dtype=object)).astype(
                np.uint64
            ),
        )
        g["part"] = (uh % np.uint64(64)).astype("int64")
        return g

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        totals = (
            g.groupby(["event_type", "user_id"], as_index=False)["cents"].sum()
        )
        return (
            totals.sort_values(
                ["event_type", "cents", "user_id"],
                ascending=[True, False, True],
            )
            .groupby("event_type")
            .head(k)
        )[["event_type", "user_id", "cents"]]

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=16384)
        .groupby("part")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    top = (
        parts.sort_values(
            ["event_type", "cents", "user_id"], ascending=[True, False, True]
        )
        .groupby("event_type")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = top.groupby("event_type").cumcount() + 1
    out = top.rename(columns={"cents": "total_cents"})
    return out[["event_type", "rank", "user_id", "total_cents"]].astype(
        {"rank": "int64", "user_id": "int64", "total_cents": "int64"}
    )


def events_props_rollup(sf_dir: str) -> pd.DataFrame:
    """Per-type rollup of the JSON ``props`` payload field ``k``:
    (event_type, n_events, sum_k, min_k, max_k).  Extraction is a
    vectorized regex over the JSON strings inside ``map_batches``
    (compiled once per process); the shuffle carries one partial row per
    (type, batch)."""
    import re

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    pat = re.compile(r'"k":\s*(-?\d+)')

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = (
            batch["props"].fillna("").str.extract(pat, expand=False)
            .fillna("0").astype("int64")
        )
        g = (
            batch.assign(k=k)
            .groupby("event_type")["k"]
            .agg(["count", "sum", "min", "max"])
            .reset_index()
        )
        return g.rename(columns={"count": "n_events", "sum": "sum_k",
                                 "min": "min_k", "max": "max_k"})

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384),
        keys=["event_type"],
        agg={"n_events": "sum", "sum_k": "sum", "min_k": "min", "max_k": "max"},
    )
    return out.astype({"n_events": "int64", "sum_k": "int64",
                       "min_k": "int64", "max_k": "int64"})


def attribution_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join (marketing attribution): for every ``purchase`` event,
    the same user's latest ``click`` at or before it — (event_id,
    user_id, ts_us, click_ts_us, gap_us), with ``-1`` for never-clicked
    (all-BIGINT output keeps the oracle compare bit-exact; no nullable
    timestamps cross the hash).

    Ray Data has no as-of join, so it is expressed as the repo's
    sorted-partition pattern (the ``sessionize`` shape): filter both
    sides to the two event types INSIDE the first map (only click +
    purchase rows ever enter the shuffle), coarse-hash by user_id so
    each user's merged timeline lands whole in one partition, then ONE
    vectorized sort + where/ffill per partition computes every match at
    C speed — no per-user Python callback, no row loop.  The order key
    is pinned to (ts, event_id) on both sides, so a click sharing a
    purchase's timestamp matches iff its event_id is lower.
    """
    import numpy as np

    N_PARTS = 64  # coarse shuffle width; scales with cluster, not users

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin(("click", "purchase"))]
        uh = pd.util.hash_array(
            b["user_id"].to_numpy(dtype=np.int64)
        ).astype(np.uint64)
        return b.assign(part=(uh % np.uint64(N_PARTS)).astype("int64"))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        last_click = (
            ts_us.where(g["event_type"].eq("click"))
            .groupby(g["user_id"]).ffill()
        )
        out = pd.DataFrame(
            {"event_id": g["event_id"].astype("int64"),
             "user_id": g["user_id"].astype("int64"),
             "ts_us": ts_us,
             "click_ts_us": last_click.fillna(-1).astype("int64")}
        )[g["event_type"].eq("purchase").to_numpy()]
        out["gap_us"] = np.where(
            out["click_ts_us"] >= 0, out["ts_us"] - out["click_ts_us"], -1
        ).astype(np.int64)
        return out

    return (
        ds.map_batches(add_part, batch_format="pandas", batch_size=16384)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def events_nearby_counts(sf_dir: str, window_s: int = 60) -> pd.DataFrame:
    """Range (interval) self-join: for every event, how many other
    events fall within ±``window_s`` seconds of it — (event_id,
    n_nearby).  The non-equi join Ray Data lacks, expressed by
    TIME-BUCKET CO-LOCATION: tumbling buckets of exactly the window
    width mean any event within ±window of e lives in e's bucket or an
    adjacent one, so each event is REPLICATED into its own and both
    neighbor buckets (3× an (id, ts) pair — never the payload), events
    shuffle by coarse bucket hash, and inside each partition one
    vectorized sort + two ``searchsorted`` calls count every interval
    containment at C speed.  Exact regardless of bucket skew; the
    replication factor is the fixed 3, not data-dependent.

    Integer microsecond bounds, INCLUSIVE on both ends — pinned with
    the SQL oracle (``epoch_us BETWEEN lo AND hi``); count excludes the
    event itself (its own row always satisfies its own interval).
    """
    import numpy as np

    N_PARTS = 64
    w_us = np.int64(window_s * 1_000_000)

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        bucket = ts_us // w_us
        eid = batch["event_id"].to_numpy(dtype=np.int64)
        home = pd.DataFrame(
            {"event_id": eid, "ts_us": ts_us, "bucket": bucket,
             "is_home": np.ones(len(eid), dtype=np.int64)}
        )
        copies = [home]
        for shift in (-1, 1):
            copies.append(
                pd.DataFrame(
                    {"event_id": eid, "ts_us": ts_us,
                     "bucket": bucket + shift,
                     "is_home": np.zeros(len(eid), dtype=np.int64)}
                )
            )
        out = pd.concat(copies, ignore_index=True)
        bh = pd.util.hash_array(out["bucket"].to_numpy()).astype(np.uint64)
        out["part"] = (bh % np.uint64(N_PARTS)).astype("int64")
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bucket, gb in g.groupby("bucket", sort=False):
            # every event appears at most once per bucket group (home in
            # its own bucket, +1 copy only from bucket-1, -1 copy only
            # from bucket+1 — mutually exclusive), so no dedup is needed
            ev = gb.sort_values(["ts_us", "event_id"])
            ts = ev["ts_us"].to_numpy(dtype=np.int64)
            home = gb[gb["is_home"] == 1]
            h_ts = home["ts_us"].to_numpy(dtype=np.int64)
            lo = np.searchsorted(ts, h_ts - w_us, side="left")
            hi = np.searchsorted(ts, h_ts + w_us, side="right")
            outs.append(
                pd.DataFrame(
                    {"event_id": home["event_id"].to_numpy(dtype=np.int64),
                     "n_nearby": (hi - lo - 1).astype(np.int64)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "n_nearby": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(replicate, batch_format="pandas", batch_size=16384)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
